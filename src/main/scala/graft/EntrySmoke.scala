package graft

import org.apache.spark.sql.SparkSession

/** Local mirror of the driver's smoke check: `SparkEntry.entry` must
  * return rows > 0 on sf0.001, and every registered query must have an
  * oracle (or be consciously rows-only). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, truncate = false)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"NQUERIES=${q.size} NORACLES=${o.size} MISSING_ORACLE=${(q -- o).mkString(",")}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
