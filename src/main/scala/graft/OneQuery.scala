package graft

import org.apache.spark.sql.SparkSession

/** Dev main: single-query verify round-trip. Writes ONE registered
  * query's result to `<outDir>/<name>.parquet` and its DuckDB oracle SQL
  * to `<outDir>/oracle_sql.json` (same layout Verify emits for the full
  * suite), so one query's Spark-vs-oracle check doesn't cost a 357-query
  * dump. usage: graft.OneQuery <queryName> [sfDir] [outDir]
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/onequery"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same <outDir>/<name>/ layout as Verify, so
    // tools/check_correctness.py reads the dump unmodified
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = SparkEntry.oracleSql.get(name)
    // full JSON string escape (Verify's convention): backslash, quote,
    // and ALL control chars — a tab or CR in the SQL must not emit
    // invalid JSON
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    sql.foreach { q =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"""{"$name": "${esc(q)}"}""".getBytes("UTF-8"))
    }
    println(s"[onequery] $name -> $outDir (oracle: ${sql.isDefined})")
    spark.stop()
  }
}
