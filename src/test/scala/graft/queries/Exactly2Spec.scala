package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §7.4 hard part: the exactly-2 + opposite-sign gate must
  * count selected objects BEFORE pair extraction, and empty/1/3-object
  * groups must drop out without null leakage. */
class Exactly2Spec extends SparkSpec {

  test("0/1/3-object and same-sign events are rejected; only exactly-2 OS kept") {
    import spark.implicits._
    // (event, pt, charge): event 1 has 2 OS -> kept; 2 has 2 SS -> drop;
    // 3 has 1 -> drop; 4 has 3 -> drop; 5 has 0 after selection -> drop
    val objs = Seq(
      (1L, 50.0, 1.0), (1L, 40.0, -1.0),
      (2L, 50.0, 1.0), (2L, 40.0, 1.0),
      (3L, 50.0, 1.0),
      (4L, 50.0, 1.0), (4L, 40.0, -1.0), (4L, 30.0, 1.0),
      (5L, 2.0, 1.0), (5L, 3.0, -1.0)
    ).toDF("event", "pt", "charge")
      .filter(col("pt") > 5.0) // object selection drops event 5 entirely
    val w = Window.partitionBy(col("event")).orderBy(col("pt").desc)
    val ranked = objs.withColumn("rank", row_number().over(w))
    val paired = ranked.groupBy(col("event")).agg(
      count(lit(1)).as("n"),
      sum(col("charge")).as("sumq"),
      max(when(col("rank") === 1, col("pt"))).as("pt1"),
      max(when(col("rank") === 2, col("pt"))).as("pt2"))
    val kept = paired.filter(col("n") === 2 && col("sumq") === 0.0)
      .collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
    assert(kept.head.getDouble(3) == 50.0 && kept.head.getDouble(4) == 40.0)
  }

  test("missing second object yields null pt2, not a fabricated value") {
    import spark.implicits._
    val objs = Seq((3L, 50.0, 1.0)).toDF("event", "pt", "charge")
    val w = Window.partitionBy(col("event")).orderBy(col("pt").desc)
    val paired = objs.withColumn("rank", row_number().over(w))
      .groupBy(col("event")).agg(
        max(when(col("rank") === 2, col("pt"))).as("pt2"))
    val row = paired.collect().head
    assert(row.isNullAt(1)) // NaN/None -> sentinel happens later (P24)
  }
}
