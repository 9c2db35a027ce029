package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogrammerSpec extends SparkSpec {

  test("bucket maps edges correctly: under=0, over=n+1, inclusive lower") {
    import spark.implicits._
    val df = Seq(-1.0, 0.0, 3.999, 4.0, 159.999, 160.0, 1e9).toDF("x")
    val got = df.select(Histogrammer.bucket(col("x"), 0.0, 160.0, 40).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 40L, 41L, 41L))
  }

  test("histogram conserves total weight and counts sumw2") {
    import spark.implicits._
    val df = Seq((10.0, 2.0), (10.5, 3.0), (200.0, 1.0), (-5.0, 4.0))
      .toDF("x", "w")
    val h = Histogrammer.histogram(df, Seq(), col("x"), col("w"), 0.0, 160.0, 40)
    val rows = h.collect()
    val total = rows.map(_.getAs[Float]("value").toDouble).sum
    assert(math.abs(total - 10.0) < 1e-6)
    // both 10.0 and 10.5 land in bucket 3 ((10-0)*40/160=2.5 -> 3)
    val b3 = rows.find(_.getAs[Long]("bin") == 3L).get
    assert(math.abs(b3.getAs[Float]("value") - 5.0) < 1e-6)
    assert(math.abs(b3.getAs[Float]("sumw2") - 13.0) < 1e-6) // 4 + 9
  }

  test("histogram merge is re-aggregation (associativity)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i * 1.7 % 160.0, 1.0 + i % 3)).toDF("x", "w")
    val whole = Histogrammer.histogram(df, Seq(), col("x"), col("w"), 0.0, 160.0, 40)
    val part1 = Histogrammer.histogram(df.limit(50), Seq(), col("x"), col("w"), 0.0, 160.0, 40)
    val part2 = Histogrammer.histogram(df.except(df.limit(50)), Seq(), col("x"), col("w"), 0.0, 160.0, 40)
    val merged = part1.unionByName(part2)
      .groupBy(col("bin"))
      .agg(sum(col("value")).as("value"), sum(col("sumw2")).as("sumw2"))
    val w = whole.collect().map(r => r.getAs[Long]("bin") -> r.getAs[Float]("value").toDouble).toMap
    val m = merged.collect().map(r => r.getAs[Long]("bin") -> r.getAs[Double]("value")).toMap
    assert(w.keySet == m.keySet)
    w.foreach { case (k, v) => assert(math.abs(v - m(k)) < 1e-4) }
  }
}
