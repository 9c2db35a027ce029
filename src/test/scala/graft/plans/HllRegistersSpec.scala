package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HllRegisters semantics: partition-layout invariance (the mergeable-
  * sketch contract) and estimator accuracy against exact counts. */
class HllRegistersSpec extends SparkSpec {

  private def hashed = {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    (1L to 20000L).map(i => (i % 7, (i * 2654435761L) % 2147483647L))
      .toDF("g", "hv")
  }

  test("registers are identical whatever the partitioning (merge = max)") {
    val one = hashed.repartition(1).groupBy("g")
      .agg(expr("hll_registers(hv, 9)").as("regs")).orderBy("g").collect()
    val many = hashed.repartition(16).groupBy("g")
      .agg(expr("hll_registers(hv, 9)").as("regs")).orderBy("g").collect()
    assert(one.length == 7)
    one.zip(many).foreach { case (a, b) =>
      assert(a.getSeq[Int](1) == b.getSeq[Int](1))
    }
  }

  test("estimate lands within 10% of the exact distinct count") {
    val m = 512.0
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val rows = hashed.groupBy("g")
      .agg(expr("hll_registers(hv, 9)").as("regs"),
        countDistinct(col("hv")).as("exact"))
      .withColumn("est",
        expr(s"$alpha * ${m * m} / aggregate(regs, CAST(0 AS DOUBLE), " +
          "(acc, r) -> acc + power(2.0D, -r))"))
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val est = r.getAs[Double]("est")
      assert(math.abs(est - exact) / exact < 0.10,
        s"group ${r.get(0)}: est $est vs exact $exact")
    }
  }
}
