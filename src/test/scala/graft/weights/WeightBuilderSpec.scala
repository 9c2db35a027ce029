package graft.weights

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference Weights fold semantics
  * (/root/reference/stage1/weights.py:11-71): nominal is the running
  * product; _off removes one factor; _up/_down substitute it. */
class WeightBuilderSpec extends SparkSpec {

  test("nominal is the product; off/up/down substitute correctly") {
    import spark.implicits._
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val wb = WeightBuilder()
      .add("wa", col("a"), col("a") * 10.0, col("a") / 10.0)
      .add("wb", col("b"))
    val out = df.select(wb.columns: _*).collect().head
    val byName = wb.named.map(_._1).zipWithIndex.toMap
    def v(n: String): Double = out.getDouble(byName(n))
    def ~=(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-12
    assert(~=(v("wgt_nominal"), 6.0))
    assert(~=(v("wgt_wa_off"), 3.0))   // product without a
    assert(~=(v("wgt_wa_up"), 60.0))   // (a*10)*b
    assert(~=(v("wgt_wa_down"), 0.6))  // (a/10)*b
    assert(~=(v("wgt_wb_off"), 2.0))   // product without b
  }

  test("empty builder yields nominal 1.0") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val out = df.select(WeightBuilder().columns: _*).collect().head
    assert(out.getDouble(0) == 1.0)
  }
}
