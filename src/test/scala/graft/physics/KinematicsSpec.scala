package graft.physics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the kinematics column library (SURVEY.md §5:
  * p4_sum invariants, delta_phi range) over seeded random samples.
  * Reference math: /root/reference/python/math_tools.py:5-42,220-224. */
class KinematicsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def samples(n: Int): Seq[(Double, Double, Double, Double, Double, Double, Double, Double)] =
    Seq.fill(n)((
      0.1 + rnd.nextDouble() * 500.0, -4.7 + rnd.nextDouble() * 9.4,
      -math.Pi + rnd.nextDouble() * 2 * math.Pi, rnd.nextDouble() * 10.0,
      0.1 + rnd.nextDouble() * 500.0, -4.7 + rnd.nextDouble() * 9.4,
      -math.Pi + rnd.nextDouble() * 2 * math.Pi, rnd.nextDouble() * 10.0))

  private def eval(rows: Seq[(Double, Double, Double, Double, Double, Double, Double, Double)],
                   out: org.apache.spark.sql.Column): Seq[Double] = {
    import spark.implicits._
    rows.toDF("pt1", "eta1", "phi1", "m1", "pt2", "eta2", "phi2", "m2")
      .select(out.as("v")).collect().map(_.getDouble(0)).toSeq
  }

  test("deltaPhi is in [0, pi] and symmetric") {
    val rows = samples(200)
    val d1 = eval(rows, Kinematics.deltaPhi(col("phi1"), col("phi2")))
    val d2 = eval(rows, Kinematics.deltaPhi(col("phi2"), col("phi1")))
    d1.foreach(v => assert(v >= 0.0 && v <= math.Pi + 1e-12))
    d1.zip(d2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("deltaR is at least deltaEta and at least deltaPhi") {
    val rows = samples(200)
    val dr = eval(rows, Kinematics.deltaR(col("eta1"), col("phi1"), col("eta2"), col("phi2")))
    val de = eval(rows, Kinematics.deltaEta(col("eta1"), col("eta2")))
    val dp = eval(rows, Kinematics.deltaPhi(col("phi1"), col("phi2")))
    dr.lazyZip(de).lazyZip(dp).foreach { (r, e, p) =>
      assert(r >= e - 1e-12 && r >= p - 1e-12)
    }
  }

  test("p4SumMass is >= sum of rest masses and symmetric under swap") {
    val rows = samples(200)
    val m12 = eval(rows, Kinematics.p4SumMass(
      col("pt1"), col("eta1"), col("phi1"), col("m1"),
      col("pt2"), col("eta2"), col("phi2"), col("m2")))
    val m21 = eval(rows, Kinematics.p4SumMass(
      col("pt2"), col("eta2"), col("phi2"), col("m2"),
      col("pt1"), col("eta1"), col("phi1"), col("m1")))
    m12.zip(rows).foreach { case (m, r) =>
      assert(m >= (r._4 + r._8) - 1e-6, s"mass $m below rest masses")
    }
    m12.zip(m21).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)))
    }
  }

  test("cosThetaCS is in (-1, 1)") {
    val rows = samples(200)
    val v = eval(rows, Kinematics.cosThetaCS(col("eta1"), col("eta2")))
    v.foreach(x => assert(x > -1.0 && x < 1.0))
  }

  test("portable hyperbolics match JVM math") {
    val xs = Seq(-3.0, -1.0, -0.1, 0.0, 0.1, 1.0, 3.0)
    import spark.implicits._
    val df = xs.toDF("x")
    val got = df.select(
      Kinematics.sinhP(col("x")).as("sinh"),
      Kinematics.coshP(col("x")).as("cosh"),
      Kinematics.tanhP(col("x")).as("tanh"),
      Kinematics.asinhP(col("x")).as("asinh")).collect()
    got.zip(xs).foreach { case (r, x) =>
      assert(math.abs(r.getDouble(0) - math.sinh(x)) < 1e-12)
      assert(math.abs(r.getDouble(1) - math.cosh(x)) < 1e-12)
      assert(math.abs(r.getDouble(2) - math.tanh(x)) < 1e-12)
      assert(math.abs(r.getDouble(3) -
        math.log(x + math.sqrt(x * x + 1))) < 1e-12)
    }
  }

  test("rapidity equals eta for massless particles") {
    val rows = Seq((50.0, 1.5, 0.3, 0.0, 1e-9, 0.0, 0.0, 0.0))
    val rap = eval(rows, Kinematics.p4SumRap(
      col("pt1"), col("eta1"), col("phi1"), col("m1"),
      col("pt2"), col("eta2"), col("phi2"), col("m2")))
    assert(math.abs(rap.head - 1.5) < 1e-3)
  }
}
