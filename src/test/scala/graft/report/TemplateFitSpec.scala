package graft.report

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemplateFitSpec extends SparkSpec {

  test("recovers exact mu when data = mu*sig + bkg (analytic optimum)") {
    // At obs ≡ μ₀·s + b the score vanishes exactly at μ = μ₀.
    val bins = Seq.tabulate(40) { i =>
      val s0 = math.exp(-math.pow(i - 20.0, 2) / 50.0) * 30.0
      val b = 5.0 + 0.2 * i
      (2.0 * s0 + b, s0, b)
    }
    val r = TemplateFit.fitMu(bins)
    assert(r.converged, s"did not converge: $r")
    assert(math.abs(r.mu - 2.0) < 1e-9, s"mu=${r.mu}")
    assert(r.muErr > 0 && r.muErr < 1.0)
  }

  test("background-only data fits mu ~ 0 and errors scale as 1/sqrt(stat)") {
    val mk = (scale: Double) => Seq.tabulate(40) { i =>
      val s0 = math.exp(-math.pow(i - 20.0, 2) / 50.0) * 30.0 * scale
      val b = (5.0 + 0.2 * i) * scale
      (b, s0, b)
    }
    val r1 = TemplateFit.fitMu(mk(1.0))
    val r100 = TemplateFit.fitMu(mk(100.0))
    assert(math.abs(r1.mu) < 1e-9)
    // 100x the statistics -> 10x smaller uncertainty
    assert(math.abs(r1.muErr / r100.muErr - 10.0) < 0.1,
      s"err1=${r1.muErr} err100=${r100.muErr}")
  }

  test("fits from an engine-delivered DataFrame (a10-shaped histogram)") {
    import spark.implicits._
    val df = Seq.tabulate(20) { i =>
      val s0 = 10.0 + i.toDouble
      val b = 50.0
      (1.5 * s0 + b, s0, b)
    }.toDF("obs", "sig", "bkg")
    val r = TemplateFit.fitMu(df)
    assert(r.converged && math.abs(r.mu - 1.5) < 1e-9)
  }

  test("zero-signal template reports flat likelihood without diverging") {
    val r = TemplateFit.fitMu(Seq((10.0, 0.0, 10.0), (20.0, 0.0, 20.0)))
    assert(r.converged)
    assert(r.muErr.isNaN)
  }
}
