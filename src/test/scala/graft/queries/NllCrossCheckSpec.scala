package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-checks the f23 iterated unbinned-NLL Newton fit against the
  * f07 grid discretization of the same bwZredux family (the round-10
  * verdict's asked-for consistency gate): the continuous minimizer
  * must reach an NLL at least as low as EVERY candidate on f07's
  * (a1, a2) grid evaluated on the identical weighted-NLL objective
  * (a3 fixed at f23's −0.30). The grid evaluation here is an
  * INDEPENDENT implementation — plain double sums over the event
  * projection plus a driver-side quadrature — so it would catch a
  * sign/convention error in f23's quantized machinery, not just a
  * regression of it. Round 12 extends the same independent evaluator
  * to a central-finite-difference Hessian that pins f25's
  * inverse-Hessian parameter uncertainties.
  */
class NllCrossCheckSpec extends SparkSpec {

  // sf0.01: the scale the driver's oracle gate runs at; at sf0.001 the
  // 6k-row sample genuinely pushes a2's MLE above its box (clamped fit
  // — correct but not the interior trajectory this spec locks)
  private val dir = sf("sf0.01")
  private lazy val fit =
    graft.SparkEntry.queries("f23_nll_newton_fit")(spark, dir).head()
  // f07's RooRealVar-range grids (FitQueries.f07A1/f07A2 literals)
  private val gridA1 = Seq(0.7, 1.05, 1.39, 1.75, 2.1)
  private val gridA2 = Seq(0.30, 0.38, 0.46, 0.54, 0.62)
  private val a3f = -0.30

  // ---- independent weighted-NLL evaluator (unquantized) ------------------
  private lazy val ev = spark.read.parquet(s"$dir/lineitem.parquet")
    .select(expr("(110.0E0 + (l_extendedprice % 4000.0E0) / 100.0E0)").as("x"))
    .select(col("x"), expr("x / 100.0E0").as("t"))
    .withColumn("w", expr(
      "exp(0.40E0 * t - 0.30E0 * t * t) * 2.5E0" +
        " / (power(x - 91.2E0, 1.8E0) + power(1.25E0, 1.8E0))"))
    .localCheckpoint()
  private lazy val (sw, s1w, s2w) = {
    val c = ev.agg(
      sum(col("w")).as("sw"),
      sum(col("w") * col("t")).as("s1w"),
      sum(col("w") * col("t") * col("t")).as("s2w")).head()
    (c.getDouble(0), c.getDouble(1), c.getDouble(2))
  }
  private val sdCache = scala.collection.mutable.Map.empty[Double, Double]
  // only the ln-denominator term needs the corpus (one agg per distinct a1)
  private def sd(a1: Double): Double = sdCache.getOrElseUpdate(a1,
    ev.agg(sum(col("w") *
      expr(s"ln(power(x - 91.2E0, CAST('$a1' AS DOUBLE))" +
        s" + power(1.25E0, CAST('$a1' AS DOUBLE)))")).as("sd"))
      .head().getDouble(0))

  /** ∫ of the pdf at (a1, a2) over [110, 150) via the same 400-point
    * midpoint rule f23 uses, unquantized (tolerances absorb the diff). */
  private def lnN(a1: Double, a2: Double): Double = {
    var w = 0.0
    var g = 0
    while (g < 400) {
      val x = 110.0 + (g + 0.5) / 10.0
      val t = x / 100.0
      val d = math.pow(x - 91.2, a1) + math.pow(1.25, a1)
      w += math.exp(a2 * t + a3f * t * t) * 2.5 / d
      g += 1
    }
    math.log(w * 0.1)
  }
  private def nll(a1: Double, a2: Double): Double =
    -(a2 * s1w + a3f * s2w + sw * math.log(2.5) - sd(a1)) +
      sw * lnN(a1, a2)

  test("f23 Newton NLL beats every f07 grid candidate on the same objective") {
    val gridBest = (for { a1 <- gridA1; a2 <- gridA2 } yield nll(a1, a2)).min

    val a1Hat = fit.getFloat(2).toDouble
    val a2Hat = fit.getFloat(3).toDouble
    val nllW = fit.getFloat(4).toDouble
    // the fitted point is interior to the RooRealVar boxes
    assert(a1Hat > 0.7 && a1Hat < 2.1, s"a1_hat $a1Hat at box edge")
    assert(a2Hat > 0.30 && a2Hat < 0.62, s"a2_hat $a2Hat at box edge")
    // f23's reported per-weight NLL, rescaled to total, beats the grid
    val newtonNll = nllW * sw
    assert(newtonNll <= gridBest + 1e-3 * math.abs(gridBest),
      s"Newton NLL $newtonNll worse than grid best $gridBest")
    // and the independent evaluation of the fitted point agrees with
    // f23's own reported NLL (catches objective-definition drift)
    val independent = nll(a1Hat, a2Hat)
    assert(math.abs(independent - newtonNll) <= 1e-3 * math.abs(newtonNll),
      s"independent NLL $independent vs f23-reported $newtonNll")
  }

  test("f23 fitted params sit within one grid step of the f07 lattice argmin") {
    val a1Hat = fit.getFloat(2).toDouble
    val a2Hat = fit.getFloat(3).toDouble
    // grid steps: 0.35 in a1, 0.08 in a2 — the continuous optimum must
    // be within one step of SOME lattice point (sanity, not precision)
    assert(gridA1.exists(g => math.abs(g - a1Hat) <= 0.35))
    assert(gridA2.exists(g => math.abs(g - a2Hat) <= 0.08))
  }

  test("f25 inverse-Hessian uncertainties match a finite-difference Hessian") {
    val err = graft.SparkEntry.queries("f25_nll_fit_errors")(spark, dir).head()
    val a1 = err.getFloat(0).toDouble
    val a2 = err.getFloat(1).toDouble
    val sig1 = err.getFloat(2).toDouble
    val sig2 = err.getFloat(3).toDouble
    val rho = err.getFloat(4).toDouble
    // central differences of the INDEPENDENT evaluator at the reported
    // optimum: h = 1e-3 keeps truncation ~1e-6 relative while staying
    // far above double noise on these O(100)-magnitude NLL values
    val d = 1e-3
    val h11 = (nll(a1 + d, a2) - 2 * nll(a1, a2) + nll(a1 - d, a2)) / (d * d)
    val h22 = (nll(a1, a2 + d) - 2 * nll(a1, a2) + nll(a1, a2 - d)) / (d * d)
    val h12 = (nll(a1 + d, a2 + d) - nll(a1 + d, a2 - d) -
      nll(a1 - d, a2 + d) + nll(a1 - d, a2 - d)) / (4 * d * d)
    val det = h11 * h22 - h12 * h12
    assert(det > 0, s"FD Hessian not positive definite: $h11 $h12 $h22")
    val s1f = math.sqrt(h22 / det)
    val s2f = math.sqrt(h11 / det)
    val rf = -h12 / math.sqrt(h11 * h22)
    // 5 %: FD truncation + the 1e12 quantization in f25's corpus sums,
    // amplified by the strong (rho ~ 0.99) parameter degeneracy
    assert(math.abs(s1f - sig1) <= 0.05 * sig1, s"sig_a1 $sig1 vs FD $s1f")
    assert(math.abs(s2f - sig2) <= 0.05 * sig2, s"sig_a2 $sig2 vs FD $s2f")
    assert(math.abs(rf - rho) <= 0.01, s"rho $rho vs FD $rf")
  }
}
