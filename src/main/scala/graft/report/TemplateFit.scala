package graft.report

import org.apache.spark.sql.DataFrame

/** Driver-side binned signal-strength fit — the numeric step between
  * the engine's template histograms (StageQueries.s04/a10) and the
  * datacard text (Datacards). Mirrors what the reference's fit stage
  * consumes (stage3/fitter.py takes the engine-delivered distributions;
  * SURVEY scopes the full RooFit pdf zoo out-of-engine) by providing
  * the standard single-parameter template fit users run first:
  * maximize the binned Poisson likelihood
  *     L(μ) = Π_b Pois(d_b | μ·s_b + b_b)
  * over the signal strength μ by Newton iteration on the score
  *     dlogL/dμ  = Σ_b s_b·(d_b/(μ·s_b + b_b) − 1)
  *     d²logL/dμ² = −Σ_b s_b²·d_b/(μ·s_b + b_b)²
  * with the asymptotic uncertainty 1/√(−d²logL/dμ²) at μ̂.
  *
  * The input is an engine-delivered BINNED table (O(bins) rows — the
  * collect is intentional and bounded, the Datacards convention); all
  * heavy lifting (the 100 TB → bins reduction) already happened in the
  * engine's histogram aggregation.
  */
object TemplateFit {

  final case class FitResult(mu: Double, muErr: Double, nIters: Int,
      converged: Boolean, logLikelihoodAtMin: Double)

  /** Newton fit of μ on (obs, sig, bkg) triples. Bins with s_b = 0
    * contribute no μ information and are skipped in the score. */
  def fitMu(bins: Seq[(Double, Double, Double)], muInit: Double = 1.0,
      tol: Double = 1e-12, maxIters: Int = 100): FitResult = {
    require(bins.nonEmpty, "empty template")
    var mu = muInit
    var it = 0
    var conv = false
    while (it < maxIters && !conv) {
      var score = 0.0
      var curv = 0.0 // d²logL/dμ² (negative near the max)
      bins.foreach { case (d, s0, b) =>
        val lam = mu * s0 + b
        if (s0 != 0.0 && lam > 0.0) {
          score += s0 * (d / lam - 1.0)
          curv -= s0 * s0 * d / (lam * lam)
        }
      }
      if (curv == 0.0) { conv = true } // flat: no signal sensitivity
      else {
        val step = score / curv
        mu -= step
        // keep expected counts positive: back off into the physical region
        val minLam = bins.iterator.map { case (_, s0, b) => mu * s0 + b }.min
        if (minLam <= 0.0) mu = (mu + step) / 2.0
        conv = math.abs(step) < tol
      }
      it += 1
    }
    var curvAtMin = 0.0
    var ll = 0.0
    bins.foreach { case (d, s0, b) =>
      val lam = mu * s0 + b
      if (lam > 0.0) {
        curvAtMin -= s0 * s0 * d / (lam * lam)
        ll += d * math.log(lam) - lam // Poisson logL up to a μ-free term
      }
    }
    val err = if (curvAtMin < 0.0) 1.0 / math.sqrt(-curvAtMin) else Double.NaN
    FitResult(mu, err, it, conv, ll)
  }

  /** Fit from an engine histogram DataFrame with columns
    * (obs, sig, bkg) — one row per bin. */
  def fitMu(templates: DataFrame): FitResult = {
    val bins = templates.select("obs", "sig", "bkg").collect().toSeq
      .map(r => (num(r.get(0)), num(r.get(1)), num(r.get(2))))
    fitMu(bins)
  }

  private def num(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case x => x.toString.toDouble
  }
}
