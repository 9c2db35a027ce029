package graft.report

import org.apache.spark.sql.{DataFrame, Row}

/** Stack/ratio panel rendering as standalone SVG — the engine-side
  * analog of the reference's matplotlib plotter
  * (stage3/plotter.py:94-249: a stacked-MC-vs-data pad over a
  * data/MC-ratio pad with error bands). The reference renders with a
  * Python plotting stack the engine deliberately has no dependency on;
  * this renders the SAME figure from the s12 rebin+ratio table
  * (region, cbin, data_n, mc_val, mc_err, ratio, ratio_err, pull) as
  * deterministic SVG text — pure driver-side formatting of a tiny
  * collected table, the Datacards pattern. Numeric layout is exact
  * (fixed-format coordinates), so goldens can assert on the rendered
  * text. */
object PlotSvg {

  private val W = 640.0
  private val HMain = 300.0
  private val HRatio = 120.0
  private val PadL = 50.0
  private val PadR = 15.0
  private val PadT = 25.0
  private val Gap = 10.0

  private def f(v: Double): String = f"$v%.2f"

  /** Render one region's panel. Rows must be that region's s12 rows
    * (any order; sorted by cbin here). Returns a complete SVG document. */
  def render(region: String, rows: Seq[Row]): String = {
    val rs = rows.sortBy(_.getAs[Long]("cbin"))
    require(rs.nonEmpty, s"no rows for region $region")
    val n = rs.size
    val plotW = W - PadL - PadR
    val bw = plotW / n
    // floor keeps an all-empty panel renderable (0-height bars at the
    // axis) instead of dividing by zero into NaN coordinates
    val yMax = math.max(1e-12, math.max(
      rs.map(_.getAs[Long]("data_n").toDouble).max,
      rs.map(r => r.getAs[Float]("mc_val").toDouble +
        r.getAs[Float]("mc_err").toDouble).max)) * 1.15
    def x(i: Int) = PadL + i * bw
    def yM(v: Double) = PadT + HMain - (v / yMax) * HMain
    val H = PadT + HMain + Gap + HRatio + 30.0
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${W.toInt}" height="${H.toInt}" font-family="monospace" font-size="10">\n"""
    sb ++= s"""<text x="${f(PadL)}" y="15" font-size="13">$region — data vs MC (stack + ratio)</text>\n"""
    // main pad frame
    sb ++= s"""<rect x="${f(PadL)}" y="${f(PadT)}" width="${f(plotW)}" height="${f(HMain)}" fill="none" stroke="black"/>\n"""
    // MC stack bars + error band, then data points with sqrt(n) bars
    rs.zipWithIndex.foreach { case (r, i) =>
      val mc = r.getAs[Float]("mc_val").toDouble
      val me = r.getAs[Float]("mc_err").toDouble
      val dn = r.getAs[Long]("data_n").toDouble
      sb ++= s"""<rect class="mc" x="${f(x(i))}" y="${f(yM(mc))}" width="${f(bw)}" height="${f(yM(0) - yM(mc))}" fill="#4477aa" fill-opacity="0.6"/>\n"""
      sb ++= s"""<rect class="mcerr" x="${f(x(i))}" y="${f(yM(mc + me))}" width="${f(bw)}" height="${f(yM(mc - me) - yM(mc + me))}" fill="#000000" fill-opacity="0.15"/>\n"""
      val de = math.sqrt(math.max(dn, 0.0))
      val cx = x(i) + bw / 2
      sb ++= s"""<line class="derr" x1="${f(cx)}" y1="${f(yM(dn - de))}" x2="${f(cx)}" y2="${f(yM(dn + de))}" stroke="black"/>\n"""
      sb ++= s"""<circle class="data" cx="${f(cx)}" cy="${f(yM(dn))}" r="2.5" fill="black"/>\n"""
    }
    // ratio pad: data/MC around the unity line, ±ratio_err bars
    val rTop = PadT + HMain + Gap
    val rLo = 0.5; val rHi = 1.5
    def yR(v: Double) =
      rTop + HRatio - ((math.min(math.max(v, rLo), rHi) - rLo) / (rHi - rLo)) * HRatio
    sb ++= s"""<rect x="${f(PadL)}" y="${f(rTop)}" width="${f(plotW)}" height="${f(HRatio)}" fill="none" stroke="black"/>\n"""
    sb ++= s"""<line class="unity" x1="${f(PadL)}" y1="${f(yR(1.0))}" x2="${f(PadL + plotW)}" y2="${f(yR(1.0))}" stroke="#888888" stroke-dasharray="4,3"/>\n"""
    rs.zipWithIndex.foreach { case (r, i) =>
      if (!r.isNullAt(r.fieldIndex("ratio"))) {
        val rt = r.getAs[Float]("ratio").toDouble
        val re = if (r.isNullAt(r.fieldIndex("ratio_err"))) 0.0
          else r.getAs[Float]("ratio_err").toDouble
        val cx = x(i) + bw / 2
        sb ++= s"""<line class="rerr" x1="${f(cx)}" y1="${f(yR(rt - re))}" x2="${f(cx)}" y2="${f(yR(rt + re))}" stroke="black"/>\n"""
        sb ++= s"""<circle class="ratio" cx="${f(cx)}" cy="${f(yR(rt))}" r="2" fill="black"/>\n"""
      }
    }
    // axis labels: y max on the main pad, ratio bounds on the ratio pad
    sb ++= s"""<text x="2" y="${f(PadT + 10)}">${f(yMax)}</text>\n"""
    sb ++= s"""<text x="2" y="${f(rTop + 10)}">${f(rHi)}</text>\n"""
    sb ++= s"""<text x="2" y="${f(rTop + HRatio)}">${f(rLo)}</text>\n"""
    sb ++= s"""<text x="${f(PadL)}" y="${f(H - 8)}">bins 1..$n (coarse mass)</text>\n"""
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Colors for the model curves, in rank order — the reference's
    * fit_plots.py:3-26 colors list (kRed, kGreen, kBlue, ...), here as
    * their hex equivalents. */
  private val curveColors = Seq("#ff0000", "#00ff00", "#0000ff",
    "#ffff00", "#7f00ff", "#808080")

  /** Render the fit frame + pull panel from the f24 table — the
    * engine-side analog of stage3/fit_plots.py:56-232: every family's
    * window-normalized fitted curve (rank-colored polylines) over the
    * 80-bin data overlay with √n error bars, and the f22 winner's
    * per-bin pull pad below (pullHist's symmetric-Poisson form).
    * Input is the tiny 6×80-row f24 frame — collect is intentional. */
  def renderFit(fitTable: DataFrame, title: String = "Background"): String = {
    val rows = fitTable.collect().toSeq
    require(rows.nonEmpty, "empty fit table")
    val byFam = rows.groupBy(_.getAs[String]("family")).toSeq
      .sortBy(_._2.head.getAs[Int]("rank"))
    val nBins = rows.map(_.getAs[Int]("bin")).max + 1
    val plotW = W - PadL - PadR
    val bw = plotW / nBins
    val yMax = math.max(1e-12, math.max(
      rows.map(_.getAs[Long]("n_b").toDouble).max,
      rows.map(_.getAs[Float]("e_fit").toDouble).max)) * 1.15
    def x(i: Int) = PadL + i * bw
    def yM(v: Double) = PadT + HMain - (v / yMax) * HMain
    val H = PadT + HMain + Gap + HRatio + 30.0
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${W.toInt}" height="${H.toInt}" font-family="monospace" font-size="10">\n"""
    sb ++= s"""<text x="${f(PadL)}" y="15" font-size="13">$title fit — models vs data (${nBins} bins) + winner pull</text>\n"""
    sb ++= s"""<rect x="${f(PadL)}" y="${f(PadT)}" width="${f(plotW)}" height="${f(HMain)}" fill="none" stroke="black"/>\n"""
    // data overlay: winner rows carry the same n_b as every family
    val dataRows = byFam.head._2.sortBy(_.getAs[Int]("bin"))
    dataRows.foreach { r =>
      val i = r.getAs[Int]("bin")
      val dn = r.getAs[Long]("n_b").toDouble
      val de = math.sqrt(math.max(dn, 0.0))
      val cx = x(i) + bw / 2
      sb ++= s"""<line class="derr" x1="${f(cx)}" y1="${f(yM(dn - de))}" x2="${f(cx)}" y2="${f(yM(dn + de))}" stroke="black"/>\n"""
      sb ++= s"""<circle class="data" cx="${f(cx)}" cy="${f(yM(dn))}" r="2" fill="black"/>\n"""
    }
    // one polyline per family curve, rank-colored, legend at top right
    byFam.zipWithIndex.foreach { case ((fam, rs), k) =>
      val pts = rs.sortBy(_.getAs[Int]("bin")).map { r =>
        val cx = x(r.getAs[Int]("bin")) + bw / 2
        s"${f(cx)},${f(yM(r.getAs[Float]("e_fit").toDouble))}"
      }.mkString(" ")
      val color = curveColors(k % curveColors.size)
      sb ++= s"""<polyline class="curve" points="$pts" fill="none" stroke="$color" stroke-width="1.5"/>\n"""
      sb ++= s"""<text class="legend" x="${f(W - PadR - 170)}" y="${f(PadT + 14 + 12 * k)}" fill="$color">${rs.head.getAs[Int]("rank")}. $fam</text>\n"""
    }
    // pull pad: winner only, ±4 range (fit_plots.py:220 SetRangeUser)
    val rTop = PadT + HMain + Gap
    val pLo = -4.0; val pHi = 4.0
    def yP(v: Double) =
      rTop + HRatio - ((math.min(math.max(v, pLo), pHi) - pLo) / (pHi - pLo)) * HRatio
    sb ++= s"""<rect x="${f(PadL)}" y="${f(rTop)}" width="${f(plotW)}" height="${f(HRatio)}" fill="none" stroke="black"/>\n"""
    sb ++= s"""<line class="zero" x1="${f(PadL)}" y1="${f(yP(0.0))}" x2="${f(PadL + plotW)}" y2="${f(yP(0.0))}" stroke="#888888" stroke-dasharray="4,3"/>\n"""
    dataRows.foreach { r =>
      val i = r.getAs[Int]("bin")
      val p = r.getAs[Float]("pull").toDouble
      val y0 = yP(0.0); val y1 = yP(p)
      sb ++= s"""<rect class="pull" x="${f(x(i))}" y="${f(math.min(y0, y1))}" width="${f(bw)}" height="${f(math.abs(y0 - y1))}" fill="#4477aa"/>\n"""
    }
    sb ++= s"""<text x="2" y="${f(PadT + 10)}">${f(yMax)}</text>\n"""
    sb ++= s"""<text x="2" y="${f(rTop + 10)}">${f(pHi)}</text>\n"""
    sb ++= s"""<text x="2" y="${f(rTop + HRatio)}">${f(pLo)}</text>\n"""
    sb ++= s"""<text x="${f(PadL)}" y="${f(H - 8)}">m 110-150 GeV, ${nBins} bins</text>\n"""
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Render one (region, channel)'s systematic-band panel from s15 rows
    * (the make_templates.py:92-104 intersected variation set): the
    * light envelope band (min..max across surviving variations), the
    * darker quadrature band (nominal ± band_quad), and the nominal
    * step line — plotter.py:160-170's stat/syst band as deterministic
    * SVG. Mark classes (envband/quadband/nomstep) are one-per-bin so
    * goldens can count them. */
  def renderBand(region: String, channel: String, rows: Seq[Row]): String = {
    val rs = rows.sortBy(_.getAs[Long]("bin"))
    require(rs.nonEmpty, s"no band rows for $region/$channel")
    val n = rs.size
    val plotW = W - PadL - PadR
    val bw = plotW / n
    val yMax = math.max(1e-12,
      rs.map(_.getAs[Float]("env_hi").toDouble).max) * 1.15
    def x(i: Int) = PadL + i * bw
    def yM(v: Double) = PadT + HMain - (math.max(v, 0.0) / yMax) * HMain
    val H = PadT + HMain + 30.0
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${W.toInt}" height="${H.toInt}" font-family="monospace" font-size="10">\n"""
    sb ++= s"""<text x="${f(PadL)}" y="15" font-size="13">$region / $channel — nominal + variation band</text>\n"""
    sb ++= s"""<rect x="${f(PadL)}" y="${f(PadT)}" width="${f(plotW)}" height="${f(HMain)}" fill="none" stroke="black"/>\n"""
    rs.zipWithIndex.foreach { case (r, i) =>
      val nom = r.getAs[Float]("nominal").toDouble
      val lo = r.getAs[Float]("env_lo").toDouble
      val hi = r.getAs[Float]("env_hi").toDouble
      val q = r.getAs[Float]("band_quad").toDouble
      sb ++= s"""<rect class="envband" x="${f(x(i))}" y="${f(yM(hi))}" width="${f(bw)}" height="${f(yM(lo) - yM(hi))}" fill="#ddaa33" fill-opacity="0.35"/>\n"""
      sb ++= s"""<rect class="quadband" x="${f(x(i))}" y="${f(yM(nom + q))}" width="${f(bw)}" height="${f(yM(nom - q) - yM(nom + q))}" fill="#000000" fill-opacity="0.18"/>\n"""
      sb ++= s"""<line class="nomstep" x1="${f(x(i))}" y1="${f(yM(nom))}" x2="${f(x(i) + bw)}" y2="${f(yM(nom))}" stroke="#4477aa" stroke-width="1.5"/>\n"""
    }
    sb ++= s"""<text x="2" y="${f(PadT + 10)}">${f(yMax)}</text>\n"""
    sb ++= s"""<text x="${f(PadL)}" y="${f(H - 8)}">bins (mass), intersected variation set</text>\n"""
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Render every (region, channel) panel in an s15-shaped DataFrame.
    * The input is tiny (regions × channels × bins) — collect is
    * intentional. */
  def renderBandAll(bandTable: DataFrame): Map[(String, String), String] = {
    val rows = bandTable.collect().toSeq
    rows.map(r => (r.getAs[String]("region"), r.getAs[String]("channel")))
      .distinct.sorted
      .map { case (reg, ch) => (reg, ch) -> renderBand(reg, ch,
        rows.filter(r => r.getAs[String]("region") == reg &&
          r.getAs[String]("channel") == ch)) }.toMap
  }

  /** Render every region in an s12-shaped DataFrame. The input is tiny
    * (regions × coarse bins) — collect is intentional. */
  def renderAll(ratioTable: DataFrame): Map[String, String] = {
    val rows = ratioTable.collect().toSeq
    rows.map(_.getAs[String]("region")).distinct.sorted
      .map(reg => reg ->
        render(reg, rows.filter(_.getAs[String]("region") == reg))).toMap
  }
}
