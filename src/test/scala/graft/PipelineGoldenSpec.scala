package graft

import org.apache.spark.sql.functions._

/** Golden-chain test in the reference's own testing philosophy
  * (tests/test_continuous.py:80-98: run the full stage1→stage2→stage3
  * chain over a fixed fixture and assert EXACT pinned values). The
  * fixture is the driver-generated sf0.001 testdata — deterministic by
  * construction — and the pinned goldens were produced by this code
  * and cross-checked against the DuckDB oracle (s01/s03/s04 are all
  * green CORRECTNESS rows), so any future regression in selection,
  * weighting, histogramming, or rendering breaks an exact number here
  * rather than a tautological self-comparison. */
class PipelineGoldenSpec extends SparkSpec {

  test("stage1 golden: 69 selected events split 23/13/33 across regions") {
    val s1 = queries.StageQueries.queries("s01_stage1_pipeline")(spark, sf("sf0.001"))
    assert(s1.count() == 69L)
    val byRegion = s1.groupBy(col("region")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRegion == Map("h-peak" -> 23L, "h-sidebands" -> 13L, "z-peak" -> 33L))
  }

  test("stage2 golden: 140 histogram rows, nominal integral 742.52590") {
    val hist = queries.StageQueries.queries("s03_stage2_histograms")(spark, sf("sf0.001"))
    assert(hist.count() == 140L)
    val integral = hist.filter(col("variation") === "nominal")
      .agg(sum(col("value"))).head.getDouble(0)
    // value is float32; the 140-row double accumulation is pinned to
    // float-level precision (order-independent at this magnitude)
    assert(math.abs(integral - 742.5258964300156) < 1e-4,
      s"nominal integral $integral drifted from golden 742.5258964300156")
  }

  test("stage3b golden: exported TH1D templates round-trip with the pinned integral") {
    val hist = queries.StageQueries.queries("s03_stage2_histograms")(spark, sf("sf0.001"))
    val out = java.nio.file.Files.createTempDirectory("graft_tmpl").toString +
      "/templates.root"
    val specs = report.TemplateExport.writeTemplates(hist, out)
    // 3 regions x 4 channels x 2 variations at this fixture
    assert(specs.size == 24, s"expected 24 templates, got ${specs.size}")
    val back = spark.read.format("root-hist").option("path", out).load()
    // nominal templates re-integrate to the pinned stage-2 golden
    val nomSum = back.filter(col("hist").endsWith("__nominal"))
      .agg(sum(col("content"))).head.getDouble(0)
    assert(math.abs(nomSum - 742.5258964300156) < 1e-4,
      s"template nominal integral $nomSum drifted from golden 742.5258964300156")
    assert(back.select(countDistinct(col("hist"))).head.getLong(0) == 24)
  }

  test("stage3c golden: SVG panels render deterministic marks per region") {
    val ratio = queries.StageQueries.queries("s12_rebin_ratio")(spark, sf("sf0.001"))
    val panels = report.PlotSvg.renderAll(ratio)
    // s12's table keeps the "none" control region (unlike s03/s04,
    // which filter it) — the panel set mirrors its input
    assert(panels.keySet == Set("h-peak", "h-sidebands", "z-peak", "none"))
    panels.foreach { case (region, svg) =>
      assert(svg.startsWith("<svg ") && svg.endsWith("</svg>\n"))
      val nBins = ratio.filter(col("region") === region).count().toInt
      def count(cls: String) = s"""class="$cls"""".r.findAllIn(svg).size
      assert(count("mc") == nBins, s"$region: mc bars != $nBins")
      assert(count("data") == nBins, s"$region: data points != $nBins")
      // ratio marks only where the ratio is defined
      val nRatio = ratio.filter(col("region") === region &&
        col("ratio").isNotNull).count().toInt
      assert(count("ratio") == nRatio, s"$region: ratio points != $nRatio")
      assert(svg.contains("""class="unity""""))
    }
  }

  test("stage3e golden: variation-band panels render one band pair per bin") {
    val band = queries.StageQueries.queries("s15_variation_band")(spark, sf("sf0.001"))
    val panels = report.PlotSvg.renderBandAll(band)
    assert(panels.nonEmpty, "no band panels rendered")
    // the intersection drops the pu_* pair dataset 'N' lacks — the band
    // exists for every (region, channel) the histogram table carries
    val pairs = band.select(col("region"), col("channel")).distinct().count()
    assert(panels.size == pairs.toInt, s"panels ${panels.size} != $pairs pairs")
    panels.foreach { case ((region, channel), svg) =>
      assert(svg.startsWith("<svg ") && svg.endsWith("</svg>\n"))
      val nBins = band.filter(col("region") === region &&
        col("channel") === channel).count().toInt
      def count(cls: String) = s"""class="$cls"""".r.findAllIn(svg).size
      assert(count("envband") == nBins, s"$region/$channel: envband != $nBins")
      assert(count("quadband") == nBins, s"$region/$channel: quadband != $nBins")
      assert(count("nomstep") == nBins, s"$region/$channel: nomstep != $nBins")
    }
  }

  test("stage3d golden: fit panel renders 6 rank-colored curves + winner pulls") {
    val fit = queries.FitQueries.queries("f24_fit_frame_pulls")(spark, sf("sf0.001"))
    val svg = report.PlotSvg.renderFit(fit)
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>\n"))
    def count(cls: String) = s"""class="$cls"""".r.findAllIn(svg).size
    // 6 families x 80 bins: one curve polyline + legend entry per
    // family, one data point + error bar per bin, one pull bar per bin
    // for the f22 winner, and the zero line on the pull pad
    assert(count("curve") == 6, "curve polylines != 6")
    assert(count("legend") == 6, "legend entries != 6")
    assert(count("data") == 80, "data points != 80")
    assert(count("derr") == 80, "data error bars != 80")
    assert(count("pull") == 80, "pull bars != 80")
    assert(svg.contains("""class="zero""""))
    // rank-1 family leads the legend with the reference's kRed
    assert(svg.contains(""">1. """) && svg.contains("#ff0000"))
  }

  test("stage3 golden: z-peak/vbf yields and the rendered datacard lines") {
    val yields = queries.StageQueries.queries("s04_stage3_templates")(spark, sf("sf0.001"))
    val zvbf = yields.filter(col("region") === "z-peak" && col("channel") === "vbf")
      .head()
    val yNom = zvbf.getAs[Float]("yield_nominal")
    val unc = zvbf.getAs[Float]("rate_unc")
    assert(math.abs(yNom - 217.29813f) / 217.29813f < 1e-5,
      s"z-peak/vbf yield_nominal $yNom drifted from golden 217.29813")
    assert(math.abs(unc - 1.0266998f) < 1e-5,
      s"z-peak/vbf rate_unc $unc drifted from golden 1.0266998")
    val cards = report.Datacards.renderAll(yields)
    assert(cards.keySet == Set("h-peak", "h-sidebands", "z-peak"))
    val z = cards("z-peak")
    // exact rendered text, not just structure: the rate and nuisance
    // lines carry the pinned yields at the renderer's 4-decimal format
    assert(z.contains("217.2981"), s"rate line lost the vbf yield:\n$z")
    assert(z.contains("1.0267"), s"jes lnN line lost the vbf unc:\n$z")
    assert(z.linesIterator.exists(l => l.startsWith("rate") && l.contains("17.8359")
      && l.contains("61.7894") && l.contains("20.9652") && l.contains("217.2981")),
      s"rate line does not carry all four channel yields in order:\n$z")
  }
}
