package graft.report

import graft.SparkSpec

/** Round-trip tests for the stage-3 shape-analysis reporting sinks:
  * the uncertainty JSON writer and the shape datacard renderer
  * (reference: stage3/uncertainty_jsonwriter.py + makeshapebased_
  * datacard.py). Engine-delivered tables are tiny; the emitters are
  * driver-side text formatting, so the tests check structure and the
  * write→parse→render chain, SinksSpec-style. */
class ShapeDatacardSpec extends SparkSpec {

  private val processes = Seq("ggh", "qqh")

  private def uncDf = {
    import spark.implicits._
    // the reference's uncertainty_v1 content, as an engine table
    Seq(
      ("lumi_13TeV_2018", "lnN", "ggh", "1.007"),
      ("lumi_13TeV_2018", "lnN", "qqh", "1.007"),
      ("QCDscale_qqH", "lnN", "qqh", "0.997/1.004"))
      .toDF("name", "unc_type", "process", "value")
  }

  test("uncertainty JSON writer emits '-' for unaffected processes and round-trips") {
    val json = UncertaintyJson.renderAll(uncDf, processes :+ "bkg")
    assert(json.contains("\"lumi_13TeV_2018\""))
    assert(json.contains("\"0.997/1.004\""))
    // ggh unaffected by QCDscale_qqH, bkg by everything -> "-"
    val parsed = UncertaintyJson.parse(json)
    assert(parsed.map(_._1) == Seq("lumi_13TeV_2018", "QCDscale_qqH"))
    val qcd = parsed.find(_._1 == "QCDscale_qqH").get
    assert(qcd._2 == "lnN")
    assert(qcd._3("ggh") == "-" && qcd._3("qqh") == "0.997/1.004" &&
      qcd._3("bkg") == "-")
    val lumi = parsed.find(_._1 == "lumi_13TeV_2018").get
    assert(lumi._3("ggh") == "1.007" && lumi._3("bkg") == "-")
  }

  test("shape datacard binds each process to a workspace pdf with unit rates") {
    val json = UncertaintyJson.renderAll(uncDf, processes :+ "bkg")
    val card = ShapeDatacards.render(
      "125", "dcb", "bwzr", "0_2018", processes, json)
    val lines = card.linesIterator.toSeq
    // header + shapes block
    assert(lines.take(3) == Seq("imax *", "jmax *", "kmax *"))
    assert(lines.contains(
      "shapes ggh_hmm cat0_2018 workspace_125_dcb_0_2018.txt w:ggh_cat0_2018_pdf"))
    assert(lines.contains(
      "shapes bkg cat0_2018 workspace_125_bwzr_0_2018.txt w:bkg_cat0_2018_pdf"))
    assert(lines.contains("observation -1"))
    // process block: signal ids -(n-1)..0 exactly as the reference's
    // makeshapebased_datacard.py emits (-len(Channels)+isig, isig from
    // 1), bkg = 1, all rates 1
    assert(lines.contains("process ggh_hmm qqh_hmm bkg"))
    assert(lines.contains("process -1 0 1"))
    assert(lines.contains("rate 1 1 1"))
    // nuisance matrix: one cell per process column
    assert(lines.contains("lumi_13TeV_2018 lnN 1.007 1.007 -"))
    assert(lines.contains("QCDscale_qqH lnN - 0.997/1.004 -"))
  }

  test("shape datacard + uncertainty JSON survive a file round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft_shapecard")
    val json = UncertaintyJson.renderAll(uncDf, processes :+ "bkg")
    val jPath = out.resolve("uncertainty_v1.json")
    java.nio.file.Files.writeString(jPath, json)
    val back = java.nio.file.Files.readString(jPath)
    val card = ShapeDatacards.render("125", "dcb", "bwzr", "0_2018",
      processes, back)
    val cPath = out.resolve("datacard_125_dcb_bwzr_0_2018.txt")
    java.nio.file.Files.writeString(cPath, card)
    assert(java.nio.file.Files.readString(cPath) == card)
    assert(card.linesIterator.count(_.startsWith("shapes ")) == processes.size + 2)
  }
}
