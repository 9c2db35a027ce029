package graft.report

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's OWN stage-2 CI golden, driven through this engine
  * over the reference's real fixture (`tests/test_stage2.py`): loading
  * `tests/samples/data_B_stage1_output.parquet`, applying the stage-2
  * entry NaN policy (weights NaN->0, others NaN->-999,
  * `stage2/postprocessor.py:79-81`), the channel cascade
  * (`stage2/categorizer.py:1-24`) and the histogrammer's yield slicer
  * (`stage2/histogrammer.py:84-112`) must reproduce the asserted
  * nominal yield of exactly **21.0** for (data_B, 2016, h-peak,
  * ggh_0jets). The stage-1 golden (391x122, dimuon_mass 117.1209375)
  * is NOT mirrorable: its input ROOT blob is stripped from the
  * checkout (`/root/reference/.MISSING_LARGE_BLOBS`, FIXTURES.md §1).
  */
class Stage2GoldenSpec extends SparkSpec {

  private def samples: java.io.File =
    new java.io.File(graft.queries.referenceDataRoot).getParentFile match {
      case null => new java.io.File("/root/reference/tests/samples")
      case root => new java.io.File(root, "tests/samples")
    }

  test("reference CI stage-2 golden: data_B h-peak ggh_0jets yield == 21.0") {
    val fx = new java.io.File(samples, "data_B_stage1_output.parquet")
    assume(fx.exists, s"reference fixture missing: $fx")
    val raw = spark.read.parquet(fx.getPath)
    // stage-2 entry NaN policy: weight columns -> 0, everything else
    // -> -999 (numeric only; region/dataset are strings)
    val wgtCols = raw.columns.filter(_.contains("wgt"))
    val numOther = raw.schema.fields
      .filter(f => !f.name.contains("wgt") &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name)
    val df = raw.na.fill(0.0, wgtCols).na.fill(-999.0, numOther)
    // categorizer.py cascade, v = nominal (ordered, first match wins)
    val channel = when(
        col("nBtagLoose_nominal") >= 2 || col("nBtagMedium_nominal") >= 1, "ttHorVH")
      .when(col("jj_mass_nominal") > 400 && col("jj_dEta_nominal") > 2.5 &&
        col("jet1_pt_nominal") > 35, "vbf")
      .when(col("njets_nominal") < 1, "ggh_0jets")
      .when(col("njets_nominal") === 1, "ggh_1jet")
      .otherwise("ggh_2orMoreJets")
    val sel = df.withColumn("channel_nominal", channel)
      .filter(col("dataset") === "data_B" && col("year") === 2016 &&
        col("region") === "h-peak" && col("channel_nominal") === "ggh_0jets")
    val row = sel.agg(count(lit(1)), sum(col("wgt_nominal"))).head()
    assert(row.getLong(0) == 21L)
    assert(row.getDouble(1) == 21.0) // data weights are exactly 1.0
    // the engine's histogrammer over the same slice reproduces the
    // in-range content (dimuon_mass 50 bins on [110, 150], the
    // variables.py axis): integral == events in range
    val inRange = sel.filter(col("dimuon_mass") >= 110.0 && col("dimuon_mass") < 150.0)
      .count()
    val hist = graft.agg.Histogrammer.histogram(sel, Seq(col("region")),
      col("dimuon_mass"), col("wgt_nominal"), 110.0, 150.0, 50)
    val integral = hist.filter(col("bin").between(1, 50))
      .agg(sum(col("value"))).head().getDouble(0)
    assert(integral == inRange.toDouble)
  }

  test("reference CI stage-2 unbinned fixture round-trips with pinned stats") {
    val fx = new java.io.File(samples, "vbf_stage2_unbinned.parquet")
    assume(fx.exists, s"reference fixture missing: $fx")
    val df = spark.read.parquet(fx.getPath)
    // the save_unbinned layout for the vbf channel (run_stage2.py
    // tosave_unbinned reduced to what the CI fixture carries)
    assert(df.columns.toSet == Set("dimuon_mass", "wgt_nominal", "entry"))
    val row = df.agg(count(lit(1)), min(col("dimuon_mass")), max(col("dimuon_mass"))).head()
    assert(row.getLong(0) == 2765L)
    assert(math.abs(row.getDouble(1) - 110.04055676739983) < 1e-9)
    assert(math.abs(row.getDouble(2) - 148.0283621251299) < 1e-9)
  }
}
