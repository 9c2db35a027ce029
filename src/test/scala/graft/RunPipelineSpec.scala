package graft

import java.nio.file.{Files, Paths}

/** The three-stage pipeline produces consistent artifacts end-to-end:
  * stage-1 rows survive the region partitioning, stage-2 histogram
  * totals equal the stage-1 population they were filled from, and
  * stage-3 datacards exist per region. */
class RunPipelineSpec extends SparkSpec {

  test("stage1 -> stage2 -> stage3 artifacts are consistent") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val dir = sf("sf0.001")
    // run stages through the same code path as the CLI (shared session)
    val stage1 = queries.StageQueries.queries("s01_stage1_pipeline")(spark, dir)
    stage1.write.mode("overwrite").partitionBy("region").parquet(s"$out/stage1")
    val hist = queries.StageQueries.queries("s03_stage2_histograms")(spark, dir)
    hist.write.mode("overwrite").parquet(s"$out/stage2_histograms")
    val yields = queries.StageQueries.queries("s04_stage3_templates")(spark, dir)
    val cards = report.Datacards.renderAll(yields)
    cards.foreach { case (region, text) =>
      Files.createDirectories(Paths.get(s"$out/stage3_datacards"))
      Files.writeString(Paths.get(s"$out/stage3_datacards/$region.txt"), text)
    }

    // stage-1 round-trips through the partitioned layout
    val back = spark.read.parquet(s"$out/stage1")
    assert(back.count() == stage1.count() && back.count() > 0)
    assert(back.columns.toSet == stage1.columns.toSet)

    // stage-2 nominal yield equals the sum over the histogram table
    import org.apache.spark.sql.functions._
    val histBack = spark.read.parquet(s"$out/stage2_histograms")
    val nomSum = histBack.filter(col("variation") === "nominal")
      .agg(sum(col("value"))).head.getDouble(0)
    val yieldSum = yields.agg(sum(col("yield_nominal"))).head.getDouble(0)
    assert(math.abs(nomSum - yieldSum) / yieldSum < 1e-5,
      s"stage2 hist total $nomSum != stage3 yields $yieldSum")

    // stage-3: one datacard per region present in the yields
    val regions = yields.select("region").distinct().collect().map(_.getString(0))
    regions.foreach { r =>
      assert(Files.exists(Paths.get(s"$out/stage3_datacards/$r.txt")))
    }

    // stage-2 variation table carries the full reference width
    val variations = queries.StageQueries.queries("s06_variation_fanout")(spark, dir)
    variations.write.mode("overwrite").parquet(s"$out/stage2_variations")
    val nVar = spark.read.parquet(s"$out/stage2_variations")
      .select("variation").distinct().count()
    assert(nVar == 35, s"expected 35 variants (nominal + 22 JES + 12 JER), got $nVar")
  }
}
