package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.queries.StageQueries
import graft.report.Datacards

/** End-to-end pipeline CLI — the analog of the reference's
  * run_stage1/2/3 entry points (SURVEY.md §3) as one Spark application:
  *
  *   stage 1: event ETL -> per-event wide table, partitioned by region
  *   stage 2: channel/weight/histogram aggregation -> histogram table
  *   stage 3: template yields -> datacard text files + unbinned save
  *
  * usage: graft.RunPipeline <sfDir> <outDir>
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.RunPipeline <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir)
    spark.stop()
  }

  /** The whole-analysis chain (ROOT/parquet in → datacards + templates +
    * SVG out) on an existing session — called by [[main]] and timed by
    * [[Bench]] as the `pipeline_sec` headline (round-12 verdict ask #7:
    * the number a user quotes is the end-to-end wall time, not a sum of
    * operator times). */
  def run(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    // stage 1: ETL, partitioned by region like the reference's
    // per-dataset stage-1 output dirs
    val stage1 = StageQueries.queries("s01_stage1_pipeline")(spark, sfDir)
    stage1.write.mode("overwrite").partitionBy("region")
      .parquet(s"$outDir/stage1")
    println(s"[pipeline] stage1 -> $outDir/stage1")

    // stage 2: histogram table (the reference's pickled hists as a
    // plain parquet table) + unbinned fit inputs
    val hist = StageQueries.queries("s03_stage2_histograms")(spark, sfDir)
    hist.write.mode("overwrite").parquet(s"$outDir/stage2_histograms")
    val unbinned = StageQueries.queries("s05_unbinned_save")(spark, sfDir)
    unbinned.write.mode("overwrite").parquet(s"$outDir/stage2_unbinned")
    // reference-width systematic table (22 JES + 12 JER + nominal
    // through one scan) — the per-variation inputs stage 3 consumes
    val variations = StageQueries.queries("s06_variation_fanout")(spark, sfDir)
    variations.write.mode("overwrite").parquet(s"$outDir/stage2_variations")
    println(s"[pipeline] stage2 -> $outDir/stage2_histograms, stage2_unbinned, stage2_variations")

    // stage 3: yields + datacards (driver-side text emission)
    val yields = StageQueries.queries("s04_stage3_templates")(spark, sfDir)
    val cards = Datacards.renderAll(yields)
    Files.createDirectories(Paths.get(s"$outDir/stage3_datacards"))
    cards.foreach { case (region, text) =>
      Files.writeString(Paths.get(s"$outDir/stage3_datacards/$region.txt"), text)
    }
    println(s"[pipeline] stage3 -> ${cards.size} datacards in $outDir/stage3_datacards")

    // stage 3b: TH1D template export (the reference's make_templates.py
    // ROOT file) — one TH1D per (region, channel, variation), written
    // by the engine's own ROOT writer and readable back through the
    // root-hist connector
    val specs = report.TemplateExport.writeTemplates(
      hist, s"$outDir/stage3_templates.root")
    println(s"[pipeline] stage3 -> ${specs.size} TH1D templates in " +
      s"$outDir/stage3_templates.root")

    // stage 3c: stack/ratio panels as SVG (the reference's plotter.py
    // figures, rendered engine-side with no plotting dependency)
    val ratio = StageQueries.queries("s12_rebin_ratio")(spark, sfDir)
    val panels = report.PlotSvg.renderAll(ratio)
    Files.createDirectories(Paths.get(s"$outDir/stage3_plots"))
    panels.foreach { case (region, svg) =>
      Files.writeString(Paths.get(s"$outDir/stage3_plots/$region.svg"), svg)
    }
    println(s"[pipeline] stage3 -> ${panels.size} SVG panels in $outDir/stage3_plots")
  }
}
