package graft.report

import org.apache.spark.sql.DataFrame

import graft.sources.RootHistFile
import graft.sources.RootHistFile.TH1DSpec

/** Stage-3 TH1D template export — the engine side of the reference's
  * template file (stage3/make_templates.py:190-195, python/io.py:230-235:
  * one TH1D per (region, channel, variation) written into a ROOT file).
  * Consumes the s03 histogram table (region, channel, variation, bin,
  * value, sumw2) — bins already in ROOT cell convention (0 = underflow,
  * nbins+1 = overflow) — and serializes via [[RootHistFile.writeTH1D]].
  * Driver-side formatting of a SMALL collected table, the Datacards
  * pattern: the engine's deliverable is the aggregation; this is the
  * export sink. */
object TemplateExport {

  /** Group the histogram table into one TH1DSpec per
    * (region, channel, variation), named `region__channel__variation`. */
  def toTH1DSpecs(hist: DataFrame, nbins: Int, lo: Double, hi: Double): Seq[TH1DSpec] = {
    hist.collect().toSeq
      .groupBy(r => (r.getAs[String]("region"), r.getAs[String]("channel"),
        r.getAs[String]("variation")))
      .toSeq.sortBy(_._1)
      .map { case ((region, channel, variation), rows) =>
        val contents = new Array[Double](nbins + 2)
        val sumw2 = new Array[Double](nbins + 2)
        rows.foreach { r =>
          val cell = r.getAs[Long]("bin").toInt
          contents(cell) = r.getAs[Float]("value").toDouble
          sumw2(cell) = r.getAs[Float]("sumw2").toDouble
        }
        TH1DSpec(s"${region}__${channel}__$variation",
          s"$channel in $region ($variation)",
          nbins, lo, hi, Array.empty, contents, sumw2,
          entries = rows.length.toDouble)
      }
  }

  /** Collect, group, and write the template file; returns the specs
    * written (for logging/assertion). */
  def writeTemplates(hist: DataFrame, path: String,
      nbins: Int = 40, lo: Double = 0.0, hi: Double = 160.0): Seq[TH1DSpec] = {
    val specs = toTH1DSpecs(hist, nbins, lo, hi)
    RootHistFile.writeTH1D(path, specs)
    specs
  }
}
