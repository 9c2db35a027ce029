package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted multi-axis histogramming as a plain `groupBy` aggregation.
  *
  * Re-expresses the reference's 5-axis `hist.Hist` fill
  * (`/root/reference/stage2/histogrammer.py:10-133`) as
  * `groupBy(axes..., bucket(var)).agg(sum(w), sum(w*w))` — the histogram
  * is just a small DataFrame keyed by axis coordinates, so merging
  * partial histograms (`stage3/make_templates.py:92-157`) is re-running
  * the same aggregation over a union. Scales: one shuffle on the
  * (low-cardinality) axis key, map-side partial aggregation does the
  * heavy lifting, output is tiny regardless of input size.
  */
object Histogrammer {

  /** Portable fixed-width bucket index in [0, n+1]; 0 = underflow,
    * n+1 = overflow. Formula written identically in the DuckDB oracle:
    * floor((x - lo) * n / (hi - lo)) + 1, clamped.
    */
  def bucket(x: Column, lo: Double, hi: Double, n: Int): Column =
    when(x < lit(lo), lit(0L))
      .when(x >= lit(hi), lit(n + 1L))
      .otherwise(floor((x - lit(lo)) * lit(n.toDouble) / lit(hi - lo)).cast("long") + lit(1L))

  /** SQL text of [[bucket]] for the oracle — same expression tree. */
  def bucketSql(x: String, lo: Double, hi: Double, n: Int): String =
    s"CASE WHEN $x < $lo THEN 0 WHEN $x >= $hi THEN ${n + 1} " +
      s"ELSE CAST(FLOOR(($x - $lo) * ${n.toDouble} / ${hi - lo}) AS BIGINT) + 1 END"

  /** Weighted 1-D histogram with extra categorical axes.
    * Emits (axes..., bin, value=sum(w), sumw2=sum(w^2)) — the relational
    * form of the reference's (value, sumw2) double storage.
    */
  def histogram(df: DataFrame, axes: Seq[Column], x: Column, w: Column,
                lo: Double, hi: Double, n: Int): DataFrame = {
    val b = bucket(x, lo, hi, n).as("bin")
    df.groupBy((axes :+ b): _*)
      .agg(sum(w).cast("float").as("value"),
           sum(w * w).cast("float").as("sumw2"))
  }
}
