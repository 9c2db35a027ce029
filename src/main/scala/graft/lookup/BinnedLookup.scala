package graft.lookup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic broadcast binned-lookup machinery — the backbone of the
  * reference's correction-factor family (`dense_lookup` 1-D/2-D SF
  * evaluation at `/root/reference/stage1/corrections/pu_reweight.py:9-27`,
  * `lepton_sf.py:57-76`, JEC tables `jec.py:6-181`, btag CSV splines
  * `btag_weights.py:4-61`).
  *
  * Design for scale: the bins table is always tiny (10s–1000s of rows),
  * so every lookup is a `broadcast()` range join — zero shuffle of the
  * big side, and Catalyst folds the join into the scan stage. For the
  * pure-SQL oracle form the same tables are emitted as `VALUES` lists.
  */
object BinnedLookup {

  /** 1-D bins: (lo, hi, value). Lookup joins `x BETWEEN lo AND hi`. */
  case class Bin1D(lo: Double, hi: Double, value: Double)

  /** 2-D bins: (xlo, xhi, ylo, yhi, value). */
  case class Bin2D(xlo: Double, xhi: Double, ylo: Double, yhi: Double, value: Double)

  /** Piecewise-linear graph node for np.interp-style interpolation
    * (`stage1/corrections/nnlops.py:25-49`). */
  case class Node(x: Double, y: Double)

  def bins1DF(spark: SparkSession, bins: Seq[Bin1D]): DataFrame = {
    import spark.implicits._
    bins.toDF("lo", "hi", "sf")
  }

  def bins2DF(spark: SparkSession, bins: Seq[Bin2D]): DataFrame = {
    import spark.implicits._
    bins.toDF("xlo", "xhi", "ylo", "yhi", "sf")
  }

  /** Broadcast range-join a 1-D SF table onto `df`; rows outside all bins
    * get `default`. Half-open bins [lo, hi). */
  def lookup1D(df: DataFrame, bins: DataFrame, x: Column, default: Double): Column = {
    // caller joins; helper kept for the join condition convention
    coalesce(col("sf"), lit(default))
  }

  def join1D(df: DataFrame, bins: DataFrame, x: Column): DataFrame =
    df.join(broadcast(bins), x >= col("lo") && x < col("hi"), "left")

  def join2D(df: DataFrame, bins: DataFrame, x: Column, y: Column): DataFrame =
    df.join(broadcast(bins),
      x >= col("xlo") && x < col("xhi") && y >= col("ylo") && y < col("yhi"), "left")

  /** Piecewise-linear interpolation: join to the segment containing x and
    * evaluate y0 + (x-x0)*(y1-y0)/(x1-x0); x clipped to the graph range
    * like np.interp. Segment table columns: x0,y0,x1,y1. */
  def segmentsDF(spark: SparkSession, nodes: Seq[Node]): DataFrame = {
    import spark.implicits._
    nodes.zip(nodes.tail).map { case (a, b) => (a.x, a.y, b.x, b.y) }
      .toDF("x0", "y0", "x1", "y1")
  }

  def interp(x: Column): Column =
    col("y0") + (x - col("x0")) * (col("y1") - col("y0")) / (col("x1") - col("x0"))

  /** VALUES-list SQL for a 1-D bins table, kept in sync with bins1DF. */
  def bins1Sql(bins: Seq[Bin1D]): String =
    bins.map(b => s"(${b.lo}, ${b.hi}, ${b.value})").mkString("(VALUES ", ", ", ") AS sfb(lo, hi, sf)")

  def bins2Sql(bins: Seq[Bin2D]): String =
    bins.map(b => s"(${b.xlo}, ${b.xhi}, ${b.ylo}, ${b.yhi}, ${b.value})")
      .mkString("(VALUES ", ", ", ") AS sfb(xlo, xhi, ylo, yhi, sf)")

  def segmentsSql(nodes: Seq[Node]): String =
    nodes.zip(nodes.tail).map { case (a, b) => s"(${a.x}, ${a.y}, ${b.x}, ${b.y})" }
      .mkString("(VALUES ", ", ", ") AS seg(x0, y0, x1, y1)")
}
