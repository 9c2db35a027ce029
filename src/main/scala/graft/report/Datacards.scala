package graft.report

import org.apache.spark.sql.{DataFrame, Row}

/** Stage-3 text sinks (SURVEY.md §2.1 S9): datacard-style emission of a
  * collected yields table. Driver-side formatting of a SMALL DataFrame —
  * the engine's deliverable is the yields/nuisance aggregation
  * (StageQueries.s04); this renders it, mirroring the reference's
  * make_datacards.py:64-230 structure (header, process block, nuisance
  * matrix) without any data-plane work.
  */
object Datacards {

  /** Render one region's datacard from rows of
    * (region, channel, yield_nominal, rate_unc). */
  def render(region: String, yields: Seq[Row]): String = {
    val rows = yields.filter(_.getAs[String]("region") == region)
    val channels = rows.map(_.getAs[String]("channel"))
    val sb = new StringBuilder
    sb.append(s"# Datacard for region $region\n")
    sb.append(s"imax 1 number of channels\n")
    sb.append(s"jmax ${math.max(channels.size - 1, 0)} number of processes minus 1\n")
    sb.append("kmax * number of nuisance parameters\n")
    sb.append("-" * 40).append('\n')
    sb.append("bin        ").append(channels.map(c => f"$c%-18s").mkString).append('\n')
    sb.append("process    ").append(channels.indices.map(i => f"$i%-18d").mkString).append('\n')
    sb.append("rate       ").append(rows.map { r =>
      f"${r.getAs[Float]("yield_nominal")}%-18.4f"
    }.mkString).append('\n')
    sb.append("-" * 40).append('\n')
    sb.append("jes lnN    ").append(rows.map { r =>
      f"${r.getAs[Float]("rate_unc")}%-18.4f"
    }.mkString).append('\n')
    sb.toString
  }

  /** Render every region present in the yields DataFrame. The input is
    * the (tiny) output of StageQueries.s04 — collect is intentional. */
  def renderAll(yields: DataFrame): Map[String, String] = {
    val rows = yields.collect().toSeq
    rows.map(_.getAs[String]("region")).distinct.sorted
      .map(r => r -> render(r, rows)).toMap
  }
}
