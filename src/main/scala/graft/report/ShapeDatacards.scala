package graft.report

import org.apache.spark.sql.{DataFrame, Row}

/** Stage-3 SHAPE-analysis reporting sinks, completing the S9 text-sink
  * family next to [[Datacards]] (the cut-and-count variant):
  *
  *  - [[UncertaintyJson]] mirrors the reference's
  *    `stage3/uncertainty_jsonwriter.py:1-40`: a per-nuisance JSON map
  *    {name -> {type, <process> -> value-string}} where "-" marks an
  *    unaffected process and "a/b" an asymmetric lnN.
  *  - [[ShapeDatacards]] mirrors `stage3/makeshapebased_datacard.py:
  *    5-118`: the combine-style SHAPE datacard, whose process rates are
  *    all 1 (the pdf normalizations live in the referenced workspace) and
  *    whose `shapes` lines bind each process to a workspace pdf; the
  *    nuisance matrix is read back from the uncertainty JSON.
  *
  * Both are driver-side formatting of engine-delivered SMALL tables
  * (nuisance and channel lists — dozens of rows), like Datacards: the
  * collect is intentional and bounded.
  */
object UncertaintyJson {

  /** Render rows of (name, unc_type, process, value) into the
    * reference's uncertainty-JSON text. Processes missing for a name
    * get "-" (unaffected), matching uncertainty_jsonwriter.py's
    * explicit "-" entries. Keys are emitted in first-appearance order,
    * processes in the caller's order — both deterministic. */
  def render(rows: Seq[Row], processes: Seq[String]): String = {
    val byName = rows.groupBy(_.getAs[String]("name"))
    val names = rows.map(_.getAs[String]("name")).distinct
    val entries = names.map { n =>
      val rs = byName(n)
      val typ = rs.head.getAs[String]("unc_type")
      val vals = rs.map(r =>
        r.getAs[String]("process") -> r.getAs[String]("value")).toMap
      val fields = (s""""type": "$typ"""" +:
        processes.map(p => s""""$p": "${vals.getOrElse(p, "-")}""""))
        .mkString(",\n        ")
      s"""    "$n": {
         |        $fields
         |    }""".stripMargin
    }
    entries.mkString("{\n", ",\n", "\n}")
  }

  /** Collect-and-render a small (name, unc_type, process, value) frame. */
  def renderAll(unc: DataFrame, processes: Seq[String]): String =
    render(unc.collect().toSeq, processes)

  /** Parse the rendered JSON back to (name -> (type, process -> value)).
    * Minimal parser for the writer's own output (round-trip tests and
    * the datacard's nuisance-matrix read-back — no JSON library in the
    * dependency footprint). */
  def parse(json: String): Seq[(String, String, Map[String, String])] = {
    val entry = """(?s)"([^"]+)":\s*\{(.*?)\}""".r
    val field = """"([^"]+)":\s*"([^"]*)"""".r
    entry.findAllMatchIn(json).map { m =>
      val fields = field.findAllMatchIn(m.group(2))
        .map(f => f.group(1) -> f.group(2)).toSeq
      val typ = fields.collectFirst { case ("type", v) => v }.getOrElse("lnN")
      (m.group(1), typ, fields.filter(_._1 != "type").toMap)
    }.toSeq
  }
}

object ShapeDatacards {

  /** Render one category's shape datacard.
    *
    * @param mass      signal mass label (file-name component)
    * @param sigModel  signal pdf label
    * @param bkgModel  background pdf label
    * @param category  category tag, e.g. "cat0_2018"
    * @param channels  signal process names (each binds a workspace pdf)
    * @param uncJson   the uncertainty JSON text ([[UncertaintyJson]])
    */
  def render(mass: String, sigModel: String, bkgModel: String,
      category: String, channels: Seq[String], uncJson: String): String = {
    val sb = new StringBuilder
    sb.append("imax *\n").append("jmax *\n").append("kmax *\n")
    sb.append("-" * 40).append('\n')
    val sigWs = s"workspace_${mass}_${sigModel}_$category.txt"
    val bkgWs = s"workspace_${mass}_${bkgModel}_$category.txt"
    channels.foreach { c =>
      sb.append(s"shapes ${c}_hmm cat$category $sigWs w:${c}_cat${category}_pdf\n")
    }
    sb.append(s"shapes bkg cat$category $bkgWs w:bkg_cat${category}_pdf\n")
    sb.append(s"shapes data_obs cat$category $bkgWs w:data_cat$category\n")
    sb.append("-" * 40).append('\n')
    sb.append(s"bin cat$category\n").append("observation -1\n")
    sb.append("-" * 40).append('\n')
    // shape fit: every rate is 1, normalizations live in the workspace
    sb.append("bin " + (0 to channels.size).map(_ => s"cat$category").mkString(" ") + "\n")
    sb.append("process " + (channels.map(_ + "_hmm") :+ "bkg").mkString(" ") + "\n")
    // signal process ids: reference makeshapebased_datacard.py emits
    // -len(Channels)+isig with isig starting at 1, i.e. -(n-1)..0 —
    // combine treats any id <= 0 as signal, and the reference's exact
    // row is reproduced here (round-11 advice fix; round 10 emitted
    // -n..-1, combine-valid but not format-faithful)
    sb.append("process " + (channels.indices.map(i => i - channels.size + 1) :+ 1).mkString(" ") + "\n")
    sb.append("rate " + (0 to channels.size).map(_ => "1").mkString(" ") + "\n")
    sb.append("-" * 40).append('\n')
    // one nuisance cell per process column (channels..., bkg). The
    // reference's writer loop (makeshapebased_datacard.py:96-104)
    // re-appends the bkg cell once per channel — a malformed-row bug in
    // a text emitter; combine expects exactly one cell per process
    // column, which is what we emit.
    UncertaintyJson.parse(uncJson).foreach { case (name, typ, vals) =>
      val cells = (channels :+ "bkg").map(p => vals.getOrElse(p, "-"))
      sb.append((s"$name $typ" +: cells).mkString(" ")).append('\n')
    }
    sb.toString
  }
}
