package graft.lookup

import graft.functions.TFormula

/** Parsers for the CMS text-table payload formats the reference feeds
  * to coffea's extractor factories (`stage1/corrections/jec.py:6-181`,
  * `config/jec_parameters.py`): the `.jec.txt` correction-level tables
  * (header `{N binVar.. M evalVar.. formula Correction Level}`, rows of
  * bin bounds + eval-var clamp bounds + formula parameters) and the
  * section-structured `UncertaintySources` `.junc.txt` (per-source
  * `[Name]` sections of eta-binned 50-knot (pt, up, down) tables).
  * Driver-side, tiny files — the parsed tables become broadcast
  * DataFrames or literal arrays in the plan. */
object JecTextTables {

  /** One table row: per-bin-var (lo, hi), per-eval-var clamp (lo, hi),
    * formula parameters `[0]..[k]`. */
  final case class LevelRow(bounds: Vector[(Double, Double)],
      clamps: Vector[(Double, Double)], params: Vector[Double])

  final case class Level(binVars: Vector[String], evalVars: Vector[String],
      formula: TFormula.Node, rows: Vector[LevelRow]) {
    /** Sorted bin lows of bin var 0 (eta for every level file), for
      * index-arithmetic bin lookup. Requires the var-0 bins to be a
      * contiguous partition (checked). */
    lazy val etaLows: Vector[Double] = {
      val bins = rows.map(_.bounds(0)).distinct.sorted
      bins.zip(bins.tail).foreach { case ((_, hi), (lo, _)) =>
        require(hi == lo, s"non-contiguous eta bins: $hi vs $lo") }
      bins.map(_._1)
    }
    def etaIdx(lo: Double): Int = {
      val i = etaLows.indexOf(lo)
      require(i >= 0, s"unknown eta bin low $lo"); i
    }
  }

  /** Parse a `.jec.txt` level file. The header declares the bin/eval
    * var counts and the formula; each row carries `2*nBin` bounds, a
    * count, then `2*nEval` clamp bounds and the parameters. */
  def parseLevel(path: String): Level = {
    val lines = scala.io.Source.fromFile(path).getLines()
      .map(_.trim).filter(_.nonEmpty).toVector
    val header = lines.head
    require(header.startsWith("{") && header.endsWith("}"), s"bad header: $header")
    val t = header.substring(1, header.length - 1).trim.split("\\s+").toVector
    val nBin = t(0).toInt
    val binVars = t.slice(1, 1 + nBin)
    val nEval = t(1 + nBin).toInt
    val evalVars = t.slice(2 + nBin, 2 + nBin + nEval)
    val formula = TFormula.parse(t(2 + nBin + nEval))
    val rows = lines.tail.map { l =>
      val v = l.split("\\s+")
      val bounds = Vector.tabulate(nBin)(i => (v(2 * i).toDouble, v(2 * i + 1).toDouble))
      val c = v(2 * nBin).toInt
      val vals = Vector.tabulate(c)(i => v(2 * nBin + 1 + i).toDouble)
      val clamps = Vector.tabulate(nEval)(i => (vals(2 * i), vals(2 * i + 1)))
      LevelRow(bounds, clamps, vals.drop(2 * nEval))
    }
    Level(binVars, evalVars, formula, rows)
  }

  /** One `[source]` section of an UncertaintySources `.junc.txt`:
    * per eta bin, the 50 shared pt knots' (up == down) uncertainties.
    * Returns (etaLows, ptKnots, grid[etaBin][knot]); checks the grid
    * uniformity this file guarantees (same eta bins and pt knots in
    * every section, up == down). */
  final case class UncSource(etaLos: Vector[Double], etaHis: Vector[Double],
      knots: Vector[Double], grid: Vector[Vector[Double]])

  def parseUncSources(path: String): Map[String, UncSource] = {
    val out = scala.collection.mutable.Map.empty[String, UncSource]
    var cur: String = null
    var etaLos = Vector.empty[Double]
    var etaHis = Vector.empty[Double]
    var knots: Vector[Double] = null
    var grid = Vector.empty[Vector[Double]]
    def flush(): Unit = if (cur != null) {
      out(cur) = UncSource(etaLos, etaHis, knots, grid)
      etaLos = Vector.empty; etaHis = Vector.empty; grid = Vector.empty
    }
    scala.io.Source.fromFile(path).getLines().map(_.trim).foreach { l =>
      if (l.startsWith("[")) { flush(); cur = l.substring(1, l.length - 1) }
      else if (l.nonEmpty && !l.startsWith("{")) {
        val t = l.split("\\s+")
        val n = t(2).toInt
        val vals = Vector.tabulate(n)(i => t(3 + i).toDouble)
        val ks = Vector.tabulate(n / 3)(i => vals(i * 3))
        val us = Vector.tabulate(n / 3)(i => vals(i * 3 + 1))
        val ds = Vector.tabulate(n / 3)(i => vals(i * 3 + 2))
        require(us == ds, s"up != down in $cur @ ${t(0)}")
        if (knots == null) knots = ks
        else require(ks == knots, s"pt knots differ in $cur @ ${t(0)}")
        etaLos :+= t(0).toDouble; etaHis :+= t(1).toDouble; grid :+= us
      }
    }
    flush()
    out.toMap
  }
}
