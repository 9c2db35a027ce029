package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TFormula
import graft.lookup.JecTextTables

/** Formula-payload correction operators — the reference families whose
  * calibration payloads are TFormula STRINGS inside public CMS data
  * files, closed here with the real files end to end:
  *
  *  - l20: the DeepCSV reshape-central btag SF splines
  *    (`/root/reference/stage1/corrections/btag_weights.py:4-61`,
  *    `data/btag/DeepCSV_102XSF_V1.csv` — the reference builds a
  *    coffea `BTagScaleFactor(csv, RESHAPE)` in
  *    `stage1/processor.py:766-768` and per-event products the SFs);
  *  - l21: the Autumn18 MC JEC level chain
  *    L1FastJet -> L2Relative -> L3Absolute
  *    (`stage1/corrections/jec.py:6-181`,
  *    `config/jec_parameters.py jec_levels_mc`,
  *    `data/jec/Autumn18_V19_MC_L{1,2,3}*.jec.txt`).
  *
  * Engine design: each payload file is parsed ONCE on the driver
  * (graft.lookup.JecTextTables / the CSV reader below), formulas go
  * through graft.functions.TFormula into codegen'd Column trees, and
  * the per-row tables become broadcast DataFrames joined by
  * index-arithmetic equi keys (bin index = count of bin-lows <= x over
  * a literal sorted array) — BroadcastHashJoin, zero shuffle on the
  * event side, the same plan shape at 100 TB. The DuckDB oracles read
  * fixture CSVs produced by an INDEPENDENT Python parse of the same
  * files (tools/gen_jec_fixtures.py) and replay the formulas as SQL
  * rendered from the same parse tree (TFormula.toSql — identical
  * association order), so the driver's hash compare proves two parses
  * and two evaluation engines agree on the real payloads.
  */
object CorrectionQueries extends QueryFamily {

  private def fixturesDir: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR",
      "/root/repo/src/main/resources/fixtures")

  /** Bin index by count-of-lows <= x over a literal sorted bounds
    * array: equivalent to a [lo, hi) range match when the bins are a
    * contiguous partition (JecTextTables checks that), but joinable as
    * an EQUI key — BroadcastHashJoin instead of a nested-loop range
    * join. -1 / size-1 for x outside; callers left-join + coalesce. */
  private def binIdx(x: Column, lows: Seq[Double]): Column =
    size(filter(typedLit(lows), b => b <= x)) - 1

  private def clampc(x: Column, lo: Column, hi: Column): Column =
    least(greatest(x, lo), hi)

  // ---- l20: DeepCSV reshape-central btag SF from the real CSV -------------
  // The payload rows (OperatingPoint=3 "reshape", measurement
  // "iterativefit", sysType "central"; 139 rows) bin by (jetFlavor,
  // eta, pt, discr) and carry the SF as a formula in x = discr. Every
  // central formula is the file's own Horner nesting (constant, linear,
  // or degree-6) — TFormula.parse + hornerCoeffs extracts the LITERAL
  // coefficients structurally (no algebra), and one shared Horner
  // Column evaluates all rows, so the per-jet cost is seven fused
  // multiply-adds regardless of row. Jets join the broadcast 139-row
  // table on the flavor equi key (ranges as join condition), then the
  // per-event weight is the l19-pattern log-space product with the
  // reference's guards (prod -> fillna 1 -> w < 0.01 -> 1,
  // btag_weights.py:19-21). hadronFlavour maps 5->0, 4->1, 0->2 (the
  // coffea BTagScaleFactor flavor convention the reference relies on).
  private lazy val btagRows: Seq[(Int, Double, Double, Double, Double, Double,
      Double, Double, Double, Double, Double, Double, Double, Double)] = {
    val src = scala.io.Source.fromFile(refData("btag/DeepCSV_102XSF_V1.csv"))
    val lines = try src.getLines().drop(1).toVector finally src.close()
    lines.flatMap { l =>
      val t = l.split(",", 11).map(_.trim)
      if (t.length == 11 && t(0) == "3" && t(1) == "iterativefit" &&
          t(2) == "central") {
        val formula = t(10).stripPrefix("\"").stripSuffix("\"").trim
        val ast = TFormula.parse(formula)
        val c = ast.hornerCoeffs.getOrElse(
          throw new IllegalStateException(s"non-Horner btag formula: $formula"))
        require(c.size <= 7, s"degree > 6: $formula")
        val p = c.padTo(7, 0.0)
        Some((t(3).toInt, t(4).toDouble, t(5).toDouble, t(6).toDouble,
          t(7).toDouble, t(8).toDouble, t(9).toDouble,
          p(0), p(1), p(2), p(3), p(4), p(5), p(6)))
      } else None
    }
  }

  /** Shared jet synthesis (Spark + SQL spellings kept in lockstep):
    * flavor cycles b/c/light, abseta in [0, 2.49], pt in [20, 920),
    * discr in [0, 1). */
  private def l20Jets(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem").select(
      col("l_orderkey").as("event"),
      expr("CAST(CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 5 WHEN 1 THEN 4 ELSE 0 END AS INT)").as("had_flav"),
      expr("CAST(CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END AS INT)").as("flavor"),
      expr("CAST(l_partkey % 250 AS DOUBLE) / 100.0").as("abseta"),
      expr("20.0 + CAST(l_suppkey % 9000 AS DOUBLE) / 10.0").as("pt"),
      expr("CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) % 997 AS DOUBLE) / 997.0").as("discr"))
  private val l20JetsSql =
    """SELECT l_orderkey AS event,
      | CAST(CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 5 WHEN 1 THEN 4 ELSE 0 END AS INT) AS had_flav,
      | CAST(CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END AS INT) AS flavor,
      | CAST(l_partkey % 250 AS DOUBLE) / 100.0 AS abseta,
      | 20.0 + CAST(l_suppkey % 9000 AS DOUBLE) / 10.0 AS pt,
      | CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) % 997 AS DOUBLE) / 997.0 AS discr
      |FROM lineitem""".stripMargin

  private def l20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tbl = btagRows.toDF("flavor", "eta_lo", "eta_hi", "pt_lo", "pt_hi",
      "d_lo", "d_hi", "c0", "c1", "c2", "c3", "c4", "c5", "c6")
    val jets = l20Jets(s, dir)
    // reference clamps jet pt at 1000 before the lookup
    // (btag_weights.py:8); a no-op on this domain but kept for fidelity
    val ptc = least(col("pt"), lit(1000.0))
    val joined = jets.join(broadcast(tbl),
      jets("flavor") === tbl("flavor") &&
        col("abseta") >= col("eta_lo") && col("abseta") < col("eta_hi") &&
        ptc >= col("pt_lo") && ptc < col("pt_hi") &&
        col("discr") >= col("d_lo") && col("discr") < col("d_hi"))
    val x = clampc(col("discr"), col("d_lo"), col("d_hi"))
    val sf = col("c0") + x * (col("c1") + x * (col("c2") + x * (col("c3") +
      x * (col("c4") + x * (col("c5") + x * col("c6"))))))
    joined
      .select(col("event"),
        floor(log(sf) * lit(1e9) + lit(0.5)).cast("long").as("lnq"))
      .groupBy(col("event"))
      .agg(count(lit(1)).as("n_jets"), sum(col("lnq")).as("ln_nano_sum"))
      .select(col("event"), col("n_jets"), col("ln_nano_sum"),
        expr("CAST(CASE WHEN EXP(CAST(ln_nano_sum AS DOUBLE) / 1e9) < 0.01 " +
          "THEN 1.0 ELSE EXP(CAST(ln_nano_sum AS DOUBLE) / 1e9) END AS FLOAT)")
          .as("btag_wgt"))
      .orderBy(col("event"))
  }
  private val l20Sql = {
    val csv = s"$fixturesDir/btag_reshape_central.csv"
    val horner = "(c0 + x * (c1 + x * (c2 + x * (c3 + x * (c4 + x * (c5 + x * c6))))))"
    s"""WITH tbl AS (SELECT * FROM read_csv('$csv', header=true, columns={
       |  'flavor':'INT','eta_lo':'DOUBLE','eta_hi':'DOUBLE',
       |  'pt_lo':'DOUBLE','pt_hi':'DOUBLE','d_lo':'DOUBLE','d_hi':'DOUBLE',
       |  'c0':'DOUBLE','c1':'DOUBLE','c2':'DOUBLE','c3':'DOUBLE',
       |  'c4':'DOUBLE','c5':'DOUBLE','c6':'DOUBLE'})),
       |jets AS ($l20JetsSql),
       |matched AS (
       | SELECT j.event,
       |  LEAST(GREATEST(j.discr, t.d_lo), t.d_hi) AS x,
       |  t.c0, t.c1, t.c2, t.c3, t.c4, t.c5, t.c6
       | FROM jets j JOIN tbl t
       |  ON j.flavor = t.flavor
       |  AND j.abseta >= t.eta_lo AND j.abseta < t.eta_hi
       |  AND LEAST(j.pt, 1000.0) >= t.pt_lo AND LEAST(j.pt, 1000.0) < t.pt_hi
       |  AND j.discr >= t.d_lo AND j.discr < t.d_hi),
       |per AS (
       | SELECT event, COUNT(*) AS n_jets,
       |  CAST(SUM(CAST(FLOOR(LN($horner) * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
       |   AS ln_nano_sum
       | FROM matched GROUP BY 1)
       |SELECT event, n_jets, ln_nano_sum,
       | CAST(CASE WHEN EXP(CAST(ln_nano_sum AS DOUBLE) / 1e9) < 0.01
       |      THEN 1.0 ELSE EXP(CAST(ln_nano_sum AS DOUBLE) / 1e9) END
       |   AS REAL) AS btag_wgt
       |FROM per ORDER BY event""".stripMargin
  }

  // ---- l21: the real Autumn18 MC JEC level chain via TFormula --------------
  // L1FastJet (82 eta bins; formula in x=Rho, y=JetPt, z=JetA, 6
  // params, max/log/pow) -> L2Relative (82 eta x ~24 pt bins; Horner in
  // x=JetPt with an explicit max floor, 5 params) -> L3Absolute (unit).
  // Chain semantics per coffea's factory: each level evaluates at the
  // PREVIOUS level's corrected pt, eval vars clamped to the row's
  // bounds. Plan: two BroadcastHashJoins on bin-index equi keys (the
  // L2 pt range rides along as join condition inside the eta bucket),
  // formulas fully codegen'd — one scan, zero shuffle before the
  // output sort.
  private lazy val jecL1 = JecTextTables.parseLevel(
    refData("jec/Autumn18_V19_MC_L1FastJet_AK4PFchs.jec.txt"))
  private lazy val jecL2 = JecTextTables.parseLevel(
    refData("jec/Autumn18_V19_MC_L2Relative_AK4PFchs.jec.txt"))
  private lazy val jecL3 = JecTextTables.parseLevel(
    refData("jec/Autumn18_V19_MC_L3Absolute_AK4PFchs.jec.txt"))

  private def l21Jets(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      (col("l_extendedprice") / 1000.0).as("pt_raw"),
      expr("CAST(l_partkey % 1038 AS DOUBLE) / 100.0 - 5.19").as("eta"),
      expr("5.0 + CAST(l_suppkey % 500 AS DOUBLE) / 10.0").as("rho"),
      expr("0.3 + CAST(l_linenumber % 5 AS DOUBLE) / 10.0").as("area"))
  private val l21JetsSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      | l_extendedprice / 1000.0 AS pt_raw,
      | CAST(l_partkey % 1038 AS DOUBLE) / 100.0 - 5.19 AS eta,
      | 5.0 + CAST(l_suppkey % 500 AS DOUBLE) / 10.0 AS rho,
      | 0.3 + CAST(l_linenumber % 5 AS DOUBLE) / 10.0 AS area
      |FROM lineitem""".stripMargin

  private def l21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // L1: one row per eta bin -> (idx, clamps, params)
    val l1df = jecL1.rows.map { r =>
      (jecL1.etaIdx(r.bounds(0)._1),
        r.clamps(0)._1, r.clamps(0)._2, r.clamps(1)._1, r.clamps(1)._2,
        r.clamps(2)._1, r.clamps(2)._2,
        r.params(0), r.params(1), r.params(2), r.params(3), r.params(4), r.params(5))
    }.toDF("e1", "rho_lo", "rho_hi", "cpt_lo", "cpt_hi", "a_lo", "a_hi",
      "p0", "p1", "p2", "p3", "p4", "p5")
    // L2: (etaIdx, pt bin, clamps, params)
    val l2df = jecL2.rows.map { r =>
      (jecL2.etaIdx(r.bounds(0)._1), r.bounds(1)._1, r.bounds(1)._2,
        r.clamps(0)._1, r.clamps(0)._2,
        r.params(0), r.params(1), r.params(2), r.params(3), r.params(4))
    }.toDF("e2", "bpt_lo", "bpt_hi", "x_lo", "x_hi", "q0", "q1", "q2", "q3", "q4")

    val jets = l21Jets(s, dir)
      .withColumn("e1", binIdx(col("eta"), jecL1.etaLows))
      .withColumn("e2", binIdx(col("eta"), jecL2.etaLows))

    val l1Vars: Int => Column = {
      case 0 => clampc(col("rho"), col("rho_lo"), col("rho_hi"))
      case 1 => clampc(col("pt_raw"), col("cpt_lo"), col("cpt_hi"))
      case 2 => clampc(col("area"), col("a_lo"), col("a_hi"))
    }
    val c1 = coalesce(
      TFormula.toColumn(jecL1.formula, l1Vars, i => col(s"p$i")), lit(1.0))
    val s1 = jets.join(broadcast(l1df), Seq("e1"), "left")
      .withColumn("c1", c1)
      .withColumn("pt1", col("pt_raw") * col("c1"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice",
        "eta", "e2", "pt1", "c1")

    val c2 = coalesce(
      TFormula.toColumn(jecL2.formula,
        { case 0 => clampc(col("pt1"), col("x_lo"), col("x_hi")) },
        i => col(s"q$i")), lit(1.0))
    // coffea edge-bin semantics (factorized corrector): a pt1 below the
    // lowest (or at/above the highest) pt bin of its eta slice matches
    // the EDGE bin and evaluates its formula at clamped x, instead of
    // falling out of the join to c2 = 1.0
    val w2 = Window.partitionBy(col("e2"))
    val l2f = l2df
      .withColumn("is_first", col("bpt_lo") === min(col("bpt_lo")).over(w2))
      .withColumn("is_last", col("bpt_hi") === max(col("bpt_hi")).over(w2))
    val s2 = s1.join(broadcast(l2f),
        s1("e2") === l2f("e2") &&
          (col("pt1") >= col("bpt_lo") || col("is_first")) &&
          (col("pt1") < col("bpt_hi") || col("is_last")), "left")
      .withColumn("c2", c2)
      .withColumn("pt2", col("pt1") * col("c2"))

    // L3Absolute: formula "1" with a pt clamp — still evaluated through
    // the parsed tree (data-driven, not assumed)
    val l3row = jecL3.rows.head
    val c3 = TFormula.toColumn(jecL3.formula,
      { case 0 => clampc(col("pt2"), lit(l3row.clamps(0)._1), lit(l3row.clamps(0)._2)) },
      i => lit(l3row.params(i)))
    s2.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("c1").cast("float").as("c1"),
        col("c2").cast("float").as("c2"),
        (col("pt2") * c3).cast("float").as("pt_jec"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private lazy val l21Sql = {
    val l1csv = s"$fixturesDir/jec_l1_mc.csv"
    val l2csv = s"$fixturesDir/jec_l2_mc.csv"
    def cl(x: String, lo: String, hi: String) = s"LEAST(GREATEST($x, $lo), $hi)"
    val f1 = TFormula.toSql(jecL1.formula,
      Vector(cl("j.rho", "l1.rho_lo", "l1.rho_hi"),
        cl("j.pt_raw", "l1.pt_lo", "l1.pt_hi"),
        cl("j.area", "l1.a_lo", "l1.a_hi")),
      i => s"l1.p$i")
    val f2 = TFormula.toSql(jecL2.formula,
      Vector(cl("s1.pt1", "l2.x_lo", "l2.x_hi")), i => s"l2.p$i")
    val l3row = jecL3.rows.head
    val f3 = TFormula.toSql(jecL3.formula,
      Vector(cl("pt2", l3row.clamps(0)._1.toString, l3row.clamps(0)._2.toString)),
      i => l3row.params(i).toString)
    s"""WITH l1 AS (SELECT * FROM read_csv('$l1csv', header=true, columns={
       |  'eta_lo':'DOUBLE','eta_hi':'DOUBLE','rho_lo':'DOUBLE','rho_hi':'DOUBLE',
       |  'pt_lo':'DOUBLE','pt_hi':'DOUBLE','a_lo':'DOUBLE','a_hi':'DOUBLE',
       |  'p0':'DOUBLE','p1':'DOUBLE','p2':'DOUBLE','p3':'DOUBLE','p4':'DOUBLE','p5':'DOUBLE'})),
       |l2 AS (SELECT * FROM read_csv('$l2csv', header=true, columns={
       |  'eta_lo':'DOUBLE','eta_hi':'DOUBLE','bpt_lo':'DOUBLE','bpt_hi':'DOUBLE',
       |  'x_lo':'DOUBLE','x_hi':'DOUBLE',
       |  'p0':'DOUBLE','p1':'DOUBLE','p2':'DOUBLE','p3':'DOUBLE','p4':'DOUBLE'})),
       |l2f AS (SELECT *,
       |  bpt_lo = MIN(bpt_lo) OVER (PARTITION BY eta_lo, eta_hi) AS is_first,
       |  bpt_hi = MAX(bpt_hi) OVER (PARTITION BY eta_lo, eta_hi) AS is_last
       | FROM l2),
       |jets AS ($l21JetsSql),
       |s1 AS (
       | SELECT j.l_orderkey, j.l_linenumber, j.l_extendedprice, j.eta,
       |  COALESCE($f1, 1.0) AS c1,
       |  j.pt_raw * COALESCE($f1, 1.0) AS pt1
       | FROM jets j LEFT JOIN l1
       |  ON j.eta >= l1.eta_lo AND j.eta < l1.eta_hi),
       |s2 AS (
       | SELECT s1.l_orderkey, s1.l_linenumber, s1.l_extendedprice, s1.c1,
       |  COALESCE($f2, 1.0) AS c2,
       |  s1.pt1 * COALESCE($f2, 1.0) AS pt2
       | FROM s1 LEFT JOIN l2f l2
       |  ON s1.eta >= l2.eta_lo AND s1.eta < l2.eta_hi
       |  AND (s1.pt1 >= l2.bpt_lo OR l2.is_first)
       |  AND (s1.pt1 < l2.bpt_hi OR l2.is_last))
       |SELECT l_orderkey, l_linenumber, l_extendedprice,
       | CAST(c1 AS REAL) AS c1, CAST(c2 AS REAL) AS c2,
       | CAST(pt2 * $f3 AS REAL) AS pt_jec
       |FROM s2 ORDER BY 1, 2, 3""".stripMargin
  }

  // ---- l23: the DATA-era RunA chain incl. the L2L3Residual ------------------
  // Data jets get a FOURTH level (config/jec_parameters.py
  // jec_levels_data = [L1FastJet, L2Relative, L3Absolute,
  // L2L3Residual]); the RunA residual payload is the most complex
  // TFormula in the reference's data: TMath::-namespaced functions
  // (Log/Max/Power), nested min/max pt windows driven by params [0]/[1]
  // and a logistic turn-on — all handled by the parser's namespace
  // normalization. Same plan shape as l21 plus one more
  // BroadcastHashJoin (36-bucket eta hash).
  private lazy val jecL1D = JecTextTables.parseLevel(
    refData("jec/Autumn18_RunA_V19_DATA_L1FastJet_AK4PFchs.jec.txt"))
  private lazy val jecL2D = JecTextTables.parseLevel(
    refData("jec/Autumn18_RunA_V19_DATA_L2Relative_AK4PFchs.jec.txt"))
  private lazy val jecL3D = JecTextTables.parseLevel(
    refData("jec/Autumn18_RunA_V19_DATA_L3Absolute_AK4PFchs.jec.txt"))
  private lazy val jecResD = JecTextTables.parseLevel(
    refData("jec/Autumn18_RunA_V19_DATA_L2L3Residual_AK4PFchs.jec.txt"))

  private def l23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l1df = jecL1D.rows.map { r =>
      (jecL1D.etaIdx(r.bounds(0)._1),
        r.clamps(0)._1, r.clamps(0)._2, r.clamps(1)._1, r.clamps(1)._2,
        r.clamps(2)._1, r.clamps(2)._2,
        r.params(0), r.params(1), r.params(2), r.params(3), r.params(4),
        r.params(5), r.params(6))
    }.toDF("e1", "rho_lo", "rho_hi", "cpt_lo", "cpt_hi", "a_lo", "a_hi",
      "p0", "p1", "p2", "p3", "p4", "p5", "p6")
    val l2df = jecL2D.rows.map { r =>
      (jecL2D.etaIdx(r.bounds(0)._1), r.bounds(1)._1, r.bounds(1)._2,
        r.clamps(0)._1, r.clamps(0)._2,
        r.params(0), r.params(1), r.params(2), r.params(3), r.params(4))
    }.toDF("e2", "bpt_lo", "bpt_hi", "x_lo", "x_hi", "q0", "q1", "q2", "q3", "q4")
    val resdf = jecResD.rows.map { r =>
      (jecResD.etaIdx(r.bounds(0)._1), r.clamps(0)._1, r.clamps(0)._2,
        r.params(0), r.params(1), r.params(2), r.params(3), r.params(4),
        r.params(5), r.params(6), r.params(7), r.params(8))
    }.toDF("e4", "r_lo", "r_hi", "t0", "t1", "t2", "t3", "t4", "t5", "t6",
      "t7", "t8")

    val jets = l21Jets(s, dir)
      .withColumn("e1", binIdx(col("eta"), jecL1D.etaLows))
      .withColumn("e2", binIdx(col("eta"), jecL2D.etaLows))
      .withColumn("e4", binIdx(col("eta"), jecResD.etaLows))

    val l1Vars: Int => Column = {
      case 0 => clampc(col("rho"), col("rho_lo"), col("rho_hi"))
      case 1 => clampc(col("pt_raw"), col("cpt_lo"), col("cpt_hi"))
      case 2 => clampc(col("area"), col("a_lo"), col("a_hi"))
    }
    val c1 = coalesce(
      TFormula.toColumn(jecL1D.formula, l1Vars, i => col(s"p$i")), lit(1.0))
    val s1 = jets.join(broadcast(l1df), Seq("e1"), "left")
      .withColumn("c1", c1)
      .withColumn("pt1", col("pt_raw") * col("c1"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice",
        "eta", "e2", "e4", "pt1", "c1")

    val c2 = coalesce(
      TFormula.toColumn(jecL2D.formula,
        { case 0 => clampc(col("pt1"), col("x_lo"), col("x_hi")) },
        i => col(s"q$i")), lit(1.0))
    // coffea edge-bin semantics (factorized corrector): a pt1 below the
    // lowest (or at/above the highest) pt bin of its eta slice matches
    // the EDGE bin and evaluates its formula at clamped x, instead of
    // falling out of the join to c2 = 1.0
    val w2 = Window.partitionBy(col("e2"))
    val l2f = l2df
      .withColumn("is_first", col("bpt_lo") === min(col("bpt_lo")).over(w2))
      .withColumn("is_last", col("bpt_hi") === max(col("bpt_hi")).over(w2))
    val s2 = s1.join(broadcast(l2f),
        s1("e2") === l2f("e2") &&
          (col("pt1") >= col("bpt_lo") || col("is_first")) &&
          (col("pt1") < col("bpt_hi") || col("is_last")), "left")
      .withColumn("c2", c2)
      .withColumn("pt2", col("pt1") * col("c2"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice",
        "e4", "pt2", "c1", "c2")

    // L3Absolute is unit; evaluated through the parsed tree like l21
    val l3row = jecL3D.rows.head
    val c3 = TFormula.toColumn(jecL3D.formula,
      { case 0 => clampc(col("pt2"), lit(l3row.clamps(0)._1), lit(l3row.clamps(0)._2)) },
      i => lit(l3row.params(i)))
    val s3 = s2.withColumn("pt3", col("pt2") * c3)

    val c4 = coalesce(
      TFormula.toColumn(jecResD.formula,
        { case 0 => clampc(col("pt3"), col("r_lo"), col("r_hi")) },
        i => col(s"t$i")), lit(1.0))
    s3.join(broadcast(resdf), Seq("e4"), "left")
      .withColumn("c4", c4)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("c1").cast("float").as("c1"),
        col("c2").cast("float").as("c2"),
        col("c4").cast("float").as("c_residual"),
        (col("pt3") * col("c4")).cast("float").as("pt_jec"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private lazy val l23Sql = {
    val l1csv = s"$fixturesDir/jec_l1_data.csv"
    val l2csv = s"$fixturesDir/jec_l2_data.csv"
    val rescsv = s"$fixturesDir/jec_res_data.csv"
    def cl(x: String, lo: String, hi: String) = s"LEAST(GREATEST($x, $lo), $hi)"
    val f1 = TFormula.toSql(jecL1D.formula,
      Vector(cl("j.rho", "l1.rho_lo", "l1.rho_hi"),
        cl("j.pt_raw", "l1.pt_lo", "l1.pt_hi"),
        cl("j.area", "l1.a_lo", "l1.a_hi")),
      i => s"l1.p$i")
    val f2 = TFormula.toSql(jecL2D.formula,
      Vector(cl("s1.pt1", "l2.x_lo", "l2.x_hi")), i => s"l2.p$i")
    val l3row = jecL3D.rows.head
    val f3 = TFormula.toSql(jecL3D.formula,
      Vector(cl("pt2", l3row.clamps(0)._1.toString, l3row.clamps(0)._2.toString)),
      i => l3row.params(i).toString)
    val f4 = TFormula.toSql(jecResD.formula,
      Vector(cl("s3.pt3", "r.x_lo", "r.x_hi")), i => s"r.p$i")
    s"""WITH l1 AS (SELECT * FROM read_csv('$l1csv', header=true, columns={
       |  'eta_lo':'DOUBLE','eta_hi':'DOUBLE','rho_lo':'DOUBLE','rho_hi':'DOUBLE',
       |  'pt_lo':'DOUBLE','pt_hi':'DOUBLE','a_lo':'DOUBLE','a_hi':'DOUBLE',
       |  'p0':'DOUBLE','p1':'DOUBLE','p2':'DOUBLE','p3':'DOUBLE','p4':'DOUBLE',
       |  'p5':'DOUBLE','p6':'DOUBLE'})),
       |l2 AS (SELECT * FROM read_csv('$l2csv', header=true, columns={
       |  'eta_lo':'DOUBLE','eta_hi':'DOUBLE','bpt_lo':'DOUBLE','bpt_hi':'DOUBLE',
       |  'x_lo':'DOUBLE','x_hi':'DOUBLE',
       |  'p0':'DOUBLE','p1':'DOUBLE','p2':'DOUBLE','p3':'DOUBLE','p4':'DOUBLE'})),
       |res AS (SELECT * FROM read_csv('$rescsv', header=true, columns={
       |  'eta_lo':'DOUBLE','eta_hi':'DOUBLE','x_lo':'DOUBLE','x_hi':'DOUBLE',
       |  'p0':'DOUBLE','p1':'DOUBLE','p2':'DOUBLE','p3':'DOUBLE','p4':'DOUBLE',
       |  'p5':'DOUBLE','p6':'DOUBLE','p7':'DOUBLE','p8':'DOUBLE'})),
       |l2f AS (SELECT *,
       |  bpt_lo = MIN(bpt_lo) OVER (PARTITION BY eta_lo, eta_hi) AS is_first,
       |  bpt_hi = MAX(bpt_hi) OVER (PARTITION BY eta_lo, eta_hi) AS is_last
       | FROM l2),
       |jets AS ($l21JetsSql),
       |s1 AS (
       | SELECT j.l_orderkey, j.l_linenumber, j.l_extendedprice, j.eta,
       |  COALESCE($f1, 1.0) AS c1,
       |  j.pt_raw * COALESCE($f1, 1.0) AS pt1
       | FROM jets j LEFT JOIN l1
       |  ON j.eta >= l1.eta_lo AND j.eta < l1.eta_hi),
       |s2 AS (
       | SELECT s1.l_orderkey, s1.l_linenumber, s1.l_extendedprice, s1.eta, s1.c1,
       |  COALESCE($f2, 1.0) AS c2,
       |  s1.pt1 * COALESCE($f2, 1.0) AS pt2
       | FROM s1 LEFT JOIN l2f l2
       |  ON s1.eta >= l2.eta_lo AND s1.eta < l2.eta_hi
       |  AND (s1.pt1 >= l2.bpt_lo OR l2.is_first)
       |  AND (s1.pt1 < l2.bpt_hi OR l2.is_last)),
       |s3 AS (
       | SELECT s2.*, pt2 * $f3 AS pt3 FROM s2)
       |SELECT s3.l_orderkey, s3.l_linenumber, s3.l_extendedprice,
       | CAST(s3.c1 AS REAL) AS c1, CAST(s3.c2 AS REAL) AS c2,
       | CAST(COALESCE($f4, 1.0) AS REAL) AS c_residual,
       | CAST(s3.pt3 * COALESCE($f4, 1.0) AS REAL) AS pt_jec
       |FROM s3 LEFT JOIN res r
       |  ON s3.eta >= r.eta_lo AND s3.eta < r.eta_hi
       |ORDER BY 1, 2, 3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l20_btag_csv_real" -> (l20 _),
    "l21_jec_levels_real" -> (l21 _),
    "l23_jec_data_residual" -> (l23 _)
  )

  val oracle: Map[String, String] = Map(
    "l20_btag_csv_real" -> l20Sql,
    "l21_jec_levels_real" -> l21Sql,
    "l23_jec_data_residual" -> l23Sql
  )
}
