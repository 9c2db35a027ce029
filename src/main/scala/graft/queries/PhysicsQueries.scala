package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.physics.{Kinematics => K, Selections}

/** Projection / filter / computed-column operators (SURVEY.md §2.2,
  * P2–P24) phrased over the test tables, with pseudo-kinematics derived
  * deterministically from uniform columns.
  *
  * Every query is row-wise (no aggregation), so Spark and DuckDB evaluate
  * the identical double-precision expression tree; final floats are cast
  * to float32 on both sides to absorb libm ulp differences.
  */
object PhysicsQueries extends QueryFamily {

  // ---- shared pseudo-kinematics (events table) ---------------------------
  // Two four-vectors per event row, derived from (value, event_id, user_id).
  private def vecCols: Seq[Column] = Seq(
    (col("value") + lit(1.0)).as("pt1"),
    ((col("event_id") % 100) / lit(25.0) - lit(2.0)).as("eta1"),
    ((col("event_id") % 63) / lit(10.0) - lit(3.1)).as("phi1"),
    ((col("value") % 37.0) + lit(1.0)).as("pt2"),
    ((col("user_id") % 80) / lit(20.0) - lit(2.0)).as("eta2"),
    ((col("user_id") % 63) / lit(10.0) - lit(3.1)).as("phi2"))
  private val vecSql =
    """value + 1.0 AS pt1,
      | (event_id % 100) / 25.0 - 2.0 AS eta1,
      | (event_id % 63) / 10.0 - 3.1 AS phi1,
      | (value % 37.0) + 1.0 AS pt2,
      | (user_id % 80) / 20.0 - 2.0 AS eta2,
      | (user_id % 63) / 10.0 - 3.1 AS phi2""".stripMargin
  private val muMass = 0.1057

  // SQL mirrors of Kinematics' portable forms (same expression tree).
  private def sinhS(x: String) = s"((EXP($x) - EXP(-($x))) / 2.0)"
  private def asinhS(x: String) = s"LN(($x) + SQRT(($x) * ($x) + 1.0))"
  private def tanhS(x: String) = s"((EXP(($x) * 2.0) - 1.0) / (EXP(($x) * 2.0) + 1.0))"
  private def pmodS(x: String, m: String) = s"((($x) % ($m)) + ($m)) % ($m)"
  private def dphiS(p1: String, p2: String) =
    s"ABS(${pmodS(s"$p1 - $p2 + PI()", "2.0 * PI()")} - PI())"
  private def pxS(pt: String, phi: String) = s"(($pt) * COS($phi))"
  private def pyS(pt: String, phi: String) = s"(($pt) * SIN($phi))"
  private def pzS(pt: String, eta: String) = s"(($pt) * ${sinhS(eta)})"
  private def eS(pt: String, eta: String, m: String) =
    s"SQRT(($pt) * ($pt) + ${pzS(pt, eta)} * ${pzS(pt, eta)} + ($m) * ($m))"

  // ---- p02: event-quality flag AND (P2) ----------------------------------
  // reference: stage1/processor.py:234-235 — product of named bool flags
  // > 0; a missing flag column is tolerated as false via coalesce.
  private def p02(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val flags = Seq(
      col("l_quantity") > 10.0,
      col("l_discount") < 0.08,
      lit(null).cast("boolean")) // a "missing" flag column
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        Selections.allFlags(flags.init).as("pass_all"),
        Selections.allFlags(flags).as("pass_with_missing"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val p02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      | (COALESCE(l_quantity > 10.0, FALSE) AND COALESCE(l_discount < 0.08, FALSE)) AS pass_all,
      | (COALESCE(l_quantity > 10.0, FALSE) AND COALESCE(l_discount < 0.08, FALSE)
      |   AND COALESCE(CAST(NULL AS BOOLEAN), FALSE)) AS pass_with_missing
      |FROM lineitem ORDER BY 1, 2, 3""".stripMargin

  // ---- p03: HLT trigger OR (P3) ------------------------------------------
  // reference: stage1/processor.py:151-156 — OR of per-year trigger
  // columns, missing branches tolerated.
  private def p03(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val triggers = Seq(
      col("event_type") === "click",
      col("value") > 400.0,
      lit(null).cast("boolean"))
    ev.select(col("event_id"), Selections.anyTrigger(triggers).as("fired"))
      .orderBy(col("event_id"))
  }
  private val p03Sql =
    """SELECT event_id,
      | (COALESCE(event_type = 'click', FALSE) OR COALESCE(value > 400.0, FALSE)
      |   OR COALESCE(CAST(NULL AS BOOLEAN), FALSE)) AS fired
      |FROM events ORDER BY event_id""".stripMargin

  // ---- p04: lumi-mask interval join (P4) ---------------------------------
  // reference: stage1/processor.py:146-148 — (run, luminosityBlock) must
  // fall in a certified range from a run -> [[lo,hi],...] JSON. Broadcast
  // range join: the mask table is tiny, the event side never shuffles.
  private val lumiRanges: Seq[(Long, Long, Long)] =
    (0L until 150L).map(r => (r, (r * 37) % 600, (r * 37) % 600 + 250))
  private def p04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = rd(s, dir, "events")
      .select(col("event_id"), col("user_id").as("run"),
              (col("event_id") % 1000).as("lumi"))
    val mask = broadcast(lumiRanges.toDF("m_run", "m_lo", "m_hi"))
    ev.join(mask, col("run") === col("m_run") &&
        col("lumi") >= col("m_lo") && col("lumi") <= col("m_hi"), "left_semi")
      .orderBy(col("event_id"))
  }
  private val p04Sql = {
    val values = lumiRanges.map { case (r, lo, hi) => s"($r, $lo, $hi)" }
      .mkString(", ")
    s"""SELECT event_id, user_id AS run, event_id % 1000 AS lumi
       |FROM events
       |WHERE EXISTS (SELECT 1 FROM (VALUES $values) AS m(m_run, m_lo, m_hi)
       |  WHERE user_id = m_run AND event_id % 1000 >= m_lo AND event_id % 1000 <= m_hi)
       |ORDER BY event_id""".stripMargin
  }

  // ---- p05: object selection (P5) ----------------------------------------
  // reference: stage1/processor.py:243-249 — per-object predicate over
  // pt/eta/iso/id analogs; Catalyst pushes these into the parquet scan.
  private def p05(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    li.filter(col("l_extendedprice") > 20000.0 &&
        abs(col("l_discount") * 40.0 - 2.0) < 1.6 &&
        col("l_tax") < 0.06 && col("l_quantity") > 5.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
              col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val p05Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |WHERE l_extendedprice > 20000.0 AND ABS(l_discount * 40.0 - 2.0) < 1.6
      |  AND l_tax < 0.06 AND l_quantity > 5.0
      |ORDER BY 1, 2, 3""".stripMargin

  // ---- p06: veto / NOT EXISTS (P6) ---------------------------------------
  // reference: stage1/processor.py:263-268 — keep events with no electron
  // passing the selection; left-anti join keyed on the event.
  private def p06(s: SparkSession, dir: String): DataFrame = {
    val o = rd(s, dir, "orders")
    val li = rd(s, dir, "lineitem")
    val electrons = li.filter(col("l_quantity") < 3.0)
      .select(col("l_orderkey").as("e_orderkey"))
    o.join(electrons, col("o_orderkey") === col("e_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
  private val p06Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity < 3.0)
      |ORDER BY o_orderkey""".stripMargin

  // ---- p07: bit-test selection with escapes (P7) -------------------------
  // reference: stage1/jets.py:150-178 — jetId/puId working-point bit
  // tests with a pt>50 escape hatch and an eta-window special case.
  private def p07(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val jetId = col("l_linenumber").bitwiseAND(lit(2)) =!= 0
    val puId = col("l_linenumber").bitwiseAND(lit(4)) =!= 0
    val pt = col("l_extendedprice") / lit(1000.0)
    val eta = col("l_discount") * 94.0 - 4.7
    val pass = jetId && (puId || pt > 50.0) &&
      when(abs(eta) > 2.6 && abs(eta) < 3.0, pt > 30.0).otherwise(pt > 25.0)
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        pass.as("jet_pass"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val p07Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      | ((l_linenumber & 2) != 0 AND ((l_linenumber & 4) != 0 OR l_extendedprice / 1000.0 > 50.0)
      |  AND (CASE WHEN ABS(l_discount * 94.0 - 4.7) > 2.6 AND ABS(l_discount * 94.0 - 4.7) < 3.0
      |       THEN l_extendedprice / 1000.0 > 30.0
      |       ELSE l_extendedprice / 1000.0 > 25.0 END)) AS jet_pass
      |FROM lineitem ORDER BY 1, 2, 3""".stripMargin

  // ---- p08: mass-region labeler (P8) -------------------------------------
  // reference: stage1/processor.py:471-478.
  private def p08(s: SparkSession, dir: String): DataFrame = {
    val o = rd(s, dir, "orders")
    val mass = col("o_totalprice") % lit(160.0)
    o.select(col("o_orderkey"), mass.cast("float").as("mass"),
        Selections.regionLabel(mass).as("region"))
      .orderBy(col("o_orderkey"))
  }
  private val p08Sql =
    s"""SELECT o_orderkey, CAST(o_totalprice % 160.0 AS REAL) AS mass,
       | ${RelationalQueries.regionCaseSql("(o_totalprice % 160.0)")} AS region
       |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---- p09: channel labeler cascade (P9) ---------------------------------
  // reference: stage2/categorizer.py:1-23 — priority cascade over
  // per-event aggregates (order of branches is semantic).
  private def p09(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val per = li.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("njets"),
      sum(when(col("l_quantity") > 45.0, 1L).otherwise(0L)).as("nbtag"),
      max(col("l_extendedprice")).as("jj_mass_proxy"),
      (max(col("l_discount")) * lit(40.0)).as("deta_proxy"),
      (max(col("l_extendedprice")) / lit(1000.0)).as("lead_pt"))
    per.select(col("l_orderkey"),
        Selections.channelLabel(col("nbtag"), col("jj_mass_proxy") / 100.0,
          col("deta_proxy"), col("lead_pt"), col("njets")).as("channel"))
      .orderBy(col("l_orderkey"))
  }
  private val p09Sql =
    """SELECT l_orderkey,
      | CASE WHEN nbtag > 1 THEN 'ttHorVH'
      |      WHEN jj_mass_proxy / 100.0 > 400.0 AND deta_proxy > 2.5 AND lead_pt > 35.0 THEN 'vbf'
      |      WHEN njets = 0 THEN 'ggh_0jets'
      |      WHEN njets = 1 THEN 'ggh_1jet'
      |      ELSE 'ggh_2orMoreJets' END AS channel
      |FROM (SELECT l_orderkey, COUNT(*) AS njets,
      |        SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS nbtag,
      |        MAX(l_extendedprice) AS jj_mass_proxy,
      |        MAX(l_discount) * 40.0 AS deta_proxy,
      |        MAX(l_extendedprice) / 1000.0 AS lead_pt
      |      FROM lineitem GROUP BY 1)
      |ORDER BY l_orderkey""".stripMargin

  // ---- p10: four-vector sum (P10 + P12) ----------------------------------
  // reference: python/math_tools.py:5-35 — (pt,eta,phi,m)x2 -> composite
  // (pt, eta, phi, mass, rap). Pure column math, single codegen stage.
  private def p10(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val v = ev.select((col("event_id") +: vecCols): _*)
    val m = lit(muMass)
    v.select(col("event_id"),
        K.p4SumPt(col("pt1"), col("phi1"), col("pt2"), col("phi2"))
          .cast("float").as("sum_pt"),
        K.p4SumEta(col("pt1"), col("eta1"), col("phi1"),
                   col("pt2"), col("eta2"), col("phi2"))
          .cast("float").as("sum_eta"),
        K.p4SumPhi(col("pt1"), col("phi1"), col("pt2"), col("phi2"))
          .cast("float").as("sum_phi"),
        K.p4SumMass(col("pt1"), col("eta1"), col("phi1"), m,
                    col("pt2"), col("eta2"), col("phi2"), m)
          .cast("float").as("sum_mass"),
        K.p4SumRap(col("pt1"), col("eta1"), col("phi1"), m,
                   col("pt2"), col("eta2"), col("phi2"), m)
          .cast("float").as("sum_rap"))
      .orderBy(col("event_id"))
  }
  private val p10Sql = {
    val (sx, sy) = (s"${pxS("pt1", "phi1")} + ${pxS("pt2", "phi2")}",
                    s"${pyS("pt1", "phi1")} + ${pyS("pt2", "phi2")}")
    val sz = s"${pzS("pt1", "eta1")} + ${pzS("pt2", "eta2")}"
    val se = s"${eS("pt1", "eta1", muMass.toString)} + ${eS("pt2", "eta2", muMass.toString)}"
    s"""SELECT event_id,
       | CAST(SQRT(($sx) * ($sx) + ($sy) * ($sy)) AS REAL) AS sum_pt,
       | CAST(${asinhS(s"($sz) / SQRT(($sx) * ($sx) + ($sy) * ($sy))")} AS REAL) AS sum_eta,
       | CAST(ATAN2(($sy), ($sx)) AS REAL) AS sum_phi,
       | CAST(SQRT(GREATEST(($se) * ($se) - ($sx) * ($sx) - ($sy) * ($sy) - ($sz) * ($sz), 0.0)) AS REAL) AS sum_mass,
       | CAST(0.5 * LN((($se) + ($sz)) / (($se) - ($sz))) AS REAL) AS sum_rap
       |FROM (SELECT event_id, $vecSql FROM events)
       |ORDER BY event_id""".stripMargin
  }

  // ---- p11: delta_eta / delta_phi / delta_r (P11) ------------------------
  // reference: python/math_tools.py:220-224.
  private def p11(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val v = ev.select((col("event_id") +: vecCols): _*)
    v.select(col("event_id"),
        K.deltaEta(col("eta1"), col("eta2")).cast("float").as("d_eta"),
        K.deltaPhi(col("phi1"), col("phi2")).cast("float").as("d_phi"),
        K.deltaR(col("eta1"), col("phi1"), col("eta2"), col("phi2"))
          .cast("float").as("d_r"))
      .orderBy(col("event_id"))
  }
  private val p11Sql = {
    val de = "ABS(eta1 - eta2)"
    val dp = dphiS("phi1", "phi2")
    s"""SELECT event_id,
       | CAST($de AS REAL) AS d_eta,
       | CAST($dp AS REAL) AS d_phi,
       | CAST(SQRT(($de) * ($de) + ($dp) * ($dp)) AS REAL) AS d_r
       |FROM (SELECT event_id, $vecSql FROM events)
       |ORDER BY event_id""".stripMargin
  }

  // ---- p13: Collins–Soper angles, simple form (P13) ----------------------
  // reference: python/math_tools.py:38-42.
  private def p13(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val v = ev.select((col("event_id") +: vecCols): _*)
    v.select(col("event_id"),
        K.cosThetaCS(col("eta1"), col("eta2")).cast("float").as("cos_theta_cs"),
        K.phiCS(col("eta1"), col("phi1"), col("eta2"), col("phi2"))
          .cast("float").as("phi_cs"))
      .orderBy(col("event_id"))
  }
  private val p13Sql = {
    val ct = tanhS("(eta1 - eta2) / 2.0")
    val st = s"SQRT(GREATEST(1.0 - ($ct) * ($ct), 0.0))"
    s"""SELECT event_id,
       | CAST($ct AS REAL) AS cos_theta_cs,
       | CAST(TAN((PI() - ${dphiS("phi1", "phi2")}) / 2.0) * ($st) AS REAL) AS phi_cs
       |FROM (SELECT event_id, $vecSql FROM events)
       |ORDER BY event_id""".stripMargin
  }

  // ---- p17: derived VBF kinematics (P17) ---------------------------------
  // reference: stage1/jets.py:115-147 — zeppenfeld, rpt, log variables,
  // mmj_min_dEta/dPhi. NOTE the reference's mmj_min has an np.where
  // ARG-ORDER BUG (`stage1/jets.py:137-147`: np.where(a, b, a < b) —
  // condition and branches swapped, yielding b wherever a != 0). This
  // port implements the INTENDED semantics — elementwise min of the two
  // dimuon-jet distances — and the oracle locks the corrected form
  // (LEAST on both engines). See COVERAGE.md §2.2 P17.
  private def p17(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val v = ev.select((Seq(col("event_id"), col("value")) ++ vecCols): _*)
    val etaLL = (col("value") % 5.0) - lit(2.5)
    val phiLL = (col("value") % 6.2) - lit(3.1)
    val ptSum = K.p4SumPt(col("pt1"), col("phi1"), col("pt2"), col("phi2"))
    v.select(col("event_id"),
        K.zeppenfeld(etaLL, col("eta1"), col("eta2")).cast("float").as("zeppenfeld"),
        K.rPt(ptSum, col("value") + 1.0, col("pt1"), col("pt2")).cast("float").as("rpt"),
        log(col("value") + lit(1.0)).cast("float").as("jj_mass_log"),
        log(abs(K.zeppenfeld(etaLL, col("eta1"), col("eta2"))) + lit(1e-9))
          .cast("float").as("ll_zstar_log"),
        least(K.deltaEta(etaLL, col("eta1")), K.deltaEta(etaLL, col("eta2")))
          .cast("float").as("mmj_min_deta"),
        least(K.deltaPhi(phiLL, col("phi1")), K.deltaPhi(phiLL, col("phi2")))
          .cast("float").as("mmj_min_dphi"))
      .orderBy(col("event_id"))
  }
  private val p17Sql = {
    val zep = "(((value % 5.0) - 2.5) - (eta1 + eta2) / 2.0)"
    val (sx, sy) = (s"${pxS("pt1", "phi1")} + ${pxS("pt2", "phi2")}",
                    s"${pyS("pt1", "phi1")} + ${pyS("pt2", "phi2")}")
    val etaLL = "((value % 5.0) - 2.5)"
    val phiLL = "((value % 6.2) - 3.1)"
    s"""SELECT event_id,
       | CAST($zep AS REAL) AS zeppenfeld,
       | CAST(SQRT(($sx) * ($sx) + ($sy) * ($sy)) / ((value + 1.0) + pt1 + pt2) AS REAL) AS rpt,
       | CAST(LN(value + 1.0) AS REAL) AS jj_mass_log,
       | CAST(LN(ABS($zep) + 1e-9) AS REAL) AS ll_zstar_log,
       | CAST(LEAST(ABS($etaLL - eta1), ABS($etaLL - eta2)) AS REAL) AS mmj_min_deta,
       | CAST(LEAST(${dphiS(phiLL, "phi1")}, ${dphiS(phiLL, "phi2")}) AS REAL) AS mmj_min_dphi
       |FROM (SELECT event_id, value, $vecSql FROM events)
       |ORDER BY event_id""".stripMargin
  }

  // ---- p25: tag-and-probe efficiency (extension) ---------------------------
  // The standard data-driven efficiency measurement (trigger/ID
  // efficiency vs pT): events where leg 1 passes a TIGHT tag selection
  // contribute leg 2 as an unbiased probe; per probe-pT bin, the
  // passing fraction estimates the per-leg efficiency, reported with
  // the Wilson score interval (z = 2). Counts are exact integers from
  // one scan + one bin-keyed aggregate; the efficiency and interval
  // bounds are single fixed-parenthesization double expressions over
  // (n, k) — identical correctly-rounded ops on both engines, float32
  // at the end.
  private def p25(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val v = ev.select((Seq(col("event_id"), col("user_id")) ++ vecCols): _*)
    val tagged = v.filter(col("pt1") > 20.0 && abs(col("eta1")) < 1.5)
      .select(expr("CAST(floor(pt2 / 5.0) AS BIGINT)").as("pt_bin"),
        expr("CASE WHEN user_id % 10 < 7 THEN 1L ELSE 0L END").as("pass"))
    val eff = "CAST(k AS DOUBLE) / n"
    val wilson = (sign: String) =>
      s"((CAST(k AS DOUBLE) / n + 2.0 / n) $sign " +
        s"2.0 * SQRT((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n" +
        s" + 1.0 / (n * CAST(n AS DOUBLE)))) / (1.0 + 4.0 / n)"
    tagged.groupBy(col("pt_bin"))
      .agg(count(lit(1)).as("n"), sum(col("pass")).as("k"))
      .select(col("pt_bin"), col("n"), col("k"),
        expr(s"CAST($eff AS FLOAT)").as("eff"),
        expr(s"CAST(${wilson("-")} AS FLOAT)").as("eff_lo"),
        expr(s"CAST(${wilson("+")} AS FLOAT)").as("eff_hi"))
      .orderBy(col("pt_bin"))
  }
  private val p25Sql = {
    val eff = "CAST(k AS DOUBLE) / n"
    val wilson = (sign: String) =>
      s"((CAST(k AS DOUBLE) / n + 2.0 / n) $sign " +
        s"2.0 * SQRT((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n" +
        s" + 1.0 / (n * CAST(n AS DOUBLE)))) / (1.0 + 4.0 / n)"
    s"""WITH v AS (SELECT event_id, user_id, $vecSql FROM events),
       |probes AS (
       | SELECT CAST(FLOOR(pt2 / 5.0) AS BIGINT) AS pt_bin,
       |  CASE WHEN user_id % 10 < 7 THEN 1 ELSE 0 END AS pass
       | FROM v WHERE pt1 > 20.0 AND ABS(eta1) < 1.5),
       |agg AS (
       | SELECT pt_bin, COUNT(*) AS n, CAST(SUM(pass) AS BIGINT) AS k
       | FROM probes GROUP BY 1)
       |SELECT pt_bin, n, k,
       | CAST($eff AS REAL) AS eff,
       | CAST(${wilson("-")} AS REAL) AS eff_lo,
       | CAST(${wilson("+")} AS REAL) AS eff_hi
       |FROM agg ORDER BY pt_bin""".stripMargin
  }

  // ---- p18: FSR recovery — conditional indexed merge (P18/J1) ------------
  // reference: stage1/corrections/fsr_recovery.py:5-49 — muon's
  // fsrPhotonIdx picks an event-local photon; if the photon passes
  // quality cuts, the muon kinematics are replaced by the merged value.
  private def p18(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val muons = li.filter(col("l_quantity") <= 10.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
              (col("l_extendedprice") / lit(500.0)).as("mu_pt"))
    val photons = li.filter(col("l_quantity") >= 45.0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_extendedprice"))))
        .as("phs"))
    val idx = (pmod(col("l_linenumber"), size(col("phs"))) + 1).cast("int")
    val ph = element_at(col("phs"), idx).getField("l_extendedprice")
    val phPt = ph / lit(500.0)
    val merged = muons.join(photons, Seq("l_orderkey"), "left")
      .withColumn("fsr_ok",
        col("phs").isNotNull && (col("mu_pt") / (phPt + col("mu_pt"))) > lit(0.6))
      .withColumn("pt_corr",
        when(col("fsr_ok"), col("mu_pt") + phPt).otherwise(col("mu_pt")))
    merged.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("fsr_ok"), col("pt_corr").cast("float").as("pt_corr"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val p18Sql =
    """WITH muons AS (
      | SELECT l_orderkey, l_linenumber, l_extendedprice,
      |        l_extendedprice / 500.0 AS mu_pt
      | FROM lineitem WHERE l_quantity <= 10.0),
      |photons AS (
      | SELECT l_orderkey,
      |        LIST(l_extendedprice ORDER BY l_linenumber ASC, l_extendedprice ASC) AS phs
      | FROM lineitem WHERE l_quantity >= 45.0 GROUP BY 1),
      |joined AS (
      | SELECT m.*, p.phs,
      |   p.phs[CAST(((m.l_linenumber % len(p.phs)) + len(p.phs)) % len(p.phs) AS BIGINT) + 1] / 500.0 AS ph_pt
      | FROM muons m LEFT JOIN photons p USING (l_orderkey))
      |SELECT l_orderkey, l_linenumber, l_extendedprice,
      | (phs IS NOT NULL AND mu_pt / (ph_pt + mu_pt) > 0.6) AS fsr_ok,
      | CAST(CASE WHEN phs IS NOT NULL AND mu_pt / (ph_pt + mu_pt) > 0.6
      |      THEN mu_pt + ph_pt ELSE mu_pt END AS REAL) AS pt_corr
      |FROM joined ORDER BY 1, 2, 3""".stripMargin

  // ---- p19: eta-binned piecewise correction + raw snapshot (P19/P20) -----
  // reference: stage1/corrections/geofit.py:5-28 — pt -= f(|eta| bin) *
  // d0 * charge * pt^2 / 1e4; the uncorrected value is kept as pt_raw.
  private def p19(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val pt = col("value") + lit(1.0)
    val eta = (col("event_id") % 100) / lit(25.0) - lit(2.0)
    val d0 = (col("user_id") % 21) / lit(1000.0) - lit(0.01)
    val charge = when(col("event_id") % 2 === 0, 1.0).otherwise(-1.0)
    val factor = when(abs(eta) < 0.9, 411.34)
      .when(abs(eta) < 1.7, 673.40)
      .otherwise(1099.0)
    val corr = pt - factor * d0 * charge * pt * pt / lit(1.0e4)
    ev.select(col("event_id"), pt.cast("float").as("pt_raw"),
        corr.cast("float").as("pt_corr"))
      .orderBy(col("event_id"))
  }
  private val p19Sql =
    """SELECT event_id, CAST(pt AS REAL) AS pt_raw,
      | CAST(pt - (CASE WHEN ABS(eta) < 0.9 THEN 411.34
      |            WHEN ABS(eta) < 1.7 THEN 673.40
      |            ELSE 1099.0 END) * d0 * charge * pt * pt / 1.0e4 AS REAL) AS pt_corr
      |FROM (SELECT event_id, value + 1.0 AS pt,
      |        (event_id % 100) / 25.0 - 2.0 AS eta,
      |        (user_id % 21) / 1000.0 - 0.01 AS d0,
      |        CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END AS charge
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  // ---- p21: gen-mass split filter (P21) ----------------------------------
  // reference: stage2/postprocessor.py:86-89 — complementary mass-window
  // filters keyed by dataset name.
  private def p21(s: SparkSession, dir: String): DataFrame = {
    val d = rd(s, dir, "documents")
    d.filter((col("source") === "web" && col("n_chars") <= 350) ||
             (col("source") =!= "web" && col("n_chars") > 350))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }
  private val p21Sql =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE (source = 'web' AND n_chars <= 350)
      |   OR (source != 'web' AND n_chars > 350)
      |ORDER BY doc_id""".stripMargin

  // ---- p22: conditional relabeling (P22) ---------------------------------
  // reference: stage2/postprocessor.py:111-123 — rename dataset based on
  // per-row gen-match booleans.
  private def p22(s: SparkSession, dir: String): DataFrame = {
    val d = rd(s, dir, "documents")
    d.select(col("doc_id"),
        when(col("n_chars") > 400, concat(col("source"), lit("_2j")))
          .when(col("n_chars") > 200, concat(col("source"), lit("_01j")))
          .otherwise(col("source")).as("source_relabel"))
      .orderBy(col("doc_id"))
  }
  private val p22Sql =
    """SELECT doc_id,
      | CASE WHEN n_chars > 400 THEN source || '_2j'
      |      WHEN n_chars > 200 THEN source || '_01j'
      |      ELSE source END AS source_relabel
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- p23: score -> bin digitize (P23) ----------------------------------
  // reference: stage2/postprocessor.py:172-195 + config/mva_bins.py —
  // map an MVA score onto per-model bin edges.
  private val mvaEdges = Seq(0.0, 0.3, 0.5, 0.7, 0.85, 1.0)
  private def p23(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val score = (col("value") % 1.0)
    val bin = mvaEdges.init.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (edge, i)) => when(score >= edge, i + 1).otherwise(acc)
    }
    ev.select(col("event_id"), score.cast("float").as("score"), bin.as("mva_bin"))
      .orderBy(col("event_id"))
  }
  private val p23Sql = {
    val cases = mvaEdges.init.zipWithIndex.reverse
      .map { case (e, i) => s"WHEN (value % 1.0) >= $e THEN ${i + 1}" }
      .mkString(" ")
    s"""SELECT event_id, CAST(value % 1.0 AS REAL) AS score,
       | CASE $cases ELSE 0 END AS mva_bin
       |FROM events ORDER BY event_id""".stripMargin
  }

  // ---- p24: NaN/null normalization (P24) ---------------------------------
  // reference: stage2/postprocessor.py:79-81 — wgt_* -> 0, others -> -999.
  private def p24(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val masked = ev.select(col("event_id"),
      when(col("value") > 100.0, col("value")).as("obs"),
      when(col("event_type") === "purchase", col("value")).as("wgt"))
    masked.na.fill(Map("obs" -> -999.0, "wgt" -> 0.0))
      .select(col("event_id"), col("obs").cast("float").as("obs"),
              col("wgt").cast("float").as("wgt"))
      .orderBy(col("event_id"))
  }
  private val p24Sql =
    """SELECT event_id,
      | CAST(COALESCE(CASE WHEN value > 100.0 THEN value END, -999.0) AS REAL) AS obs,
      | CAST(COALESCE(CASE WHEN event_type = 'purchase' THEN value END, 0.0) AS REAL) AS wgt
      |FROM events ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p02_flag_and" -> (p02 _),
    "p03_trigger_or" -> (p03 _),
    "p04_lumimask_interval" -> (p04 _),
    "p05_object_selection" -> (p05 _),
    "p06_veto_antijoin" -> (p06 _),
    "p07_bit_selection" -> (p07 _),
    "p08_region_label" -> (p08 _),
    "p09_channel_cascade" -> (p09 _),
    "p10_p4_sum" -> (p10 _),
    "p11_delta_r" -> (p11 _),
    "p13_cs_angles" -> (p13 _),
    "p17_vbf_kinematics" -> (p17 _),
    "p18_fsr_recovery" -> (p18 _),
    "p25_tag_probe" -> (p25 _),
    "p19_geofit_piecewise" -> (p19 _),
    "p21_gen_split" -> (p21 _),
    "p22_relabel" -> (p22 _),
    "p23_digitize" -> (p23 _),
    "p24_nan_fill" -> (p24 _)
  )

  val oracle: Map[String, String] = Map(
    "p02_flag_and" -> p02Sql,
    "p03_trigger_or" -> p03Sql,
    "p04_lumimask_interval" -> p04Sql,
    "p05_object_selection" -> p05Sql,
    "p06_veto_antijoin" -> p06Sql,
    "p07_bit_selection" -> p07Sql,
    "p08_region_label" -> p08Sql,
    "p09_channel_cascade" -> p09Sql,
    "p10_p4_sum" -> p10Sql,
    "p11_delta_r" -> p11Sql,
    "p13_cs_angles" -> p13Sql,
    "p17_vbf_kinematics" -> p17Sql,
    "p18_fsr_recovery" -> p18Sql,
    "p25_tag_probe" -> p25Sql,
    "p19_geofit_piecewise" -> p19Sql,
    "p21_gen_split" -> p21Sql,
    "p22_relabel" -> p22Sql,
    "p23_digitize" -> p23Sql,
    "p24_nan_fill" -> p24Sql
  )
}
