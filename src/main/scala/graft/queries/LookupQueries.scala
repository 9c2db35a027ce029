package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lookup.BinnedLookup._

/** Binned-lookup / correction-factor operators (SURVEY.md §2.3 L1–L6).
  *
  * Every lookup table is tiny (10s of rows) and deterministic, so each
  * evaluation is a `broadcast()` range join — the event side never
  * shuffles, and Catalyst folds the join into the scan stage. The DuckDB
  * oracle gets the same table as a VALUES list.
  */
object LookupQueries extends QueryFamily {

  // ---- l01: 1-D binned SF lookup (L1, pileup-style) ----------------------
  // reference: stage1/corrections/pu_reweight.py:9-27,75-85 — dense_lookup
  // of an event scalar in a 1-D binned table.
  private val puBins: Seq[Bin1D] = (0 until 20).map { i =>
    Bin1D(i * 25.0, (i + 1) * 25.0, 1.0 + ((i * 7) % 13 - 6) / 100.0)
  }
  private def l01(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val bins = bins1DF(s, puBins)
    join1D(ev, bins, col("value"))
      .select(col("event_id"),
        coalesce(col("sf"), lit(1.0)).cast("float").as("pu_wgt"))
      .orderBy(col("event_id"))
  }
  private val l01Sql =
    s"""SELECT event_id,
       | CAST(COALESCE(sfb.sf, 1.0) AS REAL) AS pu_wgt
       |FROM events LEFT JOIN ${bins1Sql(puBins)}
       |  ON value >= sfb.lo AND value < sfb.hi
       |ORDER BY event_id""".stripMargin

  // ---- l02: 2-D binned SF lookup (L1, lepton-SF-style) -------------------
  // reference: stage1/corrections/lepton_sf.py:57-76 — SF(pt, |eta|) from
  // a 2-D histogram; out-of-range rows keep SF=1.
  private val lepBins: Seq[Bin2D] = for {
    (xlo, xhi, i) <- Seq((0.0, 20.0, 0), (20.0, 30.0, 1), (30.0, 50.0, 2), (50.0, 200.0, 3))
    (ylo, yhi, j) <- Seq((0.0, 0.9, 0), (0.9, 1.7, 1), (1.7, 2.4, 2))
  } yield Bin2D(xlo, xhi, ylo, yhi, 0.95 + (i * 3 + j) / 100.0)
  private def l02(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val withKin = li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"),
      (col("l_extendedprice") / lit(1000.0)).as("pt"),
      abs(col("l_discount") * 40.0 - 2.0).as("abseta"))
    join2D(withKin, bins2DF(s, lepBins), col("pt"), col("abseta"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        coalesce(col("sf"), lit(1.0)).cast("float").as("id_sf"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val l02Sql =
    s"""SELECT l_orderkey, l_linenumber, l_extendedprice,
       | CAST(COALESCE(sfb.sf, 1.0) AS REAL) AS id_sf
       |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
       |        l_extendedprice / 1000.0 AS pt,
       |        ABS(l_discount * 40.0 - 2.0) AS abseta
       |      FROM lineitem) li
       |LEFT JOIN ${bins2Sql(lepBins)}
       |  ON pt >= sfb.xlo AND pt < sfb.xhi AND abseta >= sfb.ylo AND abseta < sfb.yhi
       |ORDER BY 1, 2, 3""".stripMargin

  // ---- l03: piecewise-linear interpolation (L2, np.interp) ---------------
  // reference: stage1/corrections/nnlops.py:25-59 — interp over an (x,y)
  // graph with input clipped to the graph range.
  private val interpNodes: Seq[Node] =
    (0 to 10).map(i => Node(i * 50.0, 1.0 + math.sin(i * 0.7) / 10.0))
  private def l03(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val xMin = interpNodes.head.x; val xMax = interpNodes.last.x
    val xc = least(greatest(col("value"), lit(xMin)), lit(xMax))
    val segs = segmentsDF(s, interpNodes)
    ev.join(broadcast(segs),
        xc >= col("x0") && (xc < col("x1") || col("x1") === lit(xMax) && xc === lit(xMax)),
        "inner")
      .select(col("event_id"), interp(xc).cast("float").as("nnlops_wgt"))
      .orderBy(col("event_id"))
  }
  private val l03Sql = {
    val xMax = interpNodes.last.x
    val xc = s"LEAST(GREATEST(value, ${interpNodes.head.x}), $xMax)"
    s"""SELECT event_id,
       | CAST(seg.y0 + ($xc - seg.x0) * (seg.y1 - seg.y0) / (seg.x1 - seg.x0) AS REAL) AS nnlops_wgt
       |FROM events JOIN ${segmentsSql(interpNodes)}
       |  ON $xc >= seg.x0 AND ($xc < seg.x1 OR (seg.x1 = $xMax AND $xc = $xMax))
       |ORDER BY event_id""".stripMargin
  }

  // ---- l04: multi-level JEC chain with uncertainty variants (L4) ---------
  // reference: stage1/corrections/jec.py:6-181 — cascaded multiplicative
  // corrections keyed by (pt, eta); uncertainty sources emit _up/_down
  // columns of the same collection, NOT copies of the table.
  private val jecL1: Seq[Bin1D] = (0 until 10).map { i =>
    Bin1D(i * 11.0, (i + 1) * 11.0, 1.0 + (9 - i) / 50.0)
  }
  private val jecL2: Seq[Bin1D] = Seq(
    Bin1D(0.0, 1.3, 1.01), Bin1D(1.3, 2.5, 1.03), Bin1D(2.5, 5.0, 1.08))
  private val jecUnc: Seq[Bin1D] = Seq(
    Bin1D(0.0, 30.0, 0.05), Bin1D(30.0, 60.0, 0.02), Bin1D(60.0, 110.0, 0.01))
  private def l04(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val base = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      (col("l_extendedprice") / lit(1000.0)).as("pt_raw"),
      abs(col("l_discount") * 94.0 - 4.7).as("abseta"))
    val j1 = base.join(broadcast(bins1DF(s, jecL1).withColumnRenamed("sf", "sf1")),
      col("pt_raw") >= col("lo") && col("pt_raw") < col("hi"), "left")
      .drop("lo", "hi")
    val j2 = j1.join(broadcast(bins1DF(s, jecL2).withColumnRenamed("sf", "sf2")),
      col("abseta") >= col("lo") && col("abseta") < col("hi"), "left")
      .drop("lo", "hi")
    val ptJec = col("pt_raw") * coalesce(col("sf1"), lit(1.0)) * coalesce(col("sf2"), lit(1.0))
    val j3 = j2.withColumn("pt_jec", ptJec)
      .join(broadcast(bins1DF(s, jecUnc).withColumnRenamed("sf", "unc")),
        col("pt_jec") >= col("lo") && col("pt_jec") < col("hi"), "left")
    j3.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("pt_jec").cast("float").as("pt_jec"),
        (col("pt_jec") * (lit(1.0) + coalesce(col("unc"), lit(0.0)))).cast("float").as("pt_jec_up"),
        (col("pt_jec") * (lit(1.0) - coalesce(col("unc"), lit(0.0)))).cast("float").as("pt_jec_down"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val l04Sql =
    s"""WITH base AS (
       | SELECT l_orderkey, l_linenumber, l_extendedprice,
       |   l_extendedprice / 1000.0 AS pt_raw,
       |   ABS(l_discount * 94.0 - 4.7) AS abseta
       | FROM lineitem),
       |j AS (
       | SELECT b.*,
       |   b.pt_raw * COALESCE(s1.sf, 1.0) * COALESCE(s2.sf, 1.0) AS pt_jec
       | FROM base b
       | LEFT JOIN ${bins1Sql(jecL1).replace("sfb", "s1")}
       |   ON b.pt_raw >= s1.lo AND b.pt_raw < s1.hi
       | LEFT JOIN ${bins1Sql(jecL2).replace("sfb", "s2")}
       |   ON b.abseta >= s2.lo AND b.abseta < s2.hi)
       |SELECT l_orderkey, l_linenumber, l_extendedprice,
       | CAST(pt_jec AS REAL) AS pt_jec,
       | CAST(pt_jec * (1.0 + COALESCE(u.sf, 0.0)) AS REAL) AS pt_jec_up,
       | CAST(pt_jec * (1.0 - COALESCE(u.sf, 0.0)) AS REAL) AS pt_jec_down
       |FROM j LEFT JOIN ${bins1Sql(jecUnc).replace("sfb", "u")}
       |  ON pt_jec >= u.lo AND pt_jec < u.hi
       |ORDER BY 1, 2, 3""".stripMargin

  // ---- l10/l12 shared: the scanned JEC correction tables -----------------
  // reference: stage1/corrections/jec.py:6-181 — every correction level,
  // uncertainty bin and per-source magnitude is DATA (txt tables fed to
  // extractor factories), never code. The engine mirrors that: one tiny
  // CSV fixture (kind, source, lo, hi, val) scanned once per query and
  // broadcast; the DuckDB oracle reads the SAME file, so the magnitudes
  // cross the engine boundary as data, not as duplicated literals.
  private[queries] val jecCsvPath: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR",
      "/root/repo/src/main/resources/fixtures") + "/jec_tables.csv"
  private def jecTables(s: SparkSession): DataFrame =
    s.read.schema("kind STRING, source STRING, lo DOUBLE, hi DOUBLE, val DOUBLE")
      .option("header", "true").csv(jecCsvPath)
  private val jecCsvSql =
    s"""(SELECT * FROM read_csv('$jecCsvPath', header=true,
       |  columns={'kind':'VARCHAR','source':'VARCHAR','lo':'DOUBLE','hi':'DOUBLE','val':'DOUBLE'}))""".stripMargin
  private val jesNames: Seq[String] = (1 to 11).map(i => s"jes$i")
  private val jerNames: Seq[String] = (1 to 6).map(i => s"jer$i")

  // ---- l10: JEC chain at reference variant breadth (L4, wide form) -------
  // reference: stage1/processor.py:447-463 + config/jec_parameters.py —
  // every jet carries 22 JES + 12 JER variant COLUMNS of the corrected
  // pt, not 34 copies of the table. The chain (two binned corrections +
  // one binned uncertainty) runs ONCE; each source then scales the
  // shared binned uncertainty by its own magnitude from the scanned
  // kind∈{jes,jer} rows of the fixture, pivoted in-plan to ONE map row
  // and broadcast — so the plan stays three broadcast range-joins plus
  // one single-row broadcast regardless of source count, and adding a
  // source is a data change, not a code change.
  private def l10(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val base = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      (col("l_extendedprice") / lit(1000.0)).as("pt_raw"),
      abs(col("l_discount") * 94.0 - 4.7).as("abseta"))
    val j1 = base.join(broadcast(bins1DF(s, jecL1).withColumnRenamed("sf", "sf1")),
      col("pt_raw") >= col("lo") && col("pt_raw") < col("hi"), "left")
      .drop("lo", "hi")
    val j2 = j1.join(broadcast(bins1DF(s, jecL2).withColumnRenamed("sf", "sf2")),
      col("abseta") >= col("lo") && col("abseta") < col("hi"), "left")
      .drop("lo", "hi")
    val ptJec = col("pt_raw") * coalesce(col("sf1"), lit(1.0)) * coalesce(col("sf2"), lit(1.0))
    val j3 = j2.withColumn("pt_jec", ptJec)
      .join(broadcast(bins1DF(s, jecUnc).withColumnRenamed("sf", "unc")),
        col("pt_jec") >= col("lo") && col("pt_jec") < col("hi"), "left")
    // source → magnitude as a 1-row broadcast map (the whitelisted
    // broadcast-1-row-aggregate shape): stays in-plan, no driver collect
    val mags = jecTables(s).filter(col("kind").isin("jes", "jer"))
      .agg(map_from_entries(collect_list(struct(col("source"), col("val"))))
        .as("jmag"))
    val j4 = j3.crossJoin(broadcast(mags))
    val unc = coalesce(col("unc"), lit(0.0))
    val variantCols = (jesNames ++ jerNames).flatMap { n =>
      val delta = unc * element_at(col("jmag"), lit(n))
      Seq(
        (col("pt_jec") * (lit(1.0) + delta)).cast("float").as(s"pt_${n}_up"),
        (col("pt_jec") * (lit(1.0) - delta)).cast("float").as(s"pt_${n}_down"))
    }
    j4.select(Seq(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("pt_jec").cast("float").as("pt_jec")) ++ variantCols: _*)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val l10Sql = {
    val variantCols = (jesNames ++ jerNames).flatMap { n =>
      val mag = s"(SELECT val FROM jec WHERE source = '$n')"
      Seq(
        s"CAST(pt_jec * (1.0 + COALESCE(u.sf, 0.0) * $mag) AS REAL) AS pt_${n}_up",
        s"CAST(pt_jec * (1.0 - COALESCE(u.sf, 0.0) * $mag) AS REAL) AS pt_${n}_down")
    }.mkString(",\n ")
    s"""WITH jec AS (SELECT * FROM $jecCsvSql WHERE kind IN ('jes', 'jer')),
       |base AS (
       | SELECT l_orderkey, l_linenumber, l_extendedprice,
       |   l_extendedprice / 1000.0 AS pt_raw,
       |   ABS(l_discount * 94.0 - 4.7) AS abseta
       | FROM lineitem),
       |j AS (
       | SELECT b.*,
       |   b.pt_raw * COALESCE(s1.sf, 1.0) * COALESCE(s2.sf, 1.0) AS pt_jec
       | FROM base b
       | LEFT JOIN ${bins1Sql(jecL1).replace("sfb", "s1")}
       |   ON b.pt_raw >= s1.lo AND b.pt_raw < s1.hi
       | LEFT JOIN ${bins1Sql(jecL2).replace("sfb", "s2")}
       |   ON b.abseta >= s2.lo AND b.abseta < s2.hi)
       |SELECT l_orderkey, l_linenumber, l_extendedprice,
       | CAST(pt_jec AS REAL) AS pt_jec,
       | $variantCols
       |FROM j LEFT JOIN ${bins1Sql(jecUnc).replace("sfb", "u")}
       |  ON pt_jec >= u.lo AND pt_jec < u.hi
       |ORDER BY 1, 2, 3""".stripMargin
  }

  // ---- l12: fully table-driven JEC, per-source |eta|-binned (L4) ---------
  // reference: stage1/corrections/jec.py:6-181 — the UncertaintySources
  // txt table gives each JES source its own |eta|-binned magnitude; the
  // factory builds one lookup per source from the same file. Here the
  // WHOLE chain is data: L1/L2 corrections, the shared uncertainty and
  // the per-source kind='jes_eta' magnitudes all come from one scanned
  // CSV, each level a broadcast range join. Long form (one row per
  // jet × source) — the wide variant-column shape is l10's subject; what
  // l12 adds is that a new source or re-binned table changes NO code.
  // The jet side is thinned with a deterministic key filter (pushed to
  // the scan) to keep the oracle compare light.
  private def l12(s: SparkSession, dir: String): DataFrame = {
    val tabs = jecTables(s)
    def kindTab(k: String, valName: String): DataFrame =
      tabs.filter(col("kind") === k)
        .select(col("lo"), col("hi"), col("val").as(valName))
    val li = rd(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
    val base = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      (col("l_extendedprice") / lit(1000.0)).as("pt_raw"),
      abs(col("l_discount") * 94.0 - 4.7).as("abseta"))
    val j1 = base.join(broadcast(kindTab("l1", "sf1")),
      col("pt_raw") >= col("lo") && col("pt_raw") < col("hi"), "left")
      .drop("lo", "hi")
    val j2 = j1.join(broadcast(kindTab("l2", "sf2")),
      col("abseta") >= col("lo") && col("abseta") < col("hi"), "left")
      .drop("lo", "hi")
    val ptJec = col("pt_raw") * coalesce(col("sf1"), lit(1.0)) * coalesce(col("sf2"), lit(1.0))
    val j3 = j2.withColumn("pt_jec", ptJec)
      .join(broadcast(kindTab("unc", "unc")),
        col("pt_jec") >= col("lo") && col("pt_jec") < col("hi"), "left")
      .drop("lo", "hi")
    val srcTab = tabs.filter(col("kind") === "jes_eta")
      .select(col("source"), col("lo"), col("hi"), col("val").as("mag"))
    val unc = coalesce(col("unc"), lit(0.0))
    j3.join(broadcast(srcTab),
        col("abseta") >= col("lo") && col("abseta") < col("hi"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("source"),
        col("pt_jec").cast("float").as("pt_jec"),
        (col("pt_jec") * (lit(1.0) + unc * col("mag"))).cast("float").as("pt_up"),
        (col("pt_jec") * (lit(1.0) - unc * col("mag"))).cast("float").as("pt_down"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("source"))
  }
  private val l12Sql =
    s"""WITH jec AS (SELECT * FROM $jecCsvSql),
       |base AS (
       | SELECT l_orderkey, l_linenumber, l_extendedprice,
       |   l_extendedprice / 1000.0 AS pt_raw,
       |   ABS(l_discount * 94.0 - 4.7) AS abseta
       | FROM lineitem WHERE l_orderkey % 7 = 0),
       |j AS (
       | SELECT b.*,
       |   b.pt_raw * COALESCE(s1.val, 1.0) * COALESCE(s2.val, 1.0) AS pt_jec
       | FROM base b
       | LEFT JOIN (SELECT * FROM jec WHERE kind = 'l1') s1
       |   ON b.pt_raw >= s1.lo AND b.pt_raw < s1.hi
       | LEFT JOIN (SELECT * FROM jec WHERE kind = 'l2') s2
       |   ON b.abseta >= s2.lo AND b.abseta < s2.hi)
       |SELECT j.l_orderkey, j.l_linenumber, j.l_extendedprice, e.source,
       | CAST(pt_jec AS REAL) AS pt_jec,
       | CAST(pt_jec * (1.0 + COALESCE(u.val, 0.0) * e.val) AS REAL) AS pt_up,
       | CAST(pt_jec * (1.0 - COALESCE(u.val, 0.0) * e.val) AS REAL) AS pt_down
       |FROM j
       |LEFT JOIN (SELECT * FROM jec WHERE kind = 'unc') u
       |  ON pt_jec >= u.lo AND pt_jec < u.hi
       |JOIN (SELECT * FROM jec WHERE kind = 'jes_eta') e
       |  ON j.abseta >= e.lo AND j.abseta < e.hi
       |ORDER BY 1, 2, 3, 4""".stripMargin

  // ---- l05: per-flavor piecewise polynomial SF (L5, btag-style) ----------
  // reference: stage1/corrections/btag_weights.py:4-61 — SF = poly(x)
  // selected by flavor class; Horner form, no lookup join needed.
  private def l05(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val x = col("l_discount") * 10.0
    val flavor = col("l_linenumber") % 3
    val sf = when(flavor === 0, lit(0.98) + x * (lit(0.01) + x * lit(-0.005)))
      .when(flavor === 1, lit(0.95) + x * (lit(0.03) + x * lit(-0.01)))
      .otherwise(lit(0.90) + x * (lit(0.08) + x * (lit(-0.02) + x * lit(0.001))))
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        sf.cast("float").as("btag_sf"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val l05Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      | CAST(CASE
      |  WHEN l_linenumber % 3 = 0 THEN 0.98 + (l_discount * 10.0) * (0.01 + (l_discount * 10.0) * -0.005)
      |  WHEN l_linenumber % 3 = 1 THEN 0.95 + (l_discount * 10.0) * (0.03 + (l_discount * 10.0) * -0.01)
      |  ELSE 0.90 + (l_discount * 10.0) * (0.08 + (l_discount * 10.0) * (-0.02 + (l_discount * 10.0) * 0.001))
      | END AS REAL) AS btag_sf
      |FROM lineitem ORDER BY 1, 2, 3""".stripMargin

  // ---- l06: mean-normalized per-flavor polynomial (L6, qgl-style) --------
  // reference: stage1/corrections/qgl_weights.py:21-64 + :11-13 — deg-3
  // Horner polynomial by parton flavor, then divide by the selected mean.
  private def l06(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val qgl = col("l_tax") * 12.5 // in [0, 1]
    val isGluon = col("l_partkey") % 2 === 0
    val wgt = when(isGluon,
        lit(1.16636) + qgl * (lit(-0.84802) + qgl * (lit(1.49409) + qgl * lit(-0.50628))))
      .otherwise(
        lit(-0.666978) + qgl * (lit(3.42169) + qgl * (lit(-2.06826) + qgl * lit(0.42211))))
    val base = li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), wgt.as("qgl_wgt"))
    val mean = base.agg(avg(col("qgl_wgt")).as("mean_wgt"))
    base.crossJoin(broadcast(mean))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        (col("qgl_wgt") / col("mean_wgt")).cast("float").as("qgl_wgt_norm"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val l06Sql =
    """WITH base AS (
      | SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  CASE WHEN l_partkey % 2 = 0
      |   THEN 1.16636 + (l_tax * 12.5) * (-0.84802 + (l_tax * 12.5) * (1.49409 + (l_tax * 12.5) * -0.50628))
      |   ELSE -0.666978 + (l_tax * 12.5) * (3.42169 + (l_tax * 12.5) * (-2.06826 + (l_tax * 12.5) * 0.42211))
      |  END AS qgl_wgt
      | FROM lineitem)
      |SELECT l_orderkey, l_linenumber, l_extendedprice,
      | CAST(qgl_wgt / (SELECT AVG(qgl_wgt) FROM base) AS REAL) AS qgl_wgt_norm
      |FROM base ORDER BY 1, 2, 3""".stripMargin

  // ---- l07: Rochester-style branched correction (L3) ---------------------
  // reference: stage1/corrections/rochester.py:5-64 — data rows get a
  // binned kScale; gen-matched MC rows get kSpread(pt_gen/pt); the rest
  // get kSmear with a random draw. The reference's unseeded np.random is
  // a reproducibility hazard (SURVEY §7.4); here the draw is a
  // deterministic multiplicative hash of the row key so both engines —
  // and any two cluster runs — agree bit-for-bit.
  private val kScaleBins: Seq[Bin1D] = Seq(
    Bin1D(0.0, 0.9, 1.0002), Bin1D(0.9, 1.7, 0.9995), Bin1D(1.7, 2.4, 1.0008))
  // Error variants per rochester.py:29-64: each branch carries its own
  // uncertainty (binned scale error for data, spread error for
  // gen-matched MC, smear error scaled by the draw); _up/_down shift the
  // correction by ±err and feed the weight system via WeightBuilder —
  // the three variant columns a15-style variation folds consume.
  private def l07(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val base = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      (col("l_extendedprice") / lit(1000.0)).as("pt"),
      abs(col("l_discount") * 40.0 - 2.0).as("abseta"),
      (col("l_orderkey") % 5 === 0).as("is_data"),
      (col("l_linenumber") % 2 === 0).as("has_gen"),
      ((col("l_orderkey") * 2654435761L + col("l_linenumber") * 40503L) % 10000 / lit(10000.0)).as("u"))
    val joined = base.join(broadcast(bins1DF(s, kScaleBins)),
      col("abseta") >= col("lo") && col("abseta") < col("hi"), "left")
    val kScale = coalesce(col("sf"), lit(1.0))
    val kSpread = lit(1.0) + (col("pt") % 2.0 - 1.0) / 1000.0
    val kSmear = lit(1.0) + (col("u") - 0.5) / 500.0
    val roccor = when(col("is_data"), kScale)
      .when(col("has_gen"), kSpread)
      .otherwise(kSmear)
    val err = when(col("is_data"), abs(kScale - 1.0) / 2.0 + 0.0001)
      .when(col("has_gen"), abs(kSpread - 1.0) / 2.0)
      .otherwise(abs(kSmear - 1.0))
    val wb = graft.weights.WeightBuilder()
      .add("lumi", lit(1.0) + col("l_extendedprice") / 1.0e6)
      .add("roccor", roccor, roccor + err, roccor - err)
    val wgts = wb.named.toMap
    joined.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        roccor.cast("float").as("roccor"),
        (roccor + err).cast("float").as("roccor_up"),
        (roccor - err).cast("float").as("roccor_down"),
        wgts("wgt_nominal").cast("float").as("wgt_nominal"),
        wgts("wgt_roccor_up").cast("float").as("wgt_roccor_up"),
        wgts("wgt_roccor_down").cast("float").as("wgt_roccor_down"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }
  private val l07Sql = {
    val kScale = "COALESCE(sfb.sf, 1.0)"
    val kSpread = "(1.0 + ((l_extendedprice / 1000.0) % 2.0 - 1.0) / 1000.0)"
    val kSmear = "(1.0 + (((l_orderkey * 2654435761 + l_linenumber * 40503) % 10000) / 10000.0 - 0.5) / 500.0)"
    val roccor = s"""CASE
       |  WHEN l_orderkey % 5 = 0 THEN $kScale
       |  WHEN l_linenumber % 2 = 0 THEN $kSpread
       |  ELSE $kSmear END""".stripMargin
    val err = s"""CASE
       |  WHEN l_orderkey % 5 = 0 THEN ABS($kScale - 1.0) / 2.0 + 0.0001
       |  WHEN l_linenumber % 2 = 0 THEN ABS($kSpread - 1.0) / 2.0
       |  ELSE ABS($kSmear - 1.0) END""".stripMargin
    val lumi = "(1.0 + l_extendedprice / 1.0e6)"
    s"""SELECT l_orderkey, l_linenumber, l_extendedprice,
       | CAST(($roccor) AS REAL) AS roccor,
       | CAST(($roccor) + ($err) AS REAL) AS roccor_up,
       | CAST(($roccor) - ($err) AS REAL) AS roccor_down,
       | CAST($lumi * ($roccor) AS REAL) AS wgt_nominal,
       | CAST($lumi * (($roccor) + ($err)) AS REAL) AS wgt_roccor_up,
       | CAST($lumi * (($roccor) - ($err)) AS REAL) AS wgt_roccor_down
       |FROM lineitem LEFT JOIN ${bins1Sql(kScaleBins)}
       |  ON ABS(l_discount * 40.0 - 2.0) >= sfb.lo AND ABS(l_discount * 40.0 - 2.0) < sfb.hi
       |ORDER BY 1, 2, 3""".stripMargin
  }

  // ---- l08 / P15: 3-D binned resolution calibration ----------------------
  // reference: stage1/muons.py:74-89 — ebe mass resolution =
  // sqrt(dpt1^2 + dpt2^2) * calib(pt1, |eta1|, |eta2|) with a 3-D
  // histogram lookup. Same broadcast pattern, three range predicates.
  private val calib3d: Seq[(Double, Double, Double, Double, Double, Double, Double)] =
    for {
      (p, i) <- Seq((0.0, 150.0), (150.0, 300.0), (300.0, 500.0)).zipWithIndex
      (a, j) <- Seq((0.0, 0.9), (0.9, 1.7), (1.7, 2.4)).zipWithIndex
      (b, k) <- Seq((0.0, 0.9), (0.9, 1.7), (1.7, 2.4)).zipWithIndex
    } yield (p._1, p._2, a._1, a._2, b._1, b._2, 1.0 + (i * 9 + j * 3 + k) / 100.0)
  private def l08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = rd(s, dir, "events")
    val base = ev.select(col("event_id"),
      (col("value") + lit(1.0)).as("pt1"),
      abs((col("event_id") % 100) / lit(25.0) - lit(2.0)).as("abseta1"),
      abs((col("user_id") % 80) / lit(20.0) - lit(2.0)).as("abseta2"),
      ((col("event_id") % 7) / lit(10.0) + lit(0.5)).as("dpt1"),
      ((col("user_id") % 5) / lit(10.0) + lit(0.5)).as("dpt2"))
    val bins = broadcast(calib3d.toDF("plo", "phi_", "alo", "ahi", "blo", "bhi", "calib"))
    base.join(bins,
        col("pt1") >= col("plo") && col("pt1") < col("phi_") &&
        col("abseta1") >= col("alo") && col("abseta1") < col("ahi") &&
        col("abseta2") >= col("blo") && col("abseta2") < col("bhi"), "left")
      .select(col("event_id"),
        (sqrt(col("dpt1") * col("dpt1") + col("dpt2") * col("dpt2")) *
          coalesce(col("calib"), lit(1.0))).cast("float").as("ebe_mass_res"))
      .orderBy(col("event_id"))
  }
  private val l08Sql = {
    val values = calib3d.map { case (pl, ph, al, ah, bl, bh, c) =>
      s"($pl, $ph, $al, $ah, $bl, $bh, $c)"
    }.mkString(", ")
    s"""SELECT event_id,
       | CAST(SQRT(dpt1 * dpt1 + dpt2 * dpt2) * COALESCE(b.calib, 1.0) AS REAL) AS ebe_mass_res
       |FROM (SELECT event_id, value + 1.0 AS pt1,
       |        ABS((event_id % 100) / 25.0 - 2.0) AS abseta1,
       |        ABS((user_id % 80) / 20.0 - 2.0) AS abseta2,
       |        (event_id % 7) / 10.0 + 0.5 AS dpt1,
       |        (user_id % 5) / 10.0 + 0.5 AS dpt2
       |      FROM events) e
       |LEFT JOIN (VALUES $values) AS b(plo, phi_, alo, ahi, blo, bhi, calib)
       |  ON pt1 >= b.plo AND pt1 < b.phi_
       | AND abseta1 >= b.alo AND abseta1 < b.ahi
       | AND abseta2 >= b.blo AND abseta2 < b.bhi
       |ORDER BY event_id""".stripMargin
  }

  // ---- l09: width_bucket + EQUI-join lookup (L1, hash-join form) ---------
  // SURVEY §2.3: "width_bucket + equi-join on bucket id is the pure-SQL
  // form". Same bins/result as l01, but the join key is the computed
  // bucket INDEX, so Catalyst plans a broadcast HASH join — O(1) probe —
  // instead of the nested-loop range join; for lookup tables beyond a
  // few hundred rows this is the scale path.
  private def l09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = rd(s, dir, "events")
    val binsIdx = broadcast(puBins.zipWithIndex
      .map { case (b, i) => (i.toLong, b.value) }.toDF("bin_idx", "sf"))
    val idx = floor(col("value") / 25.0).cast("long")
    ev.withColumn("bin_idx", idx)
      .join(binsIdx, Seq("bin_idx"), "left")
      .select(col("event_id"),
        coalesce(col("sf"), lit(1.0)).cast("float").as("pu_wgt"))
      .orderBy(col("event_id"))
  }
  private val l09Sql = {
    val values = puBins.zipWithIndex
      .map { case (b, i) => s"($i, ${b.value})" }.mkString(", ")
    s"""SELECT event_id,
       | CAST(COALESCE(sfb.sf, 1.0) AS REAL) AS pu_wgt
       |FROM events LEFT JOIN (VALUES $values) AS sfb(bin_idx, sf)
       |  ON CAST(FLOOR(value / 25.0) AS BIGINT) = sfb.bin_idx
       |ORDER BY event_id""".stripMargin
  }

  // ---- l11: 2-D BILINEAR interpolation ------------------------------------
  // The smooth-surface companion to the binned 2-D lookup (l02): scale
  // factors defined on a coarse (x, y) grid, interpolated bilinearly —
  // the standard treatment for smooth correction maps (vs l02's
  // step-function bins). The 50-cell grid table broadcasts with its 4
  // corner values per cell; the join is the same clipped
  // point-in-rectangle equi-ish probe as l03, and the blend
  // (1−t)(1−u)z00 + t(1−u)z10 + (1−t)u·z01 + t·u·z11 is written with
  // identical parenthesization on both engines, float32 at the end.
  private val blxNodes = (0 to 10).map(_ * 50.0) // x: 0..500
  private val blyNodes = (0 to 5).map(_ * 2.0) // y: 0..10
  private def blz(i: Int, j: Int): Double =
    1.0 + math.sin(i * 0.9 + j * 1.7) / 20.0
  private def l11(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
      .select(col("event_id"), col("value").as("xr"),
        (col("event_id") % 97).cast("double").as("yr0"))
      .withColumn("yr", col("yr0") / 10.0)
    val cells = {
      import s.implicits._
      (for {
        i <- 0 until blxNodes.size - 1
        j <- 0 until blyNodes.size - 1
      } yield (blxNodes(i), blxNodes(i + 1), blyNodes(j), blyNodes(j + 1),
        blz(i, j), blz(i + 1, j), blz(i, j + 1), blz(i + 1, j + 1)))
        .toDF("x0", "x1", "y0", "y1", "z00", "z10", "z01", "z11")
    }
    val xMax = blxNodes.last; val yMax = blyNodes.last
    val xc = least(greatest(col("xr"), lit(0.0)), lit(xMax))
    val yc = least(greatest(col("yr"), lit(0.0)), lit(yMax))
    val t = (xc - col("x0")) / (col("x1") - col("x0"))
    val u = (yc - col("y0")) / (col("y1") - col("y0"))
    val z = (lit(1.0) - t) * (lit(1.0) - u) * col("z00") +
      t * (lit(1.0) - u) * col("z10") +
      (lit(1.0) - t) * u * col("z01") + t * u * col("z11")
    ev.join(broadcast(cells),
        xc >= col("x0") &&
          (xc < col("x1") || col("x1") === lit(xMax) && xc === lit(xMax)) &&
          yc >= col("y0") &&
          (yc < col("y1") || col("y1") === lit(yMax) && yc === lit(yMax)))
      .select(col("event_id"), z.cast("float").as("sf_bilinear"))
      .orderBy(col("event_id"))
  }
  private val l11Sql = {
    val cellRows = (for {
      i <- 0 until blxNodes.size - 1
      j <- 0 until blyNodes.size - 1
    } yield s"(${blxNodes(i)}, ${blxNodes(i + 1)}, ${blyNodes(j)}, " +
      s"${blyNodes(j + 1)}, ${blz(i, j)}, ${blz(i + 1, j)}, " +
      s"${blz(i, j + 1)}, ${blz(i + 1, j + 1)})").mkString(", ")
    val xMax = blxNodes.last; val yMax = blyNodes.last
    val xc = s"LEAST(GREATEST(xr, 0.0), $xMax)"
    val yc = s"LEAST(GREATEST(yr, 0.0), $yMax)"
    s"""WITH ev AS (
       | SELECT event_id, value AS xr,
       |  CAST(event_id % 97 AS DOUBLE) / 10.0 AS yr
       | FROM events),
       |cells(x0, x1, y0, y1, z00, z10, z01, z11) AS (VALUES $cellRows)
       |SELECT event_id,
       | CAST((1.0 - ($xc - x0) / (x1 - x0)) * (1.0 - ($yc - y0) / (y1 - y0)) * z00
       |  + (($xc - x0) / (x1 - x0)) * (1.0 - ($yc - y0) / (y1 - y0)) * z10
       |  + (1.0 - ($xc - x0) / (x1 - x0)) * (($yc - y0) / (y1 - y0)) * z01
       |  + (($xc - x0) / (x1 - x0)) * (($yc - y0) / (y1 - y0)) * z11 AS REAL)
       |  AS sf_bilinear
       |FROM ev JOIN cells
       |  ON $xc >= x0 AND ($xc < x1 OR (x1 = $xMax AND $xc = $xMax))
       | AND $yc >= y0 AND ($yc < y1 OR (y1 = $yMax AND $yc = $yMax))
       |ORDER BY event_id""".stripMargin
  }

  // ---- l13: natural cubic spline lookup, DATA-derived knots ---------------
  // l03 interpolates a literal node table linearly; the production form
  // of a correction curve is a SPLINE FIT TO DATA (the shape of the
  // reference's smoothed corrections): bin the corpus (10 knots), solve
  // the natural-spline tridiagonal system (Thomas algorithm) for the
  // knot second-derivatives M_i, evaluate the piecewise cubic on every
  // row. Scale split: the knot table is O(10) AT ANY CORPUS SIZE (one
  // map-side-combined aggregation), the solve is O(knots) driver work
  // (a14 convention), and the evaluation is one codegen'd CASE over
  // broadcast-literal coefficients — the corpus is touched exactly
  // twice (knot build + evaluate). Determinism chain: knot y are exact
  // integer-sum ratios; the driver's Thomas recurrence and the oracle's
  // lateral-alias CTE replay spell the IDENTICAL double ops in the
  // IDENTICAL order; literals round-trip via Double.toString (shortest
  // round-trip repr, parsed correctly-rounded by both engines); the
  // evaluation polynomial is one shared template; float32 output.
  private val splN = 10 // knots; x_i = 25 + 50 i on value in [0, 500)
  private def splX(i: Int): Double = 25.0 + 50.0 * i
  /** Piecewise cubic on [x_i, x_{i+1}] — ONE template for both engines
    * (m/y substituted with driver literals or CTE column refs). */
  private def splEval(xc: String, i: Int, m: Int => String, y: Int => String): String = {
    val x0 = splX(i); val x1 = splX(i + 1)
    s"((${m(i)} * ($x1 - $xc) * ($x1 - $xc) * ($x1 - $xc) + " +
      s"${m(i + 1)} * ($xc - $x0) * ($xc - $x0) * ($xc - $x0)) / 300.0 + " +
      s"(${y(i)} / 50.0 - ${m(i)} * 50.0 / 6.0) * ($x1 - $xc) + " +
      s"(${y(i + 1)} / 50.0 - ${m(i + 1)} * 50.0 / 6.0) * ($xc - $x0))"
  }
  private def splCase(xc: String, m: Int => String, y: Int => String): String = {
    val branches = (0 until splN - 2).map(i =>
      s"WHEN $xc < ${splX(i + 1)} THEN ${splEval(xc, i, m, y)}").mkString(" ")
    s"(CASE $branches ELSE ${splEval(xc, splN - 2, m, y)} END)"
  }
  private def l13(s: SparkSession, dir: String): DataFrame = {
    val ev = rd(s, dir, "events")
    val rows = ev.filter(col("value") >= 0.0 && col("value") < 500.0)
      .groupBy(floor(col("value") / 50.0).cast("long").as("bin"))
      .agg(sum(col("user_id")).as("sy"), count(lit(1)).as("cnt"))
      .collect()
    val ys = Array.fill(splN)(0.0)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      if (b >= 0 && b < splN) ys(b) = r.getLong(1).toDouble / r.getLong(2)
    }
    // Thomas solve for natural-spline M (mirrored op-for-op in l13Sql):
    // h = 50 everywhere, diagonal 2(h+h) = 200, off-diagonals 50
    val d = Array.fill(splN)(0.0)
    for (i <- 1 to splN - 2)
      d(i) = 6.0 * ((ys(i + 1) - ys(i)) / 50.0 - (ys(i) - ys(i - 1)) / 50.0)
    val cp = Array.fill(splN)(0.0); val dp = Array.fill(splN)(0.0)
    cp(1) = 50.0 / 200.0; dp(1) = d(1) / 200.0
    for (i <- 2 to splN - 2) {
      val den = 200.0 - 50.0 * cp(i - 1)
      cp(i) = 50.0 / den
      dp(i) = (d(i) - 50.0 * dp(i - 1)) / den
    }
    val ms = Array.fill(splN)(0.0)
    ms(splN - 2) = dp(splN - 2)
    for (i <- splN - 3 to 1 by -1) ms(i) = dp(i) - cp(i) * ms(i + 1)
    val xc = s"LEAST(GREATEST(value, ${splX(0)}), ${splX(splN - 1)})"
    ev.select(col("event_id"),
        expr(s"CAST(${splCase(xc, i => ms(i).toString, i => ys(i).toString)} AS FLOAT)")
          .as("spline_corr"))
      .orderBy(col("event_id"))
  }
  private val l13Sql = {
    val interior = 1 to splN - 2
    // forward sweep + back substitution as LATERAL column aliases (one
    // 1-row CTE), each term spelled exactly as the driver loop
    val dCols = interior.map(i =>
      s"6.0 * ((y${i + 1} - y$i) / 50.0 - (y$i - y${i - 1}) / 50.0) AS d$i").mkString(",\n |  ")
    val fwd = (s"50.0 / 200.0 AS cp1, d1 / 200.0 AS dp1" +:
      (2 to splN - 2).map(i =>
        s"50.0 / (200.0 - 50.0 * cp${i - 1}) AS cp$i, " +
          s"(d$i - 50.0 * dp${i - 1}) / (200.0 - 50.0 * cp${i - 1}) AS dp$i")).mkString(",\n |  ")
    val back = (s"dp${splN - 2} AS m${splN - 2}" +:
      (splN - 3 to 1 by -1).map(i => s"dp$i - cp$i * m${i + 1} AS m$i"))
      .mkString(",\n |  ")
    val yCols = (0 until splN).map(i =>
      s"COALESCE(MAX(CASE WHEN bin = $i THEN sy / cnt END), 0.0) AS y$i").mkString(",\n |  ")
    val xc = s"LEAST(GREATEST(value, ${splX(0)}), ${splX(splN - 1)})"
    val mRef = (i: Int) => if (i == 0 || i == splN - 1) "0.0" else s"m$i"
    s"""WITH knots AS (
       | SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bin,
       |  CAST(SUM(user_id) AS DOUBLE) AS sy, COUNT(*) AS cnt
       | FROM events WHERE value >= 0.0 AND value < 500.0 GROUP BY 1),
       |ky AS (
       | SELECT
       |  $yCols
       | FROM knots),
       |ms AS (
       | SELECT *,
       |  $dCols,
       |  $fwd,
       |  $back
       | FROM ky)
       |SELECT event_id,
       | CAST(${splCase(xc, mRef, i => s"y$i")} AS REAL) AS spline_corr
       |FROM events CROSS JOIN ms
       |ORDER BY event_id""".stripMargin
  }

  // ---- l14: 2-D scale-factor lookup fed DIRECTLY from a ROOT file ----------
  // The reference's muon-ID efficiency correction end-to-end
  // (reference: the stage1 correction loaders consume exactly
  // data/muon_sf/year2018/RunABCD_SF_ID.root): the TH2D SF map is read
  // through the native ROOT DataSource V2 connector (sources/
  // RootHistSource.scala), its 24 interior (pt × |eta|) cells broadcast,
  // and each pseudo-muon picks its cell by range predicates — the L1
  // binned-lookup shape with a 24-row broadcast build side, so the probe
  // is a map-side nested-loop over a tiny table at any corpus size. The
  // DuckDB oracle replays the map as a LITERAL VALUES table produced by
  // an independent from-scratch parser of the same binary file, so a
  // green hash validates reader + join semantics together. Per-cell
  // yield is n · sf (sf constant within a cell — no order-dependent
  // float summation anywhere).
  private def l14(s: SparkSession, dir: String): DataFrame = {
    val sfMap = s.read.format("graft.sources.RootHistSource")
      .option("path",
        refData("muon_sf/year2018/RunABCD_SF_ID.root")).load()
      .filter(col("hist") === "NUM_TightID_DEN_genTracks_pt_abseta" &&
        col("binx").between(1, 6) && col("biny").between(1, 4))
      .select(col("x_low"), col("x_high"), col("y_low"), col("y_high"),
        col("content").as("sf"))
    val mu = rd(s, dir, "lineitem")
      .select((col("l_extendedprice") / 1000.0).as("pt"),
        (col("l_discount") * 24.0).as("abseta"))
      .filter(col("pt") >= 20.0 && col("pt") < 120.0 && col("abseta") < 2.4)
    mu.join(broadcast(sfMap),
        col("pt") >= col("x_low") && col("pt") < col("x_high") &&
          col("abseta") >= col("y_low") && col("abseta") < col("y_high"))
      .groupBy(col("x_low"), col("y_low"))
      .agg(count(lit(1)).as("n_mu"), max(col("sf")).as("sf_d"))
      .select(col("x_low"), col("y_low"), col("n_mu"),
        col("sf_d").cast("float").as("sf"),
        (col("n_mu").cast("double") * col("sf_d")).cast("float")
          .as("expected_yield"))
      .orderBy(col("x_low"), col("y_low"))
  }
  private val l14Sql =
    """WITH sfmap(x_low, x_high, y_low, y_high, sf) AS (VALUES
      |(20.0, 25.0, 0.0, 0.9, 0.9809958066072726), (25.0, 30.0, 0.0, 0.9, 0.9907079683443358),
      |(30.0, 40.0, 0.0, 0.9, 0.9940930519333433), (40.0, 50.0, 0.0, 0.9, 0.9924862189236762),
      |(50.0, 60.0, 0.0, 0.9, 0.9911617044225287), (60.0, 120.0, 0.0, 0.9, 0.9940931417433392),
      |(20.0, 25.0, 0.9, 1.2, 0.9927448660377257), (25.0, 30.0, 0.9, 1.2, 0.9817290215523836),
      |(30.0, 40.0, 0.9, 1.2, 0.98761982168), (40.0, 50.0, 0.9, 1.2, 0.9852413448471883),
      |(50.0, 60.0, 0.9, 1.2, 0.9814141639875774), (60.0, 120.0, 0.9, 1.2, 0.9845977669390539),
      |(20.0, 25.0, 1.2, 2.1, 1.0001274426420794), (25.0, 30.0, 1.2, 2.1, 0.9904054835527193),
      |(30.0, 40.0, 1.2, 2.1, 0.9907256636939671), (40.0, 50.0, 1.2, 2.1, 0.991264560433235),
      |(50.0, 60.0, 1.2, 2.1, 0.9894760750958966), (60.0, 120.0, 1.2, 2.1, 0.9891039904226423),
      |(20.0, 25.0, 2.1, 2.4, 0.9905134702464216), (25.0, 30.0, 2.1, 2.4, 0.9730892211605638),
      |(30.0, 40.0, 2.1, 2.4, 0.9769037952277815), (40.0, 50.0, 2.1, 2.4, 0.9759341667700446),
      |(50.0, 60.0, 2.1, 2.4, 0.9703150553676495), (60.0, 120.0, 2.1, 2.4, 0.9741669907616599)),
      |mu AS (
      | SELECT l_extendedprice / 1000.0 AS pt, l_discount * 24.0 AS abseta
      | FROM lineitem
      | WHERE l_extendedprice / 1000.0 >= 20.0 AND l_extendedprice / 1000.0 < 120.0
      |   AND l_discount * 24.0 < 2.4)
      |SELECT CAST(x_low AS DOUBLE) AS x_low, CAST(y_low AS DOUBLE) AS y_low,
      | COUNT(*) AS n_mu,
      | CAST(CAST(MAX(sf) AS DOUBLE) AS REAL) AS sf,
      | CAST(CAST(COUNT(*) AS DOUBLE) * CAST(MAX(sf) AS DOUBLE) AS REAL) AS expected_yield
      |FROM mu JOIN sfmap
      | ON pt >= x_low AND pt < x_high AND abseta >= y_low AND abseta < y_high
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- l15: TGraph linear interpolation lookup from a ROOT file ------------
  // The reference's NNLOPS reweighting (reference: the stage1 NNLOPS
  // corrector interpolates data/NNLOPS_reweight.root's ratio-vs-pt
  // TGraphErrors with np.interp semantics: linear between points,
  // clamped to the endpoint values outside the domain). Engine side:
  // the 17-point curve arrives through the TGraph DataSource V2
  // connector, points become SEGMENTS via an i→i+1 self-join (17×17
  // equi-join — no global-order window, keeping the suite's
  // no-SinglePartition invariant), two clamp segments extend the ends
  // (y1 = y0, so the slope term is exactly 0 — no divide hazard), and
  // each event picks its segment from the broadcast 18-row table. The
  // DuckDB oracle rebuilds the identical segments from a literal copy
  // of the points produced by the independent parser. Per-row weights
  // are micro-quantized before summing (order-free integer sums).
  private val l15W =
    "(y0 + (y1 - y0) * (pt - x0) / (x1 - x0))"
  private def l15(s: SparkSession, dir: String): DataFrame = {
    val pts = s.read.format("graft.sources.RootGraphSource")
      .option("path", refData("NNLOPS_reweight.root")).load()
      .filter(col("graph") === "gr_NNLOPSratio_pt_powheg_0jet")
      .select(col("i"), col("x"), col("y"))
      .localCheckpoint() // 17 rows; feeds segments + both clamps
    val interior = pts.as("a").join(pts.as("b"),
        col("a.i") + 1 === col("b.i"))
      .select(col("a.x").as("x0"), col("b.x").as("x1"),
        col("a.y").as("y0"), col("b.y").as("y1"))
    val maxI = pts.agg(max(col("i")).as("mi"))
    val lo = pts.filter(col("i") === 0)
      .select(lit(-1e18).as("x0"), col("x").as("x1"),
        col("y").as("y0"), col("y").as("y1"))
    val hi = pts.crossJoin(broadcast(maxI)).filter(col("i") === col("mi"))
      .select(col("x").as("x0"), lit(1e18).as("x1"),
        col("y").as("y0"), col("y").as("y1"))
    val segs = interior.unionByName(lo).unionByName(hi)
    val mu = rd(s, dir, "lineitem")
      .select((col("l_extendedprice") / 1000.0).as("pt"))
    mu.join(broadcast(segs),
        col("pt") >= col("x0") && col("pt") < col("x1"))
      .select(col("x0"),
        expr(s"CAST(FLOOR($l15W * 1000000.0 + 0.5) AS BIGINT)").as("wq"))
      .groupBy(col("x0"))
      .agg(count(lit(1)).as("n_ev"), sum(col("wq")).as("w_micro_sum"))
      .select(col("x0"), col("n_ev"), col("w_micro_sum"),
        (col("w_micro_sum").cast("double") / col("n_ev") / 1000000.0)
          .cast("float").as("avg_weight"))
      .orderBy(col("x0"))
  }
  private val l15Sql =
    s"""WITH pts(i, x, y) AS (VALUES
       |(0, 2.5, 1.1658884286880493), (1, 7.5, 1.006809949874878),
       |(2, 12.5, 0.9281306862831116), (3, 17.5, 0.9306548237800598),
       |(4, 22.5, 0.8971056342124939), (5, 27.5, 0.9189392924308777),
       |(6, 32.5, 0.9419706463813782), (7, 37.5, 0.9572471976280212),
       |(8, 42.5, 0.9615933895111084), (9, 47.5, 1.0141770839691162),
       |(10, 55.0, 0.9375), (11, 65.0, 1.047379732131958),
       |(12, 75.0, 1.1114500761032104), (13, 85.0, 1.1284558773040771),
       |(14, 95.0, 0.6185693144798279), (15, 110.0, 1.2326494455337524),
       |(16, 125.0, 4.512904167175293)),
       |ptsd AS (SELECT i, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM pts),
       |segs AS (
       | SELECT a.x AS x0, b.x AS x1, a.y AS y0, b.y AS y1
       | FROM ptsd a JOIN ptsd b ON a.i + 1 = b.i
       | UNION ALL
       | SELECT CAST(-1e18 AS DOUBLE), x, y, y FROM ptsd WHERE i = 0
       | UNION ALL
       | SELECT x, CAST(1e18 AS DOUBLE), y, y FROM ptsd
       | WHERE i = (SELECT MAX(i) FROM ptsd)),
       |mu AS (SELECT l_extendedprice / 1000.0 AS pt FROM lineitem),
       |wq AS (
       | SELECT x0, CAST(FLOOR($l15W * 1000000.0 + 0.5) AS BIGINT) AS wq
       | FROM mu JOIN segs ON pt >= x0 AND pt < x1)
       |SELECT x0, COUNT(*) AS n_ev, CAST(SUM(wq) AS BIGINT) AS w_micro_sum,
       | CAST(CAST(SUM(wq) AS DOUBLE) / COUNT(*) / 1000000.0 AS REAL) AS avg_weight
       |FROM wq GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- l16: Z-pt reweighting from the reference's JSON calibration ----------
  // The reference's zpt reweight input is a JSON histogram
  // (data/zpt_weights.histo.json, applied in
  // stage1/corrections/zpt_weight.py): per-year pt-binned weights keyed
  // by "pt:[lo,hi]" labels. The file is a tiny driver-side config
  // (12 bins/year) — parsed once with Jackson (already on Spark's
  // classpath), entering the plan as a broadcast range table, the same
  // shape as every other l-family lookup: scan-side rows range-join a
  // broadcast bin map, weights milli-quantize, sums are order-free.
  // Oracle = the independently-read literal map + a full SQL replay of
  // the join/aggregation (the l14 discipline).
  private def zptBins(year: String): Seq[(Double, Double, Double)] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(refData("zpt_weights.histo.json")))
    val m = root.get("zpt_weights").get(year)
    require(m != null, s"zpt_weights has no year $year")
    val out = Seq.newBuilder[(Double, Double, Double)]
    m.fieldNames().forEachRemaining { k =>
      val Array(lo, hi) = k.stripPrefix("pt:[").stripSuffix("]").split(',')
      out += ((lo.toDouble, hi.toDouble, m.get(k).get("value").asDouble()))
    }
    out.result().sortBy(_._1)
  }
  private def l16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bins = zptBins("2017").toDF("pt_low", "pt_high", "zw")
    val mu = rd(s, dir, "lineitem")
      .select((col("l_extendedprice") / 100.0).as("pt"))
      .filter(col("pt") < 1000.0)
    mu.join(broadcast(bins),
        col("pt") >= col("pt_low") && col("pt") < col("pt_high"))
      .select(col("pt_low"), col("zw"),
        expr("CAST(FLOOR(zw * 1000000.0 + 0.5) AS BIGINT)").as("wq"))
      .groupBy(col("pt_low"))
      .agg(count(lit(1)).as("n_ev"),
        max(col("zw")).cast("float").as("zpt_weight"),
        sum(col("wq")).as("w_micro_sum"))
      .orderBy(col("pt_low"))
  }
  private val l16Sql =
    """WITH bins(pt_low, pt_high, zw) AS (VALUES
      |(0.0, 10.0, 0.910385), (10.0, 20.0, 1.13543),
      |(20.0, 30.0, 1.10441), (30.0, 40.0, 1.01315),
      |(40.0, 50.0, 0.982598), (50.0, 60.0, 0.980697),
      |(60.0, 70.0, 0.972673), (70.0, 80.0, 0.972325),
      |(80.0, 100.0, 0.966127), (100.0, 150.0, 0.953262),
      |(150.0, 200.0, 0.933403), (200.0, 1000.0, 0.904518)),
      |mu AS (
      | SELECT l_extendedprice / 100.0 AS pt FROM lineitem
      | WHERE l_extendedprice / 100.0 < 1000.0)
      |SELECT CAST(pt_low AS DOUBLE) AS pt_low, COUNT(*) AS n_ev,
      | CAST(MAX(zw) AS REAL) AS zpt_weight,
      | CAST(SUM(CAST(FLOOR(zw * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      |  AS w_micro_sum
      |FROM mu JOIN bins ON pt >= pt_low AND pt < pt_high
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l15_nnlops_interp" -> (l15 _),
    "l16_zpt_json_lookup" -> (l16 _),
    "l14_root_sf_join" -> (l14 _),
    "l13_spline_lookup" -> (l13 _),
    "l11_bilinear_2d" -> (l11 _),
    "l09_bucketed_equi_lookup" -> (l09 _),
    "l08_binned_3d_resolution" -> (l08 _),
    "l01_binned_1d" -> (l01 _),
    "l02_binned_2d" -> (l02 _),
    "l03_interp_linear" -> (l03 _),
    "l04_jec_chain" -> (l04 _),
    "l05_flavor_poly" -> (l05 _),
    "l06_qgl_norm_poly" -> (l06 _),
    "l07_rochester_branch" -> (l07 _),
    "l10_jec_variant_columns" -> (l10 _),
    "l12_jec_table_driven" -> (l12 _)
  )

  val oracle: Map[String, String] = Map(
    "l15_nnlops_interp" -> l15Sql,
    "l16_zpt_json_lookup" -> l16Sql,
    "l14_root_sf_join" -> l14Sql,
    "l13_spline_lookup" -> l13Sql,
    "l11_bilinear_2d" -> l11Sql,
    "l09_bucketed_equi_lookup" -> l09Sql,
    "l08_binned_3d_resolution" -> l08Sql,
    "l01_binned_1d" -> l01Sql,
    "l02_binned_2d" -> l02Sql,
    "l03_interp_linear" -> l03Sql,
    "l04_jec_chain" -> l04Sql,
    "l05_flavor_poly" -> l05Sql,
    "l06_qgl_norm_poly" -> l06Sql,
    "l07_rochester_branch" -> l07Sql,
    "l10_jec_variant_columns" -> l10Sql,
    "l12_jec_table_driven" -> l12Sql
  )
}
