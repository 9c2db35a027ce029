package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.physics.{Kinematics => K, Selections}
import graft.agg.Histogrammer

/** The reference's three entry-point lifecycles (SURVEY.md §3) composed
  * end-to-end over the test tables — scan → select → pair → kinematics →
  * weights → label → histogram → templates. Each stage is ONE declarative
  * plan: no per-chunk loop, no pandas pivot, no pickle merge; Catalyst
  * prunes columns into the scan and the only shuffles are the pair
  * window and the final low-cardinality groupBys.
  */
object StageQueries extends QueryFamily {

  // ---- s02: metadata pre-scan + broadcast normalization (S2) -------------
  // reference: stage1/preprocessor.py:200-229 — per-dataset sum of gen
  // weights -> lumi_weight = xsec * lumi / sumw, broadcast back onto rows.
  private val xsec = 0.5; private val lumi = 59970.0
  private def s02(s: SparkSession, dir: String): DataFrame = {
    val o = rd(s, dir, "orders")
    val sumw = o.groupBy(col("o_orderpriority").as("ds"))
      .agg(sum(col("o_totalprice")).as("sumw"))
    o.join(broadcast(sumw), col("o_orderpriority") === col("ds"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        (lit(xsec) * lit(lumi) / col("sumw")).cast("float").as("lumi_wgt"))
      .orderBy(col("o_orderkey"))
  }
  private val s02Sql =
    s"""SELECT o_orderkey, o_orderpriority,
       | CAST($xsec * $lumi / m.sumw AS REAL) AS lumi_wgt
       |FROM orders JOIN (
       | SELECT o_orderpriority AS ds, SUM(o_totalprice) AS sumw
       | FROM orders GROUP BY 1) m ON o_orderpriority = m.ds
       |ORDER BY o_orderkey""".stripMargin

  // ---- s01: stage-1 ETL pipeline (§3.1) ----------------------------------
  // scan -> object selection -> exactly-2 gate -> leading pair ->
  // composite kinematics -> region label -> region filter -> wide row.
  // The exactly-2 + opposite-sign gate is the reference's subtlest
  // semantic (SURVEY §7.4): the gate must SEE all selected objects
  // before pairing, so the count happens pre-extraction.
  private def s01(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val objs = li.filter(col("l_quantity") > 5.0 && col("l_extendedprice") > 2000.0)
      .select(col("l_orderkey").as("event"),
        col("l_linenumber").as("idx"),
        (col("l_extendedprice") / lit(500.0)).as("pt"),
        (col("l_discount") * 40.0 - 2.0).as("eta"),
        (col("l_tax") * 78.0 - 3.12).as("phi"),
        when(col("l_linenumber") % 2 === 0, 1.0).otherwise(-1.0).as("charge"),
        col("l_extendedprice"))
    val w = Window.partitionBy(col("event"))
      .orderBy(col("pt").desc, col("idx").asc, col("l_extendedprice").asc)
    val ranked = objs.withColumn("rank", row_number().over(w))
    val paired = ranked.groupBy(col("event")).agg(
      count(lit(1)).as("nmuons"),
      sum(col("charge")).as("sum_charge"),
      max(when(col("rank") === 1, col("pt"))).as("pt1"),
      max(when(col("rank") === 1, col("eta"))).as("eta1"),
      max(when(col("rank") === 1, col("phi"))).as("phi1"),
      max(when(col("rank") === 2, col("pt"))).as("pt2"),
      max(when(col("rank") === 2, col("eta"))).as("eta2"),
      max(when(col("rank") === 2, col("phi"))).as("phi2"))
    // exactly-2 + opposite-sign (sum of ±1 charges == 0)
    val gated = paired.filter(col("nmuons") === 2 && col("sum_charge") === 0.0)
    val m = lit(0.1057)
    val mass = K.p4SumMass(col("pt1"), col("eta1"), col("phi1"), m,
      col("pt2"), col("eta2"), col("phi2"), m) % lit(160.0)
    val out = gated
      .withColumn("dimuon_mass", mass)
      .withColumn("dimuon_dr",
        K.deltaR(col("eta1"), col("phi1"), col("eta2"), col("phi2")))
      .withColumn("region", Selections.regionLabel(col("dimuon_mass")))
      .filter(col("region") =!= "none")
    out.select(col("event"),
        col("dimuon_mass").cast("float").as("dimuon_mass"),
        col("dimuon_dr").cast("float").as("dimuon_dr"),
        col("pt1").cast("float").as("mu1_pt"),
        col("pt2").cast("float").as("mu2_pt"),
        col("region"))
      .orderBy(col("event"))
  }
  private val s01Sql = {
    def sinhS(x: String) = s"((EXP($x) - EXP(-($x))) / 2.0)"
    def pzS(pt: String, eta: String) = s"(($pt) * ${sinhS(eta)})"
    def eS(pt: String, eta: String) =
      s"SQRT(($pt) * ($pt) + ${pzS(pt, eta)} * ${pzS(pt, eta)} + 0.1057 * 0.1057)"
    val sx = "((pt1) * COS(phi1)) + ((pt2) * COS(phi2))"
    val sy = "((pt1) * SIN(phi1)) + ((pt2) * SIN(phi2))"
    val sz = s"${pzS("pt1", "eta1")} + ${pzS("pt2", "eta2")}"
    val se = s"${eS("pt1", "eta1")} + ${eS("pt2", "eta2")}"
    val mass = s"(SQRT(GREATEST(($se) * ($se) - ($sx) * ($sx) - ($sy) * ($sy) - ($sz) * ($sz), 0.0)) % 160.0)"
    val de = "ABS(eta1 - eta2)"
    val dp = "ABS(((((phi1 - phi2 + PI()) % (2.0 * PI())) + (2.0 * PI())) % (2.0 * PI())) - PI())"
    val dr = s"SQRT(($de) * ($de) + ($dp) * ($dp))"
    val region = RelationalQueries.regionCaseSql(mass)
    s"""WITH objs AS (
       | SELECT l_orderkey AS event, l_linenumber AS idx,
       |  l_extendedprice / 500.0 AS pt,
       |  l_discount * 40.0 - 2.0 AS eta,
       |  l_tax * 78.0 - 3.12 AS phi,
       |  CASE WHEN l_linenumber % 2 = 0 THEN 1.0 ELSE -1.0 END AS charge,
       |  l_extendedprice
       | FROM lineitem WHERE l_quantity > 5.0 AND l_extendedprice > 2000.0),
       |ranked AS (
       | SELECT *, ROW_NUMBER() OVER (PARTITION BY event
       |   ORDER BY pt DESC, idx ASC, l_extendedprice ASC) AS rank
       | FROM objs),
       |paired AS (
       | SELECT event, COUNT(*) AS nmuons, SUM(charge) AS sum_charge,
       |  MAX(CASE WHEN rank = 1 THEN pt END) AS pt1,
       |  MAX(CASE WHEN rank = 1 THEN eta END) AS eta1,
       |  MAX(CASE WHEN rank = 1 THEN phi END) AS phi1,
       |  MAX(CASE WHEN rank = 2 THEN pt END) AS pt2,
       |  MAX(CASE WHEN rank = 2 THEN eta END) AS eta2,
       |  MAX(CASE WHEN rank = 2 THEN phi END) AS phi2
       | FROM ranked GROUP BY 1),
       |gated AS (SELECT * FROM paired WHERE nmuons = 2 AND sum_charge = 0.0)
       |SELECT event,
       | CAST($mass AS REAL) AS dimuon_mass,
       | CAST($dr AS REAL) AS dimuon_dr,
       | CAST(pt1 AS REAL) AS mu1_pt,
       | CAST(pt2 AS REAL) AS mu2_pt,
       | $region AS region
       |FROM gated
       |WHERE $region != 'none'
       |ORDER BY event""".stripMargin
  }

  // ---- s03: stage-2 post-processing pipeline (§3.2) ----------------------
  // read -> per-event aggregates -> channel cascade -> weights ->
  // 4-axis weighted histogram (region x channel x variation x bin).
  // The systematic variation is an extra weight COLUMN, not a second
  // pass — one scan feeds every (variation, bin) cell via grouping by
  // an exploded variation tag.
  private def s03(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val per = li.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("njets"),
      sum(when(col("l_quantity") > 45.0, 1L).otherwise(0L)).as("nbtag"),
      max(col("l_extendedprice")).as("lead_price"),
      (max(col("l_discount")) * lit(40.0)).as("deta"),
      sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("ht"))
    val mass = col("ht") % lit(160.0)
    val wNom = lit(1.0) + col("ht") / lit(1.0e6)
    val wVar = wNom * (lit(1.0) + (col("lead_price") % lit(5.0)) / lit(100.0))
    val labeled = per
      .withColumn("region", Selections.regionLabel(mass))
      .withColumn("channel", Selections.channelLabel(col("nbtag"),
        col("lead_price") / 100.0, col("deta"), col("lead_price") / 1000.0, col("njets")))
      .withColumn("mass", mass)
      .filter(col("region") =!= "none")
    val fanned = labeled.select(col("region"), col("channel"), col("mass"),
        explode(array(
          struct(lit("nominal").as("variation"), wNom.as("w")),
          struct(lit("jes_up").as("variation"), wVar.as("w")))).as("v"))
      .select(col("region"), col("channel"), col("v.variation").as("variation"), col("mass"), col("v.w").as("w"))
    fanned.groupBy(col("region"), col("channel"), col("variation"),
        Histogrammer.bucket(col("mass"), 0.0, 160.0, 40).as("bin"))
      .agg(sum(col("w")).cast("float").as("value"),
           sum(col("w") * col("w")).cast("float").as("sumw2"))
      .orderBy(col("region"), col("channel"), col("variation"), col("bin"))
  }
  private val s03Sql = {
    val b = Histogrammer.bucketSql("mass", 0.0, 160.0, 40)
    val region = RelationalQueries.regionCaseSql("(ht % 160.0)")
    s"""WITH per AS (
       | SELECT l_orderkey, COUNT(*) AS njets,
       |  SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS nbtag,
       |  MAX(l_extendedprice) AS lead_price,
       |  MAX(l_discount) * 40.0 AS deta,
       |  SUM(l_extendedprice * (1.0 - l_discount)) AS ht
       | FROM lineitem GROUP BY 1),
       |labeled AS (
       | SELECT ht % 160.0 AS mass,
       |  $region AS region,
       |  CASE WHEN nbtag > 1 THEN 'ttHorVH'
       |   WHEN lead_price / 100.0 > 400.0 AND deta > 2.5 AND lead_price / 1000.0 > 35.0 THEN 'vbf'
       |   WHEN njets = 0 THEN 'ggh_0jets'
       |   WHEN njets = 1 THEN 'ggh_1jet'
       |   ELSE 'ggh_2orMoreJets' END AS channel,
       |  1.0 + ht / 1.0e6 AS wnom,
       |  (1.0 + ht / 1.0e6) * (1.0 + (lead_price % 5.0) / 100.0) AS wvar
       | FROM per WHERE $region != 'none'),
       |fanned AS (
       | SELECT region, channel, 'nominal' AS variation, mass, wnom AS w FROM labeled
       | UNION ALL
       | SELECT region, channel, 'jes_up' AS variation, mass, wvar AS w FROM labeled)
       |SELECT region, channel, variation, $b AS bin,
       | CAST(SUM(w) AS REAL) AS value, CAST(SUM(w * w) AS REAL) AS sumw2
       |FROM fanned GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin
  }

  // ---- s04: stage-3 templates & yields (§3.3) ----------------------------
  // histogram -> per-(region, channel) group: variation yields,
  // shape-only renormalized variant, nominal/variant ratio — the
  // datacard's numeric core. All small-data aggregation over s03's
  // output shape.
  private def s04(s: SparkSession, dir: String): DataFrame = {
    // materialize the (tiny) stage-2 histogram once: without this the
    // template stage's window+pivot would re-derive the whole lineitem
    // subtree — a harmless re-plan here, a double 100 TB scan in prod
    val hist = s03(s, dir).localCheckpoint()
    val pivoted = hist.groupBy(col("region"), col("channel"), col("bin"))
      .agg(
        sum(when(col("variation") === "nominal", col("value"))).as("nom"),
        sum(when(col("variation") === "jes_up", col("value"))).as("vr"))
    val w = Window.partitionBy(col("region"), col("channel"))
    pivoted
      .withColumn("nom_total", sum(col("nom")).over(w))
      .withColumn("vr_total", sum(col("vr")).over(w))
      .groupBy(col("region"), col("channel"))
      .agg(
        sum(col("nom")).cast("float").as("yield_nominal"),
        sum(col("vr") * col("nom_total") / col("vr_total")).cast("float").as("yield_var_renormed"),
        (max(col("vr_total")) / max(col("nom_total"))).cast("float").as("rate_unc"))
      .orderBy(col("region"), col("channel"))
  }
  private val s04Sql =
    s"""WITH hist AS (${s03Sql.replace("ORDER BY 1, 2, 3, 4", "")}),
       |pivoted AS (
       | SELECT region, channel, bin,
       |  SUM(CASE WHEN variation = 'nominal' THEN value END) AS nom,
       |  SUM(CASE WHEN variation = 'jes_up' THEN value END) AS vr
       | FROM hist GROUP BY 1, 2, 3),
       |tot AS (
       | SELECT *, SUM(nom) OVER (PARTITION BY region, channel) AS nom_total,
       |        SUM(vr) OVER (PARTITION BY region, channel) AS vr_total
       | FROM pivoted)
       |SELECT region, channel,
       | CAST(SUM(nom) AS REAL) AS yield_nominal,
       | CAST(SUM(vr * nom_total / vr_total) AS REAL) AS yield_var_renormed,
       | CAST(MAX(vr_total) / MAX(nom_total) AS REAL) AS rate_unc
       |FROM tot GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- s06: systematic-variation fan-out at reference width --------------
  // reference: stage1/processor.py:447-463 + config/jec_parameters.py —
  // 22 JES + 12 JER variants, each re-running jet selection with shifted
  // pt. The reference loops N passes over the input; here every variant
  // is a struct in ONE exploded array literal, so the 100 TB scan happens
  // once and the fan-out rides the same shuffle keyed (event, variation).
  // Scales are carried as 4-decimal STRINGS cast to double on both
  // engines — computing 1.0 + 0.002*i in Scala and parsing 1.006 in
  // DuckDB can differ in the last ulp, and the shifted pt feeds a
  // selection threshold.
  private val variantScales: Seq[(String, String)] = {
    def fmt(x: Double) = f"$x%.4f"
    ("nominal", fmt(1.0)) +:
      ((1 to 11).flatMap(i => Seq(
        (s"jes${i}_up", fmt(1.0 + 0.002 * i)),
        (s"jes${i}_down", fmt(1.0 - 0.002 * i)))) ++
       (1 to 6).flatMap(i => Seq(
        (s"jer${i}_up", fmt(1.0 + 0.001 * i)),
        (s"jer${i}_down", fmt(1.0 - 0.001 * i)))))
  }
  private def s06(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    // Per-variant aggregates BEFORE any explode: one groupBy(l_orderkey)
    // with 2 agg expressions per variant, so the only big shuffle carries
    // |orders| wide rows (35×2 buffer slots) instead of |lineitems|×35
    // exploded rows — at sf0.1 that's 150k rows vs 21M. Map-side partial
    // agg does the per-variant selection inline (sum-of-CASE), and the
    // 35-way explode happens on the already-aggregated table.
    val aggs: Seq[org.apache.spark.sql.Column] = variantScales.flatMap { case (n, sc) =>
      val pt = col("l_extendedprice") * lit(sc).cast("double")
      val sel = pt > lit(2000.0)
      // ht is summed as milli-scaled longs (floor(x*1000+0.5), the repo's
      // exact-sum convention): a plain double fold is accumulation-order
      // dependent across engines, and ht feeds discontinuous functions
      // (% 160 region label + 40-bin bucket) where one ulp flips a row.
      Seq(
        sum(when(sel, 1L).otherwise(0L)).as(s"njets_$n"),
        sum(when(sel, floor(pt * (lit(1.0) - col("l_discount")) * lit(1000.0) + lit(0.5))
          .cast("long"))).as(s"htm_$n"))
    }
    // Hash-repartition by the group key FIRST: the groupBy then reuses
    // this one exchange (no second shuffle), the wire carries the 3 raw
    // pruned columns (~600k x 24 B) instead of 35x2 partial-agg buffer
    // slots per order (~6x more bytes measured at sf0.1), and the
    // 70-expression evaluation runs at full width instead of on the
    // scan's splits (ONE ~11 MB file locally => near-serial map side;
    // r15: exec 2.3 s steady). Same plan shape and byte-savings at
    // cluster scale — partition count follows spark.sql.shuffle.partitions.
    val per = li.repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey")).agg(aggs.head, aggs.tail: _*)
    val fanned = per.select(col("l_orderkey"),
        explode(array(variantScales.map { case (n, _) =>
          struct(lit(n).as("variation"),
            col(s"njets_$n").as("njets"), (col(s"htm_$n") / lit(1000.0)).as("ht"))
        }: _*)).as("v"))
      .select(col("v.variation").as("variation"), col("v.njets").as("njets"),
        col("v.ht").as("ht"))
      .filter(col("njets") > 0)
    val mass = col("ht") % lit(160.0)
    val labeled = fanned
      .withColumn("region", Selections.regionLabel(mass))
      .withColumn("mass", mass)
      .filter(col("region") =!= "none")
    labeled.groupBy(col("variation"), col("region"),
        Histogrammer.bucket(col("mass"), 0.0, 160.0, 40).as("bin"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("ht") / lit(1.0e5)).cast("float").as("value"))
      .orderBy(col("variation"), col("region"), col("bin"))
  }
  private val s06Sql = {
    val values = variantScales.map { case (n, sc) =>
      s"('$n', CAST('$sc' AS DOUBLE))" }.mkString(", ")
    val b = Histogrammer.bucketSql("mass", 0.0, 160.0, 40)
    val region = RelationalQueries.regionCaseSql("(ht % 160.0)")
    s"""WITH v(variation, scale) AS (VALUES $values),
       |jets AS (
       | SELECT l_orderkey, variation,
       |  l_extendedprice * scale AS pt, l_discount
       | FROM lineitem CROSS JOIN v
       | WHERE l_extendedprice * scale > 2000.0),
       |per AS (
       | SELECT l_orderkey, variation, COUNT(*) AS njets,
       |  SUM(CAST(FLOOR(pt * (1.0 - l_discount) * 1000.0 + 0.5) AS BIGINT)) AS htm
       | FROM jets GROUP BY 1, 2),
       |perht AS (
       | SELECT variation, htm / 1000.0 AS ht FROM per),
       |labeled AS (
       | SELECT variation, ht, ht % 160.0 AS mass, $region AS region
       | FROM perht WHERE $region != 'none')
       |SELECT variation, region, $b AS bin,
       | COUNT(*) AS n_events, CAST(SUM(ht / 1.0e5) AS REAL) AS value
       |FROM labeled GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // ---- s05: unbinned column save (S7) ------------------------------------
  // reference: stage2/postprocessor.py:235-253 — per-channel filtered
  // projection of fit inputs.
  private def s05(s: SparkSession, dir: String): DataFrame = {
    val base = s01(s, dir)
    base.filter(col("region") === "h-peak")
      .select(col("event"), col("dimuon_mass"), col("mu1_pt"))
      .orderBy(col("event"))
  }
  private val s05Sql =
    s"""SELECT event, dimuon_mass, mu1_pt FROM (${s01Sql.replace("ORDER BY event", "")})
       |WHERE region = 'h-peak' ORDER BY event""".stripMargin

  // ---- s10: native ROOT TH1 ingestion --------------------------------------
  // The engine reads a ROOT calibration histogram DIRECTLY (the
  // reference's own data/pileup/mcPileup2018.root — reference:
  // run_stage1.py's pileup-correction loader consumes exactly this
  // file) through the pure-JVM DataSource V2 connector
  // (sources/RootHistFile.scala + RootHistSource.scala), no conversion
  // step. The oracle is a LITERAL replay of the file's 102 bins
  // produced by an INDEPENDENT from-scratch parser of the public ROOT
  // format — so a green hash means two separate implementations agree
  // on every bin of a real-world binary file. DuckDB cannot read ROOT;
  // a literal-values oracle is the strongest cross-check available and
  // is exact because the file is static test data.
  private lazy val rootFixture = refData("pileup/mcPileup2018.root")
  private def s10(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.RootHistSource")
      .option("path", rootFixture).load()
      .filter(col("hist") === "pu_mc")
      .select(col("bin"), col("x_low"), col("x_high"),
        col("content").cast("float").as("content"))
      .orderBy(col("bin"))
  private val s10Sql =
    """SELECT bin, x_low, x_high, CAST(content AS REAL) AS content
      |FROM (VALUES
      |(0, CAST(NULL AS DOUBLE), 0.0, 0.0), (1, 0.0, 1.0, 4.695341e-10), (2, 1.0, 2.0, 1.206213e-06),
      |(3, 2.0, 3.0, 1.162593e-06), (4, 3.0, 4.0, 6.118058e-06), (5, 4.0, 5.0, 1.626767e-05),
      |(6, 5.0, 6.0, 3.508135e-05), (7, 6.0, 7.0, 7.12608e-05), (8, 7.0, 8.0, 0.0001400641),
      |(9, 8.0, 9.0, 0.0002663403), (10, 9.0, 10.0, 0.0004867473), (11, 10.0, 11.0, 0.0008469),
      |(12, 11.0, 12.0, 0.001394142), (13, 12.0, 13.0, 0.002169081), (14, 13.0, 14.0, 0.003198514),
      |(15, 14.0, 15.0, 0.004491138), (16, 15.0, 16.0, 0.006036423), (17, 16.0, 17.0, 0.007806509),
      |(18, 17.0, 18.0, 0.00976048), (19, 18.0, 19.0, 0.0118498), (20, 19.0, 20.0, 0.01402411),
      |(21, 20.0, 21.0, 0.01623639), (22, 21.0, 22.0, 0.01844593), (23, 22.0, 23.0, 0.02061956),
      |(24, 23.0, 24.0, 0.02273221), (25, 24.0, 25.0, 0.02476554), (26, 25.0, 26.0, 0.02670494),
      |(27, 26.0, 27.0, 0.02853662), (28, 27.0, 28.0, 0.03024538), (29, 28.0, 29.0, 0.03181323),
      |(30, 29.0, 30.0, 0.03321895), (31, 30.0, 31.0, 0.03443884), (32, 31.0, 32.0, 0.035448),
      |(33, 32.0, 33.0, 0.03622242), (34, 33.0, 34.0, 0.03674106), (35, 34.0, 35.0, 0.0369877),
      |(36, 35.0, 36.0, 0.03695224), (37, 36.0, 37.0, 0.03663157), (38, 37.0, 38.0, 0.03602986),
      |(39, 38.0, 39.0, 0.03515857), (40, 39.0, 40.0, 0.03403612), (41, 40.0, 41.0, 0.0326868),
      |(42, 41.0, 42.0, 0.03113936), (43, 42.0, 43.0, 0.02942582), (44, 43.0, 44.0, 0.02757999),
      |(45, 44.0, 45.0, 0.02563551), (46, 45.0, 46.0, 0.02362497), (47, 46.0, 47.0, 0.02158003),
      |(48, 47.0, 48.0, 0.01953143), (49, 48.0, 49.0, 0.01750863), (50, 49.0, 50.0, 0.01553934),
      |(51, 50.0, 51.0, 0.01364905), (52, 51.0, 52.0, 0.01186035), (53, 52.0, 53.0, 0.01019246),
      |(54, 53.0, 54.0, 0.008660705), (55, 54.0, 55.0, 0.007275915), (56, 55.0, 56.0, 0.006043917),
      |(57, 56.0, 57.0, 0.004965276), (58, 57.0, 58.0, 0.004035611), (59, 58.0, 59.0, 0.003246373),
      |(60, 59.0, 60.0, 0.002585932), (61, 60.0, 61.0, 0.002040746), (62, 61.0, 62.0, 0.001596402),
      |(63, 62.0, 63.0, 0.001238498), (64, 63.0, 64.0, 0.0009533139), (65, 64.0, 65.0, 0.0007282885),
      |(66, 65.0, 66.0, 0.000552306), (67, 66.0, 67.0, 0.0004158005), (68, 67.0, 68.0, 0.0003107302),
      |(69, 68.0, 69.0, 0.0002304612), (70, 69.0, 70.0, 0.0001696012), (71, 70.0, 71.0, 0.0001238161),
      |(72, 71.0, 72.0, 8.96531e-05), (73, 72.0, 73.0, 6.438087e-05), (74, 73.0, 74.0, 4.585302e-05),
      |(75, 74.0, 75.0, 3.23949e-05), (76, 75.0, 76.0, 2.271048e-05), (77, 76.0, 77.0, 1.580622e-05),
      |(78, 77.0, 78.0, 1.09286e-05), (79, 78.0, 79.0, 7.512748e-06), (80, 79.0, 80.0, 5.140304e-06),
      |(81, 80.0, 81.0, 3.505254e-06), (82, 81.0, 82.0, 2.386437e-06), (83, 82.0, 83.0, 1.625859e-06),
      |(84, 83.0, 84.0, 1.111865e-06), (85, 84.0, 85.0, 7.663272e-07), (86, 85.0, 86.0, 5.350694e-07),
      |(87, 86.0, 87.0, 3.808318e-07), (88, 87.0, 88.0, 2.781785e-07), (89, 88.0, 89.0, 2.098661e-07),
      |(90, 89.0, 90.0, 1.642811e-07), (91, 90.0, 91.0, 1.312835e-07), (92, 91.0, 92.0, 1.081326e-07),
      |(93, 92.0, 93.0, 9.141993e-08), (94, 93.0, 94.0, 7.890983e-08), (95, 94.0, 95.0, 6.91468e-08),
      |(96, 95.0, 96.0, 6.119019e-08), (97, 96.0, 97.0, 5.443693e-08), (98, 97.0, 98.0, 4.85036e-08),
      |(99, 98.0, 99.0, 4.31486e-08), (100, 99.0, 100.0, 3.822112e-08), (101, 100.0, CAST(NULL AS DOUBLE), 0.0)
      |) AS t(bin, x_low, x_high, content)
      |ORDER BY bin""".stripMargin

  // ---- s11: TTree event-data scan through the native connector -------------
  // The reference's primary input path — NanoAOD-style TTree event data
  // (reference: run_stage1.py:154-166 iterates TTree branches;
  // config/branches.py:115-134 lists them) — read natively: the TTree
  // connector decodes the jagged vector branches of muonresolution.root's
  // 100k-event MyTree and this query reduces the muon_pt branch to its
  // per-event-multiplicity profile (events and micro-exact summed pt per
  // muon count). The oracle is a LITERAL replay computed by the
  // independent Python decoder — and the in-file golden
  // (RootHistSourceSpec: re-histogrammed muon_eta == the file's own
  // hEta TH1F) pins the decode semantics separately. Milli-quantized
  // integer pt sums keep the check order-free and exact.
  private lazy val treeFixture =
    refData("mass_res_pisa/muonresolution.root")

  /** Shared s14/s16 event chain: root-tree long rows → one pivot shuffle
    * to muon rows → object selection → exactly-2 gate → p4 mass. Returns
    * per-event rows with a `mass` column. */
  private def s14Mass(s: SparkSession): DataFrame = {
    val rows = s.read.format("root-tree").option("path", treeFixture).load()
      .filter(col("tree") === "MyTree" &&
        col("branch").isin("muon_pt", "muon_eta") && col("i").isNotNull)
    val muons = rows.groupBy(col("entry"), col("i"))
      .agg(max(when(col("branch") === "muon_pt", col("value"))).as("pt"),
        max(when(col("branch") === "muon_eta", col("value"))).as("eta"))
      .filter(col("pt") > 20.0 && col("pt") < 200.0 && abs(col("eta")) < 2.4)
    val events = muons.groupBy(col("entry"))
      .agg(count(lit(1)).as("nmu"),
        sort_array(collect_list(struct(col("i"), col("pt"), col("eta"))))
          .as("mus"))
      .filter(col("nmu") === 2)
      .select(col("entry"),
        col("mus")(0)("pt").as("pt1"), col("mus")(0)("eta").as("eta1"),
        col("mus")(1)("pt").as("pt2"), col("mus")(1)("eta").as("eta2"))
    val m = lit(0.1057)
    events.withColumn("mass",
      K.p4SumMass(col("pt1"), col("eta1"), lit(0.0), m,
        col("pt2"), col("eta2"), lit(0.0), m))
  }
  private def s11(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.RootTreeSource")
      .option("path", treeFixture).load()
      .filter(col("tree") === "MyTree" && col("branch") === "muon_pt")
      .groupBy(col("n").as("n_mu"))
      .agg(countDistinct(col("entry")).as("n_events"),
        sum(coalesce(
          expr("CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT)"), lit(0L)))
          .as("pt_milli_sum"))
      .orderBy(col("n_mu"))
  private val s11Sql =
    """SELECT n_mu, n_events, pt_milli_sum FROM (VALUES
      |(0, 68759, 0),
      |(1, 15308, 459405844),
      |(2, 15811, 1317004619),
      |(3, 122, 14277852)
      |) AS t(n_mu, n_events, pt_milli_sum)
      |ORDER BY n_mu""".stripMargin

  // ---- s14: ROOT-native stage-1 flagship ------------------------------------
  // The reference's true input path END TO END (run_stage1.py:154-166:
  // open .root file -> decode jagged muon branches -> object selection
  // -> exactly-2 -> p4 sum -> region label -> histogram), running
  // entirely on the native root-tree connector against the reference's
  // own 100k-event fixture. Composition: root-tree long rows -> one
  // pivot shuffle to (entry, i, pt, eta) muon rows -> muon-level
  // selection -> exactly-2 gate via sorted struct collect (g03's
  // re-nest) -> p4SumMass with phi=0 (the fixture carries no phi
  // branch; cos(0)=1 makes px=pt exactly, so the full p4 composition
  // is still exercised) -> regionLabel -> milli-quantized order-free
  // histogram. Oracle = literal replay by the INDEPENDENT Python
  // decoder (tools/gen_s14_oracle.py, shares no code with the Scala
  // reader); the in-file golden (RootHistSourceSpec: decoded muon_eta
  // re-histogrammed == the file's own hEta TH1F) pins decode
  // semantics separately. At scale: the connector emits one partition
  // per file (a NanoAOD dataset is thousands of files), the pivot and
  // the exactly-2 gate are the SAME one-shuffle jagged pattern as
  // g01, and every aggregate is map-side combined.
  private def s14(s: SparkSession, dir: String): DataFrame = {
    s14Mass(s)
      .select(Selections.regionLabel(col("mass")).as("region"),
        Histogrammer.bucket(col("mass"), 0.0, 200.0, 40).cast("int").as("bin"),
        expr("CAST(FLOOR(mass * 1000.0 + 0.5) AS BIGINT)").as("mass_milli"))
      .groupBy(col("region"), col("bin"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("mass_milli")).as("mass_milli_sum"))
      .orderBy(col("region"), col("bin"))
  }
  private val s14Sql =
    """SELECT region, bin, n_events, mass_milli_sum FROM (VALUES
      |('h-peak', 24, 4, 468942),
      |('h-peak', 25, 2, 244890),
      |('h-peak', 26, 4, 505091),
      |('h-peak', 27, 1, 132521),
      |('h-sidebands', 23, 7, 793313),
      |('h-sidebands', 28, 7, 961143),
      |('h-sidebands', 29, 4, 571282),
      |('h-sidebands', 30, 4, 594669),
      |('none', 1, 976, 2435882),
      |('none', 2, 924, 6903234),
      |('none', 3, 919, 11465694),
      |('none', 4, 867, 15151517),
      |('none', 5, 955, 21446491),
      |('none', 6, 883, 24399884),
      |('none', 7, 860, 27933555),
      |('none', 8, 860, 32234687),
      |('none', 9, 826, 35027917),
      |('none', 10, 821, 38962905),
      |('none', 11, 784, 41124602),
      |('none', 12, 733, 42126709),
      |('none', 13, 786, 49086827),
      |('none', 14, 649, 43822678),
      |('none', 15, 615, 44545401),
      |('none', 16, 81, 6119533),
      |('none', 22, 11, 1188792),
      |('none', 31, 1, 152530),
      |('none', 32, 1, 156189),
      |('none', 33, 4, 647039),
      |('none', 34, 1, 168523),
      |('none', 35, 1, 173004),
      |('none', 36, 1, 177346),
      |('none', 38, 1, 185166),
      |('none', 40, 1, 199642),
      |('none', 41, 6, 1782563),
      |('z-peak', 16, 322, 25097666),
      |('z-peak', 17, 202, 16593288),
      |('z-peak', 18, 148, 12942716),
      |('z-peak', 19, 69, 6325898),
      |('z-peak', 20, 14, 1357479),
      |('z-peak', 21, 14, 1431679),
      |('z-peak', 22, 1, 105139)
      |) AS t(region, bin, n_events, mass_milli_sum)
      |ORDER BY region, bin""".stripMargin

  // ---- s16: Runs-tree metadata pre-scan on the REAL input format ----------
  // The last stage-1 input path moved off its parquet stand-in (round-12
  // verdict ask #3): the reference's preprocessor reads the `Runs` TTree
  // of every NanoAOD file and sums genEventSumw/genEventCount per
  // dataset to derive lumi_weight = xsec * lumi / sumw, which stage 1
  // multiplies into every event weight (reference:
  // stage1/preprocessor.py:200-229). Here the SAME shape runs natively:
  // the root-tree connector scans a directory of .root files (one
  // partition per file — a NanoAOD dataset is thousands of files; this
  // is the reference's parallelism unit), a tiny two-branch pivot
  // aggregation computes the per-dataset sums, and the resulting
  // weights table — a handful of rows no matter the corpus size — rides
  // a BROADCAST into the s14 event chain to produce per-dataset
  // weighted region yields. At 100 TB the prescan reads only the Runs
  // baskets (KB per file), never event data. Fixture:
  // fixtures/runs/*.root, authored + independently decoded + replayed
  // by tools/gen_runs_fixture.py (the gen_s14_oracle discipline); the
  // branch values are dyadic doubles so the cross-file sum is
  // order-free and bit-exact. yield_micro quantizes n_events *
  // lumi_weight (the double, pre-float-cast) at 1e-6 for a hash-stable
  // cross-engine compare.
  //
  // DELIBERATE divergence from the reference (round-13 advice #2): the
  // reference preprocessor reads only the FIRST Runs entry per file
  // (`tree["genEventSumw"].array()[0]`, stage1/preprocessor.py get_mc)
  // because CMS production writes exactly one Runs entry per file; a
  // file merged from k inputs carries k entries, and first-entry-only
  // silently drops k-1 of them. This scan sums ALL entries per file —
  // the merged-file-correct total — and the fixture deliberately
  // contains multi-entry files so the oracle (gen_runs_fixture.py, same
  // sum-all semantics) pins that contract. On single-entry production
  // files the two computations are identical.
  private lazy val runsFixtureDir: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR",
      "/root/repo/src/main/resources/fixtures") + "/runs"
  private def s16(s: SparkSession, dir: String): DataFrame = {
    val runs = s.read.format("root-tree").option("path", runsFixtureDir).load()
      .filter(col("tree") === "Runs" &&
        col("branch").isin("genEventSumw", "genEventCount"))
      .select(regexp_extract(col("file"),
        "([A-Za-z0-9_]+)_part[0-9]+\\.root$", 1).as("dataset"),
        col("branch"), col("value"))
    // no .otherwise fall-through: a fixture file whose name doesn't map
    // to a known dataset must fail LOUDLY (raise_error) instead of
    // silently emitting null-weight yield rows (round-13 advice #3) —
    // at corpus scale a typo'd dataset directory would otherwise zero
    // out its lumi weights without any signal.
    val xsec = when(col("dataset") === "ggh_amcPS", lit(0.010571))
      .when(col("dataset") === "vbf_powheg", lit(0.000823))
      .otherwise(raise_error(concat(
        lit("s16: no cross-section mapped for dataset '"), col("dataset"),
        lit("' — add it to the xsec table or fix the filename"))))
    val wtab = runs.groupBy(col("dataset"))
      .agg(sum(when(col("branch") === "genEventSumw", col("value")))
          .as("sumw"),
        sum(when(col("branch") === "genEventCount", col("value")))
          .as("cnt"))
      .select(col("dataset"), col("cnt").cast("long").as("n_gen"),
        (xsec * lit(lumi) / col("sumw")).as("w"))
    val regions = s14Mass(s)
      .groupBy(Selections.regionLabel(col("mass")).as("region"))
      .agg(count(lit(1)).as("n_events"))
    regions.crossJoin(broadcast(wtab))
      .select(col("dataset"), col("region"), col("n_events"), col("n_gen"),
        col("w").cast("float").as("lumi_wgt"),
        expr("CAST(FLOOR(n_events * w * 1e6 + 0.5) AS BIGINT)")
          .as("yield_micro"))
      .orderBy(col("dataset"), col("region"))
  }
  // literal replay by the independent decoder (tools/gen_runs_fixture.py)
  private val s16Sql =
    """SELECT dataset, region, n_events, n_gen, lumi_wgt, yield_micro FROM (VALUES
      |('ggh_amcPS', 'h-peak', 11, 600000, CAST(0.009008853696286678 AS REAL), 99097),
      |('ggh_amcPS', 'h-sidebands', 22, 600000, CAST(0.009008853696286678 AS REAL), 198195),
      |('ggh_amcPS', 'none', 12567, 600000, CAST(0.009008853696286678 AS REAL), 113214259),
      |('ggh_amcPS', 'z-peak', 770, 600000, CAST(0.009008853696286678 AS REAL), 6936817),
      |('vbf_powheg', 'h-peak', 11, 90000, CAST(0.004816914442926645 AS REAL), 52986),
      |('vbf_powheg', 'h-sidebands', 22, 90000, CAST(0.004816914442926645 AS REAL), 105972),
      |('vbf_powheg', 'none', 12567, 90000, CAST(0.004816914442926645 AS REAL), 60534164),
      |('vbf_powheg', 'z-peak', 770, 90000, CAST(0.004816914442926645 AS REAL), 3709024)
      |) AS t(dataset, region, n_events, n_gen, lumi_wgt, yield_micro)
      |ORDER BY dataset, region""".stripMargin

  // ---- s12: histogram rebin + data/MC ratio with pulls ---------------------
  // The table behind every stack/ratio panel (stage3/plotter.py's ratio
  // pad, engine side): rebin the 40-bin mass histogram by 5 (merging
  // value AND sumw2 — the invariant a physics user checks first), then
  // per coarse bin the data/MC ratio with propagated error and the
  // pull (data - mc) / sqrt(var_data + var_mc). "Data" = unit-weight
  // orders with key % 3 = 0, "MC" = the a10 weight on the rest, so
  // both populations share one scan. Rebinning is pure bin index
  // arithmetic — (bin-1) div 5 + 1 with under/overflow preserved — and
  // the merge is the same map-side-combined groupBy as the original
  // fill; at 100 TB rebinning costs one shuffle of a 45-row table.
  private val rebinF = 5
  private val s12Lo = 0.0; private val s12Hi = 160.0; private val s12N = 40
  private def s12(s: SparkSession, dir: String): DataFrame = {
    val o = rd(s, dir, "orders")
    val mass = col("o_totalprice") % lit(160.0)
    val region = Selections.regionLabel(mass)
    val isData = col("o_orderkey") % 3 === 0
    val w = lit(1.0) + col("o_totalprice") / lit(1.0e6)
    // ONE scan fills both populations as conditional weight columns
    // (the s06 fan-out discipline applied to data-vs-MC)
    val filled = o
      .select(region.as("region"),
        Histogrammer.bucket(mass, s12Lo, s12Hi, s12N).as("bin"),
        when(isData, lit(1.0)).otherwise(lit(0.0)).as("wd"),
        when(isData, lit(0.0)).otherwise(w).as("wm"))
      .groupBy(col("region"), col("bin"))
      .agg(sum(col("wd")).as("dval"),
        sum(col("wm")).as("value"),
        sum(col("wm") * col("wm")).as("sumw2"))
    val coarse = filled
      .withColumn("cbin", expr(
        s"CASE WHEN bin = 0 THEN 0 WHEN bin = ${s12N + 1} THEN ${s12N / rebinF + 1} " +
          s"ELSE (bin - 1) div $rebinF + 1 END"))
      .groupBy(col("region"), col("cbin"))
      .agg(sum(col("dval")).as("data_n"),
        sum(col("value")).as("mc_val"), sum(col("sumw2")).as("mc_var"))
    coarse.select(col("region"), col("cbin"),
        col("data_n").cast("long").as("data_n"),
        col("mc_val").cast("float").as("mc_val"),
        expr("CAST(sqrt(mc_var) AS FLOAT)").as("mc_err"),
        expr("""CAST(CASE WHEN mc_val > 0 AND data_n > 0
               | THEN data_n / mc_val END AS FLOAT)""".stripMargin).as("ratio"),
        expr("""CAST(CASE WHEN mc_val > 0 AND data_n > 0
               | THEN (data_n / mc_val)
               |      * sqrt(1.0 / data_n + mc_var / (mc_val * mc_val)) END
               |AS FLOAT)""".stripMargin).as("ratio_err"),
        expr("""CAST(CASE WHEN data_n + mc_var > 0
               | THEN (data_n - mc_val) / sqrt(data_n + mc_var) END
               |AS FLOAT)""".stripMargin).as("pull"))
      .orderBy(col("region"), col("cbin"))
  }
  private val s12Sql = {
    val mass = "(o_totalprice % 160.0)"
    val region = RelationalQueries.regionCaseSql(mass)
    val bucket = Histogrammer.bucketSql(mass, s12Lo, s12Hi, s12N)
    s"""WITH filled AS (
       | SELECT $region AS region, $bucket AS bin,
       |  SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END) AS dval,
       |  SUM(CASE WHEN o_orderkey % 3 = 0 THEN 0.0
       |      ELSE 1.0 + o_totalprice / 1.0e6 END) AS value,
       |  SUM(CASE WHEN o_orderkey % 3 = 0 THEN 0.0
       |      ELSE (1.0 + o_totalprice / 1.0e6)
       |           * (1.0 + o_totalprice / 1.0e6) END) AS sumw2
       | FROM orders GROUP BY 1, 2),
       |coarse AS (
       | SELECT region,
       |  CASE WHEN bin = 0 THEN 0 WHEN bin = ${s12N + 1} THEN ${s12N / rebinF + 1}
       |   ELSE (bin - 1) // $rebinF + 1 END AS cbin,
       |  SUM(dval) AS data_n, SUM(value) AS mc_val, SUM(sumw2) AS mc_var
       | FROM filled GROUP BY 1, 2)
       |SELECT region, cbin, CAST(data_n AS BIGINT) AS data_n,
       | CAST(mc_val AS REAL) AS mc_val,
       | CAST(sqrt(mc_var) AS REAL) AS mc_err,
       | CAST(CASE WHEN mc_val > 0 AND data_n > 0
       |  THEN data_n / mc_val END AS REAL) AS ratio,
       | CAST(CASE WHEN mc_val > 0 AND data_n > 0
       |  THEN (data_n / mc_val)
       |       * sqrt(1.0 / data_n + mc_var / (mc_val * mc_val)) END
       | AS REAL) AS ratio_err,
       | CAST(CASE WHEN data_n + mc_var > 0
       |  THEN (data_n - mc_val) / sqrt(data_n + mc_var) END
       | AS REAL) AS pull
       |FROM coarse ORDER BY region, cbin""".stripMargin
  }

  // ---- s13: cutflow table ---------------------------------------------------
  // The first table every analysis prints (reference: the per-cut event
  // counts stage1 accumulates while selecting): events surviving each
  // SEQUENTIAL selection stage, with absolute and step-relative
  // efficiencies. Relational form: the cumulative cut flags are
  // conditional columns of ONE scan (c_k = c_{k-1} AND cut_k), the
  // whole flow reduces to a single wide aggregation row, and the
  // report unstacks it to (step, cut, n_pass) with a lag window over
  // the <=5-row table for the step efficiency. At 100 TB a cutflow
  // costs exactly one map-side-combined scan — never k filtered
  // re-counts (the s06 one-scan fan-out discipline).
  private def s13(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val flagged = li.select(
      expr("CASE WHEN l_quantity > 5.0 THEN 1L ELSE 0L END").as("c1"),
      expr("""CASE WHEN l_quantity > 5.0 AND l_extendedprice > 2000.0
             | THEN 1L ELSE 0L END""".stripMargin).as("c2"),
      expr("""CASE WHEN l_quantity > 5.0 AND l_extendedprice > 2000.0
             | AND abs(l_discount * 40.0 - 2.0) < 2.4
             | THEN 1L ELSE 0L END""".stripMargin).as("c3"),
      expr("""CASE WHEN l_quantity > 5.0 AND l_extendedprice > 2000.0
             | AND abs(l_discount * 40.0 - 2.0) < 2.4
             | AND l_extendedprice / 500.0 > 20.0
             | THEN 1L ELSE 0L END""".stripMargin).as("c4"))
    val wide = flagged.agg(count(lit(1)).as("n0"),
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum(col("c3")).as("n3"), sum(col("c4")).as("n4"))
    val rows = wide.selectExpr("n0",
      """stack(5, 0, 'all', n0, 1, 'quantity > 5', n1,
        | 2, 'price > 2000', n2, 3, '|eta| < 2.4', n3,
        | 4, 'pt > 20', n4) AS (step, cut, n_pass)""".stripMargin)
    val w = Window.orderBy(col("step"))
    rows
      .withColumn("n_prev", lag(col("n_pass"), 1).over(w))
      .select(col("step"), col("cut"), col("n_pass"),
        expr("CAST(CAST(n_pass AS DOUBLE) / n0 AS FLOAT)").as("abs_eff"),
        expr("""CAST(CASE WHEN n_prev IS NULL OR n_prev = 0 THEN 1.0
               | ELSE CAST(n_pass AS DOUBLE) / n_prev END AS FLOAT)"""
          .stripMargin).as("rel_eff"))
      .orderBy(col("step"))
  }
  private val s13Sql =
    """WITH wide AS (
      | SELECT COUNT(*) AS n0,
      |  CAST(SUM(CASE WHEN l_quantity > 5.0 THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n1,
      |  CAST(SUM(CASE WHEN l_quantity > 5.0 AND l_extendedprice > 2000.0
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |  CAST(SUM(CASE WHEN l_quantity > 5.0 AND l_extendedprice > 2000.0
      |   AND abs(l_discount * 40.0 - 2.0) < 2.4
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |  CAST(SUM(CASE WHEN l_quantity > 5.0 AND l_extendedprice > 2000.0
      |   AND abs(l_discount * 40.0 - 2.0) < 2.4
      |   AND l_extendedprice / 500.0 > 20.0
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n4
      | FROM lineitem),
      |rows_ AS (
      | SELECT n0, 0 AS step, 'all' AS cut, n0 AS n_pass FROM wide
      | UNION ALL SELECT n0, 1, 'quantity > 5', n1 FROM wide
      | UNION ALL SELECT n0, 2, 'price > 2000', n2 FROM wide
      | UNION ALL SELECT n0, 3, '|eta| < 2.4', n3 FROM wide
      | UNION ALL SELECT n0, 4, 'pt > 20', n4 FROM wide)
      |SELECT step, cut, n_pass,
      | CAST(CAST(n_pass AS DOUBLE) / n0 AS REAL) AS abs_eff,
      | CAST(CASE WHEN lag(n_pass) OVER (ORDER BY step) IS NULL
      |       OR lag(n_pass) OVER (ORDER BY step) = 0 THEN 1.0
      |      ELSE CAST(n_pass AS DOUBLE) / lag(n_pass) OVER (ORDER BY step)
      |      END AS REAL) AS rel_eff
      |FROM rows_ ORDER BY step""".stripMargin


  // ---- s15: plotter.py's systematic variation-band matrix -------------------
  // reference: stage3/make_templates.py:92-104 — "avoid situation where
  // different datasets have incompatible systematics": the variation set
  // used for the band is the INTERSECTION of every dataset's available
  // variations (the R6 key-set-intersection operator realized on real
  // variation columns), and stage3/plotter.py's stat/syst band
  // (plotter.py:160-170) is the per-(region, channel, bin) envelope +
  // quadrature of the surviving variations around nominal. Here the
  // datasets are the three l_returnflag populations; dataset 'N' is
  // deterministically missing the pu_* pair (the incompatible-
  // systematics situation the reference guards against), so the
  // intersection the query must COMPUTE is {nominal, jes_up, jes_down}.
  //
  // Scale shape: one lineitem scan fans out all per-dataset variations
  // as weight COLUMNS before the explode (the s06 rationale: the
  // shuffle carries |orders| rows × |variations|, never re-scans), the
  // intersection is a tiny distinct-pairs aggregate, and the band is
  // arithmetic over the histogram table — nothing in the plan grows
  // with corpus size except the first groupBy. PlotSvg.renderBand draws
  // the panel from this table; PipelineGoldenSpec pins the mark counts.
  private def s15(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val per = li.groupBy(col("l_returnflag").as("dataset"), col("l_orderkey"))
      .agg(
        count(lit(1)).as("njets"),
        sum(when(col("l_quantity") > 45.0, 1L).otherwise(0L)).as("nbtag"),
        max(col("l_extendedprice")).as("lead_price"),
        (max(col("l_discount")) * lit(40.0)).as("deta"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("ht"))
    val mass = col("ht") % lit(160.0)
    val wNom = lit(1.0) + col("ht") / lit(1.0e6)
    val jesK = (col("lead_price") % lit(5.0)) / lit(100.0)
    val puK = (col("njets") % lit(3)).cast("double") / lit(50.0)
    val labeled = per
      .withColumn("region", Selections.regionLabel(mass))
      .withColumn("channel", Selections.channelLabel(col("nbtag"),
        col("lead_price") / 100.0, col("deta"), col("lead_price") / 1000.0, col("njets")))
      .withColumn("mass", mass)
      .filter(col("region") =!= "none")
    val fanned = labeled.select(col("dataset"), col("region"), col("channel"),
        col("mass"), explode(array(
          struct(lit("nominal").as("variation"), wNom.as("w")),
          struct(lit("jes_up").as("variation"), (wNom * (lit(1.0) + jesK)).as("w")),
          struct(lit("jes_down").as("variation"), (wNom * (lit(1.0) - jesK)).as("w")),
          struct(lit("pu_up").as("variation"), (wNom * (lit(1.0) + puK)).as("w")),
          struct(lit("pu_down").as("variation"), (wNom * (lit(1.0) - puK)).as("w")))).as("v"))
      .select(col("dataset"), col("region"), col("channel"),
        col("v.variation").as("variation"), col("mass"), col("v.w").as("w"))
      // dataset 'N' ships without the pu_* variations (incompatible sets)
      .filter(!(col("dataset") === "N" && col("variation").startsWith("pu_")))
    val hist = fanned.groupBy(col("dataset"), col("region"), col("channel"),
        col("variation"), Histogrammer.bucket(col("mass"), 0.0, 160.0, 40).as("bin"))
      .agg(sum(col("w")).as("value"))
      .localCheckpoint() // feeds the intersection AND the band sums
    // R6: variations available in EVERY dataset
    val nDatasets = hist.select(col("dataset")).distinct()
      .agg(count(lit(1)).as("n_ds"))
    val common = hist.select(col("dataset"), col("variation")).distinct()
      .groupBy(col("variation")).agg(count(lit(1)).as("n_has"))
      .crossJoin(broadcast(nDatasets))
      .filter(col("n_has") === col("n_ds"))
      .select(col("variation"))
    val summed = hist.join(broadcast(common), Seq("variation"), "left_semi")
      .groupBy(col("region"), col("channel"), col("variation"), col("bin"))
      .agg(sum(col("value")).as("value"))
    summed.groupBy(col("region"), col("channel"), col("bin"))
      .agg(
        sum(when(col("variation") === "nominal", col("value"))).as("nom"),
        min(col("value")).as("env_lo"),
        max(col("value")).as("env_hi"),
        sum(when(col("variation") =!= "nominal",
          col("value") * col("value"))).as("sq"),
        sum(when(col("variation") =!= "nominal", col("value"))).as("sv"),
        count(when(col("variation") =!= "nominal", lit(1))).as("nv"))
      .select(col("region"), col("channel"), col("bin"),
        col("nom").cast("float").as("nominal"),
        col("env_lo").cast("float").as("env_lo"),
        col("env_hi").cast("float").as("env_hi"),
        // quadrature of (v - nom) over non-nominal variations, expanded
        // to moment form (Σv² − 2·nom·Σv + n·nom²) so the fold is
        // order-free given the per-variation sums; clamped at 0 — under
        // cancellation (v ≈ nom) the expanded form can round a hair
        // negative, and sqrt(NaN) vs sqrt(tiny) would let the two
        // engines' summation rounding disagree
        sqrt(greatest(col("sq") - lit(2.0) * col("nom") * col("sv")
          + col("nv") * col("nom") * col("nom"), lit(0.0)))
          .cast("float").as("band_quad"))
      .orderBy(col("region"), col("channel"), col("bin"))
  }
  private val s15Sql = {
    val b = Histogrammer.bucketSql("mass", 0.0, 160.0, 40)
    val region = RelationalQueries.regionCaseSql("(ht % 160.0)")
    s"""WITH per AS (
       | SELECT l_returnflag AS dataset, l_orderkey, COUNT(*) AS njets,
       |  SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS nbtag,
       |  MAX(l_extendedprice) AS lead_price,
       |  MAX(l_discount) * 40.0 AS deta,
       |  SUM(l_extendedprice * (1.0 - l_discount)) AS ht
       | FROM lineitem GROUP BY 1, 2),
       |labeled AS (
       | SELECT dataset, ht % 160.0 AS mass,
       |  $region AS region,
       |  CASE WHEN nbtag > 1 THEN 'ttHorVH'
       |   WHEN lead_price / 100.0 > 400.0 AND deta > 2.5 AND lead_price / 1000.0 > 35.0 THEN 'vbf'
       |   WHEN njets = 0 THEN 'ggh_0jets'
       |   WHEN njets = 1 THEN 'ggh_1jet'
       |   ELSE 'ggh_2orMoreJets' END AS channel,
       |  1.0 + ht / 1.0e6 AS wnom,
       |  (lead_price % 5.0) / 100.0 AS jesk,
       |  CAST(njets % 3 AS DOUBLE) / 50.0 AS puk
       | FROM per WHERE $region != 'none'),
       |fanned AS (
       | SELECT dataset, region, channel, mass, variation, w FROM (
       |  SELECT dataset, region, channel, mass, 'nominal' AS variation, wnom AS w FROM labeled
       |  UNION ALL SELECT dataset, region, channel, mass, 'jes_up', wnom * (1.0 + jesk) FROM labeled
       |  UNION ALL SELECT dataset, region, channel, mass, 'jes_down', wnom * (1.0 - jesk) FROM labeled
       |  UNION ALL SELECT dataset, region, channel, mass, 'pu_up', wnom * (1.0 + puk) FROM labeled
       |  UNION ALL SELECT dataset, region, channel, mass, 'pu_down', wnom * (1.0 - puk) FROM labeled)
       | WHERE NOT (dataset = 'N' AND variation LIKE 'pu_%')),
       |hist AS (
       | SELECT dataset, region, channel, variation, $b AS bin,
       |  SUM(w) AS value
       | FROM fanned GROUP BY 1, 2, 3, 4, 5),
       |common AS (
       | SELECT variation FROM (
       |  SELECT DISTINCT dataset, variation FROM hist)
       | GROUP BY variation
       | HAVING COUNT(*) = (SELECT COUNT(DISTINCT dataset) FROM hist)),
       |summed AS (
       | SELECT region, channel, variation, bin, SUM(value) AS value
       | FROM hist SEMI JOIN common USING (variation)
       | GROUP BY 1, 2, 3, 4)
       |SELECT region, channel, bin,
       | CAST(SUM(CASE WHEN variation = 'nominal' THEN value END) AS REAL) AS nominal,
       | CAST(MIN(value) AS REAL) AS env_lo,
       | CAST(MAX(value) AS REAL) AS env_hi,
       | CAST(SQRT(GREATEST(SUM(CASE WHEN variation != 'nominal' THEN value * value END)
       |   - 2.0 * SUM(CASE WHEN variation = 'nominal' THEN value END)
       |     * SUM(CASE WHEN variation != 'nominal' THEN value END)
       |   + COUNT(CASE WHEN variation != 'nominal' THEN 1 END)
       |     * SUM(CASE WHEN variation = 'nominal' THEN value END)
       |     * SUM(CASE WHEN variation = 'nominal' THEN value END), 0.0)) AS REAL) AS band_quad
       |FROM summed GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s13_cutflow" -> (s13 _),
    "s12_rebin_ratio" -> (s12 _),
    "s11_tree_scan" -> (s11 _),
    "s14_root_stage1" -> (s14 _),
    "s15_variation_band" -> (s15 _),
    "s16_runs_prescan" -> (s16 _),
    "s10_root_scan" -> (s10 _),
    "s01_stage1_pipeline" -> (s01 _),
    "s02_metadata_prescan" -> (s02 _),
    "s03_stage2_histograms" -> (s03 _),
    "s04_stage3_templates" -> (s04 _),
    "s05_unbinned_save" -> (s05 _),
    "s06_variation_fanout" -> (s06 _)
  )

  val oracle: Map[String, String] = Map(
    "s13_cutflow" -> s13Sql,
    "s12_rebin_ratio" -> s12Sql,
    "s11_tree_scan" -> s11Sql,
    "s14_root_stage1" -> s14Sql,
    "s15_variation_band" -> s15Sql,
    "s16_runs_prescan" -> s16Sql,
    "s10_root_scan" -> s10Sql,
    "s01_stage1_pipeline" -> s01Sql,
    "s02_metadata_prescan" -> s02Sql,
    "s03_stage2_histograms" -> s03Sql,
    "s04_stage3_templates" -> s04Sql,
    "s05_unbinned_save" -> s05Sql,
    "s06_variation_fanout" -> s06Sql
  )
}
