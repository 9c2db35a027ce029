package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 additions: graph analytics,
  * retrieval fusion/eval, time-series resampling, and classifier
  * evaluation. The DuckDB gate proves cross-engine equality; these
  * tests prove the MATH means what the operator claims (rank mass
  * conservation, metric bounds, OHLC ordering, monotone recall). */
class GraphEvalSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("g05: PageRank mass is conserved up to fixed-point truncation") {
    val pr = GraphQueries.queries("g05_pagerank")(spark, dir)
    val agg = pr.agg(sum("prm").as("mass"), min("prm").as("mn")).collect()(0)
    val mass = agg.getLong(0)
    // truncation only loses mass; 3 rounds of floor() stay within 15%
    assert(mass <= 1000000L, s"mass $mass exceeds 1.0")
    assert(mass >= 850000L, s"mass $mass lost too much to truncation")
    assert(agg.getLong(1) > 0L, "every node keeps positive rank")
  }

  test("g06: triangle report is internally consistent") {
    val t = GraphQueries.queries("g06_triangle_count")(spark, dir).collect()
    assert(t.nonEmpty)
    val total = t.head.getAs[Long]("n_triangles")
    assert(t.forall(_.getAs[Long]("n_triangles") == total))
    assert(t.forall(_.getAs[Long]("n_tri") > 0L))
    // per-node counts are sorted by the rank column
    val byRank = t.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("n_tri"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("g10: HITS scores are normalized to [0, 1] with the max at 1") {
    val r = GraphQueries.queries("g10_hits")(spark, dir).collect()
    val auths = r.map(_.getAs[Long]("auth_m"))
    val hubs = r.map(_.getAs[Long]("hub_m"))
    assert(auths.max == 1000000L && hubs.max == 1000000L,
      "L-inf normalization must pin the max score to 1.0")
    assert(auths.forall(a => a >= 0L && a <= 1000000L))
    assert(hubs.forall(h => h >= 0L && h <= 1000000L))
    // bipartite-ish src->hub graph: some node must be hub-only (auth 0)
    assert(auths.contains(0L) || hubs.contains(0L),
      "expected at least one single-role node on the directed graph")
  }

  test("v11: MIPS ranking is by raw dot, descending per query") {
    val r = SimilarityQueries.queries("v11_mips_lsh")(spark, dir).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val dots = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Float]("dot"))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b },
        "dots not descending in rank")
    }
  }

  test("g09: label propagation yields valid communities") {
    val lp = GraphQueries.queries("g09_label_propagation")(spark, dir)
    val rows = lp.collect()
    val nodes = rows.map(_.getAs[Long]("node")).toSet
    // every label is a real node id (labels only ever copy node ids)
    val labels = rows.map(_.getAs[Long]("label")).toSet
    assert(labels.subsetOf(nodes), s"labels not node ids: ${labels -- nodes}")
    // community sizes are consistent: size column = actual member count
    val bySize = rows.groupBy(_.getAs[Long]("label")).map { case (l, rs) =>
      l -> (rs.length.toLong, rs.map(_.getAs[Long]("community_size")).toSet)
    }
    bySize.foreach { case (l, (n, sizes)) =>
      assert(sizes == Set(n), s"community $l: reported $sizes vs actual $n")
    }
    // propagation coarsens: fewer (or equal) communities than nodes
    assert(labels.size <= nodes.size)
  }

  test("w08: Dirichlet QL scores are negative log-likelihoods, ranked") {
    val ql = SearchQueries.queries("w08_ql_dirichlet")(spark, dir).collect()
    assert(ql.nonEmpty && ql.length <= 50)
    // each score is a sum of ln(p), p in (0,1) -> strictly negative
    assert(ql.forall(_.getAs[Float]("score") < 0.0f), "QL score must be < 0")
    // rank order agrees with score order (desc)
    val scores = ql.sortBy(_.getAs[Int]("rank")).map(_.getAs[Float]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending in rank")
  }

  test("m16: Murphy decomposition reassembles the Brier score") {
    val r = MLQueries.queries("m16_brier_decomposition")(spark, dir).collect()(0)
    val (brier, rel, res, unc) = (r.getAs[Float]("brier"),
      r.getAs[Float]("reliability"), r.getAs[Float]("resolution"),
      r.getAs[Float]("uncertainty"))
    assert(math.abs(brier - (rel - res + unc)) < 1e-4f,
      s"identity broken: $brier vs $rel - $res + $unc")
    assert(brier >= 0f && brier <= 1f && rel >= 0f && res >= 0f &&
      unc >= 0f && unc <= 0.25f)
  }

  test("m14: isotonic fit is monotone and within the observed range") {
    val iso = MLQueries.queries("m14_isotonic_calibration")(spark, dir)
      .orderBy(col("bin")).collect()
    val fits = iso.map(_.getAs[Float]("iso_fit"))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b },
      s"isotonic fit not monotone: ${fits.mkString(",")}")
    val fracs = iso.map(_.getAs[Float]("frac_pos"))
    assert(fits.forall(f => f >= fracs.min && f <= fracs.max),
      "fit outside the observed positive-fraction range")
  }

  test("w05: NDCG is bounded and idcg dominates dcg") {
    val r = SearchQueries.queries("w05_ndcg_eval")(spark, dir).collect()
    assert(r.length == 3)
    r.foreach { row =>
      val ndcg = row.getAs[Float]("ndcg")
      assert(ndcg >= 0.0f && ndcg <= 1.0f, s"ndcg out of range: $ndcg")
      assert(row.getAs[Long]("idcg_micro") >= row.getAs[Long]("dcg_micro"))
    }
  }

  test("w04: fused list only contains docs from at least one retriever") {
    val r = SearchQueries.queries("w04_rrf_fusion")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Int]("bm_rank") > 0 || row.getAs[Int]("cos_rank") > 0)
      assert(row.getAs[Double]("rrf") > 0.0)
    }
  }

  test("m06: recall is monotone non-increasing in the threshold") {
    val r = MLQueries.queries("m06_threshold_sweep")(spark, dir)
      .orderBy("thr").collect()
    assert(r.length == 9)
    val recalls = r.map(_.getAs[Float]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    val n = r.map(x => x.getAs[Long]("tp") + x.getAs[Long]("fp") +
      x.getAs[Long]("fn") + x.getAs[Long]("tn")).distinct
    assert(n.length == 1, "confusion quadrants must sum to corpus size")
  }

  test("m07: AUC lies in [0, 1] and beats coin-flip on the biased score") {
    val row = MLQueries.queries("m07_auc_exact")(spark, dir).collect()(0)
    val auc = row.getAs[Float]("auc")
    assert(auc >= 0.0f && auc <= 1.0f)
    // the score has a +0.35 prior on the positive class
    assert(auc > 0.5f, s"expected informative score, got auc=$auc")
  }

  test("u07: OHLC bars order low <= open/close <= high") {
    val r = TemporalQueries.queries("u07_resample_ohlc")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { b =>
      val (o, h, l, c) = (b.getAs[Double]("open"), b.getAs[Double]("high"),
        b.getAs[Double]("low"), b.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("u06: gap days carry zero events and inherit the last filled value") {
    val df = TemporalQueries.queries("u06_gap_fill")(spark, dir)
    val gaps = df.filter(col("is_gap"))
    assert(gaps.filter(col("n_events") =!= 0L).count() == 0L)
    // the spine is dense: per user, rows == max(day) - min(day) + 1
    val spans = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("day") - min("day") + 1L).as("span"))
    assert(spans.filter(col("n") =!= col("span")).count() == 0L)
  }

  test("g13: classified SCCs are genuinely strongly connected classes") {
    // sf0.01: the gate-scale graph (857 edges over 150 nodes) — dense
    // enough to carry a non-trivial SCC; sf0.001's 83-edge graph is a DAG
    val d01 = sf("sf0.01")
    val r = GraphQueries.queries("g13_scc")(spark, d01).collect()
    assert(r.nonEmpty)
    // rebuild the (tiny, <=150-node) directed graph driver-side and check
    // mutual reachability inside every classified class by Floyd-Warshall
    val edges = spark.read.parquet(s"$d01/events.parquet")
      .filter(col("value") < 8.0)
      .select(col("user_id").as("src"),
        ((col("user_id") * 31 + expr("CAST(FLOOR(value) AS BIGINT)")) % 150)
          .as("dst"))
      .filter(col("src") =!= col("dst")).distinct().collect()
      .map(e => (e.getLong(0), e.getLong(1))).toSet
    val nodes = r.map(_.getAs[Long]("node"))
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (s, d) => reach(idx(s))(idx(d)) = true }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k); j <- 0 until n)
      if (reach(k)(j)) reach(i)(j) = true
    val byScc = r.filter(_.getAs[Long]("scc_id") >= 0L)
      .groupBy(_.getAs[Long]("scc_id"))
    byScc.foreach { case (sid, members) =>
      // the owner is a member of its own class
      assert(members.exists(_.getAs[Long]("node") == sid),
        s"scc $sid lacks its owner")
      // size column is the actual member count
      assert(members.forall(_.getAs[Long]("scc_size") == members.length.toLong))
      // every pair is mutually reachable (soundness of the FW-BW classify)
      val ids = members.map(m => idx(m.getAs[Long]("node")))
      for (a <- ids; b <- ids if a != b)
        assert(reach(a)(b) && reach(b)(a),
          s"scc $sid members not mutually reachable")
    }
    // at least one non-trivial SCC exists on this cycle-rich graph
    assert(byScc.exists(_._2.length >= 2), "expected a multi-node SCC")
    // completeness at gate scale: no node is left unclassified (-1)
    assert(r.forall(_.getAs[Long]("scc_id") >= 0L),
      "gate-scale graph must classify fully within the fixed schedule")
  }

  test("g05: iterations run off the checkpointed edge table, not the scan") {
    val pr = GraphQueries.queries("g05_pagerank")(spark, dir)
    val plan = pr.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      "final PageRank plan should iterate over checkpointed edges, " +
        "not rescan lineitem")
  }
}
