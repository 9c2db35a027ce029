package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-7 additions (the GraphEvalSpec /
  * Round6EvalSpec convention): the DuckDB gate proves cross-engine
  * equality; these prove the MATH means what each operator claims —
  * modularity bounds and trajectory, calibration monotonicity,
  * perplexity-bucket ordering, F-cascade consistency, seasonal-index
  * centering, Heaps-curve monotonicity, constellation recall. Most run
  * at sf0.001; x11/m24 use sf0.01 where the tiny corpus is degenerate. */
class Round7EvalSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private val d01 = sf("sf0.01")

  test("g14: modularity trajectory is bounded and LPA only coarsens") {
    val r = GraphQueries.queries("g14_modularity")(spark, d01)
      .orderBy(col("round")).collect()
    assert(r.length == 4)
    // Q in [-1, 1] by definition (micro-quantized)
    r.foreach { row =>
      val q = row.getAs[Long]("q_total_micro")
      assert(q >= -1000000L && q <= 1000000L, s"Q out of range: $q")
    }
    // the singleton partition has zero internal edges -> Q < 0
    assert(r.head.getAs[Long]("q_total_micro") < 0L,
      "singleton partition must score negative modularity")
    // community count is non-increasing (synchronous LPA only merges
    // on this graph; the deterministic min-label tie-break never splits)
    val ns = r.map(_.getAs[Long]("n_comm"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"community count must not grow: ${ns.mkString(",")}")
  }

  test("m24: Platt fit is monotone in the score and brackets the data") {
    val r = MLQueries.queries("m24_platt_calibration")(spark, d01)
      .orderBy(col("bin")).collect()
    assert(r.nonEmpty)
    val ps = r.map(_.getAs[Float]("p_cal"))
    assert(ps.forall(p => p >= 0.0f && p <= 1.0f))
    // higher score bin -> higher calibrated probability (A < 0)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      s"calibrated curve not monotone: ${ps.mkString(",")}")
    assert(r.head.getAs[Float]("a_hat") < 0.0f,
      "slope must be negative for a positively-informative score")
    // the sigmoid separates the en prior: top bin well above bottom bin
    assert(ps.last - ps.head > 0.2f, "calibration curve is too flat")
  }

  test("t35: bucket labels order by score and cover the corpus") {
    val r = CurationQueries.queries("t35_ppl_buckets")(spark, dir).collect()
    assert(r.nonEmpty)
    val byB = r.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Float]("avg_logp"))).toMap
    assert(byB.keySet.subsetOf(Set("head", "middle", "tail")))
    // every head doc scores >= every tail doc (terciles are cuts)
    for (h <- byB.get("head"); t <- byB.get("tail"))
      assert(h.min >= t.max, "head/tail buckets overlap in score")
    // terciles: no bucket holds more than ~2/3 of the corpus
    assert(byB.values.forall(_.length <= (r.length * 2) / 3 + 1))
  }

  test("f06: selection agrees with the acceptance cascade") {
    val rows = FitQueries.queries("f06_ftest_selection")(spark, dir).collect()
    assert(rows.length == 5) // one per o_orderpriority channel
    rows.foreach { row =>
      val (a1, a2) = (row.getAs[Int]("acc1"), row.getAs[Int]("acc2"))
      val sel = row.getAs[String]("selected")
      val expect =
        if (a1 == 0) "const0" else if (a2 == 0) "bernstein1" else "chebyshev2"
      assert(sel == expect, s"cascade broken: acc=($a1,$a2) sel=$sel")
      // adding parameters never worsens a least-squares chi2
      assert(row.getAs[Float]("chi2_lin") <= row.getAs[Float]("chi2_const"))
      assert(row.getAs[Float]("chi2_quad") <= row.getAs[Float]("chi2_lin") + 1e-3f)
    }
  }

  test("u24: seasonal indices center to ~zero per type, RMS non-negative") {
    val r = TemporalQueries.queries("u24_seasonal_decomp")(spark, dir).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[String]("event_type")).foreach { case (et, rows) =>
      assert(rows.length <= 7, s"$et has more than 7 day-of-week rows")
      // centering: sum of milli indices within half a milli per dow row
      val s = rows.map(_.getAs[Long]("seasonal_milli")).sum
      assert(math.abs(s) <= rows.length.toLong,
        s"$et seasonal indices not centered: sum=$s")
      assert(rows.forall(_.getAs[Float]("resid_rms") >= 0.0f))
    }
  }

  test("t36: Heaps curve is monotone and the fit is sublinear") {
    val r = TextQueries.queries("t36_heaps_law")(spark, dir)
      .orderBy(col("f")).collect()
    assert(r.length == 10)
    val toks = r.map(_.getAs[Long]("n_tokens"))
    val voc = r.map(_.getAs[Long]("vocab"))
    // nested subsets: both curves strictly non-decreasing
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    assert(voc.zip(voc.tail).forall { case (a, b) => a <= b })
    // vocabulary grows sublinearly in corpus size: 0 < beta < 1
    val beta = r.head.getAs[Float]("beta")
    assert(beta > 0.0f && beta < 1.0f, s"Heaps beta out of range: $beta")
    assert(r.head.getAs[Float]("k") > 0.0f)
  }

  test("x11: constellation matching identifies the source track") {
    val r = MultimodalQueries.queries("x11_constellation_match")(spark, d01)
      .collect()
    assert(r.nonEmpty)
    val self = r.count(_.getAs[Int]("is_self") == 1)
    // recall: the clip IS its track minus two frames — the hash-join
    // vote must recover the source for the overwhelming majority
    assert(self.toDouble / r.length > 0.8,
      s"constellation recall too low: $self/${r.length}")
    // every correct match recovers the true 2-frame offset
    r.filter(_.getAs[Int]("is_self") == 1).foreach { row =>
      assert(row.getAs[Long]("t_offset") == 2L,
        s"self-match at wrong offset: ${row.getAs[Long]("t_offset")}")
    }
  }

  test("w12: varint accounting compresses and the total row reconciles") {
    val r = SearchQueries.queries("w12_postings_varint")(spark, dir).collect()
    val (total, terms) = r.partition(_.getAs[String]("term") == "*")
    assert(total.length == 1 && terms.nonEmpty)
    // gap coding never exceeds the raw 8-byte-per-id layout
    terms.foreach { t =>
      assert(t.getAs[Long]("vb_bytes") <= t.getAs[Long]("raw_bytes"))
      assert(t.getAs[Long]("vb_bytes") >= t.getAs[Long]("df"),
        "varint needs at least one byte per posting")
    }
    // the '*' row is the exact column sum of the term rows
    assert(total.head.getAs[Long]("vb_bytes") ==
      terms.map(_.getAs[Long]("vb_bytes")).sum)
    assert(total.head.getAs[Long]("df") == terms.map(_.getAs[Long]("df")).sum)
    // frequent terms (dense postings, small gaps) must compress > 2x
    assert(total.head.getAs[Float]("ratio") > 2.0f,
      s"corpus ratio ${total.head.getAs[Float]("ratio")} suspiciously low")
  }

  test("a33: Benford screen — fractions normalize, MAD matches deviations") {
    val r = MiscQueries.queries("a33_benford_digits")(spark, dir).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[String]("ch")).foreach { case (ch, rows) =>
      assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
      val fr = rows.map(_.getAs[Float]("frac").toDouble).sum
      assert(math.abs(fr - 1.0) < 1e-4, s"$ch fractions sum to $fr")
      // MAD column = mean of the per-digit deviations (integer div by 9)
      val mad = rows.head.getAs[Long]("mad_micro")
      assert(mad == rows.map(_.getAs[Long]("dev_micro")).sum / 9,
        s"$ch MAD does not reconcile")
      assert(rows.forall(_.getAs[Long]("mad_micro") == mad))
    }
    // expectation column really is Benford: digit 1 ~ 30.1%
    val d1 = r.find(_.getAs[Long]("digit") == 1L).get.getAs[Float]("expected")
    assert(math.abs(d1 - 0.30103f) < 1e-5f)
  }

  test("v13: filtered ANN — post-filter is a strict subset and loses recall") {
    val r = SimilarityQueries.queries("v13_filtered_ann")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (pool, nPost, hits) = (row.getAs[Long]("n_pool"),
        row.getAs[Long]("n_post"), row.getAs[Long]("hits"))
      assert(hits <= nPost && nPost <= 10L, s"hits $hits post $nPost")
      assert(hits <= math.min(10L, pool))
      assert(row.getAs[Long]("recall_micro") ==
        math.floor(1e6 * hits / math.min(10L, pool)).toLong)
    }
    // the point of the operator: post-filtering a ~10%-selective
    // predicate cannot reach pre-filter recall on every query
    assert(r.map(_.getAs[Long]("recall_micro")).min < 1000000L,
      "post-filter recall suspiciously perfect")
  }

  test("m25: bootstrap interval brackets the point estimate sanely") {
    val r = MLQueries.queries("m25_poisson_bootstrap")(spark, dir).collect()(0)
    val (pt, lo, hi) = (r.getAs[Float]("point_mean"),
      r.getAs[Float]("ci_lo"), r.getAs[Float]("ci_hi"))
    assert(lo <= hi, s"interval inverted: [$lo, $hi]")
    assert(pt >= lo && pt <= hi, s"point $pt outside [$lo, $hi]")
    assert(r.getAs[Long]("n_replicas") == 32L)
    // CI width ~ 2*1.96*sd/sqrt(n): positive but far under the mean
    assert(hi - lo > 0.0f, "degenerate zero-width interval")
    assert((hi - lo) / pt < 0.5f, s"implausibly wide interval [$lo, $hi]")
  }

  test("u25: KM curves are proper survival functions per stratum") {
    val rows = TemporalQueries.queries("u25_kaplan_meier")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("channel")).foreach { case (ch, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("duration_day"))
      val surv = sorted.map(_.getAs[Float]("survival"))
      assert(surv.forall(v => v >= 0.0f && v <= 1.0f), s"$ch: S outside [0,1]")
      assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-7f },
        s"$ch: survival increased")
      val risk = sorted.map(_.getAs[Long]("n_at_risk"))
      assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
        s"$ch: at-risk grew over time")
      // every step has deaths by construction; the first step must drop S
      assert(surv.head < 1.0f, s"$ch: first event step left S at 1")
      assert(sorted.forall(_.getAs[Float]("greenwood_se") >= 0.0f))
    }
  }

  test("g15: AA candidates are ranked, positive, and non-adjacent") {
    val rows = GraphQueries.queries("g15_adamic_adar")(spark, d01).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("u")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length).toSeq, s"u=$u: ranks not contiguous")
      val sc = sorted.map(_.getAs[Long]("aa_micro"))
      assert(sc.zip(sc.tail).forall { case (a, b) => b <= a },
        s"u=$u: scores not non-increasing")
      assert(sc.forall(_ > 0L))
      assert(sorted.forall(r => r.getAs[Long]("n_common") >= 1L))
      assert(sorted.forall(r => r.getAs[Long]("v") > u),
        s"u=$u: pair not oriented u < v")
    }
  }

  test("m26: CUPED reduces variance and preserves the contrast scale") {
    val r = MLQueries.queries("m26_cuped_abtest")(spark, d01).collect()(0)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    // parity split: arms within 10% of each other
    val (na, nb) = (r.getAs[Long]("n_a").toDouble, r.getAs[Long]("n_b").toDouble)
    assert(math.abs(na - nb) / (na + nb) < 0.1, s"arm imbalance $na/$nb")
    // the point of CUPED: strictly positive variance reduction when the
    // pre-period covariate is informative (same users, same behavior)
    val vr = r.getAs[Float]("var_reduction_pct")
    assert(vr > 0.0f && vr < 100.0f, s"variance reduction $vr out of range")
    // z-stats are finite and the adjusted SE is tighter, so a genuine
    // null-ish contrast cannot EXPLODE under CUPED
    assert(!r.getAs[Float]("z_raw").isNaN && !r.getAs[Float]("z_cuped").isNaN)
  }

  test("m27: always-valid p is a running min over a growing sample") {
    val rows = MLQueries.queries("m27_msprt_monitor")(spark, d01)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Float]("p_always_valid"))
    assert(ps.forall(p => p > 0.0f && p <= 1.0f))
    // the defining property: the always-valid p never goes back up
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-7f },
      s"always-valid p increased: ${ps.mkString(",")}")
    val na = rows.map(_.getAs[Long]("n_a"))
    assert(na.zip(na.tail).forall { case (a, b) => b >= a })
    // significance flag is exactly the p < .05 threshold
    rows.foreach { r =>
      val sig = r.getAs[Int]("significant") == 1
      assert(sig == (r.getAs[Float]("p_always_valid") < 0.05f),
        "significant flag inconsistent with p")
    }
  }

  test("x12: shots tile every doc's frame range exactly") {
    val rows = MultimodalQueries.queries("x12_shot_boundaries")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val shots = rs.sortBy(_.getAs[Long]("shot_id"))
      assert(shots.head.getAs[Long]("start_frame") == 0L,
        s"doc $id: first shot does not start at frame 0")
      shots.foreach { sh =>
        assert(sh.getAs[Long]("n_frames") ==
          sh.getAs[Long]("end_frame") - sh.getAs[Long]("start_frame") + 1,
          s"doc $id: shot has frame gaps")
      }
      shots.zip(shots.tail).foreach { case (a, b) =>
        assert(b.getAs[Long]("start_frame") == a.getAs[Long]("end_frame") + 1,
          s"doc $id: shots overlap or leave a gap")
      }
    }
  }

  test("w13: completions extend their prefix and rank by frequency") {
    val rows = SearchQueries.queries("w13_autocomplete")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, t) = (r.getAs[String]("prefix"), r.getAs[String]("term"))
      assert(t.startsWith(p) && t.length > p.length,
        s"'$t' does not complete '$p'")
    }
    rows.groupBy(_.getAs[String]("prefix")).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length).toSeq, s"$p: ranks not contiguous")
      val fs = sorted.map(_.getAs[Long]("freq"))
      assert(fs.zip(fs.tail).forall { case (a, b) => b <= a },
        s"$p: completions not frequency-sorted")
      assert(sorted.head.getAs[Long]("support") >= fs.sum,
        s"$p: support below the shown completions' mass")
    }
  }

  test("m28: conformal intervals hit their nominal coverage out of fold") {
    val rows = MLQueries.queries("m28_conformal")(spark, d01).collect()
    assert(rows.nonEmpty)
    val (cov, n) = (
      rows.map(r => r.getAs[Long]("n_covered")).sum.toDouble,
      rows.map(r => r.getAs[Long]("n_test")).sum.toDouble)
    // the split-conformal guarantee is >= 90% marginal coverage; allow
    // binomial slack on the held-out fold, and catch a trivially-wide
    // interval (coverage ~ 1.0 means q is broken)
    assert(cov / n > 0.85 && cov / n < 0.97,
      s"marginal coverage ${cov / n} far from nominal 0.90")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test"))
      assert(r.getAs[Float]("half_width") > 0.0f)
    }
  }

  test("j21: every query gets exactly k neighbors in distance order") {
    val rows = MiscQueries.queries("j21_knn_join")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("a_id")).foreach { case (a, rs) =>
      assert(rs.length == 3, s"query $a has ${rs.length} neighbors")
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
      val ds = sorted.map(_.getAs[Float]("dist_km"))
      assert(ds.zip(ds.tail).forall { case (x, y) => y >= x },
        s"query $a: neighbor distances out of order")
      assert(sorted.forall(_.getAs[Long]("b_id") != a), "self as neighbor")
    }
  }

  test("k10: every sketch quantile honors the DDSketch error contract") {
    val rows = SearchQueries.queries("k10_sketch_audit")(spark, dir).collect()
    assert(rows.length == 9) // 3 flags x 3 quantiles
    rows.foreach { r =>
      val (lb, ex) = (r.getAs[Long]("sketch_lb"), r.getAs[Long]("exact_q"))
      assert(lb <= ex, s"sketch overestimated: $lb > $ex")
      val bp = r.getAs[Long]("rel_err_bp")
      assert(bp >= 0 && bp <= 1112, s"rel err $bp bp outside the 1/9 bound")
      assert(r.getAs[Int]("within_bound") == 1)
    }
  }

  test("m29: the Newton boosting step decreases the training loss") {
    val rows = MLQueries.queries("m29_boost_step")(spark, d01)
      .orderBy(col("leaf")).collect()
    assert(rows.length == 4)
    val (before, after) = (rows.head.getAs[Float]("logloss_before"),
      rows.head.getAs[Float]("logloss_after"))
    assert(after < before, s"boosting round raised loss: $before -> $after")
    rows.foreach { r =>
      // w = -G/(H+lambda): sign opposite the gradient sum
      val (g, w) = (r.getAs[Long]("gsum"), r.getAs[Float]("leaf_weight"))
      assert(g == 0L || (g > 0) != (w > 0), s"leaf weight not anti-gradient")
      assert(r.getAs[Long]("hsum") > 0L, "hessian sum must be positive")
    }
  }

  test("s12: rebinning conserves the data count and bounds the bins") {
    val rows = StageQueries.queries("s12_rebin_ratio")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nData = spark.read.parquet(s"$dir/orders.parquet")
      .filter(expr("o_orderkey % 3 = 0")).count()
    assert(rows.map(_.getAs[Long]("data_n")).sum == nData,
      "rebinned data counts do not sum to the corpus data population")
    rows.foreach { r =>
      val cb = r.getAs[Long]("cbin")
      assert(cb >= 0 && cb <= 9, s"coarse bin $cb outside 0..9")
      val ratio = r.getAs[Float]("ratio")
      if (!r.isNullAt(r.fieldIndex("ratio")))
        assert(ratio > 0.0f && !ratio.isNaN)
      if (!r.isNullAt(r.fieldIndex("pull")))
        assert(!r.getAs[Float]("pull").isNaN)
    }
  }

  test("m30: the GBDT loop's loss trajectory is monotone non-increasing") {
    val rows = MLQueries.queries("m30_gbdt_loop")(spark, d01)
      .orderBy(col("round")).collect()
    assert(rows.length == 4) // round 0 baseline + 3 boosting rounds
    val ls = rows.map(_.getAs[Float]("logloss"))
    assert(ls.zip(ls.tail).forall { case (a, b) => b <= a + 1e-6f },
      s"loss went up within the loop: ${ls.mkString(",")}")
    assert(ls.last < ls.head, "three rounds should strictly improve the fit")
  }

  test("w14: every typo resolves to a near-miss vocabulary word") {
    val rows = SearchQueries.queries("w14_spell_correct")(spark, dir).collect()
    assert(rows.nonEmpty)
    val typos = rows.map(_.getAs[String]("typo")).distinct
    assert(typos.length == 10, s"only ${typos.length}/10 probes corrected")
    rows.foreach { r =>
      assert(r.getAs[Int]("dist") <= 1)
      assert(r.getAs[String]("correction") != r.getAs[String]("typo") ||
        r.getAs[Int]("dist") == 0)
      assert(r.getAs[Long]("score") ==
        r.getAs[Long]("freq") * (if (r.getAs[Int]("dist") == 0) 100L else 10L))
    }
    rows.groupBy(_.getAs[String]("typo")).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.head.getAs[Int]("rank") == 1, s"$t: no rank-1 correction")
      val sc = sorted.map(_.getAs[Long]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => b <= a })
    }
  }

  test("t39: confusion matrix reconciles and NB collapses to the prior") {
    val rows = TextQueries.queries("t39_nb_confusion")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nTest = rows.head.getAs[Long]("n_test")
    assert(rows.map(_.getAs[Long]("n")).sum == nTest,
      "confusion cells do not sum to the test-set size")
    val diag = rows.filter(r =>
      r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n")).sum
    val acc = rows.head.getAs[Float]("accuracy")
    assert(math.abs(acc - diag.toDouble / nTest) < 1e-6,
      "accuracy column does not reconcile with the diagonal")
    // lang is independent of the word-soup text, so the fitted model
    // must lean on the prior: the modal predicted class dominates
    val byPred = rows.groupBy(_.getAs[String]("pred_lang"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(byPred.values.max.toDouble / nTest > 0.5,
      s"expected prior collapse, got prediction spread $byPred")
  }

  test("v14: purity and NMI are proper, reconciled cluster metrics") {
    val rows = SimilarityQueries.queries("v14_cluster_purity")(spark, dir)
      .collect()
    assert(rows.length == 8) // one row per IVF cell
    val n = rows.map(_.getAs[Long]("n_c")).sum
    val pureN = rows.map(_.getAs[Long]("majority_n")).sum
    val purity = rows.head.getAs[Float]("purity")
    assert(math.abs(purity - pureN.toDouble / n) < 1e-6,
      "purity does not reconcile with the majority counts")
    // majority never exceeds the cell and purity beats the trivial bound
    rows.foreach { r =>
      assert(r.getAs[Long]("majority_n") <= r.getAs[Long]("n_c"))
    }
    val nmi = rows.head.getAs[Float]("nmi")
    assert(nmi >= -0.01f && nmi <= 1.0f, s"NMI $nmi outside [0, 1]")
    assert(purity > 0.0f && purity <= 1.0f)
  }

  test("u26: Theil-Sen pairs count C(days,2) and the fit is finite") {
    val rows = TemporalQueries.queries("u26_theil_sen")(spark, dir).collect()
    assert(rows.nonEmpty)
    val days = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", // raw read: ts is TIMESTAMP, not the rd() nanos long
        s"(unix_micros(CAST(ts AS TIMESTAMP)) * 1000) div ${86400L * 1000 * 1000 * 1000} AS day")
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val nd = days(et)
      assert(r.getAs[Long]("n_pairs") == nd * (nd - 1) / 2,
        s"$et: pair count is not C($nd, 2)")
      assert(!r.getAs[Float]("ts_slope").isNaN)
      assert(!r.getAs[Float]("ts_intercept").isNaN)
    }
  }

  test("s13: cutflow is monotone and efficiencies reconcile") {
    val rows = StageQueries.queries("s13_cutflow")(spark, dir)
      .orderBy(col("step")).collect()
    assert(rows.length == 5)
    val ns = rows.map(_.getAs[Long]("n_pass"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"sequential cuts must only remove events: ${ns.mkString(",")}")
    val n0 = ns.head
    rows.foreach { r =>
      assert(math.abs(r.getAs[Float]("abs_eff") -
        r.getAs[Long]("n_pass").toDouble / n0) < 1e-6)
    }
    // product of step efficiencies equals the final absolute efficiency
    val relProd = rows.map(_.getAs[Float]("rel_eff").toDouble).product
    assert(math.abs(relProd - rows.last.getAs[Float]("abs_eff")) < 1e-5,
      "step efficiencies do not chain to the absolute efficiency")
  }

  test("m31: 2U matches a brute-force pair count on the small corpus") {
    val r = MLQueries.queries("m31_mannwhitney")(spark, dir).collect()(0)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm")
      .collect()
    val a = ev.filter(_.getAs[String]("event_type") == "purchase")
      .map(_.getAs[Long]("vm"))
    val b = ev.filter(_.getAs[String]("event_type") == "click")
      .map(_.getAs[Long]("vm"))
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    val twoU = (for (x <- a; y <- b)
      yield if (x > y) 2L else if (x == y) 1L else 0L).sum
    assert(r.getAs[Long]("two_u") == twoU,
      s"2U ${r.getAs[Long]("two_u")} != brute-force $twoU")
    assert(!r.getAs[Float]("z_stat").isNaN)
  }

  test("m32: the learning curve decays and the fitted exponent is negative") {
    val rows = MLQueries.queries("m32_scaling_law")(spark, d01)
      .orderBy(col("f")).collect()
    assert(rows.length == 8)
    val ns = rows.map(_.getAs[Long]("n_train"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b > a },
      "nested subsets must strictly grow")
    val mse = rows.map(_.getAs[Float]("test_mse"))
    // more data never hurts a capacity-limited estimator (1% slack for
    // per-step sampling noise)
    assert(mse.zip(mse.tail).forall { case (a, b) => b <= a * 1.01f },
      s"test error rose along the curve: ${mse.mkString(",")}")
    assert(mse.last < mse.head, "no overall improvement across 8x data")
    assert(rows.head.getAs[Float]("decay_alpha") < 0.0f,
      "fitted power-law exponent must be negative")
  }

  test("x13: both loudness gates only remove blocks and stay consistent") {
    val rows = MultimodalQueries.queries("x13_loudness")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, na, nr) = (r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_abs_gated"), r.getAs[Long]("n_rel_gated"))
      assert(nr >= 1 && nr <= na && na <= nb,
        s"gate chain violated: $nr <= $na <= $nb")
      val l = r.getAs[Float]("loudness_db")
      assert(!l.isNaN && !l.isInfinite)
    }
    // the relative gate must actually do work somewhere in the corpus
    assert(rows.map(r => r.getAs[Long]("n_abs_gated") -
      r.getAs[Long]("n_rel_gated")).sum > 0,
      "relative gate removed nothing corpus-wide")
  }

  test("k11: shard sketches merge to exactly the corpus sketch") {
    val r = SearchQueries.queries("k11_qsketch_merge")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_mismatch") == 0L,
      s"${r.getAs[Long]("n_mismatch")} bucket(s) differ after merge")
    assert(r.getAs[Long]("p50_merged") == r.getAs[Long]("p50_direct"))
    assert(r.getAs[Long]("p90_merged") == r.getAs[Long]("p90_direct"))
    assert(r.getAs[Long]("n_buckets") > 0)
  }

  test("g16: assortativity is a bounded correlation over directed edges") {
    val r = GraphQueries.queries("g16_assortativity")(spark, d01).collect()(0)
    val a = r.getAs[Float]("assortativity")
    assert(a >= -1.0f && a <= 1.0f, s"r=$a outside [-1, 1]")
    // symmetrized edge list: directed count must be even
    assert(r.getAs[Long]("n_dir_edges") % 2 == 0)
    assert(r.getAs[Long]("n_dir_edges") > 0)
  }

  test("m33: ablation importances rank features and discriminate") {
    val rows = MLQueries.queries("m33_ablation_importance")(spark, d01)
      .orderBy(col("rank")).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
    val ds = rows.map(_.getAs[Float]("mean_abs_delta"))
    assert(ds.forall(_ >= 0.0f))
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a },
      "importances not sorted by rank")
    // the trees USE their split features: ablation must discriminate
    assert(ds.head > 5 * math.max(ds.last, 1e-6f).toFloat,
      s"importances suspiciously flat: ${ds.mkString(",")}")
  }

  test("d25: empirical band-gate recall tracks the closed form") {
    val r = DedupQueries.queries("d25_lsh_recall_eval")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_caught") <= row.getAs[Long]("n_truth"))
      val (emp, theory) = (row.getAs[Long]("recall_micro"),
        row.getAs[Long]("theory_micro"))
      assert(emp >= 0L && emp <= 1000000L)
      // 12 single-row bands at j >= 0.25: theory says >= 96%; the
      // empirical decile must not collapse far below it (small-sample
      // slack — deciles can hold a handful of pairs at sf0.001)
      assert(emp + 200000L >= theory,
        s"decile ${row.getAs[Long]("jd")}: recall $emp way under theory $theory")
    }
  }

  test("r17: FIFO matching conserves quantity exactly") {
    val r = RelationalQueries.queries("r17_fifo_lots")(spark, dir).collect()
      .map(x => x.getAs[Long]("pk") ->
        (x.getAs[Long]("n_splits"), x.getAs[Long]("matched_qty"))).toMap
    assert(r.nonEmpty)
    // ground truth: matched qty per part == min(total supply, total demand)
    val totals = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag").isin("N", "R"))
      .groupBy(col("l_partkey"))
      .agg(
        sum(when(col("l_returnflag") === "N",
          expr("CAST(l_quantity AS BIGINT)")).otherwise(0L)).as("sup"),
        sum(when(col("l_returnflag") === "R",
          expr("CAST(l_quantity AS BIGINT)")).otherwise(0L)).as("dem"))
      .collect()
    totals.foreach { t =>
      val pk = t.getAs[Long]("l_partkey")
      val expect = math.min(t.getAs[Long]("sup"), t.getAs[Long]("dem"))
      val got = r.get(pk).map(_._2).getOrElse(0L)
      assert(got == expect, s"part $pk: matched $got != min(sup,dem) $expect")
    }
    // splitting happens: some lot funds several demands
    assert(r.values.exists(_._1 > 1L), "expected at least one split lot")
  }

  test("t37: fertility is >= 1 token/word and <= the character bound") {
    val r = TextQueries.queries("t37_tokenizer_fertility")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w, b, t) = (row.getAs[Long]("n_words"), row.getAs[Long]("n_bytes"),
        row.getAs[Long]("n_tokens"))
      // every word is at least one token, at most one token per char
      assert(t >= w && t <= b, s"token count $t outside [$w, $b]")
      assert(row.getAs[Long]("fertility_micro") >= 1000000L)
      // a BPE token is at least one byte
      assert(row.getAs[Long]("bytes_per_token_micro") >= 1000000L)
    }
  }

  test("n13: watermark audit orders by delay and bounds by disorder") {
    val r = StreamQueries.queries("n13_watermark_audit")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (l1, l5, l15) = (row.getAs[Long]("late_1m"),
        row.getAs[Long]("late_5m"), row.getAs[Long]("late_15m"))
      // a longer delay never drops more rows
      assert(l1 >= l5 && l5 >= l15, s"late counts not monotone: $l1 $l5 $l15")
      assert(l1 <= row.getAs[Long]("n_events"))
      val maxLag = row.getAs[Long]("max_lag_ms")
      assert(row.getAs[Long]("p95_lag_ms") <= maxLag)
      // if the observed disorder never exceeds a delay, nothing is late
      if (maxLag <= 900000L) assert(l15 == 0L)
      if (maxLag <= 60000L) assert(l1 == 0L)
    }
  }

  test("g13+g14: graph family shares one edge-derivation convention") {
    // cheap structural guard: the SCC classifier and the modularity
    // trajectory must both run without touching more than their input
    // table (no cartesian, no unpartitioned-window exchange)
    Seq("g13_scc", "g14_modularity").foreach { q =>
      val plan = GraphQueries.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }
}
