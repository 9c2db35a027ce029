package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 additions (the GraphEvalSpec
  * convention): the DuckDB gate proves cross-engine equality; these
  * prove the MATH means what each operator claims — fit closure,
  * estimator error bounds, linkage resolution, SHAP additivity, VAD
  * segment geometry. sf0.001 keeps them cheap. */
class Round6EvalSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("f03: Asimov closure recovers mu-hat = 1 and a positive significance") {
    val r = FitQueries.queries("f03_profile_significance")(spark, dir).collect()(0)
    val mu = r.getAs[Float]("mu_hat")
    assert(math.abs(mu - 1.0f) < 1e-3, s"mu_hat $mu not at the Asimov optimum")
    assert(r.getAs[Float]("q0") > 0.0f, "q0 must be positive when signal is present")
    assert(r.getAs[Float]("z") > 1.0f, "closure dataset should be a clear discovery")
  }

  test("f04: ranking is sorted by impact and nominal mu matches f02's fit") {
    val rows = FitQueries.queries("f04_impact_ranking")(spark, dir).collect()
    val impacts = rows.map(_.getAs[Long]("impact_micro"))
    assert(impacts.zip(impacts.tail).forall { case (a, b) => a >= b },
      s"impacts not descending: ${impacts.toSeq}")
    // f04's templates are f02's; its nominal fit must reproduce f02's mu-hat
    val f02mu = FitQueries.queries("f02_chi2_template_fit")(spark, dir)
      .collect()(0).getAs[Float]("mu_hat")
    val noms = rows.map(_.getAs[Float]("mu_nom")).distinct
    assert(noms.length == 1 && math.abs(noms.head - f02mu) < 1e-5,
      s"mu_nom ${noms.toSeq} vs f02 $f02mu")
  }

  test("j18: every misspelling resolves to its intended catalog name") {
    val got = MiscQueries.queries("j18_fuzzy_lookup")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // unambiguous repairs (one edit from exactly one catalog name) —
    // asserted only when the intended name exists in THIS scale
    // factor's catalog (sf0.001 has ~200 parts, not every combo)
    val catalog = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_name")).distinct().collect().map(_.getString(0)).toSet
    val expected = Map(
      "smal ring" -> "small ring", "blu bolt" -> "blue bolt",
      "hot gera" -> "hot gear", "smal plate" -> "small plate",
      "bleu gear" -> "blue gear").filter(kv => catalog(kv._2))
    assert(expected.nonEmpty, "fixture catalog lost every expected name")
    expected.foreach { case (probe, want) =>
      assert(got.get(probe).contains(want),
        s"probe '$probe' resolved to ${got.get(probe)}, wanted '$want'")
    }
  }

  test("d21: the 16-permutation estimate tracks d20's exact Jaccard") {
    val est = DedupQueries.queries("d21_source_similarity")(spark, dir)
      .select(col("src_a"), col("src_b"), col("est_jaccard")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Float]("est_jaccard")).toMap
    val exact = DedupQueries.queries("d20_source_overlap")(spark, dir)
      .select(col("src_a"), col("src_b"), col("jaccard")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Float]("jaccard")).toMap
    assert(est.keySet == exact.keySet, "pair sets differ")
    // K = 16 permutations: sigma = sqrt(J(1-J)/16) <= 0.125; allow 3.5 sigma
    val bad = est.collect { case (k, e) if math.abs(e - exact(k)) > 0.45 => (k, e, exact(k)) }
    assert(bad.isEmpty, s"estimates off beyond MinHash error: $bad")
    // and the estimator must carry signal: mean |err| near the K=16
    // theoretical E|N(0, 0.125)| ≈ 0.1 (sf0.001 has only 2-3 docs per
    // source, so the per-source union sets are small and noisy — 0.2
    // bounds that while still rejecting a broken estimator)
    val meanAbsErr = est.map { case (k, e) => math.abs(e - exact(k)) }.sum / est.size
    assert(meanAbsErr < 0.2, f"mean |err| $meanAbsErr%.3f too large for K=16")
  }

  test("t29: target-source documents score higher than the rest on average") {
    val df = CurationQueries.queries("t29_dsir_importance")(spark, dir)
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val j = df.join(d, "doc_id")
      .groupBy(col("source") === "src0").agg(avg(col("avg_log_ratio")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(j(true) > j(false),
      s"src0 mean ${j(true)} not above non-target mean ${j(false)}")
  }

  test("x09: segments are disjoint, ordered, and internally consistent") {
    val segs = MultimodalQueries.queries("x09_vad_segments")(spark, dir).collect()
    assert(segs.nonEmpty)
    segs.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("seg_idx"))
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_frames")
        assert(r.getAs[Int]("end_frame") - r.getAs[Int]("start_frame") + 1 == n,
          "frame span and count disagree")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Int]("end_frame") + 1 < b.getAs[Int]("start_frame"),
            "adjacent segments must be separated by an unvoiced gap")
        case _ =>
      }
    }
  }

  test("m21: SHAP additivity — phis sum to the centered logit") {
    val df = MLQueries.queries("m21_linear_shap")(spark, dir)
    val rows = df.collect()
    // E[logit] = logit(E[x]) for a linear model; estimate it as the mean
    val meanLogit = rows.map(_.getAs[Float]("logit").toDouble).sum / rows.length
    val bad = rows.count { r =>
      val phiSum = (0 to 3).map(j => r.getAs[Float](s"phi$j").toDouble).sum
      math.abs(phiSum - (r.getAs[Float]("logit") - meanLogit)) > 1e-4
    }
    assert(bad == 0, s"$bad rows violate additivity")
  }

  test("d22: roles partition the points and core labels are component minima") {
    val out = MiscQueries.queries("d22_dbscan_grid")(spark, dir).collect()
    val byRole = out.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
    assert(byRole.getOrElse("core", 0) > 0, "no core points at all")
    out.foreach { r =>
      val role = r.getString(1); val cluster = r.getLong(2)
      if (role == "noise") assert(cluster == -1L, "noise must carry cluster -1")
      else {
        assert(cluster >= 0L, s"$role point without a cluster")
        if (role == "core") assert(cluster <= r.getLong(0),
          "a core label must be a component minimum (<= own id)")
      }
    }
  }
}
