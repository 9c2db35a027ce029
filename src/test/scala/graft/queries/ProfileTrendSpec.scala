package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-8 additions: BFS hop distance,
  * sequence analytics (Markov transitions, entry paths, runs/islands),
  * per-key OLS trends, weighted sampling, the skyline, calibration /
  * confusion reports, and the column profiler. The DuckDB gate proves
  * cross-engine equality; these prove the math means what each
  * operator claims (triangle-inequality-style frontier consistency,
  * probability mass, Pareto non-domination, metric bounds). */
class ProfileTrendSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("g08: BFS hops satisfy the frontier recurrence") {
    val d = GraphQueries.queries("g08_bfs_hops")(spark, dir)
    val rows = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    // seeds are exactly the hop-0 set and all ids < 5
    val seeds = rows.filter(_._2 == 0L).keySet
    assert(seeds.nonEmpty && seeds.forall(_ < 5L))
    // rebuild the undirected adjacency the query uses and check that
    // every node at hop h>0 has at least one neighbor at hop h-1 and
    // none at hop < h-1 (min-hop property)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") < 3)
      .select(col("l_suppkey").as("src"), (col("l_partkey") + 1000000L).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (li ++ li.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { case (node, hop) =>
      if (hop > 0) {
        val nbrHops = adj(node).flatMap(rows.get)
        assert(nbrHops.min == hop - 1, s"node $node hop $hop has neighbor hops $nbrHops")
      }
    }
  }

  test("u14: transition probabilities form a stochastic matrix") {
    val d = TemporalQueries.queries("u14_markov_transitions")(spark, dir)
    val byPrev = d.collect().groupBy(_.getAs[String]("prev_type"))
    assert(byPrev.nonEmpty)
    byPrev.foreach { case (prev, rows) =>
      val pSum = rows.map(_.getAs[Float]("p").toDouble).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"row $prev sums to $pSum")
      val total = rows.head.getAs[Long]("row_total")
      assert(rows.map(_.getAs[Long]("n")).sum == total)
    }
  }

  test("u15: path ranks are contiguous and counts cover distinct users") {
    val d = TemporalQueries.queries("u15_top_paths")(spark, dir).collect()
    assert(d.map(_.getAs[Int]("rank")).toSeq == (1 to d.length))
    val counts = d.map(_.getAs[Long]("n_users"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // every path is at most 5 hops of known event types
    d.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.length <= 5 && segs.forall(_.nonEmpty))
    }
  }

  test("u16: per-key OLS matches a naive driver-side fit and |r| <= 1") {
    val d = TemporalQueries.queries("u16_group_ols")(spark, dir).collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(math.abs(r.getAs[Float]("r")) <= 1.0f + 1e-6f))
    // recompute one group naively from the raw table
    val uid = d.head.getAs[Long]("user_id")
    val raw = graft.queries.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
      .filter(col("user_id") === uid)
      .select(col("ts").cast("long"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val t0 = raw.map(_._1).min
    val xs = raw.map(p => ((p._1 - t0) / 1000000000L).toDouble)
    val ys = raw.map(p => math.floor(p._2 * 1000))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val expected = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = d.head.getAs[Float]("slope_milli_per_s").toDouble
    assert(math.abs(got - expected) < math.max(1e-3, math.abs(expected) * 1e-4),
      s"slope $got vs naive $expected")
  }

  test("t21: weighted sample is repartition-stable and k-per-stratum") {
    val d = CurationQueries.queries("t21_weighted_sample")(spark, dir)
    val rows = d.collect()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (_, rs) =>
      assert(rs.length <= 12)
      assert(rs.map(_.getAs[Int]("rk")).toSeq.sorted == (1 to rs.length))
    }
    // determinism: the same sample regardless of partitioning is
    // inherent (hash priorities), but guard the contract anyway by
    // recomputing priorities and checking they are the stratum minima
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pri = docs.map { case (id, lang, w) =>
      val u = (((id % 2147483647L) * 2654435761L) % 2147483647L) % 1048576L + 1L
      (lang, u.toDouble / w, id)
    }
    pri.groupBy(_._1).foreach { case (lang, ps) =>
      val expect = ps.sortBy(p => (p._2, p._3)).take(12).map(_._3).toSeq
      val got = rows.filter(_.getAs[String]("lang") == lang)
        .sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      assert(got == expect, s"stratum $lang sample mismatch")
    }
  }

  test("r15: skyline rows are mutually non-dominating and complete") {
    val d = RelationalQueries.queries("r15_skyline_2d")(spark, dir).collect()
      .map(r => (r.getAs[Double]("qty"), r.getAs[Double]("price")))
    assert(d.nonEmpty)
    def dominates(a: (Double, Double), b: (Double, Double)): Boolean =
      a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2)
    for (a <- d; b <- d) assert(!dominates(a, b), s"$a dominates $b")
  }

  test("m12: confusion metrics are bounded and consistent with m06 at thr=500") {
    val r = MLQueries.queries("m12_confusion_mcc")(spark, dir).collect()(0)
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val mcc = r.getAs[Float]("mcc"); val kappa = r.getAs[Float]("kappa")
    assert(mcc >= -1.0f && mcc <= 1.0f)
    assert(kappa >= -1.0f && kappa <= 1.0f)
    val m06 = MLQueries.queries("m06_threshold_sweep")(spark, dir)
      .filter(col("thr") === 500L).collect()(0)
    assert((tp, fp, fn, tn) == ((m06.getAs[Long]("tp"), m06.getAs[Long]("fp"),
      m06.getAs[Long]("fn"), m06.getAs[Long]("tn"))))
  }

  test("a27: profile rows agree with direct per-column aggregates") {
    val d = RelationalQueries.queries("a27_column_profile")(spark, dir).collect()
    assert(d.length == 4)
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val nRows = o.count()
    d.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      val c = r.getAs[String]("col_name")
      val direct = o.agg(
        countDistinct(col(c)).as("nd"),
        min(col(c)).cast("string").as("mn"),
        max(col(c)).cast("string").as("mx")).collect()(0)
      assert(r.getAs[Long]("n_distinct") == direct.getAs[Long]("nd"))
      assert(r.getAs[String]("min_val") == direct.getAs[String]("mn"))
      assert(r.getAs[String]("max_val") == direct.getAs[String]("mx"))
    }
  }

  test("u17: CUSUM window identity matches the textbook recursion") {
    val d = TemporalQueries.queries("u17_cusum")(spark, dir).collect()
    assert(d.nonEmpty)
    val raw = graft.queries.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    d.foreach { row =>
      val uid = row.getAs[Long]("user_id")
      val ds = raw.filter(_._1 == uid).sortBy(e => (e._2, e._3))
        .map(e => math.floor(e._4 * 1000).toLong - 40000L)
      var s = 0L; var peak = 0L; var nOver = 0L
      ds.foreach { dev =>
        s = math.max(0L, s + dev)
        peak = math.max(peak, s)
        if (s > 500000L) nOver += 1
      }
      assert(row.getAs[Long]("final_s") == s, s"user $uid final")
      assert(row.getAs[Long]("peak_s") == peak, s"user $uid peak")
      assert(row.getAs[Long]("n_over") == nOver, s"user $uid n_over")
      assert(row.getAs[Boolean]("drifted") == (peak > 500000L))
    }
  }

  test("r16: orphan counts are bounded and match a direct EXCEPT probe") {
    val d = RelationalQueries.queries("r16_fk_orphans")(spark, dir).collect()
    assert(d.length == 4)
    d.foreach { r =>
      assert(r.getAs[Long]("n_orphans") <= r.getAs[Long]("n_child"))
      assert(r.getAs[Long]("n_orphan_keys") <= r.getAs[Long]("n_orphans"))
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val direct = li.select(col("l_orderkey")).filter(col("l_orderkey").isNotNull)
      .distinct().except(o.select(col("o_orderkey"))).count()
    val row = d.find(_.getAs[String]("relation").startsWith("lineitem.l_orderkey")).get
    assert(row.getAs[Long]("n_orphan_keys") == direct)
  }

  test("u12: islands partition each user's stream with consistent run lengths") {
    val d = TemporalQueries.queries("u12_gaps_islands")(spark, dir).collect()
    assert(d.nonEmpty)
    val ev = graft.queries.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
    val evCount = ev.count()
    assert(d.map(_.getAs[Long]("run_len")).sum == evCount,
      "island run lengths must cover every event exactly once")
    // islands are time-ordered and non-overlapping per user
    d.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("start_us"), r.getAs[Long]("first_event_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_us") <= b.getAs[Long]("start_us"),
            "islands overlap")
        case _ =>
      }
    }
  }
}
