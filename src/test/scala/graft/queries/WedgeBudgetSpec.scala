package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-12 wedge-budget machinery has TWO physical paths per
  * query, chosen by driver-side stats — this spec forces each path on
  * the same inputs and pins result identity, so the 100-TB branch
  * (shuffle closure, grid salting engaged) is executed by the suite,
  * not just reasoned about.
  */
class WedgeBudgetSpec extends SparkSpec {

  // power-law-ish fixture: hub 0 of degree 60, 20 hub triangles, one
  // hub-free clique (the TriangleOrientSpec fixture)
  private lazy val edges = {
    import spark.implicits._
    val star = (1L to 60L).map(l => (0L, l))
    val ring = (0 until 20).map(k => (3L * k + 1, 3L * k + 2))
    val clique = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    (star ++ ring ++ clique).toDF("u", "v")
  }

  private def triKey(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(array_sort(array(col("a"), col("b"), col("c"))).cast("string"))
      .collect().map(_.getString(0)).sorted.toSeq

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("broadcast and shuffle closure paths return identical triangles") {
    val viaBroadcast = triKey(GraphQueries.orientedTriangles(edges))
    // cap 0 forces the 100-TB shuffle plan (explicit (s, t) wedge
    // partitioning + SortMergeJoin); tiny budget forces nParts above
    // the parallelism floor so the budget arithmetic actually runs
    val viaShuffle = withConf(
      "spark.graft.graph.broadcastEdgeCap" -> "0",
      "spark.graft.graph.wedgeBudget" -> "16") {
      triKey(GraphQueries.orientedTriangles(edges))
    }
    assert(viaBroadcast == viaShuffle,
      s"paths diverge: broadcast=${viaBroadcast.size} shuffle=${viaShuffle.size}")
    assert(viaBroadcast.size == 21)
  }

  test("g15 grid salting (p > 1 on the hub) preserves the top-k table") {
    // sf0.01: the smallest scale where the sparsified co-supply graph
    // yields non-adjacent candidate pairs at all (empty at sf0.001)
    val dir = sf("sf0.01")
    val base = GraphQueries.queries("g15_adamic_adar")(spark, dir).collect()
    // budget 64 => sqrtB = 8 => every node with deg > 8 splits into
    // p = ceil(deg/8) > 1 grid groups — the salted cells must still
    // meet every (cu, cv) pair exactly once
    val salted = withConf("spark.graft.graph.wedgeBudget" -> "64") {
      GraphQueries.queries("g15_adamic_adar")(spark, dir).collect()
    }
    assert(base.map(_.toString).toSeq == salted.map(_.toString).toSeq,
      s"grid salting changed g15: ${base.length} vs ${salted.length} rows")
    assert(base.nonEmpty)
  }

  test("maxWedges guard fails fast when the priced wedge bill exceeds the cap") {
    // the hub fixture prices Σdeg² well above 10; with the cap set the
    // guard must throw BEFORE the join (driver-side stat), naming the
    // knob — d02's candidate-budget pattern applied to the wedge family
    val e = intercept[IllegalStateException] {
      withConf("spark.graft.graph.maxWedges" -> "10") {
        GraphQueries.orientedTriangles(edges).collect()
      }
    }
    assert(e.getMessage.contains("maxWedges"))
    // g15 prices through its own degree table; same guard, same knob
    val e2 = intercept[IllegalStateException] {
      withConf("spark.graft.graph.maxWedges" -> "10") {
        GraphQueries.queries("g15_adamic_adar")(spark, sf("sf0.01")).collect()
      }
    }
    assert(e2.getMessage.contains("g15_adamic_adar"))
    // default cap (2e9, round-14 default-ON): the fixture's bill is far
    // under it, so the same inputs run clean with no conf set
    assert(GraphQueries.orientedTriangles(edges).count() == 21)
  }

  test("onWedgesExceeded=proceed opts past the cap with an identical result") {
    // d07's guard A/B discipline: proceed mode must be a pure opt-in —
    // the result with the guard tripped-but-overridden is bit-identical
    // to the unguarded run (the guard is a driver-side stat check, not
    // a plan change)
    val base = triKey(GraphQueries.orientedTriangles(edges))
    val viaProceed = withConf(
      "spark.graft.graph.maxWedges" -> "10",
      "spark.graft.graph.onWedgesExceeded" -> "proceed") {
      triKey(GraphQueries.orientedTriangles(edges))
    }
    assert(base == viaProceed)
    // explicit 0 still means unlimited (the opt-out spelling)
    val viaZero = withConf("spark.graft.graph.maxWedges" -> "0") {
      triKey(GraphQueries.orientedTriangles(edges))
    }
    assert(base == viaZero)
  }
}
