package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** g06's closure now orients edges by (degree, id) rank before joining
  * (compact-forward). Two load-bearing claims, both on a power-law
  * fixture the lineitem-derived co-supply graph never produces:
  *
  *  1. Result invariance: the triangle SET (as corner node-sets) and
  *     therefore the count and per-node counts are identical to the
  *     naive id-oriented (u < v < w) closure — which is also what the
  *     unchanged oracle CTE computes.
  *  2. The work bound: a hub with LOW node id is the id-orientation's
  *     worst case (all its edges point outward: C(deg_hub, 2) wedges
  *     from one node). Degree orientation points every hub edge
  *     INWARD, so the hub's oriented out-degree is 0 and total wedge
  *     work obeys the Σ C(outdeg⁺, 2) ≤ O(E^1.5) arboricity bound.
  */
class TriangleOrientSpec extends SparkSpec {

  // star hub (node 0, degree 60, id-rank FIRST) + leaf-pair edges that
  // close 20 triangles THROUGH the hub (0, 3k+1, 3k+2), + one hub-free
  // 3-clique (100, 101, 102) whose rank-smallest corner is a non-hub
  // node — so invariance also covers a triangle closed away from the
  // hub, not just the hub wedges
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

  test("degree-oriented closure returns the same triangles as id-oriented") {
    val fast = GraphQueries.orientedTriangles(edges)
    val naive = edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val (f, n) = (triKey(fast), triKey(naive))
    assert(f == n, s"triangle sets diverge: fast=${f.size} naive=${n.size}")
    assert(f.size == 21,
      s"expected 20 hub triangles + 1 hub-free clique, got ${f.size}")
  }

  test("the low-id hub's oriented out-degree collapses to zero") {
    import spark.implicits._
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("s"))
    val hubOut = oriented.filter(col("s") === 0L).count()
    assert(hubOut == 0L,
      s"hub still emits $hubOut oriented edges (id-orientation would emit 60" +
        " and pay C(60,2)=1770 wedges at this one node)")
    // and the id-oriented worst case really is what we avoided
    val idHubOut = edges.filter(col("u") === 0L).count()
    assert(idHubOut == 60L)
  }
}
