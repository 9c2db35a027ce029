package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The d12 contraction loop's two finish paths — pure distributed
  * star-contraction fixpoint vs driver union-find once the edge list is
  * small — must produce identical component labels. The synthetic graph
  * mixes the shapes that stress each: a long chain (diameter), a ring
  * (cycle), a star (already converged), and an isolated edge.
  */
class ConnectedComponentsSpec extends SparkSpec {

  /** Normalized labels: the ccConverge contract is that consumers apply
    * least(v, nbmin) — the star-forest root carries its min NEIGHBOR,
    * the union-find root itself — so compare after that normalization. */
  private def labels(edges: Seq[(Long, Long)], threshold: Long): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    CurationQueries.ccConverge(spark, df, threshold)
      .collect().map(r => r.getLong(0) -> math.min(r.getLong(0), r.getLong(1))).toMap
  }

  private val graph: Seq[(Long, Long)] =
    // chain 1..40 (forces multiple contraction rounds)
    (1L until 40L).map(i => (i, i + 1)) ++
      // ring 100..110..100
      (100L until 110L).map(i => (i, i + 1)) :+ (110L, 100L) :++
      // star centered at 200
      Seq((200L, 201L), (200L, 202L), (200L, 203L)) :++
      // isolated edge with ids out of order
      Seq((999L, 500L))

  private val expected: Map[Long, Long] =
    ((1L to 40L).map(_ -> 1L) ++ (100L to 110L).map(_ -> 100L) ++
      (200L to 203L).map(_ -> 200L) ++ Seq(500L -> 500L, 999L -> 500L)).toMap

  test("driver union-find finish matches the expected components") {
    assert(labels(graph, threshold = Long.MaxValue) === expected)
  }

  test("pure distributed star-contraction converges to the same labels") {
    assert(labels(graph, threshold = 0L) === expected)
  }

  test("self-loops and duplicate edges don't disturb either path") {
    val noisy = graph ++ Seq((5L, 5L), (1L, 2L), (2L, 1L), (100L, 101L))
    assert(labels(noisy, threshold = Long.MaxValue) === expected)
    assert(labels(noisy, threshold = 0L) === expected)
  }
}
