package graft.queries

import graft.SparkSpec

/** Physics sanity for the full CS-frame computation: the angles must be
  * genuine angles for every event, and the two CS implementations
  * (simple tanh form p13, full boost p14) must agree in |cosθ| up to
  * the simple form's approximation on the same pseudo-kinematics. */
class CsFrameSpec extends SparkSpec {

  test("p14 angles are in range for every event") {
    val df = CsFrameQueries.queries("p14_cs_pisa")(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val cos = r.getAs[Float]("cos_theta_cs_pisa")
      val phi = r.getAs[Float]("phi_cs_pisa")
      assert(cos >= -1.0001f && cos <= 1.0001f, s"cos out of range: $cos")
      assert(phi >= -math.Pi - 1e-4 && phi <= math.Pi + 1e-4, s"phi out of range: $phi")
    }
  }

  test("p14 |cos| correlates with the simple CS form") {
    val full = CsFrameQueries.queries("p14_cs_pisa")(spark, sf("sf0.001"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        math.abs(r.getAs[Float]("cos_theta_cs_pisa").toDouble)).toMap
    val simple = PhysicsQueries.queries("p13_cs_angles")(spark, sf("sf0.001"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        math.abs(r.getAs[Float]("cos_theta_cs").toDouble)).toMap
    val common = full.keySet.intersect(simple.keySet).toSeq
    assert(common.size > 100)
    // the simple form approximates the boost: demand positive rank-ish
    // correlation, not equality
    val pairs = common.map(k => (full(k), simple(k)))
    val n = pairs.size.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(pairs.map(p => math.pow(p._1 - mx, 2)).sum)
    val sy = math.sqrt(pairs.map(p => math.pow(p._2 - my, 2)).sum)
    val corr = cov / (sx * sy)
    assert(corr > 0.5, s"correlation $corr between boost and simple CS forms")
  }
}
