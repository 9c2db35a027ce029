package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 rehearsal: does AQE's runtime skew-join splitting handle
  * the unsalted form of j09's hot-key join at the same plan quality as
  * the hand-salted spelling — i.e. is salting a required user-facing
  * pattern or a doc note? Fixture: a 400k-row fact where 99 % of rows
  * collapse onto ONE join key (the power-law shape the j09 comment
  * warns about), joined to a 10-row dim with broadcast disabled so the
  * join actually shuffles (a broadcast join — j09's own production
  * shape — never skews, which is the FIRST line of defense; this spec
  * is about the non-broadcastable-dim case).
  *
  * MEASURED VERDICT (the PLANS.md round-11 entry): AQE alone does NOT
  * rescue j09's exact shape. OptimizeSkewedJoin refuses to split a
  * skewed partition whose output partitioning is REUSED downstream
  * (here the groupBy on the join key sits exchange-free on top of the
  * join — splitting would force a new shuffle), so the default plan
  * keeps one straggler task per hot key. It splits only under
  * `spark.sql.adaptive.forceOptimizeSkewedJoin=true`, which buys the
  * split at the cost of re-shuffling the join output for the
  * aggregation. So: for a pure join (no partitioning reuse) AQE
  * handles skew and salting is a doc note; for join+agg-on-the-same-
  * key — j09's actual shape — salting (or forceOptimizeSkewedJoin,
  * spilling an extra shuffle) remains the user-facing answer, and
  * j09 stays in the suite as that pattern's reference spelling.
  */
class SkewJoinAqeSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def skewConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // scale AQE's size heuristics down to fixture size: skewed =
    // > factor×median AND > thresholdBytes; split chunks target the
    // advisory size
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.shuffle.partitions" -> "8")

  private def fact = spark.range(400000).select(
    when(col("id") % 100 < 99, 0L).otherwise(col("id") % 100 % 10).as("k"),
    (col("id") % 1000).cast("double").as("v"))

  private def dimDf = {
    import spark.implicits._
    (0L until 10L).map(k => (k, 1.0 + k * 0.1)).toDF("d_k", "factor")
  }

  private def unsaltedAgg = fact.join(dimDf, col("k") === col("d_k"))
    .groupBy(col("k"))
    .agg(sum(col("v") * col("factor")).as("w"), count(lit(1)).as("n"))

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE does NOT split the hot key when the agg reuses the join partitioning") {
    withConf(skewConfs: _*) {
      val plan = finalPlan(unsaltedAgg)
      // the join IS skewed, but OptimizeSkewedJoin backs off because
      // splitting would break the exchange-free agg above it
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("skew=true") && !plan.contains("skewed"),
        s"expected AQE to back off on the reused partitioning:\n$plan")
    }
  }

  test("forceOptimizeSkewedJoin splits the hot key and matches the salted result") {
    import spark.implicits._
    val nSalt = 8
    withConf(skewConfs :+
        ("spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"): _*) {
      val unsalted = unsaltedAgg
      val unsaltedRows = unsalted.collect().map(r =>
        (r.getLong(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
      val plan = finalPlan(unsalted)
      // OptimizeSkewedJoin marks the join; the shuffle read fans the
      // hot partition into multiple tasks (at the price of an extra
      // exchange before the aggregation)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n$plan")

      // salted: j09's hand-salted spelling on the same data
      val saltedFact = fact.withColumn("salt", (col("v") % nSalt).cast("long"))
      val saltedDim = dimDf.crossJoin(
        (0 until nSalt).map(i => i.toLong).toDF("d_salt"))
      val salted = saltedFact.join(saltedDim,
          col("k") === col("d_k") && col("salt") === col("d_salt"))
        .groupBy(col("k"))
        .agg(sum(col("v") * col("factor")).as("w"), count(lit(1)).as("n"))
      val saltedRows = salted.collect().map(r =>
        (r.getLong(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
      assert(unsaltedRows == saltedRows,
        "salted and unsalted joins disagree")
    }
  }
}
