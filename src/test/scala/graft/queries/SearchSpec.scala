package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Invariants of the search/layout/sketch family that the oracle hash
  * cannot express: sketch one-sidedness, layout bounding, plan shape. */
class SearchSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("CMS estimates never underestimate the true count") {
    val est = SearchQueries.queries("k02_cms_estimate")(spark, dir)
    val bad = est.filter(col("overcount") < 0).count()
    assert(bad == 0, "Count-Min returned an estimate below the exact count")
  }

  test("CMS sketch mass equals depth x input rows") {
    val sketch = SearchQueries.queries("k01_cms_sketch")(spark, dir)
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    val perDepth = sketch.groupBy(col("depth")).agg(sum(col("cnt")).as("m"))
      .select(col("m")).collect().map(_.getLong(0)).toSet
    assert(perDepth == Set(nEvents),
      s"each sketch row must hold every input once: $perDepth vs $nEvents")
  }

  test("z-order buckets bound both dimensions, not just one") {
    val stats = SearchQueries.queries("w02_zorder_layout")(spark, dir)
      .select(col("max_x") - col("min_x"), col("max_y") - col("min_y"))
      .collect()
    // a z bucket covers a sub-rectangle: both spans must be far below the
    // full 0..1023 domain for every non-degenerate bucket
    val (xs, ys) = (stats.map(_.getLong(0)), stats.map(_.getLong(1)))
    assert(xs.max <= 512 && ys.max <= 512,
      s"bucket spans too wide: x<=${xs.max} y<=${ys.max}")
  }

  test("BM25 corpus stats enter via broadcast, and tf needs no shuffle") {
    val plan = planOf(SearchQueries.queries("w01_bm25_rank")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"corpus stats not broadcast:\n$plan")
    // exactly one wide-table aggregate (the 1-row stats agg); the tf
    // columns must not introduce a (doc, term) explode/shuffle
    assert(!plan.contains("Generate"), "BM25 must not explode tokens for a fixed query")
  }

  test("semantic dedup keeps every representative and all reps are distinct per cell") {
    val out = SimilarityQueries.queries("d11_semantic_dedup")(spark, dir)
    val reps = out.filter(col("vec_id") === col("rep_id"))
    assert(reps.filter(!col("is_kept")).count() == 0, "a representative was dropped")
    val cells = out.select(col("cell")).distinct().count()
    assert(reps.count() == cells, "exactly one representative per cell")
  }
}
