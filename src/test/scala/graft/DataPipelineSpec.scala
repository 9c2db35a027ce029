package graft

import org.apache.spark.sql.functions._

/** The curation pipeline must be monotone (each gate only removes
  * docs), keep the eval split out of the corpus, and assign packing
  * windows consistently with each doc's token count. */
class DataPipelineSpec extends SparkSpec {

  private lazy val result = DataPipeline.curate(spark, sf("sf0.001"))

  test("each curation stage only removes documents") {
    val counts = result._2.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"non-monotone stage counts: ${result._2}")
    assert(counts.last > 0, "pipeline removed everything")
  }

  test("no eval-split document survives into the corpus") {
    assert(result._1.filter(col("doc_id") % 97 === 0).count() == 0)
  }

  test("sample weights invert the stratified keep rates") {
    // weight = 1000/rate for the doc's language band; all weights ≥ 1
    val bad = result._1.filter(col("sample_weight") < 1.0f).count()
    assert(bad == 0)
  }

  test("fold assignment is total and deterministic") {
    val folds = result._1.select(col("fold")).distinct().collect().map(_.getLong(0))
    assert(folds.forall(f => f >= 0 && f < 10))
    // re-running the pipeline yields identical fold assignment
    val again = DataPipeline.curate(spark, sf("sf0.001"))._1
      .select(col("doc_id"), col("fold"))
    val diff = result._1.select(col("doc_id"), col("fold")).as("a")
      .join(again.as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(col("a.fold") =!= col("b.fold")).count()
    assert(diff == 0)
  }

  test("packing windows are consistent with token counts") {
    // a doc of n tokens spans at most floor((n-1)/512) + 2 windows
    // (worst case: starts just before a boundary)
    val bad = result._1.filter(
      col("seq_last") < col("seq_first") ||
        (col("seq_last") - col("seq_first") + 1) >
          expr("(n_tok - 1) div 512 + 2"))
      .count()
    assert(bad == 0)
  }
}
