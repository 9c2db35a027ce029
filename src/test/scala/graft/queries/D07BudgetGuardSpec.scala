package graft.queries

import graft.SparkSpec
import graft.tools.GenSf

/** d07's candidate-budget guard (round 13; d02's pattern applied to the
  * exact PPJoin, per the round-12 verdict's plan audit). The prefix
  * self-join's row bill — Σ C(c, 2) over prefix keys, exactly what the
  * equi-join emits before the length/positional conjuncts prune — is
  * measured in the same job that materializes the (lazily checkpointed)
  * prefix index, and compared against
  * spark.graft.d07.maxCandidatesPerDoc × n before the join runs.
  *
  * Measured bills on the driver corpora: 448/doc at sf0.01, 4936/doc at
  * sf0.1 (the per-doc bill grows ~linearly in n on the 31-word corpus —
  * that IS the contract quadratic) — both under the 12288 default. A
  * 50k-doc 31-word corpus must trip; the 4096-word corpus at the same
  * size has vanishing prefix collisions and must pass. PPJoin is exact,
  * so there is no retune mode: the error says so and names the opt-in.
  */
class D07BudgetGuardSpec extends SparkSpec {

  private def corpusDir(name: String, vocabSize: Int, nDocs: Long): String = {
    val dir = s"target/tmp/d07guard/$name"
    val f = new java.io.File(s"$dir/documents.parquet")
    if (!f.exists())
      GenSf.documentsDf(spark, nDocs, GenSf.vocabOf(vocabSize))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val d07 = DedupQueries.queries("d07_ppjoin_exact")

  test("guard trips on the 31-word corpus at sf1 doc count") {
    val dir = corpusDir("vocab31", 31, 50000L)
    val e = intercept[IllegalStateException] { d07(spark, dir) }
    assert(e.getMessage.contains("candidate pairs"), e.getMessage)
    assert(e.getMessage.contains("no retune"), e.getMessage)
    assert(e.getMessage.contains("proceed"), e.getMessage)
  }

  test("guard passes on the 4096-word corpus at the same doc count") {
    val dir = corpusDir("vocab4096", 4096, 50000L)
    val df = d07(spark, dir)
    assert(df.columns.toSeq == Seq("a_id", "b_id", "jacc"))
  }

  test("proceed mode opts into the quadratic with results unchanged") {
    // sf0.01 is under the default budget; force the guard to trip with
    // a 1/doc budget and check proceed returns the identical rows
    val base = d07(spark, sf("sf0.01")).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.d07.maxCandidatesPerDoc", "1")
    try {
      intercept[IllegalStateException] { d07(spark, sf("sf0.01")) }
      spark.conf.set("spark.graft.d07.onBudgetExceeded", "proceed")
      val via = d07(spark, sf("sf0.01")).collect().map(_.toString).toSeq
      assert(via == base)
      assert(base.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.d07.maxCandidatesPerDoc")
      spark.conf.unset("spark.graft.d07.onBudgetExceeded")
    }
  }

  test("driver gate scales pass the default budget") {
    assert(d07(spark, sf("sf0.01")).count() > 0L)
  }

  test("empty corpus: null bill short-circuits to an empty result") {
    // round-13 advice #1: with no prefix rows the global agg returns a
    // NULL sum — the guard must read it as bill 0 (not NPE) and fall
    // through to the (empty) join
    val dir = corpusDir("empty", 31, 0L)
    assert(d07(spark, dir).count() == 0L)
  }
}
