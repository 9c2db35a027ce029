package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GenSf's zipf TOKEN mode (round-13 verdict stretch #8 — the d-family
  * analogue of the graph zipf mode). The log-uniform inverse-CDF
  * rank = floor(V^u) is exactly Zipf s = 1: P(rank r) ∝ 1/r, so the
  * head word carries ln(2)/ln(V) of all tokens (~10 % at V = 1024)
  * versus 1/V (~0.1 %) under uniform draws — two orders of magnitude
  * of head skew, which is what makes LSH band mass and d02/d07
  * candidate bills behave differently on real text.
  */
class GenSfTokenZipfSpec extends SparkSpec {

  private val vocab = GenSf.vocabOf(1024)

  private def wordFreqs(tokenZipf: Double): Array[(String, Long)] =
    GenSf.documentsDf(spark, 2000L, vocab, tokenZipf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("tokens:zipf produces a 1/r head; uniform stays flat") {
    val zipf = wordFreqs(1.0)
    val uni = wordFreqs(0.0)
    val zTotal = zipf.map(_._2).sum.toDouble
    val uTotal = uni.map(_._2).sum.toDouble
    val zHead = zipf.head._2 / zTotal
    val uHead = uni.head._2 / uTotal
    // Zipf-1 head share = log_V(2) ≈ 0.100 at V=1024; uniform ≈ 1/1024
    assert(math.abs(zHead - math.log(2) / math.log(1024)) < 0.02,
      s"zipf head share $zHead != ~0.10")
    assert(uHead < 0.01, s"uniform head share $uHead unexpectedly skewed")
    // the head is the vocab's FIRST rank (floor(V^u) small => rank 1)
    assert(zipf.head._1 == vocab.head)
    // 1/r shape: rank-2 share ~ log_V(3/2) ≈ 0.585 * head
    val zSecond = zipf(1)._2 / zTotal
    assert(math.abs(zSecond / zHead - 0.585) < 0.12,
      s"rank-2/rank-1 ratio ${zSecond / zHead} != ~0.585")
  }

  test("zipf mode keeps the exact-dup population and doc shape") {
    val df = GenSf.documentsDf(spark, 5000L, vocab, 1.0)
    val n = df.count()
    val dups = df.groupBy("text").count().filter(col("count") > 1)
      .agg(sum(col("count") - 1)).head().getLong(0)
    assert(n == 5000L)
    // ~0.2 % verbatim-duplicate rate survives the token-mode switch
    assert(dups >= 2 && dups <= 40, s"dup count $dups outside band")
  }
}
