package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING, the iterated form
  * of query `t17_bpe_pairs` (one merge step). Reference behavior:
  * classic BPE (Sennrich et al. 2016, public algorithm) — repeatedly
  * merge the most frequent adjacent symbol pair in the corpus.
  *
  * Scale design (the property that makes distributed BPE feasible):
  * the corpus collapses to its word-frequency table FIRST — one
  * map-side-combined shuffle over the raw text, after which every
  * training round runs over |vocab| rows (tiny) regardless of corpus
  * size. Each round is: explode adjacent symbol pairs weighted by word
  * count → global argmax (cnt desc, pair asc tie-break — fully
  * deterministic) → apply the merge to the vocab's symbol strings.
  * The per-round state is ONE string column on the vocab table;
  * `localCheckpoint` every [[checkpointEvery]] rounds keeps the plan
  * from growing linearly in the merge count.
  *
  * Symbol-sequence representation: each symbol is wrapped as `|sym|`,
  * so a word's sequence is `|h||e||l||l||o|` and applying merge (a,b)
  * is the single string rewrite `|a||b|` → `|ab|` — leftmost,
  * non-overlapping, one sweep per merge (the sentencepiece-style
  * greedy application; both Spark's and DuckDB's `replace` share
  * these semantics, which is what lets `t26_bpe_encode`'s oracle
  * replay the identical merge list). The wrapper `|` must not occur
  * in the text; callers filter to the known charset.
  */
object BpeTrainer {

  final case class Merge(left: String, right: String) {
    def pattern: String = s"|$left||$right|"
    def replacement: String = s"|${left + right}|"
  }

  private val checkpointEvery = 8

  /** Wrap every character of `wordCol` as a |sym| sequence. */
  def wrapExpr(wordCol: String): String =
    s"regexp_replace($wordCol, '(.)', '|$$1|')"

  /** word-frequency table from a text column: one shuffle, map-side
    * combined; this is the ONLY corpus-sized stage of training. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Adjacent symbol pairs of the current vocab state, weighted by wc.
    * `sym` is the wrapped representation; split on `||` after trimming
    * the outer wrappers recovers the symbol array. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("wc"),
        expr("split(trim(BOTH '|' FROM sym), '\\\\|\\\\|')").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i - 1] AS l, syms[i] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).as("cnt"))

  /** Train `k` merges off `docs(textCol)`. Returns the ordered merge
    * list; stops early when no adjacent pair remains. */
  def train(spark: SparkSession, docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    var vocab = wordCounts(docs, textCol)
      .select(col("word"), col("wc"), expr(wrapExpr("word")).as("sym"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < k && !done) {
      // vocab-sized argmax; deterministic tie-break (cnt desc, l, r asc)
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val m = Merge(top(0).getAs[String]("l"), top(0).getAs[String]("r"))
        merges += m
        vocab = vocab.withColumn("sym",
          expr(s"replace(sym, '${m.pattern}', '${m.replacement}')"))
        i += 1
        if (i % checkpointEvery == 0) vocab = vocab.localCheckpoint()
      }
    }
    merges.result()
  }

  /** Apply an ordered merge list to a wrapped symbol string column —
    * one `replace` sweep per merge, identical semantics on Spark and
    * DuckDB. Returns the SQL expression string (shared by the Spark
    * plan and the generated oracle). */
  def applySqlExpr(wrappedCol: String, merges: Seq[Merge]): String =
    merges.foldLeft(wrappedCol) { (acc, m) =>
      s"replace($acc, '${m.pattern}', '${m.replacement}')"
    }

  /** Reference single-word implementation (plain Scala, no Spark) used
    * by BpeSpec to pin the rewrite semantics independently. */
  def encodeWordReference(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    for (m <- merges) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == m.left && syms(j + 1) == m.right) {
          out += m.left + m.right; j += 2 // leftmost greedy, single sweep
        } else { out += syms(j); j += 1 }
      }
      syms = out.toSeq
    }
    syms
  }
}
