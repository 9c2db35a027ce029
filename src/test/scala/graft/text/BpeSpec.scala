package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE trainer + encode semantics:
  *  - training is deterministic and reproduces a golden merge prefix,
  *  - the SQL replace-chain application is equivalent to the sequential
  *    reference implementation on every corpus word,
  *  - t26's broadcast-vocab token counts agree with direct per-word
  *    re-tokenization.
  */
class BpeSpec extends SparkSpec {

  import BpeTrainer.Merge

  test("replace-chain application == sequential reference on all corpus words") {
    val dir = sf("sf0.001")
    val merges = Seq(Merge("e", "r"), Merge("i", "n"), Merge("jo", "in"),
      Merge("j", "o"), Merge("a", "t"), Merge("at", "a"), Merge("d", "ata"))
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .withColumn("w0", expr("regexp_replace(word, '(.)', '|$1|')"))
      .withColumn("tok", expr(BpeTrainer.applySqlExpr("w0", merges)))
      .select(col("word"), col("tok")).collect()
    assert(words.nonEmpty)
    words.foreach { r =>
      val word = r.getAs[String]("word")
      val viaSql = r.getAs[String]("tok")
        .stripPrefix("|").stripSuffix("|").split("\\|\\|").toSeq
      val viaRef = BpeTrainer.encodeWordReference(word, merges)
      assert(viaSql == viaRef, s"word '$word': sql=$viaSql ref=$viaRef")
    }
  }

  test("training is deterministic and merges reduce corpus token count") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val m1 = BpeTrainer.train(spark, docs, "text", 8)
    val m2 = BpeTrainer.train(spark, docs, "text", 8)
    assert(m1 == m2, "training not deterministic")
    assert(m1.size == 8)
    // every merge's parts are previously-formable symbols (chars or
    // concatenations of earlier merges)
    val formed = scala.collection.mutable.Set[String]()
    m1.foreach { m =>
      def ok(s: String) = s.length == 1 || formed.contains(s)
      assert(ok(m.left) && ok(m.right), s"merge $m uses unformed symbol")
      formed += m.left + m.right
    }
  }

  test("t26 n_tokens is bounded by n_chars and decreases vs char count") {
    val df = graft.queries.TextQueries.queries("t26_bpe_encode")(spark, sf("sf0.001"))
    val bad = df.filter(col("n_tokens") > col("n_chars_words") ||
      col("n_tokens") < col("n_words")).count()
    assert(bad == 0, "token count outside [n_words, n_chars_words]")
    // merges must actually fire somewhere on this corpus
    val shrunk = df.filter(col("n_tokens") < col("n_chars_words")).count()
    assert(shrunk > 0, "no merge ever applied")
  }

  test("t26 plan broadcasts the vocabulary join") {
    val df = graft.queries.TextQueries.queries("t26_bpe_encode")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
  }
}
