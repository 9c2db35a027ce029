package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The deletion-neighborhood index join (d18) must be LOSSLESS at
  * Levenshtein distance 1: identical to brute force on a token set that
  * exercises every edit kind — the supplier corpus only has
  * substitutions, so the synthetic set adds insert/delete pairs, a
  * false-positive shape ("ab"/"ba": shared deletion, distance 2), and
  * unicode-free short/long extremes.
  */
class SymSpellSpec extends SparkSpec {

  private val tokens = Seq(
    "spark", "sparks", "spar", "spork", "shark", // ins/del/sub around "spark"
    "ab", "ba", "a", "b",                        // transposition trap + 1-char
    "stream", "streams", "dream",
    "x", "xx", "xxx",
    "kettle", "kettles", "battle")

  private def run(): Set[(String, String, Int)] = {
    import spark.implicits._
    val names = tokens.toDF("w").distinct()
    DedupQueries.symspellPairs(names)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  private def brute(): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      a <- tokens; b <- tokens if a < b
      dist = lev(a, b) if dist <= 1
    } yield (a, b, dist)).toSet
  }

  test("deletion-neighborhood join equals brute force at k = 1") {
    val expected = brute()
    assert(run() === expected)
    // sanity on the fixture itself: each edit kind is present, and the
    // transposition trap is correctly excluded
    assert(expected.contains(("spark", "sparks", 1))) // insertion
    assert(expected.contains(("spar", "spark", 1)))   // deletion
    assert(expected.contains(("shark", "spark", 1)))  // substitution
    assert(expected.contains(("a", "ab", 1)))
    assert(!expected.exists(p => p._1 == "ab" && p._2 == "ba"))
  }
}
