package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the native one-pass kernels against naive
  * reference implementations of the SAME arithmetic (the HOF/SQL
  * spellings the oracles run). Pure-JVM — no Spark session — so each
  * property runs on hundreds of seeded-random inputs. (Raw scalacheck
  * generators are avoided: only the core jar is cached offline, not
  * the scalatest bridge — a seeded Random sweep gives the same
  * coverage deterministically.) */
class NativePropertySpec extends AnyFunSuite {

  private val P = 2147483647L
  private val rnd = new scala.util.Random(20260813L)
  private def randAscii(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
  }

  /** Naive CDC bounds: recompute the full window Horner per position. */
  private def naiveCdc(s: String, w: Int, mask: Int): Seq[Long] = {
    val marks = for {
      i <- w to s.length
      h = (i - w until i).foldLeft(0L)((acc, j) => acc * 31 + s.charAt(j).toInt)
      if ((h % P) * 2654435761L) % P % mask == 0
    } yield i.toLong
    0L +: marks :+ s.length.toLong
  }

  test("cdc_bounds rolling update == per-window recompute (500 random cases)") {
    for (_ <- 1 to 500) {
      val s = randAscii(80)
      val w = 2 + rnd.nextInt(11)
      val mask = Seq(2, 16, 32, 64)(rnd.nextInt(4))
      val native = CdcBounds.compute(UTF8String.fromString(s), w, mask)
        .toLongArray().toSeq
      assert(native == naiveCdc(s, w, mask),
        s"mismatch for w=$w mask=$mask text='$s'")
    }
  }

  /** Naive shingle set: per-position Horner, truncate, distinct, sort. */
  private def naiveShingles(s: String, k: Int): Seq[Int] =
    (0 to s.length - k).map { i =>
      (i until i + k).foldLeft(0L)((acc, j) => acc * 31 + s.charAt(j).toInt).toInt
    }.distinct.sorted

  test("shingle_set one-pass == naive distinct-sort (500 random cases)") {
    for (_ <- 1 to 500) {
      val s = randAscii(80)
      val k = 1 + rnd.nextInt(8)
      val native = ShingleHashSet.compute(UTF8String.fromString(s), k)
        .toIntArray().toSeq
      assert(native == naiveShingles(s, k), s"mismatch for k=$k text='$s'")
    }
  }

  test("cdc_bounds: boundaries sorted, in range, bracketed (500 random cases)") {
    for (_ <- 1 to 500) {
      val s = randAscii(200)
      val b = CdcBounds.compute(UTF8String.fromString(s), 8, 32)
        .toLongArray().toSeq
      assert(b.head == 0L && b.last == s.length.toLong)
      assert(b.zip(b.tail).forall { case (a, c) => a <= c })
      assert(b.drop(1).dropRight(1).forall(x => x >= 8 && x <= s.length))
    }
  }

  /** Naive pHash: the oracle's spelling — explicit 4-loop DCT from the
    * quantized basis, AC-mean threshold. */
  private def naivePhash(bytes: Array[Byte]): Long = {
    val k = PhashHash.basis
    val coeffs = for { u <- 0 until 4; v <- 0 until 4; if u + v > 0 } yield {
      (for { r <- 0 until 8; c <- 0 until 8 }
        yield k(u)(r) * k(v)(c) * (bytes(8 * r + c) & 0xff).toLong).sum
    }
    val acsum = coeffs.sum
    coeffs.zipWithIndex.foldLeft(0L) { case (h, (cv, i)) =>
      if (15L * cv > acsum) h | (1L << i) else h
    }
  }

  test("phash_hash loop kernel == naive 4-loop DCT (500 random cases)") {
    val expr = PhashHash(org.apache.spark.sql.catalyst.expressions.Literal(
      Array.empty[Byte], org.apache.spark.sql.types.BinaryType))
    for (_ <- 1 to 500) {
      val bytes = new Array[Byte](64 + rnd.nextInt(64))
      rnd.nextBytes(bytes)
      assert(expr.nullSafeEval(bytes) == naivePhash(bytes))
    }
    // short inputs hash to null, hash is always within 15 bits
    assert(expr.nullSafeEval(new Array[Byte](63)) == null)
    for (_ <- 1 to 100) {
      val bytes = new Array[Byte](64)
      rnd.nextBytes(bytes)
      val h = expr.nullSafeEval(bytes).asInstanceOf[Long]
      assert(h >= 0L && h < (1L << 15))
    }
  }
}
