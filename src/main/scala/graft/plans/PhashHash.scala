package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 15-bit DCT perceptual hash of a binary blob's first 64 bytes (the
  * 8×8 "pixel" block of MultimodalQueries' fake decode, x07).
  *
  * Semantics (shared literal-for-literal with the x07 DuckDB oracle,
  * which spells the identical math as hex-decode + integer dot
  * products): coefficients c(u,v) = Σ_{r,c} K[u][r]·K[v][c]·byte[8r+c]
  * over the QUANTIZED orthonormal DCT-II basis K = round(α·cos·4096),
  * top-left 4×4 kept, DC dropped; AC bit i set when 15·c_i > Σc_j
  * (multiply, never divide — integer-exact on both engines).
  *
  * Why a native expression: the same math as stacked Column projections
  * is a single 960-term expression tree after CollapseProject —
  * whole-stage codegen emits it UNROLLED, blows janino's 64 KB method
  * limit, and silently drops the projection to interpreted eval. Here
  * it is a generated LOOP over a referenced weight matrix: compact
  * bytecode, stays inside whole-stage codegen, one multiply-add per
  * term. |c| ≤ 2048²·255·64 < 2⁶³ — no overflow.
  *
  * Inputs shorter than 64 bytes hash to NULL (callers filter first;
  * the null keeps the expression total).
  */
case class PhashHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a binary argument")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < PhashHash.blockBytes) null
    else {
      val w = PhashHash.weights
      val coeffs = new Array[Long](PhashHash.acCount)
      var k = 0
      while (k < PhashHash.acCount) {
        var acc = 0L
        var j = 0
        while (j < PhashHash.blockBytes) {
          acc += w(k * PhashHash.blockBytes + j) * (bytes(j) & 0xff).toLong
          j += 1
        }
        coeffs(k) = acc
        k += 1
      }
      var acsum = 0L
      k = 0
      while (k < PhashHash.acCount) { acsum += coeffs(k); k += 1 }
      var h = 0L
      k = 0
      while (k < PhashHash.acCount) {
        if (PhashHash.acCount * coeffs(k) > acsum) h |= (1L << k)
        k += 1
      }
      h
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val w = ctx.addReferenceObj("phashWeights", PhashHash.weights, "long[]")
      val coeffs = ctx.freshName("coeffs")
      val acc = ctx.freshName("acc")
      val acsum = ctx.freshName("acsum")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val nb = PhashHash.blockBytes
      val nc = PhashHash.acCount
      s"""
        if ($bytes.length < $nb) {
          ${ev.isNull} = true;
        } else {
          long[] $coeffs = new long[$nc];
          for (int $k = 0; $k < $nc; $k++) {
            long $acc = 0L;
            for (int $j = 0; $j < $nb; $j++) {
              $acc += $w[$k * $nb + $j] * (long) ($bytes[$j] & 0xff);
            }
            $coeffs[$k] = $acc;
          }
          long $acsum = 0L;
          for (int $k = 0; $k < $nc; $k++) $acsum += $coeffs[$k];
          long $h = 0L;
          for (int $k = 0; $k < $nc; $k++) {
            if ($nc * $coeffs[$k] > $acsum) $h |= (1L << $k);
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PhashHash =
    copy(child = newChild)

  override def prettyName: String = "phash_hash"
}

object PhashHash {
  val blockN = 8
  val blockBytes: Int = blockN * blockN
  val keep = 4

  /** Quantized orthonormal DCT-II basis, K(u)(r) = round(α·cos·4096). */
  val basis: Array[Array[Long]] = Array.tabulate(keep, blockN) { (u, r) =>
    val alpha = if (u == 0) math.sqrt(1.0 / blockN) else math.sqrt(2.0 / blockN)
    math.round(alpha * math.cos((2 * r + 1) * u * math.Pi / (2 * blockN)) * 4096.0)
  }

  /** AC coefficient order: (u,v) row-major over the kept block, DC
    * skipped — the bit order of the hash. */
  val acPairs: Seq[(Int, Int)] =
    for { u <- 0 until keep; v <- 0 until keep; if u + v > 0 } yield (u, v)
  val acCount: Int = acPairs.size

  /** Flattened per-coefficient weights W[k·64 + 8r+c] = K[u][r]·K[v][c]. */
  val weights: Array[Long] = acPairs.flatMap { case (u, v) =>
    for { r <- 0 until blockN; c <- 0 until blockN }
      yield basis(u)(r) * basis(v)(c)
  }.toArray
}
