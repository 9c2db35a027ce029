package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** All `nPerm` minhash values of an int-hash shingle set in ONE pass:
  * for permutation k, min over shingles w of
  * `((2k+3) · mix(w) + (7919k+1)) mod (2³¹−1)` with
  * `mix(w) = (w · 2654435761) mod (2³¹−1)` — element-for-element the
  * same arithmetic as the SQL form
  * `array_min(transform(sh, w -> (a_k * ((w * 2654435761) % P) + b_k) % P))`
  * the DuckDB oracle evaluates, but as a straight-line generated loop.
  * The HOF form interprets its lambda per element per permutation AND
  * rebuilds the mixed value per permutation; this computes mix(w) once
  * and updates all k minima — ~K× fewer passes, zero interpreted nodes.
  * An LSH signature build evaluates this once per document over ~10³
  * shingles, which made it the dominant cost of d02/d03 (SURVEY §2 /
  * reference `stage1` dedup analogue).
  *
  * Empty input → NULL (the HOF form yields an array of NULLs; neither
  * ever equi-joins, and NULL keeps the band explode from emitting rows).
  */
case class MinHashSignature(child: Expression, nPerm: Int)
  extends UnaryExpression {

  private val P = 2147483647L
  private val Mix = 2654435761L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Always nullable: an EMPTY shingle set yields NULL even when the
    * input column itself is non-nullable — without this override the
    * generated code would assign into a constant-false isNull slot. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<int> argument")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val m = (arr.getInt(i).toLong * Mix) % P
      var k = 0
      while (k < nPerm) {
        val v = ((2L * k + 3L) * m + (7919L * k + 1L)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
        final int $n = $a.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        } else {
          final long[] $mins = new long[$nPerm];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $i = 0; $i < $n; $i++) {
            final long $m = (((long) $a.getInt($i)) * ${Mix}L) % ${P}L;
            for (int $k = 0; $k < $nPerm; $k++) {
              final long $v = ((2L * $k + 3L) * $m + (7919L * $k + 1L)) % ${P}L;
              if ($v < $mins[$k]) $mins[$k] = $v;
            }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
