package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All `nTables` hyperplane-LSH band values of an embedding in one
  * generated loop — the random-projection signature of Charikar's
  * SimHash family (STOC 2002), as used by d05/v02-style candidate
  * gates: band t is the little-endian integer of `bandBits` sign bits,
  * bit r = [ Σ_j coef(t·bandBits+r, j) · emb[j] ≥ 0 ], with the
  * deterministic pseudo-random coefficients
  * `coef(p, j) = sin(seedBase + p·dims + j + 0.5)` shared
  * literal-for-literal with the DuckDB oracle spelling.
  *
  * Why a native expression: the same math as a Column `array(...)` of
  * unrolled dot products is nTables·bandBits·dims multiply terms, each
  * an `element_at` with its own bounds-check block — after
  * CollapseProject one projection method exceeds janino's 64 KB limit
  * and the whole stage silently drops to interpreted eval (observed on
  * d05: 4 of its 5 stages fell back). The loop form is compact
  * bytecode over a referenced coefficient matrix and stays inside
  * whole-stage codegen.
  *
  * The accumulation order is ascending j — identical to the unrolled
  * `c0·e0 + c1·e1 + …` left fold, so results are bit-for-bit the same
  * as the expression-tree form. Elements are read as float and widened
  * to double exactly like `CAST(element_at(e, j+1) AS DOUBLE)`.
  * Arrays shorter than `dims` yield NULL. NULL ELEMENTS are read as
  * 0.0 (primitive `getFloat` on a null slot) rather than propagating
  * null like the element_at form would — callers feed non-null
  * embedding vectors; the divergence is documented, not defended,
  * because a per-element null scan would cost more than the dot.
  */
case class HyperplaneBands(child: Expression, nTables: Int, bandBits: Int,
    dims: Int, seedBase: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float> argument")
  }

  /** coef(p, j), flattened row-major — reference object for codegen. */
  @transient lazy val coefs: Array[Double] = {
    val nPlanes = nTables * bandBits
    Array.tabulate(nPlanes * dims) { i =>
      val p = i / dims; val j = i % dims
      math.sin(seedBase + p * dims + j + 0.5)
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dims) return null
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bv = 0
      var r = 0
      while (r < bandBits) {
        val p = t * bandBits + r
        var acc = 0.0
        var j = 0
        while (j < dims) {
          acc += coefs(p * dims + j) * arr.getFloat(j).toDouble
          j += 1
        }
        if (acc >= 0.0) bv |= (1 << r)
        r += 1
      }
      out(t) = bv
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val w = ctx.addReferenceObj("hplaneCoefs", coefs, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val bv = ctx.freshName("bv"); val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      s"""
        if ($arr.numElements() < $dims) {
          ${ev.isNull} = true;
        } else {
          int[] $out = new int[$nTables];
          for (int $t = 0; $t < $nTables; $t++) {
            int $bv = 0;
            for (int $r = 0; $r < $bandBits; $r++) {
              final int $p = $t * $bandBits + $r;
              double $acc = 0.0;
              for (int $j = 0; $j < $dims; $j++) {
                $acc += $w[$p * $dims + $j] * (double) $arr.getFloat($j);
              }
              if ($acc >= 0.0) $bv |= (1 << $r);
            }
            $out[$t] = $bv;
          }
          ${ev.value} =
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bands"
}
