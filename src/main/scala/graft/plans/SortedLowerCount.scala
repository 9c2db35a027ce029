package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Count of elements <= x in a SORTED constant double array — the bin-index
  * kernel of every table-driven correction lookup (JEC eta bins, Rochester
  * eta/phi grids, JES knot vectors).
  *
  * Replaces the `size(filter(typedLit(lows), b => b <= x))` spelling: array
  * higher-order functions are CodegenFallback, so that form knocked the whole
  * projection out of whole-stage codegen AND allocated a filtered array per
  * row per call (measured: l23 spends seconds interpreting three 36-81
  * element filters over 600k rows). This inlines as a straight-line early-exit
  * scan over a shared double[] — no allocation, stays inside codegen.
  *
  * Exact-match semantics with the HOF spelling, including the edges:
  * a NULL x makes every `b <= x` null (non-true), so the count is 0; a NaN x
  * is the LARGEST double under Spark SQL's total order (unlike Java's IEEE
  * `<=`), so `b <= NaN` is true for every b and the count is the array
  * length (pinned in SortedLowerCountSpec). The HOF returned size(...) = a
  * plain int, never NULL — hence non-nullable IntegerType.
  */
case class SortedLowerCount(child: Expression, lows: Seq[Double])
  extends Expression with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  // the early-exit scan silently undercounts on an unsorted table, so
  // misuse must be impossible: checked once, driver-side, at plan build
  require(lows.sliding(2).forall(p => p.size < 2 || p(0) <= p(1)),
    "sorted_lower_count requires an ascending-sorted lows table")

  private lazy val arr: Array[Double] = lows.toArray

  private def count(x: Double): Int = {
    // early exit is safe: lows is sorted ascending (callers parse
    // contiguous bin tables). NaN is the max in Spark's ordering.
    if (java.lang.Double.isNaN(x)) return arr.length
    var i = 0
    while (i < arr.length && arr(i) <= x) i += 1
    i
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else count(v.asInstanceOf[Number].doubleValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val a = ctx.addReferenceObj("lows", arr, "double[]")
    val i = ctx.freshName("i")
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = 0;
        if (!${c.isNull}) {
          if (Double.isNaN(${c.value})) {
            ${ev.value} = $a.length;
          } else {
            int $i = 0;
            while ($i < $a.length && $a[$i] <= ${c.value}) $i++;
            ${ev.value} = $i;
          }
        }
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedLowerCount =
    copy(child = newChild)

  override def prettyName: String = "sorted_lower_count"
}
