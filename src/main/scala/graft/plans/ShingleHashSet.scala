package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct character-k-gram shingle hashes of a string:
  * per position i, the base-31 Horner hash of code points i..i+k-1,
  * truncated to int — element-for-element the arithmetic of
  * `array_sort(array_distinct(transform(sequence(1, length(t)-k+1),
  *   i -> CAST(<horner over ascii(substring(t, i+j, 1))> AS INT))))`
  * and of the mirrored DuckDB list pipeline, but in ONE compiled pass
  * with a primitive sort instead of 5 interpreted lambda nodes per
  * character per shingle. The shingle build was the dominant cost of
  * every near-dup query (d02/d03/d04/d07 all start here).
  *
  * Short strings (fewer than k chars) yield an EMPTY array — matching
  * DuckDB's generate_series(1, n<1) = [] rather than Spark's descending
  * sequence(1, n<1) quirk, which the HOF form would hit.
  *
  * Only BMP code points hash identically to ascii(substring(..)) (both
  * engines' ascii() reads one code point; charAt reads a UTF-16 unit) —
  * the corpus is ASCII, as is any tokenizer-normalized text.
  */
case class ShingleHashSet(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string argument")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[UTF8String], k)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.plans.ShingleHashSet.compute($a, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}

object ShingleHashSet {
  /** One-pass shingle hash + sort + dedup; called from both interpreted
    * eval and the generated code (static call — the loop itself is
    * compiled Scala, so there is nothing left for codegen to beat). */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Int])
    val hs = new Array[Int](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31 + str.charAt(i + j).toInt; j += 1 }
      hs(i) = h.toInt
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 1
    var p = 1
    while (p < n) {
      if (hs(p) != hs(p - 1)) { hs(m) = hs(p); m += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, m))
  }
}
