package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions of a string (the
  * Rabin/FastCDC cut-point scan): `[0] ++ { i : w <= i <= len,
  * mix(horner_w(chars i-w+1..i) mod P) mod mask == 0 } ++ [len]`,
  * element-for-element the arithmetic of d16's HOF form
  * `concat(array(0), filter(transform(sequence(w, length(t)),
  *   i -> IF(((horner % P) * 2654435761) % P % mask = 0, i, -1)),
  *   i -> i > 0), array(length(t)))`
  * and of the mirrored DuckDB list pipeline — but ONE compiled pass
  * with a true rolling update (h' = (h - c_out * 31^(w-1)) * 31 +
  * c_in) instead of w interpreted char lookups per position. The HOF
  * form was the single heaviest query in the suite (~7 s at sf0.1);
  * the window recompute is O(n*w) with ~3 expression-tree nodes per
  * char lookup, this is O(n) compiled.
  *
  * The rolling Horner value stays exact in a signed 64-bit long for
  * w <= 12 ASCII/BMP chars (31^11 * 0xFFFF < 2^63), which covers any
  * practical CDC window; the constructor rejects larger windows.
  */
case class CdcBounds(child: Expression, w: Int, mask: Int)
  extends UnaryExpression {

  require(w >= 1 && w <= 12, "cdc_bounds window must be in [1, 12]")
  require(mask >= 1, "cdc_bounds mask must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string argument")
  }

  override def nullSafeEval(input: Any): Any =
    CdcBounds.compute(input.asInstanceOf[UTF8String], w, mask)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.plans.CdcBounds.compute($a, $w, $mask);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)

  override def prettyName: String = "cdc_bounds"
}

object CdcBounds {
  private val P = 2147483647L // 2^31 - 1
  private val MIX = 2654435761L

  def compute(s: UTF8String, w: Int, mask: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[java.lang.Long](16)
    out.add(0L)
    if (n >= w) {
      // 31^(w-1) for the rolling subtract
      var pow = 1L
      var k = 1
      while (k < w) { pow *= 31L; k += 1 }
      var h = 0L
      var i = 0
      while (i < w) { h = h * 31L + str.charAt(i).toLong; i += 1 }
      // i is the 0-based index ONE PAST the window; boundary positions
      // are 1-based window ends (i itself)
      var posEnd = w
      while (true) {
        if (((h % P) * MIX) % P % mask == 0L) out.add(posEnd.toLong)
        if (posEnd == n) {
          // exit after testing the final window
          posEnd = -1
        } else {
          h = (h - str.charAt(posEnd - w).toLong * pow) * 31L +
            str.charAt(posEnd).toLong
          posEnd += 1
        }
        if (posEnd < 0) return finish(out, n)
      }
    }
    finish(out, n)
  }

  private def finish(out: java.util.ArrayList[java.lang.Long], n: Int): GenericArrayData = {
    out.add(n.toLong)
    val arr = new Array[Long](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }
}
