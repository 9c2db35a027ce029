package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Decode a binary blob as 16-bit little-endian signed PCM —
  * `pcm_decode(blob)` → array<bigint> of samples (trailing odd byte
  * ignored), the decoded view MultimodalQueries' audio family
  * (x08/x09/x11) is built on.
  *
  * Why a native expression: the SQL spelling of the same decode walks a
  * `transform(sequence(...))` whose per-sample lambda does TWO
  * substring+conv(16) parses of a hoisted hex string — higher-order
  * functions sit outside whole-stage codegen and the hex view doubles
  * the bytes before parsing them back. Measured at sf0.1 the hex path
  * costs ~3.7 s of x11's runtime; this expression is a generated tight
  * loop over the raw bytes (one OR + one sign-fold per sample) that
  * stays inside whole-stage codegen. The DuckDB oracle keeps the hex
  * spelling — the cross-engine contract is the VALUE, not the plan.
  *
  * Semantics shared with the oracle: sample i (0-based) =
  * b[2i] + 256·b[2i+1], values ≥ 32768 fold to v − 65536.
  */
case class PcmDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a binary argument")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length / 2
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      out(i) = if (v >= 32768) v - 65536 else v
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
        int $n = $bytes.length / 2;
        long[] $out = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          int $v = ($bytes[2 * $i] & 0xff) | (($bytes[2 * $i + 1] & 0xff) << 8);
          $out[$i] = ($v >= 32768) ? ($v - 65536) : $v;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PcmDecode =
    copy(child = newChild)

  override def prettyName: String = "pcm_decode"
}

/** Decode a binary blob as UNSIGNED byte values — `byte_values(blob)` →
  * array<bigint> of 0-255, the per-byte view the video-style operators
  * (x12 shot boundaries) frame-slice and histogram.
  *
  * Same rationale as [[PcmDecode]]: the SQL spelling reconstructed each
  * byte with substring+conv(16) over a hex-string view inside a
  * higher-order transform — interpreted, 2x the bytes, string-parsing
  * per byte (r15: most of x12's ~2 s exec). This is a codegen'd tight
  * loop over the raw bytes; the DuckDB oracle keeps the hex spelling —
  * the cross-engine contract is the value.
  */
case class ByteValues(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a binary argument")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
        long[] $out = new long[$bytes.length];
        for (int $i = 0; $i < $bytes.length; $i++) {
          $out[$i] = $bytes[$i] & 0xffL;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ByteValues =
    copy(child = newChild)

  override def prettyName: String = "byte_values"
}
