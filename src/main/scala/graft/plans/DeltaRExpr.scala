package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd ΔR(η1,φ1,η2,φ2) = √(Δη² + Δφ²) with Δφ wrapped to
  * [0, π] — the hot kernel of every jet-cleaning / isolation join
  * (reference python/math_tools.py:220-224, stage1/processor.py:561-577).
  *
  * As a single Expression with `doGenCode` the whole computation inlines
  * into whole-stage codegen as straight-line Java — no virtual calls per
  * sub-expression, no boxing — which matters when it sits inside a
  * per-event cross-join condition evaluated billions of times at scale.
  */
case class DeltaRExpr(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
  extends Expression with QuaternaryLike[Expression] with ImplicitCastInputTypes {

  // decimal/int inputs are coerced to double by the analyzer
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  @inline private def compute(eta1: Double, phi1: Double,
                              eta2: Double, phi2: Double): Double = {
    val de = math.abs(eta1 - eta2)
    val tau = 2.0 * math.Pi
    val raw = (((phi1 - phi2 + math.Pi) % tau) + tau) % tau
    val dp = math.abs(raw - math.Pi)
    math.sqrt(de * de + dp * dp)
  }

  override def eval(input: InternalRow): Any = {
    val a = first.eval(input); val b = second.eval(input)
    val c = third.eval(input); val d = fourth.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else compute(
      a.asInstanceOf[Number].doubleValue(), b.asInstanceOf[Number].doubleValue(),
      c.asInstanceOf[Number].doubleValue(), d.asInstanceOf[Number].doubleValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e1 = first.genCode(ctx); val p1 = second.genCode(ctx)
    val e2 = third.genCode(ctx); val p2 = fourth.genCode(ctx)
    val de = ctx.freshName("de"); val raw = ctx.freshName("raw")
    val dp = ctx.freshName("dp"); val tau = ctx.freshName("tau")
    val anyNull =
      s"${e1.isNull} || ${p1.isNull} || ${e2.isNull} || ${p2.isNull}"
    ev.copy(code =
      code"""
        ${e1.code}
        ${p1.code}
        ${e2.code}
        ${p2.code}
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          final double $tau = 2.0 * Math.PI;
          final double $de = Math.abs(${e1.value} - ${e2.value});
          final double $raw =
            (((${p1.value} - ${p2.value} + Math.PI) % $tau) + $tau) % $tau;
          final double $dp = Math.abs($raw - Math.PI);
          ${ev.value} = Math.sqrt($de * $de + $dp * $dp);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): DeltaRExpr =
    copy(first = f, second = s, third = t, fourth = q)

  override def prettyName: String = "delta_r"
}
