package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Automatic range-join rewrite (SURVEY §2.7 path: custom
  * `Rule[LogicalPlan]` that changes the JOIN ALGORITHM, not just the
  * plan shape).
  *
  * An inner join whose only cross-side predicates are
  * `lo <= x AND x < hi` has no equi-key, so Spark plans a nested-loop
  * join — O(|L|·|R|) comparisons even when one side broadcasts. The
  * repo's j11/j13 show the manual fix: explode each interval into the
  * fixed-width buckets it spans and equi-join on the bucket with the
  * range predicate as a residual. This rule performs that rewrite
  * AUTOMATICALLY:
  *
  *   Join(L, R, lo <= x && x < hi)
  *     ⇒ Project(origOutput,
  *         Join(Generate(explode(sequence(lo div W, hi div W)), L),
  *              Project(R :+ x div W),
  *              bucket_l = bucket_r && lo <= x && x < hi))
  *
  * (div = floor division, exact on longs). The residual keeps the
  * rewrite LOSSLESS for any bucket width; the width only tunes the
  * explode factor versus bucket selectivity — exactly the contract of
  * a range-join "bin size" hint. Gated on the session conf
  * `spark.graft.rangeJoin.bucketWidth` (positive long; unset = rule
  * inactive), because a good width is data knowledge the user has and
  * the optimizer does not: it should be ≥ the typical interval length
  * (each interval then explodes into ≤ 2 buckets).
  *
  * Scope guards: inner joins; all range endpoints LongType and
  * deterministic; bounds both from one side, probe from the other; no
  * existing cross-side equality conjunct (those already hash-join).
  * Fixpoint safe: the rewritten join HAS an equality conjunct, so the
  * rule cannot re-fire on its own output.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try {
      conf.getConfString(WidthConf, "").toLong
    } catch { case _: NumberFormatException => -1L }
    if (width <= 0) return plan
    plan.transformDown {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, width).getOrElse(j)
    }
  }

  /** exprs fully resolved from `side` (and non-empty references). */
  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType == LongType

  private def floorDiv(e: Expression, w: Long): Expression = {
    val lw = Literal(w, LongType)
    IntegralDivide(Subtract(e, Pmod(e, lw)), lw)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(e: Expression): Boolean =
      e.references.intersect(left.outputSet).nonEmpty &&
        e.references.intersect(right.outputSet).nonEmpty
    // an existing cross-side equality already gives a hash join key
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(EqualTo(a, b))
      case EqualNullSafe(a, b) => crossSide(EqualNullSafe(a, b))
      case _ => false
    }
    if (hasEqui) return None

    // normalize every comparison to (smaller, larger)
    def asLeq(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }
    val leqs = conjuncts.flatMap(c => asLeq(c).map(ab => (c, ab._1, ab._2)))

    // find x with lo <= x (lower) and x <= hi (upper), bounds from the
    // OPPOSITE side of x; try both orientations
    def find(boundSide: LogicalPlan, probeSide: LogicalPlan):
        Option[(Expression, Expression, Expression)] =
      (for {
        (_, lo, x1) <- leqs if from(lo, boundSide) && from(x1, probeSide)
        (_, x2, hi) <- leqs if x2.semanticEquals(x1) && from(hi, boundSide)
      } yield (lo, x1, hi)).headOption

    val leftBound = find(left, right)
    val rightBound = if (leftBound.isDefined) None else find(right, left)
    val (boundsOnLeft, lo, x, hi) = (leftBound, rightBound) match {
      case (Some((l, p, h)), _) => (true, l, p, h)
      case (_, Some((l, p, h))) => (false, l, p, h)
      case _ => return None
    }

    val bucketAttr =
      AttributeReference("_graft_range_bucket", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without a zone id it stays
    // UNRESOLVED and the optimizer's plan-change validator rejects the
    // rewrite (integer sequences never use it, but resolved requires it)
    val gen = Explode(Sequence(floorDiv(lo, width), floorDiv(hi, width),
      None, Some(conf.sessionLocalTimeZone)))
    val probeAlias = Alias(floorDiv(x, width), "_graft_range_probe")()
    val (newLeft, newRight) =
      if (boundsOnLeft)
        (Generate(gen, Nil, outer = false, None, Seq(bucketAttr), left),
          Project(right.output :+ probeAlias, right))
      else
        (Project(left.output :+ probeAlias, left),
          Generate(gen, Nil, outer = false, None, Seq(bucketAttr), right))
    val newCond = And(EqualTo(bucketAttr, probeAlias.toAttribute), cond)
    val newJoin = Join(newLeft, newRight, Inner, Some(newCond), j.hint)
    Some(Project(j.output.map(_.asInstanceOf[NamedExpression]), newJoin))
  }
}
