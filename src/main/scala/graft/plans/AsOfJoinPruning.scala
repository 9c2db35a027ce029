package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through AsOfJoinPlan (SURVEY §2.7 path: custom
  * `Rule[LogicalPlan]`).
  *
  * Catalyst's ColumnPruning only understands built-in nodes, so a
  * custom operator is a pruning BARRIER: `asof.select("one_col")`
  * still scans and shuffles every column of both sides. This rule
  * closes that gap the same way ColumnPruning treats Join — when a
  * parent Project needs only a subset of the join's output, push a
  * Project onto each child keeping (needed output columns ∪ the
  * join's own key/ts/tie-break references). The inserted Projects
  * then combine with the standard rules, so filters and pruned
  * schemas keep flowing down to the parquet scans. At 100 TB the
  * difference is scanning 2 columns instead of 50 through every
  * as-of enrichment.
  *
  * Fixpoint safety: the rule fires only when it strictly narrows a
  * child's output, so a second pass leaves the plan unchanged.
  */
object AsOfJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet((Seq(j.leftKey, j.rightKey, j.leftTs, j.rightTs) ++
          j.rightTieBreak).flatMap(_.references))
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.size == child.output.size) child
        else Project(keep.map(_.asInstanceOf[NamedExpression]), child)
      }
      val (nl, nr) = (prune(j.left), prune(j.right))
      if ((nl eq j.left) && (nr eq j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
  }
}
