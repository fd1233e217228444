package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through the custom as-of node — the optimizer-Rule
  * leg of the whole-operator extension. Catalyst's own ColumnPruning
  * does not know [[AsOfJoin]], so without this rule a query selecting
  * two columns from an as-of join of WIDE frames would scan and
  * shuffle every column of both sides — precisely the 100 TB failure
  * mode pruning exists to prevent. The rewrite is the standard shape:
  * when a Project above the node references a strict subset of a
  * child's output, push a narrowing Project into that child (always
  * keeping the join keys and time columns the node itself consumes);
  * FileSourceStrategy then folds the narrow Project into the scan's
  * ReadSchema. Guarded to fire only when it actually narrows, so the
  * fixed-point batch terminates. Registered beside the strategy in
  * both deployment paths (GraftExtensions /
  * spark.experimental.extraOptimizations via AsOfJoinOps).
  */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, a: AsOfJoin) =>
      val needed = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet((a.leftKeys ++ a.rightKeys :+ a.leftTime :+ a.rightTime)
          .flatMap(_.references))
      val lKeep = a.left.output.filter(needed.contains)
      val rKeep = a.right.output.filter(needed.contains)
      if (lKeep.length < a.left.output.length ||
          rKeep.length < a.right.output.length) {
        val newLeft =
          if (lKeep.length < a.left.output.length)
            Project(lKeep.map(_.asInstanceOf[NamedExpression]), a.left)
          else a.left
        val newRight =
          if (rKeep.length < a.right.output.length)
            Project(rKeep.map(_.asInstanceOf[NamedExpression]), a.right)
          else a.right
        Project(projectList, a.copy(left = newLeft, right = newRight))
      } else p
  }
}
