package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite (SURVEY.md §7.3 ladder — injected `Rule[LogicalPlan]`):
  * turn the stock top-k-per-group plan
  *
  *   Project(cols, Filter(rn <= k, Window(row_number over (p, o))))
  *
  * into the sort-free [[TopKPerGroup]] node whenever the rank column is
  * projected away — the ubiquitous "rank then filter then drop the rank"
  * idiom users write, planned as O(n log k) heaps instead of WindowExec's
  * full per-partition sort.
  *
  * Fires only when provably safe:
  *   - the Window computes EXACTLY one expression: an unreferenced
  *     `row_number()` (any other window function, or a kept rank column,
  *     disables the rewrite — the node cannot reproduce rank values);
  *   - the filter is a plain `rn <= lit` / `rn < lit` / `rn = 1` on that
  *     column (conjunctions stay on the window path);
  *   - the partition spec is non-empty (global top-k already plans as
  *     TakeOrderedAndProject upstream, and ClusteredDistribution(Nil) is
  *     meaningless).
  *
  * Tie semantics match the window path: row_number breaks order ties
  * arbitrarily-but-consistently within a sort; the heap does the same
  * under the identical SortOrder. Queries needing deterministic output
  * must provide a total order either way.
  *
  * Registration: `GraftExtensions` (config path) or
  * `spark.experimental.extraOptimizations` (programmatic/tests).
  *
  * Composes with Spark's own `InferWindowGroupLimit`, which has already
  * inserted a map-side `WindowGroupLimit` below the Window by the time
  * user rules run: that partial per-partition top-k stays as this node's
  * child, pre-pruning the shuffle — the rewritten plan is
  * `TopKPerGroup ← WindowGroupLimit ← scan`, partial top-k on the map
  * side and heap-based exact top-k after the exchange.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
            part, order, child, _)))
        if part.nonEmpty && order.nonEmpty &&
          spec.partitionSpec == part && spec.orderSpec == order &&
          !projectList.exists(_.references.contains(alias.toAttribute)) =>
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          Project(projectList, TopKPerGroup(part, order, k, child))
        case _ => p
      }
  }
}
