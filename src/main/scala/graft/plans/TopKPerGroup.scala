package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable

/** Custom whole-operator plan node: exact top-k rows per group WITHOUT
  * sorting whole groups (SURVEY.md §7.3 ladder rung (c): custom
  * LogicalPlan + SparkStrategy + SparkPlan).
  *
  * The stock plan for "k rows per group" is
  * `Filter(rn <= k, Window(row_number))`, whose WindowExec SORTS every
  * partition on (group, order) — O(n log n) per partition and a full
  * sort buffer even when k=10 and groups hold billions of rows. This
  * operator keeps a k-bounded heap per group instead: O(n log k) time,
  * O(groups·k) memory, no sort. The required child distribution is
  * clustering on the group keys, so EnsureRequirements inserts exactly
  * the same single hash shuffle the window plan needs — strictly less
  * work overall.
  */
final case class TopKPerGroup(groupExprs: Seq[Expression],
                              orderExprs: Seq[SortOrder], k: Int,
                              child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(groupExprs: Seq[Expression],
                                  orderExprs: Seq[SortOrder], k: Int,
                                  child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Same-group rows must colocate; a hash shuffle on the group keys is
    * inserted when the child isn't already clustered (e.g. bucketed). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupProjTemplate = groupExprs
    val orderTemplate = orderExprs
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val groupProj = UnsafeProjection.create(groupProjTemplate, childOutput)
      val ordering = RowOrdering.create(orderTemplate, childOutput)
      // per-group max-heap of the k best rows: head = worst kept row,
      // evicted when a better one arrives
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      rows.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.lt(row, heap.head)) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, h) => h.toSeq.sorted(ordering) }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. Registered via
  * `spark.experimental.extraStrategies` (programmatic) or
  * GraftExtensions (config path). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
