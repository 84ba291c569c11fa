package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
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
  *
  * Memory safety: per-task heap state is O(live groups · k). When the
  * number of live groups in a partition exceeds `maxGroupsInMemory`, the
  * task degrades to the sort-based path WindowExec would have used —
  * current heap contents plus all remaining rows go through a spillable
  * [[UnsafeExternalRowSorter]] on (group, order) and the top-k-per-run is
  * emitted from the sorted stream. The handoff is lossless: a row evicted
  * from a k-bounded heap was already beaten by k better rows of its own
  * group, so it can never belong to the true top-k regardless of rows
  * that arrive later.
  */
final case class TopKPerGroup(groupExprs: Seq[Expression],
                              orderExprs: Seq[SortOrder], k: Int,
                              child: LogicalPlan,
                              maxGroupsInMemory: Int = TopKPerGroup.DefaultMaxGroups)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxGroupsInMemory > 0, s"maxGroupsInMemory must be positive, got $maxGroupsInMemory")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Live-group ceiling before a task falls back to the spillable sort
    * path: heap state is bounded by maxGroups·k rows (~64k groups of
    * k=10 100-byte rows ≈ 64 MB), independent of group cardinality. */
  val DefaultMaxGroups: Int = 1 << 16
}

final case class TopKPerGroupExec(groupExprs: Seq[Expression],
                                  orderExprs: Seq[SortOrder], k: Int,
                                  child: SparkPlan,
                                  maxGroupsInMemory: Int) extends UnaryExecNode {
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
    val spillThreshold = maxGroupsInMemory
    child.execute().mapPartitions { rows =>
      val groupProj = UnsafeProjection.create(groupProjTemplate, childOutput)
      val ordering = RowOrdering.create(orderTemplate, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // per-group max-heap of the k best rows: head = worst kept row,
      // evicted when a better one arrives
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var sorter: UnsafeExternalRowSorter = null

      def asUnsafe(row: InternalRow): UnsafeRow = row match {
        case u: UnsafeRow => u
        case other => toUnsafe(other)
      }

      def startSpill(): Unit = {
        // sort on (group, order): group runs become contiguous, rows best-first
        val fullOrder = groupProjTemplate.map(e => SortOrder(e, Ascending)) ++ orderTemplate
        val sortOrdering = RowOrdering.create(fullOrder, childOutput)
        val schema = StructType(childOutput.map(a => StructField(a.name, a.dataType, a.nullable)))
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            result.isNull = false; result.value = 0L; result
          }
        }
        sorter = UnsafeExternalRowSorter.create(
          schema, sortOrdering, PrefixComparators.LONG, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        heaps.valuesIterator.foreach(_.foreach(r => sorter.insertRow(asUnsafe(r))))
        heaps.clear()
      }

      rows.foreach { row =>
        if (sorter != null) sorter.insertRow(asUnsafe(row))
        else {
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
          if (heaps.size > spillThreshold) startSpill()
        }
      }

      if (sorter == null)
        heaps.iterator.flatMap { case (_, h) => h.toSeq.sorted(ordering) }
      else {
        // sorted stream → emit the first `limit` rows of each group run
        var curKey: UnsafeRow = null
        var emitted = 0
        sorter.sort().filter { row =>
          val key = groupProj(row)
          if (curKey == null || key != curKey) {
            curKey = key.copy()
            emitted = 0
          }
          emitted += 1
          emitted <= limit
        }
      }
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
    case TopKPerGroup(g, o, k, child, maxGroups) =>
      TopKPerGroupExec(g, o, k, planLater(child), maxGroups) :: Nil
    case _ => Nil
  }
}
