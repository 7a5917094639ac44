package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native top-k-per-key — custom LogicalPlan + Strategy + exec like
  * [[AsOfJoinNative]]. Replaces the `row_number().over(window) <= k`
  * composition for the common "k best rows per group" query
  * (SURVEY.md §2.6 L-family; q13/s33-shaped plans).
  *
  * Why a custom exec: the window composition must SORT every partition
  * fully on (keys, order) before the rank filter discards all but k
  * rows per key — O(n log n) comparisons and a full materialized sort
  * for output that is O(#keys × k). This exec keeps a bounded heap per
  * key (size ≤ k) in one streaming pass: O(n log k), no sort, memory
  * O(#keys × k) per partition. At 100 TB the win compounds: the
  * exchange still hash-partitions by key, but the per-partition sort —
  * the expensive half of the window plan — disappears entirely.
  *
  * Semantics: for each key group, the k smallest rows under `order`
  * (pass DESC SortOrders for "largest"), ranked 1..k with no gaps.
  * `order` must be a TOTAL order (include a tiebreaker column) for
  * deterministic output — same requirement the oracle-checked window
  * variant already had.
  */
case class TopKPerKeyPlan(child: LogicalPlan, grouping: Seq[Expression],
    order: Seq[SortOrder], k: Int, rankAttr: AttributeReference)
  extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKeyPlan = copy(child = newChild)
}

case class TopKPerKeyExec(child: SparkPlan, grouping: Seq[Expression],
    order: Seq[SortOrder], k: Int, rankAttr: Attribute)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Hash-cluster on the keys so each key group lands in one partition;
    * deliberately NO requiredChildOrdering — avoiding the sort is the
    * point of the operator. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val groupingE = grouping
    val orderE = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupingE, childOut)
      val rowOrd = RowOrdering.create(orderE, childOut)
      // max-heap under the sort order: head is the WORST retained row,
      // evicted when a better candidate arrives with the heap full
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val pq = new mutable.PriorityQueue[InternalRow]()(rowOrd)
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
          case Some(pq) =>
            if (pq.size < kk) pq.enqueue(row.copy())
            else if (rowOrd.compare(row, pq.head) < 0) {
              pq.dequeue()
              pq.enqueue(row.copy())
            }
        }
      }
      val outExprs = (childOut :+ rankAttr).zipWithIndex.map {
        case (a, i) => BoundReference(i, a.dataType, a.nullable)
      }
      val outProj = UnsafeProjection.create(outExprs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.iterator.flatMap { case (_, pq) =>
        // dequeue order is worst-first; reverse → rank 1 is the best
        val worstFirst: Seq[InternalRow] = pq.dequeueAll
        worstFirst.reverseIterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, i + 1)
          outProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(child, g, o, k, rank) =>
      TopKPerKeyExec(planLater(child), g, o, k, rank) :: Nil
    case _ => Nil
  }
}
