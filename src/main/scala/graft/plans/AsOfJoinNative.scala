package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator tier (SURVEY.md §7.3
  * preference (c)): LogicalPlan + planner Strategy + physical exec,
  * registered through [[graft.GraftExtensions]]
  * (`injectPlannerStrategy`). The composed window-based variant
  * ([[graft.operators.AsOfJoin]]) stays as the portable fallback; both
  * satisfy the same DuckDB ASOF JOIN oracle.
  *
  * Semantics: for every left row, attach the latest right row with
  * rightTime <= leftTime (inclusive) in the same key group; no match →
  * nulls (left-outer). Caller guarantees (keys, rightTime) unique in
  * the right input.
  *
  * Physical algorithm: EnsureRequirements hash-clusters both children
  * on the keys and sorts them by (keys, time); each partition pair then
  * merges in ONE streaming pass — advance the right side while its
  * (key, time) <= the current left row's, holding only the single most
  * recent right row. O(L + R) per partition and O(1) state, vs the
  * window composition's sort + running-frame evaluation over the
  * unioned inputs.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTimeE = leftTime
    val rTimeE = rightTime
    val keyTypes = lKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeE), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeE), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val outExprs = (leftOut ++ rightOut).zipWithIndex.map {
        case (a, i) => BoundReference(i, a.dataType, nullable = true)
      }
      val outProj = UnsafeProjection.create(outExprs)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var heldKey: InternalRow = null
      var heldRight: InternalRow = null

      lIter.map { l =>
        val lk = lKeyProj(l).copy()
        val lTimeRow = lTimeProj(l)
        // a NULL left time matches nothing (ASOF `ts >= r.ts` is unknown
        // for NULL) — without this check getLong(0) would read the null
        // slot as 0 and match the row as if at the epoch
        val lNull = lTimeRow.isNullAt(0)
        val lt = if (lNull) Long.MinValue else lTimeRow.getLong(0)
        var advancing = !lNull
        while (advancing && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) {
            rBuf.next() // right key already behind every remaining left row
          } else if (cmp == 0 && rTimeProj(r).isNullAt(0)) {
            rBuf.next() // NULL right time can never be the latest <= lt
          } else if (cmp == 0 && rTimeProj(r).getLong(0) <= lt) {
            heldKey = rk.copy()
            heldRight = rBuf.next().copy()
          } else {
            advancing = false
          }
        }
        val matched = !lNull && heldRight != null && heldKey != null &&
          keyOrd.compare(heldKey, lk) == 0
        joined(l, if (matched) heldRight else nullRight)
        outProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
