package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: logical node + planner strategy + physical
  * sort-merge operator (SURVEY.md §7.4 escalation (c) — the full custom
  * Catalyst path, registered via [[GraftExtensions]]).
  *
  * Semantics: for each left row, the LATEST right row with
  * `rightTs <= leftTs` in the same key group; unmatched left rows get
  * nulls (left-outer). Identical to the composed formulation in
  * [[graft.operators.AsOf.asOfJoin]] (tagged union + carry-forward
  * window), which remains the portable baseline.
  *
  * Why a physical operator: the union formulation shuffles
  * |left| + |right| rows and runs a window with one carried column per
  * right value; this operator shuffles each side once on its own keys,
  * sorts within partitions ((keys, ts) — EnsureRequirements inserts the
  * exchanges/sorts from the declared requirements), and then streams BOTH
  * sides through a single merge pass holding O(1) state (the latest
  * matching right values). No union blow-up, no window state, and the
  * output preserves the left ordering.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightVals: Seq[NamedExpression])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightVals: Seq[NamedExpression])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.toAttribute.withNullability(true))

  // Both sides hash-partitioned on their keys (co-partitioned by
  // EnsureRequirements) and sorted by (keys, ts) — same contract as
  // sort-merge join.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val rValsB = rightVals
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val rValProj = UnsafeProjection.create(rValsB, rightOut)
      val lTsBound = BindReferences.bindReference(lTsB, leftOut)
      val rTsBound = BindReferences.bindReference(rTsB, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
        .asInstanceOf[Ordering[Any]]
      val nullRight = new GenericInternalRow(rValsB.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var heldKey: InternalRow = _   // key of the held right row
        private var heldVals: InternalRow = _  // its projected values

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsV = lTsBound.eval(lRow)
          // Advance the right side up to (and including) the last row with
          // key == lKey and ts <= lTs, remembering that row's values.
          var advancing = lTsV != null
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val cmp = keyOrd.compare(rKeyProj(rRow), lKey)
            if (cmp < 0) rBuf.next() // stale key; held is guarded by key check
            else if (cmp == 0) {
              val rTsV = rTsBound.eval(rRow)
              if (rTsV != null && tsOrd.compare(rTsV, lTsV) <= 0) {
                heldKey = lKey.copy()
                heldVals = rValProj(rRow).copy()
                rBuf.next()
              } else advancing = false
            } else advancing = false
          }
          val matched = heldKey != null && keyOrd.compare(heldKey, lKey) == 0
          joined(lRow, if (matched) heldVals else nullRight)
        }
      }
    }
  }
}
