package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The whole-operator tier of custom-operator integration (SURVEY §2.5 —
  * joins are ABSENT in the reference; this is the beyond-reference scale
  * path): a first-class backward as-of join operator — logical node,
  * planner strategy, and physical sort-merge execution — registered through
  * [[SparkSessionExtensions]].
  *
  * Versus the union+window formulation ([[graft.operators.AsofJoin.backward]]),
  * this physical operator:
  *   - shuffles each side ONCE on the keys and streams a single
  *     two-pointer merge pass per partition — no unioned (|L|+|R|)-row
  *     window state, no payload-struct materialization;
  *   - needs only (keys, time) sort within partitions, which
  *     EnsureRequirements plans as the same exchange+sort a sort-merge
  *     equi-join would get — AQE still re-plans partition counts at runtime;
  *   - holds O(1) state per partition (the current candidate right row) —
  *     nothing accumulates, so a 100 TB history side streams through.
  *
  * Left-outer semantics: every left row appears once, right columns
  * null-padded when no right row with `rightTime <= leftTime` (strict `<`
  * when `inclusive = false`) shares its keys.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    inclusive: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, inc) =>
      AsofJoinExec(lk, rk, lt, rt, inc, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsofJoinPlan {
  /** `injectPlannerStrategy` target. */
  val extension: SparkSessionExtensions => Unit =
    _.injectPlannerStrategy(_ => AsofJoinStrategy)
}

/** Physical backward as-of join: co-partitioned on the keys, both sides
  * sorted by (keys, time), one streaming merge pass per partition.
  *
  * Merge invariant: left rows arrive key-time-ascending, so the right
  * pointer only ever moves forward; `candidate` holds the most recent right
  * row at-or-before the current left row's time within the current key
  * group, and is invalidated on key change. Right rows are copied into the
  * candidate slot only (one live copy per partition at a time).
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    inclusive: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // output order: the left side's (keys, time) order is preserved
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val inc = inclusive
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val ltB = leftTime
    val rtB = rightTime
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeEval = UnsafeProjection.create(Seq(ltB), lOut)
      val rTimeEval = UnsafeProjection.create(Seq(rtB), rOut)
      val ord = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(ltB.dataType))

      new Iterator[InternalRow] {
        private var rCur: InternalRow = advanceRight()
        private var candidate: InternalRow = null
        private var candidateKey: UnsafeRow = null

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          if (candidateKey != null && ord.compare(candidateKey, lKey) != 0) {
            candidate = null; candidateKey = null
          }
          val lT = lTimeEval(l).copy()
          var done = false
          while (!done && rCur != null) {
            val rKey = rKeyProj(rCur)
            val c = ord.compare(rKey, lKey)
            if (c < 0) rCur = advanceRight()
            else if (c == 0) {
              val rT = rTimeEval(rCur)
              val tc = timeOrd.compare(rT, lT)
              if (tc < 0 || (inc && tc == 0)) {
                candidate = rCur.copy()
                candidateKey = lKey.copy()
                rCur = advanceRight()
              } else done = true
            } else done = true
          }
          resultProj(joined(l, if (candidate != null) candidate else nullRight))
        }
      }
    }
  }
}
