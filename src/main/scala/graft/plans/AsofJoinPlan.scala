package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical backward as-of join (SURVEY §7.3 tier (c): custom
  * LogicalPlan + Strategy + SparkPlan). Children are already-resolved
  * plans; `leftBy`/`rightBy` are the per-side key attributes,
  * `leftTime`/`rightTime` the per-side event-time attributes,
  * `rightPayload` the right columns carried into the output (nullable).
  * Semantics identical to graft.ts.AsofJoin: for each left row, the
  * latest right row of the same key with rightTime <= leftTime. */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Attribute,
    rightBy: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical merge as-of join: both sides hash-clustered on the key and
  * sorted by (key, time) — the planner inserts the single exchange+sort
  * per side via requiredChildDistribution/Ordering — then one streaming
  * dual-pointer merge per partition with O(1) state (the trailing right
  * row per key). This is the reference's SortedAsofExecutor loop
  * (pyquokka/ts_executors.py:324-383) as a first-class Spark operator:
  * no unioned-row window materialization (the unionTag formulation
  * carries null-padded rows through the sort), and the right side never
  * produces output rows at all. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Attribute,
    rightBy: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  // orderable payload attrs extend the right-side sort (round-10
  // tie-proofing): the merge loop keeps the LAST right row with
  // time <= left time, so among time-tied quotes the max payload tuple
  // wins deterministically — identical to the unionTag formulation's
  // window tie-break and to the streaming as-of's (ts, value) pick.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightTime, Ascending)) ++
      rightPayload.filter(a =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lByIdx = left.output.indexWhere(_.exprId == leftBy.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rByIdx = right.output.indexWhere(_.exprId == rightBy.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val payloadIdx = rightPayload.map(p =>
      right.output.indexWhere(_.exprId == p.exprId))
    val byType = leftBy.dataType
    val timeTypeL = leftTime.dataType
    val timeTypeR = rightTime.dataType
    val nPayload = rightPayload.size
    val payloadTypes = rightPayload.map(_.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(byType)
      val project = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(nPayload)(null))
      // numeric/timestamp event times compare as their ordering too
      val timeOrd = TypeUtils.getInterpretedOrdering(timeTypeL)

      new Iterator[InternalRow] {
        private val rBuf = rIt.buffered
        private var lastKey: Any = null
        private var lastQuote: InternalRow = null // copied row, key == lastKey

        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = l.get(lByIdx, byType)
          val lT = l.get(lTimeIdx, timeTypeL)
          // advance the right side to the last row with key <= lKey and
          // (key < lKey is skipped; key == lKey requires time <= lT)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rKey = r.get(rByIdx, byType)
            val cmp =
              if (rKey == null && lKey == null) 0
              else if (rKey == null) -1
              else if (lKey == null) 1
              else keyOrd.asInstanceOf[Ordering[Any]].compare(rKey, lKey)
            if (cmp < 0) { rBuf.next() } // other key, before ours: discard
            else if (cmp == 0) {
              val rT = r.get(rTimeIdx, timeTypeR)
              if (rT == null) { rBuf.next() } // undefined quote time: never a match
              else if (lT != null &&
                  timeOrd.asInstanceOf[Ordering[Any]].compare(rT, lT) <= 0) {
                lastKey = rKey
                lastQuote = rBuf.next().copy()
              } else advancing = false
            } else advancing = false
          }
          // A null left event time has no defined "as of" point → null payload.
          val keyMatches = lT != null && lastQuote != null && (
            (lastKey == null && lKey == null) ||
            (lastKey != null && lKey != null &&
              keyOrd.asInstanceOf[Ordering[Any]].compare(lastKey, lKey) == 0))
          val rightRow =
            if (keyMatches)
              InternalRow.fromSeq(payloadIdx.zip(payloadTypes).map {
                case (i, t) => lastQuote.get(i, t)
              })
            else nullRight
          project(joined(l, rightRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy lowering [[AsofJoinNode]] → [[AsofJoinExec]].
  * Added per-session via `spark.experimental.extraStrategies` (public
  * API) by [[graft.ts.AsofJoin.merge]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lb, rb, lt, rt, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, payload) :: Nil
    case _ => Nil
  }
}
