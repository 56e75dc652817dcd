package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator as-of join: logical node + planner strategy + physical
  * sort-merge exec — the SURVEY §4 "custom SparkStrategy sort-merge-asof"
  * upgrade over the union+window formulation in operators.AsofJoin.
  *
  * Semantics: BACKWARD or NEAREST as-of with `allowExact`/`tolerance`
  * (riptable merge_asof `rt_merge.py:3572`; two-pointer kernel `alignmk`
  * `rt_utils.py:503`, nearest combine `rt_merge_asof.py:746` — this exec
  * is the distributed analog of that kernel: each task runs the
  * two-pointer walk over its co-partitioned, co-sorted slice). FORWARD
  * is backward on negated time (operators.AsofJoin.asofExec).
  *
  * Invalid keys never match (`rt_merge.py:2320`): left rows with a null
  * by-key or null time emit the null-padded row; right rows with a null
  * by-key or null time are skipped — they can never be a match state.
  *
  * Physical contract: both children hash-clustered on the by-keys and
  * sorted by (by, time) — Spark's EnsureRequirements inserts the
  * exchanges/sorts, and AQE still re-plans them. Execution is one
  * streaming pass, O(1) state per task (three registers: last consumed
  * right row, the last strictly-earlier row behind it, and the buffered
  * head as the forward candidate): strictly less work than the window
  * formulation (no running-frame buffer, no unioned-row
  * materialization).
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    allowExact: Boolean,
    tolerance: Option[Long],
    nearest: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    allowExact: Boolean,
    tolerance: Option[Long],
    nearest: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftBy), ClusteredDistribution(rightBy))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightBy :+ rightTime).map(a => SortOrder(a, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftTime).map(a => SortOrder(a, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftBy.map(_.dataType)
    val numRightVals = rightValues.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftBy, left.output)
      val rKeyProj = UnsafeProjection.create(rightBy, right.output)
      val lTime = BindReferences.bindReference(leftTime: Expression, left.output)
      val rTime = BindReferences.bindReference(rightTime: Expression, right.output)
      val rValProj = UnsafeProjection.create(rightValues, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRow = new GenericInternalRow(numRightVals)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)

      val rBuf = rIter.buffered
      // registers: last consumed right row of the current key group, and
      // the latest row strictly earlier than it (serves !allowExact /
      // nearest-backward when lastT ties the left time)
      var lastKey: InternalRow = null
      var lastT: Long = 0L
      var lastVals: InternalRow = null
      var strictT: Long = 0L
      var strictVals: InternalRow = null

      def consume(rk: InternalRow, rt: Long, r: InternalRow): Unit = {
        if (lastKey == null || keyOrd.compare(lastKey, rk) != 0) {
          strictVals = null
        } else if (rt > lastT) {
          strictT = lastT; strictVals = lastVals
        } // rt == lastT: strict register unchanged
        lastKey = rk.copy(); lastT = rt; lastVals = rValProj(r).copy()
      }

      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltv = lTime.eval(l)
        if (lk.anyNull || ltv == null) {
          // invalid left key/time never matches (rt_merge.py:2320)
          outProj(joined(l, nullRow))
        } else {
          val lt = ltv.asInstanceOf[Long]
          // advance: consume right rows with key == lk and time <= lt
          // (eligibility under allowExact is resolved at match time via
          // the strict register); skip dead keys and invalid rows
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            if (rk.anyNull) { rBuf.next() }
            else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) { rBuf.next() } // dead key: no future left matches
              else if (cmp == 0) {
                val rtv = rTime.eval(r)
                if (rtv == null) { rBuf.next() } // invalid time never matches
                else {
                  val rt = rtv.asInstanceOf[Long]
                  if (rt < lt || (rt == lt && (allowExact || nearest))) {
                    consume(rk, rt, r); rBuf.next()
                  } else advance = false
                }
              } else advance = false
            }
          }

          val sameKey = lastKey != null && keyOrd.compare(lastKey, lk) == 0
          // backward candidate: last consumed row if eligible, else the
          // strictly-earlier register (only reachable when lastT == lt)
          var bT = 0L; var bVals: InternalRow = null
          if (sameKey) {
            if (lastT < lt || (lastT == lt && allowExact)) { bT = lastT; bVals = lastVals }
            else if (strictVals != null) { bT = strictT; bVals = strictVals }
          }

          var mT = bT; var mVals = bVals
          if (nearest) {
            // forward candidate: buffered head, same key (time > lt by
            // construction — everything <= lt was consumed above)
            var fT = 0L; var fVals: InternalRow = null
            if (rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKeyProj(r)
              if (!rk.anyNull && keyOrd.compare(rk, lk) == 0) {
                val rtv = rTime.eval(r)
                if (rtv != null) { fT = rtv.asInstanceOf[Long]; fVals = rValProj(r) }
              }
            }
            if (bVals == null) { mT = fT; mVals = fVals }
            else if (fVals != null && (lt - bT) > (fT - lt)) { mT = fT; mVals = fVals }
            // ties keep backward (matches rt_merge_asof.py:746 / the
            // union+window formulation)
          }

          val hasMatch = mVals != null &&
            tolerance.forall(t => math.abs(lt - mT) <= t)
          outProj(joined(l, if (hasMatch) mVals else nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule turning the logical node into the exec. */
object AsofStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lb, rb, lt, rt, rv, ae, tol, near) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, rv, ae, tol, near) :: Nil
    case _ => Nil
  }
}
