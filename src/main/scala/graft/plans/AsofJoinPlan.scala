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
  * Semantics: BACKWARD as-of with `allowExact`/`tolerance`
  * (riptable merge_asof `rt_merge.py:3572`; two-pointer kernel `alignmk`
  * `rt_utils.py:503` — this exec is the distributed analog of that
  * kernel: each task runs the two-pointer walk over its co-partitioned,
  * co-sorted slice).
  *
  * Physical contract: both children hash-clustered on the by-keys and
  * sorted by (by, time) — Spark's EnsureRequirements inserts the
  * exchanges/sorts, and AQE still re-plans them. Execution is one
  * streaming pass, O(1) state per task: strictly less work than the
  * window formulation (no running-frame buffer management, no
  * unioned-row materialization).
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
    tolerance: Option[Long]) extends BinaryNode {

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
    tolerance: Option[Long]) extends BinaryExecNode {

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
      var matchKey: InternalRow = null
      var matchVals: InternalRow = null
      var matchT: Long = 0L

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTime.eval(l).asInstanceOf[Long]
        var advance = true
        while (advance && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) { rBuf.next() } // dead key: no future left can match
          else if (cmp == 0) {
            val rt = rTime.eval(r).asInstanceOf[Long]
            if (rt < lt || (rt == lt && allowExact)) {
              matchKey = rk.copy(); matchVals = rValProj(r).copy(); matchT = rt
              rBuf.next()
            } else advance = false
          } else advance = false
        }
        val hasMatch = matchKey != null && keyOrd.compare(matchKey, lk) == 0 &&
          tolerance.forall(t => lt - matchT <= t)
        outProj(joined(l, if (hasMatch) matchVals else nullRow))
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
    case AsofJoinNode(l, r, lb, rb, lt, rt, rv, ae, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, rv, ae, tol) :: Nil
    case _ => Nil
  }
}
