package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

/** Native Catalyst window functions for riptable's ema_decay family.
  *
  * Reference semantics: `riptable/rt_groupbyops.py:3314` (ema_decay) and
  * the numba kernel `riptable/rt_fastarraynumba.py:507-561`
  * (`nb_ema_decay_with_filter_and_reset`):
  *
  *   ema[0] = v[0]
  *   ema[i] = v[i] + ema[i-1] * exp(-rate * (t[i] - t[i-1]))
  *
  * with the kernel's kwargs: a filtered-OUT row contributes zero but
  * still decays the state and emits the running value; a reset (honored
  * only on filtered-IN rows) zeroes the state before the row folds in.
  *
  * This recurrence depends on the previous OUTPUT, so it cannot be
  * written as a frame aggregate of inputs — but it fits Spark's
  * `AggregateWindowFunction` contract exactly (the same machinery as
  * rank/lag): a running buffer updated once per row over the
  * UNBOUNDED PRECEDING..CURRENT ROW row frame. All update expressions
  * are declarative Catalyst expressions, so the window evaluator stays
  * on the optimized path — no UDF, no mapPartitions (that formulation
  * lives in `graft.operators.Ema`; the two are cross-checked in
  * EmaWindowSpec, including the filter/reset grids).
  *
  * Null values contribute 0 (riptable treats invalids as skipped decay
  * carriers); null times propagate null output for that row.
  */
case class EmaDecay(value: Expression, time: Expression, rate: Expression,
                    filter: Expression = Literal(true),
                    reset: Expression = Literal(false))
    extends AggregateWindowFunction {

  // inputs are cast by the registry builder (GraftExtensions):
  // value: double, time: long, rate: double, filter/reset: boolean
  override def children: Seq[Expression] = Seq(value, time, rate, filter, reset)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rip_ema_decay"

  private val ema = AttributeReference("ema", DoubleType, nullable = true)()
  private val prevT = AttributeReference("prevT", LongType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema, prevT)

  override val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, LongType))

  override val updateExpressions: Seq[Expression] = {
    val pass = And(IsNotNull(filter), filter)
    val resetNow = And(pass, And(IsNotNull(reset), reset))
    val v = If(pass, Coalesce(Seq(value, Literal(0.0))), Literal(0.0))
    // a reset forgets the buffer: treat it like the first row of a group
    val emaEff = If(resetNow, Literal.create(null, DoubleType), ema)
    val decayed = Multiply(emaEff,
      Exp(Multiply(UnaryMinus(rate), Cast(Subtract(time, prevT), DoubleType))))
    Seq(
      Add(v, Coalesce(Seq(decayed, Literal(0.0)))), // first row: buffer null → v
      time)
  }

  override val evaluateExpression: Expression = ema

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmaDecay =
    copy(value = newChildren(0), time = newChildren(1), rate = newChildren(2),
      filter = newChildren(3), reset = newChildren(4))
}

/** ema_normal (`riptable/rt_groupbyops.py:3366`): time-normalized EMA —
  * decayed numerator over decayed denominator, so the output is a
  * weighted MEAN of history rather than a decayed sum. filter/reset as
  * in EmaDecay (both accumulators forget on reset; a filtered-out row
  * still decays both and counts 1 into the denominator, matching the
  * scan in operators.Ema).
  *
  *   num[i] = v[i] + num[i-1]·w,  den[i] = 1 + den[i-1]·w,
  *   w = exp(-rate·Δt),  ema[i] = num[i]/den[i]
  */
case class EmaNormal(value: Expression, time: Expression, rate: Expression,
                     filter: Expression = Literal(true),
                     reset: Expression = Literal(false))
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(value, time, rate, filter, reset)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rip_ema_normal"

  private val num = AttributeReference("num", DoubleType, nullable = true)()
  private val den = AttributeReference("den", DoubleType, nullable = true)()
  private val prevT = AttributeReference("prevT", LongType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(num, den, prevT)

  override val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, DoubleType),
    Literal.create(null, LongType))

  override val updateExpressions: Seq[Expression] = {
    val pass = And(IsNotNull(filter), filter)
    val resetNow = And(pass, And(IsNotNull(reset), reset))
    val v = If(pass, Coalesce(Seq(value, Literal(0.0))), Literal(0.0))
    val numEff = If(resetNow, Literal.create(null, DoubleType), num)
    val denEff = If(resetNow, Literal.create(null, DoubleType), den)
    val w = Exp(Multiply(UnaryMinus(rate), Cast(Subtract(time, prevT), DoubleType)))
    Seq(
      Add(v, Coalesce(Seq(Multiply(numEff, w), Literal(0.0)))),
      Add(Literal(1.0), Coalesce(Seq(Multiply(denEff, w), Literal(0.0)))),
      time)
  }

  override val evaluateExpression: Expression = Divide(num, den)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmaNormal =
    copy(value = newChildren(0), time = newChildren(1), rate = newChildren(2),
      filter = newChildren(3), reset = newChildren(4))
}

/** ema_weighted (`riptable/rt_groupbyops.py:3438`): fixed-alpha EMA,
  * time-independent. filter/reset as in EmaDecay (a filtered-out row
  * folds v=0 with the usual α blend; reset forgets the buffer so the
  * row re-seeds it) —
  *   ema[0] = v[0]; ema[i] = α·v[i] + (1-α)·ema[i-1]
  */
case class EmaWeighted(value: Expression, alpha: Expression,
                       filter: Expression = Literal(true),
                       reset: Expression = Literal(false))
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(value, alpha, filter, reset)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rip_ema_weighted"

  private val ema = AttributeReference("ema", DoubleType, nullable = true)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema)
  override val initialValues: Seq[Expression] = Seq(Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = {
    val pass = And(IsNotNull(filter), filter)
    val resetNow = And(pass, And(IsNotNull(reset), reset))
    val v = If(pass, Coalesce(Seq(value, Literal(0.0))), Literal(0.0))
    val emaEff = If(resetNow, Literal.create(null, DoubleType), ema)
    Seq(If(IsNull(emaEff), v,
      Add(Multiply(alpha, v), Multiply(Subtract(Literal(1.0), alpha), emaEff))))
  }

  override val evaluateExpression: Expression = ema

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmaWeighted =
    copy(value = newChildren(0), alpha = newChildren(1),
      filter = newChildren(2), reset = newChildren(3))
}
