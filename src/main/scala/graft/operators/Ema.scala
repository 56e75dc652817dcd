package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Recursive EMA scans — riptable's ema_decay / ema_normal / ema_weighted.
  *
  * Reference: `riptable/rt_groupbyops.py:3314` (ema_decay), `:3366`
  * (ema_normal), `:3438` (ema_weighted); numba kernel
  * `riptable/rt_fastarraynumba.py:507-561`; C++ `rc.EmaAll32` scan family
  * (GB_FUNCTIONS 300-309, `riptable/rt_enum.py:486`).
  *
  * The recurrence ema[i] = v[i] + ema[i-1]·exp(-rate·Δt) is not
  * expressible as a Spark SQL window aggregate (each output depends on the
  * previous OUTPUT, not on a frame of inputs). Implementation: the
  * distributed secondary-sort pattern —
  * `repartition(by) → sortWithinPartitions(by, t) → mapPartitions` with a
  * running state that resets on key change. O(1) memory per task, no
  * per-group materialization, arbitrary group sizes: this is the shape
  * that survives 100 TB. (A custom Catalyst AggregateWindowFunction is the
  * planned codegen upgrade — SURVEY §4 custom-work item 2.)
  *
  * Rows are emitted with a new double column appended. Key and time are
  * read as Long, value as Double (callers cast/prepare columns first).
  */
object Ema {

  sealed trait Kind
  case object Decay extends Kind      // ema_decay: v + prev*exp(-rate*dt)
  case object Normal extends Kind     // ema_normal: time-normalized mean
  case object Weighted extends Kind   // ema_weighted: fixed-alpha, ignores time

  /** `filterCol`/`resetCol` mirror riptable's `filter=`/`reset=` kwargs
    * (`nb_ema_decay_with_filter_and_reset`,
    * `riptable/rt_fastarraynumba.py:507`): a filtered-out row contributes
    * ZERO but still decays the state and emits the running value; a reset
    * (honored only on filtered-IN rows, like the kernel) zeroes the state
    * before the row folds in.
    */
  def ema(df: DataFrame, byCol: String, timeCol: String, valueCol: String,
          rate: Double, kind: Kind = Decay, out: String = "ema",
          filterCol: Option[String] = None,
          resetCol: Option[String] = None): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(out, DoubleType, nullable = true))
    val byIdx = inSchema.fieldIndex(byCol)
    val tIdx = inSchema.fieldIndex(timeCol)
    val vIdx = inSchema.fieldIndex(valueCol)
    val fIdx = filterCol.map(inSchema.fieldIndex)
    val rIdx = resetCol.map(inSchema.fieldIndex)

    val sorted = df
      .repartition(col(byCol))
      .sortWithinPartitions(col(byCol), col(timeCol))

    sorted.mapPartitions { iter =>
      var curKey: Long = 0L
      var haveKey = false
      var prevT: Long = 0L
      var acc: Double = 0.0      // decay/weighted accumulator | normal numerator
      var den: Double = 0.0      // normal denominator
      iter.map { r =>
        val k = r.getLong(byIdx)
        val t = r.getLong(tIdx)
        if (!haveKey || k != curKey) {
          curKey = k; haveKey = true; prevT = t; acc = 0.0; den = 0.0
        }
        val pass = fIdx.forall(i => !r.isNullAt(i) && r.getBoolean(i))
        if (pass && rIdx.exists(i => !r.isNullAt(i) && r.getBoolean(i))) {
          acc = 0.0; den = 0.0; prevT = t
        }
        val vNull = r.isNullAt(vIdx)
        val v = if (!pass || vNull) 0.0 else r.getDouble(vIdx)
        val o: Double = kind match {
          case Decay =>
            val w = math.exp(-rate * (t - prevT).toDouble)
            acc = v + acc * w
            prevT = t
            acc
          case Normal =>
            val w = math.exp(-rate * (t - prevT).toDouble)
            acc = acc * w + v
            den = den * w + 1.0
            prevT = t
            acc / den
          case Weighted =>
            acc = if (den == 0.0) { den = 1.0; v } else rate * v + (1.0 - rate) * acc
            acc
        }
        Row.fromSeq(r.toSeq :+ o)
      }
    }(Encoders.row(outSchema))
  }
}
