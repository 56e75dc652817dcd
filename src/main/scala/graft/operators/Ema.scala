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
  * that survives 100 TB. (The custom Catalyst AggregateWindowFunction
  * twin — SURVEY §4 custom-work item 2 — SHIPPED as
  * [[graft.plans.EmaDecay]]/EmaNormal/EmaWeighted; EmaWindowSpec
  * cross-checks the two paths, and [[emaDecayChunked]] builds the
  * hot-key chunk decomposition on the window form.)
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

  /** CHUNK-PARALLEL ema_decay — the hot-key escape hatch
    * ([[graft.operators.Rolling.rollingAggChunked]]'s contract applied
    * to the EMA family, r15): a group that owns half the tape no longer
    * serializes every row through one scan task.
    *
    * The decay recurrence is LINEAR in the state, so it decomposes over
    * time chunks exactly:
    *   ema_i = L_i + C_c · exp(−rate·(t_i − T_c))
    * where L_i is the chunk-local EMA started from zero carry (the
    * native [[graft.plans.EmaDecay]] window function over a
    * (key, chunk) partition — data-parallel across chunks), and
    * (C_c, T_c) is the TRUE ema/timestamp at the last row of the
    * previous nonempty chunk. Homogeneous decay multiplies:
    * ∏ exp(−rate·Δt_j) = exp(−rate·Σ Δt_j), so one exp of the total gap
    * replaces the per-step product (equal in ℝ; in FP the two differ by
    * ulps — EmaChunkSpec pins ≤ 1e-9 relative vs the sequential scan,
    * and the oracle's round(6) absorbs it, same as q38's contract).
    *
    * The cross-chunk carries follow the chunk-level linear recurrence
    *   E_k = l_k + E_{k−1} · exp(−rate·(t_k − t_{k−1}))
    * over the (chunk, last-ts, last-local-ema) summaries — ONE row per
    * nonempty chunk — scanned per key inside a single `aggregate`
    * higher-order expression over a collect_list array. Serial
    * dimension: O(chunks), not O(rows); per-key state: chunks × 24
    * bytes (a year of hourly chunks ≈ 210 KB). The data rows never
    * funnel through one task.
    *
    * Zero-carry start: C_1 = 0, but 0 · exp(x) is NOT always 0 — the
    * phantom gap (t − 0) against the seed timestamp goes POSITIVE for
    * pre-1970 tapes (negative epoch-us/ns), and rate·|t| > ~709
    * overflows exp to +Infinity, 0·∞ = NaN. Real carries never hit
    * this (rows are time-sorted, so t ≥ carry-ts ⇒ exponent ≤ 0),
    * so both exp sites clamp the exponent with least(0, ·): a no-op
    * for every genuine carry, and it pins the zero-carry product at
    * 0 · (something ≤ 1) = 0 for any timestamp sign (EmaChunkSpec's
    * negative-timestamp case). At rate = 0 the decomposition
    * degenerates to an exact distributed cumsum.
    * Null values contribute 0 but still decay state, exactly like the
    * sequential scan (EmaDecay's contract).
    *
    * `filter=`/`reset=` (r16 — closes the last EMA hatch boundary):
    * the recurrence stays LINEAR with per-row coefficients
    *   ema_i = a_i·ema_{i−1} + b_i,
    *   a_i = 0 if (pass_i ∧ reset_i) else exp(−rate·Δt_i),
    *   b_i = v_i if pass_i else 0,
    * so the same decomposition applies: the chunk-local pass hands
    * filter/reset to the 5-arg window function (in-chunk resets are
    * native), the carry product over a chunk is 0 iff the chunk
    * contains an effective reset (one boolean per summary), and a row
    * sees the chunk carry only if NO effective reset precedes it in
    * its chunk (a max-over-window flag sharing the same WindowExec).
    * A filter alone needs no gates at all — it only masks b_i.
    * ema_normal's numerator/denominator pair decomposes the same way
    * with a doubled carry — [[emaNormalChunked]]. Plain ema_decay is
    * the scan that dominates a hot tape.
    */
  def emaDecayChunked(df: DataFrame, byCol: String, tsCol: String,
                      tieCol: String, valueCol: String, rate: Double,
                      out: String, chunkWidth: Long,
                      filterCol: Option[String] = None,
                      resetCol: Option[String] = None): DataFrame =
    emaChunked(df, byCol, tsCol, tieCol, valueCol, rate, out, chunkWidth,
      normalized = false, filterCol, resetCol)

  /** CHUNK-PARALLEL ema_normal (VERDICT r15 #4 — closes the boundary
    * [[emaDecayChunked]]'s scaladoc documented): the time-normalized
    * EMA is the RATIO of two decay recurrences sharing one decay weight
    *   num_i = v_i + num_{i−1}·w_i,   den_i = 1 + den_{i−1}·w_i,
    * so the exact linear decomposition applies to each side with a
    * DOUBLED carry state — the chunk-local window computes both EMAs in
    * the same WindowExec pass (value stream v and constant stream 1),
    * the per-key chunk scan carries (num, den, t) triples, and the
    * finish divides. Null values contribute 0 to the numerator but
    * still count 1 into the denominator, exactly like the sequential
    * scan (den ≥ 1 always: the row's own +1 enters at exp(0)).
    * `filter=`/`reset=` as in [[emaDecayChunked]] (r16) — the
    * denominator stream passes filter=TRUE (a filtered-out row still
    * counts 1 into den, matching the scan) but shares the EFFECTIVE
    * reset flag (resets are honored only on filtered-in rows).
    */
  def emaNormalChunked(df: DataFrame, byCol: String, tsCol: String,
                       tieCol: String, valueCol: String, rate: Double,
                       out: String, chunkWidth: Long,
                       filterCol: Option[String] = None,
                       resetCol: Option[String] = None): DataFrame =
    emaChunked(df, byCol, tsCol, tieCol, valueCol, rate, out, chunkWidth,
      normalized = true, filterCol, resetCol)

  private def emaChunked(df: DataFrame, byCol: String, tsCol: String,
                         tieCol: String, valueCol: String, rate: Double,
                         out: String, chunkWidth: Long,
                         normalized: Boolean,
                         filterCol: Option[String] = None,
                         resetCol: Option[String] = None): DataFrame = {
    require(rate >= 0.0 && chunkWidth > 0,
      s"bad ema params: rate=$rate chunkWidth=$chunkWidth")
    // effective flags, null-safe like the scan: a null filter FAILS the
    // row; a reset is honored only on filtered-IN rows
    val passE = filterCol.map(f => s"coalesce($f, false)").getOrElse("true")
    val rstE = resetCol.map(r => s"($passE AND coalesce($r, false))")
      .getOrElse("false")
    val base = df.withColumn("__c", expr(s"$tsCol div $chunkWidth"))
      .withColumn("__rst", expr(rstE))
    // 1. chunk-local EMA(s), zero carry-in — codegen window function;
    //    CAST pins the rate literal to DOUBLE however Scala prints it.
    //    filter/reset ride the 5-arg form (in-chunk resets are native).
    //    The normalized form adds the DENOMINATOR stream (constant 1)
    //    in the SAME WindowExec pass — filter=TRUE there (a filtered-out
    //    row still counts 1 into den, matching the scan) but the shared
    //    EFFECTIVE reset; the decay form pins it to a constant-folded 0
    //    so downstream stays uniform at zero cost.
    val over = s"OVER (PARTITION BY $byCol, __c ORDER BY $tsCol, $tieCol " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val local0 = base.withColumn("__l", expr(
      s"rip_ema_decay($valueCol, $tsCol, CAST($rate AS DOUBLE), $passE, __rst) $over"))
    val local1 =
      if (normalized) local0.withColumn("__ld", expr(
        s"rip_ema_decay(CAST(1.0 AS DOUBLE), $tsCol, CAST($rate AS DOUBLE), " +
          s"true, __rst) $over"))
      else local0.withColumn("__ld", lit(0.0))
    // carry GATE: a row sees the chunk carry only if no effective reset
    // precedes it (inclusive) in its chunk — same window spec, so it
    // shares the WindowExec; constant 0 when no resetCol (carry always
    // visible, exactly the pre-r16 plan)
    val local =
      if (resetCol.isDefined)
        local1.withColumn("__rs", expr(s"max(CAST(__rst AS INT)) $over"))
      else local1.withColumn("__rs", lit(0))
    // 2. one summary row per (key, chunk): the LAST row's
    //    (ts, local num, local den) — a max_by aggregate (partial/
    //    map-side combinable), NOT a second descending window over the
    //    same partition (which would re-sort) — plus hasReset: the
    //    carry PRODUCT over a chunk containing an effective reset is 0
    val sums = local.groupBy(col(byCol), col("__c"))
      .agg(max_by(
        struct(col(tsCol).cast("long").as("t"), col("__l").as("l"),
          col("__ld").as("d")),
        struct(col(tsCol), col(tieCol))).as("__tl"),
        max(col("__rst").cast("int")).as("__hr"))
      .select(col(byCol), struct(col("__c").as("c"),
        col("__tl.t").as("t"), col("__tl.l").as("l"),
        col("__tl.d").as("d"), col("__hr").as("hr")).as("__s"))
    // 3. per-key chunk scan → each chunk's carry-IN (E_{k−1}, t_{k−1});
    //    num and den ride the SAME decay weight, zeroed across a chunk
    //    whose a-product is 0 (it contained a reset)
    val zero = struct(lit(0.0).as("e"), lit(0.0).as("ed"), lit(0L).as("t"),
      array().cast("array<struct<c:bigint,ce:double,ced:double,ct:bigint>>")
        .as("out"))
    val carries = sums.groupBy(col(byCol))
      .agg(sort_array(collect_list(col("__s"))).as("__chs"))
      .select(col(byCol), explode(aggregate(col("__chs"), zero,
        (acc, x) => {
          val w = when(x.getField("hr") === 1, lit(0.0)).otherwise(
            exp(least(lit(0.0), lit(-rate) *
              (x.getField("t") - acc.getField("t")).cast("double"))))
          struct(
            (x.getField("l") + acc.getField("e") * w).as("e"),
            (x.getField("d") + acc.getField("ed") * w).as("ed"),
            x.getField("t").as("t"),
            concat(acc.getField("out"), array(struct(
              x.getField("c").as("c"), acc.getField("e").as("ce"),
              acc.getField("ed").as("ced"),
              acc.getField("t").as("ct")))).as("out"))
        },
        a => a.getField("out"))).as("__cr"))
      .select(col(byCol), col("__cr.c").as("__c"),
        col("__cr.ce").as("__ce"), col("__cr.ced").as("__ced"),
        col("__cr.ct").as("__ct"))
    // 4. final: local + carry·exp(−rate·(t − T_prev)) gated by the
    //    reset-seen flag, divided by the same-shaped denominator when
    //    normalized; the carries side is chunk-count-sized, so the
    //    join broadcasts
    val joined = local.join(carries, Seq(byCol, "__c"), "left")
    val wRow = when(col("__rs") === 1, lit(0.0)).otherwise(
      exp(least(lit(0.0), lit(-rate) * (col(tsCol).cast("long") -
        coalesce(col("__ct"), lit(0L))).cast("double"))))
    val num = col("__l") + coalesce(col("__ce"), lit(0.0)) * wRow
    val res =
      if (normalized)
        num / (col("__ld") + coalesce(col("__ced"), lit(0.0)) * wRow)
      else num
    joined.withColumn(out, res)
      .drop("__c", "__l", "__ld", "__ce", "__ced", "__ct", "__rst", "__rs")
  }
}
