package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** The UDF/UDAF surface — riptable's apply_reduce / apply_nonreduce and
  * the custom-function registry.
  *
  * Reference: `riptable/rt_groupbyops.py:366` (apply_reduce: one value per
  * group), `:462` (apply_nonreduce: full-length grouped transform), `:529`
  * (apply); custom numba funcs get IDs ≥ GB_FUNC_NUMBA=1000 registered
  * into dispatch tables (`riptable/rt_groupbynumba.py:53,688-701`,
  * `rt_groupbyops.py:89`).
  *
  * Spark mapping: apply_reduce → typed `Aggregator` registered via
  * `udaf` (distributed partial aggregation, unlike a collect-based UDF);
  * apply_nonreduce → the secondary-sort mapPartitions scan (see Ema for
  * the recursive case) or a window expression.
  */
object Apply {

  /** Weighted mean — the canonical apply_reduce example. */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Geometric mean via log-sum — second registry entry. */
  class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  lazy val weightedMeanUdaf =
    udaf(new WeightedMean(), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
  lazy val geoMeanUdaf = udaf(new GeoMean(), Encoders.scalaDouble)

  def weightedMean(value: Column, weight: Column): Column =
    weightedMeanUdaf(value, weight)
  def geoMean(value: Column): Column = geoMeanUdaf(value)

  /** Register the named-UDAF registry on a session (the
    * GB_FUNC_NUMBA-style dispatch table analog).
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("rip_wmean", weightedMeanUdaf)
    spark.udf.register("rip_geomean", geoMeanUdaf)
  }

  /** Vectorized-batch escape hatch — the apply_pandas analog
    * (`rt_dataset.py:7292` Dataset.apply with a whole-table function;
    * `rt_fastarray.py:5476` FastArray.apply_pandas). The user function
    * sees a BATCH of rows at a time (amortizing per-call overhead the
    * way Arrow batches do for pandas UDFs) and returns the transformed
    * batch; batches stream through `mapPartitions`, so per-task memory
    * is bounded by `batchSize`, not the partition. This is the same
    * lifecycle `mapInArrow`/`mapInPandas` gives Python users — minus
    * the serialization hop, since the function is JVM-side.
    *
    * Prefer Column expressions (codegen, optimizer-visible) for
    * anything expressible; this is the bridge for existing black-box
    * row logic — exactly the stance the reference takes with
    * apply_pandas ("escape to pandas when you must").
    */
  def applyBatched(df: DataFrame, outSchema: StructType,
                   batchSize: Int = 1024)(fn: Seq[Row] => Seq[Row]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    df.mapPartitions(_.grouped(batchSize).flatMap(fn))(Encoders.row(outSchema))
  }

  /** apply_nonreduce (rt_groupbyops.py:462): a user scan function over
    * each group in time order producing one double per row. Same
    * distributed shape as Ema: repartition + sortWithinPartitions +
    * mapPartitions with key-change reset; O(1) memory, unbounded groups.
    * The scan function folds (state, value) → (state, output).
    */
  def applyNonReduce(df: DataFrame, byCol: String, orderCol: String,
                     valueCol: String, out: String, init: Double)(
                     f: (Double, Double) => Double): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(out, DoubleType, nullable = true))
    val byIdx = inSchema.fieldIndex(byCol)
    val vIdx = inSchema.fieldIndex(valueCol)
    df.repartition(col(byCol)).sortWithinPartitions(col(byCol), col(orderCol))
      .mapPartitions { iter =>
        var curKey: Any = null
        var state = init
        iter.map { r =>
          val k = r.get(byIdx)
          if (k != curKey) { curKey = k; state = init }
          state = f(state, if (r.isNullAt(vIdx)) Double.NaN else r.getDouble(vIdx))
          Row.fromSeq(r.toSeq :+ state)
        }
      }(Encoders.row(outSchema))
  }
}
