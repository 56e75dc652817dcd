package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Piecewise-linear interpolation — riptable interp / interp_extrap.
  *
  * Reference: `riptable/rt_numpy.py:5333` (interp), `:5388`
  * (interp_extrap), kernel `rc.InterpExtrap2d`.
  *
  * Relational formulation: the bracketing points are the as-of neighbors
  * of each query x — one backward as-of join for (x0,y0), one forward for
  * (x1,y1) — then the linear blend. Inherits AsofJoin's scaling (one
  * shuffle per direction on the by-keys, streaming windows).
  *
  * interp semantics: inside the hull → linear; outside → clamp to edge
  * value (numpy interp default). interp_extrap extrapolates the edge
  * segment instead (not implemented until a test needs it).
  */
object Interp {

  def interp(queries: DataFrame, points: DataFrame, on: String,
             by: Seq[String], valueCol: String, out: String = "interp"): DataFrame = {
    val p = points.select((by.map(col) :+ col(on) :+ col(valueCol)): _*)
    val back = AsofJoin.asof(queries, p, on, by, Seq(valueCol),
      direction = "backward", matchedOn = true)
      .withColumnRenamed(valueCol, "__y0").withColumnRenamed("matched_on", "__x0")
    val both = AsofJoin.asof(back, p, on, by, Seq(valueCol),
      direction = "forward", matchedOn = true)
      .withColumnRenamed(valueCol, "__y1").withColumnRenamed("matched_on", "__x1")
    both.withColumn(out,
        when(col("__x0").isNull, col("__y1"))                       // before first point
          .when(col("__x1").isNull, col("__y0"))                    // after last point
          .when(col("__x1") === col("__x0"), col("__y0"))           // exact hit
          .otherwise(col("__y0") + (col("__y1") - col("__y0")) *
            (col(on) - col("__x0")) / (col("__x1") - col("__x0"))))
      .drop("__x0", "__y0", "__x1", "__y1")
  }
}
