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
  * value (numpy interp default). interp_extrap (`rt_numpy.py:5388`)
  * extends the EDGE SEGMENT instead: queries left of the first point use
  * the first segment's slope, right of the last the last segment's.
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

  /** interp_extrap (`rt_numpy.py:5388`): linear inside the hull like
    * interp; outside, extrapolate along the edge segment. Each point
    * carries its lead/lag neighbor (one narrow window over the points
    * side only — dictionary-of-points sized, not query sized), so the
    * same two as-of joins deliver the second point needed for the edge
    * slope. Single-point groups fall back to clamping.
    */
  def interpExtrap(queries: DataFrame, points: DataFrame, on: String,
                   by: Seq[String], valueCol: String,
                   out: String = "interp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(by.map(col): _*).orderBy(col(on))
    val p = points.select((by.map(col) :+ col(on) :+ col(valueCol)): _*)
      .withColumn("__nx", lead(col(on), 1).over(w))
      .withColumn("__ny", lead(col(valueCol), 1).over(w))
      .withColumn("__px", lag(col(on), 1).over(w))
      .withColumn("__py", lag(col(valueCol), 1).over(w))
    val back = AsofJoin.asof(queries, p.drop("__nx", "__ny"), on, by,
      Seq(valueCol, "__px", "__py"), direction = "backward", matchedOn = true)
      .withColumnRenamed(valueCol, "__y0").withColumnRenamed("matched_on", "__x0")
    val both = AsofJoin.asof(back, p.drop("__px", "__py"), on, by,
      Seq(valueCol, "__nx", "__ny"), direction = "forward", matchedOn = true)
      .withColumnRenamed(valueCol, "__y1").withColumnRenamed("matched_on", "__x1")
    both.withColumn(out,
        when(col("__x0").isNull && col("__x1").isNull, lit(null))
          .when(col("__x0").isNull,                                 // left of hull
            when(col("__nx").isNull, col("__y1"))                   // single point
              .otherwise(col("__y1") + (col("__ny") - col("__y1")) *
                (col(on) - col("__x1")) / (col("__nx") - col("__x1"))))
          .when(col("__x1").isNull,                                 // right of hull
            when(col("__px").isNull, col("__y0"))
              .otherwise(col("__y0") + (col("__y0") - col("__py")) *
                (col(on) - col("__x0")) / (col("__x0") - col("__px"))))
          .when(col("__x1") === col("__x0"), col("__y0"))
          .otherwise(col("__y0") + (col("__y1") - col("__y0")) *
            (col(on) - col("__x0")) / (col("__x1") - col("__x0"))))
      .drop("__x0", "__y0", "__x1", "__y1", "__px", "__py", "__nx", "__ny")
  }
}
