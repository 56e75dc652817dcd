package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — builder-brief extension.
  *
  * Two paths:
  *  - brute-force cosine top-k (the correctness baseline): broadcast the
  *    (small) query set against the corpus — a map-side crossjoin, one
  *    shuffle only for the per-query top-k reduction;
  *  - LSH-bucketed (the 100 TB path): random-hyperplane signatures bucket
  *    the corpus; queries probe only their bucket, so the scan is
  *    1/2^bits of the corpus per query. Hyperplanes are derived
  *    deterministically from hashed (plane, dim) pairs — no driver-side
  *    randomness to ship.
  *
  * All vector math is `zip_with` + `aggregate` expressions (SURVEY brief:
  * functions, not UDFs).
  */
object Similarity {

  /** Dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Queries are broadcast (BroadcastNestedLoopJoin —
    * the corpus never shuffles; only (nQueries × k)-sized results do).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, qIdCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col(vecCol), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col(idCol).as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits, plane p's
    * component for dimension d = a zero-mean int derived from
    * xxhash64(p, d). Deterministic, shippable as a pure expression.
    */
  def lshSignature(vec: Column, bits: Int): Column = {
    val planes = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * (pmod(xxhash64(lit(p), d), lit(2001L)) - 1000L).cast("double")),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: probe only the query's bucket. Recall is traded
    * for a 1/2^bits scan reduction; multi-probe = union over neighboring
    * buckets (not needed at test scale).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qIdCol: String, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      lshSignature(col(vecCol), bits).as("__bucket"))
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"),
      lshSignature(col(vecCol), bits).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col(vecCol), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col(idCol).as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
