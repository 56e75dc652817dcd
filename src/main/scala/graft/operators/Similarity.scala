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

  /** IVF-style ANN: k-means-lite coarse quantizer (deterministic seeds,
    * a few Lloyd iterations — centroids are k×dim tiny and iterate via
    * broadcast), then queries probe only their `nprobe` nearest
    * centroids' inverted lists. The corpus is scanned once per Lloyd
    * iteration and once to assign lists; search touches ~nprobe/k of the
    * corpus. This is the standard billion-vector layout (IVF-Flat)
    * expressed relationally.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qIdCol: String, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import scala.jdk.CollectionConverters._

    // deterministic seeds: lowest hash per corpus id
    var centroids: Seq[(Int, Seq[Float])] = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h")).limit(nCentroids)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }.toSeq

    def centroidDf = spark.createDataFrame(
      centroids.map { case (cid, v) => org.apache.spark.sql.Row(cid, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cvec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))

    def assign(df: DataFrame, vc: String): DataFrame = {
      val scored = df.crossJoin(broadcast(centroidDf))
        .withColumn("__sim", cosine(col(vc), col("cvec")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cid"))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "__sim", "cvec")
    }

    // Lloyd iterations: assign → recompute centroid means
    for (_ <- 0 until iters) {
      val assigned = assign(corpus.select(col(idCol), col(vecCol)), vecCol)
      val dims = centroids.head._2.length
      val meanCols = (0 until dims).map(d =>
        avg(element_at(col(vecCol), d + 1)).as(s"d$d"))
      val means = assigned.groupBy(col("cid"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0),
          (0 until dims).map(d => r.getDouble(d + 1).toFloat).toSeq))
      val updated = means.toMap
      centroids = centroids.map { case (cid, v) => (cid, updated.getOrElse(cid, v)) }
    }

    // build inverted lists; probe nprobe nearest centroids per query
    val lists = assign(corpus.select(col(idCol), col(vecCol)), vecCol)
    val qScored = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(centroidDf))
      .withColumn("__sim", cosine(col("__qv"), col("cvec")))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("cid"))
    val probes = qScored.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe).select(col("query_id"), col("__qv"), col("cid"))

    val scored = lists.join(probes, Seq("cid"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col(vecCol), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col(idCol).as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
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
