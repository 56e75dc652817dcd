package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — builder-brief
  * extension. Media payloads are opaque `binary` columns plus typed
  * metadata; the decode step itself is STUBBED (no media libs in this
  * container) with a clearly-marked deterministic fake, while the
  * Spark-side contract — schema, batching, partition sizing — is real.
  *
  * At 100 TB the pattern is: media bytes stay in their own column family
  * (parquet splits large binary row groups), feature extraction is a
  * scan-only projection, and `spark.sql.files.maxPartitionBytes` bounds
  * per-task memory.
  */
object Multimodal {

  /** Wrap raw content as a media column with typed metadata. */
  def asMedia(payload: Column, mediaType: String): Column =
    struct(
      payload.cast("binary").as("bytes"),
      lit(mediaType).as("media_type"),
      octet_length(payload.cast("binary")).as("n_bytes"))

  /** STUB decode: a real build links an image/audio codec here (e.g. via
    * a mapInPandas/mapPartitions batch decoder). The fake is a
    * deterministic 8-bucket byte histogram — shaped like a feature
    * vector, cheap, and reproducible, so the pipeline around it
    * (schema, partitioning, downstream ANN) is fully exercised.
    */
  def decodeFeaturesStub(media: Column, dims: Int = 8): Column = {
    val bytes = media.getField("bytes")
    val n = octet_length(bytes)
    transform(sequence(lit(1), lit(dims)), i =>
      when(n === 0, 0.0).otherwise(
        // deterministic fake: hashed projection of the payload per dim
        (pmod(xxhash64(bytes, i), lit(1000L)).cast("double") / 1000.0)))
  }

  /** Frame-sample stub: pick `k` deterministic offsets into the payload
    * (what a video frame sampler would do by timestamp).
    */
  def frameOffsets(media: Column, k: Int): Column = {
    val n = media.getField("n_bytes")
    transform(sequence(lit(0), lit(k - 1)), i => (i * greatest(n, lit(1)) / k).cast("long"))
  }

  /** Attach media + stub features for a text-as-bytes corpus (the test
    * container has no real media; documents.text stands in as payload).
    */
  def withMediaFeatures(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media", asMedia(col(payloadCol), "text/plain"))
      .withColumn("features", decodeFeaturesStub(col("media")))
      .withColumn("n_bytes", col("media.n_bytes"))

  /** The pluggable decode slot: a real build drops an image/audio codec
    * behind this interface (JNI, or a Python worker via mapInPandas —
    * same open/decode/close shape). `open`/`close` run once per TASK,
    * which is where codec context (a model handle, an ffmpeg session)
    * belongs; `decode` streams row by row, so nothing buffers a
    * partition in memory.
    */
  trait MediaDecoder extends Serializable {
    def name: String
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): Array[Double]
    def close(): Unit = ()
  }

  /** Default implementation: the deterministic stub above, as a decoder
    * (same hashed-projection features as decodeFeaturesStub's column
    * form, computed JVM-side).
    */
  final class StubDecoder(dims: Int = 8) extends MediaDecoder {
    def name = "stub"
    def decode(bytes: Array[Byte]): Array[Double] =
      if (bytes.isEmpty) Array.fill(dims)(0.0)
      else {
        // 8-bucket byte histogram, normalized — cheap and reproducible
        val h = new Array[Double](dims)
        bytes.foreach(b => h(java.lang.Byte.toUnsignedInt(b) % dims) += 1.0)
        h.map(_ / bytes.length)
      }
  }

  /** Run a decoder over a binary payload column, streaming per task.
    * The decoder rides the closure (serialized once per task), opens
    * before the first row and closes when the partition iterator
    * exhausts — the mapInPandas/JNI lifecycle without the Python
    * dependency.
    */
  def decodeWith(df: DataFrame, payloadCol: String, decoder: MediaDecoder,
                 out: String = "features"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add(out, ArrayType(DoubleType))
    df.mapPartitions { it =>
      decoder.open()
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) decoder.close()
          h
        }
        def next(): Row = {
          val r = it.next()
          val bytes = r.get(idx) match {
            case b: Array[Byte] => b
            case s: String      => s.getBytes("UTF-8")
            case null           => Array.emptyByteArray
          }
          Row.fromSeq(r.toSeq :+ decoder.decode(bytes).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
