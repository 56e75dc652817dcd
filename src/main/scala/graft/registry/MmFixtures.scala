package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Planted multimodal fixture corpus + PRECOMPUTED expected tables —
  * the DuckDB-oracle backing for the image/WAV wing (VERDICT r14 #1:
  * the one first-class capability whose correctness rested on
  * builder-written ScalaTest fixtures instead of the driver's
  * hash-match gate).
  *
  * The trick that makes an INDEPENDENT oracle possible for a
  * perceptual hash: images are constructed FROM target 64-bit dHash
  * patterns, not the other way round. Each image is a 36×32 grayscale
  * PNG of 4×4-pixel cells laid out on the exact 9×8 grid
  * `Multimodal.ImageDHashDecoder` area-averages (integer luma of a
  * uniform gray cell is exact), with cell values chosen by a ±8
  * left-to-right walk so that grid(r,c) > grid(r,c+1) iff bit r·8+c of
  * the pattern is set. PNG is lossless, so decode→average→compare MUST
  * reproduce the planted pattern bit-for-bit — `expected_hash` is
  * derived from the pattern by construction, never by running the
  * decoder. The oracle then replays the 4×16 band join + bit_count
  * verify in SQL over `expected_hash` (the q30/q47 SimHash idiom).
  *
  * WAV clips likewise: PCM sample arrays are planted (square waves,
  * constants, ramps — dyadic amplitudes), the expected per-frame
  * (rms, zero_crossings) table is computed by mirroring the sample
  * arithmetic over the PLANTED short arrays, and the operator must
  * reproduce it through the full RIFF parse → interleave → channel
  * fold → framing path. Malformed clips (truncated, float-PCM, a
  * chunk declaring a u32 size ≥ 2³¹ — the ADVICE r14 infinite-loop
  * payload) are planted too and must yield ZERO frame rows.
  *
  * Fixtures are SF-independent (the oracle SQL embeds one absolute
  * path) and rewritten once per JVM under target/ — deterministic, so
  * overwriting is always safe. Reference analog: riptable's
  * golden-file pattern (riptable/tests/test_files/, SURVEY §5).
  */
private[graft] object MmFixtures {

  // One absolute path shared by the Spark queries AND the DuckDB oracle
  // SQL (OraclesMultimodal interpolates it at class-load, so the
  // override must be set before either side runs). Default lives under
  // the build dir: regenerated on first use, safe to clean.
  val root: String =
    sys.env.getOrElse("SPARK_GRAFT_MM_DIR", "/root/repo/target/mmfixtures")
  val imagesPath = s"$root/mm_images"
  val audioPath = s"$root/mm_audio"
  val framesPath = s"$root/mm_wav_frames_expected"

  /** Frame length every consumer (query + oracle) uses. */
  val frameLen = 100

  // ---- deterministic 64-bit stream (splitmix64) ----
  // private[graft]: Scale10Fixtures reuses the pattern→PNG construction
  // for the 50 k-image 10× lane
  private[graft] def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // ---- image side ----

  /** 36×32 grayscale PNG whose dHash is `pattern` by construction. */
  private[graft] def imageFor(pattern: Long): Array[Byte] = {
    val vals = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      vals(r)(0) = 128
      var c = 0
      while (c < 8) {
        val bitSet = ((pattern >>> (r * 8 + c)) & 1L) == 1L
        // bit set ⇔ grid(r,c) > grid(r,c+1): walk DOWN exactly then
        vals(r)(c + 1) = if (bitSet) vals(r)(c) - 8 else vals(r)(c) + 8
        c += 1
      }
      r += 1
    }
    val img = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 36) {
        val v = vals(y / 4)(x / 4)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (img_id, cluster, payload, expected_hash). 12 clusters with base
    * patterns pairwise ≥ 12 bits apart (so ≤ 3-bit variants never
    * cross-match), cluster j carrying j%4 near-dup variants with 1..3
    * flipped bits, plus two undecodable payloads whose expected hash is
    * the Long.MinValue sentinel the operator documents.
    */
  def imageRows: Seq[(Long, Int, Array[Byte], Long)] = {
    val bases = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 1L
    while (bases.length < 12) {
      val cand = mix(i)
      if (bases.forall(b => java.lang.Long.bitCount(b ^ cand) >= 12))
        bases += cand
      i += 1
    }
    var nextId = 0L
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Array[Byte], Long)]
    bases.zipWithIndex.foreach { case (base, j) =>
      nextId += 1
      rows += ((nextId, j, imageFor(base), base))
      val nVariants = j % 4
      var v = 0
      while (v < nVariants) {
        // flip v+1 DISTINCT bits chosen from the deterministic stream
        var pat = base
        val flips = scala.collection.mutable.LinkedHashSet.empty[Int]
        var k = 0L
        while (flips.size < v + 1) {
          flips += (mix(base + 1000L * j + 31L * v + k) & 63L).toInt
          k += 1
        }
        flips.foreach(b => pat ^= (1L << b))
        nextId += 1
        rows += ((nextId, j, imageFor(pat), pat))
        v += 1
      }
    }
    // undecodable payloads: dropped before banding, sentinel hash
    rows += ((900L, -1, Array[Byte](1, 2, 3, 4), Long.MinValue))
    rows += ((901L, -1, "not a png".getBytes("UTF-8"), Long.MinValue))
    rows.toSeq
  }

  // ---- audio side ----

  /** Interleaved PCM WAV bytes. `chans`: one sample array per channel
    * (16-bit: signed shorts; 8-bit: 0..255 stored in the short).
    * `preChunks` are injected between "WAVE" and "fmt " (chunk-walk
    * exercise; odd sizes get the RIFF pad byte). `fmtCode` ≠ 1 and
    * `evilSize` plant the malformed cases.
    */
  private def wavBytes(chans: Array[Array[Short]], sampleRate: Int,
                       bps: Int, preChunks: Seq[(String, Array[Byte])] = Nil,
                       fmtCode: Short = 1): Array[Byte] = {
    val channels = chans.length
    val n = chans(0).length
    val bytesPerSample = bps / 8
    val dataLen = n * channels * bytesPerSample
    val pre = preChunks.map { case (_, b) => 8 + b.length + (b.length & 1) }.sum
    val bb = java.nio.ByteBuffer.allocate(12 + pre + 24 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + pre + 24 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    preChunks.foreach { case (id, b) =>
      bb.put(id.getBytes("US-ASCII")).putInt(b.length).put(b)
      if ((b.length & 1) == 1) bb.put(0.toByte) // RIFF word-align pad
    }
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPerSample)
      .putShort((channels * bytesPerSample).toShort).putShort(bps.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < channels) {
        if (bps == 16) bb.putShort(chans(ch)(i))
        else bb.put((chans(ch)(i) & 0xff).toByte)
        ch += 1
      }
      i += 1
    }
    bb.array()
  }

  /** Mirror of the decoder's per-frame arithmetic over the PLANTED
    * sample arrays (identical op order ⇒ bit-identical doubles) —
    * everything the RIFF/interleave path under test must reproduce.
    */
  private def expectedFrames(chans: Array[Array[Short]],
                             bps: Int): Seq[(Int, Double, Int)] = {
    val channels = chans.length
    val n = chans(0).length
    def sampleAt(i: Int): Double = {
      var s = 0.0
      var ch = 0
      while (ch < channels) {
        val v =
          if (bps == 16) chans(ch)(i) / 32768.0
          else ((chans(ch)(i) & 0xff) - 128) / 128.0
        s += v
        ch += 1
      }
      s / channels
    }
    val nFrames = n / frameLen
    (0 until nFrames).map { f =>
      var sq = 0.0
      var zc = 0
      var prev = 0.0
      var i = 0
      while (i < frameLen) {
        val v = sampleAt(f * frameLen + i)
        sq += v * v
        if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
        prev = v
        i += 1
      }
      (f, math.sqrt(sq / frameLen), zc)
    }
  }

  /** (clip_id, payload, plantedChans, bps); malformed clips carry an
    * empty channel array (no expected frames).
    */
  def audioRows: Seq[(Long, Array[Byte], Array[Array[Short]], Int)] = {
    def square(n: Int, amp: Short, halfPeriod: Int): Array[Short] =
      Array.tabulate[Short](n)(i =>
        if ((i / halfPeriod) % 2 == 0) amp else (-amp).toShort)
    val sr = 8000
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Byte], Array[Array[Short]], Int)]
    // 1: 16-bit mono square wave, 250 samples → 2 frames + dropped tail
    val c1 = Array(square(250, 8192, 4))
    rows += ((1L, wavBytes(c1, sr, 16), c1, 16))
    // 2: 16-bit STEREO — ch0 square, ch1 constant; fold = channel mean
    val c2 = Array(square(300, 4096, 5),
      Array.fill[Short](300)(2048))
    rows += ((2L, wavBytes(c2, sr, 16), c2, 16))
    // 3: 8-bit mono ramp (unsigned bytes 0..255 cycling)
    val c3 = Array(Array.tabulate[Short](200)(i => ((i * 7) % 256).toShort))
    rows += ((3L, wavBytes(c3, sr, 8), c3, 8))
    // 4: extra chunks BEFORE fmt — odd-sized (pad byte) and even-sized
    val c4 = Array(square(150, 1024, 3))
    rows += ((4L, wavBytes(c4, sr, 16,
      preChunks = Seq("LIST" -> Array[Byte](1, 2, 3), // odd → pad
        "JUNK" -> Array[Byte](9, 9, 9, 9))), c4, 16))
    // 5: silence (RMS 0, no crossings)
    val c5 = Array(Array.fill[Short](120)(0))
    rows += ((5L, wavBytes(c5, sr, 16), c5, 16))
    // 90: truncated garbage — empty
    rows += ((90L, Array[Byte]('R', 'I', 'F', 'F', 1, 0), Array.empty, 16))
    // 91: float PCM (fmt code 3) — unsupported, empty
    val c91 = Array(square(200, 512, 2))
    rows += ((91L, wavBytes(c91, sr, 16, fmtCode = 3), Array.empty, 16))
    // 92: chunk declaring u32 size 0xFFFFFFF8 (toInt == −8) — the
    // ADVICE r14 infinite-loop payload; must terminate with no frames
    val evil = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
        .put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      bb.array()
    }
    rows += ((92L, evil, Array.empty, 16))
    rows.toSeq
  }

  // ---- parquet write (once per JVM; deterministic → overwrite-safe) ----

  @volatile private var written = false

  def ensure(spark: SparkSession): Unit = this.synchronized {
    if (written) return
    val imgSchema = StructType(Seq(
      StructField("img_id", LongType, nullable = false),
      StructField("cluster", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("expected_hash", LongType, nullable = false)))
    val imgDf = spark.createDataFrame(
      java.util.Arrays.asList(imageRows.map { case (id, cl, p, h) =>
        org.apache.spark.sql.Row(id, cl, p, h)
      }: _*), imgSchema)
    imgDf.coalesce(1).write.mode("overwrite").parquet(imagesPath)

    val audSchema = StructType(Seq(
      StructField("clip_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = audioRows
    val audDf = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, p, _, _) =>
        org.apache.spark.sql.Row(id, p)
      }: _*), audSchema)
    audDf.coalesce(1).write.mode("overwrite").parquet(audioPath)

    val frSchema = StructType(Seq(
      StructField("clip_id", LongType, nullable = false),
      StructField("frame", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zero_crossings", IntegerType, nullable = false)))
    val frRows = rows.flatMap { case (id, _, chans, bps) =>
      if (chans.isEmpty) Nil
      else expectedFrames(chans, bps).map { case (f, rms, zc) =>
        org.apache.spark.sql.Row(id, f, rms, zc)
      }
    }
    spark.createDataFrame(java.util.Arrays.asList(frRows: _*), frSchema)
      .coalesce(1).write.mode("overwrite").parquet(framesPath)
    written = true
  }
}
