package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-decode multimodal wing (r14): image perceptual dHash + banded
  * near-dup pairs over REAL PNG bytes (javax.imageio — in the JDK, no
  * stub), and WAV PCM per-frame RMS/zero-crossing features over a real
  * RIFF byte stream. Fixtures are synthesized in-JVM so the planted
  * near-dups and the analytic audio expectations are exact.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  // 64x64 diagonal gradient — strong dHash structure
  private def gradient(x: Int, y: Int): Int = gray((x * 2 + y * 2) & 0xff)

  test("imageDHash: re-encode-identical images hash equal; a mild " +
    "overlay stays within a few bits; unrelated structure is far") {
    val base = png(64, 64)(gradient)
    val reenc = png(64, 64)(gradient) // same pixels, fresh encode
    // near-dup: the same gradient with a small 4x4 overlay patch
    val overlay = png(64, 64)((x, y) =>
      if (x < 4 && y < 4) gray(255) else gradient(x, y))
    // unrelated: checkerboard
    val other = png(64, 64)((x, y) => gray(if (((x / 8) + (y / 8)) % 2 == 0) 0 else 255))
    val df = Seq(1L -> base, 2L -> reenc, 3L -> overlay, 4L -> other)
      .toDF("id", "payload")
    val hs = Multimodal.imageDHash(df, "payload")
      .select("id", "phash").as[(Long, Long)].collect().toMap
    assert(hs(1L) === hs(2L), "re-encode must hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(3L)) <= 3,
      s"overlay drifted ${ham(hs(1L), hs(3L))} bits")
    assert(ham(hs(1L), hs(4L)) > 10,
      s"unrelated image only ${ham(hs(1L), hs(4L))} bits away")
    // undecodable payload -> sentinel
    val bad = Multimodal.imageDHash(
      Seq(9L -> Array[Byte](1, 2, 3)).toDF("id", "payload"), "payload")
      .select("phash").as[Long].head()
    assert(bad === Long.MinValue)
  }

  test("imageNearDupPairs equals brute-force hamming and drops " +
    "undecodable payloads before banding") {
    val imgs: Seq[(Long, Array[Byte])] =
      (0L until 6L).map { i =>
        // six distinct structures: rotated gradients + checker phases
        i -> png(48, 48)((x, y) => gray((x * (2 + i.toInt) + y * 3) & 0xff))
      } ++ Seq(
        100L -> png(48, 48)((x, y) => gray((x * 2 + y * 3) & 0xff)),
        101L -> png(48, 48)((x, y) => // near-dup of id 0's structure
          if (x < 3 && y < 3) gray(250) else gray((x * 2 + y * 3) & 0xff)),
        666L -> Array[Byte](0, 1, 2, 3) // corrupt — must not join
      )
    val df = imgs.toDF("id", "payload")
    val got = Multimodal.imageNearDupPairs(df, "id", "payload", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    // brute force over the same hashes (banding is complete for <= 3)
    val hs = Multimodal.imageDHash(df, "payload")
      .select("id", "phash").as[(Long, Long)].collect()
      .filter(_._2 != Long.MinValue)
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === want)
    assert(want.exists { case (a, b, _) => a == 0L || b == 0L || a == 100L },
      "fixture planted no near-dup — vacuous test")
    assert(!got.exists { case (a, b, _) => a == 666L || b == 666L })
  }

  test("imageDupAgainstSuite flags near-copies of the reference suite " +
    "and passes unrelated/corrupt images") {
    val ref = Seq(10L -> png(64, 64)(gradient)).toDF("rid", "rpayload")
    val stream = Seq(
      1L -> png(64, 64)(gradient),                      // exact re-encode
      2L -> png(64, 64)((x, y) =>                        // mild overlay
        if (x < 4 && y < 4) gray(255) else gradient(x, y)),
      3L -> png(64, 64)((x, y) =>                        // unrelated
        gray(if (((x / 8) + (y / 8)) % 2 == 0) 0 else 255)),
      4L -> Array[Byte](9, 9, 9)                         // corrupt
    ).toDF("id", "payload")
    val out = Multimodal.imageDupAgainstSuite(stream, "payload",
        ref, "rpayload", maxHamming = 3)
      .select("id", "min_hamming", "is_dup")
      .as[(Long, Option[Int], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === Some(0) && out(1L)._3)
    assert(out(2L)._2.exists(_ <= 3) && out(2L)._3)
    assert(out(3L)._2.exists(_ > 3) && !out(3L)._3)
    assert(out(4L)._2.isEmpty && !out(4L)._3)
    // empty suite: nothing flags, nothing throws
    val none = Multimodal.imageDupAgainstSuite(stream, "payload",
        ref.filter(col("rid") < 0), "rpayload")
      .select("is_dup").as[Boolean].collect()
    assert(none.forall(_ == false))
  }

  private def wav16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("wavFrameFeatures: a pure sine frames to RMS ~ A/sqrt(2) and the " +
    "analytic zero-crossing count; silence frames to zero") {
    val sr = 8000
    val freq = 400.0 // 400 Hz -> 2*400*frameSec crossings per frame
    val amp = 0.5
    val n = 4000 // half a second
    val sine = Array.tabulate[Short](n)(i =>
      (amp * 32767.0 * math.sin(2 * math.Pi * freq * i / sr)).toShort)
    val frames = Multimodal.wavFrameFeatures(wav16(sine, sr), frameLen = 800)
    assert(frames.length === 5)
    frames.foreach { case (_, rms, zc) =>
      assert(math.abs(rms - amp / math.sqrt(2)) < 0.01, s"rms $rms")
      // 800 samples at 8 kHz = 0.1 s -> 2*f*t = 80 crossings (+-1 edge)
      assert(math.abs(zc - 80) <= 1, s"zc $zc")
    }
    val silent = Multimodal.wavFrameFeatures(
      wav16(Array.fill[Short](1600)(0), sr), frameLen = 800)
    assert(silent.map(_._2) === Seq(0.0, 0.0))
    // malformed payloads are empty, not thrown
    assert(Multimodal.wavFrameFeatures("nope".getBytes, 10).isEmpty)
    assert(Multimodal.wavFrameFeatures(Array.emptyByteArray, 10).isEmpty)
  }

  test("malicious/corrupt RIFF chunk sizes can neither hang nor crash " +
    "the walk: u32 sizes >= 2^31, non-advancing sizes, truncated fmt") {
    // a chunk declaring size 0xFFFFFFF8 truncated to Int is -8: the old
    // Int walk advanced by 8 + (-8) = 0 forever (ADVICE r14). The walk
    // must terminate and yield the documented empty result.
    def evil(sz: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
        .put("JUNK".getBytes("US-ASCII")).putInt((sz & 0xFFFFFFFFL).toInt)
      bb.array()
    }
    for (sz <- Seq(0xFFFFFFF8L, 0x80000000L, 0xFFFFFFFFL, 0x7FFFFFF0L)) {
      val done = scala.concurrent.Future {
        Multimodal.wavFrameFeatures(evil(sz), 10)
      }(scala.concurrent.ExecutionContext.global)
      val r = scala.concurrent.Await.result(done,
        scala.concurrent.duration.Duration(10, "s"))
      assert(r.isEmpty, s"size $sz must yield no frames")
      // valid RIFF/WAVE magic, so format stays 3.0 — but the walk must
      // terminate with no fmt/data found: rate/channels/duration all 0
      val hdr = new Multimodal.WavHeaderDecoder().decode(evil(sz))
      assert(hdr.toSeq === Seq(3.0, 0.0, 0.0, 0.0), s"size $sz header walk")
    }
    // fmt chunk truncated mid-field: bounds-checked, empty — not thrown
    val trunc = {
      val bb = java.nio.ByteBuffer.allocate(28)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(20)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // ...and the buffer ends here
      bb.array()
    }
    assert(Multimodal.wavFrameFeatures(trunc, 10).isEmpty)
  }

  test("withWavFrames explodes one row per frame with features appended") {
    val sr = 8000
    val tone = Array.tabulate[Short](2400)(i =>
      (0.25 * 32767.0 * math.sin(2 * math.Pi * 200.0 * i / sr)).toShort)
    val df = Seq((1L, wav16(tone, sr)), (2L, Array.emptyByteArray))
      .toDF("id", "payload")
    val out = Multimodal.withWavFrames(df, "payload", frameLen = 800)
      .select("id", "frame", "rms", "zero_crossings")
      .as[(Long, Int, Double, Int)].collect()
    assert(out.count(_._1 == 1L) === 3)   // 2400/800 frames
    assert(!out.exists(_._1 == 2L))       // empty payload: no rows
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(0, 1, 2))
    out.filter(_._1 == 1L).foreach { case (_, _, rms, zc) =>
      assert(math.abs(rms - 0.25 / math.sqrt(2)) < 0.01)
      assert(math.abs(zc - 40) <= 1)
    }
  }
}
