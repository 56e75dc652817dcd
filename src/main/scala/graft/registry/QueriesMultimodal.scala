package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Query registry — multimodal wing (image dHash near-dup, WAV frame
  * features) over the PLANTED fixture corpus ([[MmFixtures]]): the
  * driver's DuckDB hash gate replays banding/verification in SQL over
  * the expected tables the fixture generator derived BY CONSTRUCTION
  * (never by running the operators), so the real decode paths —
  * javax.imageio PNG → area-average → compare, RIFF parse →
  * interleave → channel fold → framing — are oracle-backed end to end
  * (VERDICT r14 #1). Fixtures are SF-independent; `dir` is unused.
  */
private[graft] object QueriesMultimodal {

  def m: Map[String, (SparkSession, String) => DataFrame] = Map(

    // image near-dup pairs: dHash once, 4×16 band self-join, exact
    // bit_count verify — oracle replays the identical blocking over
    // the planted expected hashes, so every decoded hash that creates
    // or breaks a pair is pinned
    "q267_image_neardup" -> ((s, _) => {
      MmFixtures.ensure(s)
      val imgs = s.read.parquet(MmFixtures.imagesPath)
      Multimodal.imageNearDupPairs(imgs, "img_id", "payload", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // WAV per-frame RMS/zero-crossings explode: one row per (clip,
    // frame); malformed clips (truncated, float-PCM, the u32-overflow
    // chunk) must contribute ZERO rows — pinned by the oracle rowcount
    "q268_wav_frames" -> ((s, _) => {
      MmFixtures.ensure(s)
      val clips = s.read.parquet(MmFixtures.audioPath)
        .select(col("clip_id"), col("payload"))
      Multimodal.withWavFrames(clips, "payload", MmFixtures.frameLen)
        .select(col("clip_id"), col("frame"), col("rms"),
          col("zero_crossings"))
        .orderBy(col("clip_id"), col("frame"))
    }),

    // image-dedup GATE vs a reference suite (decontamination idiom for
    // images): suite dHashes collect driver-side and bind as ONE
    // literal; each image takes its min hamming against the suite
    // map-side. Suite = clusters 0–2 (6 images), so exactly those
    // clusters' members gate as dups; corrupt payloads yield null/false
    "q271_image_suite_gate" -> ((s, _) => {
      MmFixtures.ensure(s)
      val imgs = s.read.parquet(MmFixtures.imagesPath)
      val suite = imgs.filter(col("cluster") <= 2).select(col("payload"))
      Multimodal.imageDupAgainstSuite(
          imgs.select(col("img_id"), col("payload")), "payload",
          suite, "payload", maxHamming = 3)
        .select(col("img_id"), col("min_hamming"), col("is_dup"))
        .orderBy(col("img_id"))
    }),

    // per-image hash equality: decode(payload) must equal the pattern
    // the image was constructed from — the direct bit-for-bit pin
    // (undecodable rows must yield the documented sentinel)
    "q269_image_dhash" -> ((s, _) => {
      MmFixtures.ensure(s)
      val imgs = s.read.parquet(MmFixtures.imagesPath)
        .select(col("img_id"), col("payload"))
      Multimodal.imageDHash(imgs, "payload", "phash")
        .select(col("img_id"), col("phash"))
        .orderBy(col("img_id"))
    })
  )
}
