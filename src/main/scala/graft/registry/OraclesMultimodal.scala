package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesMultimodal.m`. The
  * expected tables were written by [[MmFixtures]] from the PLANTED
  * constructions (dHash patterns / PCM sample arrays) — independent of
  * the decode paths under test. The band join + bit_count verify is
  * replayed in SQL exactly like the SimHash oracles (q30/q47 idiom).
  */
private[graft] object OraclesMultimodal {

  private val images =
    s"read_parquet('${MmFixtures.imagesPath}/*.parquet')"
  private val frames =
    s"read_parquet('${MmFixtures.framesPath}/*.parquet')"

  def m: Map[String, String] = Map(

    "q267_image_neardup" ->
      s"""WITH h AS (SELECT img_id, expected_hash FROM $images
         |  WHERE expected_hash <> -9223372036854775808),
         |b AS (SELECT img_id, band,
         |  (expected_hash >> (16 * band)) & 65535 AS bandval
         |  FROM h, range(4) t(band)),
         |cand AS (SELECT DISTINCT a.img_id AS id_a, b2.img_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band
         |    AND a.bandval = b2.bandval AND a.img_id < b2.img_id)
         |SELECT c.id_a, c.id_b,
         |  CAST(bit_count(xor(ha.expected_hash, hb.expected_hash)) AS INT)
         |    AS hamming
         |FROM cand c
         |JOIN h ha ON ha.img_id = c.id_a
         |JOIN h hb ON hb.img_id = c.id_b
         |WHERE bit_count(xor(ha.expected_hash, hb.expected_hash)) <= 3
         |ORDER BY c.id_a, c.id_b""".stripMargin,

    "q268_wav_frames" ->
      s"""SELECT clip_id, frame, rms, zero_crossings
         |FROM $frames ORDER BY clip_id, frame""".stripMargin,

    "q271_image_suite_gate" ->
      s"""WITH h AS (SELECT img_id, expected_hash FROM $images),
         |s AS (SELECT DISTINCT expected_hash FROM $images
         |  WHERE cluster <= 2 AND expected_hash <> -9223372036854775808),
         |m AS (SELECT h.img_id,
         |  CASE WHEN h.expected_hash <> -9223372036854775808 THEN
         |    (SELECT CAST(min(bit_count(xor(h.expected_hash,
         |       s.expected_hash))) AS INT) FROM s)
         |  END AS min_hamming FROM h)
         |SELECT img_id, min_hamming,
         |  coalesce(min_hamming <= 3, false) AS is_dup
         |FROM m ORDER BY img_id""".stripMargin,

    "q269_image_dhash" ->
      s"""SELECT img_id, expected_hash AS phash
         |FROM $images ORDER BY img_id""".stripMargin
  )
}
