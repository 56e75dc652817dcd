package graft

import graft.operators.{Bloom, Dedup}
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    // adversarial spread: small ints, negatives, Long extremes
    val keys = (Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L) ++
      (2L to 500L).map(i => i * 2654435761L)).toDF("k")
    val bm = Bloom.bitmapFor(keys, "k", mBits = 1 << 12, kHashes = 5)
    val missed = keys
      .filter(!Bloom.probe(col("k"), bm, mBits = 1 << 12, kHashes = 5))
      .count()
    assert(missed === 0L)
  }

  test("false-positive rate stays near the sized bound") {
    val n = 1000
    val inserted = (0 until n).map(i => i.toLong * 7919L).toDF("k")
    val bm = Bloom.bitmapFor(inserted, "k", mBits = 1 << 14, kHashes = 5)
    // disjoint probe population (odd multiples of a different prime)
    val probes = (0 until 10000).map(i => i.toLong * 104729L + 13L).toDF("k")
    val fp = probes.filter(Bloom.probe(col("k"), bm, 1 << 14, 5)).count()
    // m/n ≈ 16.4, k=5 → theoretical FP ≈ 0.9%; allow generous slack
    assert(fp.toDouble / 10000 < 0.05, s"FP rate ${fp / 100.0}%")
  }

  test("empty build: all-zero bitmap rejects everything") {
    val bm = Bloom.bitmapFor(Seq.empty[Long].toDF("k"), "k", 1 << 8, 3)
    assert(bm.forall(_ == 0L))
    val any = (1L to 100L).toDF("k")
      .filter(Bloom.probe(col("k"), bm, 1 << 8, 3)).count()
    assert(any === 0L)
  }

  test("rip_bloom_probe is bit-identical to the element_at twin, and " +
    "guards reject bad geometry") {
    val keys = (Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L) ++
      (2L to 300L).map(i => i * 2654435761L)).toDF("k")
    val bm = Bloom.bitmapFor(keys, "k", mBits = 1 << 12, kHashes = 5)
    // members AND non-members: the two formulations must agree row-wise
    val probesDf = (Seq(Long.MinValue, -1L, 0L, 7L) ++
      (0L until 2000L).map(i => i * 104729L + 13L)).toDF("k")
    val disagree = probesDf.filter(
      Bloom.probe(col("k"), bm, 1 << 12, 5) =!=
        Bloom.probeElementAt(col("k"), bm, 1 << 12, 5)).count()
    assert(disagree === 0L)
    intercept[IllegalArgumentException] {
      Bloom.probe(col("k"), bm, 1 << 12, kHashes = 0)
    }
    intercept[IllegalArgumentException] {
      Bloom.bitmapFor(keys, "k", 1 << 12, kHashes = -1)
    }
  }

  test("crossContainmentBloom equals the exact gate on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalD = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val corp = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val exact = Dedup.crossContainment(evalD, corp, "doc_id", "text",
      shingleN = 3, threshold = 0.7)
      .orderBy("id_eval", "id_doc").collect().toSeq
    val bloomed = Dedup.crossContainmentBloom(evalD, corp, "doc_id", "text",
      shingleN = 3, threshold = 0.7)
      .orderBy("id_eval", "id_doc").collect().toSeq
    assert(exact.nonEmpty, "fixture must exercise the gate")
    assert(bloomed === exact)
  }

  test("sizeFor/hashesFor: power-of-two sizing meets the requested FP " +
    "rate end to end") {
    import graft.operators.Bloom
    assert(Bloom.sizeFor(1000000, 0.01) >= 9585058 / 2, "~9.6M bits raw")
    assert(Integer.bitCount(Bloom.sizeFor(123456, 0.01)) === 1, "pow2")
    assert(Bloom.sizeFor(0) === 1 << 10, "floor")
    assert(Bloom.sizeFor(Long.MaxValue / 4, 0.001) === 1 << 30,
      "ceiling stays a positive Int (no overflow at the clamp boundary)")
    assert(Bloom.hashesFor(1 << 14, 1000) >= 5, "k tracks m/n")
    assert(Bloom.hashesFor(1 << 10, 1L << 40) === 1, "clamped low")
    // end to end at the sized geometry: measured FP under the ask
    val n = 2000
    val m = Bloom.sizeFor(n, 0.01)
    val k = Bloom.hashesFor(m, n)
    val ins = (0 until n).map(_.toLong * 7919L).toDF("k")
    val bm = Bloom.bitmapFor(ins, "k", m, k)
    val fp = (0 until 20000).map(_.toLong * 104729L + 13L).toDF("k")
      .filter(Bloom.probe(col("k"), bm, m, k)).count()
    assert(fp.toDouble / 20000 < 0.02, s"sized FP rate ${fp / 200.0}%")
  }

  test("sharded bloom: no false negatives across shards, per-shard fpp " +
    "within 2x of target at 4x the single-shard capacity") {
    // maxShardBits shrunk to 2^14 so "4 shards needed" is testable
    // without 2^32-bit fixtures — the sharding math is cap-agnostic.
    // 4 000 keys at 1% want ~38k bits ≈ 2.3 shards → nShards rounds to
    // 4; each shard carries ~1 000 keys in 2^14 bits (m/n ≈ 16), so
    // per-shard fpp sits at the single-filter design point.
    val n = 4000
    val keys = (0 until n).map(i => i.toLong * 7919L + 3L).toDF("k")
    val sb = Bloom.shardedBitmapFor(keys, "k", expectedKeys = n,
      fpp = 0.01, maxShardBits = 1 << 14, maxShards = 8)
    assert(sb.nShards === 4, s"expected 4 shards, got ${sb.nShards}")
    assert(sb.mBits <= (1 << 14))
    // never-false-negative across every shard route
    val missed = keys.filter(!Bloom.probeSharded(col("k"), sb)).count()
    assert(missed === 0L, s"$missed inserted keys probed false")
    // fpp within 2x of the 1% target on a disjoint probe stream
    val probes = (0 until 40000).map(i => i.toLong * 104729L + 13L).toDF("k")
    val fp = probes.filter(Bloom.probeSharded(col("k"), sb)).count()
    assert(fp.toDouble / 40000 < 0.02,
      f"sharded FP rate ${fp / 400.0}%.2f%% exceeds 2x the 1%% target")
    // single-shard composites collapse to the plain literal probe
    val sb1 = Bloom.shardedBitmapFor(keys, "k", expectedKeys = n,
      fpp = 0.01, maxShardBits = 1 << 20, maxShards = 8)
    assert(sb1.nShards === 1)
    val disagree = probes.filter(Bloom.probeSharded(col("k"), sb1) =!=
      Bloom.probe(col("k"), sb1.shards(0), sb1.mBits, sb1.kHashes)).count()
    assert(disagree === 0L)
  }

  test("prefilter prunes: non-member gram stream shrinks through the bloom") {
    // inserted set is sparse relative to the probe stream, so the
    // surviving fraction must be close to the FP rate — i.e. the
    // prefilter actually removes almost everything that cannot match
    val inserted = (0L until 100L).toDF("k")
    val bm = Bloom.bitmapFor(inserted, "k", 1 << 14, 5)
    val stream = (0L until 50000L).toDF("k") // 100 members + 49900 non
    val surviving = stream.filter(Bloom.probe(col("k"), bm, 1 << 14, 5)).count()
    assert(surviving >= 100L, "members always pass")
    assert(surviving < 1000L, s"pruning failed: $surviving of 50000 passed")
  }
}
