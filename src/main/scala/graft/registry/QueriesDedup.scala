package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.functions._
import graft.syntax._

/** Query registry — deduplication: exact, MinHash/SimHash/LSH, n-gram jaccard, containment, spans, artifacts.
  * One entry per SURVEY §2 operator family member; names pair 1:1 with
  * `OraclesDedup.m` (driver contract: SparkEntry.queries/oracleSql).
  */
private[graft] object QueriesDedup {
  import QueryShared._

  def m: Map[String, (SparkSession, String) => DataFrame] = Map(

    // sf-robust input (RegistrySweepSpec finding, r11): the synthetic
    // corpus has ZERO exact duplicates below sf0.1, so the pristine
    // query compared empty-to-empty — a vacuous oracle. Union in a
    // deterministically re-keyed clone of every 7th doc (the q179/q247
    // synthesized-input pattern, identically constructed by the oracle)
    // so the fingerprint group-by is exercised at every scale factor.
    // clone membership keys on a CONTENT hash (not doc_id): the
    // documents table ships with the same 500 ids at sf0.001 and
    // sf0.01 (only texts differ), so an id-structural fixture is a
    // scale-constant — RegistrySweepSpec's r12 change-across-sf sweep
    // requires the kept-group set to move with the text content
    "q27_exact_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cloned = docs
        .filter(pmod(Dedup.portableHash64(col("text")), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000000L))
      Dedup.exactDupGroups(docs.unionByName(cloned), "doc_id", "text")
        .select(col("n_docs"), col("keep_id"))
        .orderBy(col("keep_id"))
    }),

    "q28_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // Full MinHash pipeline: banded LSH candidates → exact-jaccard verify.
    // Output is signature-independent, so it oracles against the exact
    // jaccard pair set. ACCEPTED RISK (deterministic, not flaky): banding
    // at k=32/r=2 recalls a J=τ=0.8 pair w.p. 1−(1−J²)¹⁶ ≈ 1−8e-8; a
    // miss would fail the gate at that SF reproducibly. Verified green at
    // sf0.001/0.01/0.1 (28/25/≥25 pairs). Structural recall 1 is available
    // via fullRecall=true (unions the prefix-filter candidates; asserted
    // equal to the exact pair set in ScaleSpec) — this query leaves it
    // off to keep the MinHash path itself under test.
    "q29_minhash" -> ((s, dir) =>
      Dedup.minhashVerifiedPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, k = 32, rowsPerBand = 2, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // portableHash64 token hash → the signature itself is reproducible
    // in DuckDB (md5-derived), so signatures oracle-check exactly.
    "q30_simhash" -> ((s, dir) =>
      Dedup.simhashDf(t(s, dir, "documents"), "doc_id", "text", "simhash",
        Dedup.portableHash64)
        .orderBy(col("doc_id"))),

    // SimHash near-dup pairs at the distance the banding GUARANTEES
    // (hamming ≤ 3 ⇒ one shared 16-bit band, pigeonhole). With the
    // portable token hash the oracle recomputes signatures + banding
    // exactly — output equality, not a recall gamble.
    "q47_simhash_near" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, hashFn = Dedup.portableHash64)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash-banded candidates → exact-jaccard verify, portable hashes
    // end to end: output = {pairs: hamming ≤ 3 ∧ J ≥ 0.5}, fully
    // engine-reproducible (md5 simhash + shingle-set jaccard)
    "q91_simhash_verified" -> ((s, dir) =>
      Dedup.simhashVerifiedPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, shingleN = 3, threshold = 0.5,
        hashFn = Dedup.portableHash64)
        .orderBy(col("id_a"), col("id_b"))),

    // Near-dup pairs → duplicate CLUSTERS: iterative min-label
    // connected components (O(diameter) shuffle rounds, never the
    // transitive closure). Oracle recomputes components via a
    // recursive CTE over the exact jaccard pair set.
    "q119_dup_clusters" -> ((s, dir) =>
      Cluster.connectedComponents(
        Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, threshold = 0.5)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
        .orderBy(col("id"))),

    // Per-doc boilerplate profile: share of shingles that are corpus-hot
    // (df ≥ 10 docs) — the df-cap signal a scalable prefix index drops.
    "q120_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateStats(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, dfCap = 10)
        .orderBy(col("doc_id"))),

    // Benchmark decontamination: train docs (source ≠ src0) sharing a
    // distinct 5-gram with the eval set (source = src0), with counts.
    "q121_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminatedDocs(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", shingleN = 5)
        .orderBy(col("doc_id"))
    }),

    // Dedup survivors: one kept doc per duplicate cluster (min id) with
    // the cluster size — the "which rows survive dedup" answer, fed by
    // the same CC labels as q119.
    "q122_dedup_keep" -> ((s, dir) =>
      Cluster.clusterRepresentatives(
        Cluster.connectedComponents(
          Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
            shingleN = 3, threshold = 0.5)
            .select(col("id_a"), col("id_b")),
          "id_a", "id_b"))
        .orderBy(col("keep_id"))),

    // Edit-distance near-dup: PassJoin segment blocking (complete for
    // dist ≤ 5 by pigeonhole) → banded Levenshtein verify. The oracle
    // needs no blocking knowledge — plain all-pairs predicate.
    "q128_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
        maxDist = 5, prefixChars = 80)
        .orderBy(col("id_a"), col("id_b"))),

    "q169_substring_dup" -> ((s, dir) =>
      // Lee-et-al-style cross-document substring dedup: per doc, the
      // fraction of its 8-token spans shared with another document.
      operators.Dedup.substringDupStats(
        t(s, dir, "documents"), "doc_id", "text", k = 8)
        .select(col("doc_id"), col("n_grams"), col("dup_grams"),
          col("dup_frac"))
        .orderBy(col("doc_id"))),

    // Near-dup clusters → keep the BEST-quality member per cluster
    // (not min-id): jaccard pairs (shared registry frame with q119/q122)
    // → connected components → per-cluster quality argmax.
    "q176_cluster_rep_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cc = Cluster.connectedComponents(
        Dedup.jaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      Cluster.clusterRepresentativesBy(cc,
        docs.select(col("doc_id"),
          TextFns.qualityScore(col("text")).as("quality")),
        "doc_id", "quality")
        .orderBy(col("cluster_id"))
    }),

    // Winnowing (MOSS) fingerprint overlap: char-8-gram hashes, window-4
    // min sampling, cross-doc shared-fingerprint profile.
    "q177_winnowing" -> ((s, dir) =>
      Dedup.winnowDupStats(t(s, dir, "documents"), "doc_id", "text",
        k = 8, w = 4)
        .orderBy(col("doc_id"))),

    // Asymmetric containment (Broder): ordered pairs where ≥60% of
    // id_a's shingles appear in id_b — quote/nested-doc detection that
    // jaccard misses when sizes differ.
    "q180_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.6)
        .orderBy(col("id_a"), col("id_b"))),

    // Keep-first novelty attribution: fraction of each doc's shingles
    // unseen in lower-id docs (marginal-content curve over ingest order).
    "q184_novelty" -> ((s, dir) =>
      Dedup.noveltyStats(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy(col("doc_id"))),

    // Incremental crawl dedup: odd-id docs (the "new snapshot") checked
    // for near-dups against even-id docs (the "index"); banded minhash
    // + prefix full-recall → exact jaccard ≥ 0.5.
    "q185_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusDupes(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", shingleN = 3, threshold = 0.5)
        .orderBy(col("id_new"), col("id_old"))
    }),

    // Substring-dedup REMOVAL geometry (Lee et al. 2022): per doc, the
    // interval UNION of its cross-doc-duplicated 8-token spans — the
    // chars a span-level deduper would actually cut, not just the gram
    // counts of q169.
    "q194_dup_spans" -> ((s, dir) =>
      operators.Dedup.dupSpanStats(t(s, dir, "documents"), "doc_id",
        "text", k = 8)
        .orderBy(col("doc_id"))),

    // The removal itself: corpus with every duplicated span CUT —
    // cleaned text content-checked by md5, not just counted.
    "q195_dedup_clean" -> ((s, dir) =>
      operators.Dedup.removeDupSpans(t(s, dir, "documents"), "doc_id",
        "text", k = 8)
        .select(col("doc_id"), col("n_tokens"), col("kept_tokens"),
          md5(col("cleaned_text")).as("cleaned_md5"))
        .orderBy(col("doc_id"))),

    // SURGICAL decontamination (the action behind q220's gate): cut
    // from every train doc (doc_id % 4 <> 0) the token spans whose
    // 8-grams appear anywhere in the eval slice (doc_id % 4 = 0),
    // keep the rest — q195's deletion geometry keyed by the eval gram
    // set instead of corpus duplication
    "q252_decontam_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.removeEvalSpans(
          docs.filter(pmod(col("doc_id"), lit(4)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(4)) === 0),
          "doc_id", "text", k = 8)
        .select(col("doc_id"), col("n_tokens"), col("kept_tokens"),
          md5(col("cleaned_text")).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // Materialized dedup-pair artifact (dedup once, consume many
    // times): the verified τ=0.5 pair set is written ONCE as a
    // parquet table bucketed+sorted by id_a; every later consumer
    // reads the bucketed scan — no re-tokenize/re-shingle/re-verify,
    // and the per-doc dup-degree groupBy below plans with ZERO
    // Exchange because the scan already hash-distributes on id_a
    // (PipelineR8Spec pins both properties). The bench warmup pass
    // pays the cold build; timed passes measure the warm path. Output
    // columns avoid float accumulation (count + exact id sum + max of
    // identically-rounded jaccards), so the hash compare is exact.
    "q210_pair_artifact" -> ((s, dir) => {
      val table = "graft_pairs_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      // fingerprint the corpus dir: a persisted table from a PREVIOUS
      // testdata generation rebuilds instead of serving stale pairs
      val fp = Dedup.sourceFingerprint(s, s"$dir/documents.parquet")
      Dedup.ensurePairs(s, table, fingerprint = Some(fp)) {
        Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, threshold = 0.5)
      }
        .groupBy(col("id_a"))
        .agg(count(lit(1)).as("n_dups"),
          sum(col("id_b")).as("partner_id_sum"),
          max(col("jaccard")).as("j_max"))
        .orderBy(col("id_a"))
    }),

    // Benchmark decontamination: which corpus docs CONTAIN an eval doc
    // (containment ≥ 0.8 of the eval doc's shingles) — eval set = the
    // doc_id % 10 == 0 slice, corpus = the rest.
    "q220_decontamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossContainment(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", shingleN = 3, threshold = 0.8)
        .orderBy(col("id_eval"), col("id_doc"))
    }),

    // LSH S-curve audit: per true-jaccard bin, how much of the exact
    // pair set (PPJoin at τ=0.3) the SimHash banding (4×16-bit bands,
    // portable hashes) actually captures — the measured capture curve
    // of the blocking geometry, not the assumed one. recall < 1 in a
    // bin = what that banding config loses there.
    "q259_lsh_scurve" -> ((s, dir) =>
      Dedup.lshSCurve(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, tauFloor = 0.3, maxHamming = 3,
        hashFn = Dedup.portableHash64)
        .orderBy(col("j_bin"))),

    // Bloom-prefiltered decontamination — the SAME gate as q220 at a
    // looser τ, but the corpus gram stream passes a 2^18-bit bloom of
    // the eval prefix hashes (map-only, literal bitmap) before the
    // candidate join. A bloom probed with its own build hashes has no
    // false negatives and the exact verify kills false positives, so
    // the result must equal the exact gate bit for bit — the oracle IS
    // the exact containment SQL; any bloom indexing bug = missing rows.
    "q256_bloom_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossContainmentBloom(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", shingleN = 3, threshold = 0.7)
        .orderBy(col("id_eval"), col("id_doc"))
    }),

    // Bloom-bitmap ARTIFACT round trip (the q253/q254/q255 contract
    // applied to the decontamination gate): the eval suite's bloom
    // persists as a content-addressed parquet artifact
    // (Models.ensureBloom — built once per suite, probed by every
    // crawl), and the gate runs under the ARTIFACT bitmap via the
    // serve-only crossContainmentBloomWith. Params match q256 exactly,
    // so the artifact path must reproduce q256's exact-gate result bit
    // for bit (same oracle); a fresh session pays one 32 KiB parquet
    // read instead of re-shingling the suite.
    "q260_bloom_artifact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalD = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val bm = Models.ensureBloom(evalD, "doc_id", "text",
        shingleN = 3, threshold = 0.7)
      Dedup.crossContainmentBloomWith(evalD,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", bm, shingleN = 3, threshold = 0.7)
        .orderBy(col("id_eval"), col("id_doc"))
    }),

    // Cross-MODAL contamination report — the release-gate artifact that
    // unifies the two decontamination complements per TRAIN doc: the
    // n-gram containment gate (q256's bloom path — catches verbatim
    // quoting) and the embedding-space leakage audit (q251's banded
    // machinery keyed by the TRAIN side — catches paraphrases that
    // share no shingle). documents and embeddings share the synthetic
    // id space, so one full-outer key join yields (doc, worst verbatim
    // containment, semantic-neighbor count, worst cosine) — what an
    // "is this training set clean" review actually reads.
    "q262_contamination_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val ng = Dedup.crossContainmentBloom(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          "doc_id", "text", shingleN = 3, threshold = 0.7)
        .groupBy(col("id_doc"))
        .agg(max(col("containment")).as("max_containment"))
      // the audit keys its SECOND argument — pass train vectors there
      // to get per-train-doc leak counts against the eval slice. The
      // train side carries planted paraphrase twins of the eval slice
      // (q108/q251's plant — the random corpus has no cosine ≥ 0.9
      // mass of its own), so the semantic quadrant of the report is
      // populated at the production 64-bit/4-band geometry.
      val evalVecs = emb.select(col("vec_id"), col("embedding"))
        .filter(pmod(col("vec_id"), lit(10)) === 0)
      val trainVecs = emb.select(col("vec_id"), col("embedding"))
        .filter(pmod(col("vec_id"), lit(10)) =!= 0)
        .unionByName(QueryShared.plantTwins(evalVecs, "vec_id", "embedding"))
      val sem = Similarity.crossSplitSemanticLeakage(
          evalVecs, trainVecs,
          "vec_id", "embedding", threshold = 0.9)
        .select(col("id_eval").as("id_doc"),
          col("n_leaks").as("n_sem_leaks"), col("max_cosine"))
      ng.join(sem, Seq("id_doc"), "full_outer")
        .select(col("id_doc"),
          coalesce(col("max_containment"), lit(0.0)).as("max_containment"),
          coalesce(col("n_sem_leaks"), lit(0L)).as("n_sem_leaks"),
          coalesce(col("max_cosine"), lit(0.0)).as("max_sem_cosine"))
        .orderBy(col("id_doc"))
    }),

    // Crawl snapshot diff: added/removed/changed/unchanged per source
    // between two synthesized snapshots of the corpus (old = ids not
    // divisible by 3; new = even ids, with every 5th doc's text
    // revised — the q179 synthesized-input pattern, so both engines
    // construct identical snapshots)
    // the revision set keys on a CONTENT hash (same rationale as q27:
    // ids are identical across sf0.001/sf0.01, so an id-keyed revision
    // pattern made the whole diff a scale-constant)
    "q247_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val prev = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val next = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .withColumn("text",
          when(pmod(Dedup.portableHash64(col("text")), lit(5)) === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      Dedup.snapshotDiff(prev, next, "doc_id", "source", "text")
        .orderBy(col("source"))
    })
  )
}
