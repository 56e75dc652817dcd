package graft

/** Correctness-cadence pin (VERDICT r10 #8): every registered query
  * must return AT LEAST ONE ROW at the smallest shipped scale factor.
  *
  * Why rows > 0 and not just "runs": the driver's oracle gate compares
  * row counts, schema, and value hashes — an empty Spark result against
  * an empty DuckDB result passes trivially, verifying NOTHING. A new
  * query whose filter happens to select zero rows at small SF would
  * ship "green" while its semantics went completely unexercised. This
  * sweep makes that a test failure in the same commit that adds the
  * query (ContractSpec already pins that the query has an oracle at
  * all; together they enforce the land-with-oracle-rows cadence).
  *
  * One test, one pass, failures aggregated — a broken query reports
  * alongside every other broken query instead of masking them.
  */
class RegistrySweepSpec extends SparkSpec {

  // This sweep's first run (r11) caught two queries that had compared
  // empty-to-empty at EVERY shipped scale factor below sf0.1 since
  // their introduction: q27_exact_dedup (the corpus has no natural
  // exact dups under sf0.1) and q147_tpch_q22 (the generator gives
  // every customer an order under sf0.1, so Q22's anti-join was
  // structurally empty). Both now synthesize deterministic inputs
  // (cloned docs / a sliced orders side) that the oracle mirrors, so
  // no allowlist is needed — keep it that way.
  test("every registered query returns >= 1 row at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, dir).count()
          if (n < 1) Some(s"$name: 0 rows at $dir (oracle hash-check " +
            "would be vacuous)")
          else None
        } catch {
          case e: Throwable => Some(s"$name: threw ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // VERDICT r11 #8: rows > 0 alone cannot catch a fixture that
  // degenerates to a CONSTANT at every scale factor (it would compare
  // equal-to-equal forever while the operator's scaling semantics go
  // unexercised). For the scale-sensitive families — TPC-H, dedup,
  // drift/decontamination — the full result (count + order-insensitive
  // value hash over string forms) must CHANGE between sf0.001 and
  // sf0.01. Genuinely scale-invariant queries live in the documented
  // allowlist below.
  test("scale-sensitive families: result CHANGES between sf0.001 and sf0.01") {
    import org.apache.spark.sql.functions._
    val families =
      Seq("tpch", "dedup", "minhash", "simhash", "jaccard", "drift",
        "psi", "decontam", "containment", "edit_distance", "novel",
        "snapshot", "contamination", "scurve", "dsir", "ann_recall",
        "bloom", "release")
    val allow: Map[String, String] = Map.empty // none known — keep it so
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => families.exists(n.contains))
      .filterNot(allow.contains)
    def sig(name: String, dir: String): (Long, Long) = {
      val df = SparkEntry.queries(name)(spark, dir)
      val h = df.agg(count(lit(1)),
        bit_xor(xxhash64(df.columns.map(c => col(c).cast("string")): _*)))
        .head()
      (h.getLong(0), if (h.isNullAt(1)) 0L else h.getLong(1))
    }
    val failures = names.flatMap { n =>
      try {
        if (sig(n, "/root/testdata/sf0.001") ==
            sig(n, "/root/testdata/sf0.01"))
          Some(s"$n: identical (count, hash) at sf0.001 and sf0.01 — " +
            "fixture may have degenerated to a scale-constant")
        else None
      } catch {
        case e: Throwable => Some(s"$n: threw ${e.getClass.getSimpleName}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
