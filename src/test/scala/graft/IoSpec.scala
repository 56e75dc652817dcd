package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.syntax._

/** IO round-trips — the SDS save/load analog (riptable/rt_sds.py:719,
  * 1855; SURVEY §2.1: Parquet replaces SDS, multi-path read replaces
  * stack=True, partitioned tables replace PDataset).
  */
class IoSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", 1.5, "2024-01-01"), (2L, "b", 2.5, "2024-01-02"),
    (3L, "a", 3.5, "2024-01-02")
  ).toDF("id", "k", "v", "d")

  test("parquet round-trip preserves schema and values (save_sds/load_sds)") {
    val d = Files.createTempDirectory("graft_io").toString + "/t"
    sample.write.parquet(d)
    val back = spark.read.parquet(d)
    // nullability is relaxed on read; names+types must round-trip exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      sample.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq === sample.orderBy("id").collect().toSeq)
  }

  test("multi-path read stacks files like load_sds(stack=True)") {
    val base = Files.createTempDirectory("graft_io").toString
    sample.filter($"k" === "a").write.parquet(base + "/f1")
    sample.filter($"k" === "b").write.parquet(base + "/f2")
    val stacked = Tables.stacked(spark, Seq(base + "/f1", base + "/f2"))
    assert(stacked.count() === 3)
    assert(stacked.columns.contains("p_src"))
    // p_src names part-files; the logical slices are the two source dirs
    assert(stacked.select(regexp_extract($"p_src", "(f1|f2)", 1))
      .distinct().count() === 2)
  }

  test("partitioned write + partition pruning (PDataset)") {
    val d = Files.createTempDirectory("graft_io").toString + "/p"
    sample.write.partitionBy("d").parquet(d)
    val pruned = spark.read.parquet(d).filter($"d" === "2024-01-02")
    assert(pruned.count() === 2)
    // pruning must reach the scan: only one partition dir read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }

  test("csv round-trip with header + schema inference (load_csv_as_dataset)") {
    val d = Files.createTempDirectory("graft_io").toString + "/c"
    sample.write.option("header", "true").csv(d)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(d)
    assert(back.count() === 3)
    assert(back.schema("v").dataType.typeName === "double")
  }

  test("hstack across files with missing columns invalid-fills") {
    val base = Files.createTempDirectory("graft_io").toString
    sample.select("id", "k").write.parquet(base + "/a")
    sample.select("id", "v").write.parquet(base + "/b")
    val a = spark.read.parquet(base + "/a")
    val b = spark.read.parquet(base + "/b")
    val out = a.hstack(b)
    assert(out.count() === 6)
    assert(out.filter($"k".isNull).count() === 3)
  }

  test("sentinel shim: riptable invalids round-trip through null") {
    val df = Seq(
      (Int.MinValue, Long.MinValue, Double.NaN, ""),
      (7, 8L, 9.5, "ok")).toDF("i", "l", "d", "s")
    val nulled = Tables.fromSentinels(df, includeStrings = true)
    val row0 = nulled.orderBy($"i".asc_nulls_first).head()
    assert(row0.isNullAt(0) && row0.isNullAt(1) && row0.isNullAt(2) &&
      row0.isNullAt(3))
    val row1 = nulled.orderBy($"i".asc_nulls_first).collect()(1)
    assert(row1.getInt(0) === 7 && row1.getString(3) === "ok")
    // and back: nulls re-materialize as the dtype sentinels
    val back = Tables.toSentinels(nulled, includeStrings = true)
      .orderBy($"i".asc_nulls_first).head()
    assert(back.getInt(0) === Int.MinValue && back.getLong(1) === Long.MinValue)
    assert(back.getDouble(2).isNaN && back.getString(3) === "")
  }

  test("z-ordered layout prunes files on EVERY keyed dimension") {
    // two independent uniform columns: an x-sorted layout skips on x
    // but every file spans the full y range; the z-ordered layout
    // gives every file a tight envelope on BOTH, so a point-range
    // predicate on either column intersects ~sqrt(files) envelopes
    val df = spark.range(20000L).select(
      pmod(col("id") * 48271L, lit(65537L)).cast("double").as("x"),
      pmod(col("id") * 16807L, lit(65521L)).cast("double").as("y"))
    val dirZ = Files.createTempDirectory("graft_zord").toString + "/z"
    val dirX = Files.createTempDirectory("graft_zord").toString + "/x"
    Tables.writeZOrdered(df, Seq("x", "y"), dirZ, nFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirX)
    // per-file min/max = exactly what the parquet footer publishes
    def envelopes(dir: String, c: String): Seq[(Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .select("lo", "hi").as[(Double, Double)].collect().toSeq
    def hits(env: Seq[(Double, Double)], lo: Double, hi: Double): Int =
      env.count { case (a, b) => b >= lo && a < hi }
    // row counts identical — layout never changes content
    assert(spark.read.parquet(dirZ).count() === 20000L)
    val (qLo, qHi) = (30000.0, 31000.0)
    // x-sorted: y-predicates prune nothing
    assert(hits(envelopes(dirX, "y"), qLo, qHi) >= 14)
    // z-ordered: BOTH dimensions prune well below the no-pruning
    // baseline. The bound is ~sqrt(nFiles) + interleave edge effects,
    // NOT a knife-edge constant: repartitionByRange picks its split
    // points by SAMPLING, so the file envelopes wobble a little from
    // run to run (observed 4-9 hits for 16 files).
    assert(hits(envelopes(dirZ, "y"), qLo, qHi) <= 10)
    assert(hits(envelopes(dirZ, "x"), qLo, qHi) <= 10)
  }
}
