package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Harness design mirrors the reference (1 warmup + timed iters,
  * riptable/benchmarks/bench_merge.py:100-186): a full warmup pass runs
  * every query once so the timed pass measures steady-state cost —
  * whole-stage-codegen compilation, parquet footers, and the JIT are all
  * one-time costs that would otherwise dominate sub-second queries. Base
  * tables are cached up front (they fit by construction at bench scale;
  * the reference's arrays are likewise RAM-resident when benched).
  *
  * Failures do NOT hide inside timings: a throwing query reports
  * ok=false in the `failed` list and contributes its elapsed time, so a
  * regression is visible in both places.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT, then cache base tables, then one untimed pass of
    // every query (codegen compile + shuffle-file warm)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { n =>
      val t = Tables.table(spark, sfDir, n); t.cache(); t.count()
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
