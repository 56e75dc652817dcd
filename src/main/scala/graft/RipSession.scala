package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Riptable is an eager single-node library whose "session" is the Python
  * process (reference: `riptable/rt_fastarray.py:381` threading globals at
  * `rt_fastarray.py:6266`). On Spark the session carries the cluster tuning
  * instead. Defaults here are chosen for the 100 TB posture:
  *   - AQE on (runtime re-plan, skew-join splitting, partition coalescing);
  *   - zstd parquet (riptable's SDS is zstd-compressed, `rt_sds.py:719`);
  *   - shuffle partitions sized by the caller (32 on the local test rig;
  *     thousands on a real cluster).
  */
object RipSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Runtime bloom-filter join pruning: the probe side of a selective
      // join gets a bloom filter built from the build side pushed into
      // its scan — at 100 TB this prunes fact-table row groups before
      // the shuffle (complements AQE; a no-op on tiny local data).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // Nanosecond parquet timestamps surface as LongType ns-since-epoch
      // (SURVEY §1.2: nanos-as-long policy; TimestampType is µs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Riptable/numpy semantics are non-ANSI (wraparound int math,
      // silent overflow) — matches rc.BasicMath* kernel behavior.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // Always use the sort-based shuffle writer (optimization r16,
      // guide §2.2 "fewer, larger blocks"): below this threshold Spark
      // picks BypassMergeSortShuffleWriter, which opens R partition
      // FILES per map task — M×R file creations per shuffle. Profiled
      // on the bench rig (jstack sampling): with 32-partition inputs
      // every map task spent ~70 ms CPU in FileOutputStream.open0 /
      // DiskBlockObjectWriter.open, turning a 150-row aggregate into
      // 2.3 s of CPU. The sort writer emits ONE data+index file per
      // map task at any R. In production R exceeds the default
      // threshold (200) anyway — sort is what runs at scale — so this
      // aligns local execution with the at-scale path; it is NOT a
      // local-only tuning.
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")

  /** Local session for tests: local[n] with n shuffle partitions.
    * `spark.locality.wait=0` is LOCAL-ONLY (not in `builder`): one
    * executor makes every task process-local by construction, so the
    * scheduler's locality wait (default 3 s per level, triggered by
    * cached-block location preferences) is pure dead time — measured
    * r16: a 10-query latency-bound bench subset dropped 9.0 → 7.4 s.
    * Cluster sessions built via `builder` keep the default, where
    * locality is real.
    */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cpus]", cpus)
      .config("spark.locality.wait", "0")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
