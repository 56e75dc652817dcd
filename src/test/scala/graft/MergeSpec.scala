package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** merge2 semantics vs riptable's contract (rt_merge.py:2293):
  * null keys never match, validate, keep, indicator, suffixes, order
  * preservation.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (2L, "c", 21.0), (4L, "d", 40.0)
  ).toDF("k", "lv", "lx")

  private def right = Seq(
    (1L, "R1"), (2L, "R2"), (3L, "R3")
  ).toDF("k", "rv")

  test("inner join multiplicity") {
    val out = Merge.merge2(left, right, Seq("k"), "inner")
    assert(out.count() === 3) // k=1 once, k=2 twice
  }

  test("left join keeps unmatched with nulls") {
    val out = Merge.merge2(left, right, Seq("k"), "left")
    assert(out.count() === 4)
    assert(out.filter($"k" === 4 && $"rv".isNull).count() === 1)
  }

  test("outer join adds right-only rows; indicator labels sides") {
    val out = Merge.merge2(left, right, Seq("k"), "outer", indicator = true)
    assert(out.count() === 5)
    val byInd = out.groupBy("merge_indicator").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byInd === Map("both" -> 3, "left_only" -> 1, "right_only" -> 1))
  }

  test("null keys never match (rt_merge.py:2320)") {
    val l = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b")).toDF("k", "lv")
    val r = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y")).toDF("k", "rv")
    val out = Merge.merge2(l, r, Seq("k"), "inner")
    assert(out.count() === 1) // only k=1; null does not join to null
  }

  test("validate m:1 rejects duplicate right keys") {
    val dupRight = Seq((1L, "x"), (1L, "y")).toDF("k", "rv")
    assertThrows[Merge.MergeValidationException](
      Merge.merge2(left, dupRight, Seq("k"), "left", validate = Some("m:1")))
  }

  test("validate m:1 passes on unique right") {
    Merge.merge2(left, right, Seq("k"), "left", validate = Some("m:1"))
  }

  test("keep=first dedupes left side by order cols") {
    val out = Merge.merge2(left, right, Seq("k"), "inner",
      keepLeft = Some("first"), keepOrderCols = Seq("lv"))
    // k=2 keeps lv="b" only
    assert(out.filter($"k" === 2).select("lv").as[String].collect().toSeq === Seq("b"))
  }

  test("suffixes applied to colliding non-key columns") {
    val r2 = right.withColumnRenamed("rv", "lv")
    val out = Merge.merge2(left, r2, Seq("k"), "inner")
    assert(out.columns.contains("lv_x") && out.columns.contains("lv_y"))
  }

  test("preserveOrder keeps left row order") {
    val out = Merge.merge2(left, right, Seq("k"), "left", preserveOrder = true)
    assert(out.select("lv").as[String].collect().toSeq === Seq("a", "b", "c", "d"))
  }

  test("ismember flags membership") {
    val out = Merge.ismember(left, right, Seq("k"))
    val m = out.select("k", "ismember").as[(Long, Boolean)].collect().toMap
    assert(m === Map(1L -> true, 2L -> true, 4L -> false))
  }

  test("mergeLookup resolves duplicate lookup rows by keep") {
    val lookup = Seq((1L, "first"), (1L, "second"), (2L, "only")).toDF("k", "name")
    val out = Merge.mergeLookup(left, lookup, Seq("k"), keep = "first", orderCol = Some("name"))
    assert(out.filter($"k" === 1).select("name").distinct().as[String].collect().toSeq === Seq("first"))
  }

  test("mergeLookup keep= is deterministic without an explicit orderCol") {
    // duplicate keys whose FIRST column is the key itself: ordering by it
    // would leave the winner arbitrary; default must use non-key columns
    val lookup = Seq((1L, "b", 2.0), (1L, "a", 1.0), (2L, "z", 9.0))
      .toDF("k", "name", "w").repartition(4)
    val run1 = Merge.mergeLookup(left, lookup, Seq("k"), keep = "first")
      .select("k", "name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val run2 = Merge.mergeLookup(left, lookup.repartition(3), Seq("k"), keep = "first")
      .select("k", "name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run1 === run2)
    assert(run1(1L) === "a") // lexicographically-first non-key row wins
  }

  test("ismemberIndex returns the first-occurrence position (MATLAB second output)") {
    val b = Seq((10L, "r0"), (2L, "r1"), (1L, "r2"), (2L, "r3"))
      .toDF("k", "tag")
    val out = Merge.ismemberIndex(left, b, Seq("k"), Seq(col("tag")))
      .select("k", "ismember", "ismember_index").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.get(2)))).toMap
    assert(out(1L) === ((true, Some(2))))  // first occurrence of 1 is row 2
    assert(out(2L) === ((true, Some(1))))  // rows 1 and 3 → first is 1
    assert(out(4L) === ((false, None)))
  }

  test("ismember does not force a broadcast on a high-cardinality side") {
    // riptable's high_card flag (rt_numpy.py:1186): b's key set can be
    // huge — an unconditional broadcast() hint would OOM the driver at
    // scale. Assert the hint is absent from the logical plan (AQE may
    // still choose broadcast from runtime stats; that is fine).
    val big = spark.range(200000).toDF("k")
    val out = Merge.ismember(left, big, Seq("k"))
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hinted = out.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hinted.isEmpty, "ismember must not carry a broadcast hint")
    assert(out.filter($"ismember").count() === 4)
  }

  test("mergeIndices returns source positions; outer null-fills like JoinIndices") {
    val l = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("k", "lv")
    val r = Seq((20L, 1.0), (40L, 2.0)).toDF("k", "rv")
    val inner = Merge.mergeIndices(l, r, Seq("k"), "inner",
      leftOrder = Seq($"k"), rightOrder = Seq($"k"))
      .as[(Long, Long)].collect().toSet
    assert(inner === Set((1L, 0L))) // k=20 is left pos 1, right pos 0
    val outer = Merge.mergeIndices(l, r, Seq("k"), "outer",
      leftOrder = Seq($"k"), rightOrder = Seq($"k"))
      .as[(Option[Long], Option[Long])].collect().toSet
    assert(outer === Set(
      (Some(0L), None), (Some(1L), Some(0L)), (Some(2L), None),
      (None, Some(1L))))
  }
}
