package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup}

/** Round-10 pins: the classifier trainer's hoisted-gradient identity
  * (grad_b = gp_b − 4e6·gy_b must reproduce the naive per-iteration
  * residual formulation bit-for-bit), the trained-weight memo, and the
  * n = 0 path.
  */
class PipelineR10Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma alpha", "en"),
    (2L, "delta epsilon zeta", "fr"),
    (3L, "alpha alpha alpha beta", "en"),
    (4L, "eta theta iota kappa lambda", "de"),
    (5L, "beta gamma delta beta gamma", "en"),
    // null text: tokens(null) explodes to no rows (unlike "", which
    // tokenizes to one empty token) — a genuinely feature-less doc
    (6L, null.asInstanceOf[String], "en")
  ).toDF("doc_id", "text", "lang")

  test("trainTextClassifier equals a driver-side exact replay of the " +
    "integer GD (hoisted label-gradient identity)") {
    val (bk, iters, lrn, lrd) = (16, 5, 1L, 4L)
    // collect the feature/label frames THROUGH the engine's own hash so
    // the replay differs only in the loop algebra, not the features
    val x = docs.select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        pmod(Dedup.portableHash64(col("t")), lit(bk.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long, Long)].collect()
    val y = docs.select(col("doc_id"),
        (col("lang") === "en").cast("int").cast("long"))
      .as[(Long, Long)].collect().toMap
    val n = y.size.toLong
    val U = 1000000L
    var w = Array.fill(bk)(0L)
    for (_ <- 1 to iters) {
      val z = x.groupBy(_._1).map { case (id, rs) =>
        id -> rs.map { case (_, b, c) => c * w(b.toInt) }.sum
      }
      val grad = new Array[Long](bk)
      for ((id, b, c) <- x) {
        val p = math.min(math.max(z(id) + 2 * U, 0L), 4 * U)
        grad(b.toInt) += c * (p - 4 * U * y(id))
      }
      w = Array.tabulate(bk)(b =>
        w(b) - Math.floorDiv(lrn * grad(b), 4L * n * lrd))
    }
    val expected = docs.select(col("doc_id")).as[Long].collect().map { id =>
      id -> x.filter(_._1 == id).map { case (_, b, c) => c * w(b.toInt) }.sum
    }.toMap
    val got = Curate.trainTextClassifier(docs, "doc_id", "text",
        col("lang") === "en", buckets = bk, iters = iters,
        lrNum = lrn, lrDen = lrd)
      .select(col("doc_id"), col("z_units"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(got(6L) === 0L) // token-less doc scores exactly 0
  }

  test("trained-weight memo: a second identical call skips the GD loop " +
    "and returns the identical frame") {
    val before = Curate.classifierMemoHits
    def run() = Curate.trainTextClassifier(docs, "doc_id", "text",
        col("lang") === "en", buckets = 16, iters = 5, lrDen = 4L)
      .select(col("doc_id"), col("z_units"), col("pred"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val a = run()
    val b = run()
    assert(a === b)
    assert(Curate.classifierMemoHits > before,
      "second call must hit the weight memo")
  }

  test("trainTextClassifier on an empty frame: no division by zero, " +
    "empty scored output") {
    val empty = docs.filter(col("doc_id") < 0)
    val out = Curate.trainTextClassifier(empty, "doc_id", "text",
      col("lang") === "en", buckets = 8, iters = 3)
    assert(out.count() === 0L)
  }
}
