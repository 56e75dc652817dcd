package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared building blocks for the per-family query registries. */
private[graft] object QueryShared {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Planted near-duplicate twins for the embedding-LSH fixtures. The
    * synthetic corpus's random vectors top out at cosine ≈ 0.51, so at
    * the REAL near-dup thresholds (≥ 0.9) the banded queries would
    * return zero rows and verify nothing (RegistrySweepSpec's vacuity
    * gate). Two deterministic, engine-replayable twin families:
    *  - ×2-SCALED copies of ids ≡ 1 (mod 9) at id+100000 — doubling is
    *    exact in float32 and the LCG-hyperplane signature is
    *    scale-invariant, so these pairs have cosine exactly 1 and
    *    banding recall 1 BY CONSTRUCTION at any geometry;
    *  - dim-0-NEGATED copies of ids ≡ 4 (mod 9) at id+200000 — sign
    *    flip is exact in float32, cosine ≈ 1 − 2·x₀²/|v|² (≈ 0.97 on
    *    this corpus), so these exercise the real LSH S-curve: a
    *    deterministic subset shares a band and survives; both engines
    *    replay the same subset.
    */
  def plantTwins(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scaled = emb.filter(pmod(col(idCol), lit(9)) === 1)
      .select((col(idCol) + 100000L).as(idCol),
        transform(col(vecCol), x => x + x).as(vecCol))
    val negated = emb.filter(pmod(col(idCol), lit(9)) === 4)
      .select((col(idCol) + 200000L).as(idCol),
        transform(col(vecCol), (x, i) => when(i === 0, -x).otherwise(x))
          .as(vecCol))
    scaled.unionByName(negated)
  }

  /** Flagship: TPC-H Q1 shape (SURVEY §7 step 2). */
  def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // sum_qty: integral doubles sum exactly; money sums reach ~3e9
        // at sf0.1 where order drift is ~1e-5 — round(2), not round(4)
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
