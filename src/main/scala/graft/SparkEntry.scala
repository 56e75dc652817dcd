package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract facade (SURVEY §7): `entry` smoke query, `queries`
  * (one entry per implemented SURVEY §2 operator), `oracleSql` (the
  * DuckDB twin of every query). The registries themselves live in
  * `graft.registry` — `src/main/scala/graft/registry/Queries*.scala`
  * paired file-by-file with `Oracles*.scala`, split by operator family
  * so each stays reviewable.
  */
object SparkEntry {

  /** Flagship: TPC-H Q1 shape (SURVEY §7 step 2) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    QueryShared.q1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.m ++ QueriesTpch.m ++ QueriesTime.m ++ QueriesDedup.m ++
      QueriesSim.m ++ QueriesText.m ++ QueriesCurate.m ++
      QueriesMultimodal.m

  def oracleSql: Map[String, String] =
    OraclesCore.m ++ OraclesTpch.m ++ OraclesTime.m ++ OraclesDedup.m ++
      OraclesSim.m ++ OraclesText.m ++ OraclesCurate.m ++
      OraclesMultimodal.m
}
