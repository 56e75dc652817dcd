package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * Riptable's IO is its SDS format (`riptable/rt_sds.py:719` save_sds /
  * `:1855` load_sds, zstd per-column blocks); we standardize on Parquet,
  * which gives the same columnar+zstd layout plus distributed scans,
  * predicate pushdown, and column pruning for free. `load_sds(stack=True)`
  * (multi-file concat into a PDataset, `rt_sds.py:1855`) maps to a
  * multi-path `spark.read.parquet(paths: _*)`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Multi-file stacked load — the PDataset analog (`rt_pdataset.py:18`):
    * each input file becomes a slice tagged by its source path.
    */
  def stacked(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.input_file_name
    spark.read.parquet(paths: _*).withColumn("p_src", input_file_name())
  }

  /** sds_info / sds_tree analog (`riptable/rt_sds.py:1015,1026`):
    * inspect a parquet dataset's schema + size from footers without a
    * full load.
    */
  def info(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val nRows = df.count() // footer-only: count(*) reads no column data
    df.schema.fields.map(f => (f.name, f.dataType.simpleString, f.nullable, nRows))
      .toSeq.toDF("column", "dtype", "nullable", "n_rows")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
