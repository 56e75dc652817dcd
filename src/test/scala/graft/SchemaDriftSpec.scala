package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift tripwire (round-7 VERDICT item #3).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed a column's physical type once (`events.ts`: int64 nanos →
  * parquet timestamp[us], which broke 23 queries in round 6). This spec
  * loads every table through the `Tables.table` boundary at sf0.001 and
  * asserts the ENGINE-CONTRACT dtypes — i.e. what downstream operators
  * are allowed to assume after normalization. If the driver ships a new
  * physical type, this fails naming the table, the column, the arrived
  * type, and where to extend the normalization — so drift costs one red
  * test, not a round.
  */
class SchemaDriftSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Acceptable POST-normalization dtypes per column. More than one entry
    * means the engine genuinely tolerates either (e.g. calendar-date
    * columns work as TIMESTAMP or TIMESTAMP_NTZ — every consumer goes
    * through year()/date_trunc()/unix_micros which accept both).
    */
  private val dateLike: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)

  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType, LongType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> dateLike, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> dateLike),
    "events" -> Map(
      "event_id" -> Set(LongType),
      // Engine contract: epoch-nanos int64, whatever the parquet physical
      // type (int64 passthrough; timestamp[us/ns] normalized by
      // Tables.normalizeEpochNanos). A failure here means a NEW physical
      // type arrived — extend Tables.epochNanosContract normalization.
      "ts" -> Set(LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType, containsNull = true),
                         ArrayType(FloatType, containsNull = false),
                         ArrayType(DoubleType, containsNull = true),
                         ArrayType(DoubleType, containsNull = false)),
      "label" -> Set(IntegerType, LongType)))

  test("every testdata table matches the engine dtype contract after Tables.table") {
    val drifted = Tables.names.flatMap { name =>
      val got = Tables.table(spark, sfDir, name).schema
      val want = contract(name)
      val missing = want.keySet -- got.fieldNames.toSet
      val bad = got.fields.toSeq.flatMap { f =>
        want.get(f.name) match {
          case Some(ok) if !ok(f.dataType) =>
            Some(s"$name.${f.name}: arrived as ${f.dataType.simpleString}, " +
              s"contract allows {${ok.map(_.simpleString).mkString(", ")}} — " +
              "if the driver regenerated testdata with a new physical type, " +
              "extend Tables.epochNanosContract / normalizeEpochNanos or " +
              "update this contract deliberately")
          case _ => None
        }
      }
      missing.map(m => s"$name.$m: column missing from testdata") ++ bad
    }
    assert(drifted.isEmpty, "\nSCHEMA DRIFT DETECTED:\n" + drifted.mkString("\n"))
  }

  test("forward drift: new tables/columns in testdata are flagged, not ignored") {
    // the reverse direction of the contract check: a REGENERATION that
    // ADDS a table or column is also a semantic signal (new workload
    // surface the driver expects covered) — surface it as a named
    // failure instead of silently scanning past it
    val dirs = new java.io.File(sfDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName.stripSuffix(".parquet"))
    val newTables = dirs.toSet -- Tables.names.toSet
    assert(newTables.isEmpty,
      s"NEW testdata table(s) arrived: ${newTables.mkString(", ")} — add a " +
        "loader in Tables.names, a contract entry here, and consider queries")
    val newCols = Tables.names.flatMap { name =>
      val got = Tables.table(spark, sfDir, name).schema.fieldNames.toSet
      (got -- contract(name).keySet).map(c => s"$name.$c")
    }
    assert(newCols.isEmpty,
      s"NEW column(s) arrived: ${newCols.mkString(", ")} — extend the " +
        "contract (and normalization if time-typed) deliberately")
  }

  test("embedding dim is 64 (the q198 PCA oracle hardcodes it)") {
    import org.apache.spark.sql.functions._
    // the q198_pca_project DuckDB oracle iterates range(1, 65): if the
    // driver regenerates embeddings at another dim, update that oracle
    // (and this pin) together — the Spark side adapts automatically
    val d = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0))
    assert(d.toSeq === Seq(64),
      s"embedding dims arrived as ${d.mkString(",")} — q198 oracle assumes 64")
  }

  test("events.ts normalization yields UTC epoch nanos matching unix_micros x1000") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val normalized = Tables.events(spark, sfDir)
    assert(normalized.schema("ts").dataType == LongType)
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        // spot-check: min/max round-trip through timestamp_micros
        val Array(lo, hi) = normalized.agg(min("ts"), max("ts")).collect()(0)
          .toSeq.map(_.asInstanceOf[Long]).toArray
        val Array(rlo, rhi) = raw
          .select(col("ts").cast(TimestampType).as("t"))
          .agg(unix_micros(min("t")), unix_micros(max("t"))).collect()(0)
          .toSeq.map(_.asInstanceOf[Long]).toArray
        assert(lo == rlo * 1000L && hi == rhi * 1000L,
          s"normalized [$lo,$hi] != raw-micros x1000 [${rlo * 1000L},${rhi * 1000L}]")
      case LongType => // passthrough generation — nothing to check
      case other => fail(s"unexpected raw events.ts type $other")
    }
  }
}
