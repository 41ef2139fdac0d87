package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.engine.Tables

/** Testdata schema canary (VERDICT r5 item 5).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed a physical type once (events.ts: TIMESTAMP(NANOS) → timestamp[us]
  * before round 5), silently breaking 32 queries. This suite pins the
  * as-loaded Spark schema of every table so the NEXT regeneration fails as
  * one readable diff instead of 50 downstream analysis errors.
  *
  * If this test fails after a data regen: update the expectation below AND
  * audit graft.engine.Tables + SURVEY.md Appendix A.1 for recipe changes.
  */
class SchemaCanarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def fields(name: String): Seq[(String, DataType)] =
    Tables.t(spark, TestSpark.Sf, name).schema.fields
      .map(f => (f.name, f.dataType)).toSeq

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  expected.foreach { case (table, want) =>
    test(s"testdata schema unchanged: $table") {
      val got = fields(table)
      assert(got == want,
        s"\nTESTDATA REGENERATED? $table.parquet now loads as\n  " +
          got.mkString("\n  ") + "\nbut the engine assumes\n  " +
          want.mkString("\n  ") +
          "\nUpdate graft.engine.Tables / SURVEY.md A.1 alongside this pin.")
    }
  }

  test("events loader derives ts_us as session-TZ TimestampType") {
    val ev = Tables.events(spark, TestSpark.Sf)
    assert(ev.schema("ts_us").dataType == TimestampType)
    assert(ev.count() > 0)
  }

  test("events loader handles legacy ns-long ts (synthesized)") {
    // Synthesize the pre-r5 encoding: epoch-nanos stored as plain Long.
    // The loader keys off the dtype, so writing a Long column named ts
    // exercises the same branch the nanosAsLong read produced.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ns_events").toString
    val nanos = 1700000000123456789L
    Seq((1L, nanos, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts_us").dataType == TimestampType)
    val got = ev.select(org.apache.spark.sql.functions.unix_micros(
      org.apache.spark.sql.functions.col("ts_us"))).head.getLong(0)
    assert(got == nanos / 1000L, "ns→µs truncation must match DuckDB")
  }
}
