package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL front-end parity: the engine's surface is the DataFrame API
  * (SURVEY §7.5 — the graded harness is DF-driven), but a user must be
  * able to drive the SAME session through `spark.sql` over registered
  * views and get row-identical results. This spec registers the fixture
  * tables as temp views and proves three representative shapes
  * (pushdown scan-agg, join+group+sort, window rank) agree exactly with
  * their DataFrame formulations.
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def registerViews(): Unit =
    for (t <- Seq("lineitem", "orders", "customer", "nation", "region",
        "part", "supplier", "embeddings", "documents"))
      graft.engine.Tables.t(spark, sf, t).createOrReplaceTempView(t)

  private def assertSame(sql: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    registerViews()
    val viaSql = spark.sql(sql).collect().toSeq
    val viaDf = df.collect().toSeq
    assert(viaSql == viaDf,
      s"spark.sql and DataFrame results diverge (${viaSql.length} vs " +
        s"${viaDf.length} rows)")
    assert(viaSql.nonEmpty)
  }

  test("scan-agg with pushdown: TPC-H Q6 shape agrees") {
    assertSame(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |  CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |""".stripMargin,
      graft.engine.Tables.t(spark, sf, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(graft.engine.Tables.D(col("l_extendedprice")) *
          graft.engine.Tables.D(col("l_discount")))
          .cast(graft.engine.Tables.Dec).as("revenue")))
  }

  test("join + group + sort agrees") {
    assertSame(
      """SELECT n.n_name, COUNT(*) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
      graft.engine.Tables.t(spark, sf, "customer")
        .join(graft.engine.Tables.t(spark, sf, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_name"))
  }

  // --- registered-function surface (GraftExtensions): the engine's
  // public SQL API beyond the builtins. Each test drives the SAME
  // session through spark.sql and the DataFrame/Column API and demands
  // row-identical results.

  test("array_dot_f registered function agrees with Native.dotF") {
    assertSame(
      """SELECT vec_id,
        |  array_dot_f(embedding, embedding) AS sq_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
      graft.engine.Tables.t(spark, sf, "embeddings")
        .select(col("vec_id"),
          graft.functions.Native.dotF(col("embedding"), col("embedding"))
            .as("sq_norm"))
        .orderBy("vec_id"))
  }

  test("nfc_normalize registered function agrees with Native.nfc") {
    assertSame(
      """SELECT doc_id, nfc_normalize(text) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,
      graft.engine.Tables.t(spark, sf, "documents")
        .select(col("doc_id"),
          graft.functions.Native.nfc(col("text")).as("norm"))
        .orderBy("doc_id"))
  }

  test("graft_bloom_agg + graft_might_contain prefilter equals the exact semi join") {
    // the bloom sketch admits false positives; the exact verify removes
    // them, so the SQL bloom-prefilter pipeline must equal the plain
    // DataFrame semi join + aggregate exactly
    assertSame(
      """WITH pre AS (
        |  SELECT l_orderkey, l_returnflag
        |  FROM lineitem
        |  WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(o_orderkey), 100000L, 1048576L)
        |     FROM orders WHERE o_orderpriority = '1-URGENT'),
        |    xxhash64(l_orderkey)))
        |SELECT l_returnflag, COUNT(*) AS n_lines
        |FROM pre
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderpriority = '1-URGENT'
        |                AND o.o_orderkey = pre.l_orderkey)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin, {
        val urgent = graft.engine.Tables.t(spark, sf, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        graft.engine.Tables.t(spark, sf, "lineitem")
          .join(urgent, col("l_orderkey") === col("o_orderkey"),
            "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_lines"))
          .orderBy("l_returnflag")
      })
  }

  test("HOF dot-product idiom rewrites to array_dot_f and agrees") {
    registerViews()
    val hofSql =
      """SELECT vec_id,
        |  aggregate(zip_with(embedding, embedding,
        |      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |    CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS sq_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin
    val viaHof = spark.sql(hofSql)
    // RewriteHofDotProduct must lower the portable idiom to the native
    // codegen'd expression — visible in the optimized plan…
    assert(viaHof.queryExecution.optimizedPlan.toString
      .contains("array_dot_f"),
      "HOF dot-product idiom was not rewritten to ArrayDotProductF")
    // …and the values must equal the native expression's bit-for-bit
    // (same double-precision array-order fold)
    val viaNative = graft.engine.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        graft.functions.Native.dotF(col("embedding"), col("embedding"))
          .as("sq_norm"))
      .orderBy("vec_id")
    assert(viaHof.collect().toSeq == viaNative.collect().toSeq)
  }

  test("window rank agrees") {
    assertSame(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 2
        |ORDER BY o_custkey, rk""".stripMargin, {
        import org.apache.spark.sql.expressions.Window
        graft.engine.Tables.t(spark, sf, "orders")
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .withColumn("rk", row_number().over(
            Window.partitionBy("o_custkey")
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .filter(col("rk") <= 2)
          .orderBy("o_custkey", "rk")
      })
  }
}
