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
        "part", "supplier"))
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
