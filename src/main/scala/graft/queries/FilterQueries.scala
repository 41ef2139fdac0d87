package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** SURVEY.md §2.2 — projection / filter / predicates. All predicates are
  * `Column` expressions (never opaque UDFs) so they stay pushable into
  * the parquet scan (SURVEY.md §4.1).
  */
object FilterQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_filter_compound" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(
          col("o_orderstatus").isin("F", "P") &&
          col("o_totalprice").between(50000.0, 300000.0) &&
          !(col("o_orderpriority") === "5-LOW"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    "q_project_case" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_totalprice"),
          when(col("o_totalprice") < 10000.0, "low")
            .when(col("o_totalprice") < 100000.0, "mid")
            .otherwise("high").as("tier"))
        .orderBy("o_orderkey")
    }),

    "q_filter_like" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_type").like("S%") && !col("p_name").like("%bolt%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    }),

    "q_filter_rlike" -> ((s, dir) => {
      // partial-match semantics on both engines (Java find / RE2 search);
      // pattern stays in the RE2∩Java-safe subset (SURVEY.md A.4).
      t(s, dir, "part")
        .filter(col("p_name").rlike("^(small|red) [a-z]+"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    "q_project_conditional" -> ((s, dir) => {
      // testdata has no NULLs — nullif manufactures them first.
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
            .as("seg"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_acctbal"), lit(1000.0)).as("bal_cap"))
        .orderBy("c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_filter_compound" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND o_totalprice BETWEEN 50000.0 AND 300000.0
        |  AND NOT (o_orderpriority = '5-LOW')
        |ORDER BY o_orderkey""".stripMargin,

    "q_project_case" ->
      """SELECT o_orderkey, o_totalprice,
        | CASE WHEN o_totalprice < 10000.0 THEN 'low'
        |      WHEN o_totalprice < 100000.0 THEN 'mid'
        |      ELSE 'high' END AS tier
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE 'S%' AND p_name NOT LIKE '%bolt%'
        |ORDER BY p_partkey""".stripMargin,

    "q_filter_rlike" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '^(small|red) [a-z]+')
        |ORDER BY p_partkey""".stripMargin,

    "q_project_conditional" ->
      """SELECT c_custkey,
        | COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        | GREATEST(c_acctbal, 0.0) AS bal_floor,
        | LEAST(c_acctbal, 1000.0) AS bal_cap
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
