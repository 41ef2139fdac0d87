package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Ingestion-audit + aggregate-variant operators: referential-integrity
  * and constraint checking (the validation pass every pipeline runs
  * after a load), weighted aggregation, multi-distinct aggregation,
  * null-safe joins, and outer explode.
  *
  * Scale notes: the integrity checks are anti joins on the key columns
  * only — at 100 TB each is one shuffle of (key) pairs (or zero
  * exchanges when the tables are bucketed by their join key, see
  * PlanSpec's bucketed-join test); the per-check counts collapse
  * map-side. Null-safe equality (`<=>`) hashes NULL like any other key
  * value, so it shuffles instead of degenerating into a cross join.
  */
object AuditQueries extends QSet {

  private val D19 = DecimalType(19, 4)
  private val D28 = DecimalType(28, 4)

  /** Exact decimal sum emitted as the identical double on both engines. */
  private def sd(c: org.apache.spark.sql.Column) =
    sum(c).cast(StringType).cast(DoubleType)

  val queries: Map[String, QFn] = Map(
    // Post-load audit: orphan fact rows (FK without its dimension row),
    // plus domain constraints — one summary row of violation counts.
    "q_quality_constraints" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val orphanLi = li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_lineitem"))
      val orphanOrd = ord.select(col("o_custkey"))
        .join(t(s, dir, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_orders"))
      val domain = li.agg(
        count(lit(1)).as("n_lineitem"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("n_bad_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("n_bad_discount"))
      domain.crossJoin(orphanLi).crossJoin(orphanOrd)
        .select("n_lineitem", "n_orphan_lineitem", "n_orphan_orders",
          "n_bad_qty", "n_bad_discount")
        .orderBy("n_lineitem") // single row; satisfies the sort lint
    }),

    // Weighted average: exact decimal numerator (price × qty, widths
    // chosen so no product exceeds precision 38 — the q_agg_corr
    // recipe) over an exact decimal weight sum; one double division at
    // the end, identical IEEE on both engines.
    "q_agg_weighted" -> ((s, dir) => {
      val x = col("l_extendedprice").cast(D19)
      val w = col("l_quantity").cast(D19)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          (sd((x * w).cast(D28)) / sd(D(col("l_quantity"))))
            .as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // Several exact DISTINCT aggregates in one pass — Catalyst plans
    // this with Expand (one aggregation tree per distinct set), the
    // multi-distinct shape dashboards generate constantly.
    "q_agg_distinct_multi" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other instead of vanishing — the semantics dimension
    // lookups with optional keys need. Keys are derived (nullif) since
    // the testdata has no NULL keys of its own.
    "q_join_nulleq" -> ((s, dir) => {
      val a = t(s, dir, "customer")
        .select(expr("nullif(c_nationkey % 5, 0)").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_cust"))
      val b = t(s, dir, "supplier")
        .select(expr("nullif(s_nationkey % 5, 0)").cast("long").as("k2"))
        .groupBy("k2").agg(count(lit(1)).as("n_supp"))
      a.join(b, col("k") <=> col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("k"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(asc_nulls_first("k"))
    }),

    // explode_outer: rows whose array is empty survive with a NULL
    // element (plain explode drops them) — the unnest shape that must
    // not silently lose parent rows.
    "q_explode_outer" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode_outer(expr("filter(split(text, ' '), x -> x = 'dup')"))
            .as("tok"))
        .orderBy(asc("doc_id"), asc_nulls_first("tok"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_quality_constraints" ->
      """SELECT
        | (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
        | (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |   AS n_orphan_lineitem,
        | (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |   AS n_orphan_orders,
        | (SELECT CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM lineitem) AS n_bad_qty,
        | (SELECT CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM lineitem) AS n_bad_discount""".stripMargin,

    "q_agg_weighted" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
        |  / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |  AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_distinct_multi" ->
      """SELECT o_orderstatus,
        | COUNT(DISTINCT o_custkey) AS n_cust,
        | COUNT(DISTINCT o_orderpriority) AS n_prio,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_nulleq" ->
      """WITH a AS (
        |  SELECT CAST(nullif(c_nationkey % 5, 0) AS BIGINT) AS k,
        |    COUNT(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |b AS (
        |  SELECT CAST(nullif(s_nationkey % 5, 0) AS BIGINT) AS k2,
        |    COUNT(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT COALESCE(a.k, b.k2) AS k,
        |  COALESCE(a.n_cust, 0) AS n_cust,
        |  COALESCE(b.n_supp, 0) AS n_supp
        |FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k2
        |ORDER BY k NULLS FIRST""".stripMargin,

    "q_explode_outer" ->
      """SELECT doc_id,
        | unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS tok
        |FROM (SELECT doc_id,
        |        list_filter(string_split(text, ' '), x -> x = 'dup') AS l
        |      FROM documents)
        |ORDER BY doc_id, tok NULLS FIRST""".stripMargin
  )
}
