package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** §2.4 aggregations. Flagship first; the rest land in batch 2.
  *
  * Cross-engine decimal discipline (SURVEY.md A.2, hardened by local
  * experiments this round):
  *  - money columns are exactly 2dp → decimal(18,4) accumulation is EXACT;
  *  - products keep their exact scale (2dp×2dp=4dp, ×2dp again=6dp) and
  *    any decimal cast lands on or above that scale — DuckDB TRUNCATES
  *    decimal downcasts while Spark rounds HALF_UP, so a cast that
  *    actually rounds is forbidden;
  *  - inexact math (division/avg, sqrt, ln) runs in DOUBLE over the
  *    exactly-accumulated decimals with the same expression shape on both
  *    engines → bit-identical IEEE results, no rounding step at all.
  */
object AggQueries extends QSet {

  /** FLAGSHIP — TPC-H Q1 shape over the full lineitem table.
    * Map-side partial agg + final agg over 2×3 groups; at 100 TB this is
    * the ideal Spark shape (partial combine collapses the shuffle to
    * #groups × #partitions rows).
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val one = lit(1).cast(Dec)
    // exact: 2dp * (1 - 2dp) = 4dp; cast back to scale 4 loses nothing
    val discPrice = (D(col("l_extendedprice")) * (one - D(col("l_discount")))).cast(Dec)
    // exact: 4dp * (1 + 2dp) = 6dp
    val charge = (discPrice * (one + D(col("l_tax")))).cast(DecimalType(18, 6))
    val cnt = count(lit(1))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d4(sum(D(col("l_quantity")))).as("sum_qty"),
        d4(sum(D(col("l_extendedprice")))).as("sum_base_price"),
        d4(sum(discPrice)).as("sum_disc_price"),
        sum(charge).cast(DecimalType(24, 6))
          .cast(StringType).cast(DoubleType).as("sum_charge"),
        (sum(D(col("l_quantity"))).cast(DoubleType) / cnt).as("avg_qty"),
        (sum(D(col("l_extendedprice"))).cast(DoubleType) / cnt).as("avg_price"),
        (sum(D(col("l_discount"))).cast(DoubleType) / cnt).as("avg_disc"),
        cnt.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, QFn] = Map(
    "q_agg_pricing_summary" -> (pricingSummary _),

    "q_agg_salted_twophase" -> ((s, dir) => {
      // Skew-resilient aggregation: a hot grouping key (events.user_id
      // has low cardinality — every user is a hot key at 100 TB) first
      // aggregates under (user_id, salt) so the hot key's rows spread
      // over 16 reducers, then a second tiny aggregate merges the salt
      // partials. Decimal sums make the two-phase merge order-exact, so
      // the oracle is a plain one-phase GROUP BY — identical results.
      // The salt is a deterministic hash of a unique column (A.6: no
      // rand()), so re-runs reproduce bit-for-bit.
      events(s, dir)
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy("user_id", "salt")
        .agg(count(lit(1)).as("pc"), sum(D(col("value"))).as("pv"))
        .groupBy("user_id")
        .agg(sum(col("pc")).as("n_events"), d4(sum(col("pv"))).as("sum_value"))
        .orderBy("user_id")
    }),

    "q_agg_global" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        d4(sum(D(col("l_quantity")))).as("sum_qty"),
        d4(sum(D(col("l_extendedprice")))).as("sum_price"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    }),

    "q_agg_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Conditional aggregation via count_if / FILTER — one pass computes
    // each aggregate over its own predicate slice (the SQL-standard
    // FILTER clause both engines parse), instead of N filtered scans.
    "q_agg_filtered" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          expr("count_if(value > 100.0)").as("n_big"),
          d4(expr(
            "sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE value > 100.0)"))
            .as("sum_big"),
          expr("max(value) FILTER (WHERE value <= 100.0)").as("max_small"))
        .orderBy("event_type")
    }),

    // Non-oracle (HLL impls differ across engines): scalatest asserts
    // within 5% of exact instead. Declared for the rows-only check.
    "q_agg_approx_distinct" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")
    }),

    // Non-oracle (KLL/GK quantile summaries are impl-defined):
    // scalatest asserts proximity to the exact percentile instead.
    "q_agg_approx_percentile" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("ap50"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(1000))
            .as("ap90"))
        .orderBy("o_orderstatus")
    }),

    // Non-oracle (DataSketches HLL binary images are impl-defined):
    // two-phase sketch cube — per-(type, day) partial sketches union-
    // merged per type. THE 100 TB pre-aggregation pattern: partials are
    // tiny, mergeable, and reusable across rollup grains; scalatest
    // asserts the estimate lands within HLL error of the exact count.
    "q_agg_sketch_union" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts_us")).cast("date").as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_users"))
        .orderBy("event_type")
    }),

    "q_agg_stats" -> ((s, dir) => {
      // Built-in stddev/var are order-dependent double folds — instead
      // derive from EXACT decimal sums with the same IEEE expression
      // shape as the oracle: bit-identical, no rounding step needed.
      // DECIMAL(19,4) for the square: precision ≥19 forces DuckDB onto
      // its int128 multiply path (int64 overflows on these magnitudes).
      // The decimal sums convert to double THROUGH THEIR EXACT STRING:
      // at sf0.1 the sum of squares carries ~20 significant digits and
      // DuckDB's direct decimal→double is not correctly rounded there
      // (measured 0.64 vs 0.16 absolute error); string→double parsing
      // is correctly rounded on both engines, so both sides parse the
      // identical digit string into the identical double.
      val xd = col("o_totalprice").cast(DecimalType(19, 4))
      val sq = (xd * xd).cast(DecimalType(28, 4)) // 2dp² = 4dp: exact
      val n = count(lit(1))
      val sx = sum(D(col("o_totalprice"))).cast(StringType).cast(DoubleType)
      val sxx = sum(sq).cast(StringType).cast(DoubleType)
      val vr = (sxx - sx * sx / n) / (n - lit(1L))
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          n.as("n_orders"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          vr.as("var_samp"),
          sqrt(vr).as("stddev_samp"))
        .orderBy("o_orderstatus")
    }),

    "q_agg_percentile" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
          expr("round(percentile(o_totalprice, 0.9), 4)").as("p90"))
        .orderBy("o_orderstatus")
    }),

    // Discrete percentile: an ACTUAL element of the group (the inverse
    // empirical CDF — smallest value whose cume_dist ≥ p), not an
    // interpolated midpoint; the estimator quantile reporting wants
    // when the value must be a real observation. Spark's
    // percentile_disc and DuckDB's quantile_disc both implement the
    // inverse-CDF convention (verified on odd/even/1/2-element
    // boundary cases), and the result is an exact input double — no
    // rounding needed.
    "q_agg_percentile_disc" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p50_disc"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p90_disc"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    "q_agg_rollup" -> ((s, dir) => {
      // Via the SQL front-end: sorting over a DF-API rollup of a join
      // trips the analyzer's ambiguous-attribute check (the grouping-set
      // aggregate re-aliases its keys); the SQL path resolves cleanly
      // and plans identically.
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      s.sql(
        """SELECT n_name, o_orderpriority, COUNT(*) AS n_orders,
          | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS STRING) AS DOUBLE) AS sum_price
          |FROM g_orders
          |JOIN g_customer ON o_custkey = c_custkey
          |JOIN g_nation ON c_nationkey = n_nationkey
          |GROUP BY ROLLUP (n_name, o_orderpriority)
          |ORDER BY n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          d4(sum(D(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_agg_grouping_sets" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupingSets(
          Seq(Seq(col("lang")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(
          grouping(col("lang")).cast("long").as("g_lang"),
          grouping(col("source")).cast("long").as("g_source"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("g_lang"), col("g_source"),
          col("lang").asc_nulls_first, col("source").asc_nulls_first)
    }),

    "q_agg_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          d4(sum(D(col("o_totalprice")))).as("sum_price"))
        .filter(col("n_orders") > 100)
        .orderBy("o_orderpriority")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_salted_twophase" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_global" ->
      """SELECT COUNT(*) AS n_rows,
        | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_price,
        | COUNT(DISTINCT l_suppkey) AS n_supp,
        | MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,

    "q_agg_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_agg_filtered" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(COUNT(*) FILTER (WHERE value > 100.0) AS BIGINT) AS n_big,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |   FILTER (WHERE value > 100.0) AS VARCHAR) AS DOUBLE) AS sum_big,
        | MAX(value) FILTER (WHERE value <= 100.0) AS max_small
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_stats" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        | (CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(19,4)) * CAST(o_totalprice AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
        |  - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*))
        |  / (COUNT(*) - 1) AS var_samp,
        | sqrt((CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(19,4)) * CAST(o_totalprice AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
        |  - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*))
        |  / (COUNT(*) - 1)) AS stddev_samp
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_percentile" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_percentile_disc" ->
      """SELECT o_orderstatus,
        | quantile_disc(o_totalprice, 0.5) AS p50_disc,
        | quantile_disc(o_totalprice, 0.9) AS p90_disc,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_rollup" ->
      """SELECT n_name, o_orderpriority, COUNT(*) AS n_orders,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT lang, source,
        | CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        | CAST(GROUPING(source) AS BIGINT) AS g_source,
        | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    "q_agg_having" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority
        |HAVING COUNT(*) > 100
        |ORDER BY o_orderpriority""".stripMargin,

    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
