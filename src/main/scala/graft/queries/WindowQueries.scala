package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** SURVEY.md §2.5 — window functions.
  *
  * Determinism rules (SURVEY.md A.3/A.5): every window ORDER BY carries a
  * unique tiebreak column; frames are spelled explicitly (ROWS, never the
  * default RANGE — RANGE over ties differs); rank-family outputs cast to
  * long (DuckDB returns BIGINT).
  */
object WindowQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_win_rownumber_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    "q_win_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .select(
          col("p_brand"), col("p_partkey"), col("p_retailprice"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("p_brand", "p_partkey")
    }),

    "q_win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .select(
          col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_val"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    }),

    "q_win_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          d4(sum(D(col("o_totalprice"))).over(w)).as("run_sum"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_moving_avg" -> ((s, dir) => {
      // two-level: daily decimal totals, then a 7-row moving average as
      // window-decimal-sum / window-count (windowed DOUBLE sums may use
      // segment trees with engine-specific addition order — decimals
      // make the frame sum exact, division is then identical IEEE).
      val daily = events(s, dir)
        .groupBy(date_trunc("day", col("ts_us")).cast("date").as("day"))
        .agg(sum(D(col("value"))).as("daily_total"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily.select(
          col("day"),
          d4(col("daily_total")).as("daily_total"),
          (sum(col("daily_total")).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("ma7"))
        .orderBy("day")
    }),

    "q_win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, dir)
        .select(
          col("event_id"), col("user_id"), col("event_type"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .orderBy("event_id")
    }),

    "q_win_ntile" -> ((s, dir) => {
      // quantile bucketing: acctbal quartiles WITHIN each market
      // segment (partitioned ntile — a global ntile would serialize
      // the table through one task), then per-bucket stats.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"))
        .groupBy("c_mktsegment", "quartile")
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("lo"),
          max(col("c_acctbal")).as("hi"))
        .orderBy("c_mktsegment", "quartile")
    }),

    // Rolling distinct count over a row frame: unique event types in
    // each user's trailing 5 events. Spark has no DISTINCT window
    // aggregate — size(collect_set) over the frame is the equivalent
    // (set semantics make per-frame order irrelevant); DuckDB runs the
    // standard count(DISTINCT) OVER form.
    "q_win_rolling_distinct" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsu"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts_us")).as("tsu"), col("event_type"))
        .withColumn("u5",
          size(collect_set(col("event_type")).over(w)).cast(LongType))
        .select("user_id", "event_id", "tsu", "u5")
        .orderBy("user_id", "tsu", "event_id")
    }),

    // Rolling DISCRETE median over each user's trailing 7 events: the
    // lower median is an exact element pick from the sorted frame list
    // — no interpolation, no float math, so no cross-engine rounding
    // hazard (Spark's percentile-over-frame and DuckDB's quantile_cont
    // interpolate with different expression shapes). collect_list over
    // a ROWS frame is O(frame) state per row, same tier as the
    // rolling-distinct collect_set.
    "q_win_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsu"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts_us")).as("tsu"), col("value"))
        .withColumn("lst", sort_array(collect_list(col("value")).over(w)))
        .select(col("user_id"), col("event_id"), col("tsu"), col("value"),
          element_at(col("lst"), ((size(col("lst")) + 1) / 2).cast("int"))
            .as("med7"))
        .orderBy("user_id", "tsu", "event_id")
    }),

    // Gaps-and-islands: longest run of CONSECUTIVE active days per
    // user. The classic constant-anchor trick — day minus row_number
    // is constant exactly within a consecutive run — turns streak
    // detection into a groupBy, so the whole query is one user window
    // plus two hash aggregates: no self-join, no iteration, partitioned
    // by user at any scale.
    "q_win_streak" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      events(s, dir)
        .select(col("user_id"),
          date_trunc("day", col("ts_us")).cast("date").as("day"))
        .distinct()
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).as("longest_streak"),
          sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_streak" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INTEGER) AS anchor
        |  FROM ud),
        |st AS (SELECT user_id, anchor, COUNT(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, MAX(len) AS longest_streak,
        | CAST(SUM(len) AS BIGINT) AS n_active_days, COUNT(*) AS n_streaks
        |FROM st GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q_win_rownumber_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_win_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
        |ORDER BY p_brand, p_partkey""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT event_id, user_id, value,
        | lag(value, 1) OVER w AS prev_val,
        | value - lag(value, 1) OVER w AS delta,
        | lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS run_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_moving_avg" ->
      """SELECT day, CAST(CAST(CAST(daily_total AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS daily_total,
        | CAST(SUM(daily_total) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7
        |FROM (
        | SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  SUM(CAST(value AS DECIMAL(18,4))) AS daily_total
        | FROM events GROUP BY 1)
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "q_win_first_last" ->
      """SELECT event_id, user_id, event_type,
        | first_value(event_type) OVER w AS first_type,
        | last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_mktsegment, quartile, COUNT(*) AS n,
        | MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
        |FROM (
        |  SELECT c_mktsegment, c_acctbal,
        |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |  FROM customer)
        |GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin,

    "q_win_rolling_median" ->
      """SELECT user_id, event_id, tsu, value,
        | l[(len(l) + 1) // 2] AS med7
        |FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value,
        |    list_sort(list(value) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
        |  FROM events)
        |ORDER BY user_id, tsu, event_id""".stripMargin,

    "q_win_rolling_distinct" ->
      """SELECT user_id, event_id, epoch_us(ts) AS tsu,
        |  CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS u5
        |FROM events
        |ORDER BY user_id, tsu, event_id""".stripMargin
  )
}
