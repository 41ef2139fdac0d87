package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._
import graft.streaming.StreamTransforms

/** Round-6 fourteenth-pass batch: windowed top-k heavy hitters (the
  * streaming leaderboard, riding the proven tumbling aggregate),
  * strict-adjacency sequence matching (the MATCH_RECOGNIZE /
  * CEP-lite shape — unlike q_funnel_conversion, no gaps allowed),
  * cumulative gains & lift by score decile (the campaign-targeting
  * readout), and a day-of-week × hour calendar activity profile.
  *
  * Determinism posture (SURVEY.md Appendix A): exact counts/decimals;
  * day-of-week from pure epoch-day arithmetic ((d+4)%7 — Spark's
  * dayofweek() and DuckDB's dayofweek() disagree on numbering, so
  * neither is used); lift/gain are shared IEEE divisions.
  */
object PatternQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Top-2 event types per tumbling day window — the continuously
    // maintained leaderboard. Rides StreamTransforms.tumbling (whose
    // stream==batch equality StreamingSpec already proves); the rank is
    // a day-partitioned WindowGroupLimit over the |days|×|types| frame,
    // exactly what the sink-side ranking of a streaming windowed
    // aggregate does.
    "q_stream_topk" -> ((s, dir) => {
      StreamTransforms.tumbling(events(s, dir))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("day")
            .orderBy(col("cnt").desc, col("event_type"))))
        .filter(col("rnk") <= 2)
        .select(col("day"), col("event_type"), col("cnt"),
          col("rnk").cast(LongType).as("rnk"))
        .orderBy("day", "rnk")
    }),

    // Strict-adjacency pattern match view→click→purchase per user (the
    // CEP primitive; q_funnel_conversion allows gaps — this does not).
    // Two leads over the user-partitioned arrival order, conditional
    // count; only matching users are emitted.
    "q_seq_pattern_match" -> ((s, dir) => {
      val byU = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts_us")), col("event_id"))
      events(s, dir)
        .withColumn("e2", lead(col("event_type"), 1).over(byU))
        .withColumn("e3", lead(col("event_type"), 2).over(byU))
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "view" &&
          col("e2") === "click" && col("e3") === "purchase", 1L)
          .otherwise(0L)).as("n_matches"))
        .filter(col("n_matches") >= 1)
        .orderBy("user_id")
    }),

    // Cumulative gains / lift by score decile — "target the top-k
    // deciles, capture what share of conversions?". Decile assignment
    // is the PSI bucket recipe (nine exact > compares against the
    // broadcast percentile_disc cuts, decile 10 = highest scores);
    // cumulation runs top-down over the 10-row decile frame; gain,
    // population share and lift are shared IEEE divisions over exact
    // counts.
    "q_ml_lift_curve" -> ((s, dir) => {
      val ev = events(s, dir).select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val pd = (1 to 9).map(i => expr(
        s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY value)").as(s"c$i"))
      val cuts9 = ev.agg(pd.head, pd.tail: _*)
      def gt(c: String) = when(col("value") > col(c), 1).otherwise(0)
      val bucketed = ev.crossJoin(broadcast(cuts9))
        .select(col("pos"),
          (lit(1) + gt("c1") + gt("c2") + gt("c3") + gt("c4") + gt("c5") +
            gt("c6") + gt("c7") + gt("c8") + gt("c9"))
            .cast(LongType).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val topDown = Window.orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      bucketed
        .withColumn("tot", sum(col("n")).over(all))
        .withColumn("tot_pos", sum(col("n_pos")).over(all))
        .withColumn("cum_n", sum(col("n")).over(topDown))
        .withColumn("cum_pos", sum(col("n_pos")).over(topDown))
        .select(col("decile"), col("n"), col("n_pos"),
          (col("cum_pos").cast(DoubleType) / col("tot_pos").cast(DoubleType))
            .as("gain"),
          (col("cum_n").cast(DoubleType) / col("tot").cast(DoubleType))
            .as("pop_share"))
        .withColumn("lift", col("gain") / col("pop_share"))
        .orderBy(col("decile").desc)
    }),

    // Calendar activity profile: day-of-week × hour-of-day volume and
    // revenue — the staffing/capacity heatmap. DOW is pure epoch-day
    // arithmetic ((days+4) % 7, 0 = Sunday: 1970-01-01 was a Thursday);
    // the 168-cell output frame is domain-bounded at any scale.
    "q_ts_calendar_profile" -> ((s, dir) => {
      events(s, dir)
        .select(
          expr("((unix_micros(ts_us) div 86400000000) + 4) % 7").as("dow"),
          expr("(unix_micros(ts_us) div 3600000000) % 24").as("hod"),
          col("value"))
        .groupBy("dow", "hod")
        .agg(count(lit(1)).as("n"), d4(sum(D(col("value")))).as("sum_val"))
        .orderBy("dow", "hod")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stream_topk" ->
      """WITH t AS (SELECT CAST(date_trunc('day', ts) AS DATE) d,
        |    event_type, COUNT(*) cnt FROM events GROUP BY 1, 2),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY d
        |    ORDER BY cnt DESC, event_type) rnk FROM t)
        |SELECT d AS day, event_type, cnt, CAST(rnk AS BIGINT) rnk FROM rk
        |WHERE rnk <= 2 ORDER BY d, rnk""".stripMargin,

    "q_seq_pattern_match" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) e3
        |  FROM events)
        |SELECT user_id, CAST(SUM(CASE WHEN event_type = 'view'
        |    AND e2 = 'click' AND e3 = 'purchase' THEN 1 ELSE 0 END)
        |  AS BIGINT) n_matches
        |FROM o GROUP BY user_id
        |HAVING SUM(CASE WHEN event_type = 'view' AND e2 = 'click'
        |  AND e3 = 'purchase' THEN 1 ELSE 0 END) >= 1
        |ORDER BY user_id""".stripMargin,

    "q_ml_lift_curve" ->
      """WITH ev AS (SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END pos
        |  FROM events),
        |cuts AS (SELECT
        |    quantile_disc(value, 0.1) c1, quantile_disc(value, 0.2) c2,
        |    quantile_disc(value, 0.3) c3, quantile_disc(value, 0.4) c4,
        |    quantile_disc(value, 0.5) c5, quantile_disc(value, 0.6) c6,
        |    quantile_disc(value, 0.7) c7, quantile_disc(value, 0.8) c8,
        |    quantile_disc(value, 0.9) c9 FROM ev),
        |b AS (SELECT pos,
        |    CAST(1 + (CASE WHEN value > c1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c4 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c5 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c6 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c7 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c8 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c9 THEN 1 ELSE 0 END) AS BIGINT)
        |      decile
        |  FROM ev, cuts),
        |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) n,
        |    CAST(SUM(pos) AS BIGINT) n_pos FROM b GROUP BY decile),
        |c AS (SELECT decile, n, n_pos,
        |    CAST(SUM(n) OVER () AS BIGINT) tot,
        |    CAST(SUM(n_pos) OVER () AS BIGINT) tot_pos,
        |    CAST(SUM(n) OVER (ORDER BY decile DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) cum_n,
        |    CAST(SUM(n_pos) OVER (ORDER BY decile DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) cum_pos
        |  FROM g)
        |SELECT decile, n, n_pos,
        |  CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) gain,
        |  CAST(cum_n AS DOUBLE) / CAST(tot AS DOUBLE) pop_share,
        |  (CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE))
        |    / (CAST(cum_n AS DOUBLE) / CAST(tot AS DOUBLE)) lift
        |FROM c ORDER BY decile DESC""".stripMargin,

    "q_ts_calendar_profile" ->
      """SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 dow,
        |  (epoch_us(ts) // 3600000000) % 24 hod,
        |  CAST(COUNT(*) AS BIGINT) n,
        |  CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) sum_val
        |FROM events GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin
  )
}
