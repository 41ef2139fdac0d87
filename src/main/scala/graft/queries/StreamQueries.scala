package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.streaming.{EvRow, StreamTransforms}

/** SURVEY.md §2.10 — batch twins of the streaming operators (t2 grades
  * batch; StreamingSpec asserts readStream twins produce equal results
  * through the same StreamTransforms functions).
  */
object StreamQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_stream_tumbling" -> ((s, dir) => {
      StreamTransforms.tumbling(events(s, dir))
        .orderBy("day", "event_type")
    }),

    "q_stream_sliding" -> ((s, dir) => {
      StreamTransforms.sliding(events(s, dir))
        .orderBy("w_start", "event_type")
    }),

    "q_stream_session" -> ((s, dir) => {
      StreamTransforms.sessionsBatch(events(s, dir))
        .orderBy("user_id", "session_id")
    }),

    "q_stream_dedup" -> ((s, dir) => {
      val ev = events(s, dir)
      StreamTransforms.dedupByKey(ev.unionAll(ev))
        .orderBy("event_id")
    }),

    "q_stream_join_dim" -> ((s, dir) => {
      StreamTransforms.joinDim(events(s, dir), t(s, dir, "customer"))
        .orderBy("tier")
    }),

    // The custom stateful operator (flatMapGroupsWithState) run in
    // batch mode — Spark executes the same state function as one group
    // pass, so the DuckDB gaps-and-islands oracle grades the exact
    // per-user counter logic the stream runs (StreamingSpec asserts the
    // micro-batched replay matches this batch result).
    "q_stream_stateful" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts_us")).as[EvRow]
      StreamTransforms.purchasesSinceError(ev).toDF()
        .orderBy("user_id", "event_id")
    }),

    // The stream⋈stream interval join in batch mode (withWatermark is a
    // no-op on batch frames): same-user event pairs within one hour.
    "q_stream_pair_join" -> ((s, dir) => {
      val ev = events(s, dir)
      StreamTransforms.pairsWithin1h(ev, ev)
        .orderBy("id1", "id2")
    }),

    // Watermark late-data audit as a deterministic batch query: per
    // source feed (event_type), replay the stream in ARRIVAL order
    // (event_id) and count rows whose event time lags the running max
    // by more than the 1-hour watermark — exactly the rows a streaming
    // aggregation with `withWatermark("ts_us", "1 hour")` would drop.
    // The running max rides the per-type window (parallel across
    // feeds); the report is |types| rows. The capacity-planning query
    // behind choosing a watermark width.
    "q_stream_late_audit" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts_us")).as("tsu"))
        .withColumn("hwm", max(col("tsu")).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("hwm").isNotNull &&
            col("tsu") < col("hwm") - 3600000000L, 1L).otherwise(0L))
            .as("n_late"))
        .orderBy("event_type")
    }),

    "q_cdc_apply" -> ((s, dir) => {
      // CDC apply (last-writer-wins + tombstones): orders act as the
      // changelog — each row upserts its customer's balance unless the
      // status marks a delete; final state keeps only keys whose latest
      // entry is live. Streaming twin: cdcApplyStream (foreachBatch
      // merge into parquet state), asserted equal in StreamingSpec.
      StreamTransforms.cdcApply(ordersChangelog(s, dir))
        .select(col("key"), col("value").as("val"),
          col("ver").cast("date").as("as_of"))
        .orderBy("key")
    })
  )

  /** orders as a CDC changelog: versioned by (o_orderdate, o_orderkey);
    * 'F' status rows are delete tombstones, everything else upserts. */
  def ordersChangelog(s: org.apache.spark.sql.SparkSession, dir: String):
      org.apache.spark.sql.DataFrame =
    t(s, dir, "orders").select(
      col("o_custkey").as("key"),
      col("o_totalprice").as("value"),
      col("o_orderdate").as("ver"),
      col("o_orderkey").as("seq"),
      when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"))

  val oracle: Map[String, String] = Map(
    "q_stream_late_audit" ->
      """WITH x AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS tsu,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN hwm IS NOT NULL
        |    AND tsu < hwm - 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        | COUNT(*) AS cnt,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // Spark's sliding windows align to the epoch: an event at ts belongs
    // to the 4 windows starting at floor6h(ts) - k*6h, k = 0..3.
    "q_stream_sliding" ->
      """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000
        |         - k * 21600000000) AS w_start,
        | event_type, COUNT(*) AS cnt,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_val
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k)
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |        THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, event_id,
        |   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type, ts AS ts_us
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_stream_join_dim" ->
      """SELECT tier, COUNT(*) AS cnt,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_val
        |FROM events
        |JOIN (SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier FROM customer) c
        | ON user_id = c_custkey
        |GROUP BY tier ORDER BY tier""".stripMargin,

    // Gaps-and-islands twin of the stateful counter: segment = running
    // error count, purchases-since-error = running purchase count
    // within the (user, segment) island, emitted on purchase rows only.
    "q_stream_stateful" ->
      """WITH seg AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |  FROM events),
        |n AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id, seg ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS purchases_since_error
        |  FROM seg)
        |SELECT user_id, event_id, purchases_since_error
        |FROM n WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    "q_stream_pair_join" ->
      """SELECT a.event_id AS id1, b.event_id AS id2, a.user_id,
        |  a.ts AS ts1, b.ts AS ts2
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY id1, id2""".stripMargin,

    "q_cdc_apply" ->
      """SELECT key, val, as_of FROM (
        |  SELECT o_custkey AS key, o_totalprice AS val,
        |   CAST(o_orderdate AS DATE) AS as_of, o_orderstatus AS st,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 AND st != 'F'
        |ORDER BY key""".stripMargin
  )
}
