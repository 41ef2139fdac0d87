package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.streaming.StreamTransforms

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
