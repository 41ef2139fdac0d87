package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables.{D, d4}

/** SURVEY.md §2.10 — the single transform function behind each
  * streaming operator. Each takes an events frame (batch OR streaming,
  * schema: event_id, user_id, event_type, value, props, ts_us) so the
  * batch twin declared in SparkEntry.queries and the readStream twin
  * asserted in scalatest share one code path.
  *
  * Windowed aggs work unchanged on streaming input (group-by window is
  * Spark's native streaming agg); the gaps-and-islands session transform
  * is batch-only — its streaming twin uses session_window (see
  * StreamingSpec) and scalatest asserts the two agree on replay.
  */
object StreamTransforms {

  /** 1-day tumbling window × event_type: count + exact decimal sum. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts_us"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("sum_val"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** 1-day windows sliding every 6 hours (each event in 4 windows). */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts_us"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("sum_val"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** Batch gaps-and-islands sessionization, 30-minute inactivity gap:
    * (user_id, session_id, n_events, start_ts, end_ts). The streaming
    * twin is session_window(ts_us, "30 minutes") — same session bounds.
    */
  def sessionsBatch(ev: DataFrame): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val run = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev", lag(col("ts_us"), 1).over(byTs))
      .withColumn("is_new",
        when(col("prev").isNull ||
          (unix_micros(col("ts_us")) - unix_micros(col("prev")) >
            1800000000L), 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_ts"), max(col("ts_us")).as("end_ts"))
  }

  /** Key-dedup: one row per event_id (rows for a key are identical in
    * the doubled replay, so the arbitrary keep is deterministic).
    * Streaming twin: dropDuplicatesWithinWatermark. */
  def dedupByKey(ev: DataFrame): DataFrame =
    ev.select("event_id", "user_id", "event_type", "ts_us")
      .dropDuplicates("event_id")

  /** Stream ⋈ static dim: events joined to a customer-derived tier. */
  def joinDim(ev: DataFrame, customer: DataFrame): DataFrame =
    ev.join(customer.select(col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier")),
        ev("user_id") === col("c_custkey"))
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("sum_val"))
}
