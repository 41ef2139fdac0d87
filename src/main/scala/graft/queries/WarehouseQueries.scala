package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 warehouse-operations batch: table-maintenance planning,
  * retrieval keyword extraction, customer segmentation, and temporal
  * burst detection — each in its 100 TB-shaped formulation (spine
  * windows, 1-row broadcast thresholds, bounded aggregate key spaces).
  */
object WarehouseQueries extends QSet {

  /** Compaction target: rows per compacted output file. */
  private val CompactTarget = 50000L

  val queries: Map[String, QFn] = Map(
    // Small-partition compaction planner (the nightly table-maintenance
    // shape): per-month partition row counts → greedy bin packing by
    // running-total div target. The aggregate collapses the fact to the
    // month spine (partial-agg, ~80 rows at any fact size), so the one
    // unpartitioned window rides the spine, never the fact — the plan
    // an autocompaction service emits before rewriting files.
    "q_layout_compaction_plan" -> ((s, dir) => {
      val pm = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(count(lit(1)).as("n_rows"))
      val w = Window.orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pm.withColumn("cum_rows", sum(col("n_rows")).over(w))
        .withColumn("bin_id",
          expr(s"(cum_rows - n_rows) div ${CompactTarget}L"))
        .orderBy("month")
    }),

    // Per-document keyword extraction: top-3 terms by tf·idf — the
    // retrieval/tagging step after q_text_tfidf's scoring. idf's ln
    // rounds 6dp (the LM recipe), score is ONE IEEE multiply of exact
    // inputs; rank breaks score ties on the term so row_number cannot
    // diverge. The rn ≤ k filter plans Spark's WindowGroupLimit
    // pushdown — per-group top-k never materializes full per-doc term
    // lists at the exchange.
    "q_text_keyword_extract" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * round(log(col("n_docs").cast(DoubleType) /
            col("df")), 6), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn").cast(LongType).as("rank"),
          col("term"), col("tf"), col("score"))
        .orderBy("doc_id", "rank")
    }),

    // RFM customer segmentation: recency/frequency/monetary per
    // customer, median-split into 8 segments. Thresholds are exact
    // percentile_disc picks (value FROM the data, no interpolation —
    // cross-engine exact) carried as a 1-row broadcast; bucketing is
    // pure comparison, so a 100 TB customer frame never needs the
    // global ntile sort the naive formulation uses.
    "q_orders_rfm" -> ((s, dir) => ordersRfm(s, dir)),

    // Temporal burst detection: each (event_type, hour) flagged when
    // its count at least doubles the trailing-24h max (and clears an
    // absolute floor) — ALL integer comparisons, no windowed stddev
    // whose accumulation order could split engines. The window runs on
    // the (type × hour) spine (≤ 720·|types| rows for the fixture
    // month), never the event stream; at 100 TB the spine grows with
    // TIME, not traffic.
    "q_ts_burst_detect" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts_us"))).as("h"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-24, -1)
      hourly.withColumn("trail_max", max(col("n")).over(w))
        .withColumn("is_burst",
          col("trail_max").isNotNull && col("n") >= col("trail_max") * 2 &&
            col("n") >= 10L)
        .orderBy("event_type", "h")
    })
  )

  /** The declared q_orders_rfm body — RFM customer segmentation:
    * recency/frequency/monetary per customer, median-split into 8
    * segments. Thresholds are exact percentile_disc picks (value FROM
    * the data, no interpolation — cross-engine exact) carried as a
    * 1-row broadcast; bucketing is pure comparison, so a 100 TB
    * customer frame never needs the global ntile sort the naive
    * formulation uses.
    *
    * `cutRfm` (r14) cuts lineage at the per-customer RFM ledger: its
    * TWO consumers (the 1-row median thresholds and the final scoring
    * crossJoin) each otherwise re-run the orders scan + per-customer
    * aggregate (+ the nested dmax scan — 4 orders scans total, r14
    * --rescans sweep). One narrow row per customer, the kaplan-meier
    * ledger discipline. Output toggle-invariant (R14TogglesSpec). */
  private[graft] def ordersRfm(s: org.apache.spark.sql.SparkSession,
      dir: String, cutRfm: Boolean = false): DataFrame = {
    val maxd = t(s, dir, "orders")
      .agg(max(col("o_orderdate").cast("date")).as("dmax"))
    val rfmRaw = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(D(col("o_totalprice"))).as("mon_dec"))
      .crossJoin(broadcast(maxd))
      .select(col("o_custkey"),
        datediff(col("dmax"), col("last_order")).cast(LongType)
          .as("recency_days"),
        col("freq"), d4(col("mon_dec")).as("monetary"))
    val rfm = if (cutRfm) cutLineage(rfmRaw) else rfmRaw
    val th = rfm.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY recency_days)")
        .as("r50"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY freq)").as("f50"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY monetary)")
        .as("m50"))
    rfm.crossJoin(broadcast(th))
      .select(col("o_custkey"), col("recency_days"), col("freq"),
        col("monetary"),
        // recency scores HIGH when RECENT (≤ median days since order)
        when(col("recency_days") <= col("r50"), 2L).otherwise(1L)
          .as("r_score"),
        when(col("freq") > col("f50"), 2L).otherwise(1L).as("f_score"),
        when(col("monetary") > col("m50"), 2L).otherwise(1L)
          .as("m_score"))
      .withColumn("segment", concat(lit("R"), col("r_score"),
        lit("F"), col("f_score"), lit("M"), col("m_score")))
      .orderBy("o_custkey")
  }

  val oracle: Map[String, String] = Map(
    "q_layout_compaction_plan" ->
      s"""WITH pm AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    COUNT(*) AS n_rows
        |  FROM orders GROUP BY 1)
        |SELECT month, n_rows,
        |  CAST(SUM(n_rows) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rows,
        |  (CAST(SUM(n_rows) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - n_rows) // ${CompactTarget} AS bin_id
        |FROM pm ORDER BY month""".stripMargin,

    "q_text_keyword_extract" ->
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    round(tf.tf * round(ln(CAST(n.n_docs AS DOUBLE) / df.df), 6), 6)
        |      AS score
        |  FROM tf JOIN df ON tf.term = df.term, n),
        |rk AS (
        |  SELECT doc_id, term, tf, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rn
        |  FROM sc)
        |SELECT doc_id, rn AS rank, term, tf, score
        |FROM rk WHERE rn <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q_orders_rfm" ->
      """WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
        |rfm AS (
        |  SELECT o_custkey,
        |    date_diff('day', MAX(CAST(o_orderdate AS DATE)), maxd.dmax)
        |      AS recency_days,
        |    COUNT(*) AS freq,
        |    CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS monetary
        |  FROM orders, maxd
        |  GROUP BY o_custkey, maxd.dmax),
        |th AS (
        |  SELECT quantile_disc(recency_days, 0.5) AS r50,
        |    quantile_disc(freq, 0.5) AS f50,
        |    quantile_disc(monetary, 0.5) AS m50
        |  FROM rfm)
        |SELECT o_custkey, recency_days, freq, monetary,
        |  CAST(CASE WHEN recency_days <= th.r50 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
        |  CAST(CASE WHEN freq > th.f50 THEN 2 ELSE 1 END AS BIGINT) AS f_score,
        |  CAST(CASE WHEN monetary > th.m50 THEN 2 ELSE 1 END AS BIGINT) AS m_score,
        |  'R' || CASE WHEN recency_days <= th.r50 THEN 2 ELSE 1 END ||
        |  'F' || CASE WHEN freq > th.f50 THEN 2 ELSE 1 END ||
        |  'M' || CASE WHEN monetary > th.m50 THEN 2 ELSE 1 END AS segment
        |FROM rfm, th
        |ORDER BY o_custkey""".stripMargin,

    "q_ts_burst_detect" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, h, n,
        |  CAST(MAX(n) OVER w AS BIGINT) AS trail_max,
        |  (MAX(n) OVER w IS NOT NULL AND n >= MAX(n) OVER w * 2
        |    AND n >= 10) AS is_burst
        |FROM hourly
        |WINDOW w AS (PARTITION BY event_type ORDER BY h
        |  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_type, h""".stripMargin
  )
}
