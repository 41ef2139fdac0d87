package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 sixteenth-pass batch: hashing-trick featurization (the
  * fixed-width text→vector encoder), peak-preserving time-series
  * downsampling (the viz/export reducer), the error-safe scalar
  * family (try_divide / try_cast), and grouping_id provenance flags
  * on rollup frames.
  *
  * Determinism posture (SURVEY.md Appendix A): feature buckets come
  * from md5 hex digits (the established cross-engine hash — see
  * q_sample_hash); the downsample score is |v·n − Σv| in EXACT decimal
  * (multiplying the |v − mean| criterion through by n dodges decimal
  * division, whose rounding differs between engines); try_divide
  * mirrors as x / NULLIF(d, 0).
  */
object FeatureQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Hashing-trick featurization: tokens hash into 64 fixed buckets
    // via two md5 hex digits — no vocabulary, no fit step, the
    // streaming-friendly encoder linear models use at corpus scale.
    // Sampled to every-100th doc to keep the graded output bounded;
    // the token explode is map-side and the aggregate is (doc, bucket)
    // keyed.
    "q_ml_feature_hashing" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .select(col("doc_id"), expr(
          """((instr('0123456789abcdef', substring(md5(term), 1, 1)) - 1)
            |  * 16
            |  + instr('0123456789abcdef', substring(md5(term), 2, 1)) - 1)
            |  % 64""".stripMargin).cast(LongType).as("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket")
    }),

    // Peak-preserving downsample: one representative row per hour —
    // the event farthest from its bucket mean (|v·n − Σv| in exact
    // decimal ≡ n·|v − mean|, no decimal division), ties to the
    // earliest event. The window frames are hour-bucket partitioned;
    // output is one row per bucket at any scale — the shape a chart
    // exporter runs before shipping points to a browser.
    "q_ts_downsample" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("value"),
        expr("unix_micros(ts_us) div 3600000000").as("bucket"),
        D(col("value")).as("vd"))
      val byB = Window.partitionBy("bucket")
      ev.withColumn("n", count(lit(1)).over(byB))
        .withColumn("sv", sum(col("vd")).over(byB))
        .withColumn("score",
          abs(col("vd") * col("n").cast(DecimalType(10, 0)) - col("sv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("bucket")
            .orderBy(col("score").desc, col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("bucket"), col("event_id"), col("value"), col("n"))
        .orderBy("bucket")
    }),

    // Error-safe scalar family: try_divide (NULL on zero divisor) and
    // try_cast (NULL on parse failure) folded into one audit row — the
    // "never throw on dirty data" contract every ingest pipeline needs.
    // The safe quotient is re-narrowed to exact decimal BEFORE summing
    // (order-free); counts are exact.
    "q_fn_try_safe" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority"),
        (col("o_custkey") % 3).as("d"))
      o.select(
          expr("try_divide(o_totalprice, d)").as("q"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
            .as("prio_digit"),
          expr("try_cast(o_orderstatus AS INT)").as("status_int"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("q").isNull, 1L).otherwise(0L)).as("n_div_null"),
          d4(sum(D(col("q")))).as("sum_safe"),
          sum(when(col("prio_digit").isNotNull, 1L).otherwise(0L))
            .as("n_prio_parsed"),
          sum(when(col("status_int").isNull, 1L).otherwise(0L))
            .as("n_status_null"))
        .orderBy("n")
    }),

    // Rollup with provenance: grouping_id + per-column grouping flags
    // tell a consumer WHICH level each rollup row belongs to (the
    // subtotal-vs-detail disambiguation q_agg_rollup leaves implicit).
    // Group keys are coalesced to 'ALL' in the output so both engines
    // sort identically (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
    "q_agg_grouping_id" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id().cast(LongType).as("gid"),
          grouping(col("o_orderstatus")).cast(LongType).as("g_status"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("g_status"), col("n"))
        .orderBy("gid", "status", "priority")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ml_feature_hashing" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) term
        |  FROM documents WHERE doc_id % 100 = 0),
        |b AS (SELECT doc_id,
        |    CAST(((strpos('0123456789abcdef', substring(md5(term), 1, 1))
        |        - 1) * 16
        |      + strpos('0123456789abcdef', substring(md5(term), 2, 1))
        |      - 1) % 64 AS BIGINT) bucket
        |  FROM toks)
        |SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) cnt
        |FROM b GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,

    "q_ts_downsample" ->
      """WITH ev AS (SELECT event_id, value,
        |    epoch_us(ts) // 3600000000 bucket,
        |    CAST(value AS DECIMAL(18,4)) vd FROM events),
        |w AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY bucket)
        |      AS BIGINT) n,
        |    SUM(vd) OVER (PARTITION BY bucket) sv FROM ev),
        |sc AS (SELECT *, abs(vd * CAST(n AS DECIMAL(10,0)) - sv) score
        |  FROM w),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY bucket
        |    ORDER BY score DESC, event_id) rn FROM sc)
        |SELECT bucket, event_id, value, n FROM rk WHERE rn = 1
        |ORDER BY bucket""".stripMargin,

    "q_fn_try_safe" ->
      """WITH o AS (SELECT o_totalprice, o_orderstatus, o_orderpriority,
        |    o_custkey % 3 d FROM orders),
        |x AS (SELECT o_totalprice / NULLIF(d, 0) q,
        |    TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER)
        |      prio_digit,
        |    TRY_CAST(o_orderstatus AS INTEGER) status_int FROM o)
        |SELECT CAST(COUNT(*) AS BIGINT) n,
        |  CAST(SUM(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    n_div_null,
        |  CAST(CAST(CAST(SUM(CAST(q AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |    AS VARCHAR) AS DOUBLE) sum_safe,
        |  CAST(SUM(CASE WHEN prio_digit IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) n_prio_parsed,
        |  CAST(SUM(CASE WHEN status_int IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) n_status_null
        |FROM x ORDER BY n""".stripMargin,

    "q_agg_grouping_id" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') status,
        |  COALESCE(o_orderpriority, 'ALL') priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) gid,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) g_status,
        |  CAST(COUNT(*) AS BIGINT) n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin
  )
}
