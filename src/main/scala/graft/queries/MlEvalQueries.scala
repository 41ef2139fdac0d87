package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 twelfth-pass batch: model-evaluation metrics (tie-corrected
  * AUC, precision/recall threshold sweep), interval coalescing
  * (gaps-and-islands), funnel step-latency percentiles, a
  * seasonal-naive forecast backtest, and a storage-encoding advisor —
  * the evaluation/maintenance shapes an ML-serving warehouse runs
  * daily.
  *
  * Determinism posture (SURVEY.md Appendix A): all-integer or
  * exact-decimal bases; the only doubles are shared IEEE divisions
  * (and `floor(value*1000)` score bucketing — multiply and floor are
  * both correctly rounded/exact, so both engines bucket identically).
  */
object MlEvalQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Tie-corrected Mann-Whitney AUC of `value` as a purchase score.
    // Scores are bucketed to 1e-3 (floor — Spark casts double→long by
    // truncation but DuckDB CAST rounds, so an explicit floor is the
    // only cross-engine-safe integerization), then the whole statistic
    // is exact int64: U·2 = 2·Σ np(s)·cumneg(<s) + Σ np(s)·nn(s) (ties
    // count half, hence the ×2 ledger). The ordered window rides the
    // DISTINCT-bucket frame (≤ score-range/1e-3 rows — a domain bound,
    // not the fact); at 100 TB the same frame holds and U·2 would move
    // to DECIMAL(38,0) to dodge int64 overflow past ~2e18 pairs.
    "q_ml_auc" -> ((s, dir) => {
      val ev = events(s, dir).select(
        floor(col("value") * lit(1000.0)).cast(LongType).as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val g = ev.groupBy("sc").agg(
        sum(col("pos")).as("np"),
        sum(lit(1L) - col("pos")).as("nn"))
      val before = Window.orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumneg", coalesce(sum(col("nn")).over(before), lit(0L)))
        .agg(
          sum(col("np") * col("cumneg") * 2 + col("np") * col("nn"))
            .as("u2"),
          sum(col("np")).as("n_pos"),
          sum(col("nn")).as("n_neg"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          (col("u2").cast(DoubleType) /
            (lit(2.0) * col("n_pos").cast(DoubleType) *
              col("n_neg").cast(DoubleType))).as("auc"))
        .orderBy("n_pos")
    }),

    // Precision/recall/F1 sweep at the nine score deciles — the
    // operating-point table behind every threshold choice. The cut
    // frame is 9 rows (percentile_disc = exact element selection),
    // broadcast against the fact for one ×9 conditional-count pass;
    // metric tails are shared IEEE divisions over exact counts.
    "q_ml_pr_curve" -> ((s, dir) => {
      val ev = events(s, dir).select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val pd = (1 to 9).map(i => expr(
        s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY value)")
        .as(s"c$i"))
      val cuts = ev.agg(pd.head, pd.tail: _*)
      val th = cuts.select(explode(array((1 to 9).map(i =>
          struct(lit(i / 10.0).as("q"), col(s"c$i").as("t"))): _*)).as("x"))
        .select(col("x.q").as("q"), col("x.t").as("t"))
      ev.crossJoin(broadcast(th))
        .groupBy("q", "t")
        .agg(
          sum(when(col("value") >= col("t"), col("pos")).otherwise(0L))
            .as("tp"),
          sum(when(col("value") >= col("t"), lit(1L) - col("pos"))
            .otherwise(0L)).as("fp"),
          sum(when(col("value") < col("t"), col("pos")).otherwise(0L))
            .as("fn"))
      .select(col("q"), col("t"), col("tp"), col("fp"), col("fn"),
          (col("tp").cast(DoubleType) /
            (col("tp") + col("fp")).cast(DoubleType)).as("prec"),
          (col("tp").cast(DoubleType) /
            (col("tp") + col("fn")).cast(DoubleType)).as("recl"))
        .withColumn("f1",
          lit(2.0) * col("prec") * col("recl") /
            (col("prec") + col("recl")))
        .orderBy("q")
    }),

    // Overlapping-interval coalescing (gaps-and-islands): each event
    // opens a 30-minute activity interval; merge overlaps per user and
    // report islands / coverage / longest stretch. The running-max-end
    // and island-id windows are USER-partitioned (per-key frames, the
    // scale-safe shape); all arithmetic is int64 µs.
    "q_ts_interval_merge" -> ((s, dir) => {
      val iv = events(s, dir).select(col("user_id"),
          unix_micros(col("ts_us")).as("st"))
        .withColumn("en", col("st") + lit(1800000000L))
      val byU = Window.partitionBy("user_id").orderBy("st", "en")
      val isl = iv
        .withColumn("pmax",
          max(col("en")).over(byU.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("newi",
          when(col("pmax").isNull || col("st") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("newi")).over(byU.rowsBetween(Window.unboundedPreceding, 0)))
      isl.groupBy("user_id", "island")
        .agg(min(col("st")).as("s"), max(col("en")).as("e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("e") - col("s")).as("covered_us"),
          max(col("e") - col("s")).as("max_len_us"))
        .orderBy("user_id")
    }),

    // Funnel step latency: per user, first view / first click → first
    // purchase; report conversion counts and p50/p90/p99 time-to-
    // convert per step. One per-user conditional-min aggregate collapses
    // the fact; percentiles (exact element selection on int64 µs) ride
    // the per-step user frame.
    "q_funnel_latency" -> ((s, dir) => {
      val tu = unix_micros(col("ts_us"))
      val f = events(s, dir).groupBy("user_id").agg(
        min(when(col("event_type") === "view", tu)).as("tv"),
        min(when(col("event_type") === "click", tu)).as("tc"),
        min(when(col("event_type") === "purchase", tu)).as("tp"))
      val steps = f.select(col("user_id"), col("tp"),
          explode(array(
            struct(lit("view->purchase").as("step"), col("tv").as("t0")),
            struct(lit("click->purchase").as("step"), col("tc").as("t0"))))
            .as("x"))
        .select(col("x.step").as("step"), col("x.t0").as("t0"), col("tp"))
        .filter(col("tp").isNotNull && col("t0").isNotNull &&
          col("tp") > col("t0"))
        .withColumn("lat", col("tp") - col("t0"))
      steps.groupBy("step").agg(
          count(lit(1)).as("n_converted"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat)")
            .cast(LongType).as("p50_us"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat)")
            .cast(LongType).as("p90_us"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY lat)")
            .cast(LongType).as("p99_us"))
        .orderBy("step")
    }),

    // Seasonal-naive forecast backtest: forecast(h) = actual(h−24),
    // scored against the lag-1 naive baseline (the standard "is there
    // even a daily season" skill check). Hourly totals are exact
    // decimal; the h−24 / h−1 attachments are equi-joins on the hour
    // key (gap-safe, unlike a row-offset lag); MAEs and the skill
    // score are shared IEEE tails over string-hopped exact sums.
    "q_ts_forecast_snaive" -> ((s, dir) => forecastSnaive(s, dir)),

    // Storage-encoding advisor: per column, distinct ratio and
    // BLOCK-LOCAL run count (8192-row blocks in the table's key order —
    // the row-group-local view parquet's encoder actually takes), then
    // a dict/rle/plain recommendation. Runs are counted with a
    // (column, block)-partitioned lag — per-block frames, never a
    // global window; values compare through an injective string cast
    // (format differences between engines can't matter: only equality
    // and distinctness of the casts are consumed).
    "q_layout_encoding_advisor" -> ((s, dir) => {
      // one NATIVE-typed pass per column (a ×4 string-stack benched
      // 2.3× slower: 4× the shuffled rows, string compares, string
      // distinct); equality/distinctness of the native values is what
      // the metrics consume, so the oracle's injective VARCHAR-cast
      // formulation counts identically
      val byBlk = Window.partitionBy("blk").orderBy("o_orderkey")
      def colStats(cname: String) =
        t(s, dir, "orders")
          .select(col("o_orderkey"), col(cname).as("val"))
          .withColumn("blk", expr("o_orderkey div 8192"))
          .withColumn("prev", lag(col("val"), 1).over(byBlk))
          .withColumn("run_start",
            when(col("prev").isNull || col("val") =!= col("prev"), 1L)
              .otherwise(0L))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("val")).as("n_distinct"),
            sum(col("run_start")).as("n_runs"))
          .select(lit(cname).as("col_name"), col("n"), col("n_distinct"),
            col("n_runs"))
      Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")
        .map(colStats).reduce(_ unionAll _)
        .select(col("col_name"), col("n"), col("n_distinct"), col("n_runs"),
          (col("n_distinct").cast(DoubleType) / col("n").cast(DoubleType))
            .as("distinct_ratio"),
          (col("n_runs").cast(DoubleType) / col("n").cast(DoubleType))
            .as("run_ratio"),
          when(col("n_distinct") * 100 <= col("n"), "dict")
            .when(col("n_runs") * 5 <= col("n"), "rle")
            .otherwise("plain").as("advice"))
        .orderBy("col_name")
    })
  )

  /** The declared q_ts_forecast_snaive body — seasonal-naive forecast
    * backtest: forecast(h) = actual(h−24), scored against the lag-1
    * naive baseline. Hourly totals are exact decimal; the h−24 / h−1
    * attachments are equi-joins on the hour key (gap-safe, unlike a
    * row-offset lag); MAEs and the skill score are shared IEEE tails
    * over string-hopped exact sums.
    *
    * `shareByh` (r14) cuts lineage at the ~720-row hour spine: its
    * THREE consumers (actuals, the h−24 and h−1 shifts) each otherwise
    * re-run the full events scan + hourly decimal aggregate (3 events
    * scans, r14 --rescans sweep) — the kaplan-meier events-ledger
    * boundary (corpus pass × ≥3 consumers, bounded frame). No
    * partition-less window sits on the frame (plain joins + one global
    * aggregate), so the PlanSpec boundedness proof is unaffected.
    * Output toggle-invariant (R14TogglesSpec). */
  private[graft] def forecastSnaive(s: org.apache.spark.sql.SparkSession,
      dir: String, shareByh: Boolean = false): DataFrame = {
    val byhRaw = events(s, dir)
      .groupBy(expr("unix_micros(ts_us) div 3600000000").as("h"))
      .agg(sum(D(col("value"))).cast(Dec).as("v"))
    val byh = if (shareByh) cutLineage(byhRaw) else byhRaw
    val a = byh.select(col("h"), col("v"))
    val f24 = byh.select((col("h") + 24).as("h"), col("v").as("v24"))
    val f1 = byh.select((col("h") + 1).as("h"), col("v").as("v1"))
    val hop = (c: org.apache.spark.sql.Column) =>
      c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
    a.join(f24, "h").join(f1, "h")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("v") - col("v24"))).as("s24"),
        sum(abs(col("v") - col("v1"))).as("s1"))
      .select(col("n_hours"),
        (hop(col("s24")) / col("n_hours").cast(DoubleType))
          .as("mae_snaive"),
        (hop(col("s1")) / col("n_hours").cast(DoubleType))
          .as("mae_naive1"))
      .withColumn("skill", lit(1.0) - col("mae_snaive") / col("mae_naive1"))
      .orderBy("n_hours")
  }

  val oracle: Map[String, String] = Map(
    "q_ml_auc" ->
      """WITH ev AS (SELECT
        |    CAST(floor(value * 1000.0e0) AS BIGINT) sc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END pos
        |  FROM events),
        |g AS (SELECT sc, CAST(SUM(pos) AS BIGINT) np,
        |    CAST(SUM(1 - pos) AS BIGINT) nn FROM ev GROUP BY sc),
        |c AS (SELECT np, nn, COALESCE(CAST(SUM(nn) OVER (ORDER BY sc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) cumneg FROM g),
        |tot AS (SELECT CAST(SUM(np * cumneg * 2 + np * nn) AS BIGINT) u2,
        |    CAST(SUM(np) AS BIGINT) n_pos, CAST(SUM(nn) AS BIGINT) n_neg
        |  FROM c)
        |SELECT n_pos, n_neg, u2,
        |  CAST(u2 AS DOUBLE)
        |    / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) auc
        |FROM tot ORDER BY n_pos""".stripMargin,

    "q_ml_pr_curve" ->
      """WITH ev AS (SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END pos
        |  FROM events),
        |cuts AS (SELECT
        |    quantile_disc(value, 0.1) c1, quantile_disc(value, 0.2) c2,
        |    quantile_disc(value, 0.3) c3, quantile_disc(value, 0.4) c4,
        |    quantile_disc(value, 0.5) c5, quantile_disc(value, 0.6) c6,
        |    quantile_disc(value, 0.7) c7, quantile_disc(value, 0.8) c8,
        |    quantile_disc(value, 0.9) c9 FROM ev),
        |th AS (SELECT 0.1e0 q, c1 t FROM cuts
        |  UNION ALL SELECT 0.2e0, c2 FROM cuts
        |  UNION ALL SELECT 0.3e0, c3 FROM cuts
        |  UNION ALL SELECT 0.4e0, c4 FROM cuts
        |  UNION ALL SELECT 0.5e0, c5 FROM cuts
        |  UNION ALL SELECT 0.6e0, c6 FROM cuts
        |  UNION ALL SELECT 0.7e0, c7 FROM cuts
        |  UNION ALL SELECT 0.8e0, c8 FROM cuts
        |  UNION ALL SELECT 0.9e0, c9 FROM cuts),
        |m AS (SELECT q, t,
        |    CAST(SUM(CASE WHEN value >= t THEN pos ELSE 0 END) AS BIGINT)
        |      tp,
        |    CAST(SUM(CASE WHEN value >= t THEN 1 - pos ELSE 0 END)
        |      AS BIGINT) fp,
        |    CAST(SUM(CASE WHEN value < t THEN pos ELSE 0 END) AS BIGINT)
        |      fn
        |  FROM ev, th GROUP BY q, t),
        |pr AS (SELECT q, t, tp, fp, fn,
        |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) prec,
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) recl FROM m)
        |SELECT q, t, tp, fp, fn, prec, recl,
        |  2.0e0 * prec * recl / (prec + recl) f1
        |FROM pr ORDER BY q""".stripMargin,

    "q_ts_interval_merge" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) st,
        |    epoch_us(ts) + 1800000000 en FROM events),
        |mk AS (SELECT user_id, st, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pmax
        |  FROM iv),
        |fl AS (SELECT user_id, st, en,
        |    CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END newi
        |  FROM mk),
        |isl AS (SELECT user_id, st, en,
        |    SUM(newi) OVER (PARTITION BY user_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) island
        |  FROM fl),
        |m AS (SELECT user_id, island, MIN(st) s, MAX(en) e FROM isl
        |  GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) n_intervals,
        |  CAST(SUM(e - s) AS BIGINT) covered_us,
        |  CAST(MAX(e - s) AS BIGINT) max_len_us
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_funnel_latency" ->
      """WITH f AS (SELECT user_id,
        |    MIN(epoch_us(ts)) FILTER (WHERE event_type = 'view') tv,
        |    MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click') tc,
        |    MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') tp
        |  FROM events GROUP BY 1),
        |steps AS (SELECT 'view->purchase' step, tv t0, tp FROM f
        |  UNION ALL SELECT 'click->purchase', tc, tp FROM f),
        |lat AS (SELECT step, tp - t0 lat FROM steps
        |  WHERE tp IS NOT NULL AND t0 IS NOT NULL AND tp > t0)
        |SELECT step, CAST(COUNT(*) AS BIGINT) n_converted,
        |  CAST(quantile_disc(lat, 0.5) AS BIGINT) p50_us,
        |  CAST(quantile_disc(lat, 0.9) AS BIGINT) p90_us,
        |  CAST(quantile_disc(lat, 0.99) AS BIGINT) p99_us
        |FROM lat GROUP BY step ORDER BY step""".stripMargin,

    "q_ts_forecast_snaive" ->
      """WITH byh AS (SELECT epoch_us(ts) // 3600000000 h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) v
        |  FROM events GROUP BY 1),
        |j AS (SELECT a.h, a.v, f24.v v24, f1.v v1 FROM byh a
        |  JOIN byh f24 ON a.h = f24.h + 24
        |  JOIN byh f1 ON a.h = f1.h + 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) n_hours,
        |    CAST(CAST(CAST(SUM(abs(v - v24)) AS DECIMAL(38,8)) AS VARCHAR)
        |      AS DOUBLE) s24,
        |    CAST(CAST(CAST(SUM(abs(v - v1)) AS DECIMAL(38,8)) AS VARCHAR)
        |      AS DOUBLE) s1
        |  FROM j)
        |SELECT n_hours, s24 / CAST(n_hours AS DOUBLE) mae_snaive,
        |  s1 / CAST(n_hours AS DOUBLE) mae_naive1,
        |  1.0e0 - (s24 / CAST(n_hours AS DOUBLE))
        |    / (s1 / CAST(n_hours AS DOUBLE)) skill
        |FROM t ORDER BY n_hours""".stripMargin,

    "q_layout_encoding_advisor" ->
      """WITH st AS (
        |  SELECT o_orderkey, 'o_orderstatus' col_name,
        |      CAST(o_orderstatus AS VARCHAR) val FROM orders
        |  UNION ALL SELECT o_orderkey, 'o_orderpriority',
        |      CAST(o_orderpriority AS VARCHAR) FROM orders
        |  UNION ALL SELECT o_orderkey, 'o_custkey',
        |      CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT o_orderkey, 'o_totalprice',
        |      CAST(o_totalprice AS VARCHAR) FROM orders),
        |blk AS (SELECT *, o_orderkey // 8192 b FROM st),
        |r AS (SELECT col_name, val,
        |    lag(val, 1) OVER (PARTITION BY col_name, b
        |      ORDER BY o_orderkey) prev
        |  FROM blk),
        |g AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) n,
        |    CAST(COUNT(DISTINCT val) AS BIGINT) n_distinct,
        |    CAST(SUM(CASE WHEN prev IS NULL OR val <> prev THEN 1
        |      ELSE 0 END) AS BIGINT) n_runs
        |  FROM r GROUP BY col_name)
        |SELECT col_name, n, n_distinct, n_runs,
        |  CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE) distinct_ratio,
        |  CAST(n_runs AS DOUBLE) / CAST(n AS DOUBLE) run_ratio,
        |  CASE WHEN n_distinct * 100 <= n THEN 'dict'
        |    WHEN n_runs * 5 <= n THEN 'rle' ELSE 'plain' END advice
        |FROM g ORDER BY col_name""".stripMargin
  )
}
