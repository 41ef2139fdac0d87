package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 thirteenth-pass batch: retrieval/recommendation evaluation
  * and product analytics — per-user nDCG@10, a thresholded confusion
  * matrix with MCC, cohort LTV curves, sessionized quality metrics
  * (bounce rate / dwell), and item-item co-occurrence neighbors (the
  * "customers also bought" primitive).
  *
  * Determinism posture (SURVEY.md Appendix A): the nDCG log-discounts
  * are pre-scaled int64 LITERALS (1/log2(r+1) · 1e12), so DCG/IDCG are
  * exact integer ledgers and the only float is one final shared IEEE
  * division — no runtime transcendentals, no order-dependent double
  * sums. Everything else is exact counts/decimals with shared IEEE
  * tails (sqrt is correctly rounded per IEEE-754).
  */
object RecEvalQueries extends QSet {

  /** 1/log2(r+1) · 1e12 for r = 1..10, and its prefix sums (IDCG of k
    * all-relevant ranks). Integer literals → bit-identical on both
    * engines. */
  private val Disc = Seq(1000000000000L, 630929753571L, 500000000000L,
    430676558073L, 386852807235L, 356207187108L, 333333333333L,
    315464876786L, 301029995664L, 289064826318L)
  private val DiscPrefix = Seq(1000000000000L, 1630929753571L,
    2130929753571L, 2561606311644L, 2948459118879L, 3304666305987L,
    3637999639320L, 3953464516106L, 4254494511770L, 4543559338088L)

  private def caseChain(on: Column, vals: Seq[Long]): Column =
    vals.zipWithIndex.foldLeft(lit(null).cast(LongType): Column) {
      case (acc, (v, i)) => when(on === (i + 1), lit(v)).otherwise(acc)
    }
  private def sqlCase(on: String, vals: Seq[Long]): String =
    "CASE " + vals.zipWithIndex.map { case (v, i) =>
      s"WHEN $on = ${i + 1} THEN $v" }.mkString(" ") + " ELSE NULL END"

  val queries: Map[String, QFn] = Map(
    // Per-user nDCG@10 of `value` as a ranking score against purchase
    // relevance — the retrieval-quality metric every search/reco
    // pipeline tracks. Ranks are user-partitioned row_number windows
    // (per-key frames); DCG@10 = Σ rel·D[rank] and IDCG@10 =
    // prefix[min(10, n_relevant)] are exact int64 ledgers over the
    // scaled literal discounts; nDCG is the one shared IEEE division.
    // Users with no relevant event are excluded (IDCG undefined).
    "q_ml_ndcg" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("rel"))
      val ranked = ev.withColumn("rnk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("value").desc, col("event_id"))))
      val top = ranked.filter(col("rnk") <= 10)
        .groupBy("user_id")
        .agg(sum(col("rel") * caseChain(col("rnk"), Disc))
          .as("dcg_scaled"))
      val npos = ev.groupBy("user_id").agg(sum(col("rel")).as("n_rel"))
        .filter(col("n_rel") >= 1)
        .withColumn("idcg_scaled",
          caseChain(least(col("n_rel"), lit(10L)), DiscPrefix))
      top.join(npos, "user_id")
        .select(col("user_id"), col("n_rel"), col("dcg_scaled"),
          col("idcg_scaled"),
          (col("dcg_scaled").cast(DoubleType) /
            col("idcg_scaled").cast(DoubleType)).as("ndcg"))
        .orderBy("user_id")
    }),

    // Confusion matrix of the median-threshold classifier (pred =
    // value ≥ p50, actual = purchase) with accuracy, F1 and Matthews
    // correlation. One exact conditional-count aggregate against a
    // broadcast 1-row threshold; MCC's 4-factor product runs in double
    // (it overflows int64 at ~1e5 rows per cell) as one shared IEEE
    // expression.
    "q_ml_confusion" -> ((s, dir) => {
      val ev = events(s, dir).select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val thr = ev.agg(expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("t"))
      val cells = ev.crossJoin(broadcast(thr)).agg(
        sum(when(col("value") >= col("t") && col("pos") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("value") >= col("t") && col("pos") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("value") < col("t") && col("pos") === 1, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("value") < col("t") && col("pos") === 0, 1L)
          .otherwise(0L)).as("tn"))
      val d = (c: String) => col(c).cast(DoubleType)
      cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
          ((col("tp") + col("tn")).cast(DoubleType) /
            (col("tp") + col("fp") + col("fn") + col("tn"))
              .cast(DoubleType)).as("accuracy"),
          ((lit(2.0) * d("tp")) /
            (lit(2.0) * d("tp") + d("fp") + d("fn"))).as("f1"),
          ((d("tp") * d("tn") - d("fp") * d("fn")) /
            sqrt((d("tp") + d("fp")) * (d("tp") + d("fn")) *
              (d("tn") + d("fp")) * (d("tn") + d("fn")))).as("mcc"))
        .orderBy("tp")
    }),

    // Cohort LTV: users cohorted by the week of their first signup
    // event; purchase revenue accumulated by weeks-since-signup. The
    // cumulative window rides the cohort×week frame (domain-bounded —
    // weeks in the observation span squared, never the fact); revenue
    // stays exact decimal through the d4 hop.
    "q_cohort_ltv" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        col("value"), expr("unix_micros(ts_us) div 604800000000").as("w"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("w")).as("w0"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .filter(col("w") >= col("w0"))
        .groupBy(col("w0").as("cohort_week"),
          (col("w") - col("w0")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_buyers"),
          sum(D(col("value"))).cast(Dec).as("rev"))
      val cum = Window.partitionBy("cohort_week").orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, 0)
      rev.withColumn("cum_rev_d", sum(col("rev")).over(cum))
        .select(col("cohort_week"), col("weeks_since"), col("n_buyers"),
          d4(col("rev")).as("rev"), d4(col("cum_rev_d")).as("cum_rev"))
        .orderBy("cohort_week", "weeks_since")
    }),

    // Sessionized quality metrics: 30-minute-gap sessions (the
    // q_sessionize recipe), then per entry-channel bounce rate, median
    // dwell and volume. Session assembly is user-partitioned lag +
    // cumsum windows; the entry event is the rank-1 row's attribute
    // via conditional aggregation (no min_by cross-engine hazard);
    // dwell percentiles are exact element selection on int64 µs.
    "q_sessions_quality" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts_us")).as("tu"))
      val byU = Window.partitionBy("user_id").orderBy("tu", "event_id")
      val sess = ev
        .withColumn("gap",
          when(col("tu") - lag(col("tu"), 1).over(byU) > 1800000000L ||
            lag(col("tu"), 1).over(byU).isNull, 1L).otherwise(0L))
        .withColumn("sid",
          sum(col("gap")).over(byU.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "sid").orderBy("tu", "event_id")))
      val per = sess.groupBy("user_id", "sid").agg(
        count(lit(1)).as("n_events"),
        (max(col("tu")) - min(col("tu"))).as("dur_us"),
        max(when(col("rn") === 1, col("event_type"))).as("entry"))
      per.groupBy("entry").agg(
          count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("bounces"),
          sum(col("n_events")).as("events"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dur_us)")
            .cast(LongType).as("p50_dur_us"))
        .withColumn("bounce_rate",
          col("bounces").cast(DoubleType) / col("n_sessions").cast(DoubleType))
        .orderBy("entry")
    }),

    // Item-item co-occurrence neighbors ("customers also bought"):
    // per-order distinct parts, within-order pairs (order-size-bounded
    // explode, the q_basket_lift posture — linear in the fact at any
    // scale), cosine c_ij/√(c_i·c_j) as one shared sqrt expression
    // over exact int64 counts, symmetrized, top-3 neighbors per item
    // through the row_number ≤ k WindowGroupLimit path, and a top-200
    // presentation cap.
    "q_rec_item_neighbors" -> ((s, dir) => {
      // SINGLE-SUBTREE dataflow — the first cut self-joined a distinct
      // frame and symmetrized with a union, which made Catalyst
      // materialize the whole scan→distinct→pair pipeline FOUR times
      // (union branch + two broadcast count attachments; benched
      // 3.1 s at sf0.1, ~1.0 s now). Basket assembly dedupes inline
      // (collect_set ⇒ one ok-shuffle, no separate distinct), pair
      // generation emits BOTH directions in one in-row array transform
      // (no union-of-self), and the per-item counts are an independent
      // cheap scan that BROADCASTS onto the ranked frame.
      val baskets = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy("ok")
        .agg(sort_array(collect_set(col("pk"))).as("ps"))
      // min-support 2 (the standard market-basket prune): drops the
      // ~99.7% singleton-pair tail BEFORE the rank stage — a single
      // co-purchase is noise, not signal
      val undirected = baskets.select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps) - i - 1),
            |    y -> struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("cij"))
        .filter(col("cij") >= 2)
      // symmetrize AFTER the aggregate, map-side, on the few-k
      // supported-pair frame (a union-of-self here would make Catalyst
      // recompute the whole pair pipeline per branch — measured 2×)
      val cij = undirected.select(explode(array(
          struct(col("p1"), col("p2"), col("cij")),
          struct(col("p2").as("p1"), col("p1").as("p2"), col("cij"))))
          .as("e"))
        .select(col("e.p1").as("p1"), col("e.p2").as("p2"),
          col("e.cij").as("cij"))
      // per-part counts are PART-cardinality (corpus-proportional):
      // hint rides the part table's size gate (r9), AQE past it
      val ci = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .groupBy("pk").agg(count(lit(1)).as("c"))
      def h(df: DataFrame): DataFrame =
        if (underDimGate(s, dir, "part")) broadcast(df) else df
      val scored = cij
        .join(h(ci.select(col("pk").as("p1"), col("c").as("c1"))),
          "p1")
        .join(h(ci.select(col("pk").as("p2"), col("c").as("c2"))),
          "p2")
        .withColumn("cosine", col("cij").cast(DoubleType) /
          sqrt((col("c1") * col("c2")).cast(DoubleType)))
      scored.withColumn("rnk", row_number().over(
          Window.partitionBy("p1")
            .orderBy(col("cosine").desc, col("cij").desc, col("p2"))))
        .filter(col("rnk") <= 3)
        .select(col("p1").as("item"), col("p2").as("neighbor"),
          col("cij"), col("cosine"), col("rnk").cast(LongType).as("rnk"))
        .orderBy(col("cosine").desc, col("item"), col("rnk"))
        .limit(200)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ml_ndcg" ->
      s"""WITH ev AS (SELECT user_id, event_id, value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END rel
        |  FROM events),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY value DESC, event_id) rnk FROM ev),
        |top AS (SELECT user_id,
        |    CAST(SUM(rel * (${sqlCase("rnk", Disc)})) AS BIGINT)
        |      dcg_scaled
        |  FROM ranked WHERE rnk <= 10 GROUP BY user_id),
        |npos AS (SELECT user_id, CAST(SUM(rel) AS BIGINT) n_rel
        |  FROM ev GROUP BY user_id HAVING SUM(rel) >= 1),
        |idcg AS (SELECT user_id, n_rel,
        |    (${sqlCase("least(n_rel, 10)", DiscPrefix)}) idcg_scaled
        |  FROM npos)
        |SELECT t.user_id, i.n_rel, t.dcg_scaled, i.idcg_scaled,
        |  CAST(t.dcg_scaled AS DOUBLE) / CAST(i.idcg_scaled AS DOUBLE)
        |    ndcg
        |FROM top t JOIN idcg i ON t.user_id = i.user_id
        |ORDER BY t.user_id""".stripMargin,

    "q_ml_confusion" ->
      """WITH ev AS (SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END pos
        |  FROM events),
        |thr AS (SELECT quantile_disc(value, 0.5) t FROM ev),
        |cells AS (SELECT
        |    CAST(SUM(CASE WHEN value >= t AND pos = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) tp,
        |    CAST(SUM(CASE WHEN value >= t AND pos = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) fp,
        |    CAST(SUM(CASE WHEN value < t AND pos = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) fn,
        |    CAST(SUM(CASE WHEN value < t AND pos = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) tn
        |  FROM ev, thr)
        |SELECT tp, fp, fn, tn,
        |  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
        |    accuracy,
        |  (2.0e0 * CAST(tp AS DOUBLE))
        |    / (2.0e0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
        |       + CAST(fn AS DOUBLE)) f1,
        |  (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |     - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |    / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))) mcc
        |FROM cells ORDER BY tp""".stripMargin,

    "q_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, event_type, value,
        |    epoch_us(ts) // 604800000000 w FROM events),
        |cohort AS (SELECT user_id, MIN(w) w0 FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |rev AS (SELECT c.w0 cohort_week, e.w - c.w0 weeks_since,
        |    CAST(COUNT(DISTINCT e.user_id) AS BIGINT) n_buyers,
        |    CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      rev
        |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.w >= c.w0
        |  GROUP BY 1, 2)
        |SELECT cohort_week, weeks_since, n_buyers,
        |  CAST(CAST(CAST(rev AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) rev,
        |  CAST(CAST(CAST(SUM(rev) OVER (PARTITION BY cohort_week
        |      ORDER BY weeks_since
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) cum_rev
        |FROM rev ORDER BY cohort_week, weeks_since""".stripMargin,

    "q_sessions_quality" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) tu FROM events),
        |g AS (SELECT *, CASE WHEN tu - lag(tu, 1) OVER
        |      (PARTITION BY user_id ORDER BY tu, event_id) > 1800000000
        |      OR lag(tu, 1) OVER (PARTITION BY user_id
        |        ORDER BY tu, event_id) IS NULL
        |    THEN 1 ELSE 0 END gap FROM ev),
        |sid AS (SELECT *, SUM(gap) OVER (PARTITION BY user_id
        |      ORDER BY tu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
        |  FROM g),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |      ORDER BY tu, event_id) rn FROM sid),
        |per AS (SELECT user_id, sid, COUNT(*) n_events,
        |    MAX(tu) - MIN(tu) dur_us,
        |    MAX(CASE WHEN rn = 1 THEN event_type END) entry
        |  FROM rn GROUP BY 1, 2)
        |SELECT entry, CAST(COUNT(*) AS BIGINT) n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    bounces,
        |  CAST(SUM(n_events) AS BIGINT) events,
        |  CAST(quantile_disc(dur_us, 0.5) AS BIGINT) p50_dur_us,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) bounce_rate
        |FROM per GROUP BY entry ORDER BY entry""".stripMargin,

    "q_rec_item_neighbors" ->
      """WITH b AS (SELECT DISTINCT l_orderkey ok, l_partkey pk
        |  FROM lineitem),
        |ci AS (SELECT pk, CAST(COUNT(*) AS BIGINT) c FROM b GROUP BY pk),
        |cij AS (SELECT a.pk p1, bb.pk p2, CAST(COUNT(*) AS BIGINT) cij
        |  FROM b a JOIN b bb ON a.ok = bb.ok AND a.pk < bb.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (SELECT p1, p2, cij FROM cij
        |  UNION ALL SELECT p2, p1, cij FROM cij),
        |sc AS (SELECT s.p1, s.p2, s.cij,
        |    CAST(s.cij AS DOUBLE) / sqrt(CAST(c1.c * c2.c AS DOUBLE))
        |      cosine
        |  FROM sym s JOIN ci c1 ON c1.pk = s.p1
        |  JOIN ci c2 ON c2.pk = s.p2),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY p1
        |    ORDER BY cosine DESC, cij DESC, p2) rnk FROM sc)
        |SELECT p1 item, p2 neighbor, cij, cosine, rnk FROM rk
        |WHERE rnk <= 3
        |ORDER BY cosine DESC, item, rnk LIMIT 200""".stripMargin
  )
}
