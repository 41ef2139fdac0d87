package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 eleventh-pass batch: the experimentation / causal-analytics
  * family (two-proportion z-test, CUPED variance reduction, Poisson
  * bootstrap confidence intervals), survival analysis (discrete-time
  * hazard of first conversion), linear multi-touch attribution,
  * positional phrase search over the token index, and cross-document
  * repeated-substring audit — operator families an A/B-testing or
  * web-corpus platform runs constantly and the surface did not cover.
  *
  * Determinism posture (SURVEY.md Appendix A): exact int64 / decimal
  * bases everywhere, one shared IEEE expression shape per derived
  * float, `sqrt` only (correctly rounded per IEEE-754 on both
  * engines), Poisson draws via literal integer CDF thresholds — no
  * libm transcendentals at all in this batch.
  */
object ExperimentQueries extends QSet {

  /** Poisson(1) CDF as integer thresholds out of 1e6 — literals, so
    * both engines compare the same exact ints (P(0)=.367879,
    * P(≤1)=.735759, …). */
  private val PoisCdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L)

  /** Attribution lookback window: 7 days in µs. */
  private val LookbackUs = 604800000000L

  /** Exact-decimal → double through the exact string at (38,8) — the
    * A.8 hop for moment sums whose products outgrow DECIMAL(18,4). */
  private def hop38(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
  private def sqlHop38(e: String) =
    s"CAST(CAST(CAST($e AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)"

  val queries: Map[String, QFn] = Map(
    // Two-proportion z-test — the A/B-test readout. Unit = event,
    // arm = user_id parity, success = purchase. One exact global
    // aggregate (conditional int64 counts) collapses the fact to a
    // single row; every float after that is one shared IEEE expression
    // over those counts (division, multiplication, sqrt — all
    // correctly rounded operations, no libm). Map-side partial
    // aggregation means the shuffle carries one row per partition.
    "q_stats_prop_test" -> ((s, dir) => {
      val ev = events(s, dir).select(
        (col("user_id") % 2).as("arm"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("succ"))
      val base = ev.agg(
        count(when(col("arm") === 0, 1)).as("n_a"),
        sum(when(col("arm") === 0, col("succ")).otherwise(0L)).as("x_a"),
        count(when(col("arm") === 1, 1)).as("n_b"),
        sum(when(col("arm") === 1, col("succ")).otherwise(0L)).as("x_b"))
      val p = base.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        (col("x_a").cast(DoubleType) / col("n_a").cast(DoubleType)).as("p_a"),
        (col("x_b").cast(DoubleType) / col("n_b").cast(DoubleType)).as("p_b"),
        ((col("x_a") + col("x_b")).cast(DoubleType) /
          (col("n_a") + col("n_b")).cast(DoubleType)).as("p_pool"))
      p.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          col("p_a"), col("p_b"), col("p_pool"),
          ((col("p_a") - col("p_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a").cast(DoubleType) +
               lit(1.0) / col("n_b").cast(DoubleType)))).as("z"))
        .withColumn("significant",
          when(abs(col("z")) > lit(1.96), 1).otherwise(0))
        .orderBy("n_a")
    }),

    // CUPED variance reduction — the standard experimentation-platform
    // adjustment: pre-period covariate x (first half of the month),
    // post-period metric y, theta = cov(x,y)/var(x), adjusted arm mean
    // = ybar_v − theta·(xbar_v − xbar). Per-user period sums are exact
    // decimal; the five global moment sums (and the per-arm sums) stay
    // exact decimal through the (38,8) string hop; theta / variance
    // reduction / adjusted means are shared IEEE expressions over those
    // exact doubles. The windowed global sums ride the 2-row arm frame,
    // never the fact.
    "q_stats_cuped" -> ((s, dir) => {
      val cut = lit("2024-01-16 00:00:00").cast(TimestampType)
      val per = events(s, dir)
        .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
        .agg(
          // re-narrow to (18,4): Spark's SUM widens to (28,4) whose
          // square would overflow DuckDB's 38-digit multiply
          sum(when(col("ts_us") < cut, D(col("value")))
            .otherwise(D(lit(0.0)))).cast(Dec).as("x"),
          sum(when(col("ts_us") >= cut, D(col("value")))
            .otherwise(D(lit(0.0)))).cast(Dec).as("y"))
      val g = per.groupBy("arm").agg(
        count(lit(1)).as("n_v"),
        sum(col("x")).as("sx_v"),
        sum(col("y")).as("sy_v"),
        sum((col("x") * col("x")).cast(DecimalType(38, 8))).as("sxx_v"),
        sum((col("x") * col("y")).cast(DecimalType(38, 8))).as("sxy_v"),
        sum((col("y") * col("y")).cast(DecimalType(38, 8))).as("syy_v"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val w = g
        .withColumn("n", sum(col("n_v")).over(all))
        .withColumn("sx", hop38(sum(col("sx_v")).over(all)))
        .withColumn("sy", hop38(sum(col("sy_v")).over(all)))
        .withColumn("sxx", hop38(sum(col("sxx_v")).over(all)))
        .withColumn("sxy", hop38(sum(col("sxy_v")).over(all)))
        .withColumn("syy", hop38(sum(col("syy_v")).over(all)))
        .withColumn("nd", col("n").cast(DoubleType))
      val theta =
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
          (col("nd") * col("sxx") - col("sx") * col("sx"))
      val w2 = w.withColumn("theta", theta)
      val redNum =
        col("nd") * col("syy") - col("sy") * col("sy") -
          col("theta") * (col("nd") * col("sxy") - col("sx") * col("sy"))
      w2.select(col("arm"), col("n_v").as("n_users"),
          (hop38(col("sy_v")) / col("n_v").cast(DoubleType)).as("raw_mean"),
          (hop38(col("sy_v")) / col("n_v").cast(DoubleType) -
            col("theta") * (hop38(col("sx_v")) / col("n_v").cast(DoubleType) -
              col("sx") / col("nd"))).as("adj_mean"),
          col("theta"),
          (lit(1.0) - redNum /
            (col("nd") * col("syy") - col("sy") * col("sy")))
            .as("var_reduction"))
        .orderBy("arm")
    }),

    // Poisson bootstrap CI of mean order value — THE scalable bootstrap
    // (resampling-with-replacement is a per-row Poisson(1) weight draw,
    // so B replicates are one ×B map-side explode + a B-key partial
    // aggregate; no per-replicate pass over the data, no driver
    // collect). Draws are deterministic integer arithmetic against
    // literal CDF thresholds; replicate means go exact-decimal →
    // string-hop → one shared IEEE division; the CI is percentile_disc
    // (exact element selection) over the 32-row replicate frame.
    "q_stats_bootstrap" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), D(col("o_totalprice")).as("v"))
      val drawn = o
        .withColumn("b", explode(sequence(lit(0L), lit(31L))))
        .withColumn("u",
          // Reduce the key mod 999983 BEFORE multiplying: the raw
          // product overflows int64 for keys above ~3.5e12, where Spark
          // wraps silently but DuckDB raises — the pre-reduction keeps
          // the draw identical at graded SFs and bounded at any scale.
          (((col("o_orderkey") % lit(999983L)) * lit(2654435L)
            + col("b") * lit(40503L))
            % lit(999983L)) * lit(4093L) % lit(1000000L))
        .withColumn("w",
          when(col("u") < PoisCdf(0), 0L)
            .when(col("u") < PoisCdf(1), 1L)
            .when(col("u") < PoisCdf(2), 2L)
            .when(col("u") < PoisCdf(3), 3L)
            .when(col("u") < PoisCdf(4), 4L)
            .when(col("u") < PoisCdf(5), 5L)
            .otherwise(6L))
      val reps = drawn.groupBy("b").agg(
          sum(col("w").cast(DecimalType(10, 0)) * col("v")).as("sw"),
          sum(col("w")).as("nw"))
        .select((hop38(col("sw")) / col("nw").cast(DoubleType)).as("mean_b"))
      val est = o.agg(count(lit(1)).as("n_orders"), sum(col("v")).as("sv"))
        .select(col("n_orders"),
          (hop38(col("sv")) / col("n_orders").cast(DoubleType)).as("est"))
      reps.agg(
          count(lit(1)).as("b_reps"),
          expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_b)")
            .as("ci_lo"),
          expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_b)")
            .as("ci_hi"))
        .crossJoin(broadcast(est))
        .select(col("b_reps"), col("n_orders"), col("est"),
          col("ci_lo"), col("ci_hi"))
        .orderBy("b_reps")
    }),

    // Discrete-time hazard of first conversion (survival analysis):
    // per user, relative hour of first purchase (event = "death") or
    // of last activity (censoring); deaths(h) and the at-risk set per
    // hour come from the ±1 interval-delta trick (the
    // q_ts_active_intervals precedent) — one tiny per-user aggregate,
    // then all windows ride the ~720-row hour spine, never the fact.
    // hazard = deaths/at_risk as one shared int-base IEEE division.
    "q_ts_hazard" -> ((s, dir) => tsHazard(s, dir)),

    // Linear multi-touch attribution: every purchase distributes one
    // unit of credit equally over the user's view/click/signup touches
    // in the 7 days before it. The conversion×touch pair frame is a
    // user-key equi-join with a time-range residual — per-user bounded
    // (events per user is a density property, not a table-size one),
    // the same posture as q_basket_lift. Credit shares are exact
    // integer micro-units (1e6 div n — no decimal division), so the
    // per-channel fold is an exact int64 sum.
    "q_attribution_linear" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        col("event_id"), unix_micros(col("ts_us")).as("tu"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("cid"),
          col("tu").as("ct"))
      val touch = ev
        .filter(col("event_type").isin("view", "click", "signup"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("tu").as("tt"))
      val pairs = conv.join(touch, Seq("user_id"))
        .filter(col("tt") < col("ct") &&
          col("tt") >= col("ct") - lit(LookbackUs))
      pairs
        .withColumn("n_touch",
          count(lit(1)).over(Window.partitionBy(col("cid"))))
        .withColumn("credit_micro", expr("1000000 div n_touch"))
        .groupBy("channel")
        .agg(countDistinct(col("cid")).as("conversions"),
          sum(col("credit_micro")).as("cm"))
        .select(col("channel"), col("conversions"),
          (col("cm").cast(DoubleType) / lit(1000000.0)).as("credit"))
        .orderBy("channel")
    }),

    // Positional phrase search ("table hash") over the token index —
    // the search-engine primitive an inverted index alone can't answer.
    // Tokens carry their 1-based position; the phrase is an equi-join
    // of the two posting lists on (doc_id, adjacent position) — O(df)
    // work per term, never a corpus scan, exactly how a positional
    // index evaluates phrases at scale.
    "q_text_phrase_search" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("term"))
      val a = toks.filter(col("term") === "table")
        .select(col("doc_id").as("da"), col("p").as("pa"))
      val b = toks.filter(col("term") === "hash")
        .select(col("doc_id").as("db"), col("p").as("pb"))
      a.join(b, col("da") === col("db") && col("pb") === col("pa") + 1)
        .groupBy(col("da").as("doc_id"))
        .agg(count(lit(1)).as("n_occur"),
          min(col("pa")).cast(LongType).as("first_pos"))
        .orderBy("doc_id")
    }),

    // Cross-document repeated-substring audit (the exact-substring
    // dedup signal of Lee et al.'s "Deduplicating Training Data"
    // shape): stride-20 40-char grams, grouped, kept where ≥2 distinct
    // docs share the gram. The stride compresses the shuffled frame to
    // |corpus|/20 grams; the group-by is a plain hash aggregate on the
    // gram key (at 100 TB one would hash the gram to 16 bytes first —
    // same shape, smaller key; kept raw here so the oracle can grade
    // the actual strings).
    "q_dedup_substring" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(length(col("text")) >= 40)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), length(col("text")) - lit(40), lit(20)))
            .as("p"))
        .select(col("doc_id"), expr("substring(text, p + 1, 40)").as("gram"))
        .groupBy("gram")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occur"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(100)
    })
  )

  /** The declared q_ts_hazard body. `cutUsers` cuts lineage at the
    * per-user exit/death ledger `u` — FOUR consumers (two ±1 delta
    * branches, deaths, the hour spine), each otherwise re-deriving the
    * events scan + per-user aggregate (4 corpus scans, r14 --rescans
    * sweep). Same ledger and same argument as
    * [[EvalGraphQueries.kaplanMeier]]: one narrow row per user, the
    * adopted r13 cut boundary (corpus pass × ≥3 consumers). Output
    * toggle-invariant (R14TogglesSpec).
    */
  private[graft] def tsHazard(s: org.apache.spark.sql.SparkSession,
      dir: String, cutUsers: Boolean = false): DataFrame = {
    val ev = events(s, dir).select(col("user_id"), col("event_type"),
      unix_micros(col("ts_us")).as("tu"))
    val uRaw = ev.groupBy("user_id").agg(
        min(col("tu")).as("t0"),
        max(col("tu")).as("t1"),
        min(when(col("event_type") === "purchase", col("tu"))).as("tp"))
      .select(col("user_id"),
        expr("(t1 - t0) div 3600000000").as("hu"),
        expr("(tp - t0) div 3600000000").as("fp"))
      .select(col("user_id"),
        coalesce(col("fp"), col("hu")).as("exit_h"),
        when(col("fp").isNotNull, 1L).otherwise(0L).as("death"))
    val u = if (cutUsers) cutLineage(uRaw) else uRaw
    val deltas = u.select(lit(0L).as("h"), lit(1L).as("d"))
      .unionAll(u.select((col("exit_h") + 1).as("h"), lit(-1L).as("d")))
      .groupBy("h").agg(sum(col("d")).as("delta"))
    val deaths = u.filter(col("death") === 1)
      .groupBy(col("exit_h").as("h")).agg(count(lit(1)).as("deaths"))
    val spine = u.agg(max(col("exit_h")).as("maxh"))
      .select(explode(sequence(lit(0L), col("maxh"))).as("h"))
    val byH = Window.orderBy("h")
    spine
      .join(deltas, Seq("h"), "left")
      .join(deaths, Seq("h"), "left")
      .withColumn("at_risk", sum(coalesce(col("delta"), lit(0L))).over(byH))
      .filter(col("at_risk") > 0)
      .select(col("h"),
        col("at_risk"),
        coalesce(col("deaths"), lit(0L)).as("deaths"),
        (coalesce(col("deaths"), lit(0L)).cast(DoubleType) /
          col("at_risk").cast(DoubleType)).as("hazard"))
      .orderBy("h")
  }

  val oracle: Map[String, String] = Map(
    "q_stats_prop_test" ->
      """WITH base AS (SELECT
        |    COUNT(*) FILTER (WHERE user_id % 2 = 0) n_a,
        |    CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0
        |      AND event_type = 'purchase') AS BIGINT) x_a,
        |    COUNT(*) FILTER (WHERE user_id % 2 = 1) n_b,
        |    CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1
        |      AND event_type = 'purchase') AS BIGINT) x_b
        |  FROM events),
        |p AS (SELECT n_a, x_a, n_b, x_b,
        |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) p_a,
        |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) p_b,
        |    CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) p_pool
        |  FROM base),
        |z AS (SELECT n_a, x_a, n_b, x_b, p_a, p_b, p_pool,
        |    (p_a - p_b) / sqrt(p_pool * (1.0e0 - p_pool)
        |      * (1.0e0 / CAST(n_a AS DOUBLE) + 1.0e0 / CAST(n_b AS DOUBLE)))
        |      z
        |  FROM p)
        |SELECT n_a, x_a, n_b, x_b, p_a, p_b, p_pool, z,
        |  CASE WHEN abs(z) > 1.96e0 THEN 1 ELSE 0 END significant
        |FROM z ORDER BY n_a""".stripMargin,

    "q_stats_cuped" ->
      s"""WITH per AS (SELECT user_id, user_id % 2 arm,
        |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(value AS DECIMAL(18,4))
        |      ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) x,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(value AS DECIMAL(18,4))
        |      ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) n_v,
        |    SUM(x) sx_v, SUM(y) sy_v,
        |    SUM(CAST(x * x AS DECIMAL(38,8))) sxx_v,
        |    SUM(CAST(x * y AS DECIMAL(38,8))) sxy_v,
        |    SUM(CAST(y * y AS DECIMAL(38,8))) syy_v
        |  FROM per GROUP BY arm),
        |w AS (SELECT arm, n_v, sx_v, sy_v,
        |    CAST(SUM(n_v) OVER () AS BIGINT) n,
        |    ${sqlHop38("SUM(sx_v) OVER ()")} sx,
        |    ${sqlHop38("SUM(sy_v) OVER ()")} sy,
        |    ${sqlHop38("SUM(sxx_v) OVER ()")} sxx,
        |    ${sqlHop38("SUM(sxy_v) OVER ()")} sxy,
        |    ${sqlHop38("SUM(syy_v) OVER ()")} syy
        |  FROM g),
        |w1 AS (SELECT *, CAST(n AS DOUBLE) nd FROM w),
        |w2 AS (SELECT *,
        |    (nd * sxy - sx * sy) / (nd * sxx - sx * sx) theta FROM w1)
        |SELECT arm, n_v n_users,
        |  ${sqlHop38("sy_v")} / CAST(n_v AS DOUBLE) raw_mean,
        |  ${sqlHop38("sy_v")} / CAST(n_v AS DOUBLE)
        |    - theta * (${sqlHop38("sx_v")} / CAST(n_v AS DOUBLE) - sx / nd)
        |    adj_mean,
        |  theta,
        |  1.0e0 - (nd * syy - sy * sy
        |      - theta * (nd * sxy - sx * sy)) / (nd * syy - sy * sy)
        |    var_reduction
        |FROM w2 ORDER BY arm""".stripMargin,

    "q_stats_bootstrap" ->
      s"""WITH o AS (SELECT o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,4)) v FROM orders),
        |drawn AS (SELECT o_orderkey, v, b,
        |    (((o_orderkey % 999983) * 2654435 + b * 40503) % 999983)
        |      * 4093 % 1000000 u
        |  FROM o, (SELECT unnest(generate_series(0, 31)) b)),
        |wts AS (SELECT b, v,
        |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |      WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
        |      ELSE 6 END w
        |  FROM drawn),
        |reps AS (SELECT b,
        |    SUM(CAST(w AS DECIMAL(10,0)) * v) sw,
        |    CAST(SUM(w) AS BIGINT) nw FROM wts GROUP BY b),
        |means AS (SELECT
        |    ${sqlHop38("sw")} / CAST(nw AS DOUBLE) mean_b FROM reps),
        |est AS (SELECT CAST(COUNT(*) AS BIGINT) n_orders,
        |    ${sqlHop38("SUM(v)")} / CAST(COUNT(*) AS DOUBLE) est FROM o)
        |SELECT CAST(COUNT(*) AS BIGINT) b_reps, n_orders, est,
        |  quantile_disc(mean_b, 0.025) ci_lo,
        |  quantile_disc(mean_b, 0.975) ci_hi
        |FROM means, est GROUP BY n_orders, est ORDER BY b_reps""".stripMargin,

    "q_ts_hazard" ->
      """WITH u0 AS (SELECT user_id,
        |    MIN(epoch_us(ts)) t0, MAX(epoch_us(ts)) t1,
        |    MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') tp
        |  FROM events GROUP BY 1),
        |u AS (SELECT user_id,
        |    COALESCE((tp - t0) // 3600000000,
        |             (t1 - t0) // 3600000000) exit_h,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END death FROM u0),
        |deltas AS (SELECT h, CAST(SUM(d) AS BIGINT) delta FROM (
        |    SELECT 0 h, 1 d FROM u
        |    UNION ALL SELECT exit_h + 1, -1 FROM u) GROUP BY h),
        |deaths AS (SELECT exit_h h, CAST(COUNT(*) AS BIGINT) deaths
        |  FROM u WHERE death = 1 GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(0, MAX(exit_h))) h FROM u),
        |r AS (SELECT s.h,
        |    CAST(SUM(COALESCE(dl.delta, 0)) OVER (ORDER BY s.h) AS BIGINT)
        |      at_risk,
        |    CAST(COALESCE(d.deaths, 0) AS BIGINT) deaths
        |  FROM spine s LEFT JOIN deltas dl ON dl.h = s.h
        |  LEFT JOIN deaths d ON d.h = s.h)
        |SELECT h, at_risk, deaths,
        |  CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE) hazard
        |FROM r WHERE at_risk > 0 ORDER BY h""".stripMargin,

    "q_attribution_linear" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) tu FROM events),
        |conv AS (SELECT user_id, event_id cid, tu ct FROM ev
        |  WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id, event_type channel, tu tt FROM ev
        |  WHERE event_type IN ('view', 'click', 'signup')),
        |pairs AS (SELECT c.cid, t.channel FROM conv c
        |  JOIN touch t ON c.user_id = t.user_id
        |  AND t.tt < c.ct AND t.tt >= c.ct - 604800000000),
        |credits AS (SELECT cid, channel,
        |    1000000 // (COUNT(*) OVER (PARTITION BY cid)) credit_micro
        |  FROM pairs)
        |SELECT channel,
        |  CAST(COUNT(DISTINCT cid) AS BIGINT) conversions,
        |  CAST(SUM(credit_micro) AS DOUBLE) / 1000000.0e0 credit
        |FROM credits GROUP BY channel ORDER BY channel""".stripMargin,

    "q_text_phrase_search" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) p,
        |    unnest(string_split(text, ' ')) term
        |  FROM documents),
        |a AS (SELECT doc_id, p pa FROM toks WHERE term = 'table'),
        |b AS (SELECT doc_id, p pb FROM toks WHERE term = 'hash')
        |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) n_occur,
        |  CAST(MIN(a.pa) AS BIGINT) first_pos
        |FROM a JOIN b ON a.doc_id = b.doc_id AND b.pb = a.pa + 1
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,

    "q_dedup_substring" ->
      """WITH pos AS (SELECT doc_id, text,
        |    unnest(generate_series(0, len(text) - 40, 20)) p
        |  FROM documents WHERE len(text) >= 40),
        |grams AS (SELECT doc_id, substr(text, CAST(p + 1 AS BIGINT), 40)
        |    gram FROM pos)
        |SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) n_docs,
        |  CAST(COUNT(*) AS BIGINT) n_occur
        |FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, gram LIMIT 100""".stripMargin
  )
}
