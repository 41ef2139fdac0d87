package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 scale-technique operators: each query is a 100 TB-shaped
  * reformulation of a pattern that is usually written in a way that
  * does not scale, graded for exactness against the naive formulation
  * as its DuckDB oracle.
  *
  *  - top-k per group as a BOUNDED-STATE mergeable aggregate (vs the
  *    shuffle-everything window sort),
  *  - bitmap exact-distinct (vs the double-shuffle COUNT DISTINCT),
  *  - Z-order layout clustering (the multi-dim scan-pruning layout),
  *  - Pareto skyline via a days-spine running max (vs the O(n²)
  *    NOT EXISTS self-join),
  *  - per-group linear regression and lag-1 autocorrelation from
  *    one-pass decimal moment sums (vs iterative/driver-side stats).
  */
object ScaleOpsQueries extends QSet {

  /** Exact decimal sum emitted as the identical double on both engines
    * (through the digit string — SURVEY.md A.8). */
  private def sd(c: Column): Column =
    sum(c).cast(StringType).cast(DoubleType)

  /** Z-order bit interleave of two non-negative int64 keys, `bits` bits
    * each: z = Σ_i bit_i(a)·4^i + 2·bit_i(b)·4^i. Generated as pure
    * integer arithmetic (div/mod/×/+) so the SAME formula runs on both
    * engines with no shift-operator dialect risk. */
  private val ZBits = 21 // covers keys < 2^21 = 2,097,152 (partkey @ SF 100)

  private def zExpr(a: String, b: String, divOp: String): String =
    (0 until ZBits).map { i =>
      val p = 1L << i; val c = 1L << (2 * i)
      s"((($a $divOp $p) % 2) * $c + (($b $divOp $p) % 2) * ${2 * c})"
    }.mkString(" + ")

  val queries: Map[String, QFn] = Map(
    // Rolling top-3 inside a sliding event window via the SAME bounded
    // TopKAgg used as a WINDOW function: state per frame is ≤ k entries
    // where collect_list materializes all 10 — the custom-window-
    // aggregate extension point (public functions.udaf API, no Catalyst
    // internals), exact against a self-join + rank oracle.
    "q_win_custom_topk" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAgg(3))
      val w = Window.partitionBy("user_id")
        .orderBy(col("tsu"), col("event_id")).rowsBetween(-9, 0)
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts_us")).as("tsu"), col("value"))
        .withColumn("tk", topk(col("value"), col("event_id")).over(w))
        .select(col("user_id"), col("event_id"), col("tsu"),
          array_join(transform(col("tk"), e => e.getField("id")), ",")
            .as("top3_ids"))
        .orderBy("user_id", "tsu", "event_id")
    }),

    // Top-3 orders per customer via the bounded-heap TopKAgg Aggregator
    // (functions/TopK.scala): partial buffers carry ≤ 3 entries per
    // group to the exchange, where the window formulation ships and
    // sorts EVERY row of the group. The (price DESC, orderkey ASC)
    // total order makes merge-order irrelevant — exact vs the window
    // oracle.
    "q_topk_group_agg" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAgg(3))
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
        .select(col("o_custkey"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("o_custkey"), (col("p") + 1).cast(LongType).as("rk"),
          col("e.id").as("o_orderkey"), col("e.v").as("o_totalprice"))
        .orderBy("o_custkey", "rk")
    }),

    // K-minimum-values quantile sketch (KmvAgg): a bounded mergeable
    // uniform row sample per group — ≤ 128 entries of partial state
    // where exact percentiles shuffle every row of the group to one
    // task. Determinism via md5-of-row-key sampling makes the sketch
    // REPLAYABLE in plain SQL (bottom-k window), so the custom
    // Aggregator is graded exact against that independent formulation,
    // like q_topk_group_agg. Estimates are the sample's disc-quantiles.
    "q_agg_quantile_sketch" -> ((s, dir) => {
      val sk = udaf(new graft.functions.KmvAgg(128))
      events(s, dir)
        .select(col("event_type"),
          md5(col("event_id").cast("string")).as("h"), col("value"))
        .groupBy(col("event_type"))
        .agg(sk(col("h"), col("value")).as("sample"),
          count(lit(1)).as("n_rows"))
        .select(col("event_type"), col("n_rows"),
          size(col("sample")).cast(LongType).as("n_sample"),
          expr("element_at(sample, cast(ceil(0.5 * size(sample)) as int))")
            .as("p50_est"),
          expr("element_at(sample, cast(ceil(0.9 * size(sample)) as int))")
            .as("p90_est"))
        .orderBy("event_type")
    }),

    // Theta-sketch distinct INTERSECTION (KmvDistinctAgg): the
    // approximate twin of q_agg_bitmap_overlap's exact bitmap AND —
    // audience-overlap matrices when the audiences no longer fit a
    // bitmap. Per type, a bounded sketch of the k=256 smallest
    // DISTINCT user hashes; per pair, θ = min of the two kth minima
    // and |A∩B| ≈ |common hashes < θ| / θ — EXACT whenever both
    // audiences are under k (the graded sf0.001/0.01 regime; sf0.1
    // exercises the estimating regime deterministically). Every step
    // is replayable SQL (bottom-k-distinct window + the same IEEE
    // arithmetic), so even the approximate regime is DuckDB-graded
    // bit-for-bit.
    "q_agg_theta_intersect" -> ((s, dir) => {
      val K = 256
      val sk = udaf(new graft.functions.KmvDistinctAgg(K))
      val samples = events(s, dir)
        .select(col("event_type"),
          md5(col("user_id").cast("string")).as("h"))
        .groupBy("event_type").agg(sk(col("h")).as("smp"))
        .select(col("event_type"), col("smp"),
          when(size(col("smp")) < K, lit(1.0)).otherwise(
            expr(s"cast(conv(substr(element_at(smp, $K), 1, 15), 16, 10) " +
              "as bigint)").cast(DoubleType) / 1152921504606846976.0d)
            .as("theta"))
      val a = samples.select(col("event_type").as("t1"),
        col("smp").as("sa"), col("theta").as("tha"))
      val b = samples.select(col("event_type").as("t2"),
        col("smp").as("sb"), col("theta").as("thb"))
      a.crossJoin(broadcast(b)).filter(col("t1") < col("t2"))
        .withColumn("theta", least(col("tha"), col("thb")))
        .withColumn("common", expr(
          "cast(size(filter(array_intersect(sa, sb), x -> " +
            "cast(conv(substr(x, 1, 15), 16, 10) as bigint) / " +
            "1152921504606846976.0d < theta)) as bigint)"))
        .select(col("t1"), col("t2"),
          size(col("sa")).cast(LongType).as("n_a"),
          size(col("sb")).cast(LongType).as("n_b"),
          col("common"),
          (col("common").cast(DoubleType) / col("theta"))
            .as("est_intersect"))
        .orderBy("t1", "t2")
    }),

    // Exact distinct users per event_type via 64-bit bitmap OR-folding:
    // bucket = user_id div 64, one BIGINT bitmap per (group, bucket),
    // popcount-summed. Each side of the two aggregations folds map-side
    // (bit_or and sum are both partial-agg friendly), where
    // COUNT(DISTINCT) plans an Expand + full-width distinct shuffle.
    // The bitmap is the repeated-distinct/bitmap-index building block;
    // graded exact against the plain COUNT DISTINCT oracle.
    "q_agg_bitmap_distinct" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"), col("user_id"))
        .groupBy(col("event_type"), expr("user_id div 64").as("bk"))
        .agg(expr("bit_or(shiftleft(1L, cast(user_id % 64 as int)))")
          .as("bm"))
        .groupBy(col("event_type"))
        .agg(sum(expr("bit_count(bm)")).cast(LongType).as("n_users"))
        .orderBy("event_type")
    }),

    // Audience-overlap matrix: distinct users active in BOTH of every
    // event-type pair, via per-(type, bucket) 64-bit bitmaps AND-folded
    // bucket-by-bucket — the bitmap-index intersection that answers all
    // 10 pairs from ONE compact structure, where COUNT DISTINCT over an
    // INTERSECT would re-shuffle the raw stream per pair. The bucket
    // join keys on bucket id (type² × |buckets| rows total), popcounts
    // sum map-side; exact by construction, graded against the
    // distinct-pair self-join oracle.
    "q_agg_bitmap_overlap" -> ((s, dir) => {
      val bm = events(s, dir)
        .groupBy(col("event_type").as("t"), expr("user_id div 64").as("bk"))
        .agg(expr("bit_or(shiftleft(1L, cast(user_id % 64 as int)))")
          .as("bm"))
      val a = bm.select(col("t").as("t1"), col("bk"), col("bm").as("b1"))
      val b = bm.select(col("t").as("t2"), col("bk"), col("bm").as("b2"))
      a.join(b, Seq("bk"))
        .filter(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(sum(expr("bit_count(b1 & b2)")).cast(LongType).as("n_both"))
        .orderBy("t1", "t2")
    }),

    // Z-order layout audit: interleave (l_partkey, l_suppkey) bits into
    // one clustering key, split its range into 32 equal-width buckets,
    // and report per-bucket min/max of BOTH keys — exactly the
    // file-footer stats a Z-ordered rewrite gives a 100 TB scan: narrow
    // per-file ranges on EVERY interleaved dimension mean predicates on
    // either key skip most files (a single-key sort only prunes one).
    // All-integer arithmetic; the range split uses the exact max z.
    "q_layout_zorder" -> ((s, dir) => {
      val z = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .withColumn("zval", expr(zExpr("l_partkey", "l_suppkey", "div")))
      val zmax = z.agg(max(col("zval")).as("zmax"))
      z.crossJoin(zmax)
        .withColumn("bucket", expr("(zval * 32) div (zmax + 1)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"),
          min(col("zval")).as("z_min"), max(col("zval")).as("z_max"))
        .orderBy("bucket")
    }),

    // Pareto skyline of orders (maximize o_totalprice, minimize
    // o_orderdate): a row survives iff no earlier-or-same-date order
    // has ≥ price with one strict. The naive NOT EXISTS self-join is
    // O(n²); this plans as (1) per-day max — an ordinary partial-agg
    // aggregate, (2) a running strictly-before-day max over the DAYS
    // spine (thousands of rows however large the fact is), (3) a join
    // back. The only global window runs on the day spine, not the fact.
    "q_skyline_pareto" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          datediff(col("o_orderdate").cast(DateType),
            lit(java.sql.Date.valueOf("1995-01-01"))).cast(LongType)
            .as("day"))
      val daily = o.groupBy(col("day"))
        .agg(max(col("o_totalprice")).as("day_max"))
      val wPrev = Window.orderBy(col("day"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val spine = daily.withColumn("prev_max",
        max(col("day_max")).over(wPrev))
      o.join(spine, "day")
        .filter(col("o_totalprice") === col("day_max") &&
          (col("prev_max").isNull ||
            col("o_totalprice") > col("prev_max")))
        .select(col("o_orderkey"), col("day"), col("o_totalprice"))
        .orderBy("day", "o_orderkey")
    }),

    // Per-event_type linear regression of value on time (hours since
    // 2024-01-01): slope/intercept/r² from ONE aggregation pass of
    // exact decimal moment sums (x rounds 6dp first — both engines sum
    // identical decimals in any order), final arithmetic one identical
    // IEEE expression per stat. The distributed-regression shape: no
    // iteration, no driver-side math.
    "q_stats_linreg" -> ((s, dir) => {
      val x = round((unix_micros(col("ts_us")) - lit(1704067200000000L))
        .cast(DoubleType) / lit(3.6e9), 6)
      val ev = events(s, dir).select(col("event_type"),
        x.as("x"), col("value").as("y"))
      val xd = col("x").cast(DecimalType(12, 6))
      val yd = col("y").cast(DecimalType(19, 4))
      val n = count(lit(1))
      val sx = sd(col("x").cast(DecimalType(12, 6)))
      val sy = sd(D(col("y")))
      val sxx = sd((xd * xd).cast(DecimalType(30, 12)))
      val syy = sd((yd * yd).cast(DecimalType(28, 4)))
      val sxy = sd((xd * yd).cast(DecimalType(34, 10)))
      ev.groupBy(col("event_type"))
        .agg(n.as("n"), sx.as("sx"), sy.as("sy"), sxx.as("sxx"),
          syy.as("syy"), sxy.as("sxy"))
        .select(col("event_type"), col("n"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))).as("slope"),
          (col("sy") / col("n") -
            (col("sxy") - col("sx") * col("sy") / col("n")) /
              (col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("sx") / col("n"))).as("intercept"),
          (((col("sxy") - col("sx") * col("sy") / col("n")) *
            (col("sxy") - col("sx") * col("sy") / col("n"))) /
            ((col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("syy") - col("sy") * col("sy") / col("n")))).as("r2"))
        .orderBy("event_type")
    }),

    // Lag-1 autocorrelation of each event_type's DAILY total series:
    // day totals from exact decimal sums (deterministic inputs), pairs
    // via lag over the per-type day spine, Pearson over the pairs from
    // decimal moment sums. The day spine is one row per (type, day) —
    // the window cost is bounded by days, not events.
    "q_ts_autocorr" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts_us")).cast(DateType).as("day"))
        .agg(d4(sum(D(col("value")))).as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val pairs = daily
        .withColumn("y", lag(col("x"), 1).over(w))
        .filter(col("y").isNotNull)
      val xd = col("x").cast(DecimalType(19, 4))
      val yd = col("y").cast(DecimalType(19, 4))
      val n = count(lit(1))
      val sx = sd(xd)
      val sy = sd(yd)
      val sxx = sd((xd * xd).cast(DecimalType(38, 8)))
      val syy = sd((yd * yd).cast(DecimalType(38, 8)))
      val sxy = sd((xd * yd).cast(DecimalType(38, 8)))
      pairs.groupBy(col("event_type"))
        .agg(n.as("n_pairs"), sx.as("sx"), sy.as("sy"), sxx.as("sxx"),
          syy.as("syy"), sxy.as("sxy"))
        .select(col("event_type"), col("n_pairs"),
          ((col("sxy") - col("sx") * col("sy") / col("n_pairs")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n_pairs")) *
              (col("syy") - col("sy") * col("sy") / col("n_pairs"))))
            .as("autocorr"))
        .orderBy("event_type")
    }),

    // Day-of-week seasonality index per event_type: mean daily total on
    // each ISO weekday relative to the type's overall mean daily total.
    // Exactness: daily totals are exact 4dp decimals; BOTH aggregation
    // levels stay decimal (the type-level totals are window-sums of the
    // ≤7 dow rows), and the index is one identical IEEE expression of
    // two exact ratios. The only window runs on the (type × dow) frame
    // — 35 rows however large the fact is.
    "q_ts_seasonality" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts_us")).cast(DateType).as("day"))
        .agg(sum(D(col("value"))).as("x"))
      val dow = daily
        .groupBy(col("event_type"),
          expr("cast(weekday(day) + 1 as bigint)").as("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).cast(DecimalType(28, 4)).as("sx"))
      val wt = Window.partitionBy(col("event_type"))
      dow
        .withColumn("n_all", sum(col("n_days")).over(wt))
        .withColumn("s_all",
          sum(col("sx")).over(wt).cast(DecimalType(32, 4)))
        .select(col("event_type"), col("dow"), col("n_days"),
          // exact-decimal → double BEFORE dividing: decimal division
          // scale/rounding rules differ across engines, one IEEE double
          // division doesn't (SURVEY.md A.2/A.8)
          (col("sx").cast(StringType).cast(DoubleType) / col("n_days"))
            .as("dow_mean"),
          ((col("sx").cast(StringType).cast(DoubleType) * col("n_all")) /
            (col("n_days") *
              col("s_all").cast(StringType).cast(DoubleType)))
            .as("season_idx"))
        .orderBy("event_type", "dow")
    }),

    // Equi-depth (decile) histogram of o_totalprice — the stats a
    // cost-based optimizer collects: exact interpolated decile bounds
    // (one 9-element row), each row's bucket = #bounds strictly below
    // its price via a higher-order fold over the broadcast bounds.
    // Near-equal per-bucket counts are the equi-depth property; min/max
    // per bucket are the zone boundaries. One pass for bounds, one for
    // counts.
    "q_stats_equidepth" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_totalprice"))
      val bounds = o.agg(expr(
        "percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("bs"))
      o.crossJoin(broadcast(bounds))
        .withColumn("bucket", expr(
          "cast(aggregate(bs, 0, (acc, b) -> " +
            "acc + if(o_totalprice > b, 1, 0)) as bigint)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("p_min"),
          max(col("o_totalprice")).as("p_max"))
        .orderBy("bucket")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_custom_topk" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |j AS (
        |  SELECT a.user_id, a.event_id AS eid, a.tsu,
        |    b.event_id AS bid,
        |    row_number() OVER (PARTITION BY a.user_id, a.event_id
        |      ORDER BY b.value DESC, b.event_id) AS rk
        |  FROM e a JOIN e b ON a.user_id = b.user_id
        |    AND b.rn BETWEEN a.rn - 9 AND a.rn)
        |SELECT user_id, eid AS event_id, tsu,
        |  string_agg(bid, ',' ORDER BY rk) AS top3_ids
        |FROM j WHERE rk <= 3
        |GROUP BY user_id, eid, tsu
        |ORDER BY user_id, tsu, event_id""".stripMargin,

    "q_topk_group_agg" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,

    // the theta sketch replayed as a bottom-k-distinct window + the
    // identical IEEE threshold/ratio arithmetic
    "q_agg_theta_intersect" ->
      """WITH du AS (
        |  SELECT DISTINCT event_type,
        |    md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |rk AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM du),
        |smp AS (SELECT event_type, h, rn, nd FROM rk WHERE rn <= 256),
        |th AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CASE WHEN MAX(nd) < 256 THEN 1.0
        |      ELSE MAX(CASE WHEN rn = 256 THEN
        |        CAST(CAST(concat('0x', substr(h, 1, 15)) AS BIGINT)
        |          AS DOUBLE) / 1152921504606846976.0 END) END AS theta
        |  FROM smp GROUP BY event_type),
        |pairs AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2,
        |    a.n AS n_a, b.n AS n_b,
        |    least(a.theta, b.theta) AS theta
        |  FROM th a JOIN th b ON a.event_type < b.event_type),
        |cm AS (
        |  SELECT p.t1, p.t2, COUNT(*) AS common
        |  FROM pairs p
        |  JOIN smp sa ON sa.event_type = p.t1
        |  JOIN smp sb ON sb.event_type = p.t2 AND sb.h = sa.h
        |  WHERE CAST(CAST(concat('0x', substr(sa.h, 1, 15)) AS BIGINT)
        |      AS DOUBLE) / 1152921504606846976.0 < p.theta
        |  GROUP BY 1, 2)
        |SELECT p.t1, p.t2, p.n_a, p.n_b,
        |  CAST(COALESCE(c.common, 0) AS BIGINT) AS common,
        |  CAST(COALESCE(c.common, 0) AS DOUBLE) / p.theta
        |    AS est_intersect
        |FROM pairs p LEFT JOIN cm c ON c.t1 = p.t1 AND c.t2 = p.t2
        |ORDER BY p.t1, p.t2""".stripMargin,

    // the sketch replayed as a window: same bottom-128-by-md5 sample,
    // same element-at-ceil(p·n) disc-quantile convention
    "q_agg_quantile_sketch" ->
      """WITH s AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_rows
        |  FROM events),
        |samp AS (
        |  SELECT event_type, value, n_rows,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value) AS vrn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_sample
        |  FROM s WHERE rn <= 128)
        |SELECT event_type,
        |  MAX(n_rows) AS n_rows,
        |  COUNT(*) AS n_sample,
        |  MAX(CASE WHEN vrn = CAST(ceil(0.5 * n_sample) AS INT)
        |    THEN value END) AS p50_est,
        |  MAX(CASE WHEN vrn = CAST(ceil(0.9 * n_sample) AS INT)
        |    THEN value END) AS p90_est
        |FROM samp GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_agg_bitmap_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_bitmap_overlap" ->
      """WITH du AS (
        |  SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS t1, b.event_type AS t2,
        |  COUNT(*) AS n_both
        |FROM du a JOIN du b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY t1, t2""".stripMargin,

    "q_layout_zorder" ->
      s"""WITH z AS (
        |  SELECT l_partkey, l_suppkey,
        |    ${zExpr("l_partkey", "l_suppkey", "//")} AS zval
        |  FROM lineitem),
        |m AS (SELECT MAX(zval) AS zmax FROM z)
        |SELECT (zval * 32) // (zmax + 1) AS bucket, COUNT(*) AS n,
        |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
        |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max,
        |  MIN(zval) AS z_min, MAX(zval) AS z_max
        |FROM z, m
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_skyline_pareto" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice,
        |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      AS day
        |  FROM orders),
        |daily AS (SELECT day, MAX(o_totalprice) AS day_max
        |          FROM o GROUP BY day),
        |spine AS (
        |  SELECT day, day_max,
        |    MAX(day_max) OVER (ORDER BY day
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max
        |  FROM daily)
        |SELECT o.o_orderkey, o.day, o.o_totalprice
        |FROM o JOIN spine s ON o.day = s.day
        |WHERE o.o_totalprice = s.day_max
        |  AND (s.prev_max IS NULL OR o.o_totalprice > s.prev_max)
        |ORDER BY o.day, o.o_orderkey""".stripMargin,

    "q_stats_linreg" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    round(CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE)
        |      / 3600000000.0, 6) AS x,
        |    value AS y
        |  FROM events),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(12,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(12,6)) * CAST(x AS DECIMAL(12,6)) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(12,6)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(34,10))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, n,
        |  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
        |  sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n)
        |    AS intercept,
        |  ((sxy - sx * sy / n) * (sxy - sx * sy / n)) /
        |    ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
        |FROM m ORDER BY event_type""".stripMargin,

    "q_ts_autocorr" ->
      s"""WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    ${sqlD4("SUM(CAST(value AS DECIMAL(18,4)))")} AS x
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT event_type, x,
        |    lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM daily),
        |p AS (SELECT * FROM pairs WHERE y IS NOT NULL),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n_pairs,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM p GROUP BY event_type)
        |SELECT event_type, n_pairs,
        |  (sxy - sx * sy / n_pairs) /
        |    sqrt((sxx - sx * sx / n_pairs) * (syy - sy * sy / n_pairs))
        |    AS autocorr
        |FROM m ORDER BY event_type""".stripMargin,

    "q_ts_seasonality" ->
      s"""WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS x
        |  FROM events GROUP BY 1, 2),
        |dw AS (
        |  SELECT event_type, isodow(day) AS dow, COUNT(*) AS n_days,
        |    CAST(SUM(x) AS DECIMAL(28,4)) AS sx
        |  FROM daily GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, dow, n_days, sx,
        |    SUM(n_days) OVER (PARTITION BY event_type) AS n_all,
        |    CAST(SUM(sx) OVER (PARTITION BY event_type) AS DECIMAL(32,4))
        |      AS s_all
        |  FROM dw)
        |SELECT event_type, dow, n_days,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n_days AS dow_mean,
        |  (CAST(CAST(sx AS VARCHAR) AS DOUBLE) * n_all) /
        |    (n_days * CAST(CAST(s_all AS VARCHAR) AS DOUBLE)) AS season_idx
        |FROM tot ORDER BY event_type, dow""".stripMargin,

    "q_stats_equidepth" ->
      """WITH b AS (
        |  SELECT quantile_cont(o_totalprice,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
        |  FROM orders)
        |SELECT CAST(list_sum(list_transform(bs,
        |    b2 -> CASE WHEN o_totalprice > b2 THEN 1 ELSE 0 END))
        |    AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(o_totalprice) AS p_min,
        |  MAX(o_totalprice) AS p_max
        |FROM orders, b
        |GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
