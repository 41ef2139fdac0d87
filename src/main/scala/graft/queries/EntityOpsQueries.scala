package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 entity-resolution / replication-audit / BI batch: blocked
  * fuzzy matching, order-independent table checksums, year-over-year
  * deltas, bidirectional nearest-event joins, and coverage-gap
  * reporting — the operational queries around a warehouse's core
  * analytics, each in its shuffle-bounded formulation.
  */
object EntityOpsQueries extends QSet {

  /** Edit-distance threshold for the fuzzy-match pass. */
  private val FuzzyDist = 2

  val queries: Map[String, QFn] = Map(
    // Blocked fuzzy entity matching (the dedup step of entity
    // resolution): candidate pairs only WITHIN a (brand, first-token)
    // block — the blocking key turns the quadratic all-pairs into
    // per-block quadratics bounded by block size, the standard ER
    // recall/cost trade and this query's DEFINED semantics (the oracle
    // applies the identical blocking). levenshtein is codegen'd on the
    // Spark side; the per-brand rollup keeps output at |brands| rows.
    "q_join_fuzzy_name" -> ((s, dir) => fuzzyName(s, dir)),

    // Order-independent table checksum per month partition (the
    // replication / cross-cluster sync audit): row-content signature =
    // bit_xor of an md5-derived int64 per row — xor commutes, so
    // partition order, merge order, and parallelism can never change
    // the signature — plus row count and the exact decimal money total.
    // One partial-agg pass; two sides of a replication pair compare
    // |months| tiny rows instead of rereading each other's data.
    "q_table_checksum" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          conv(substring(md5(concat_ws("|",
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))),
            1, 15), 16, 10).cast(LongType).as("sig"),
          col("o_totalprice"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(sig)").as("xor_sig"),
          d4(sum(D(col("o_totalprice")))).as("sum_total"))
        .orderBy("month")
    }),

    // Year-over-year revenue deltas on the month spine: the fact
    // collapses to ~80 month rows before the single unpartitioned
    // window (spine grows with TIME, not data), lag-12 pairs each month
    // with its prior-year sibling, and the growth ratio is ONE IEEE
    // division of two exactly-parsed decimal totals — emitted UNROUNDED
    // (the pagerank 4dp-half-way lesson: cosmetic rounds reintroduce
    // cross-engine hazards).
    "q_ts_yoy" -> ((s, dir) => {
      val m = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(d4(sum(D(col("o_totalprice")))).as("revenue"))
      val w = Window.orderBy(col("month"))
      m.withColumn("revenue_prev_year", lag(col("revenue"), 12).over(w))
        .withColumn("yoy_ratio",
          col("revenue") / col("revenue_prev_year"))
        .orderBy("month")
    }),

    // Bidirectional nearest-event join: each purchase paired with its
    // temporally closest click by the same user, in EITHER direction
    // (the attribution refinement over plain backward as-of). One
    // interleaved (user, time) window computes last-click-before and
    // first-click-after via IGNORE NULLS frames — no self-join at all,
    // so cost is one sort-window pass however large the stream; ties
    // resolve backward (the click already seen wins).
    "q_join_nearest" -> ((s, dir) => {
      val ev = events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts_us")).as("tsu"))
        .withColumn("click_id",
          when(col("event_type") === "click", col("event_id")))
        .withColumn("click_tsu",
          when(col("event_type") === "click", col("tsu")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("tsu"), col("event_id"))
      val back = w.rowsBetween(Window.unboundedPreceding, -1)
      val fwd = w.rowsBetween(1, Window.unboundedFollowing)
      ev.withColumn("prev_id", last(col("click_id"), true).over(back))
        .withColumn("prev_tsu", last(col("click_tsu"), true).over(back))
        .withColumn("next_id", first(col("click_id"), true).over(fwd))
        .withColumn("next_tsu", first(col("click_tsu"), true).over(fwd))
        .filter(col("event_type") === "purchase" &&
          (col("prev_id").isNotNull || col("next_id").isNotNull))
        .withColumn("use_back",
          col("next_id").isNull || (col("prev_id").isNotNull &&
            col("tsu") - col("prev_tsu") <= col("next_tsu") - col("tsu")))
        .select(col("event_id"), col("user_id"),
          when(col("use_back"), col("prev_id")).otherwise(col("next_id"))
            .as("nearest_click_id"),
          when(col("use_back"), col("tsu") - col("prev_tsu"))
            .otherwise(col("next_tsu") - col("tsu")).as("gap_us"))
        .orderBy("event_id")
    }),

    // Interval-overlap join: order pairs of the SAME customer whose
    // 30-day fulfillment windows [orderdate, orderdate+30d] overlap.
    // The pairing is an equi-join on the customer key — per-customer
    // order counts bound the quadratic, so candidate volume stays
    // Σ n_c² (linear-ish under bounded fan-out) at any table size; the
    // overlap test and day count are pure date arithmetic inside the
    // join, and NO time-bucket explode is needed because the entity key
    // already blocks the pairs.
    "q_join_interval_overlap" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate").cast(DateType).as("d0"))
        .withColumn("d1", date_add(col("d0"), 30))
      val a = o.select(col("o_custkey"), col("o_orderkey").as("k1"),
        col("d0").as("a0"), col("d1").as("a1"))
      val b = o.select(col("o_custkey"), col("o_orderkey").as("k2"),
        col("d0").as("b0"), col("d1").as("b1"))
      a.join(b, Seq("o_custkey"))
        .filter(col("k1") < col("k2") &&
          col("a0") <= col("b1") && col("b0") <= col("a1"))
        .select(col("o_custkey"), col("k1"), col("k2"),
          (datediff(least(col("a1"), col("b1")),
            greatest(col("a0"), col("b0"))) + 1).cast(LongType)
            .as("overlap_days"))
        .orderBy("o_custkey", "k1", "k2")
    }),

    // Coverage-gap report per event_type on the hourly grid: each
    // type's own [min, max] hour span vs hours actually present —
    // silent feed outages surface as missing hours. Span bounds are a
    // |types|-row aggregate; active-hour counts are distinct over the
    // (type, hour) projection; NO hour spine is ever materialized
    // (pure arithmetic from the bounds), so the query does zero
    // generate/explode work at any scale.
    "q_ts_gaps" -> ((s, dir) => {
      val hourly = events(s, dir)
        .select(col("event_type"),
          unix_micros(date_trunc("hour", col("ts_us"))).as("h"))
      hourly.groupBy("event_type")
        .agg(countDistinct(col("h")).as("n_hours_active"),
          (expr("(max(h) - min(h)) div 3600000000") + 1L)
            .as("n_hours_span"))
        .withColumn("n_gaps", col("n_hours_span") - col("n_hours_active"))
        .select("event_type", "n_hours_span", "n_hours_active", "n_gaps")
        .orderBy("event_type")
    })
  )

  /** The declared q_join_fuzzy_name body (see comments inline). */
  private[graft] def fuzzyName(s: org.apache.spark.sql.SparkSession,
      dir: String, shareFuzzyFrames: Boolean = false): DataFrame = {
      // Compress to DISTINCT names per block before pairing: duplicate
      // names are the norm in entity data, and pairing raw rows makes
      // per-block work quadratic in DUPLICATION (measured 112 s at the
      // 10×-duplicated sf1.0 vs 0.8 s at sf0.1 before this rewrite).
      // Distinct-name pairs × multiplicities reproduce the row-pair
      // counts EXACTLY: cross-name pairs contribute cnt_a·cnt_b,
      // same-name pairs (lev = 0 ≤ 2 always) contribute C(cnt, 2), and
      // involved-part counts are sums of multiplicities over matched
      // names — so comparisons now scale with distinct names per block
      // while the output is unchanged (oracle stays the raw self-join).
      // r13 optimization round (`shareFuzzyFrames`): `names` has four
      // consumers and `cross` three — unshared, the levenshtein block
      // join re-ran three times (9 part scans,
      // plans/r13/q_join_fuzzy_name_before.txt). Both frames are
      // bounded (distinct names / surviving fuzzy pairs) — but the
      // duo A/B at sf0.1 (7 rounds, B slots) REFUTED the persist
      // decisively: shared 1.05 s vs unshared 0.55 (+90%, the worst
      // loss of the six-query batch — the levenshtein block join
      // pipelines into its three consumers in parallel, while the
      // persist serializes everything behind one materialization).
      // Incumbent kept; toggle is the record (OPTIMIZATION_r13.md).
      val namesRaw = t(s, dir, "part")
        .select(col("p_brand"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("blk"))
        .groupBy("p_brand", "blk", "p_name")
        .agg(count(lit(1)).as("cnt"))
      val names = if (shareFuzzyFrames) namesRaw.persist() else namesRaw
      val a = names.select(col("p_brand"), col("blk"),
        col("p_name").as("n1"), col("cnt").as("c1"))
      val b = names.select(col("p_brand"), col("blk"),
        col("p_name").as("n2"), col("cnt").as("c2"))
      val crossRaw = a.join(b, Seq("p_brand", "blk"))
        .filter(col("n1") < col("n2") &&
          levenshtein(col("n1"), col("n2")) <= FuzzyDist)
      val cross = if (shareFuzzyFrames) crossRaw.persist() else crossRaw
      val pairCounts = cross
        .select(col("p_brand"), (col("c1") * col("c2")).as("np"))
        .unionAll(names.filter(col("cnt") >= 2)
          .select(col("p_brand"),
            expr("cnt * (cnt - 1) div 2").as("np")))
        .groupBy("p_brand").agg(sum(col("np")).as("n_pairs"))
      val involved = cross.select(col("p_brand"), col("n1").as("p_name"))
        .unionAll(cross.select(col("p_brand"), col("n2").as("p_name")))
        .unionAll(names.filter(col("cnt") >= 2)
          .select(col("p_brand"), col("p_name")))
        .distinct()
      val partCounts = involved
        .join(names.select("p_brand", "p_name", "cnt"),
          Seq("p_brand", "p_name"))
        .groupBy("p_brand").agg(sum(col("cnt")).as("n_parts"))
      pairCounts.join(partCounts, "p_brand")
        .orderBy("p_brand")
  }

  val oracle: Map[String, String] = Map(
    "q_join_fuzzy_name" ->
      s"""WITH p AS (
        |  SELECT p_partkey, p_brand, p_name,
        |    string_split(p_name, ' ')[1] AS blk
        |  FROM part),
        |pairs AS (
        |  SELECT a.p_brand, a.p_partkey AS k1, b.p_partkey AS k2
        |  FROM p a JOIN p b
        |    ON a.p_brand = b.p_brand AND a.blk = b.blk
        |    AND a.p_partkey < b.p_partkey
        |    AND levenshtein(a.p_name, b.p_name) <= ${FuzzyDist})
        |SELECT np.p_brand, np.n_pairs, nk.n_parts
        |FROM (SELECT p_brand, COUNT(*) AS n_pairs FROM pairs
        |      GROUP BY p_brand) np
        |JOIN (SELECT p_brand, COUNT(DISTINCT k) AS n_parts
        |      FROM (SELECT p_brand, unnest([k1, k2]) AS k FROM pairs)
        |      GROUP BY p_brand) nk
        |  ON np.p_brand = nk.p_brand
        |ORDER BY np.p_brand""".stripMargin,

    "q_table_checksum" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  COUNT(*) AS n_rows,
        |  bit_xor(CAST(concat('0x', substr(md5(
        |    o_orderkey || '|' || o_custkey || '|' || o_orderstatus),
        |    1, 15)) AS BIGINT)) AS xor_sig,
        |  CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_total
        |FROM orders
        |GROUP BY 1 ORDER BY month""".stripMargin,

    "q_ts_yoy" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue,
        |  lag(revenue, 12) OVER (ORDER BY month) AS revenue_prev_year,
        |  revenue / lag(revenue, 12) OVER (ORDER BY month) AS yoy_ratio
        |FROM m ORDER BY month""".stripMargin,

    "q_join_nearest" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu,
        |    CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |    CASE WHEN event_type = 'click' THEN epoch_us(ts) END
        |      AS click_tsu
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |x AS (
        |  SELECT event_id, user_id, event_type, tsu,
        |    last_value(click_id IGNORE NULLS) OVER wb AS prev_id,
        |    last_value(click_tsu IGNORE NULLS) OVER wb AS prev_tsu,
        |    first_value(click_id IGNORE NULLS) OVER wf AS next_id,
        |    first_value(click_tsu IGNORE NULLS) OVER wf AS next_tsu
        |  FROM ev
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    wf AS (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |y AS (
        |  SELECT event_id, user_id,
        |    (next_id IS NULL OR (prev_id IS NOT NULL AND
        |      tsu - prev_tsu <= next_tsu - tsu)) AS use_back,
        |    prev_id, next_id, tsu, prev_tsu, next_tsu
        |  FROM x
        |  WHERE event_type = 'purchase'
        |    AND (prev_id IS NOT NULL OR next_id IS NOT NULL))
        |SELECT event_id, user_id,
        |  CASE WHEN use_back THEN prev_id ELSE next_id END
        |    AS nearest_click_id,
        |  CASE WHEN use_back THEN tsu - prev_tsu ELSE next_tsu - tsu END
        |    AS gap_us
        |FROM y ORDER BY event_id""".stripMargin,

    "q_join_interval_overlap" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d0,
        |    CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS d1
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
        |  date_diff('day',
        |    greatest(a.d0, b.d0),
        |    CAST(least(a.d1, b.d1) AS DATE)) + 1 AS overlap_days
        |FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderkey < b.o_orderkey
        |  AND a.d0 <= b.d1 AND b.d0 <= a.d1
        |ORDER BY a.o_custkey, k1, k2""".stripMargin,

    "q_ts_gaps" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS h
        |  FROM events)
        |SELECT event_type,
        |  (MAX(h) - MIN(h)) // 3600000000 + 1 AS n_hours_span,
        |  COUNT(DISTINCT h) AS n_hours_active,
        |  (MAX(h) - MIN(h)) // 3600000000 + 1
        |    - COUNT(DISTINCT h) AS n_gaps
        |FROM hourly
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
