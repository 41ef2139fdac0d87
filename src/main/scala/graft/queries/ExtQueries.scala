package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Surface extensions beyond the SURVEY.md §2 baseline inventory:
  * bivariate/higher-moment statistics, value-range window frames,
  * distribution window functions, multiset set-ops, right outer join,
  * extended string/bit/hash scalar families, inter-event time-series
  * deltas, normalized-key dedup, and limit/offset pagination.
  *
  * Same cross-engine discipline as every other bundle: exact decimal
  * accumulation, final doubles parsed from the exact decimal string,
  * BIGINT-cast integer sums, total-order final sorts, no decimal/array
  * dtypes in any output column.
  */
object ExtQueries extends QSet {

  private val D19 = DecimalType(19, 4)
  private val D28 = DecimalType(28, 4)

  /** Exact decimal sum emitted as the identical double on both engines. */
  private def sd(c: org.apache.spark.sql.Column) =
    sum(c).cast(StringType).cast(DoubleType)

  val queries: Map[String, QFn] = Map(
    // Bivariate statistics from exact decimal moments — the built-in
    // corr/covar are order-dependent double folds, so both engines
    // derive them from the same five exact sums with the same IEEE
    // expression shape (the q_agg_stats recipe, bivariate).
    "q_agg_corr" -> ((s, dir) => {
      val x = col("l_quantity").cast(D19)
      val y = col("l_extendedprice").cast(D19)
      val n = count(lit(1))
      val sx = sd(D(col("l_quantity")))
      val sy = sd(D(col("l_extendedprice")))
      val sxx = sd((x * x).cast(D28))
      val syy = sd((y * y).cast(D28))
      val sxy = sd((x * y).cast(D28))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(n.as("n"), sx.as("sx"), sy.as("sy"),
          sxx.as("sxx"), syy.as("syy"), sxy.as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
            .as("covar_samp"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("syy") - col("sy") * col("sy") / col("n"))))
            .as("corr"))
        .orderBy("l_returnflag")
    }),

    // Deterministic mode: most frequent value, smallest value on ties —
    // engine-native mode() has impl-defined ties, so both engines use
    // the identical count+window formulation.
    "q_agg_mode" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("cnt"))
        .orderBy("l_returnflag")
    }),

    // Skewness / excess kurtosis from exact central-moment sums.
    // l_discount is 2dp so its 2nd/3rd/4th powers are exact at 4/6/8dp;
    // no transcendentals (pow is not correctly rounded everywhere —
    // m2^1.5 is spelled m2*sqrt(m2), sqrt IS exact IEEE).
    "q_agg_skew_kurt" -> ((s, dir) => {
      // Tight operand widths: l_discount ≤ 0.1 at 2dp, so every power
      // fits these scales EXACTLY and no product exceeds precision 38
      // (wider operands make p1+p2+1 > 38 and the two engines clamp the
      // overflow differently — measured as a macroscopic r4 divergence).
      val d = col("l_discount").cast(DecimalType(9, 4))
      val d2 = (d * d).cast(DecimalType(9, 4))
      val d3 = (d2 * d).cast(DecimalType(12, 6))
      val d4p = (d2 * d2).cast(DecimalType(14, 8))
      val n = count(lit(1)).cast(DoubleType)
      val s1 = sd(D(col("l_discount"))) // Σx
      val s2 = sd(d2) // Σx²
      val s3 = sd(d3) // Σx³
      val s4 = sd(d4p) // Σx⁴
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), (s1 / n).as("mean"),
          (s2 / n).as("r2"), (s3 / n).as("r3"), (s4 / n).as("r4"))
        .select(col("l_returnflag"), col("n"),
          ((col("r3") - lit(3) * col("mean") * col("r2") +
            lit(2) * col("mean") * col("mean") * col("mean")) /
            ((col("r2") - col("mean") * col("mean")) *
              sqrt(col("r2") - col("mean") * col("mean"))))
            .as("skewness"),
          ((col("r4") - lit(4) * col("mean") * col("r3") +
            lit(6) * col("mean") * col("mean") * col("r2") -
            lit(3) * col("mean") * col("mean") * col("mean") * col("mean")) /
            ((col("r2") - col("mean") * col("mean")) *
              (col("r2") - col("mean") * col("mean"))) - lit(3))
            .as("kurtosis_excess"))
        .orderBy("l_returnflag")
    }),

    // Value-range window frame (7-day revenue per customer): the frame
    // is defined by ORDER-key VALUES, not row positions — same-day ties
    // share one frame, so the decimal sum is deterministic.
    "q_win_range_frame" -> ((s, dir) => {
      val epochDay = datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_day"))
        .rangeBetween(-6, 0)
      t(s, dir, "orders")
        .withColumn("epoch_day", epochDay)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"),
          sum(D(col("o_totalprice"))).over(w)
            .cast(StringType).cast(DoubleType).as("rev_7d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distribution window functions over per-priority price ranking.
    "q_win_distribution" -> ((s, dir) => {
      val ord = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val full = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"),
          percent_rank().over(ord).as("pct_rank"),
          cume_dist().over(ord).as("cume"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_lowest"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Multiset set-ops (bag semantics: duplicates preserved/matched).
    "q_set_except_all" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_quantity") > 48)
        .select(col("l_partkey").as("k"))
        .exceptAll(t(s, dir, "part").filter(col("p_size") > 40)
          .select(col("p_partkey").as("k")))
        .orderBy("k")
    }),

    "q_set_intersect_all" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_quantity") > 48)
        .select(col("l_partkey").as("k"))
        .intersectAll(t(s, dir, "part").filter(col("p_size") > 25)
          .select(col("p_partkey").as("k")))
        .orderBy("k")
    }),

    "q_join_right_outer" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_quantity") > 49)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .join(t(s, dir, "part").select("p_partkey", "p_size"),
          col("l_partkey") === col("p_partkey"), "right")
        .select(col("p_partkey"), col("p_size"), col("l_orderkey"),
          col("l_linenumber"))
        .orderBy(col("p_partkey"),
          col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first)
    }),

    // Extended string family: edit distance, reversal, repetition,
    // search position, affix extraction, character translation.
    "q_fn_string2" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).cast("long").as("lev"),
          reverse(col("p_name")).as("rev"),
          repeat(col("p_brand"), 2).as("brand2"),
          instr(col("p_name"), "a").cast("long").as("pos_a"),
          expr("left(p_name, 3)").as("pre3"),
          expr("right(p_name, 3)").as("suf3"),
          translate(col("p_name"), "aeiou", "AEIOU").as("caps_vowels"),
          ascii(col("p_name")).cast("long").as("first_code"))
        .orderBy("p_partkey")
    }),

    // Cryptographic digests (content-addressing / dedup keys at scale).
    "q_fn_hash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(col("text")).as("md5_hex"),
          sha2(col("text"), 256).as("sha256_hex"))
        .orderBy("doc_id")
    }),

    // Scalar bit manipulation on keys.
    "q_fn_bits" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey").bitwiseAND(col("l_suppkey"))).as("k_and"),
          (col("l_orderkey").bitwiseOR(col("l_suppkey"))).as("k_or"),
          (col("l_orderkey").bitwiseXOR(col("l_suppkey"))).as("k_xor"),
          shiftleft(col("l_partkey"), 2).as("k_shl"),
          shiftright(col("l_partkey"), 1).as("k_shr"))
        // k_shl in the sort: (orderkey, linenumber, xor) ties DO occur
        // (two lines sharing orderkey+linenumber+suppkey with different
        // partkey — present from sf0.1 up) and both engines only
        // happened to break them identically below sf1.0, where the
        // scale rehearsal caught the mismatch. xor fixes suppkey given
        // orderkey, shl is injective in partkey, so this is total up to
        // fully-duplicate rows (where order can't matter). SURVEY A.3.
        .orderBy("l_orderkey", "l_linenumber", "k_xor", "k_shl")
    }),

    // Bit/bool aggregates + filtered count per priority class.
    "q_agg_bitbool" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          bit_and(col("o_custkey")).as("keys_and"),
          bit_or(col("o_custkey")).as("keys_or"),
          bit_xor(col("o_custkey")).as("keys_xor"),
          // 0/1 longs, not booleans — see q_fn_array's comparator note
          bool_and(col("o_totalprice") > 1000.0).cast("long")
            .as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000.0).cast("long")
            .as("any_over_400k"),
          expr("count_if(o_totalprice > 200000.0)").cast("long")
            .as("n_over_200k"))
        .orderBy("o_orderpriority")
    }),

    // Inter-event deltas per user: the time-series gap-statistics shape
    // (all-long arithmetic; the mean gap divides two exact longs, which
    // is the identical double on both engines).
    "q_ts_delta_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .withColumn("gap_us",
          unix_micros(col("ts_us")) - unix_micros(lag(col("ts_us"), 1).over(w)))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap"),
          max(col("gap_us")).as("max_gap"),
          sum(col("gap_us")).as("sum_gap"))
        .withColumn("avg_gap", col("sum_gap") / col("n_gaps"))
        .orderBy("user_id")
    }),

    // Normalized-key dedup: canonical key = (lang, text prefix); keep
    // the lowest doc_id per key — the URL/content-canonicalization
    // shape of ingestion pipelines.
    "q_dedup_norm_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"), col("norm_key"))
        .orderBy(col("doc_id"))
      // project BEFORE the window: otherwise the full text column rides
      // through both window exchanges (the key is its first 20 chars).
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          substring(lower(trim(col("text"))), 1, 20).as("norm_key"))
        .withColumn("rn", row_number().over(w))
        .withColumn("group_size", count(lit(1)).over(
          Window.partitionBy(col("lang"), col("norm_key"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("norm_key"),
          col("group_size"))
        .orderBy("doc_id")
    }),

    // Pagination: total order, skip one page, take one page.
    "q_limit_offset" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(20).limit(20)
    }),

    // max_by/min_by argmax aggregates. The ordering key must be UNIQUE
    // or argmax ties pick engine-dependent winners: floor(bal*100+0.5)
    // is integral in double on both engines (so the BIGINT cast can't
    // diverge on truncate-vs-round semantics); cast it to BIGINT FIRST,
    // then ×1e12 + custkey in exact int64 arithmetic (a double packing
    // would lose bits past 2^53). Collision-free while custkey < 1e12 —
    // TPC-H customer is 150k×SF, so unique through SF ≈ 6.6M; max
    // |key| ≈ 1e6×1e12 ≈ 1.0e18, inside int64.
    "q_agg_minmax_by" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("ord",
          floor(col("c_acctbal") * 100 + 0.5).cast(LongType) *
            1000000000000L + col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
          expr("max_by(c_name, ord)").as("richest"),
          max(col("c_acctbal")).as("max_bal"),
          expr("min_by(c_name, ord)").as("poorest"),
          min(col("c_acctbal")).as("min_bal"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    }),

    // Heterogeneous-source merge: unionByName with missing columns —
    // the ETL shape for folding feeds with drifted schemas into one
    // activity table (absent columns read NULL, never positionally
    // misaligned like a blind UNION).
    "q_union_by_name" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(
        col("o_custkey").as("actor_id"), lit("order").as("kind"),
        col("o_totalprice").as("amount"),
        col("o_orderdate").cast("date").as("d"))
      val b = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id").as("actor_id"),
          lit("purchase_evt").as("kind"), col("value").as("amount"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          d4(sum(D(col("amount")))).as("sum_amount"),
          sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_missing_date"))
        .orderBy("kind")
    }),

    // Correlated subquery surface (Catalyst's decorrelation): EXISTS /
    // NOT EXISTS lower to semi/anti joins, correlated scalar aggregates
    // to a grouped left join — declared through the SQL front-end
    // because that is how users write them; the planner must do the
    // de-correlation, not the author.
    "q_subquery_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("sq_customer")
      t(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT c_custkey, c_name FROM sq_customer c
          |WHERE EXISTS (SELECT 1 FROM sq_orders o
          |        WHERE o.o_custkey = c.c_custkey
          |          AND o.o_orderpriority = '1-URGENT')
          |  AND NOT EXISTS (SELECT 1 FROM sq_orders o2
          |        WHERE o2.o_custkey = c.c_custkey
          |          AND o2.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    }),

    "q_subquery_scalar" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("sq_customer")
      t(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT COUNT(*) FROM sq_orders
          |     WHERE o_custkey = c_custkey) AS n_orders,
          |  (SELECT MAX(o_totalprice) FROM sq_orders
          |     WHERE o_custkey = c_custkey) AS max_price
          |FROM sq_customer ORDER BY c_custkey""".stripMargin)
    }),

    // LATERAL correlated top-k per row: the planner turns the per-row
    // LIMIT subquery into a ranked join — no driver loop, no UDTF.
    "q_join_lateral_topk" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("sq_customer")
      t(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
          |FROM sq_customer, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM sq_orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    }),

    // Share-of-total window: each order's fraction of its customer's
    // exact (decimal) spend — the ratio-metric dashboard shape. The
    // window sum is decimal so partial merge order can't change it;
    // the division happens in double through the exact string (A.8).
    "q_win_share" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("cust_total", d4(sum(D(col("o_totalprice"))).over(w)))
        .withColumn("share",
          round(col("o_totalprice") / col("cust_total"), 4))
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |   CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxx,
        |   CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS syy,
        |   CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | (sxy - sx * sy / n) / (n - 1) AS covar_samp,
        | (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_agg_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
        | SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        | FROM lineitem GROUP BY l_returnflag, l_quantity)
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY cnt DESC, l_quantity ASC) = 1
        |ORDER BY l_returnflag""".stripMargin,

    "q_agg_skew_kurt" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |   CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean,
        |   CAST(CAST(SUM(CAST(CAST(l_discount AS DECIMAL(9,4)) * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS r2,
        |   CAST(CAST(SUM(CAST(CAST(CAST(l_discount AS DECIMAL(9,4)) * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4)) * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(12,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS r3,
        |   CAST(CAST(SUM(CAST(CAST(CAST(l_discount AS DECIMAL(9,4)) * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4)) * CAST(CAST(l_discount AS DECIMAL(9,4)) * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4)) AS DECIMAL(14,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS r4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | (r3 - 3 * mean * r2 + 2 * mean * mean * mean) /
        |   ((r2 - mean * mean) * sqrt(r2 - mean * mean)) AS skewness,
        | (r4 - 4 * mean * r3 + 6 * mean * mean * r2 - 3 * mean * mean * mean * mean) /
        |   ((r2 - mean * mean) * (r2 - mean * mean)) - 3 AS kurtosis_excess
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_win_range_frame" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey
        |   ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS rev_7d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_distribution" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume,
        | nth_value(o_totalprice, 2) OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_lowest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_set_except_all" ->
      """SELECT * FROM (
        | SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 48
        | EXCEPT ALL
        | SELECT p_partkey AS k FROM part WHERE p_size > 40)
        |ORDER BY k""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT * FROM (
        | SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 48
        | INTERSECT ALL
        | SELECT p_partkey AS k FROM part WHERE p_size > 25)
        |ORDER BY k""".stripMargin,

    "q_join_right_outer" ->
      """SELECT p_partkey, p_size, l_orderkey, l_linenumber
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey
        |      FROM lineitem WHERE l_quantity > 49) l
        |RIGHT JOIN part ON l_partkey = p_partkey
        |ORDER BY p_partkey, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin,

    "q_fn_string2" ->
      """SELECT p_partkey,
        | levenshtein(p_name, p_type) AS lev,
        | reverse(p_name) AS rev,
        | repeat(p_brand, 2) AS brand2,
        | strpos(p_name, 'a') AS pos_a,
        | left(p_name, 3) AS pre3,
        | right(p_name, 3) AS suf3,
        | translate(p_name, 'aeiou', 'AEIOU') AS caps_vowels,
        | CAST(ascii(p_name) AS BIGINT) AS first_code
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_hash" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fn_bits" ->
      """SELECT l_orderkey, l_linenumber,
        | l_orderkey & l_suppkey AS k_and,
        | l_orderkey | l_suppkey AS k_or,
        | xor(l_orderkey, l_suppkey) AS k_xor,
        | l_partkey << 2 AS k_shl,
        | l_partkey >> 1 AS k_shr
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, k_xor, k_shl""".stripMargin,

    "q_agg_bitbool" ->
      """SELECT o_orderpriority,
        | bit_and(o_custkey) AS keys_and,
        | bit_or(o_custkey) AS keys_or,
        | bit_xor(o_custkey) AS keys_xor,
        | CAST(bool_and(o_totalprice > 1000.0) AS BIGINT) AS all_over_1k,
        | CAST(bool_or(o_totalprice > 400000.0) AS BIGINT) AS any_over_400k,
        | COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_over_200k
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_ts_delta_stats" ->
      """WITH gaps AS (
        |  SELECT user_id,
        |   epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id)) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_gaps,
        | MIN(gap_us) AS min_gap, MAX(gap_us) AS max_gap,
        | CAST(SUM(gap_us) AS BIGINT) AS sum_gap,
        | CAST(SUM(gap_us) AS BIGINT) / COUNT(*) AS avg_gap
        |FROM gaps WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_dedup_norm_key" ->
      """SELECT doc_id, lang, norm_key, group_size FROM (
        | SELECT doc_id, lang, norm_key,
        |  row_number() OVER (PARTITION BY lang, norm_key ORDER BY doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang, norm_key) AS group_size
        | FROM (SELECT doc_id, lang,
        |        substring(lower(trim(text)), 1, 20) AS norm_key
        |       FROM documents))
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 20""".stripMargin,

    "q_union_by_name" ->
      """WITH a AS (
        |  SELECT o_custkey AS actor_id, 'order' AS kind,
        |    o_totalprice AS amount, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |b AS (
        |  SELECT user_id AS actor_id, 'purchase_evt' AS kind,
        |    value AS amount
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
        |SELECT kind, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS VARCHAR)
        |    AS DOUBLE) AS sum_amount,
        |  CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_missing_date
        |FROM u GROUP BY kind ORDER BY kind""".stripMargin,

    "q_subquery_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey
        |          AND o2.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders
        |     WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT MAX(o_totalprice) FROM orders
        |     WHERE o_custkey = c_custkey) AS max_price
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_join_lateral_topk" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_agg_minmax_by" ->
      """SELECT c_nationkey,
        | arg_max(c_name, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)
        |   * 1000000000000 + c_custkey) AS richest,
        | max(c_acctbal) AS max_bal,
        | arg_min(c_name, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)
        |   * 1000000000000 + c_custkey) AS poorest,
        | min(c_acctbal) AS min_bal,
        | COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q_win_share" ->
      """WITH s AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      OVER (PARTITION BY o_custkey) AS VARCHAR) AS DOUBLE)
        |      AS cust_total
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_totalprice, cust_total,
        |  round(o_totalprice / cust_total, 4) AS share
        |FROM s ORDER BY o_orderkey""".stripMargin
  )
}
