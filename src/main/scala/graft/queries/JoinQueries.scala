package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** SURVEY.md §2.3 — join family.
  *
  * 100 TB posture: dimension sides (part, customer, nation, region,
  * supplier) are true dims → broadcast (explicit hint where the point of
  * the query is the strategy, auto-threshold otherwise). Fact⋈fact
  * (orders⋈lineitem) shuffles on the join key — sort-merge — which is the
  * right plan at any scale. Theta/as-of joins bound their blowup with
  * range predicates + per-user partitioning (user count scales with data,
  * per-user event count stays bounded).
  */
object JoinQueries extends QSet {

  /** Bucketed-layout memo for q_join_bucketed, keyed (applicationId, sfDir):
    * the bucketBy writes are LAYOUT PREPARATION (the 100 TB analogue is a
    * nightly table-maintenance job, not part of any query), so they run at
    * most once per session per dataset and the declared query's timed path
    * is read-only. Table/dir names are keyed by sfDir ONLY (no appId
    * suffix), so overwrite reuses the same metastore entry + /tmp location
    * across harness runs instead of leaking two tables and two parquet
    * directories per run; stale per-appId litter from older rounds is
    * swept on first touch. */
  private val bucketedReady =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  def ensureBucketed(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) =
    bucketedReady.computeIfAbsent(
      s.sparkContext.applicationId + "|" + dir, _ => {
        val tag = new java.io.File(dir).getName
          .replaceAll("[^A-Za-z0-9]", "_")
        val ot = s"g_orders_bkt_$tag"
        val ct = s"g_customer_bkt_$tag"
        // sweep stale appId-suffixed litter from pre-round-5 runs (old
        // names carried an _<applicationId> suffix after this sfDir's
        // tag): both the catalog entries and the orphaned /tmp payload
        // dirs. ONLY names extending our own tag are touched — another
        // session's layout for a DIFFERENT sf dir must never be deleted
        // from under it.
        s.catalog.listTables().collect()
          .map(_.name)
          .filter(n => n.startsWith(s"g_orders_bkt_${tag}_") ||
            n.startsWith(s"g_customer_bkt_${tag}_"))
          .foreach(n => s.sql(s"DROP TABLE IF EXISTS $n"))
        new java.io.File(graft.engine.Tables.tmpRoot).listFiles()
          .filter(f => f.isDirectory &&
            (f.getName.startsWith(s"graft_bkt_orders_${tag}_") ||
              f.getName.startsWith(s"graft_bkt_customer_${tag}_")))
          .foreach(f => org.apache.commons.io.FileUtils.deleteQuietly(f))
        t(s, dir, "orders").select("o_custkey", "o_totalprice")
          .write.mode("overwrite")
          .option("path", s"${graft.engine.Tables.tmpRoot}/graft_bkt_orders_$tag")
          .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ot)
        t(s, dir, "customer").select("c_custkey")
          .write.mode("overwrite")
          .option("path", s"${graft.engine.Tables.tmpRoot}/graft_bkt_customer_$tag")
          .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(ct)
        (ot, ct)
      })

  val queries: Map[String, QFn] = Map(
    "q_join_broadcast" -> ((s, dir) => {
      // fact ⋈ broadcast(dim): no shuffle of lineitem at any scale.
      t(s, dir, "lineitem")
        .join(dim(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "p_name", "p_retailprice")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "p_name", "p_retailprice")
    }),

    "q_join_star" -> ((s, dir) => {
      // TPC-H Q5 shape: fact joined through broadcastable dims, revenue
      // partial-aggregated before the tiny final shuffle.
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(dim(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(d4(sum(rev)).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // TPC-H Q3 (shipping priority), adapted to this schema (no
    // o_shippriority column → o_orderpriority rides along): selective
    // filters on BOTH fact inputs land in the scans, revenue partial-
    // aggregates per (orderkey, ...) group, and the global top-10 is a
    // TakeOrdered merge — never a full sort. (revenue, date, orderkey)
    // is a total order, so the LIMIT frontier is engine-independent.
    "q_tpch_q3" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      val cut = to_timestamp(lit("1998-06-01"))
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cut),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").as("orderdate"),
          col("o_orderpriority"))
        .agg(d4(sum(rev)).as("revenue"))
        .orderBy(col("revenue").desc, col("orderdate"), col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    }),

    // TPC-H Q5 (local supplier volume) proper: the 6-table join with
    // the same-nation customer⋈supplier constraint and a 1-year date
    // window. Catalyst broadcast-joins the three dimension tables and
    // shuffles only the two facts; the n_name aggregate is partial+
    // final. The q_join_star query is the simplified shape; this one
    // exercises join ordering across six inputs.
    "q_tpch_q5" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(d4(sum(rev)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Bucketed co-located join: both sides land as bucketBy(8, key)
    // sortBy(key) external tables, so the subsequent join reads the
    // bucketing as a valid hash partitioning and plans with NO shuffle
    // under the join or the per-key aggregate (asserted in PlanSpec;
    // the only exchange is the presentation sort). This is the
    // pre-shuffled layout that turns a nightly fact⋈fact join at
    // 100 TB from two full shuffles into a map-side merge. Bucketing
    // is result-invariant, so the oracle is the plain join on the
    // original parquet. The layout write is memoized per
    // (session, sfDir) in ensureBucketed above — the timed path of
    // this query is read-only once the layout exists.
    "q_join_bucketed" -> ((s, dir) => {
      val (ot, ct) = ensureBucketed(s, dir)
      // hint("merge") keeps the oracle-scale fixture off the broadcast
      // path so the declared plan is the bucketed sort-merge a 100 TB
      // run would pick (both sides far past any broadcast threshold).
      s.table(ct)
        .join(s.table(ot).hint("merge"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_orders"),
          d4(sum(D(col("o_totalprice")))).as("revenue"))
        .orderBy("c_custkey")
    }),

    // Bloom-prefiltered semi join: the probe (lineitem) is pre-filtered
    // by a bits-sized bloom sketch of the build keys BEFORE any shuffle,
    // then the survivors are exact-verified with the real semi join. At
    // 100 TB the build key set (urgent orders ≈ 1.5M keys/SF) is far too
    // large to broadcast as data, but its bloom image is a fixed few MB
    // — a single scalar row — so the fact scan drops ~70% of its rows
    // map-side and only the prefiltered remainder pays the semi-join
    // shuffle. Spark's own InjectRuntimeFilter applies this rewrite only
    // under size thresholds (PlanSpec pins that path); `graft_bloom_agg`
    // / `graft_might_contain` (GraftExtensions) make the same pattern
    // writable EXPLICITLY, for when the author knows better than the
    // thresholds. False positives are removed by the exact verify, so
    // the result — and the DuckDB oracle — is the plain semi join.
    "q_join_bloom_prefilter" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey").createOrReplaceTempView("bf_urgent")
      t(s, dir, "lineitem").createOrReplaceTempView("bf_lineitem")
      s.sql(
        """WITH pre AS (
          |  SELECT l_orderkey, l_returnflag, l_extendedprice
          |  FROM bf_lineitem
          |  WHERE graft_might_contain(
          |    (SELECT graft_bloom_agg(xxhash64(o_orderkey), 1000000L, 8388608L)
          |     FROM bf_urgent),
          |    xxhash64(l_orderkey)))
          |SELECT l_returnflag, COUNT(*) AS n_lines,
          |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
          |    AS STRING) AS DOUBLE) AS sum_base
          |FROM pre
          |WHERE EXISTS (SELECT 1 FROM bf_urgent b
          |              WHERE b.o_orderkey = pre.l_orderkey)
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // TPC-H Q10 (returned-item reporting), adapted to this schema:
    // customers ranked by revenue lost to returns in one quarter. Both
    // fact filters reach the scans; nation broadcasts; the global
    // top-20 is a TakeOrdered merge with c_custkey as the total-order
    // tiebreak.
    "q_tpch_q10" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(d4(sum(rev)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    }),

    // TPC-H Q18 (large-volume customers): the grouped-HAVING semi
    // shape — aggregate lineitem per order, keep the >300-quantity
    // tail, and attach customer/order detail to only those survivors.
    // The filtered aggregate is tiny, so Catalyst broadcasts it into
    // the orders scan; the global top-100 is a TakeOrdered merge.
    // (o_totalprice, orderdate, o_orderkey) is a total order.
    "q_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      t(s, dir, "customer").select("c_custkey", "c_name")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    "q_join_sortmerge" -> ((s, dir) => {
      // big ⋈ big: forced sort-merge (the 100 TB-correct plan shape).
      val disc = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          d4(sum(disc)).as("sum_disc_price"))
        .orderBy("o_orderpriority")
    }),

    "q_join_left_outer" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_big_orders"),
          coalesce(d4(sum(D(col("o_totalprice")))), lit(0.0))
            .as("sum_big"))
        .orderBy("c_custkey")
    }),

    "q_join_full_outer" -> ((s, dir) => {
      // o_orderkey = event_id*2 leaves unmatched rows on BOTH sides at
      // every scale factor (verified against the generator's key ranges).
      val ev = events(s, dir)
        .select(col("event_id"), col("value"))
      t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        .join(ev, col("o_orderkey") === col("event_id") * 2, "full")
        .orderBy(col("o_orderkey").asc_nulls_first,
          col("event_id").asc_nulls_first)
    }),

    "q_join_semi" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    "q_join_cross" -> ((s, dir) => {
      // cartesian kept to the two tiny dims (5×25 rows).
      t(s, dir, "region").select("r_regionkey", "r_name")
        .crossJoin(t(s, dir, "nation").select("n_nationkey", "n_name"))
        .orderBy("r_regionkey", "n_nationkey")
    }),

    "q_join_theta_range" -> ((s, dir) => {
      // non-equi: same-user event pairs within 1 hour. The user_id equi
      // key keeps this a hash/sort-merge join on user with a range filter
      // — per-user event counts stay bounded as data scales.
      val ev = events(s, dir)
      val a = ev.select(col("event_id").as("id1"), col("user_id"),
        col("ts_us").as("ts1"))
      val b = ev.select(col("event_id").as("id2"),
        col("user_id").as("user2"), col("ts_us").as("ts2"))
      a.join(b,
          col("user_id") === col("user2") &&
          col("id1") < col("id2") &&
          col("ts2") >= col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR"))
        .select("id1", "id2", "user_id", "ts1", "ts2")
        .orderBy("id1", "id2")
    }),

    // Pure range join (NO shared equi key): errors within ±5 minutes
    // of each purchase, across ALL users. Naively this plans as a
    // BroadcastNestedLoopJoin — the classic scale-killer. Interval
    // bucketing restores an equi key: every error lands in exactly one
    // 5-minute bucket, every purchase probes its own and both
    // neighbour buckets, and the exact range predicate runs INSIDE the
    // equi join — so an error pairs with a purchase at most once and
    // the join shuffles on bucket like any hash join. The all-pairs
    // plan lint passing over this query is the machine proof of shape.
    // LEFT join keeps zero-match purchases (count ignores the nulls;
    // the 3 bucket probes of an unmatched purchase collapse to one
    // zero-count group).
    "q_join_range_bucket" -> ((s, dir) => {
      val ev = events(s, dir)
      // FLOOR division, not `div` (which truncates toward zero): for
      // negative epoch micros (pre-1970 ts) truncation would disagree
      // with the floor semantics the ±1-bucket neighbour probe relies
      // on and cross-boundary pairs could be missed. pmod is always
      // non-negative, so (x - pmod(x,d)) div d == floor(x/d) exactly,
      // in pure int64 arithmetic (no double rounding at boundaries).
      val fdiv = "(unix_micros(ts_us) - pmod(unix_micros(ts_us), " +
        "300000000L)) div 300000000L"
      val err = ev.filter(col("event_type") === "error")
        .select(col("ts_us").as("ts_e"), expr(fdiv).as("bkt"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts_us").as("ts_p"),
          expr(fdiv).as("b0"))
        .withColumn("bkt",
          explode(expr("array(b0 - 1, b0, b0 + 1)")))
      pur.join(err,
          pur("bkt") === err("bkt") &&
            col("ts_e") >= col("ts_p") - expr("INTERVAL 5 MINUTES") &&
            col("ts_e") <= col("ts_p") + expr("INTERVAL 5 MINUTES"),
          "left")
        .groupBy("event_id")
        .agg(count(col("ts_e")).as("n_nearby_errors"))
        .orderBy("event_id")
    }),

    "q_join_asof" -> ((s, dir) => {
      // as-of: each purchase's latest strictly-earlier click by the same
      // user. Window formulation (row_number over ts desc) rather than a
      // native ASOF so both engines use byte-identical tie semantics.
      val ev = events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts_us").as("c_ts"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("c_ts").desc_nulls_last, col("c_id").desc_nulls_last)
      p.join(c, col("user_id") === col("c_user") && col("c_ts") < col("ts_us"),
          "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("ts_us").as("ts"),
          col("c_id").as("prior_click_id"), col("c_ts").as("prior_ts"))
        .orderBy("event_id")
    }),

    // The SAME as-of semantics through the custom physical operator
    // (plans/AsOfJoin: LogicalPlan + Strategy + co-partitioned merge
    // exec, O(L+R) per partition — the 100 TB path the window
    // formulation above can't take). Strict "<" rides a −1 µs shift of
    // the left timestamp in the long domain (the exec's native bound is
    // ≤). Shares q_join_asof's oracle SQL verbatim: the custom operator
    // itself is DuckDB-graded, not just scalatest-proven. Equal-ts
    // right rows would be sort-order-dependent in the exec (documented
    // at AsOf.join) — the events fixture has none at any SF (verified),
    // and DeterminismSpec's double-run check would flag a regeneration
    // that introduces them.
    "q_join_asof_native" -> ((s, dir) => {
      val ev = events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts_us").as("c_ts"))
      graft.plans.AsOf.join(p, c,
          col("user_id"), unix_micros(col("ts_us")) - 1,
          col("c_user"), unix_micros(col("c_ts")))
        .select(col("event_id"), col("ts_us").as("ts"),
          col("c_id").as("prior_click_id"), col("c_ts").as("prior_ts"))
        .orderBy("event_id")
    }),

    // Skew-salted join, the companion technique to q_agg_salted_twophase:
    // the probe (fact) side salts each row into one of S buckets by a
    // hash of its ROW identity, the build (dim) side replicates each key
    // S times, and the equi-join runs on (key, salt) — a hot fact key
    // that would pin one reduce task now spreads across S tasks. The
    // result is provably salt-invariant (every fact row still matches
    // exactly its dim row), so the oracle is the PLAIN join. At this SF
    // Spark broadcasts the replicated dim (salting is then free); at
    // skew scale you disable the broadcast and the (key, salt) shuffle
    // is the point.
    "q_join_salted" -> ((s, dir) => {
      val S = 8
      val fact = t(s, dir, "orders")
        .withColumn("salt",
          pmod(xxhash64(col("o_orderkey")), lit(S)).cast(IntegerType))
      val dim = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .withColumn("salt", explode(expr(s"sequence(0, ${S - 1})")))
      fact.join(dim,
          col("o_custkey") === col("c_custkey") &&
            fact("salt") === dim("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          d4(sum(D(col("o_totalprice")))).as("revenue"))
        .orderBy("c_mktsegment")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_bloom_prefilter" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_join_bucketed" ->
      """SELECT c_custkey, COUNT(*) AS n_orders,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        | c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        | CAST(o_orderdate AS DATE) AS orderdate, o_totalprice, sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(l_quantity) > 300.0) big
        |  ON o_orderkey = big.l_orderkey
        |ORDER BY o_totalprice DESC, orderdate, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_join_salted" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, p_name, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, p_name, p_retailprice""".stripMargin,

    "q_join_star" ->
      """SELECT n_name,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_sortmerge" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_disc_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
        | COALESCE(CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE), 0.0) AS sum_big
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        | ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_full_outer" ->
      """SELECT o_orderkey, o_totalprice, event_id, value
        |FROM (SELECT o_orderkey, o_totalprice FROM orders) o
        |FULL JOIN (SELECT event_id, value FROM events) e
        | ON o_orderkey = event_id * 2
        |ORDER BY o_orderkey NULLS FIRST, event_id NULLS FIRST""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "q_join_theta_range" ->
      """SELECT a.event_id AS id1, b.event_id AS id2, a.user_id, a.ts AS ts1, b.ts AS ts2
        |FROM events a JOIN events b
        | ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY id1, id2""".stripMargin,

    "q_join_range_bucket" ->
      """SELECT p.event_id, COUNT(e.ts) AS n_nearby_errors
        |FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT ts FROM events WHERE event_type = 'error') e
        |  ON e.ts >= p.ts - INTERVAL 5 MINUTE
        | AND e.ts <= p.ts + INTERVAL 5 MINUTE
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,

    "q_join_asof" -> asofOracleSql,

    "q_join_asof_native" -> asofOracleSql
  )

  /** Shared by the window formulation AND the custom-operator query —
    * both must reproduce DuckDB's as-of answer exactly.
    */
  private lazy val asofOracleSql: String =
    """SELECT event_id, ts, prior_click_id, prior_ts FROM (
      | SELECT p.event_id, p.ts, c.event_id AS prior_click_id, c.ts AS prior_ts,
      |  row_number() OVER (PARTITION BY p.event_id
      |    ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
      | FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      | LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts < p.ts)
      |WHERE rn = 1 ORDER BY event_id""".stripMargin
}
