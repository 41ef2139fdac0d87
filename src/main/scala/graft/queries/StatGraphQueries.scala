package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 statistics/graph/layout batch: iterative BFS reach, snapshot
  * diffing, Welch's t-test, winsorized features, Markov transition
  * counts, dictionary encoding, chunk-level corpus dedup, robust MAD
  * dispersion, and zone-map file skipping — every formulation shaped for
  * a 1000-executor run (iteration state stays distributed, thresholds
  * ride 1-row or dimension-bounded broadcasts, windows ride spines).
  */
object StatGraphQueries extends QSet {

  /** BFS hop budget. Kept small so the DuckDB oracle — which has to
    * ENUMERATE all paths of length ≤ depth through the hub-heavy
    * bipartite graph before the MIN collapse — stays polynomial at the
    * verification SFs. The Spark side aggregates per hop, so ITS cost
    * is linear in edges×depth at any scale.
    */
  private val BfsDepth = 3

  /** Simulated file size (rows) for the zone-map skipping planner. */
  private val FileRows = 600L

  val queries: Map[String, QFn] = Map(
    // Multi-source BFS shortest-hop labelling over the user↔property-key
    // interaction graph (AnalyticsQueries.prEdges): frontier expansion
    // as join + min-aggregation per hop. The depth frame is one row per
    // REACHED vertex and both per-hop shuffles key on the vertex id, so
    // iterations co-partition; nothing ever reaches the driver. This is
    // the label-propagation shape that survives web-scale graphs (cf.
    // the round-4 connected-components operator).
    "q_graph_bfs" -> ((s, dir) => {
      val edges = AnalyticsQueries.prEdges(s, dir).persist()
      var depth = edges.select(col("src").as("node"))
        .filter(col("node") <= 3L).distinct()
        .withColumn("depth", lit(0L))
      for (_ <- 1 to BfsDepth) {
        val next = edges.join(depth, col("src") === col("node"))
          .select(col("dst").as("node"), (col("depth") + 1L).as("depth"))
        depth = depth.unionAll(next)
          .groupBy("node").agg(min(col("depth")).as("depth"))
      }
      depth.orderBy("node")
    }),

    // Graph degree distribution (the profiling pass before any
    // traversal): per-vertex degree (one edge-keyed aggregate) folded
    // into a degree histogram (key space bounded by max degree, not
    // vertex count) — the power-law check that decides whether a
    // traversal needs hub mitigation. Both aggregates partial-fold
    // map-side.
    "q_graph_degree_dist" -> ((s, dir) => {
      AnalyticsQueries.prEdges(s, dir)
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg")
    }),

    // Snapshot diff (the table-versioning audit): today's snapshot is
    // derived deterministically from orders (keys ≡3 mod 10 deleted,
    // keys ≡0 mod 7 repriced +1), and the diff full-outer-joins the two
    // generations on the key, comparing exact DECIMAL prices — no
    // row-hash, so float formatting can't split engines. Emitting only
    // non-unchanged rows keeps the result proportional to the CHANGE
    // rate, not the table; the join is key-on-key, AQE picks the
    // broadcast at fixture scale and a co-partitioned SMJ at 100 TB.
    "q_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val prev = o.select(col("o_orderkey").as("k"),
        D(col("o_totalprice")).as("p_prev"))
      val cur = o.filter(expr("o_orderkey % 10 <> 3"))
        .select(col("o_orderkey").as("k"),
          when(expr("o_orderkey % 7 = 0"),
            D(col("o_totalprice") + 1.0d))
            .otherwise(D(col("o_totalprice"))).as("p_cur"))
      prev.join(cur, Seq("k"), "full_outer")
        .withColumn("status",
          when(col("p_cur").isNull, lit("removed"))
            .when(col("p_prev").isNull, lit("added"))
            .when(col("p_prev") =!= col("p_cur"), lit("changed"))
            .otherwise(lit("unchanged")))
        .filter(col("status") =!= "unchanged")
        .select(col("k").as("o_orderkey"), col("status"),
          d4(col("p_prev")).as("price_prev"),
          d4(col("p_cur")).as("price_cur"))
        .orderBy("o_orderkey")
    }),

    // Welch's two-sample t-test (click vs error event values): BOTH
    // groups' moments from ONE conditional aggregation pass of exact
    // decimal sums (the q_feat_standardize recipe — value rounds to 6dp
    // decimal, squares widen exactly, sums are order-independent), then
    // the t statistic and Welch–Satterthwaite df as IEEE ops over those
    // exact bases, rounded 6dp. No join anywhere — the whole test is a
    // map-side partial aggregate folding to one row.
    "q_stats_ttest" -> ((s, dir) => {
      val vd = col("value").cast(DecimalType(19, 6))
      val sq = (vd * vd).cast(DecimalType(30, 12))
      val isA = col("event_type") === "click"
      val g = events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .agg(
          sum(when(isA, 1L).otherwise(0L)).as("n1"),
          sum(when(!isA, 1L).otherwise(0L)).as("n2"),
          sum(when(isA, vd)).cast(StringType).cast(DoubleType).as("sx1"),
          sum(when(!isA, vd)).cast(StringType).cast(DoubleType).as("sx2"),
          sum(when(isA, sq)).cast(StringType).cast(DoubleType).as("sxx1"),
          sum(when(!isA, sq)).cast(StringType).cast(DoubleType).as("sxx2"))
      val m1 = col("sx1") / col("n1")
      val m2 = col("sx2") / col("n2")
      val v1 = (col("sxx1") - col("sx1") * col("sx1") / col("n1")) /
        (col("n1") - lit(1L))
      val v2 = (col("sxx2") - col("sx2") * col("sx2") / col("n2")) /
        (col("n2") - lit(1L))
      val se1 = v1 / col("n1")
      val se2 = v2 / col("n2")
      g.select(col("n1"), col("n2"),
          round(m1, 6).as("mean1"), round(m2, 6).as("mean2"),
          round((m1 - m2) / sqrt(se1 + se2), 6).as("t_stat"),
          round((se1 + se2) * (se1 + se2) /
            (se1 * se1 / (col("n1") - 1L) + se2 * se2 / (col("n2") - 1L)),
            4).as("df"))
        .orderBy("n1")
    }),

    // Chi-square independence test (market segment × region): observed
    // counts are exact int64 from one aggregate; row/col/grand totals
    // ride windows over the 25-CELL contingency frame (bounded by the
    // category product at any data size); expected counts and per-cell
    // terms are IEEE ops of exact ints, and the statistic folds via
    // round-then-decimal-sum so cell order can't shift it. The
    // categorical-drift sibling of q_stats_ttest.
    "q_stats_chi2" -> ((s, dir) => {
      val cells = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("c_mktsegment"), col("r_name"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy("c_mktsegment")
      val wc = Window.partitionBy("r_name")
      val wa = Window.partitionBy()
      val e = (sum(col("o")).over(wr) * sum(col("o")).over(wc))
        .cast(DoubleType) / sum(col("o")).over(wa)
      cells
        .withColumn("term",
          round((col("o") - e) * (col("o") - e) / e, 8))
        .agg(sum(col("o")).as("n"),
          count(lit(1)).as("n_cells"),
          sum(col("term").cast(DecimalType(28, 8)))
            .cast(StringType).cast(DoubleType).as("chi2"))
        .orderBy("n")
    }),

    // Kolmogorov-Smirnov two-sample test (click vs error value
    // distributions) — the training-data drift detector: per distinct
    // value the two empirical CDFs come from cumulative window sums
    // over the VALUE spine (bounded by the value domain, not row
    // count), D = max |F1 − F2| with the argmax value surfaced
    // (ties to the smallest value). Every CDF step is one division of
    // exact int64 counts — identical IEEE on both engines.
    "q_stats_ks" -> ((s, dir) => {
      val ev = events(s, dir)
        .filter(col("event_type").isin("click", "error"))
      val perVal = ev.groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("a1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("a2"))
      val tot = ev.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n1"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n2"))
      val w = Window.orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perVal
        .withColumn("c1", sum(col("a1")).over(w))
        .withColumn("c2", sum(col("a2")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("d", abs(col("c1").cast(DoubleType) / col("n1") -
          col("c2").cast(DoubleType) / col("n2")))
        .orderBy(col("d").desc, col("value"))
        .limit(1)
        .select(col("d").as("d_stat"), col("value").as("at_value"),
          col("n1"), col("n2"))
    }),

    // Winsorized (clipped) aggregation: per-returnflag p05/p95 picked by
    // exact percentile_disc (VALUES from the data — no interpolation, so
    // both engines pick the identical double), carried back as a 3-row
    // broadcast; clipping is pure comparison and the clipped total goes
    // through the exact-decimal sum. The robust-metrics pass a feature
    // pipeline runs before scaling.
    "q_feat_winsorize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val th = li.groupBy("l_returnflag").agg(
        expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p05"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p95"))
      li.join(broadcast(th), "l_returnflag")
        .withColumn("clipped",
          least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(D(col("clipped"))).as("s"),
          sum(when(col("l_extendedprice") < col("p05"), 1L)
            .when(col("l_extendedprice") > col("p95"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .select(col("l_returnflag"), col("n"), col("n_clipped"),
          d4(col("s")).as("sum_winsorized"))
        .orderBy("l_returnflag")
    }),

    // First-order Markov transition counts over per-user event streams:
    // lead() inside the (user, time) window pairs each event with its
    // successor, then a 25-cell aggregate (|event_type|² is bounded) —
    // the session-flow matrix recommenders and anomaly models consume.
    // Window partitions by user (parallel across users at any scale);
    // the final aggregate's key space is type², independent of volume.
    "q_seq_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "next_type")
    }),

    // Frequency-ordered dictionary encoding (the categorical-feature
    // compression step): brand ids assigned by (count desc, value) on
    // the 25-row aggregate — the unpartitioned row_number rides the
    // DICTIONARY, never the data — then mapped back over part via a
    // broadcast join. At 100 TB the dictionary stays dimension-bounded,
    // so the encode pass is map-side everywhere.
    "q_feat_dict_encode" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val dict = p.groupBy("p_brand").agg(count(lit(1)).as("cnt"))
        .withColumn("brand_id", row_number().over(
          Window.orderBy(col("cnt").desc, col("p_brand"))).cast(LongType))
      p.join(broadcast(dict), "p_brand")
        .select(col("p_partkey"), col("p_brand"), col("brand_id"),
          col("cnt").as("brand_freq"))
        .orderBy("p_partkey")
    }),

    // Chunk-level duplication audit (the C4-style duplicate-span pass):
    // each document splits into non-overlapping 10-word chunks (array
    // slicing — no quadratic shingle explosion), chunks aggregate to
    // distinct-doc counts, and each doc reports how many of its chunks
    // also appear elsewhere. The chunk self-join keys on the chunk text
    // (equi-join, hash-partitioned); chunk cardinality is ~|corpus|/10
    // rows, so both shuffles stay proportional to the input.
    "q_dedup_chunks" -> ((s, dir) => {
      val chunks = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), ((size(col("words")) + 9) / 10).cast(
              IntegerType) - 1),
            i => array_join(slice(col("words"), i * 10 + 1, lit(10)), " ")))
            .as(Seq("chunk_pos", "chunk")))
      val docsPer = chunks.groupBy("chunk")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      chunks.join(docsPer, "chunk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n_docs") > 1L, 1L).otherwise(0L))
            .as("n_dup_chunks"))
        .withColumn("dup_ratio",
          d4(col("n_dup_chunks").cast(DoubleType) / col("n_chunks")))
        .orderBy("doc_id")
    }),

    // Median absolute deviation (robust dispersion) of order totals per
    // priority: the median is an exact percentile_disc pick, deviations
    // are |x − med| (one IEEE subtract of exact inputs), and MAD is a
    // second exact pick over those. Two aggregation passes with a 5-row
    // broadcast between them — the outlier-threshold recipe that, unlike
    // stddev, no skewed tail can poison.
    "q_stats_mad" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val med = o.groupBy("o_orderpriority").agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("med"))
      o.join(broadcast(med), "o_orderpriority")
        .withColumn("adev", abs(col("o_totalprice") - col("med")))
        .groupBy(col("o_orderpriority"), col("med"))
        .agg(count(lit(1)).as("n"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
            .as("mad"))
        .select(col("o_orderpriority"), col("n"), col("med"), col("mad"))
        .orderBy("o_orderpriority")
    }),

    // Zone-map file-skipping planner: lineitem bucketed into simulated
    // 600-row files (orderkey-clustered, mirroring ingestion order),
    // per-file min/max ship dates aggregate map-side, and the planner
    // marks which files a Q1-1995 predicate would scan. THE 100 TB
    // lever: this min/max pruning decision — made on KB of footer
    // stats, never data — is what lets a selective query touch 3% of
    // a petabyte table; the query materializes exactly that decision.
    "q_layout_file_skipping" -> ((s, dir) => {
      val lo = lit(java.sql.Date.valueOf("1995-01-01"))
      val hi = lit(java.sql.Date.valueOf("1995-03-31"))
      t(s, dir, "lineitem")
        .groupBy(expr(s"l_orderkey div ${FileRows}L").as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_shipdate").cast(DateType)).as("min_ship"),
          max(col("l_shipdate").cast(DateType)).as("max_ship"))
        .withColumn("would_scan",
          col("max_ship") >= lo && col("min_ship") <= hi)
        .orderBy("file_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_graph_bfs" ->
      s"""WITH RECURSIVE ek AS (
        |  SELECT DISTINCT user_id, CAST(props->>'$$.k' AS BIGINT) AS k
        |  FROM events WHERE props->>'$$.k' IS NOT NULL),
        |edges AS (
        |  SELECT user_id AS src, 1000000 + k AS dst FROM ek
        |  UNION ALL
        |  SELECT 1000000 + k AS src, user_id AS dst FROM ek),
        |bfs AS (
        |  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS depth
        |  FROM edges WHERE src <= 3
        |  UNION ALL
        |  SELECT e.dst, b.depth + 1 FROM bfs b
        |  JOIN edges e ON e.src = b.node WHERE b.depth < ${BfsDepth})
        |SELECT node, MIN(depth) AS depth FROM bfs
        |GROUP BY node ORDER BY node""".stripMargin,

    "q_graph_degree_dist" ->
      """WITH ek AS (
        |  SELECT DISTINCT user_id, CAST(props->>'$.k' AS BIGINT) AS k
        |  FROM events WHERE props->>'$.k' IS NOT NULL),
        |edges AS (
        |  SELECT user_id AS src, 1000000 + k AS dst FROM ek
        |  UNION ALL
        |  SELECT 1000000 + k AS src, user_id AS dst FROM ek),
        |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
        |SELECT deg, COUNT(*) AS n_nodes FROM deg
        |GROUP BY deg ORDER BY deg""".stripMargin,

    "q_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS p_prev FROM orders),
        |cur AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 7 = 0
        |      THEN CAST(o_totalprice + 1.0 AS DECIMAL(18,4))
        |      ELSE CAST(o_totalprice AS DECIMAL(18,4)) END AS p_cur
        |  FROM orders WHERE o_orderkey % 10 <> 3),
        |d AS (
        |  SELECT COALESCE(prev.k, cur.k) AS o_orderkey,
        |    CASE WHEN cur.k IS NULL THEN 'removed'
        |         WHEN prev.k IS NULL THEN 'added'
        |         WHEN p_prev <> p_cur THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    CAST(CAST(p_prev AS VARCHAR) AS DOUBLE) AS price_prev,
        |    CAST(CAST(p_cur AS VARCHAR) AS DOUBLE) AS price_cur
        |  FROM prev FULL OUTER JOIN cur ON prev.k = cur.k)
        |SELECT * FROM d WHERE status <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,

    "q_stats_ttest" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(19,6))) AS VARCHAR)
        |      AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(19,6)) *
        |      CAST(value AS DECIMAL(19,6)) AS DECIMAL(30,12))) AS VARCHAR)
        |      AS DOUBLE) AS sxx
        |  FROM events WHERE event_type IN ('click', 'error')
        |  GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, sx / n AS m,
        |    (sxx - sx * sx / n) / (n - 1) AS v
        |  FROM g),
        |a AS (SELECT n AS n1, m AS m1, v AS v1 FROM m
        |      WHERE event_type = 'click'),
        |b AS (SELECT n AS n2, m AS m2, v AS v2 FROM m
        |      WHERE event_type = 'error')
        |SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
        |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
        |  round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2) /
        |    ((v1 / n1) * (v1 / n1) / (n1 - 1) +
        |     (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS df
        |FROM a, b""".stripMargin,

    "q_stats_chi2" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, r_name, COUNT(*) AS o
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |x AS (
        |  SELECT o, round((o - e) * (o - e) / e, 8) AS term
        |  FROM (
        |    SELECT o,
        |      CAST(SUM(o) OVER (PARTITION BY c_mktsegment) *
        |        SUM(o) OVER (PARTITION BY r_name) AS DOUBLE) /
        |        SUM(o) OVER () AS e
        |    FROM cells))
        |SELECT CAST(SUM(o) AS BIGINT) AS n, COUNT(*) AS n_cells,
        |  CAST(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS VARCHAR)
        |    AS DOUBLE) AS chi2
        |FROM x ORDER BY n""".stripMargin,

    "q_stats_ks" ->
      """WITH ev AS (
        |  SELECT value, event_type FROM events
        |  WHERE event_type IN ('click', 'error')),
        |pv AS (
        |  SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a1,
        |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS a2
        |  FROM ev GROUP BY value),
        |tot AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2
        |  FROM ev),
        |c AS (
        |  SELECT value,
        |    SUM(a1) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS c1,
        |    SUM(a2) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS c2
        |  FROM pv)
        |SELECT abs(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
        |    AS d_stat,
        |  value AS at_value, n1, n2
        |FROM c, tot
        |ORDER BY d_stat DESC, at_value LIMIT 1""".stripMargin,

    "q_feat_winsorize" ->
      """WITH th AS (
        |  SELECT l_returnflag,
        |    quantile_disc(l_extendedprice, 0.05) AS p05,
        |    quantile_disc(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT li.l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_extendedprice < p05 THEN 1
        |    WHEN l_extendedprice > p95 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  CAST(CAST(CAST(SUM(CAST(
        |    least(greatest(l_extendedprice, p05), p95)
        |    AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
        |    AS sum_winsorized
        |FROM lineitem li JOIN th ON li.l_returnflag = th.l_returnflag
        |GROUP BY li.l_returnflag
        |ORDER BY li.l_returnflag""".stripMargin,

    "q_seq_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, COUNT(*) AS n
        |FROM s WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type
        |ORDER BY event_type, next_type""".stripMargin,

    "q_feat_dict_encode" ->
      """WITH dict AS (
        |  SELECT p_brand, COUNT(*) AS cnt,
        |    CAST(row_number() OVER (ORDER BY COUNT(*) DESC, p_brand)
        |      AS BIGINT) AS brand_id
        |  FROM part GROUP BY p_brand)
        |SELECT p.p_partkey, p.p_brand, d.brand_id, d.cnt AS brand_freq
        |FROM part p JOIN dict d ON p.p_brand = d.p_brand
        |ORDER BY p.p_partkey""".stripMargin,

    "q_dedup_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    unnest(range((len(words) + 9) // 10)) AS chunk_pos, words
        |  FROM w),
        |ch AS (
        |  SELECT doc_id, chunk_pos,
        |    array_to_string(
        |      words[(chunk_pos * 10 + 1):(chunk_pos * 10 + 10)], ' ')
        |      AS chunk
        |  FROM c),
        |dp AS (
        |  SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs
        |  FROM ch GROUP BY chunk)
        |SELECT ch.doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN dp.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(CAST(CAST(CAST(SUM(CASE WHEN dp.n_docs > 1 THEN 1 ELSE 0
        |    END) AS DOUBLE) / COUNT(*) AS DECIMAL(18,4)) AS VARCHAR)
        |    AS DOUBLE) AS dup_ratio
        |FROM ch JOIN dp ON ch.chunk = dp.chunk
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,

    "q_stats_mad" ->
      """WITH med AS (
        |  SELECT o_orderpriority,
        |    quantile_disc(o_totalprice, 0.5) AS med
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderpriority, COUNT(*) AS n, med.med,
        |  quantile_disc(abs(o.o_totalprice - med.med), 0.5) AS mad
        |FROM orders o JOIN med ON o.o_orderpriority = med.o_orderpriority
        |GROUP BY o.o_orderpriority, med.med
        |ORDER BY o.o_orderpriority""".stripMargin,

    "q_layout_file_skipping" ->
      s"""SELECT l_orderkey // ${FileRows} AS file_id, COUNT(*) AS n_rows,
        |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
        |  MAX(CAST(l_shipdate AS DATE)) AS max_ship,
        |  (MAX(CAST(l_shipdate AS DATE)) >= DATE '1995-01-01'
        |   AND MIN(CAST(l_shipdate AS DATE)) <= DATE '1995-03-31')
        |    AS would_scan
        |FROM lineitem
        |GROUP BY 1 ORDER BY file_id""".stripMargin
  )
}
