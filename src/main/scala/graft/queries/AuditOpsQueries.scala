package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 seventeenth-pass batch: bounded weighted shortest paths
  * (3-round Bellman-Ford relaxation — the unrolled-iteration pattern
  * q_text_bpe_train established), a duplicate-payment audit (the
  * classic finance-forensics join), and cart-abandonment session
  * rates.
  *
  * Determinism posture: all-integer distances/weights; the only
  * doubles are shared IEEE rate divisions.
  */
object AuditOpsQueries extends QSet {

  /** Deterministic synthetic edge weight (both engines derive the same
    * value from the endpoint ids). */
  private def w(src: org.apache.spark.sql.Column,
      dst: org.apache.spark.sql.Column) = (src + dst) % 97 + lit(1L)

  val queries: Map[String, QFn] = Map(
    // 3-round Bellman-Ford from the source set {user_id ≤ 3} over the
    // bipartite interaction graph with deterministic integer weights —
    // bounded-hop weighted reachability (the "cost to reach within k
    // hops" query; full Dijkstra is iterative-driver territory, but a
    // fixed relaxation depth is exactly what a SQL engine should unroll,
    // the q_text_bpe_train precedent). Each round is one edge-keyed
    // equi-join + min-aggregate; the frontier frame is vertex-bounded.
    "q_graph_bellman3" -> ((s, dir) => bellman3(s, dir)),

    // Rapid-repeat-order audit: same customer placing orders within 2
    // days — the possible-duplicate-submission screen an AP team
    // reviews, with the amount delta as triage evidence (the fixture's
    // continuous prices never collide exactly, so amount is evidence,
    // not a key). The self-join is an EQUI-join on the customer key
    // with the date window as a residual — per-customer bounded
    // (orders per customer is a density property), never all-pairs.
    "q_audit_double_charge" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        col("o_orderkey"), col("o_totalprice"),
        // o_orderdate reads as TIMESTAMP_NTZ; cast to LTZ is value-
        // preserving under the pinned UTC session (Tables.events recipe)
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"))
      val a = o.select(col("o_custkey").as("ck"),
        col("o_orderkey").as("ok1"), col("o_totalprice").as("p1"),
        col("day").as("d1"))
      val b = o.select(col("o_custkey").as("ck"),
        col("o_orderkey").as("ok2"), col("o_totalprice").as("p2"),
        col("day").as("d2"))
      a.join(b, Seq("ck"))
        .filter(col("ok1") < col("ok2") &&
          abs(col("d1") - col("d2")) <= 2)
        .select(col("ck"), col("ok1"), col("ok2"),
          abs(col("d1") - col("d2")).as("day_gap"),
          d4(abs(D(col("p1")) - D(col("p2")))).as("amount_delta"))
        .orderBy("ck", "ok1", "ok2")
    }),

    // Cart-abandonment rate by day: sessions (the 30-min-gap recipe)
    // that click but never purchase, over sessions that click at all —
    // the conversion-leak metric. Session assembly is user-partitioned;
    // the daily report frame is domain-bounded.
    "q_sessions_abandonment" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts_us")).as("tu"))
      val byU = Window.partitionBy("user_id").orderBy("tu", "event_id")
      val sess = ev
        .withColumn("gap",
          when(col("tu") - lag(col("tu"), 1).over(byU) > 1800000000L ||
            lag(col("tu"), 1).over(byU).isNull, 1L).otherwise(0L))
        .withColumn("sid",
          sum(col("gap")).over(byU.rowsBetween(Window.unboundedPreceding, 0)))
      val per = sess.groupBy("user_id", "sid").agg(
        expr("(min(tu) div 86400000000)").as("day"),
        max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicked"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchased"))
      per.filter(col("clicked") === 1)
        .groupBy("day")
        .agg(count(lit(1)).as("n_click_sessions"),
          sum(when(col("purchased") === 0, 1L).otherwise(0L))
            .as("n_abandoned"))
        .withColumn("abandon_rate",
          col("n_abandoned").cast(DoubleType) /
            col("n_click_sessions").cast(DoubleType))
        .orderBy("day")
    })
  )

  /** The declared q_graph_bellman3 body. Each unrolled relaxation round
    * consumes the previous distance frame TWICE (the edge join and the
    * union), so the uncut 3-round plan re-derives every earlier round's
    * subtree — 15 edge-table scans counted in the r13 plan audit
    * (plans/r13/q_graph_bellman3_before.txt). `cutIters` cuts lineage
    * at the VERTEX-BOUNDED distance frame after every round (the
    * componentReps / kmeans iterative precedent), leaving one edge scan
    * per round. Duo A/B at sf0.1 (7 rounds, B slots): cut 0.77 s vs
    * uncut 0.62 — the cut LOSES 25% at fixture scale (the eager
    * checkpoint's materialization barrier costs more than the
    * duplicated sub-second subtrees), so the incumbent stays the
    * default. The toggle is kept for deployments whose edge table is
    * large enough to flip the trade: with cutIters the plan's 15 edge
    * scans become 3 (plans/r13/q_graph_bellman3_*.txt).
    */
  private[graft] def bellman3(s: org.apache.spark.sql.SparkSession,
      dir: String, cutIters: Boolean = false): DataFrame = {
    val edges = AnalyticsQueries.prEdges(s, dir)
      .withColumn("w", w(col("src"), col("dst")))
    var dist = edges.select(col("src").as("node"))
      .filter(col("node") <= 3L).distinct()
      .withColumn("dist", lit(0L))
    for (_ <- 1 to 3) {
      val relaxed = edges.join(dist, col("src") === col("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
      dist = if (cutIters) cutLineage(next) else next
    }
    dist.orderBy("node")
  }

  val oracle: Map[String, String] = Map(
    "q_graph_bellman3" ->
      """WITH ek AS (SELECT DISTINCT user_id,
        |    CAST(props->>'$.k' AS BIGINT) k FROM events
        |  WHERE props->>'$.k' IS NOT NULL),
        |edges AS (SELECT user_id src, 1000000 + k dst FROM ek
        |  UNION ALL SELECT 1000000 + k, user_id FROM ek),
        |we AS (SELECT src, dst, (src + dst) % 97 + 1 w FROM edges),
        |d0 AS (SELECT DISTINCT src node, CAST(0 AS BIGINT) dist
        |  FROM we WHERE src <= 3),
        |d1 AS (SELECT node, CAST(MIN(dist) AS BIGINT) dist FROM (
        |  SELECT node, dist FROM d0
        |  UNION ALL SELECT we.dst, d0.dist + we.w FROM we
        |    JOIN d0 ON we.src = d0.node) GROUP BY node),
        |d2 AS (SELECT node, CAST(MIN(dist) AS BIGINT) dist FROM (
        |  SELECT node, dist FROM d1
        |  UNION ALL SELECT we.dst, d1.dist + we.w FROM we
        |    JOIN d1 ON we.src = d1.node) GROUP BY node),
        |d3 AS (SELECT node, CAST(MIN(dist) AS BIGINT) dist FROM (
        |  SELECT node, dist FROM d2
        |  UNION ALL SELECT we.dst, d2.dist + we.w FROM we
        |    JOIN d2 ON we.src = d2.node) GROUP BY node)
        |SELECT node, dist FROM d3 ORDER BY node""".stripMargin,

    "q_audit_double_charge" ->
      """WITH o AS (SELECT o_custkey ck, o_orderkey, o_totalprice price,
        |    epoch_us(o_orderdate) // 86400000000 d FROM orders)
        |SELECT a.ck, a.o_orderkey ok1, b.o_orderkey ok2,
        |  CAST(abs(a.d - b.d) AS BIGINT) day_gap,
        |  CAST(CAST(CAST(abs(CAST(a.price AS DECIMAL(18,4))
        |      - CAST(b.price AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |    AS VARCHAR) AS DOUBLE) amount_delta
        |FROM o a JOIN o b ON a.ck = b.ck
        |  AND a.o_orderkey < b.o_orderkey AND abs(a.d - b.d) <= 2
        |ORDER BY a.ck, ok1, ok2""".stripMargin,

    "q_sessions_abandonment" ->
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
        |per AS (SELECT user_id, sid, MIN(tu) // 86400000000 d,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      clicked,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      purchased
        |  FROM sid GROUP BY 1, 2)
        |SELECT d AS day, CAST(COUNT(*) AS BIGINT) n_click_sessions,
        |  CAST(SUM(CASE WHEN purchased = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    n_abandoned,
        |  CAST(SUM(CASE WHEN purchased = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) abandon_rate
        |FROM per WHERE clicked = 1 GROUP BY d ORDER BY d""".stripMargin
  )
}
