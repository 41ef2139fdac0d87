package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-7 first-pass batch: multi-group variance testing, distribution
  * drift, experiment-traffic auditing, peak-decline risk curves, and
  * community detection — the "compare two states of the system"
  * analytics family (the two-sample tests live in ExperimentQueries /
  * RobustStatsQueries; these are their k-group / whole-distribution /
  * whole-graph siblings).
  *
  * Determinism posture (SURVEY.md Appendix A): ANOVA moments are exact
  * decimal through the (38,8) string hop with per-group IEEE terms
  * rounded before an order-free decimal sum; JSD p·ln terms round to
  * 10 dp before their decimal sum; SRM is pure int64 counts up to one
  * shared IEEE division; the drawdown ledger never leaves DECIMAL(18,4);
  * label propagation is integer counts with a (count DESC, label ASC)
  * deterministic tie-break.
  */
object DivergenceQueries extends QSet {

  /** Exact-decimal → double through the exact string at (38,8) — the
    * A.8 hop for moment sums whose products outgrow DECIMAL(18,4). */
  private def hop38(c: Column) =
    c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
  private def sqlHop38(e: String) =
    s"CAST(CAST(CAST($e AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)"

  /** Round-then-decimal-sum of IEEE terms (order-free across partitions). */
  private def nats(c: Column) =
    sum(round(c, 10).cast(DecimalType(28, 10)))
      .cast(StringType).cast(DoubleType)

  val queries: Map[String, QFn] = Map(
    // One-way ANOVA of order value across the 5 order priorities — the
    // k-group generalization of q_stats_ttest (is ANY priority's spend
    // distribution different?). The priority domain is FIXED (TPC-H's
    // five literals), so the whole test collapses to ONE conditional
    // global aggregate (per-group n, Σx, Σx² as exact decimals) and
    // SS-between/within become a fixed-order IEEE expression TREE over
    // the hopped exact moments — no cross-row double summation anywhere,
    // hence no rounding and bit-identical F on both engines. The SS
    // magnitudes (~1e15 at sf0.1) sit above DuckDB's lossy
    // round(double, n) range, which is exactly why the per-group
    // round-then-decimal-sum recipe does NOT apply here.
    "q_stats_anova" -> ((s, dir) => {
      val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val base = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
          D(col("o_totalprice")).as("x"))
      val aggs = Seq(count(lit(1)).as("n_all"),
        sum(col("x")).as("s_all")) ++
        pris.zipWithIndex.flatMap { case (p, i) => Seq(
          sum(when(col("g") === p, 1L).otherwise(0L)).as(s"n$i"),
          sum(when(col("g") === p, col("x"))
            .otherwise(D(lit(0.0)))).as(s"s$i"),
          sum(when(col("g") === p, (col("x") * col("x"))
            .cast(DecimalType(38, 8)))
            .otherwise(lit(0).cast(DecimalType(38, 8)))).as(s"q$i"))
        }
      val row = base.agg(aggs.head, aggs.tail: _*)
      val nd = col("n_all").cast(DoubleType)
      val mean = hop38(col("s_all")) / nd
      def ni(i: Int) = col(s"n$i").cast(DoubleType)
      def mi(i: Int) = hop38(col(s"s$i")) / ni(i)
      def ssbT(i: Int) = ni(i) * (mi(i) - mean) * (mi(i) - mean)
      def sswT(i: Int) =
        hop38(col(s"q$i")) - hop38(col(s"s$i")) * hop38(col(s"s$i")) / ni(i)
      val ssb = (0 until 5).map(ssbT).reduce(_ + _)
      val ssw = (0 until 5).map(sswT).reduce(_ + _)
      row.select(lit(5L).as("k"), col("n_all").as("n"),
        ssb.as("ss_between"), ssw.as("ss_within"),
        ((ssb / lit(4.0)) /
          (ssw / (col("n_all") - 5L).cast(DoubleType))).as("f_stat"))
        .orderBy("k")
    }),

    // Jensen–Shannon divergence of the event-type mix between the first
    // and second half of the event timeline — the symmetric, bounded
    // drift monitor (q_stats_psi is the binned-numeric twin; JSD is the
    // categorical one a feed-health dashboard plots daily). The split
    // point is exact integer arithmetic on the µs timestamps; the mix
    // is a 5-row exact-count frame; each p·ln term rounds to 10 dp
    // before the order-free decimal sum. One fact scan + a broadcast
    // 1-row bound attach — nothing else grows with data.
    "q_stats_js_divergence" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type").as("et"),
        unix_micros(col("ts_us")).as("tu"))
      val mid = ev.agg(expr("(min(tu) + max(tu)) div 2").as("mid"))
      val c = ev.crossJoin(broadcast(mid))
        .groupBy("et")
        .agg(sum(when(col("tu") < col("mid"), 1L).otherwise(0L)).as("ca"),
          sum(when(col("tu") >= col("mid"), 1L).otherwise(0L)).as("cb"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val p = c
        .withColumn("na", sum(col("ca")).over(all))
        .withColumn("nb", sum(col("cb")).over(all))
        .withColumn("pa", col("ca").cast(DoubleType) /
          col("na").cast(DoubleType))
        .withColumn("pb", col("cb").cast(DoubleType) /
          col("nb").cast(DoubleType))
        .withColumn("m", (col("pa") + col("pb")) / 2.0)
        .withColumn("ta", when(col("pa") > 0.0,
          col("pa") * log(col("pa") / col("m"))).otherwise(0.0))
        .withColumn("tb", when(col("pb") > 0.0,
          col("pb") * log(col("pb") / col("m"))).otherwise(0.0))
      p.groupBy("na", "nb")
        .agg(nats(col("ta")).as("sa"), nats(col("tb")).as("sb"))
        .select(col("na"), col("nb"),
          round((col("sa") + col("sb")) / 2.0, 6).as("jsd_nats"),
          round(((col("sa") + col("sb")) / 2.0) /
            lit(0.6931471805599453), 6).as("jsd_norm"))
        .orderBy("na")
    }),

    // Sample-ratio-mismatch audit — the first thing an experimentation
    // platform checks before reading ANY test result: with arms
    // assigned by user-id parity, per-segment distinct-user counts must
    // be 50/50; chi² = (nA−nB)²/(nA+nB) against the df=1 5% critical
    // value flags broken assignment. Distinct is keyed by
    // (segment, user) — partial-agg friendly; everything after is a
    // ≤ 6-row frame; the flag compares the same IEEE value both engines
    // compute from exact int64 counts.
    "q_stats_srm" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type").as("et"),
        col("user_id"))
      val u = ev.distinct()
        .unionAll(ev.select(lit("ALL").as("et"), col("user_id")).distinct())
      val c = u.groupBy("et")
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_a"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      val chi2 = ((col("n_a") - col("n_b")) *
        (col("n_a") - col("n_b"))).cast(DoubleType) /
        (col("n_a") + col("n_b")).cast(DoubleType)
      c.select(col("et").as("segment"), col("n_a"), col("n_b"),
          round(chi2, 6).as("chi2"),
          when(chi2 > lit(3.841459), 1).otherwise(0).as("srm_flag"))
        .orderBy("segment")
    }),

    // Maximum drawdown of the daily-revenue series — the worst decline
    // from the historical peak (the risk curve a finance/ops dashboard
    // keeps beside q_ts_anomaly). The whole ledger stays in exact
    // DECIMAL(18,4): daily sums, running peak (window max), drawdown
    // subtraction — so the argmax row is unambiguous on both engines
    // (ties broken by earliest day). All windows ride the ~700-row
    // day spine, never the fact.
    "q_ts_drawdown" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("day"),
          D(col("o_totalprice")).as("v"))
        .groupBy("day").agg(sum(col("v")).cast(Dec).as("r"))
      val wrun = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = daily
        .withColumn("peak", max(col("r")).over(wrun).cast(Dec))
        .withColumn("dd", (max(col("r")).over(wrun) - col("r")).cast(Dec))
      val top = c
        .withColumn("rn", row_number().over(
          Window.orderBy(col("dd").desc, col("day"))))
        .filter(col("rn") === 1)
        .select(col("day").as("trough_day"), col("r").as("trough_rev"),
          col("peak").as("peak_rev"), col("dd").as("max_drawdown"))
      val pk = daily.join(broadcast(top),
          daily("r") === top("peak_rev") &&
            daily("day") <= top("trough_day"))
        .agg(min(daily("day")).as("peak_day"))
      // final revenue columns hop decimal→string→double (exact at
      // scale 4; the comparator reads DuckDB decimals as float64)
      def dd(c: Column) = c.cast(StringType).cast(DoubleType)
      top.crossJoin(broadcast(pk))
        .select(col("peak_day"), col("trough_day"),
          dd(col("peak_rev")).as("peak_rev"),
          dd(col("trough_rev")).as("trough_rev"),
          dd(col("max_drawdown")).as("max_drawdown"))
        .orderBy("peak_day")
    }),

    // Label-propagation communities on the supplier affinity graph —
    // the clustering counterpart of q_graph_triangles' cohesion census
    // (LPA is the standard near-linear community detector). Two
    // SYNCHRONOUS rounds (the unrolled-iteration precedent of
    // q_graph_bellman3/kcore3): each vertex takes the most frequent
    // label among its neighbors, ties broken by smallest label — fully
    // deterministic. Each round is one edge-keyed equi-join + a
    // vertex-partitioned count/argmax window; the graph is the top-k
    // sparsified projection, so degree (and thus round cost) is bounded
    // at every scale. Output: community size histogram.
    "q_graph_label_prop" -> ((s, dir) => {
      val e = GraphMediaQueries.affinityEdges(s, dir)
      val ed = e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      var lab = ed.select(col("src").as("v")).distinct()
        .withColumn("label", col("v"))
      for (_ <- 1 to 2) {
        val cnts = ed
          .join(lab.withColumnRenamed("v", "dst"), Seq("dst"))
          .groupBy("src", "label").agg(count(lit(1)).as("c"))
        lab = cnts
          .withColumn("rn", row_number().over(Window.partitionBy("src")
            .orderBy(col("c").desc, col("label"))))
          .filter(col("rn") === 1)
          .select(col("src").as("v"), col("label"))
      }
      lab.groupBy("label").agg(count(lit(1)).as("n_members"))
        .select(col("label").as("community"), col("n_members"))
        .orderBy(col("n_members").desc, col("community"))
    })
  )

  /** ANOVA oracle, generated from the same fixed priority domain so the
    * conditional aggregates and the SS expression trees are shape-
    * identical to the Spark side (bit-identical IEEE, no rounding). */
  private val anovaSql: String = {
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    val dec = "CAST(o_totalprice AS DECIMAL(18,4))"
    val sq = "CAST(CAST(o_totalprice AS DECIMAL(19,4)) " +
      "* CAST(o_totalprice AS DECIMAL(18,4)) AS DECIMAL(38,8))"
    val groupAggs = pris.zipWithIndex.map { case (p, i) =>
      s"CAST(SUM(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END) " +
        s"AS BIGINT) n$i, " +
        s"SUM(CASE WHEN o_orderpriority = '$p' THEN $dec " +
        s"ELSE CAST(0 AS DECIMAL(18,4)) END) s$i, " +
        s"SUM(CASE WHEN o_orderpriority = '$p' THEN $sq " +
        s"ELSE CAST(0 AS DECIMAL(38,8)) END) q$i"
    }.mkString(", ")
    def mi(i: Int) = s"(${sqlHop38(s"s$i")} / CAST(n$i AS DOUBLE))"
    val mean = s"(${sqlHop38("s_all")} / CAST(n_all AS DOUBLE))"
    val ssb = (0 until 5).map(i =>
      s"(CAST(n$i AS DOUBLE) * (${mi(i)} - $mean) * (${mi(i)} - $mean))")
      .mkString(" + ")
    val ssw = (0 until 5).map(i =>
      s"(${sqlHop38(s"q$i")} - ${sqlHop38(s"s$i")} * ${sqlHop38(s"s$i")}" +
        s" / CAST(n$i AS DOUBLE))").mkString(" + ")
    s"""WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) n_all,
      |    SUM($dec) s_all, $groupAggs
      |  FROM orders)
      |SELECT CAST(5 AS BIGINT) k, n_all n,
      |  $ssb AS ss_between,
      |  $ssw AS ss_within,
      |  (($ssb) / 4.0e0) / (($ssw) / CAST(n_all - 5 AS DOUBLE)) f_stat
      |FROM m ORDER BY k""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_stats_anova" -> anovaSql,

    "q_stats_js_divergence" ->
      """WITH ev AS (SELECT event_type et, epoch_us(ts) tu FROM events),
        |mid AS (SELECT (MIN(tu) + MAX(tu)) // 2 mid FROM ev),
        |c AS (SELECT et,
        |    CAST(SUM(CASE WHEN tu < mid THEN 1 ELSE 0 END) AS BIGINT) ca,
        |    CAST(SUM(CASE WHEN tu >= mid THEN 1 ELSE 0 END) AS BIGINT) cb
        |  FROM ev, mid GROUP BY et),
        |p AS (SELECT
        |    CAST(SUM(ca) OVER () AS BIGINT) na,
        |    CAST(SUM(cb) OVER () AS BIGINT) nb,
        |    CAST(ca AS DOUBLE) / CAST(SUM(ca) OVER () AS DOUBLE) pa,
        |    CAST(cb AS DOUBLE) / CAST(SUM(cb) OVER () AS DOUBLE) pb
        |  FROM c),
        |terms AS (SELECT na, nb,
        |    CASE WHEN pa > 0.0e0
        |      THEN pa * ln(pa / ((pa + pb) / 2.0e0)) ELSE 0.0e0 END ta,
        |    CASE WHEN pb > 0.0e0
        |      THEN pb * ln(pb / ((pa + pb) / 2.0e0)) ELSE 0.0e0 END tb
        |  FROM p),
        |r AS (SELECT na, nb,
        |    CAST(CAST(SUM(CAST(round(ta, 10) AS DECIMAL(28,10)))
        |      AS VARCHAR) AS DOUBLE) sa,
        |    CAST(CAST(SUM(CAST(round(tb, 10) AS DECIMAL(28,10)))
        |      AS VARCHAR) AS DOUBLE) sb
        |  FROM terms GROUP BY 1, 2)
        |SELECT na, nb, round((sa + sb) / 2.0e0, 6) jsd_nats,
        |  round(((sa + sb) / 2.0e0) / 0.6931471805599453e0, 6) jsd_norm
        |FROM r ORDER BY na""".stripMargin,

    "q_stats_srm" ->
      """WITH ev AS (SELECT event_type et, user_id FROM events),
        |u AS (SELECT DISTINCT et, user_id FROM ev
        |  UNION ALL SELECT DISTINCT 'ALL' et, user_id FROM ev),
        |c AS (SELECT et,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) n_b
        |  FROM u GROUP BY et)
        |SELECT et segment, n_a, n_b,
        |  round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE), 6) chi2,
        |  CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE) > 3.841459e0
        |    THEN 1 ELSE 0 END srm_flag
        |FROM c ORDER BY segment""".stripMargin,

    "q_ts_drawdown" ->
      """WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
        |      AS "day",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) r
        |  FROM orders GROUP BY 1),
        |c AS (SELECT "day", r,
        |    CAST(MAX(r) OVER win AS DECIMAL(18,4)) peak,
        |    CAST(MAX(r) OVER win - r AS DECIMAL(18,4)) dd
        |  FROM daily
        |  WINDOW win AS (ORDER BY "day" ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)),
        |top AS (SELECT "day" trough_day, r trough_rev, peak peak_rev,
        |    dd max_drawdown
        |  FROM (SELECT *, row_number() OVER
        |      (ORDER BY dd DESC, "day") rn FROM c)
        |  WHERE rn = 1),
        |pk AS (SELECT MIN(d."day") peak_day
        |  FROM daily d, top
        |  WHERE d.r = top.peak_rev AND d."day" <= top.trough_day)
        |SELECT pk.peak_day, top.trough_day,
        |  CAST(CAST(top.peak_rev AS VARCHAR) AS DOUBLE) peak_rev,
        |  CAST(CAST(top.trough_rev AS VARCHAR) AS DOUBLE) trough_rev,
        |  CAST(CAST(top.max_drawdown AS VARCHAR) AS DOUBLE) max_drawdown
        |FROM top, pk ORDER BY pk.peak_day""".stripMargin,

    "q_graph_label_prop" ->
      s"""WITH ${GraphMediaQueries.edgesSql},
        |ed AS (SELECT a src, b dst FROM e
        |  UNION ALL SELECT b src, a dst FROM e),
        |l0 AS (SELECT DISTINCT src v, src lbl FROM ed),
        |c1 AS (SELECT ed.src, l.lbl, CAST(COUNT(*) AS BIGINT) c
        |  FROM ed JOIN l0 l ON ed.dst = l.v GROUP BY 1, 2),
        |l1 AS (SELECT src v, lbl FROM (SELECT src, lbl,
        |    row_number() OVER (PARTITION BY src
        |      ORDER BY c DESC, lbl) rn FROM c1) WHERE rn = 1),
        |c2 AS (SELECT ed.src, l.lbl, CAST(COUNT(*) AS BIGINT) c
        |  FROM ed JOIN l1 l ON ed.dst = l.v GROUP BY 1, 2),
        |l2 AS (SELECT src v, lbl FROM (SELECT src, lbl,
        |    row_number() OVER (PARTITION BY src
        |      ORDER BY c DESC, lbl) rn FROM c2) WHERE rn = 1)
        |SELECT lbl community, CAST(COUNT(*) AS BIGINT) n_members
        |FROM l2 GROUP BY 1 ORDER BY n_members DESC, community""".stripMargin
  )
}
