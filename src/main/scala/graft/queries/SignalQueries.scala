package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-7 sixth-pass batch: partial autocorrelation, multiple-testing
  * correction, bounded closeness centrality, and term burstiness —
  * the second-order signals on top of existing families (ACF →
  * PACF; per-test z → corrected family-wise decisions; degree/PageRank
  * → distance-weighted centrality; tf/idf → dispersion).
  *
  * Determinism posture (SURVEY.md Appendix A): PACF is the
  * Durbin–Levinson closed form over two lag-Pearson coefficients, each
  * from exact decimal moment sums (shared IEEE tails); BH-FDR compares
  * shared-IEEE z scores against PRECOMPUTED inverse-normal literal
  * thresholds (the inv-CDF never runs at query time) with integer rank
  * tie-breaks; closeness is pure int64 (1/d weights scaled by
  * LCM(1,2,3)=6); burstiness is exact int64 counts up to one shared
  * division.
  */
object SignalQueries extends QSet {

  private def hop38(c: Column) =
    c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
  private def sqlHop38(e: String) =
    s"CAST(CAST(CAST($e AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)"

  /** BH thresholds Φ⁻¹(1 − (i/25)·0.05/2), i = 1..25 — precomputed
    * offline (statistics.NormalDist), embedded as literals so neither
    * engine evaluates an inverse normal CDF at query time. */
  private val BhThresholds = Seq(
    3.090232, 2.878162, 2.747781, 2.652070, 2.575829, 2.512144,
    2.457263, 2.408916, 2.365618, 2.326348, 2.290368, 2.257129,
    2.226212, 2.197286, 2.170090, 2.144411, 2.120072, 2.096927,
    2.074855, 2.053749, 2.033520, 2.014091, 1.995393, 1.977368,
    1.959964)

  val queries: Map[String, QFn] = Map(
    // Partial autocorrelation of daily revenue at lags 1 and 2 — the
    // AR-order probe next to q_ts_autocorr (PACF(2) ≈ 0 says an AR(1)
    // model suffices). Sample ACF at each lag is lag-Pearson from
    // exact decimal moment sums over the ~700-row day spine;
    // Durbin–Levinson gives φ11 = ρ1, φ22 = (ρ2 − ρ1²)/(1 − ρ1²) as
    // one shared IEEE expression over the two exact-moment ρs.
    "q_ts_pacf" -> ((s, dir) => tsPacf(s, dir)),

    // Benjamini–Hochberg FDR correction over the 25 per-nation
    // urgent-rate z-tests — the multiple-testing discipline missing
    // from per-test readouts (q_stats_prop_test reads ONE test; a
    // 25-nation scan at α=5% expects a false positive without
    // correction). z against the pooled rate from exact counts; the
    // step-up compares |z| ranks to literal inverse-normal thresholds
    // (m = 25 is the fixed nation domain); the cutoff is a window max
    // over the 25-row frame.
    "q_stats_fdr_bh" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .join(dim(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nation"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("u"))
      val per = o.groupBy("nation")
        .agg(count(lit(1)).as("n_i"), sum(col("u")).as("x_i"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val p0 = sum(col("x_i")).over(all).cast(DoubleType) /
        sum(col("n_i")).over(all).cast(DoubleType)
      val z = (col("x_i").cast(DoubleType) / col("n_i").cast(DoubleType)
        - col("p0")) /
        sqrt(col("p0") * (lit(1.0) - col("p0")) /
          col("n_i").cast(DoubleType))
      val thr = array(BhThresholds.map(lit): _*)
      val ranked = per.withColumn("p0", p0)
        .withColumn("z", z)
        .withColumn("rnk", row_number().over(
          Window.orderBy(abs(col("z")).desc, col("nation"))))
        .withColumn("threshold",
          element_at(thr, col("rnk").cast(IntegerType)))
        .withColumn("cand",
          when(abs(col("z")) >= col("threshold"), col("rnk")))
      ranked.withColumn("cutoff", max(col("cand")).over(all))
        .select(col("nation"), col("n_i"), col("x_i"), col("z"),
          col("rnk").cast(LongType).as("rnk"), col("threshold"),
          when(col("rnk") <= coalesce(col("cutoff"), lit(0L)), 1)
            .otherwise(0).as("rejected"))
        .orderBy("rnk")
    }),

    // Bounded (3-hop) closeness centrality on the affinity graph —
    // the distance-weighted centrality beside HITS/PageRank (how FAST
    // a vertex reaches its neighborhood, not just how many pick it).
    // Shortest distances to 3 hops via layered anti-joins (frontier =
    // pairs not seen closer — the BFS precedent); 1/d weights scale by
    // LCM(1,2,3)=6 so the score Σ 6/d(u,v) is exact int64. Each layer
    // is an edge-keyed equi-join on the degree-bounded top-k graph.
    "q_graph_closeness3" -> ((s, dir) => closeness3(s, dir)),

    // Term burstiness across the 20 sources — the dispersion signal a
    // corpus curator reads next to tf·idf (a term with high variance/
    // mean concentrates in few sources: topical or boilerplate; an
    // even term is function-vocabulary). With the source count fixed
    // at |S|, burstiness = var/mean = (|S|·Σc² − (Σc)²)/(|S|·Σc) is
    // exact int64 up to one shared division — zeros for absent
    // sources are handled by the algebra, never materialized.
    "q_text_term_burstiness" -> ((s, dir) => {
      val sw = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val nSrc = t(s, dir, "documents").select(col("source")).distinct()
        .agg(count(lit(1)).as("n_src"))
      sw.groupBy("w")
        .agg(count(lit(1)).as("df_src"), sum(col("c")).as("total"),
          sum(col("c") * col("c")).as("sq"))
        .crossJoin(broadcast(nSrc))
        .select(col("w").as("term"), col("df_src"), col("total"),
          ((col("n_src") * col("sq") - col("total") * col("total"))
            .cast(DoubleType) /
            (col("n_src") * col("total")).cast(DoubleType))
            .as("burstiness"))
        .orderBy("term")
    })
  )

  /** The declared q_graph_closeness3 body. `ed` and `d2` were already
    * persisted (shared consumers); `share` (r13 optimization round)
    * extends the same treatment to the distance-1 frame `d1` — it has
    * FOUR consumers (the 2-hop wedge source, both anti-joins, the
    * score union), each of which otherwise replays the distinct
    * exchange over the cached edge frame. Edge-bounded, same posture
    * as the existing persists — but duo A/B at sf0.1 (7 rounds, B
    * slots) says OTHERWISE: shared 1.84 s vs unshared 1.44 (+28%).
    * Unlike ed/d2 (whose consumers replay JOINS), d1's consumers
    * replay one distinct over the already-cached ed — cheaper than a
    * second cache round-trip. Incumbent kept; toggle is the record
    * (OPTIMIZATION_r13.md).
    *
    * Cache ownership when flipping `share` (and the sibling r13
    * toggles — graphHits/assortativity/commonNeighbors' `share`,
    * fuzzyName's `shareFuzzyFrames`, bellman3's `cutIters`): like the
    * pre-existing persists here, the frames are never unpersisted by
    * the query — the bench releases them via clearCache() after each
    * sample, and any deployment that enables a toggle and invokes the
    * query repeatedly in one session owns the same cleanup (unpersist
    * or clearCache after the returned frame is consumed), else cached
    * frames accumulate per invocation.
    */
  private[graft] def closeness3(s: org.apache.spark.sql.SparkSession,
      dir: String, share: Boolean = false): DataFrame = {
    val e = GraphMediaQueries.affinityEdges(s, dir)
    val ed = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    val d1raw = ed.distinct()
    val d1 = if (share) d1raw.persist() else d1raw
    val cand2 = d1.select(col("src"), col("dst").as("mid"))
      .join(ed.withColumnRenamed("src", "mid"), Seq("mid"))
      .select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
      .distinct()
    val d2 = cand2.join(d1, Seq("src", "dst"), "left_anti").persist()
    val cand3 = d2.select(col("src"), col("dst").as("mid"))
      .join(ed.withColumnRenamed("src", "mid"), Seq("mid"))
      .select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
      .distinct()
    val d3 = cand3.join(d1, Seq("src", "dst"), "left_anti")
      .join(d2, Seq("src", "dst"), "left_anti")
    val scored = d1.select(col("src"), lit(6L).as("w"))
      .unionAll(d2.select(col("src"), lit(3L).as("w")))
      .unionAll(d3.select(col("src"), lit(2L).as("w")))
      .groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("closeness6"), count(lit(1)).as("reach3"))
    scored.withColumn("rn", row_number().over(
        Window.orderBy(col("closeness6").desc, col("node"))))
      .filter(col("rn") <= 20)
      .select(col("node"), col("reach3"), col("closeness6"))
      .orderBy(col("closeness6").desc, col("node"))
  }

  /** The declared q_ts_pacf body. `shareDaily` (r14) persists the
    * DAY-SPINE daily-revenue frame (~700 rows): rho(1) and rho(2) each
    * re-derive the full orders scan + day aggregate, and the 1-row
    * joined rho frame `j` is ALSO consumed by both unionAll branches —
    * 4 orders scans in the unshared plan (r14 --rescans sweep). The
    * persist materializes the spine once (bounded frame, corpus-pass
    * prefix, 2+ consumers), and the toggled shape additionally emits
    * the two output rows by exploding a 2-element literal array over
    * `j` instead of unioning two selects of it (1 consumer instead of
    * 2 — same two rows). Output toggle-invariant (R14TogglesSpec).
    *
    * REFUTED, default OFF: the cutLineage form of this share tied in
    * B slots (0.407 vs 0.408) with a −34% cold A, but its checkpoint
    * leaf hides the day aggregate from PlanSpec's global-window
    * boundedness proof (the partition-less lag window sits DIRECTLY
    * on the frame); the persist form keeps the proof visible but
    * loses the duo (B 0.452 vs 0.535, +18% — the ~700-row cache
    * round-trip costs more than two warm orders re-aggregates, the
    * same floor as the refuted rfm/kendall/theil-sen checkpoints).
    * The unshared incumbent stays declared. */
  private[graft] def tsPacf(s: org.apache.spark.sql.SparkSession,
      dir: String, shareDaily: Boolean = false): DataFrame = {
    val cutDaily = shareDaily
    val dailyRaw = t(s, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
        "div 86400000000").as("day"),
        D(col("o_totalprice")).as("v"))
      .groupBy("day").agg(sum(col("v")).cast(Dec).as("x"))
    // persist, NOT cutLineage: the lag window below is partition-less
    // and sits DIRECTLY on this frame, and the PlanSpec boundedness
    // gate proves the single-task window safe by finding the day
    // aggregate under it — a checkpoint leaf would hide that proof
    // (an InMemoryRelation keeps it visible; the sharing effect is
    // identical).
    val daily = if (shareDaily) dailyRaw.persist() else dailyRaw
    val w = Window.orderBy("day")
    def rho(k: Int): DataFrame = {
      val pairs = daily.withColumn("y", lag(col("x"), k).over(w))
        .filter(col("y").isNotNull)
      val xd = col("x").cast(DecimalType(19, 4))
      val yd = col("y").cast(DecimalType(19, 4))
      val m = pairs.agg(count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum((xd * xd).cast(DecimalType(38, 8))).as("sxx"),
        sum((yd * yd).cast(DecimalType(38, 8))).as("syy"),
        sum((xd * yd).cast(DecimalType(38, 8))).as("sxy"))
      val nd = col("n").cast(DoubleType)
      m.select(((hop38(col("sxy")) - hop38(col("sx")) *
        hop38(col("sy")) / nd) /
        sqrt((hop38(col("sxx")) - hop38(col("sx")) *
          hop38(col("sx")) / nd) *
          (hop38(col("syy")) - hop38(col("sy")) *
            hop38(col("sy")) / nd))).as(s"r$k"))
    }
    val j = rho(1).crossJoin(broadcast(rho(2)))
    val pacf2 = (col("r2") - col("r1") * col("r1")) /
      (lit(1.0) - col("r1") * col("r1"))
    if (cutDaily)
      j.select(explode(array(
          struct(lit(1L).as("lag"), col("r1").as("acf"),
            col("r1").as("pacf")),
          struct(lit(2L).as("lag"), col("r2").as("acf"),
            pacf2.as("pacf")))).as("s"))
        .select(col("s.lag").as("lag"), col("s.acf").as("acf"),
          col("s.pacf").as("pacf"))
        .orderBy("lag")
    else
      j.select(lit(1L).as("lag"), col("r1").as("acf"),
          col("r1").as("pacf"))
        .unionAll(j.select(lit(2L).as("lag"), col("r2").as("acf"),
          pacf2.as("pacf")))
        .orderBy("lag")
  }

  val oracle: Map[String, String] = Map(
    "q_ts_pacf" -> {
      def rho(k: Int) =
        s"""r$k AS (SELECT
          |    (${sqlHop38(s"sxy$k")} - ${sqlHop38(s"sx$k")}
          |      * ${sqlHop38(s"sy$k")} / CAST(n$k AS DOUBLE))
          |    / sqrt((${sqlHop38(s"sxx$k")} - ${sqlHop38(s"sx$k")}
          |      * ${sqlHop38(s"sx$k")} / CAST(n$k AS DOUBLE))
          |      * (${sqlHop38(s"syy$k")} - ${sqlHop38(s"sy$k")}
          |      * ${sqlHop38(s"sy$k")} / CAST(n$k AS DOUBLE))) r$k
          |  FROM m$k)""".stripMargin
      def moments(k: Int) =
        s"""p$k AS (SELECT CAST(x AS DECIMAL(19,4)) xd,
          |    CAST(lag(x, $k) OVER (ORDER BY "day") AS DECIMAL(19,4)) yd
          |  FROM daily),
          |m$k AS (SELECT CAST(COUNT(*) AS BIGINT) n$k,
          |    SUM(xd) sx$k, SUM(yd) sy$k,
          |    SUM(CAST(xd * xd AS DECIMAL(38,8))) sxx$k,
          |    SUM(CAST(yd * yd AS DECIMAL(38,8))) syy$k,
          |    SUM(CAST(xd * yd AS DECIMAL(38,8))) sxy$k
          |  FROM p$k WHERE yd IS NOT NULL)""".stripMargin
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
        |      AS "day",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) x
        |  FROM orders GROUP BY 1),
        |${moments(1)},
        |${moments(2)},
        |${rho(1)},
        |${rho(2)}
        |SELECT CAST(1 AS BIGINT) lag, r1 acf, r1 pacf FROM r1, r2
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) lag, r2 acf,
        |  (r2 - r1 * r1) / (1.0e0 - r1 * r1) pacf FROM r1, r2
        |ORDER BY lag""".stripMargin
    },

    "q_stats_fdr_bh" -> {
      val thrList = BhThresholds.map(t => s"${t}e0").mkString(", ")
      s"""WITH o AS (SELECT c.c_nationkey nation,
        |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END u
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |per AS (SELECT nation, CAST(COUNT(*) AS BIGINT) n_i,
        |    CAST(SUM(u) AS BIGINT) x_i FROM o GROUP BY 1),
        |g AS (SELECT *,
        |    CAST(SUM(x_i) OVER () AS DOUBLE)
        |      / CAST(SUM(n_i) OVER () AS DOUBLE) p0
        |  FROM per),
        |zt AS (SELECT nation, n_i, x_i,
        |    (CAST(x_i AS DOUBLE) / CAST(n_i AS DOUBLE) - p0)
        |      / sqrt(p0 * (1.0e0 - p0) / CAST(n_i AS DOUBLE)) z
        |  FROM g),
        |rk AS (SELECT *, row_number() OVER
        |      (ORDER BY abs(z) DESC, nation) rnk FROM zt),
        |th AS (SELECT *, list_extract([$thrList], rnk) threshold,
        |    CASE WHEN abs(z) >= list_extract([$thrList], rnk)
        |      THEN rnk END cand
        |  FROM rk),
        |co AS (SELECT *, MAX(cand) OVER () cutoff FROM th)
        |SELECT nation, n_i, x_i, z, CAST(rnk AS BIGINT) rnk, threshold,
        |  CASE WHEN rnk <= COALESCE(cutoff, 0) THEN 1 ELSE 0 END
        |    rejected
        |FROM co ORDER BY rnk""".stripMargin
    },

    "q_graph_closeness3" ->
      s"""WITH ${GraphMediaQueries.edgesSql},
        |ed AS (SELECT a src, b dst FROM e
        |  UNION ALL SELECT b src, a dst FROM e),
        |d1 AS (SELECT DISTINCT src, dst FROM ed),
        |c2 AS (SELECT DISTINCT d.src, e2.dst
        |  FROM d1 d JOIN ed e2 ON d.dst = e2.src
        |  WHERE d.src != e2.dst),
        |d2 AS (SELECT c.src, c.dst FROM c2 c
        |  WHERE NOT EXISTS (SELECT 1 FROM d1
        |    WHERE d1.src = c.src AND d1.dst = c.dst)),
        |c3 AS (SELECT DISTINCT d.src, e2.dst
        |  FROM d2 d JOIN ed e2 ON d.dst = e2.src
        |  WHERE d.src != e2.dst),
        |d3 AS (SELECT c.src, c.dst FROM c3 c
        |  WHERE NOT EXISTS (SELECT 1 FROM d1
        |    WHERE d1.src = c.src AND d1.dst = c.dst)
        |  AND NOT EXISTS (SELECT 1 FROM d2
        |    WHERE d2.src = c.src AND d2.dst = c.dst)),
        |scored AS (SELECT src node,
        |    CAST(SUM(w) AS BIGINT) closeness6,
        |    CAST(COUNT(*) AS BIGINT) reach3
        |  FROM (SELECT src, 6 w FROM d1
        |    UNION ALL SELECT src, 3 FROM d2
        |    UNION ALL SELECT src, 2 FROM d3)
        |  GROUP BY src),
        |r AS (SELECT *, row_number() OVER
        |    (ORDER BY closeness6 DESC, node) rn FROM scored)
        |SELECT node, reach3, closeness6 FROM r WHERE rn <= 20
        |ORDER BY closeness6 DESC, node""".stripMargin,

    "q_text_term_burstiness" ->
      """WITH sw AS (SELECT source, unnest(string_split(text, ' ')) w
        |  FROM documents),
        |c AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) c
        |  FROM sw GROUP BY 1, 2),
        |ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) n_src
        |  FROM documents),
        |g AS (SELECT w, CAST(COUNT(*) AS BIGINT) df_src,
        |    CAST(SUM(c) AS BIGINT) total,
        |    CAST(SUM(c * c) AS BIGINT) sq
        |  FROM c GROUP BY 1)
        |SELECT w term, df_src, total,
        |  CAST(n_src * sq - total * total AS DOUBLE)
        |    / CAST(n_src * total AS DOUBLE) burstiness
        |FROM g, ns ORDER BY term""".stripMargin
  )
}
