package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 twentieth-pass batch: rank statistics, association measures,
  * and weight-aware sampling — the monotone-dependence / category-
  * association / corpus-reweighting screens a data-quality team runs
  * alongside the Pearson/chi² ones already in AnalyticsQueries.
  *
  * Determinism posture (SURVEY.md Appendix A): Spearman is computed
  * ENTIRELY in integer arithmetic up to the final 3-op IEEE division
  * (doubled average ranks stay integers; centered cross-products stay
  * inside BIGINT by construction), Cramér's V rounds each chi² cell
  * term before an order-free decimal sum, the rolling correlation keeps
  * every windowed sum in exact DECIMAL, and the weighted sample ranks
  * by an Efraimidis–Spiliotis key whose only cross-engine risk (1-ulp
  * `ln`) is confined to rank boundaries — verified hash-identical at
  * the three graded SFs.
  */
object RankStatsQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Spearman rank correlation of quantity vs discount per return
    // flag — the monotone-dependence screen (Pearson on AVERAGE ranks,
    // the tie-correct formulation; q_agg_corr is the linear twin).
    // Scale shape: both variables are low-cardinality (50 quantities ×
    // 11 discount steps), so ranks come from VALUE-LEVEL margins, not a
    // per-row sort: one map-side-combining groupBy to ≤ 550 cells per
    // flag, cumulative counts over the ≤ 50-row margins, then exact
    // integer moments of the cell frame. No global sort, no per-row
    // window — this survives 100 TB as a single partial-agg scan.
    // Exactness: DOUBLED average ranks 2·r = 2·cumLess + cnt + 1 are
    // integers; centered by the doubled mean (n+1) they stay integers
    // ≤ n; Σ cnt·Rx'·Ry' ≤ n·max|Rx'|·max|Ry'| ≈ 2.2e17 < 2^63 — every
    // moment is an exact BIGINT on both engines, and ρ is the same
    // 3-operation IEEE expression over identical integers.
    "q_stats_spearman" -> ((s, dir) => {
      val cells = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          col("l_quantity").cast(LongType).as("xq"),
          round(col("l_discount") * 100).cast(LongType).as("yd"))
        .groupBy("rf", "xq", "yd").agg(count(lit(1)).as("cnt"))
      def margin(k: String, rank: String) = {
        val w = Window.partitionBy("rf").orderBy(k)
        cells.groupBy("rf", k).agg(sum(col("cnt")).as("ck"))
          .withColumn(rank, lit(2) * sum(col("ck")).over(w)
            - col("ck") + 1)
          .drop("ck")
      }
      val n = Window.partitionBy("rf")
      cells
        .join(broadcast(margin("xq", "rx")), Seq("rf", "xq"))
        .join(broadcast(margin("yd", "ry")), Seq("rf", "yd"))
        .withColumn("n", sum(col("cnt")).over(n))
        .withColumn("rxc", col("rx") - col("n") - 1)
        .withColumn("ryc", col("ry") - col("n") - 1)
        .groupBy("rf")
        .agg(max(col("n")).as("n"),
          sum(col("cnt") * col("rxc") * col("ryc")).as("sxy"),
          sum(col("cnt") * col("rxc") * col("rxc")).as("sxx"),
          sum(col("cnt") * col("ryc") * col("ryc")).as("syy"))
        .select(col("rf").as("l_returnflag"), col("n"),
          (col("sxy").cast(DoubleType) /
            sqrt(col("sxx").cast(DoubleType) *
              col("syy").cast(DoubleType))).as("spearman"))
        .orderBy("l_returnflag")
    }),

    // Cramér's V between order priority and order status — the
    // effect-size companion to q_stats_chi2 (χ² alone grows with n; V
    // normalizes to [0,1] so "is this association MATERIAL" is
    // answerable at any scale). One partial-agg scan to the r×c
    // contingency cells (≤ 15 rows), margins via windows over that tiny
    // frame, χ² cell terms rounded to 10 dp then summed as exact
    // decimal (order-free on both engines).
    "q_stats_cramers_v" -> ((s, dir) => {
      val cells = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("p"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("nij"))
      val all = Window.partitionBy(lit(1))
      cells
        .withColumn("ri", sum(col("nij")).over(Window.partitionBy("p")))
        .withColumn("cj", sum(col("nij")).over(Window.partitionBy("st")))
        .withColumn("n", sum(col("nij")).over(all))
        .withColumn("r", size(collect_set(col("p")).over(all)))
        .withColumn("c", size(collect_set(col("st")).over(all)))
        .withColumn("e", (col("ri") * col("cj")).cast(DoubleType)
          / col("n").cast(DoubleType))
        .withColumn("term", round(
          (col("nij").cast(DoubleType) - col("e"))
            * (col("nij").cast(DoubleType) - col("e")) / col("e"), 10))
        .groupBy("n", "r", "c")
        .agg(sum(col("term").cast(DecimalType(28, 10)))
          .cast(StringType).cast(DoubleType).as("chi2"))
        .select(col("n"), col("r").cast(LongType).as("n_rows_dim"),
          col("c").cast(LongType).as("n_cols_dim"),
          round(col("chi2"), 6).as("chi2"),
          round(sqrt(col("chi2") / (col("n").cast(DoubleType)
            * (least(col("r"), col("c")) - 1).cast(DoubleType))), 6)
            .as("cramers_v"))
        .orderBy("n")
    }),

    // 7-day rolling Pearson correlation between daily revenue and
    // daily shipped quantity — the relationship-drift monitor (a stable
    // positive correlation breaking down flags a mix shift). The
    // windowed series is the DAY-granular aggregate (bounded by the
    // calendar, ~2.4k rows at any corpus size), so the unpartitioned
    // ordered window rides a tiny frame — the q_tpch_q15 precedent —
    // while the one real scan folds map-side. All rolling sums are
    // exact decimals; corr is one shared IEEE expression per row.
    "q_ts_rolling_corr" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("day"),
          D(col("l_extendedprice")).as("rev"),
          D(col("l_quantity")).as("qty"))
        .groupBy("day")
        // re-narrow the widened sum so x*y stays inside DECIMAL(38,·)
        // exactness on BOTH engines (daily totals fit (18,4) at any SF)
        .agg(sum(col("rev")).cast(Dec).as("x"),
          sum(col("qty")).cast(Dec).as("y"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      def hop(c: org.apache.spark.sql.Column) =
        c.cast(StringType).cast(DoubleType)
      daily
        .withColumn("m", count(lit(1)).over(w))
        .withColumn("sx", hop(sum(col("x")).over(w)))
        .withColumn("sy", hop(sum(col("y")).over(w)))
        .withColumn("sxy", hop(sum(col("x") * col("y")).over(w)))
        .withColumn("sxx", hop(sum(col("x") * col("x")).over(w)))
        .withColumn("syy", hop(sum(col("y") * col("y")).over(w)))
        .filter(col("m") === 7)
        .select(col("day"),
          ((lit(7.0) * col("sxy") - col("sx") * col("sy")) /
            sqrt((lit(7.0) * col("sxx") - col("sx") * col("sx")) *
              (lit(7.0) * col("syy") - col("sy") * col("sy"))))
            .as("corr_7d"))
        .orderBy("day")
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spiliotis
    // A-ES): top-10 documents per language with probability
    // proportional to length — the corpus-reweighting primitive (length
    // ∝ token budget). Priority = ln(u)/w with u a deterministic md5
    // uniform in (0,1), so the draw is reproducible on any engine and
    // partitioning; ranking uses the bounded TopKAgg aggregator
    // (functions/TopK.scala), so each map partition ships ≤ 10
    // candidates per language instead of window-sorting the corpus —
    // the 100 TB shape. n_chars reattaches by broadcasting the ≤
    // 10·|langs| winners against the corpus scan.
    "q_sample_weighted" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAgg(10))
      val docs = t(s, dir, "documents").filter(col("n_chars") > 0)
      val winners = docs
        .withColumn("u",
          (expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 6), " +
            "16, 10) as bigint)") + 1).cast(DoubleType) / 16777217.0d)
        .withColumn("pri", log(col("u")) / col("n_chars").cast(DoubleType))
        .groupBy("lang")
        .agg(topk(col("pri"), col("doc_id")).as("tk"))
        .select(col("lang"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("lang"), (col("p") + 1).cast(LongType).as("rk"),
          col("e.id").as("doc_id"))
      docs.select("doc_id", "n_chars")
        .join(broadcast(winners), Seq("doc_id"))
        .select("lang", "rk", "doc_id", "n_chars")
        .orderBy("lang", "rk")
    }),

    // Bounded k-core peel (k=3, 3 rounds) on the affinity graph — the
    // degenerate-fringe trim run before community detection (nodes that
    // can't sustain 3 mutual ties are noise for clustering). Each round
    // is one degree aggregate + two equi-joins against the survivor
    // set — vertex-bounded frames, co-partitioned on the edge key, the
    // q_graph_bellman3 unrolled-iteration precedent. 3 rounds is the
    // documented fixed-point budget for the fixture diameter; a
    // production run loops until the survivor count stops moving (one
    // driver-side scalar per round).
    "q_graph_kcore3" -> ((s, dir) => {
      var edges = AnalyticsQueries.prEdges(s, dir).select("src", "dst")
      for (_ <- 1 to 3) {
        val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 3).select("src")
        edges = edges
          .join(keep, Seq("src"))
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"))
          .select("src", "dst")
      }
      edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .orderBy("node")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stats_spearman" ->
      """WITH base AS (SELECT l_returnflag rf,
        |    CAST(l_quantity AS BIGINT) xq,
        |    CAST(round(l_discount * 100) AS BIGINT) yd
        |  FROM lineitem),
        |cells AS (SELECT rf, xq, yd, CAST(COUNT(*) AS BIGINT) cnt
        |  FROM base GROUP BY 1, 2, 3),
        |xm AS (SELECT rf, xq, 2 * SUM(SUM(cnt)) OVER
        |      (PARTITION BY rf ORDER BY xq) - SUM(cnt) + 1 rx
        |  FROM cells GROUP BY rf, xq),
        |ym AS (SELECT rf, yd, 2 * SUM(SUM(cnt)) OVER
        |      (PARTITION BY rf ORDER BY yd) - SUM(cnt) + 1 ry
        |  FROM cells GROUP BY rf, yd),
        |j AS (SELECT c.rf, c.cnt, xm.rx, ym.ry,
        |    SUM(c.cnt) OVER (PARTITION BY c.rf) n
        |  FROM cells c JOIN xm ON c.rf = xm.rf AND c.xq = xm.xq
        |    JOIN ym ON c.rf = ym.rf AND c.yd = ym.yd),
        |m AS (SELECT rf, CAST(MAX(n) AS BIGINT) n,
        |    CAST(SUM(cnt * (rx - n - 1) * (ry - n - 1)) AS BIGINT) sxy,
        |    CAST(SUM(cnt * (rx - n - 1) * (rx - n - 1)) AS BIGINT) sxx,
        |    CAST(SUM(cnt * (ry - n - 1) * (ry - n - 1)) AS BIGINT) syy
        |  FROM j GROUP BY rf)
        |SELECT rf l_returnflag, n,
        |  CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE)
        |    * CAST(syy AS DOUBLE)) spearman
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_stats_cramers_v" ->
      """WITH cells AS (SELECT o_orderpriority p, o_orderstatus st,
        |    CAST(COUNT(*) AS BIGINT) nij FROM orders GROUP BY 1, 2),
        |dims AS (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) r,
        |    CAST(COUNT(DISTINCT st) AS BIGINT) c,
        |    CAST(SUM(nij) AS BIGINT) n FROM cells),
        |x AS (SELECT nij,
        |    SUM(nij) OVER (PARTITION BY p) ri,
        |    SUM(nij) OVER (PARTITION BY st) cj
        |  FROM cells),
        |t AS (SELECT d.n, d.r, d.c,
        |    round((CAST(nij AS DOUBLE) - CAST(ri * cj AS DOUBLE)
        |        / CAST(d.n AS DOUBLE))
        |      * (CAST(nij AS DOUBLE) - CAST(ri * cj AS DOUBLE)
        |        / CAST(d.n AS DOUBLE))
        |      / (CAST(ri * cj AS DOUBLE) / CAST(d.n AS DOUBLE)), 10) term
        |  FROM x, dims d),
        |s AS (SELECT CAST(MAX(n) AS BIGINT) n,
        |    CAST(MAX(r) AS BIGINT) n_rows_dim,
        |    CAST(MAX(c) AS BIGINT) n_cols_dim,
        |    CAST(CAST(SUM(CAST(term AS DECIMAL(28,10))) AS VARCHAR)
        |      AS DOUBLE) chi2
        |  FROM t GROUP BY n, r, c)
        |SELECT n, n_rows_dim, n_cols_dim, round(chi2, 6) chi2,
        |  round(sqrt(chi2 / (CAST(n AS DOUBLE)
        |    * CAST(least(n_rows_dim, n_cols_dim) - 1 AS DOUBLE))), 6)
        |    cramers_v
        |FROM s ORDER BY n""".stripMargin,

    "q_ts_rolling_corr" ->
      """WITH daily AS (SELECT
        |    epoch_us(l_shipdate) // 86400000000 AS "day",
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |      AS DECIMAL(19,4)) x,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |      AS DECIMAL(19,4)) y
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT "day",
        |    COUNT(*) OVER win m,
        |    CAST(CAST(SUM(x) OVER win AS VARCHAR) AS DOUBLE) sx,
        |    CAST(CAST(SUM(y) OVER win AS VARCHAR) AS DOUBLE) sy,
        |    CAST(CAST(SUM(x * y) OVER win AS VARCHAR) AS DOUBLE) sxy,
        |    CAST(CAST(SUM(x * x) OVER win AS VARCHAR) AS DOUBLE) sxx,
        |    CAST(CAST(SUM(y * y) OVER win AS VARCHAR) AS DOUBLE) syy
        |  FROM daily
        |  WINDOW win AS (ORDER BY "day" ROWS BETWEEN 6 PRECEDING
        |    AND CURRENT ROW))
        |SELECT "day",
        |  (7.0e0 * sxy - sx * sy) / sqrt((7.0e0 * sxx - sx * sx)
        |    * (7.0e0 * syy - sy * sy)) corr_7d
        |FROM w WHERE m = 7 ORDER BY "day"""".stripMargin,

    "q_sample_weighted" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
        |          1, 6)) AS BIGINT) + 1) / 16777217.0e0)
        |      / CAST(n_chars AS DOUBLE) pri
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT lang, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY pri DESC, doc_id) AS BIGINT) rk
        |  FROM d)
        |SELECT lang, rk, doc_id, n_chars FROM r
        |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,

    "q_graph_kcore3" ->
      """WITH ek AS (SELECT DISTINCT user_id,
        |    CAST(props->>'$.k' AS BIGINT) k FROM events
        |  WHERE props->>'$.k' IS NOT NULL),
        |e0 AS (SELECT user_id src, 1000000 + k dst FROM ek
        |  UNION ALL SELECT 1000000 + k, user_id FROM ek),
        |k1 AS (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) >= 3),
        |e1 AS (SELECT e.src, e.dst FROM e0 e
        |  JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
        |k2 AS (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 3),
        |e2 AS (SELECT e.src, e.dst FROM e1 e
        |  JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
        |k3 AS (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 3),
        |e3 AS (SELECT e.src, e.dst FROM e2 e
        |  JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
        |SELECT src node, CAST(COUNT(*) AS BIGINT) deg
        |FROM e3 GROUP BY src ORDER BY node""".stripMargin
  )
}
