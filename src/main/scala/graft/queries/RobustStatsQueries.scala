package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 twenty-second-pass batch: robust / nonparametric statistics
  * and supervised feature encoding — Theil–Sen slope, Mann–Whitney U,
  * Zipf-law fit, weight-of-evidence binning, Cohen's d. The common
  * scale trick (q_stats_spearman precedent): every pairwise statistic
  * runs on the BOUNDED VALUE GRID (≤ 50 quantities × 11 discount
  * steps), so "all pairs of observations" becomes "all pairs of cells"
  * — one partial-agg scan plus joins over ≤ 550-row frames at any
  * corpus size.
  *
  * Determinism: cell counts and cross-products are BIGINT-exact; the
  * only transcendental (`ln` in WOE / Zipf) is rounded before any sum
  * or output, and final statistics are shared IEEE expressions over
  * string-hopped exact moments.
  */
object RobustStatsQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Theil–Sen robust slope of discount (centi-units) on quantity per
    // return flag: the WEIGHTED median of pairwise cell slopes, each
    // cell pair carrying weight c1·c2 observation pairs. Outlier-proof
    // where OLS (q_ml_regression_metrics) is not. The pair frame is
    // value-grid-bounded; the weighted median is a cumulative-weight
    // window over the ≤ 550²-row slope frame — nothing scales with n.
    "q_stats_theil_sen" -> ((s, dir) => theilSen(s, dir)),

    // Mann–Whitney U (rank-sum) comparing the quantity distribution of
    // returned (R) vs accepted (A) line items — the nonparametric twin
    // of q_stats_ttest. From value-level counts: doubled U stays an
    // exact BIGINT (2U = Σ_v cR(v)·(2·cumA(<v) + cA(v))); the normal
    // approximation applies the standard tie-corrected variance. One
    // partial-agg scan + ≤ 50-row margin windows.
    "q_stats_mannwhitney" -> ((s, dir) => {
      val m = t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_quantity").cast(LongType).as("v"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("isR"))
        .groupBy("v")
        .agg(sum(col("isR")).as("cr"),
          sum(lit(1L) - col("isR")).as("ca"))
      val wv = Window.orderBy("v")
      val g = m
        .withColumn("cuma", coalesce(sum(col("ca"))
          .over(wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .agg(sum(col("cr")).as("nr"), sum(col("ca")).as("na"),
          sum(col("cr") * (lit(2) * col("cuma") + col("ca"))).as("u2"),
          // tie correction Σ t³−t over the POOLED value multiset
          sum((col("cr") + col("ca")) * (col("cr") + col("ca"))
            * (col("cr") + col("ca")) - (col("cr") + col("ca")))
            .as("ties"))
      g.select(col("nr").as("n_r"), col("na").as("n_a"),
        (col("u2").cast(DoubleType) / 2.0).as("u"),
        round(
          (col("u2").cast(DoubleType) / 2.0 -
            col("nr").cast(DoubleType) * col("na").cast(DoubleType) / 2.0) /
            sqrt(col("nr").cast(DoubleType) * col("na").cast(DoubleType)
              / 12.0 * ((col("nr") + col("na") + 1).cast(DoubleType) -
                col("ties").cast(DoubleType) /
                  ((col("nr") + col("na")).cast(DoubleType) *
                    (col("nr") + col("na") - 1).cast(DoubleType)))), 6)
          .as("z"))
        .orderBy("n_r")
    }),

    // Zipf-law fit per language: OLS of ln(freq) on ln(rank) over the
    // top-100 terms (distributed TakeOrdered — per-partition heaps, no
    // global window on the term table); a healthy natural-language
    // corpus fits slope ≈ −1, templated text flattens. ln terms round
    // to 8 dp before exact decimal moments; slope/intercept are shared
    // IEEE over string-hopped sums.
    "q_text_zipf_fit" -> ((s, dir) => {
      val top = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
        .withColumn("rk", row_number().over(Window.partitionBy("lang")
          .orderBy(col("freq").desc, col("term"))))
        .filter(col("rk") <= 100)
      val lx = round(log(col("rk").cast(DoubleType)), 8)
      val ly = round(log(col("freq").cast(DoubleType)), 8)
      def hop(c: org.apache.spark.sql.Column) =
        c.cast(StringType).cast(DoubleType)
      top.select(col("lang"), lx.cast(DecimalType(18, 8)).as("x"),
        ly.cast(DecimalType(18, 8)).as("y"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_terms"),
          hop(sum(col("x"))).as("sx"), hop(sum(col("y"))).as("sy"),
          hop(sum(col("x") * col("y"))).as("sxy"),
          hop(sum(col("x") * col("x"))).as("sxx"))
        .withColumn("nd", col("n_terms").cast(DoubleType))
        .select(col("lang"), col("n_terms"),
          round((col("nd") * col("sxy") - col("sx") * col("sy")) /
            (col("nd") * col("sxx") - col("sx") * col("sx")), 6)
            .as("zipf_slope"))
        .orderBy("lang")
    }),

    // Weight-of-evidence encoding of quantity bins against the
    // "returned" target — the credit-scoring featurization: per 5-unit
    // bin, WOE = ln(share-of-positives / share-of-negatives), plus the
    // information value Σ (gs−bs)·WOE as the bin-set strength summary.
    // Counts are one partial-agg scan; WOE math rides the 10-row bin
    // frame. ln is rounded before the IV sum (order-free decimal).
    "q_feat_woe" -> ((s, dir) => {
      val binned = t(s, dir, "lineitem")
        .select((((col("l_quantity").cast(LongType) - 1)
          .cast(DoubleType) / 5.0).cast(LongType)).as("bin"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
        .withColumn("n_neg", col("n") - col("n_pos"))
      val all = Window.partitionBy(lit(1))
      binned
        .withColumn("tp", sum(col("n_pos")).over(all))
        .withColumn("tn", sum(col("n_neg")).over(all))
        .withColumn("gs", col("n_pos").cast(DoubleType) /
          col("tp").cast(DoubleType))
        .withColumn("bs", col("n_neg").cast(DoubleType) /
          col("tn").cast(DoubleType))
        .withColumn("woe", round(log(col("gs") / col("bs")), 6))
        .withColumn("ivt", round((col("gs") - col("bs")) * col("woe"), 8)
          .cast(DecimalType(18, 8)))
        .withColumn("iv", sum(col("ivt")).over(all)
          .cast(StringType).cast(DoubleType))
        .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
          col("woe"), round(col("iv"), 6).as("iv"))
        .orderBy("bin")
    }),

    // Cohen's d effect size of order value between urgent (1-URGENT)
    // and low (5-LOW) priority orders — the "is the difference
    // MATERIAL" companion to q_stats_ttest, standardizing the mean gap
    // by the pooled standard deviation. Exact decimal moments from one
    // partial-agg scan; d is one shared IEEE expression on the 1-row
    // frame.
    "q_stats_cohens_d" -> ((s, dir) => {
      def hop(c: org.apache.spark.sql.Column) =
        c.cast(StringType).cast(DoubleType)
      val g = t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L).as("grp"), D(col("o_totalprice")).as("y"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), hop(sum(col("y"))).as("sy"),
          hop(sum(col("y") * col("y"))).as("syy"))
        .withColumn("nd", col("n").cast(DoubleType))
        .withColumn("mean", col("sy") / col("nd"))
        .withColumn("ss", col("syy") - col("sy") * col("sy") / col("nd"))
      val u = g.filter(col("grp") === 1).select(col("n").as("n_urgent"),
        col("mean").as("mean_urgent"), col("ss").as("ss1"))
      val l = g.filter(col("grp") === 0).select(col("n").as("n_low"),
        col("mean").as("mean_low"), col("ss").as("ss0"))
      u.crossJoin(broadcast(l))
        .withColumn("sp", sqrt((col("ss1") + col("ss0")) /
          (col("n_urgent") + col("n_low") - 2).cast(DoubleType)))
        .select(col("n_urgent"), col("n_low"),
          round(col("mean_urgent"), 4).as("mean_urgent"),
          round(col("mean_low"), 4).as("mean_low"),
          round((col("mean_urgent") - col("mean_low")) / col("sp"), 6)
            .as("cohens_d"))
        .orderBy("n_urgent")
    })
  )

  /** The declared q_stats_theil_sen body. `cutCells` cuts lineage at
    * the value-grid cell frame (≤ 550 rows per return flag): it feeds
    * BOTH sides of the slope self-join, so the uncut plan re-runs the
    * corpus scan + (rf, xq, yd) aggregate once per side (2 lineitem
    * scans, r14 --rescans sweep) — the simhash signature-persist
    * precedent on a grid-bounded frame. Output toggle-invariant
    * (R14TogglesSpec). */
  private[graft] def theilSen(s: org.apache.spark.sql.SparkSession,
      dir: String, cutCells: Boolean = false): DataFrame = {
    val cellsRaw = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("rf"),
        col("l_quantity").cast(LongType).as("xq"),
        round(col("l_discount") * 100).cast(LongType).as("yd"))
      .groupBy("rf", "xq", "yd").agg(count(lit(1)).as("cnt"))
    val cells = if (cutCells) cutLineage(cellsRaw) else cellsRaw
    val a = cells.select(col("rf"), col("xq").as("x1"),
      col("yd").as("y1"), col("cnt").as("c1"))
    val b = cells.select(col("rf"), col("xq").as("x2"),
      col("yd").as("y2"), col("cnt").as("c2"))
    val slopes = a.join(b, Seq("rf")).filter(col("x1") < col("x2"))
      .withColumn("slope", (col("y2") - col("y1")).cast(DoubleType) /
        (col("x2") - col("x1")).cast(DoubleType))
      .groupBy("rf", "slope").agg(sum(col("c1") * col("c2")).as("w"))
    val wTot = Window.partitionBy("rf")
    val wCum = Window.partitionBy("rf").orderBy("slope")
    slopes
      .withColumn("wt", sum(col("w")).over(wTot))
      .withColumn("cum", sum(col("w")).over(wCum))
      // lower weighted median: first slope whose cumulative weight
      // reaches ceil(W/2) = (W+1) div 2 (deterministic under ties)
      .filter(col("cum") >= (col("wt") + 1) / lit(2.0))
      .withColumn("rk", row_number().over(wCum))
      .filter(col("rk") === 1)
      .select(col("rf").as("l_returnflag"), col("wt").as("n_pairs"),
        round(col("slope"), 8).as("theil_sen_slope"))
      .orderBy("l_returnflag")
  }

  val oracle: Map[String, String] = Map(
    "q_stats_theil_sen" ->
      """WITH base AS (SELECT l_returnflag rf,
        |    CAST(l_quantity AS BIGINT) xq,
        |    CAST(round(l_discount * 100) AS BIGINT) yd
        |  FROM lineitem),
        |cells AS (SELECT rf, xq, yd, CAST(COUNT(*) AS BIGINT) cnt
        |  FROM base GROUP BY 1, 2, 3),
        |sl AS (SELECT a.rf,
        |    CAST(b.yd - a.yd AS DOUBLE) / CAST(b.xq - a.xq AS DOUBLE)
        |      slope,
        |    CAST(SUM(a.cnt * b.cnt) AS BIGINT) w
        |  FROM cells a JOIN cells b ON a.rf = b.rf AND a.xq < b.xq
        |  GROUP BY 1, 2),
        |c AS (SELECT rf, slope, w,
        |    SUM(w) OVER (PARTITION BY rf) wt,
        |    SUM(w) OVER (PARTITION BY rf ORDER BY slope) cum
        |  FROM sl),
        |p AS (SELECT rf, wt, slope,
        |    row_number() OVER (PARTITION BY rf ORDER BY slope) rk
        |  FROM c WHERE cum >= (wt + 1) / 2.0e0)
        |SELECT rf l_returnflag, CAST(wt AS BIGINT) n_pairs,
        |  round(slope, 8) theil_sen_slope
        |FROM p WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,

    "q_stats_mannwhitney" ->
      """WITH m AS (SELECT CAST(l_quantity AS BIGINT) v,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) cr,
        |    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
        |      AS BIGINT) ca
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY v),
        |w AS (SELECT v, cr, ca,
        |    COALESCE(SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cuma
        |  FROM m),
        |g AS (SELECT CAST(SUM(cr) AS BIGINT) nr,
        |    CAST(SUM(ca) AS BIGINT) na,
        |    CAST(SUM(cr * (2 * cuma + ca)) AS BIGINT) u2,
        |    CAST(SUM((cr + ca) * (cr + ca) * (cr + ca) - (cr + ca))
        |      AS BIGINT) tsum
        |  FROM w)
        |SELECT nr n_r, na n_a, CAST(u2 AS DOUBLE) / 2.0e0 u,
        |  round((CAST(u2 AS DOUBLE) / 2.0e0
        |      - CAST(nr AS DOUBLE) * CAST(na AS DOUBLE) / 2.0e0)
        |    / sqrt(CAST(nr AS DOUBLE) * CAST(na AS DOUBLE) / 12.0e0
        |      * (CAST(nr + na + 1 AS DOUBLE) - CAST(tsum AS DOUBLE)
        |        / (CAST(nr + na AS DOUBLE)
        |          * CAST(nr + na - 1 AS DOUBLE)))), 6) z
        |FROM g ORDER BY n_r""".stripMargin,

    "q_text_zipf_fit" ->
      """WITH tok AS (SELECT lang,
        |    unnest(string_split(text, ' ')) term FROM documents),
        |tc AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) freq
        |  FROM tok GROUP BY 1, 2),
        |rk AS (SELECT lang, freq, row_number() OVER (PARTITION BY lang
        |    ORDER BY freq DESC, term) rk FROM tc),
        |top AS (SELECT lang,
        |    CAST(round(ln(CAST(rk AS DOUBLE)), 8) AS DECIMAL(18,8)) x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)), 8) AS DECIMAL(18,8)) y
        |  FROM rk WHERE rk <= 100),
        |m AS (SELECT lang, CAST(COUNT(*) AS BIGINT) n_terms,
        |    CAST(COUNT(*) AS DOUBLE) nd,
        |    CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) sx,
        |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) sy,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,8))
        |      * CAST(y AS DECIMAL(19,8))) AS VARCHAR) AS DOUBLE) sxy,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,8))
        |      * CAST(x AS DECIMAL(19,8))) AS VARCHAR) AS DOUBLE) sxx
        |  FROM top GROUP BY lang)
        |SELECT lang, n_terms,
        |  round((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6)
        |    zipf_slope
        |FROM m ORDER BY lang""".stripMargin,

    "q_feat_woe" ->
      """WITH b AS (SELECT
        |    CAST(floor(CAST(CAST(l_quantity AS BIGINT) - 1 AS DOUBLE)
        |      / 5.0e0) AS BIGINT) bin,
        |    CAST(COUNT(*) AS BIGINT) n,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) n_pos
        |  FROM lineitem GROUP BY 1),
        |x AS (SELECT bin, n, n_pos, n - n_pos n_neg,
        |    SUM(n_pos) OVER () tp, SUM(n - n_pos) OVER () tn
        |  FROM b),
        |y AS (SELECT bin, n, n_pos, n_neg,
        |    CAST(n_pos AS DOUBLE) / CAST(tp AS DOUBLE) gs,
        |    CAST(n_neg AS DOUBLE) / CAST(tn AS DOUBLE) bs
        |  FROM x),
        |z AS (SELECT bin, n, n_pos, n_neg,
        |    round(ln(gs / bs), 6) woe,
        |    CAST(round((gs - bs) * round(ln(gs / bs), 6), 8)
        |      AS DECIMAL(18,8)) ivt
        |  FROM y)
        |SELECT bin, n, n_pos, CAST(n_neg AS BIGINT) n_neg, woe,
        |  round(CAST(CAST(SUM(ivt) OVER () AS VARCHAR) AS DOUBLE), 6) iv
        |FROM z ORDER BY bin""".stripMargin,

    "q_stats_cohens_d" ->
      """WITH g AS (SELECT
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END grp,
        |    CAST(COUNT(*) AS BIGINT) n,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS VARCHAR) AS DOUBLE) sy,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
        |      * CAST(o_totalprice AS DECIMAL(19,4))) AS VARCHAR)
        |      AS DOUBLE) syy
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |  GROUP BY 1),
        |s AS (SELECT grp, n, CAST(n AS DOUBLE) nd, sy / CAST(n AS DOUBLE)
        |    mean, syy - sy * sy / CAST(n AS DOUBLE) ss FROM g),
        |u AS (SELECT n n_urgent, mean mean_urgent, ss ss1 FROM s
        |  WHERE grp = 1),
        |l AS (SELECT n n_low, mean mean_low, ss ss0 FROM s WHERE grp = 0)
        |SELECT n_urgent, n_low, round(mean_urgent, 4) mean_urgent,
        |  round(mean_low, 4) mean_low,
        |  round((mean_urgent - mean_low) / sqrt((ss1 + ss0)
        |    / CAST(n_urgent + n_low - 2 AS DOUBLE)), 6) cohens_d
        |FROM u, l ORDER BY n_urgent""".stripMargin
  )
}
