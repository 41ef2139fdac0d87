package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 twenty-first-pass batch: pairwise-concordance statistics,
  * regression diagnostics, calibrated-noise privacy counts, vocabulary
  * richness, and lead–lag scanning — the second tier of the
  * association/model-audit family started in RankStatsQueries.
  *
  * Determinism posture (SURVEY.md Appendix A): Kendall's τ-b is pure
  * integer arithmetic up to one shared IEEE division (cell-pair
  * concordance products stay inside BIGINT by the Σ ≤ n(n−1)/2 bound);
  * regression coefficients come from exact decimal moments and the
  * residual metrics round each term before an order-free decimal sum;
  * the Laplace noise is an inverse-CDF transform of an md5 uniform
  * (deterministic and engine-portable), rounded before output.
  */
object AssocStatsQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Kendall τ-b of quantity vs discount per return flag — the
    // concordance twin of q_stats_spearman (τ counts PAIR inversions,
    // so it is robust where rank-Pearson is not). Scale shape: the
    // low-cardinality value grid (≤ 50×11 cells per flag) makes
    // pairwise concordance a CELL-pair product, not an observation
    // pair: the self-join is rf-keyed over ≤ 550-row frames, so the
    // whole statistic is one partial-agg scan + bounded joins at any
    // corpus size. Tie corrections n1/n2 come from the value margins.
    // Exactness: every concordant/discordant sum is ≤ n(n−1)/2 —
    // BIGINT-exact on both engines; τ is one shared IEEE expression.
    "q_stats_kendall" -> ((s, dir) => kendall(s, dir)),

    // Per-brand least-squares fit of extended price on quantity PLUS
    // residual diagnostics (RMSE / MAE / R²) — the model-audit pass a
    // feature team runs after q_stats_linreg-style fitting: the fit
    // coefficients come from exact decimal moments of one grouped
    // scan; the residual pass rejoins the ≤ |brands| coefficient rows
    // by broadcast and folds rounded residual terms map-side. Two
    // scans total, no shuffle wider than the brand key.
    "q_ml_regression_metrics" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(dim(s, dir, "part")
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      def hop(c: org.apache.spark.sql.Column) =
        c.cast(StringType).cast(DoubleType)
      val xd = col("x").cast(Dec)
      val yd = col("y").cast(Dec)
      val m = li.groupBy("brand")
        .agg(count(lit(1)).as("n"),
          hop(sum(xd)).as("sx"), hop(sum(yd)).as("sy"),
          hop(sum(xd * yd)).as("sxy"), hop(sum(xd * xd)).as("sxx"),
          hop(sum(yd * yd)).as("syy"))
        .withColumn("nd", col("n").cast(DoubleType))
        .withColumn("slope",
          (col("nd") * col("sxy") - col("sx") * col("sy")) /
            (col("nd") * col("sxx") - col("sx") * col("sx")))
        .withColumn("intercept",
          (col("sy") - col("slope") * col("sx")) / col("nd"))
        .withColumn("sstot",
          (col("nd") * col("syy") - col("sy") * col("sy")) / col("nd"))
      val res = li.join(broadcast(m.select("brand", "slope", "intercept")),
        Seq("brand"))
        .withColumn("r",
          col("y") - col("intercept") - col("slope") * col("x"))
        .groupBy("brand")
        .agg(hop(sum(round(col("r") * col("r"), 6)
          .cast(DecimalType(28, 6)))).as("ssres"),
          hop(sum(round(abs(col("r")), 6).cast(DecimalType(28, 6))))
            .as("sabs"))
      m.join(res, Seq("brand"))
        .select(col("brand"), col("n"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(sqrt(col("ssres") / col("nd")), 4).as("rmse"),
          round(col("sabs") / col("nd"), 4).as("mae"),
          round(lit(1.0) - col("ssres") / col("sstot"), 6).as("r2"))
        .orderBy("brand")
    }),

    // Differential-privacy-calibrated event counts: per-type row count
    // plus Laplace(b=1) noise from the inverse CDF of a deterministic
    // md5 uniform — the ε=1 count-release recipe with the randomness
    // made reproducible (a real release would draw fresh noise; the
    // CALIBRATION — scale, signs, magnitudes — is what this audits,
    // and n_true sits alongside for exactly that audit). One partial-
    // agg scan; the noise math touches only the |types|-row frame.
    "q_privacy_dp_count" -> ((s, dir) => {
      val u = (expr("cast(conv(substr(md5(event_type), 1, 6), 16, 10) " +
        "as bigint)") + 1).cast(DoubleType) / 16777217.0d
      events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("n_true"))
        .withColumn("v", u - 0.5)
        .withColumn("noise", round(
          -signum(col("v")) * log(lit(1.0) - lit(2.0) * abs(col("v"))), 6))
        .select(col("event_type"), col("n_true"), col("noise"),
          round(col("n_true").cast(DoubleType) + col("noise"), 6)
            .as("n_dp"))
        .orderBy("event_type")
    }),

    // Vocabulary-richness profile per source: types, tokens, hapax
    // legomena (terms seen once), hapax share and type–token ratio —
    // the corpus-health screen that separates natural text (hapax-
    // heavy) from templated/duplicated text (hapax-poor). Token
    // explode → (source, term) partial-agg → source rollup; every
    // stage folds map-side.
    "q_text_hapax" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"),
          sum(col("cnt")).as("n_tokens"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          col("n_hapax"),
          round(col("n_hapax").cast(DoubleType) /
            col("n_types").cast(DoubleType), 6).as("hapax_share"),
          round(col("n_types").cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 6).as("type_token_ratio"))
        .orderBy("source")
    }),

    // Lead–lag scan between order intake and shipment revenue: Pearson
    // correlation of daily order totals vs daily shipped revenue at
    // ship-side lags 0..7 days — the pipeline-delay estimator (the
    // argmax lag is the effective order→ship latency). Both series are
    // calendar-bounded daily aggregates; the lag fan-out is a NARROW
    // 8-way explode on the tiny day frame (no join-side blowup), the
    // per-lag moments are exact decimal sums, and the correlation is
    // one shared IEEE expression per lag row.
    "q_ts_crosscorr_lag" -> ((s, dir) => {
      val ship = t(s, dir, "lineitem")
        .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"),
          D(col("l_extendedprice")).as("rev"))
        .groupBy("d").agg(sum(col("rev")).cast(Dec).as("x"))
      val ordr = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"),
          D(col("o_totalprice")).as("tot"))
        .groupBy("d").agg(sum(col("tot")).cast(Dec).as("y"))
        .withColumn("lag_days", explode(expr("sequence(0L, 7L)")))
        .withColumn("ds", col("d") + col("lag_days"))
      def hop(c: org.apache.spark.sql.Column) =
        c.cast(StringType).cast(DoubleType)
      ordr.join(ship, col("ds") === ship("d"))
        .groupBy("lag_days")
        .agg(count(lit(1)).as("n_days"),
          hop(sum(col("x"))).as("sx"), hop(sum(col("y"))).as("sy"),
          hop(sum(col("x") * col("y"))).as("sxy"),
          hop(sum(col("x") * col("x"))).as("sxx"),
          hop(sum(col("y") * col("y"))).as("syy"))
        .withColumn("nd", col("n_days").cast(DoubleType))
        .select(col("lag_days"), col("n_days"),
          ((col("nd") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("nd") * col("sxx") - col("sx") * col("sx")) *
              (col("nd") * col("syy") - col("sy") * col("sy"))))
            .as("xcorr"))
        .orderBy("lag_days")
    })
  )

  /** The declared q_stats_kendall body. `cutCells` cuts lineage at the
    * value-grid cell frame (≤ 550 rows per return flag): it has FOUR
    * consumers (both sides of the concordance self-join + the two tie
    * ledgers), each of which otherwise re-runs the corpus scan +
    * (rf, xq, yd) aggregate — 4 lineitem scans in the uncut plan (r14
    * --rescans sweep). Grid-bounded frame, corpus-pass prefix, ≥3
    * consumers — the adopted r13 cut boundary. Output toggle-invariant
    * (R14TogglesSpec). */
  private[graft] def kendall(s: org.apache.spark.sql.SparkSession,
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
    val cd = a.join(b, Seq("rf")).filter(col("x1") < col("x2"))
      .groupBy("rf")
      .agg(sum(when(col("y1") < col("y2"), col("c1") * col("c2"))
        .otherwise(0L)).as("conc"),
        sum(when(col("y1") > col("y2"), col("c1") * col("c2"))
          .otherwise(0L)).as("disc"))
    def ties(k: String) = cells.groupBy("rf", k)
      .agg(sum(col("cnt")).as("ck"))
      .groupBy("rf")
      .agg(sum(col("ck")).as("n"),
        // `div`, not `/`: Spark's `/` is double division even for
        // integer operands, and the tie ledgers must stay int64-exact.
        sum(expr("ck * (ck - 1) div 2")).as(s"t_$k"))
    val tx = ties("xq").select(col("rf"), col("n"), col("t_xq"))
    val ty = ties("yd").select(col("rf"), col("t_yd"))
    cd.join(broadcast(tx), Seq("rf")).join(broadcast(ty), Seq("rf"))
      .withColumn("n0", expr("n * (n - 1) div 2"))
      .select(col("rf").as("l_returnflag"), col("n"),
        col("conc"), col("disc"),
        ((col("conc") - col("disc")).cast(DoubleType) /
          sqrt((col("n0") - col("t_xq")).cast(DoubleType) *
            (col("n0") - col("t_yd")).cast(DoubleType)))
          .as("kendall_tau_b"))
      .orderBy("l_returnflag")
  }

  val oracle: Map[String, String] = Map(
    "q_stats_kendall" ->
      """WITH base AS (SELECT l_returnflag rf,
        |    CAST(l_quantity AS BIGINT) xq,
        |    CAST(round(l_discount * 100) AS BIGINT) yd
        |  FROM lineitem),
        |cells AS (SELECT rf, xq, yd, CAST(COUNT(*) AS BIGINT) cnt
        |  FROM base GROUP BY 1, 2, 3),
        |cd AS (SELECT a.rf,
        |    CAST(SUM(CASE WHEN a.yd < b.yd THEN a.cnt * b.cnt
        |      ELSE 0 END) AS BIGINT) conc,
        |    CAST(SUM(CASE WHEN a.yd > b.yd THEN a.cnt * b.cnt
        |      ELSE 0 END) AS BIGINT) disc
        |  FROM cells a JOIN cells b ON a.rf = b.rf AND a.xq < b.xq
        |  GROUP BY a.rf),
        |mx AS (SELECT rf, xq, SUM(cnt) ck FROM cells GROUP BY 1, 2),
        |tx AS (SELECT rf, CAST(SUM(ck) AS BIGINT) n,
        |    CAST(SUM(ck * (ck - 1) // 2) AS BIGINT) t_xq
        |  FROM mx GROUP BY rf),
        |my AS (SELECT rf, yd, SUM(cnt) ck FROM cells GROUP BY 1, 2),
        |ty AS (SELECT rf, CAST(SUM(ck * (ck - 1) // 2) AS BIGINT) t_yd
        |  FROM my GROUP BY rf)
        |SELECT cd.rf l_returnflag, tx.n, cd.conc, cd.disc,
        |  CAST(cd.conc - cd.disc AS DOUBLE) /
        |    sqrt(CAST(tx.n * (tx.n - 1) // 2 - tx.t_xq AS DOUBLE)
        |      * CAST(tx.n * (tx.n - 1) // 2 - ty.t_yd AS DOUBLE))
        |    kendall_tau_b
        |FROM cd JOIN tx ON cd.rf = tx.rf JOIN ty ON cd.rf = ty.rf
        |ORDER BY l_returnflag""".stripMargin,

    "q_ml_regression_metrics" ->
      """WITH li AS (SELECT p.p_brand brand, l.l_quantity x,
        |    l.l_extendedprice y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |m AS (SELECT brand, CAST(COUNT(*) AS BIGINT) n,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4))) AS VARCHAR)
        |      AS DOUBLE) sx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(19,4))) AS VARCHAR)
        |      AS DOUBLE) sy,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4))
        |      * CAST(y AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) sxy,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4))
        |      * CAST(x AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) sxx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(19,4))
        |      * CAST(y AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) syy
        |  FROM li GROUP BY brand),
        |c AS (SELECT brand, n, CAST(n AS DOUBLE) nd, sx, sy, syy,
        |    (CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n AS DOUBLE) * sxx - sx * sx) slope
        |  FROM m),
        |c2 AS (SELECT brand, n, nd, syy, sy, slope,
        |    (sy - slope * sx) / nd intercept,
        |    (nd * syy - sy * sy) / nd sstot FROM c),
        |r AS (SELECT li.brand,
        |    CAST(CAST(SUM(CAST(round((y - intercept - slope * x)
        |        * (y - intercept - slope * x), 6) AS DECIMAL(28,6)))
        |      AS VARCHAR) AS DOUBLE) ssres,
        |    CAST(CAST(SUM(CAST(round(abs(y - intercept - slope * x), 6)
        |        AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) sabs
        |  FROM li JOIN c2 ON li.brand = c2.brand GROUP BY li.brand)
        |SELECT c2.brand, c2.n, round(c2.slope, 6) slope,
        |  round(c2.intercept, 6) intercept,
        |  round(sqrt(r.ssres / c2.nd), 4) rmse,
        |  round(r.sabs / c2.nd, 4) mae,
        |  round(1.0e0 - r.ssres / c2.sstot, 6) r2
        |FROM c2 JOIN r ON c2.brand = r.brand ORDER BY c2.brand""".stripMargin,

    "q_privacy_dp_count" ->
      """WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) n_true
        |  FROM events GROUP BY event_type),
        |u AS (SELECT event_type, n_true,
        |    (CAST(concat('0x', substr(md5(event_type), 1, 6)) AS BIGINT)
        |      + 1) / 16777217.0e0 - 0.5e0 v
        |  FROM g),
        |z AS (SELECT event_type, n_true,
        |    round(-sign(v) * ln(1.0e0 - 2.0e0 * abs(v)), 6) noise
        |  FROM u)
        |SELECT event_type, n_true, noise,
        |  round(CAST(n_true AS DOUBLE) + noise, 6) n_dp
        |FROM z ORDER BY event_type""".stripMargin,

    "q_text_hapax" ->
      """WITH tok AS (SELECT source,
        |    unnest(string_split(text, ' ')) term FROM documents),
        |tc AS (SELECT source, term, COUNT(*) cnt
        |  FROM tok GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) n_types,
        |  CAST(SUM(cnt) AS BIGINT) n_tokens,
        |  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    n_hapax,
        |  round(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) hapax_share,
        |  round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
        |    type_token_ratio
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,

    "q_ts_crosscorr_lag" ->
      """WITH ship AS (SELECT epoch_us(l_shipdate) // 86400000000 d,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |      AS DECIMAL(19,4)) x
        |  FROM lineitem GROUP BY 1),
        |ordr AS (SELECT epoch_us(o_orderdate) // 86400000000 d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(19,4)) y
        |  FROM orders GROUP BY 1),
        |fan AS (SELECT o.d, o.y, CAST(l.lg AS BIGINT) lag_days,
        |    o.d + l.lg ds
        |  FROM ordr o, (SELECT unnest(generate_series(0, 7)) lg) l),
        |j AS (SELECT f.lag_days, f.y, s.x FROM fan f
        |  JOIN ship s ON f.ds = s.d),
        |m AS (SELECT lag_days, CAST(COUNT(*) AS BIGINT) n_days,
        |    CAST(COUNT(*) AS DOUBLE) nd,
        |    CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) sx,
        |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) sy,
        |    CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) sxy,
        |    CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) sxx,
        |    CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) syy
        |  FROM j GROUP BY lag_days)
        |SELECT lag_days, n_days,
        |  (nd * sxy - sx * sy) / sqrt((nd * sxx - sx * sx)
        |    * (nd * syy - sy * sy)) xcorr
        |FROM m ORDER BY lag_days""".stripMargin
  )
}
