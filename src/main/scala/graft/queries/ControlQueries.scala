package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-7 second-pass batch: statistical process control, probability
  * calibration, distribution-distance privacy auditing, and embedding-
  * space geometry — the monitoring shapes that sit on TOP of the
  * round-6 statistics (SPC consumes the daily series q_ts_anomaly
  * watches; calibration consumes the score q_ml_auc ranks; t-closeness
  * completes the k-anonymity / l-diversity trio; centroid distances
  * complete the embedding-health pair started in EmbAuditQueries).
  *
  * Determinism posture (SURVEY.md Appendix A): SPC moments are exact
  * decimal through the (38,8) string hop with all flags comparing the
  * same IEEE doubles both engines compute; calibration per-row terms
  * round to 10 dp before order-free decimal sums; t-closeness is pure
  * int64 arithmetic (common-denominator total-variation numerator) up
  * to one shared IEEE division; centroid terms follow the
  * q_emb_drift decimal(19,6) recipe.
  */
object ControlQueries extends QSet {

  private def hop38(c: Column) =
    c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
  private def sqlHop38(e: String) =
    s"CAST(CAST(CAST($e AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)"
  /** Round-then-decimal-sum of IEEE terms (order-free). */
  private def rsum(c: Column) =
    sum(round(c, 10).cast(DecimalType(28, 10)))
      .cast(StringType).cast(DoubleType)

  val queries: Map[String, QFn] = Map(
    // Control-chart breaches of the daily-revenue process (Western
    // Electric rules 1 and 2): rule 1 = point beyond mean ± 3σ; rule 2
    // = ≥ 2 of the last 3 points beyond 2σ on the same side. Mean/σ
    // come from one exact-decimal moment aggregate over the ~700-row
    // day spine (population σ, the SPC convention); every flag
    // compares the same IEEE doubles both engines derive from those
    // exact moments, and rule 2 is integer window counting. Nothing
    // after the first fact aggregate scales with data.
    "q_ts_spc" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("day"),
          D(col("o_totalprice")).as("v"))
        .groupBy("day").agg(sum(col("v")).cast(Dec).as("r"))
      val m = daily.agg(count(lit(1)).as("nd"),
        sum(col("r")).as("sr"),
        sum((col("r") * col("r")).cast(DecimalType(38, 8))).as("srr"))
      val j = daily.crossJoin(broadcast(m))
        .withColumn("x", col("r").cast(StringType).cast(DoubleType))
        .withColumn("mean",
          hop38(col("sr")) / col("nd").cast(DoubleType))
        .withColumn("sd", sqrt(
          hop38(col("srr")) / col("nd").cast(DoubleType) -
            (hop38(col("sr")) / col("nd").cast(DoubleType)) *
            (hop38(col("sr")) / col("nd").cast(DoubleType))))
        .withColumn("rule1",
          when(abs(col("x") - col("mean")) > lit(3.0) * col("sd"), 1)
            .otherwise(0))
        .withColumn("above2",
          when(col("x") > col("mean") + lit(2.0) * col("sd"), 1)
            .otherwise(0))
        .withColumn("below2",
          when(col("x") < col("mean") - lit(2.0) * col("sd"), 1)
            .otherwise(0))
      val w3 = Window.orderBy("day").rowsBetween(-2, 0)
      j.withColumn("rule2",
          when(sum(col("above2")).over(w3) >= 2 ||
            sum(col("below2")).over(w3) >= 2, 1).otherwise(0))
        .filter(col("rule1") === 1 || col("rule2") === 1)
        .select(col("day"), col("x").as("revenue"),
          col("rule1"), col("rule2"))
        .orderBy("day")
    }),

    // Probability-calibration table + Brier decomposition of a
    // deterministic purchase model p = value/(value+100) — the
    // reliability diagram behind every score-threshold decision
    // (q_ml_auc says the score RANKS; this says whether it means what
    // it claims). One fact scan to ≤ 10 bin rows: per-row p and
    // (p−y)² terms round to 10 dp then decimal-sum (order-free);
    // rates are shared IEEE divisions of exact counts.
    "q_ml_calibration" -> ((s, dir) => {
      val ev = events(s, dir).select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .withColumn("p", col("value") / (col("value") + lit(100.0)))
      ev.withColumn("bin", floor(col("p") * 10).cast(LongType))
        .withColumn("e", col("p") - col("y").cast(DoubleType))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"),
          rsum(col("p")).as("sp"), rsum(col("e") * col("e")).as("sb"))
        .select(col("bin"), col("n"),
          (col("npos").cast(DoubleType) / col("n").cast(DoubleType))
            .as("obs_rate"),
          (col("sp") / col("n").cast(DoubleType)).as("avg_pred"),
          (col("sb") / col("n").cast(DoubleType)).as("brier"))
        .orderBy("bin")
    }),

    // t-closeness audit over the k-anonymity QI groups — the third
    // privacy gate (k-anon: groups too SMALL; l-diversity: groups too
    // UNIFORM; t-closeness: groups too SKEWED vs the corpus). Distance
    // = total variation between the group's segment mix and the global
    // mix, computed over a COMMON denominator so the numerator
    // Σ|n_gs·n − n_s·n_g| (+ the absent-segment mass) is exact int64;
    // t is one shared IEEE division. Cells partial-agg map-side; the
    // 5-row global mix broadcasts.
    "q_privacy_tcloseness" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("bal_bucket"),
          col("c_mktsegment").as("seg"))
      val cells = cust.groupBy("c_nationkey", "bal_bucket", "seg")
        .agg(count(lit(1)).as("n_gs"))
      val glob = cust.groupBy("seg").agg(count(lit(1)).as("n_s"))
      val tot = cust.agg(count(lit(1)).as("n"))
      val wg = Window.partitionBy("c_nationkey", "bal_bucket")
      cells.join(broadcast(glob), Seq("seg"))
        .crossJoin(broadcast(tot))
        .withColumn("ng", sum(col("n_gs")).over(wg))
        .groupBy("c_nationkey", "bal_bucket")
        .agg(max(col("ng")).as("k"), max(col("n")).as("n_total"),
          (sum(abs(col("n_gs") * col("n") - col("n_s") * col("ng"))) +
            (max(col("n")) - sum(col("n_s"))) * max(col("ng")))
            .as("tvnum"))
        .select(col("c_nationkey"), col("bal_bucket"), col("k"),
          (col("tvnum").cast(DoubleType) /
            (lit(2L) * col("k") * col("n_total")).cast(DoubleType))
            .as("t_closeness"))
        .filter(col("t_closeness") > lit(0.3))
        .orderBy("c_nationkey", "bal_bucket")
    }),

    // Inter-class centroid distance matrix of the embedding space —
    // the separability screen beside q_emb_drift/q_emb_norm_hist (two
    // classes whose centroids collapse are indistinguishable to any
    // downstream classifier). Per-(label, dim) sums follow the
    // q_emb_drift decimal(19,6) recipe; the 64 per-dim squared gaps
    // round to 10 dp then decimal-sum per pair (order-free); distance
    // is one shared sqrt. The pair frame is classes², never rows.
    "q_emb_centroid_dist" -> ((s, dir) => {
      val x = t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding"))
          .as(Seq("pos", "xf")))
        .select(col("label"), col("pos"),
          col("xf").cast(DoubleType).as("x"))
      val cent = x.groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(19, 6))).as("sx"))
        .withColumn("mean", hop38(col("sx")) / col("n").cast(DoubleType))
        .select(col("label"), col("pos"), col("mean"))
      val a = cent.select(col("label").as("la"), col("pos"),
        col("mean").as("ma"))
      val b = cent.select(col("label").as("lb"), col("pos"),
        col("mean").as("mb"))
      a.join(b, Seq("pos")).filter(col("la") < col("lb"))
        .groupBy("la", "lb")
        .agg(rsum((col("ma") - col("mb")) * (col("ma") - col("mb")))
          .as("d2"))
        .select(col("la"), col("lb"), sqrt(col("d2")).as("dist"))
        .orderBy("la", "lb")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ts_spc" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
        |      AS "day",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) r
        |  FROM orders GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) nd, SUM(r) sr,
        |    SUM(CAST(CAST(r AS DECIMAL(19,4)) * r AS DECIMAL(38,8))) srr
        |  FROM daily),
        |j AS (SELECT "day",
        |    CAST(CAST(r AS VARCHAR) AS DOUBLE) x,
        |    ${sqlHop38("sr")} / CAST(nd AS DOUBLE) mean,
        |    sqrt(${sqlHop38("srr")} / CAST(nd AS DOUBLE)
        |      - (${sqlHop38("sr")} / CAST(nd AS DOUBLE))
        |      * (${sqlHop38("sr")} / CAST(nd AS DOUBLE))) sd
        |  FROM daily, m),
        |f AS (SELECT "day", x,
        |    CASE WHEN abs(x - mean) > 3.0e0 * sd THEN 1 ELSE 0 END rule1,
        |    CASE WHEN x > mean + 2.0e0 * sd THEN 1 ELSE 0 END above2,
        |    CASE WHEN x < mean - 2.0e0 * sd THEN 1 ELSE 0 END below2
        |  FROM j),
        |r2 AS (SELECT "day", x, rule1,
        |    CASE WHEN SUM(above2) OVER win >= 2
        |      OR SUM(below2) OVER win >= 2 THEN 1 ELSE 0 END rule2
        |  FROM f
        |  WINDOW win AS (ORDER BY "day" ROWS BETWEEN 2 PRECEDING
        |    AND CURRENT ROW))
        |SELECT "day", x revenue, rule1, rule2 FROM r2
        |WHERE rule1 = 1 OR rule2 = 1 ORDER BY "day"""".stripMargin,

    "q_ml_calibration" ->
      """WITH ev AS (SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END y,
        |    value / (value + 100.0e0) p
        |  FROM events),
        |b AS (SELECT CAST(floor(p * 10) AS BIGINT) bin,
        |    CAST(COUNT(*) AS BIGINT) n,
        |    CAST(SUM(y) AS BIGINT) npos,
        |    CAST(CAST(SUM(CAST(round(p, 10) AS DECIMAL(28,10)))
        |      AS VARCHAR) AS DOUBLE) sp,
        |    CAST(CAST(SUM(CAST(round((p - CAST(y AS DOUBLE))
        |        * (p - CAST(y AS DOUBLE)), 10) AS DECIMAL(28,10)))
        |      AS VARCHAR) AS DOUBLE) sb
        |  FROM ev GROUP BY 1)
        |SELECT bin, n,
        |  CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) obs_rate,
        |  sp / CAST(n AS DOUBLE) avg_pred,
        |  sb / CAST(n AS DOUBLE) brier
        |FROM b ORDER BY bin""".stripMargin,

    "q_privacy_tcloseness" ->
      """WITH cust AS (SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) bal_bucket,
        |    c_mktsegment seg FROM customer),
        |cells AS (SELECT c_nationkey, bal_bucket, seg,
        |    CAST(COUNT(*) AS BIGINT) n_gs
        |  FROM cust GROUP BY 1, 2, 3),
        |gmix AS (SELECT seg, CAST(COUNT(*) AS BIGINT) n_s
        |  FROM cust GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM cust),
        |wg AS (SELECT c.c_nationkey, c.bal_bucket, c.n_gs, g.n_s, t.n,
        |    SUM(c.n_gs) OVER (PARTITION BY c.c_nationkey, c.bal_bucket)
        |      ng
        |  FROM cells c JOIN gmix g ON c.seg = g.seg, tot t),
        |r AS (SELECT c_nationkey, bal_bucket,
        |    CAST(MAX(ng) AS BIGINT) k,
        |    CAST(MAX(n) AS BIGINT) n_total,
        |    CAST(SUM(abs(n_gs * n - n_s * ng))
        |      + (MAX(n) - SUM(n_s)) * MAX(ng) AS BIGINT) tvnum
        |  FROM wg GROUP BY 1, 2)
        |SELECT c_nationkey, bal_bucket, k,
        |  CAST(tvnum AS DOUBLE) / CAST(2 * k * n_total AS DOUBLE)
        |    t_closeness
        |FROM r
        |WHERE CAST(tvnum AS DOUBLE) / CAST(2 * k * n_total AS DOUBLE)
        |  > 0.3e0
        |ORDER BY c_nationkey, bal_bucket""".stripMargin,

    "q_emb_centroid_dist" ->
      """WITH x AS (SELECT label,
        |    unnest(generate_series(1, len(embedding))) i,
        |    unnest(embedding) xf
        |  FROM embeddings),
        |cent AS (SELECT label, i - 1 pos,
        |    CAST(COUNT(*) AS BIGINT) n,
        |    SUM(CAST(CAST(xf AS DOUBLE) AS DECIMAL(19,6))) sx
        |  FROM x GROUP BY 1, 2),
        |m AS (SELECT label, pos,
        |    CAST(CAST(CAST(sx AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)
        |      / CAST(n AS DOUBLE) mean FROM cent),
        |p AS (SELECT a.label la, b.label lb,
        |    CAST(CAST(SUM(CAST(round((a.mean - b.mean)
        |        * (a.mean - b.mean), 10) AS DECIMAL(28,10)))
        |      AS VARCHAR) AS DOUBLE) d2
        |  FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT la, lb, sqrt(d2) dist FROM p ORDER BY la, lb""".stripMargin
  )
}
