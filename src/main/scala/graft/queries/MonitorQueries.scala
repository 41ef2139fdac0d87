package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-7 seventh-pass batch: series peak detection, a randomness
  * test, and an ML-fairness audit — the remaining monitoring shapes
  * (SPC flags level breaches; peaks flag local structure; the runs
  * test asks whether the series is even random; the disparate-impact
  * ratio is the governance gate on any deployed classifier).
  *
  * Determinism posture (SURVEY.md Appendix A): peak flags compare
  * exact decimals and one shared-IEEE prominence ratio; the runs test
  * is pure int64 (run boundaries, sign counts) up to one shared IEEE
  * z; fairness rates are exact counts with IEEE ratios compared
  * identically on both engines.
  */
object MonitorQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Local-peak detection on daily revenue: a peak day strictly
    // exceeds both neighbors (exact decimal compares) AND clears 1.15×
    // the centered 7-day mean (the prominence screen — neighbors-only
    // peaks flag every zigzag). Windows ride the ~700-row day spine;
    // the prominence ratio is the one shared IEEE expression.
    "q_ts_peak_detect" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("day"),
          D(col("o_totalprice")).as("v"))
        .groupBy("day").agg(sum(col("v")).cast(Dec).as("r"))
      val w = Window.orderBy("day")
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      daily
        .withColumn("pv", lag(col("r"), 1).over(w))
        .withColumn("nx", lead(col("r"), 1).over(w))
        .withColumn("m7", count(lit(1)).over(w7))
        .withColumn("s7", sum(col("r")).over(w7)
          .cast(StringType).cast(DoubleType))
        .filter(col("pv").isNotNull && col("nx").isNotNull &&
          col("m7") === 7)
        .withColumn("rd", col("r").cast(StringType).cast(DoubleType))
        .withColumn("prominence", col("rd") / (col("s7") / lit(7.0)))
        .filter(col("r") > col("pv") && col("r") > col("nx") &&
          col("prominence") > lit(1.15))
        .select(col("day"), col("rd").as("revenue"),
          col("prominence"))
        .orderBy("day")
    }),

    // Wald–Wolfowitz runs test of the daily-revenue series around its
    // median — "is this series even random, or does it trend/cycle"
    // (the sanity check before any i.i.d.-assuming statistic). Signs
    // compare exact decimals to the percentile_disc median (ties
    // excluded, the classic treatment); the run count is one window
    // lag + integer sum; E[R]/Var[R]/z are one shared IEEE tail over
    // exact int64 counts.
    "q_stats_runs_test" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("day"),
          D(col("o_totalprice")).as("v"))
        .groupBy("day").agg(sum(col("v")).cast(Dec).as("r"))
      val med = daily.agg(expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY r)").as("med"))
      val signed = daily.crossJoin(broadcast(med))
        .filter(col("r") =!= col("med"))
        .withColumn("s", when(col("r") > col("med"), 1L).otherwise(0L))
      val w = Window.orderBy("day")
      val runs = signed
        .withColumn("chg", when(lag(col("s"), 1).over(w).isNull ||
          lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
        .agg(sum(col("chg")).as("runs"),
          sum(col("s")).as("n1"),
          sum(lit(1L) - col("s")).as("n2"))
      val n1 = col("n1").cast(DoubleType)
      val n2 = col("n2").cast(DoubleType)
      val er = lit(2.0) * n1 * n2 / (n1 + n2) + lit(1.0)
      val vr = (lit(2.0) * n1 * n2 *
        (lit(2.0) * n1 * n2 - n1 - n2)) /
        ((n1 + n2) * (n1 + n2) * (n1 + n2 - lit(1.0)))
      val z = (col("runs").cast(DoubleType) - er) / sqrt(vr)
      runs.select(col("n1"), col("n2"), col("runs"),
          er.as("expected_runs"), z.as("z"),
          when(abs(z) <= lit(1.96), 1).otherwise(0).as("looks_random"))
        .orderBy("n1")
    }),

    // Disparate-impact audit of the median-threshold spend classifier
    // across customer nations — the 80%-rule fairness gate a model
    // review board applies before deployment (q_ml_confusion says the
    // model is accurate; this says who it selects). Positive rates are
    // exact counts per nation; the impact ratio divides by the
    // maximum-rate nation's rate (window over the 25-row frame); the
    // flag compares the same IEEE ratio on both engines.
    "q_ml_fairness_dpr" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .join(dim(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nation"), col("o_totalprice"))
      val thr = o.agg(expr("percentile_disc(0.5) WITHIN GROUP " +
        "(ORDER BY o_totalprice)").as("t"))
      val per = o.crossJoin(broadcast(thr))
        .groupBy("nation")
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_totalprice") >= col("t"), 1L).otherwise(0L))
            .as("pos"))
        .withColumn("rate", col("pos").cast(DoubleType) /
          col("n").cast(DoubleType))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      per.withColumn("max_rate", max(col("rate")).over(all))
        .select(col("nation"), col("n"), col("pos"), col("rate"),
          (col("rate") / col("max_rate")).as("impact_ratio"),
          when(col("rate") / col("max_rate") < lit(0.8), 1).otherwise(0)
            .as("di_flag"))
        .orderBy("nation")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ts_peak_detect" ->
      """WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
        |      AS "day",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) r
        |  FROM orders GROUP BY 1),
        |x AS (SELECT "day", r,
        |    lag(r, 1) OVER w pv, lead(r, 1) OVER w nx,
        |    COUNT(*) OVER w7 m7,
        |    CAST(CAST(SUM(r) OVER w7 AS VARCHAR) AS DOUBLE) s7
        |  FROM daily
        |  WINDOW w AS (ORDER BY "day"),
        |    w7 AS (ORDER BY "day" ROWS BETWEEN 3 PRECEDING
        |      AND 3 FOLLOWING))
        |SELECT "day", CAST(CAST(r AS VARCHAR) AS DOUBLE) revenue,
        |  CAST(CAST(r AS VARCHAR) AS DOUBLE) / (s7 / 7.0e0) prominence
        |FROM x
        |WHERE pv IS NOT NULL AND nx IS NOT NULL AND m7 = 7
        |  AND r > pv AND r > nx
        |  AND CAST(CAST(r AS VARCHAR) AS DOUBLE) / (s7 / 7.0e0)
        |    > 1.15e0
        |ORDER BY "day"""".stripMargin,

    "q_stats_runs_test" ->
      """WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
        |      AS "day",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) r
        |  FROM orders GROUP BY 1),
        |med AS (SELECT percentile_disc(0.5)
        |    WITHIN GROUP (ORDER BY r) med FROM daily),
        |signed AS (SELECT "day",
        |    CASE WHEN r > med THEN 1 ELSE 0 END s
        |  FROM daily, med WHERE r != med),
        |chg AS (SELECT s,
        |    CASE WHEN lag(s, 1) OVER (ORDER BY "day") IS NULL
        |      OR lag(s, 1) OVER (ORDER BY "day") != s
        |      THEN 1 ELSE 0 END chg
        |  FROM signed),
        |m AS (SELECT CAST(SUM(chg) AS BIGINT) runs,
        |    CAST(SUM(s) AS BIGINT) n1,
        |    CAST(SUM(1 - s) AS BIGINT) n2
        |  FROM chg)
        |SELECT n1, n2, runs,
        |  2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0e0
        |    expected_runs,
        |  (CAST(runs AS DOUBLE)
        |    - (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |       / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0e0))
        |  / sqrt((2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
        |    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0e0)))
        |    z,
        |  CASE WHEN abs((CAST(runs AS DOUBLE)
        |    - (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |       / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0e0))
        |  / sqrt((2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
        |    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0e0))))
        |    <= 1.96e0 THEN 1 ELSE 0 END looks_random
        |FROM m ORDER BY n1""".stripMargin,

    "q_ml_fairness_dpr" ->
      """WITH o AS (SELECT c.c_nationkey nation, x.o_totalprice
        |  FROM orders x JOIN customer c ON x.o_custkey = c.c_custkey),
        |thr AS (SELECT percentile_disc(0.5)
        |    WITHIN GROUP (ORDER BY o_totalprice) t FROM o),
        |per AS (SELECT nation, CAST(COUNT(*) AS BIGINT) n,
        |    CAST(SUM(CASE WHEN o_totalprice >= t THEN 1 ELSE 0 END)
        |      AS BIGINT) pos
        |  FROM o, thr GROUP BY nation),
        |r AS (SELECT *,
        |    CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) rate FROM per),
        |mx AS (SELECT *, MAX(rate) OVER () max_rate FROM r)
        |SELECT nation, n, pos, rate, rate / max_rate impact_ratio,
        |  CASE WHEN rate / max_rate < 0.8e0 THEN 1 ELSE 0 END di_flag
        |FROM mx ORDER BY nation""".stripMargin
  )
}
