package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-7 fourth-pass batch: variance-homogeneity testing (the
  * prerequisite check for q_stats_anova), quantile–quantile
  * distribution comparison, cross-entropy model evaluation, and
  * session path mining — rounding out the inference / evaluation /
  * product-analytics families.
  *
  * Determinism posture (SURVEY.md Appendix A): Brown–Forsythe runs the
  * q_stats_anova fixed-domain trick on exact-decimal |x − median|
  * deviations (medians are percentile_disc = exact element selection);
  * the Q–Q table is pure exact element selection with one decimal
  * subtraction; log-loss clamps p to [1e-6, 1−1e-6] then rounds each
  * term to 10 dp before the order-free decimal sum; path mining is
  * pure integer counting over per-user ordered windows.
  */
object VarianceSeqQueries extends QSet {

  private def hop38(c: Column) =
    c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
  private def sqlHop38(e: String) =
    s"CAST(CAST(CAST($e AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)"
  private val Pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  val queries: Map[String, QFn] = Map(
    // Brown–Forsythe (median-based Levene) test of variance
    // homogeneity across the 5 order priorities — the check run BEFORE
    // trusting q_stats_anova's pooled-variance F. z = |x − median_g| is
    // exact decimal (the group medians are percentile_disc — exact
    // element selection, broadcast back); W is then one-way ANOVA on z
    // via the same fixed-domain conditional aggregate + fixed-order
    // IEEE expression tree (no rounding anywhere). Two fact scans
    // (median pass + moment pass), both partial-agg shaped.
    "q_stats_levene" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
          D(col("o_totalprice")).as("x"))
      val med = o.groupBy("g").agg(expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").as("med"))
      val z = o.join(broadcast(med), Seq("g"))
        .select(col("g"), abs(col("x") - col("med")).cast(Dec).as("z"))
      val aggs = Seq(count(lit(1)).as("n_all"),
        sum(col("z")).as("s_all")) ++
        Pris.zipWithIndex.flatMap { case (p, i) => Seq(
          sum(when(col("g") === p, 1L).otherwise(0L)).as(s"n$i"),
          sum(when(col("g") === p, col("z"))
            .otherwise(D(lit(0.0)))).as(s"s$i"),
          sum(when(col("g") === p, (col("z") * col("z"))
            .cast(DecimalType(38, 8)))
            .otherwise(lit(0).cast(DecimalType(38, 8)))).as(s"q$i"))
        }
      val row = z.agg(aggs.head, aggs.tail: _*)
      val mean = hop38(col("s_all")) / col("n_all").cast(DoubleType)
      def ni(i: Int) = col(s"n$i").cast(DoubleType)
      def mi(i: Int) = hop38(col(s"s$i")) / ni(i)
      val ssb = (0 until 5).map(i =>
        ni(i) * (mi(i) - mean) * (mi(i) - mean)).reduce(_ + _)
      val ssw = (0 until 5).map(i =>
        hop38(col(s"q$i")) - hop38(col(s"s$i")) * hop38(col(s"s$i")) /
          ni(i)).reduce(_ + _)
      row.select(lit(5L).as("k"), col("n_all").as("n"),
        ssb.as("ss_between"), ssw.as("ss_within"),
        ((ssb / lit(4.0)) /
          (ssw / (col("n_all") - 5L).cast(DoubleType))).as("w_stat"))
        .orderBy("k")
    }),

    // Quantile–quantile table of urgent vs low-priority order values —
    // the distribution-shape comparison an analyst draws before
    // trusting any mean-based test (both marginals at the nine
    // deciles, exact element selection on exact decimals; the gap is
    // one decimal subtraction). Two conditional decile aggregates,
    // everything after is a 9-row literal frame.
    "q_stats_qq" -> ((s, dir) => statsQq(s, dir)),

    // Cross-entropy (log-loss) of the p = value/(value+100) purchase
    // model, with the constant-rate baseline and the skill score — the
    // scoring-rule companion of q_ml_calibration's Brier (log-loss
    // punishes confident misses hardest). p clamps to
    // [1e-6, 1 − 1e-6] (both engines clamp identically — greatest/
    // least are exact), each −[y·ln p + (1−y)·ln(1−p)] term rounds to
    // 10 dp before the order-free decimal sum, and the baseline is one
    // shared IEEE expression over exact counts.
    "q_ml_logloss" -> ((s, dir) => {
      val ev = events(s, dir).select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .withColumn("p", col("value") / (col("value") + lit(100.0)))
        .withColumn("pc", least(greatest(col("p"), lit(1e-6)),
          lit(1.0) - lit(1e-6)))
        .withColumn("term", lit(-1.0) *
          (col("y").cast(DoubleType) * log(col("pc")) +
            (lit(1L) - col("y")).cast(DoubleType) *
              log(lit(1.0) - col("pc"))))
      val g = ev.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(round(col("term"), 10).cast(DecimalType(28, 10)))
          .cast(StringType).cast(DoubleType).as("st"))
      val rate = col("sy").cast(DoubleType) / col("n").cast(DoubleType)
      val baseLl = lit(-1.0) * (rate * log(rate) +
        (lit(1.0) - rate) * log(lit(1.0) - rate))
      g.select(col("n"), col("sy").as("n_pos"),
          (col("st") / col("n").cast(DoubleType)).as("logloss"),
          baseLl.as("baseline_logloss"),
          (lit(1.0) - (col("st") / col("n").cast(DoubleType)) / baseLl)
            .as("skill"))
        .orderBy("n")
    }),

    // Top session path trigrams — the "what do users actually DO in
    // order" report (q_seq_transitions is the 1-step matrix; this
    // mines the 3-step paths a product team reads). Two user-
    // partitioned leads over the time-ordered stream (deterministic
    // event-id tie-break), then one partial-agg count; the top-20 is a
    // bounded sort on the ≤ |types|³ path frame.
    "q_seq_path_trigrams" -> ((s, dir) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("tu"), col("event_id"))
      val paths = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts_us")).as("tu"), col("event_type").as("et"))
        .withColumn("e2", lead(col("et"), 1).over(wu))
        .withColumn("e3", lead(col("et"), 2).over(wu))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("et"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      paths
        .withColumn("total", sum(col("n")).over(all))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("n").desc, col("path"))))
        .filter(col("rn") <= 20)
        .select(col("path"), col("n"),
          (col("n").cast(DoubleType) / col("total").cast(DoubleType))
            .as("share"))
        .orderBy(col("n").desc, col("path"))
    })
  )

  /** Levene oracle, generated from the same fixed priority domain
    * (shape-identical conditional aggregates + expression trees). */
  private val leveneSql: String = {
    val groupAggs = Pris.zipWithIndex.map { case (p, i) =>
      s"CAST(SUM(CASE WHEN g = '$p' THEN 1 ELSE 0 END) AS BIGINT) n$i, " +
        s"SUM(CASE WHEN g = '$p' THEN z " +
        s"ELSE CAST(0 AS DECIMAL(18,4)) END) s$i, " +
        s"SUM(CASE WHEN g = '$p' THEN CAST(CAST(z AS DECIMAL(19,4)) * z " +
        s"AS DECIMAL(38,8)) ELSE CAST(0 AS DECIMAL(38,8)) END) q$i"
    }.mkString(", ")
    def mi(i: Int) = s"(${sqlHop38(s"s$i")} / CAST(n$i AS DOUBLE))"
    val mean = s"(${sqlHop38("s_all")} / CAST(n_all AS DOUBLE))"
    val ssb = (0 until 5).map(i =>
      s"(CAST(n$i AS DOUBLE) * (${mi(i)} - $mean) * (${mi(i)} - $mean))")
      .mkString(" + ")
    val ssw = (0 until 5).map(i =>
      s"(${sqlHop38(s"q$i")} - ${sqlHop38(s"s$i")} * ${sqlHop38(s"s$i")}" +
        s" / CAST(n$i AS DOUBLE))").mkString(" + ")
    s"""WITH o AS (SELECT o_orderpriority g,
      |    CAST(o_totalprice AS DECIMAL(18,4)) x FROM orders),
      |med AS (SELECT g, percentile_disc(0.5)
      |    WITHIN GROUP (ORDER BY x) med FROM o GROUP BY g),
      |z0 AS (SELECT o.g, CAST(abs(o.x - med.med) AS DECIMAL(18,4)) z
      |  FROM o JOIN med ON o.g = med.g),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) n_all, SUM(z) s_all,
      |    $groupAggs
      |  FROM z0)
      |SELECT CAST(5 AS BIGINT) k, n_all n,
      |  $ssb AS ss_between,
      |  $ssw AS ss_within,
      |  (($ssb) / 4.0e0) / (($ssw) / CAST(n_all - 5 AS DOUBLE)) w_stat
      |FROM m ORDER BY k""".stripMargin
  }

  /** The declared q_stats_qq body — quantile–quantile table of urgent
    * vs low-priority order values (both marginals at the nine deciles,
    * exact element selection on exact decimals; the gap is one decimal
    * subtraction).
    *
    * `singlePass` (r14): the incumbent ran ONE conditional decile
    * aggregate PER SIDE (two full orders scans — the r14 --rescans
    * sweep), then joined the two 9-row frames. The single-pass shape
    * groups the filtered scan by priority (one scan, one aggregate —
    * the same percentile_disc picks per group), explodes the 2×9
    * decile grid, and pivots via conditional max per decile (each
    * (q, side) holds exactly one non-null value, so max IS the value).
    * Exact decimals in, identical final expressions out
    * (R14TogglesSpec pins both shapes row-for-row). */
  private[graft] def statsQq(s: org.apache.spark.sql.SparkSession,
      dir: String, singlePass: Boolean = false): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        D(col("o_totalprice")).as("x"))
    val pd = (1 to 9).map(i => expr(
      s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY x)")
      .as(s"c$i"))
    def dd(c: Column) = c.cast(StringType).cast(DoubleType)
    val joined =
      if (singlePass) {
        val byG = o.filter(col("g").isin("1-URGENT", "5-LOW"))
          .groupBy("g").agg(pd.head, pd.tail: _*)
        byG.select(col("g"), explode(array((1 to 9).map(i =>
            struct(lit(i).as("q"), col(s"c$i").as("v"))): _*)).as("s"))
          .select(col("g"), col("s.q").as("q"), col("s.v").as("v"))
          .groupBy("q")
          .agg(max(when(col("g") === "1-URGENT", col("v")))
              .as("urgent_val"),
            max(when(col("g") === "5-LOW", col("v"))).as("low_val"))
      } else {
        def deciles(p: String, pre: String) =
          o.filter(col("g") === p).agg(pd.head, pd.tail: _*)
            .select(explode(array((1 to 9).map(i =>
              struct(lit(i).as("q"), col(s"c$i").as(s"${pre}_val"))): _*))
              .as("s"))
            .select(col("s.q").as("q"), col(s"s.${pre}_val"))
        deciles("1-URGENT", "urgent").join(deciles("5-LOW", "low"),
          Seq("q"))
      }
    joined
      .select(col("q").cast(LongType).as("decile"),
        dd(col("urgent_val")).as("urgent_val"),
        dd(col("low_val")).as("low_val"),
        dd((col("urgent_val") - col("low_val")).cast(Dec)).as("gap"))
      .orderBy("decile")
  }

  val oracle: Map[String, String] = Map(
    "q_stats_levene" -> leveneSql,

    "q_stats_qq" -> {
      val rows = (1 to 9).map(i =>
        s"SELECT $i q, u$i uv, l$i lv FROM m").mkString(
        " UNION ALL ")
      s"""WITH o AS (SELECT o_orderpriority g,
        |    CAST(o_totalprice AS DECIMAL(18,4)) x FROM orders),
        |m AS (SELECT
        |    ${(1 to 9).map(i => s"percentile_disc(0.$i) WITHIN GROUP " +
          s"(ORDER BY x) FILTER (WHERE g = '1-URGENT') u$i").mkString(", ")},
        |    ${(1 to 9).map(i => s"percentile_disc(0.$i) WITHIN GROUP " +
          s"(ORDER BY x) FILTER (WHERE g = '5-LOW') l$i").mkString(", ")}
        |  FROM o),
        |f AS ($rows)
        |SELECT CAST(q AS BIGINT) decile,
        |  CAST(CAST(uv AS VARCHAR) AS DOUBLE) urgent_val,
        |  CAST(CAST(lv AS VARCHAR) AS DOUBLE) low_val,
        |  CAST(CAST(CAST(uv - lv AS DECIMAL(18,4)) AS VARCHAR)
        |    AS DOUBLE) gap
        |FROM f ORDER BY decile""".stripMargin
    },

    "q_ml_logloss" ->
      """WITH ev AS (SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END y,
        |    least(greatest(value / (value + 100.0e0), 1.0e-6),
        |      1.0e0 - 1.0e-6) pc
        |  FROM events),
        |terms AS (SELECT y,
        |    -1.0e0 * (CAST(y AS DOUBLE) * ln(pc)
        |      + CAST(1 - y AS DOUBLE) * ln(1.0e0 - pc)) term
        |  FROM ev),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        |    CAST(SUM(y) AS BIGINT) sy,
        |    CAST(CAST(SUM(CAST(round(term, 10) AS DECIMAL(28,10)))
        |      AS VARCHAR) AS DOUBLE) st
        |  FROM terms)
        |SELECT n, sy n_pos,
        |  st / CAST(n AS DOUBLE) logloss,
        |  -1.0e0 * ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    + (1.0e0 - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(1.0e0 - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
        |    baseline_logloss,
        |  1.0e0 - (st / CAST(n AS DOUBLE))
        |    / (-1.0e0 * ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |        * ln(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      + (1.0e0 - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |        * ln(1.0e0 - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
        |    skill
        |FROM g ORDER BY n""".stripMargin,

    "q_seq_path_trigrams" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) tu,
        |    event_type et FROM events),
        |led AS (SELECT et,
        |    lead(et, 1) OVER w e2, lead(et, 2) OVER w e3
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
        |paths AS (SELECT et || '>' || e2 || '>' || e3 path,
        |    CAST(COUNT(*) AS BIGINT) n
        |  FROM led WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |  GROUP BY 1),
        |r AS (SELECT path, n, SUM(n) OVER () total,
        |    row_number() OVER (ORDER BY n DESC, path) rn FROM paths)
        |SELECT path, n,
        |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) "share"
        |FROM r WHERE rn <= 20 ORDER BY n DESC, path""".stripMargin
  )
}
