package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 twenty-third-pass batch: time-series decomposition, corpus
  * novelty curves, information-theoretic dependence, and experiment
  * power planning — the remaining "analyst reaches for it weekly"
  * surface after the robust/rank statistics passes.
  *
  * Determinism: the decomposition's only non-exact stage (seasonal
  * means of detrended values) rounds each term before an order-free
  * decimal sum; MI terms round before their decimal sum; the power
  * calculator is pure shared-IEEE scalar math over one exact count
  * ratio; the novelty join is all integer keys.
  */
object DecompQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Additive trend/seasonal/residual decomposition of daily revenue
    // (the moving-average STL skeleton): trend = centered 7-day mean of
    // the exact decimal daily series; seasonal = day-of-week mean of
    // the rounded detrended values (round-then-decimal-sum, order
    // free); residual = remainder. The whole decomposition rides the
    // calendar-bounded day frame — one fact scan, nothing else grows.
    "q_ts_stl_decompose" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("day"),
          D(col("l_extendedprice")).as("rev"))
        .groupBy("day").agg(sum(col("rev")).cast(Dec).as("r"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("m", count(lit(1)).over(w7))
        .withColumn("tsum", sum(col("r")).over(w7)
          .cast(StringType).cast(DoubleType))
        .filter(col("m") === 7)
        .withColumn("trend", col("tsum") / 7.0)
        .withColumn("x",
          col("r").cast(StringType).cast(DoubleType) - col("trend"))
        .withColumn("dow", (col("day") + 4) % 7)
      val seas = tr.groupBy("dow")
        .agg((sum(round(col("x"), 6).cast(DecimalType(28, 6)))
          .cast(StringType).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("seasonal"))
      tr.join(broadcast(seas), Seq("dow"))
        .select(col("day"), col("dow"),
          round(col("trend"), 4).as("trend"),
          round(col("seasonal"), 4).as("seasonal"),
          round(col("x") - col("seasonal"), 4).as("residual"))
        .orderBy("day")
    }),

    // Corpus novelty curve: per document (in doc_id ingestion order),
    // the share of its word trigrams never seen in any earlier-id
    // document — the "is the crawl still finding new content"
    // monitor (novelty collapsing to 0 = the crawler is looping).
    // Gram explode → (gram, doc) partial-agg → gram-keyed window min →
    // per-doc share; every wide stage is keyed by the gram hash.
    "q_text_ngram_novelty" -> ((s, dir) => {
      // hoist the token array (the lambda must NOT re-split per
      // element — that is O(len²) per doc), and shuffle 60-bit md5
      // gram keys instead of gram strings (TextQueries fingerprint
      // precedent; the oracle hashes identically, so even a collision
      // agrees across engines)
      val grams = t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 2), i -> " +
            "concat_ws(' ', element_at(w, i), element_at(w, i + 1), " +
            "element_at(w, i + 2)))")).as("g"))
        .select(col("doc_id"),
          expr("cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint)")
            .as("g"))
      val perDocGram = grams.groupBy("g", "doc_id")
        .agg(count(lit(1)).as("cnt"))
      val firstDoc = Window.partitionBy("g")
      perDocGram
        .withColumn("mn", min(col("doc_id")).over(firstDoc))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_grams"),
          sum(when(col("mn") === col("doc_id"), col("cnt"))
            .otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast(DoubleType) /
            col("n_grams").cast(DoubleType), 6).as("novelty"))
        .orderBy("doc_id")
    }),

    // Mutual information (and normalized MI) between the return flag
    // and the 5-unit quantity bin — the model-agnostic dependence
    // screen behind feature selection (q_feat_woe gives the per-bin
    // view; MI gives the single-number strength). One partial-agg scan
    // to ≤ 30 cells; margins by windows over that frame; each p·ln
    // term rounds to 10 dp before the order-free decimal sum.
    "q_stats_mutual_info" -> ((s, dir) => {
      val cells = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          (((col("l_quantity").cast(LongType) - 1).cast(DoubleType)
            / 5.0).cast(LongType)).as("bin"))
        .groupBy("rf", "bin").agg(count(lit(1)).as("nij"))
      val all = Window.partitionBy(lit(1))
      def nats(c: org.apache.spark.sql.Column) =
        sum(round(c, 10).cast(DecimalType(28, 10)))
          .cast(StringType).cast(DoubleType)
      val g = cells
        .withColumn("ri", sum(col("nij")).over(Window.partitionBy("rf")))
        .withColumn("cj", sum(col("nij")).over(Window.partitionBy("bin")))
        .withColumn("n", sum(col("nij")).over(all))
        .withColumn("pij", col("nij").cast(DoubleType) /
          col("n").cast(DoubleType))
        .withColumn("pi", col("ri").cast(DoubleType) /
          col("n").cast(DoubleType))
        .withColumn("pj", col("cj").cast(DoubleType) /
          col("n").cast(DoubleType))
        .groupBy("n")
        .agg(nats(col("pij") * log(col("pij") /
          (col("pi") * col("pj")))).as("mi"),
          nats(lit(-1.0) * col("pij") * log(col("pi"))).as("hx"),
          nats(lit(-1.0) * col("pij") * log(col("pj"))).as("hy"))
      g.select(col("n"), round(col("mi"), 6).as("mi_nats"),
        round(col("hx"), 6).as("h_flag"),
        round(col("hy"), 6).as("h_bin"),
        round(col("mi") / least(col("hx"), col("hy")), 6).as("nmi"))
        .orderBy("n")
    }),

    // Two-proportion power analysis: per-arm sample size to detect an
    // absolute lift over the corpus return rate at alpha = 5%
    // (two-sided) and 80% power — the experiment-sizing calculator run
    // before every A/B test (q_stats_prop_test is the AFTER). One
    // 1-row exact aggregate; the MDE fan-out is a 3-element literal
    // explode; all arithmetic is one shared IEEE expression.
    "q_stats_power_analysis" -> ((s, dir) => {
      val za = 1.959964
      val zb = 0.841621
      t(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_r"))
        .withColumn("p1", col("n_r").cast(DoubleType) /
          col("n").cast(DoubleType))
        .withColumn("mde", explode(expr("array(0.01d, 0.02d, 0.05d)")))
        .withColumn("p2", col("p1") + col("mde"))
        .withColumn("pbar", (col("p1") + col("p2")) / 2.0)
        .withColumn("n_per_arm", ceil(
          pow(lit(za) * sqrt(lit(2.0) * col("pbar")
            * (lit(1.0) - col("pbar"))) +
            lit(zb) * sqrt(col("p1") * (lit(1.0) - col("p1")) +
              col("p2") * (lit(1.0) - col("p2"))), 2.0) /
            (col("mde") * col("mde"))).cast(LongType))
        .select(col("mde"), round(col("p1"), 6).as("baseline_rate"),
          col("n_per_arm"))
        .orderBy("mde")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ts_stl_decompose" ->
      """WITH daily AS (SELECT epoch_us(l_shipdate) // 86400000000
        |      AS "day",
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) r
        |  FROM lineitem GROUP BY 1),
        |tr AS (SELECT "day",
        |    COUNT(*) OVER win m,
        |    CAST(CAST(SUM(r) OVER win AS VARCHAR) AS DOUBLE) tsum,
        |    CAST(CAST(r AS VARCHAR) AS DOUBLE) rd
        |  FROM daily
        |  WINDOW win AS (ORDER BY "day" ROWS BETWEEN 3 PRECEDING
        |    AND 3 FOLLOWING)),
        |x AS (SELECT "day", ("day" + 4) % 7 dow, tsum / 7.0e0 trend,
        |    rd - tsum / 7.0e0 xv
        |  FROM tr WHERE m = 7),
        |seas AS (SELECT dow,
        |    CAST(CAST(SUM(CAST(round(xv, 6) AS DECIMAL(28,6)))
        |      AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) seasonal
        |  FROM x GROUP BY dow)
        |SELECT x."day", CAST(x.dow AS BIGINT) dow,
        |  round(x.trend, 4) trend, round(s.seasonal, 4) seasonal,
        |  round(x.xv - s.seasonal, 4) residual
        |FROM x JOIN seas s ON x.dow = s.dow ORDER BY x."day"""".stripMargin,

    "q_text_ngram_novelty" ->
      """WITH sp AS (SELECT doc_id, string_split(text, ' ') w
        |  FROM documents),
        |grams AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) gs
        |  FROM sp WHERE len(w) >= 3),
        |hg AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(gs), 1, 15)) AS BIGINT) g
        |  FROM grams),
        |pdg AS (SELECT g, doc_id, CAST(COUNT(*) AS BIGINT) cnt
        |  FROM hg GROUP BY 1, 2),
        |f AS (SELECT g, doc_id, cnt,
        |    MIN(doc_id) OVER (PARTITION BY g) mn FROM pdg)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) n_grams,
        |  CAST(SUM(CASE WHEN mn = doc_id THEN cnt ELSE 0 END)
        |    AS BIGINT) n_novel,
        |  round(CAST(SUM(CASE WHEN mn = doc_id THEN cnt ELSE 0 END)
        |      AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) novelty
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_stats_mutual_info" ->
      """WITH cells AS (SELECT l_returnflag rf,
        |    CAST(floor(CAST(CAST(l_quantity AS BIGINT) - 1 AS DOUBLE)
        |      / 5.0e0) AS BIGINT) bin,
        |    CAST(COUNT(*) AS BIGINT) nij
        |  FROM lineitem GROUP BY 1, 2),
        |x AS (SELECT nij,
        |    SUM(nij) OVER (PARTITION BY rf) ri,
        |    SUM(nij) OVER (PARTITION BY bin) cj,
        |    SUM(nij) OVER () n
        |  FROM cells),
        |p AS (SELECT CAST(n AS BIGINT) n,
        |    CAST(nij AS DOUBLE) / CAST(n AS DOUBLE) pij,
        |    CAST(ri AS DOUBLE) / CAST(n AS DOUBLE) pi,
        |    CAST(cj AS DOUBLE) / CAST(n AS DOUBLE) pj
        |  FROM x),
        |g AS (SELECT n,
        |    CAST(CAST(SUM(CAST(round(pij * ln(pij / (pi * pj)), 10)
        |      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) mi,
        |    CAST(CAST(SUM(CAST(round(-1.0e0 * pij * ln(pi), 10)
        |      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) hx,
        |    CAST(CAST(SUM(CAST(round(-1.0e0 * pij * ln(pj), 10)
        |      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) hy
        |  FROM p GROUP BY n)
        |SELECT n, round(mi, 6) mi_nats, round(hx, 6) h_flag,
        |  round(hy, 6) h_bin, round(mi / least(hx, hy), 6) nmi
        |FROM g ORDER BY n""".stripMargin,

    "q_stats_power_analysis" ->
      """WITH b AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) n_r
        |  FROM lineitem),
        |p AS (SELECT CAST(n_r AS DOUBLE) / CAST(n AS DOUBLE) p1 FROM b),
        |f AS (SELECT p1, unnest([0.01e0, 0.02e0, 0.05e0]) mde FROM p),
        |c AS (SELECT mde, p1, p1 + mde p2, (p1 + p1 + mde) / 2.0e0 pbar
        |  FROM f)
        |SELECT mde, round(p1, 6) baseline_rate,
        |  CAST(ceil(pow(1.959964e0 * sqrt(2.0e0 * pbar * (1.0e0 - pbar))
        |    + 0.841621e0 * sqrt(p1 * (1.0e0 - p1) + p2 * (1.0e0 - p2)),
        |    2.0e0) / (mde * mde)) AS BIGINT) n_per_arm
        |FROM c ORDER BY mde""".stripMargin
  )
}
