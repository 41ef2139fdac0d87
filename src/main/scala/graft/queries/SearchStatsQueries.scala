package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 tenth-pass batch: a grid-bucketed spatial nearest join, BM25
  * relevance ranking, PSI distribution-drift, the Gini concentration
  * coefficient, and a trained-and-scored multinomial naive-Bayes
  * classifier — five operator families (spatial, search ranking, drift
  * monitoring, inequality stats, supervised scoring) the surface did
  * not cover yet.
  *
  * Determinism posture (SURVEY.md Appendix A): every float that crosses
  * engines is either an exact-integer/decimal base, one shared IEEE
  * expression shape over such bases, or a `round(ln(x), 6)` term (the
  * established cross-engine log recipe used by tf-idf / unigram-LM).
  */
object SearchStatsQueries extends QSet {

  /** Grid cell edge == the distance threshold R, so ±1-cell neighbors
    * provably cover every pair within R (|a−b| ≤ R ⇒ cells differ by
    * ≤ 1 after `div R`). */
  private val Cell = 500L
  private val R2   = Cell * Cell

  /** BM25 free parameters (the standard Robertson defaults). */
  private val QueryTerms = Seq("merge", "window", "scan")

  /** q_text_bm25 body — BM25 ranking of the corpus against a fixed
    * query-term set — the relevance scoring every retrieval pipeline
    * runs over its inverted index. tf/df/dl/N are exact integer
    * aggregates (tf and df only over the FILTERED query terms, so the
    * shuffled frames are O(matching docs), never the token stream);
    * idf is the shared round(ln,6) recipe; the tf-saturation/
    * length-normalization factor is one IEEE expression over exact-int
    * bases with identical association on both engines. Corpus stats
    * attach as a 1-row broadcast; top-20 per term is a term-partitioned
    * window.
    *
    * r14 toggles (both pinned output-identical in R14TogglesSpec):
    *  - `fuseDl`: compute dl IN the token pass (size(split) rides the
    *    explode projection) and carry it through the tf aggregate —
    *    removes the corpus-wide dl frame and its join/exchange
    *    entirely (guide §2.4; the incumbent scans documents once just
    *    to join dl back onto tf by doc_id).
    *  - `dfFromTf`: derive df from the tf frame (count per term over
    *    one-row-per-(doc,term) == countDistinct(doc_id) per term over
    *    the token stream) instead of a third corpus scan; the tf frame
    *    is persisted so its two consumers share one tokenize pass —
    *    tf is the FILTERED matching-docs frame (≤|QueryTerms| rows per
    *    doc), not the token stream, so the materialization is strictly
    *    smaller than the corpus pass it saves.
    */
  private[graft] def bm25(s: org.apache.spark.sql.SparkSession,
      dir: String, fuseDl: Boolean = true, dfFromTf: Boolean = true)
      : DataFrame = {
    val docs = t(s, dir, "documents")
    val stats = docs
      .select(size(split(col("text"), " ")).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_tokens"))
    val scoredBase =
      if (fuseDl) {
        val base = docs.select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("dl"),
            explode(split(col("text"), " ")).as("term"))
          .filter(col("term").isin(QueryTerms: _*))
        val tfRaw = base.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        val tf = if (dfFromTf) tfRaw.persist() else tfRaw
        val dfq =
          if (dfFromTf) tf.groupBy("term").agg(count(lit(1)).as("df"))
          else base.groupBy("term")
            .agg(countDistinct(col("doc_id")).as("df"))
        tf.join(broadcast(dfq), "term")
      } else {
        val toks = docs.select(col("doc_id"),
            explode(split(col("text"), " ")).as("term"))
          .filter(col("term").isin(QueryTerms: _*))
        val dl = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("dl"))
        val tf = toks.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val dfq = toks.groupBy("term")
          .agg(countDistinct(col("doc_id")).as("df"))
        tf.join(dl, "doc_id").join(broadcast(dfq), "term")
      }
    scoredBase
      .crossJoin(broadcast(stats))
      .withColumn("score",
        round(log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)), 6) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast(DoubleType) /
              (col("tot_tokens").cast(DoubleType) /
                col("n_docs").cast(DoubleType))))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rn") <= 20)
      .select("term", "doc_id", "tf", "dl", "score")
      .orderBy(col("term"), col("score").desc, col("doc_id"))
  }

  val queries: Map[String, QFn] = Map(
    // Grid-bucketed spatial nearest join: deterministic planar
    // coordinates ride the dimension keys (integer arithmetic — no
    // trig, no float geometry), each supplier is exploded into its
    // 3×3 neighbor cells, and candidates meet customers through a pure
    // EQUI-join on the cell id — the standard spatial-join scale shape
    // (candidates per customer = suppliers in 9 cells, a density
    // property, not the table size). The exact int64 squared-distance
    // filter runs inside the joined frame; per-customer nearest is a
    // customer-partitioned window; the global top-200 presentation is
    // sort+limit (TakeOrdered). Cell = R makes ±1 coverage exact, so
    // the oracle can brute-force the same semantics.
    "q_join_spatial_grid" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("custkey"),
        (col("c_custkey") * 7919L % 10000L).as("cx"),
        (col("c_custkey") * 104729L % 10000L).as("cy"))
        .withColumn("gx", expr("cx div 500"))
        .withColumn("gy", expr("cy div 500"))
      val sup = t(s, dir, "supplier").select(
        col("s_suppkey").as("suppkey"),
        (col("s_suppkey") * 6151L % 10000L).as("sx"),
        (col("s_suppkey") * 3571L % 10000L).as("sy"))
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("gx", expr("sx div 500") + col("dx"))
        .withColumn("gy", expr("sy div 500") + col("dy"))
        .select("suppkey", "sx", "sy", "gx", "gy")
      c.join(sup, Seq("gx", "gy"))
        .withColumn("dist2",
          (col("cx") - col("sx")) * (col("cx") - col("sx")) +
            (col("cy") - col("sy")) * (col("cy") - col("sy")))
        .filter(col("dist2") <= R2)
        .withColumn("rn", row_number().over(
          Window.partitionBy("custkey").orderBy(col("dist2"), col("suppkey"))))
        .filter(col("rn") === 1)
        .select("custkey", "suppkey", "dist2")
        .orderBy(col("dist2"), col("custkey"))
        .limit(200)
    }),

    // BM25 ranking of the corpus against a fixed query-term set — the
    // relevance scoring every retrieval pipeline runs over its inverted
    // index. tf/df/dl/N are exact integer aggregates (tf and df only
    // over the FILTERED query terms, so the shuffled frames are
    // O(matching docs), never the token stream); idf is the shared
    // round(ln,6) recipe; the tf-saturation/length-normalization factor
    // is one IEEE expression over exact-int bases with identical
    // association on both engines. Corpus stats attach as a 1-row
    // broadcast; top-20 per term is a term-partitioned window.
    "q_text_bm25" -> ((s, dir) => bm25(s, dir)),

    // Population-stability-index drift between two halves of the event
    // stream (reference = even event ids, current = odd): the standard
    // model-monitoring screen for "did the input distribution move".
    // Decile cuts are percentile_disc over the REFERENCE side (actual
    // data values — exact double compares, no interpolation), attached
    // as a 1-row broadcast; bucket assignment is nine exact `>`
    // comparisons folded map-side; per-bucket counts are exact int64;
    // the PSI term is (pᵣ−p꜀)·round(ln(pᵣ/p꜀),6) over exact count
    // ratios. Side totals ride a window over the 10-row bucket frame
    // (domain-bounded — never the fact).
    "q_stats_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "value")
      val cuts = ev.filter(col("event_id") % 2 === 0).agg(
        expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY value)").as("c1"),
        expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY value)").as("c2"),
        expr("percentile_disc(0.3) WITHIN GROUP (ORDER BY value)").as("c3"),
        expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY value)").as("c4"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("c5"),
        expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY value)").as("c6"),
        expr("percentile_disc(0.7) WITHIN GROUP (ORDER BY value)").as("c7"),
        expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY value)").as("c8"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("c9"))
      def gt(c: String) = when(col("value") > col(c), 1).otherwise(0)
      val pr = col("n_ref").cast(DoubleType) / col("tr").cast(DoubleType)
      val pc = col("n_cur").cast(DoubleType) / col("tc").cast(DoubleType)
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      ev.crossJoin(broadcast(cuts))
        .select((col("event_id") % 2).as("side"),
          (lit(1) + gt("c1") + gt("c2") + gt("c3") + gt("c4") + gt("c5") +
            gt("c6") + gt("c7") + gt("c8") + gt("c9"))
            .cast(LongType).as("bucket"))
        .groupBy("bucket")
        .agg(count(when(col("side") === 0, 1)).as("n_ref"),
          count(when(col("side") === 1, 1)).as("n_cur"))
        .withColumn("tr", sum(col("n_ref")).over(all))
        .withColumn("tc", sum(col("n_cur")).over(all))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          pr.as("p_ref"), pc.as("p_cur"),
          ((pr - pc) * round(log(pr / pc), 6)).as("psi_term"))
        .orderBy("bucket")
    }),

    // Gini coefficient of customer revenue — the canonical inequality
    // summary (G = (2·Σ rn·xᵣₙ − (n+1)·Σx) / (n·Σx) over ascending
    // ranks). Revenue is an exact decimal partial-fold per customer.
    // The global rank is computed WITHOUT an unpartitioned window (the
    // r8 shape ranked every customer through one task — the one
    // remaining global-window hazard on a declared query): range-
    // repartition by (rev, custkey) keeps total order ACROSS
    // partitions, each partition ranks its own rows in parallel
    // (row_number partitioned by the range-partition id), and the
    // global rank is the local rank plus the preceding partitions'
    // row-count offset. The only unpartitioned window left runs over
    // the per-partition count frame — bounded by
    // spark.sql.shuffle.partitions (cluster config, never data).
    // Ranks are identical to the single-sort formulation because range
    // partitions are contiguous runs of the (rev, custkey) total
    // order, so Σ rn·x matches the oracle exactly; both Σx and Σ rn·x
    // stay exact decimal through the string-hop; G is one shared IEEE
    // expression over those exact bases. `parts` persists because the
    // offset frame and the ranked frame both read it (and a re-run of
    // repartitionByRange would re-sample its boundaries).
    "q_stats_gini" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(D(col("o_totalprice"))).as("rev"))
      val parts = rev.repartitionByRange(col("rev"), col("o_custkey"))
        .withColumn("pid", spark_partition_id())
        .persist()
      val offsets = parts.groupBy("pid").agg(count(lit(1)).as("pc"))
        .withColumn("off", coalesce(sum(col("pc")).over(
          Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("pid", "off")
      val ranked = parts.join(broadcast(offsets), "pid")
        .withColumn("rn", (col("off") + row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("rev"), col("o_custkey")))).cast(LongType))
      ranked.agg(count(lit(1)).as("n"),
          sum(col("rev")).as("sd"),
          sum(col("rn") * col("rev")).as("srd"))
        .select(col("n"),
          col("sd").cast(StringType).cast(DoubleType).as("srev"),
          col("srd").cast(StringType).cast(DoubleType).as("srnrev"))
        .select(col("n"), col("srev").as("total_rev"),
          ((lit(2.0) * col("srnrev") - (col("n") + lit(1L)) * col("srev")) /
            (col("n") * col("srev"))).as("gini"))
        .orderBy("n")
    }),

    // Multinomial naive-Bayes language classifier, trained and scored
    // in one declared pipeline: docs split 80/20 by key (train/test),
    // Laplace-smoothed per-class token log-probabilities over the
    // train vocabulary, and argmax scoring of every test doc. The
    // model is the (vocab × 5 classes) grid — linear in vocabulary,
    // built by one broadcast of the 5-row class frame and a left join
    // against the exact (term, class) counts; scoring is a pure
    // equi-join of the test token stream against that model (the model
    // broadcasts at any corpus scale: its size is vocabulary-bound,
    // not corpus-bound). Per-term logs are round(ln,6) summed as exact
    // DECIMAL(18,6) (order-free merge); argmax is a doc-partitioned
    // window with a class tie-break.
    "q_ml_naive_bayes" -> ((s, dir) => naiveBayes(s, dir))
  )

  /** The declared q_ml_naive_bayes body. `cutModel` (r13 optimization
    * round) cuts lineage at the 5-ROW class-stats frame `cls5`: it has
    * TWO consumers (the model's smoothing constants and the final
    * logprior join), each of which otherwise re-derives its three
    * corpus aggregates — 9 parquet scans of `documents` in the uncut
    * plan (plans/r13/q_ml_naive_bayes_before.txt, zero exchange reuse)
    * vs 6 after the cut. This is NOT the r11-rejected grid restructure
    * (which persisted the corpus-keyed (term, class) grid and lost —
    * see the comment below); the cut frame here is 5 rows. Duo A/B at
    * sf0.1 (7 rounds, B slots): 2.08 s cut vs 2.11 uncut — a TIMING
    * TIE at fixture scale (the saved explode passes are cheap here),
    * adopted on the structural argument: three fewer corpus-sized
    * passes in the plan at any scale, for one extra 5-row job
    * (OPTIMIZATION_r13.md).
    */
  private[graft] def naiveBayes(s: org.apache.spark.sql.SparkSession,
      dir: String, cutModel: Boolean = true): DataFrame = {
      val Dec6 = DecimalType(18, 6)
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val ttoks = train.select(col("lang"),
        explode(split(col("text"), " ")).as("term"))
      // Deliberately FOUR independent aggregations over the re-fused
      // token stream, not one materialized (term, class) grid with
      // vocab-sized derivations: tried in r11 and REJECTED on the A/B
      // (3.65 s vs 3.19 at sf0.1, same-JVM interleaved medians).
      // Each aggregate fuses tokenize→explode with its map-side
      // partial combine, so the "extra corpus passes" each shuffle
      // only vocab-sized partials — cheaper than serializing the
      // whole model pipeline behind one persisted grid (the
      // minhashBuckets don't-cache-the-string-stream lesson again).
      val cls = ttoks.groupBy("lang").agg(count(lit(1)).as("tot_l"))
      val nd = train.groupBy("lang").agg(count(lit(1)).as("n_docs_l"))
      val vc = ttoks.agg(countDistinct(col("term")).as("v"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cls5raw = cls.join(nd, "lang")
        .withColumn("n_train", sum(col("n_docs_l")).over(all))
        .crossJoin(broadcast(vc))
        .withColumn("logprior", round(log(
          col("n_docs_l").cast(DoubleType) / col("n_train")), 6))
      val cls5 = if (cutModel) cutLineage(cls5raw) else cls5raw
      val cnt = ttoks.groupBy("term", "lang").agg(count(lit(1)).as("c"))
      val logp = ttoks.select("term").distinct()
        .crossJoin(broadcast(cls5.select("lang", "tot_l", "v")))
        .join(cnt, Seq("term", "lang"), "left")
        .withColumn("logp", round(log(
          (coalesce(col("c"), lit(0L)) + lit(1.0)) /
            (col("tot_l") + col("v"))), 6))
        .select("term", "lang", "logp")
      val stoks = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang").as("lang_actual"),
          explode(split(col("text"), " ")).as("term"))
      stoks.join(logp, "term")
        .groupBy("doc_id", "lang_actual", "lang")
        .agg(sum(col("logp").cast(Dec6)).as("sum_logp"))
        .join(broadcast(cls5.select(col("lang"), col("logprior"))), "lang")
        .withColumn("score", col("sum_logp") + col("logprior").cast(Dec6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang_actual"),
          col("lang").as("lang_pred"),
          col("score").cast(StringType).cast(DoubleType).as("score"))
        .orderBy("doc_id")
  }

  val oracle: Map[String, String] = Map(
    // brute force is semantics-equal: cell = R with ±1 neighbors covers
    // every pair within R (proof in the query doc)
    "q_join_spatial_grid" ->
      """WITH c AS (SELECT c_custkey,
        |    (c_custkey*7919)%10000 cx, (c_custkey*104729)%10000 cy
        |  FROM customer),
        |s AS (SELECT s_suppkey,
        |    (s_suppkey*6151)%10000 sx, (s_suppkey*3571)%10000 sy
        |  FROM supplier),
        |pairs AS (SELECT c_custkey custkey, s_suppkey suppkey,
        |    (cx-sx)*(cx-sx)+(cy-sy)*(cy-sy) dist2 FROM c JOIN s
        |  ON (cx-sx)*(cx-sx)+(cy-sy)*(cy-sy) <= 250000),
        |near AS (SELECT custkey, suppkey, dist2,
        |    row_number() OVER (PARTITION BY custkey
        |      ORDER BY dist2, suppkey) rn FROM pairs)
        |SELECT custkey, suppkey, dist2 FROM near WHERE rn = 1
        |ORDER BY dist2, custkey LIMIT 200""".stripMargin,

    // e0 suffixes force DOUBLE literals: DuckDB otherwise parses 2.2 /
    // 1.2 as DECIMAL(2,1) and runs exact-decimal arithmetic where Spark
    // runs IEEE — a last-ulp drift on the inexact constants
    "q_text_bm25" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) term
        |  FROM documents),
        |dl AS (SELECT doc_id,
        |    CAST(len(string_split(text,' ')) AS BIGINT) dl FROM documents),
        |stats AS (SELECT CAST(COUNT(*) AS BIGINT) n_docs,
        |    CAST(SUM(dl) AS BIGINT) tot_tokens FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) tf FROM toks
        |  WHERE term IN ('merge','window','scan') GROUP BY 1,2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) df FROM toks
        |  WHERE term IN ('merge','window','scan') GROUP BY 1),
        |sc AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
        |    round(ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0), 6)
        |      * (tf.tf * 2.2e0)
        |      / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * (CAST(dl.dl AS DOUBLE)
        |          / (CAST(tot_tokens AS DOUBLE)
        |             / CAST(n_docs AS DOUBLE))))) score
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term), stats),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY term
        |    ORDER BY score DESC, doc_id) rn FROM sc)
        |SELECT term, doc_id, tf, dl, score FROM rk WHERE rn <= 20
        |ORDER BY term, score DESC, doc_id""".stripMargin,

    "q_stats_psi" ->
      """WITH cuts AS (SELECT
        |    quantile_disc(value, 0.1) c1, quantile_disc(value, 0.2) c2,
        |    quantile_disc(value, 0.3) c3, quantile_disc(value, 0.4) c4,
        |    quantile_disc(value, 0.5) c5, quantile_disc(value, 0.6) c6,
        |    quantile_disc(value, 0.7) c7, quantile_disc(value, 0.8) c8,
        |    quantile_disc(value, 0.9) c9
        |  FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT event_id % 2 side,
        |    CAST(1 + (CASE WHEN value > c1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c4 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c5 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c6 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c7 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c8 THEN 1 ELSE 0 END)
        |      + (CASE WHEN value > c9 THEN 1 ELSE 0 END) AS BIGINT) bucket
        |  FROM events, cuts),
        |g AS (SELECT bucket, COUNT(*) FILTER (WHERE side = 0) n_ref,
        |    COUNT(*) FILTER (WHERE side = 1) n_cur FROM b GROUP BY bucket),
        |tot AS (SELECT bucket, n_ref, n_cur,
        |    CAST(SUM(n_ref) OVER () AS BIGINT) tr,
        |    CAST(SUM(n_cur) OVER () AS BIGINT) tc FROM g)
        |SELECT bucket, n_ref, n_cur,
        |  CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE) p_ref,
        |  CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE) p_cur,
        |  (CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE)
        |     - CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE))
        |    * round(ln((CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE))
        |        / (CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE))), 6) psi_term
        |FROM tot ORDER BY bucket""".stripMargin,

    "q_stats_gini" ->
      """WITH rev AS (SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) rev
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT rev,
        |    row_number() OVER (ORDER BY rev, o_custkey) rn FROM rev),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        |    CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) srev,
        |    CAST(CAST(SUM(rn * rev) AS VARCHAR) AS DOUBLE) srnrev FROM rk)
        |SELECT n, srev total_rev,
        |  (2.0 * srnrev - (n + 1) * srev) / (n * srev) gini
        |FROM s ORDER BY n""".stripMargin,

    "q_ml_naive_bayes" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        |tst AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        |ttoks AS (SELECT lang, unnest(string_split(text,' ')) term
        |  FROM train),
        |cls AS (SELECT lang, COUNT(*) tot_l FROM ttoks GROUP BY lang),
        |nd AS (SELECT lang, COUNT(*) n_docs_l FROM train GROUP BY lang),
        |vc AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) v FROM ttoks),
        |cls5 AS (SELECT c.lang, c.tot_l, nd.n_docs_l,
        |    CAST(SUM(nd.n_docs_l) OVER () AS BIGINT) n_train, vc.v,
        |    round(ln(CAST(nd.n_docs_l AS DOUBLE)
        |      / CAST(SUM(nd.n_docs_l) OVER () AS BIGINT)), 6) logprior
        |  FROM cls c JOIN nd USING (lang), vc),
        |cnt AS (SELECT term, lang, COUNT(*) c FROM ttoks GROUP BY 1,2),
        |gridbase AS (SELECT v.term, c.lang, c.tot_l, c.v
        |  FROM (SELECT DISTINCT term FROM ttoks) v CROSS JOIN cls5 c),
        |logp AS (SELECT g.term, g.lang,
        |    round(ln((COALESCE(cnt.c, 0) + 1.0) / (g.tot_l + g.v)), 6) logp
        |  FROM gridbase g LEFT JOIN cnt
        |    ON cnt.term = g.term AND cnt.lang = g.lang),
        |stoks AS (SELECT doc_id, lang lang_actual,
        |    unnest(string_split(text,' ')) term FROM tst),
        |sc AS (SELECT st.doc_id, st.lang_actual, lp.lang,
        |    SUM(CAST(lp.logp AS DECIMAL(18,6))) sum_logp
        |  FROM stoks st JOIN logp lp USING (term) GROUP BY 1,2,3),
        |fin AS (SELECT sc.doc_id, sc.lang_actual, sc.lang,
        |    sc.sum_logp + CAST(c5.logprior AS DECIMAL(18,6)) score
        |  FROM sc JOIN cls5 c5 ON c5.lang = sc.lang),
        |best AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, lang) rn FROM fin)
        |SELECT doc_id, lang_actual, lang AS lang_pred,
        |  CAST(CAST(score AS VARCHAR) AS DOUBLE) score
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
  )
}
