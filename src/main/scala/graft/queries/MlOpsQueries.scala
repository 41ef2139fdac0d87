package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 third-pass ML/feature-pipeline operators: distributed
  * k-means (the semantic-clustering / IVF-codebook-training shape),
  * the covariance/Gram matrix (the PCA input — big-N × small-d reduced
  * to a d² aggregate), per-language quality calibration (percentile
  * quality floors), and a shuffle-key skew report (the "why is my job
  * slow" diagnostic).
  *
  * Scale notes:
  *  - k-means: every Lloyd iteration is one broadcast-equi-join of the
  *    (k·d)-row centroid frame onto the exploded coordinates plus two
  *    keyed aggregates — no driver collect, no all-pairs; the classic
  *    distributed formulation. Coordinates are BIGINT micro-units
  *    (the q_graph_pagerank recipe) so an ITERATIVE float computation
  *    stays bit-identical across engines: +1 offset keeps them
  *    non-negative (Spark `div` truncates toward zero, DuckDB `//`
  *    floors — they only agree on non-negatives), distances are exact
  *    int64 sums, centroid updates are integer floor division.
  *  - covariance: the d×d second-moment matrix folds map-side from an
  *    IN-ROW upper-triangle pair explode (no self-join anywhere — the
  *    shuffle carries d²/2 partial sums per task, not N·d² rows).
  *    At 100 TB this is THE way to fit PCA/whitening: one pass, one
  *    aggregate keyed by dimension pair; the d×d result is
  *    driver-bounded by construction (graft.functions.Pca eigensolves
  *    it).
  *  - calibration: percentile ranks partition by language — the window
  *    key is the group key, so each language calibrates independently
  *    and in parallel.
  *  - skew report: aggregate → distributed TakeOrdered top-10 → a
  *    10-row window; the global totals attach as a 1-row broadcast.
  *    The full per-key window formulation (fine in the oracle) would
  *    single-partition a billion-key frame at 100 TB.
  */
object MlOpsQueries extends QSet {

  private val K = 8

  /** Embedding coordinates as non-negative BIGINT micro-units:
    * xq = floor((x + 1) · 10⁶). The float→double cast, one add, one
    * multiply, and floor are each bit-identical IEEE on both engines;
    * the +1 offset (embeddings live in [-0.58, 0.52]) keeps xq ≥ 0 so
    * integer division semantics can't diverge. Distances are offset-
    * invariant (differences cancel it). */
  private def microCoords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos"),
        floor((col("xf").cast(DoubleType) + 1.0d) * 1000000.0d).as("xq"))

  /** One Lloyd assignment step: exact int64 squared distance to each
    * centroid, argmin with a deterministic (dist, cl) tie-break. */
  private def assign(x: DataFrame, c: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = x.join(broadcast(c), "pos")
      .withColumn("dd", (col("xq") - col("cq")) * (col("xq") - col("cq")))
      .groupBy("vec_id", "cl").agg(sum(col("dd")).as("dist"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cl"))
    d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "cl", "dist")
  }

  /** One Lloyd update step: new centroid = per-(cluster, dim) integer
    * mean (floor division — exact, order-independent). */
  private def update(x: DataFrame, a: DataFrame): DataFrame =
    x.join(a.select("vec_id", "cl"), "vec_id")
      .groupBy("cl", "pos")
      .agg(expr("sum(xq) div count(1)").as("cq"))

  val queries: Map[String, QFn] = Map(
    // Smoothed TARGET ENCODING of a categorical feature (the leakage-
    // safe mean-encoding every tabular-ML pipeline ships): per market
    // segment, the order-price mean shrunk toward the global mean with
    // pseudo-count m=100 — encode = (Σy + m·ȳ)/(n + m). The fact⋈dim
    // join is a keyed shuffle; per-category moments are exact decimal
    // partial-folds; the global mean rides a WINDOW over the 5-row
    // category frame (category-bounded at any scale — never a 1-row
    // broadcast, never a second scan); the final arithmetic is one
    // identical IEEE shape over string-hopped doubles (A.8).
    "q_feat_target_encode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val j = t(s, dir, "orders")
        .select(col("o_custkey"), D(col("o_totalprice")).as("p"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      val per = j.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val gm = d4(col("ts")) / col("tn").cast(DoubleType)
      per.withColumn("tn", sum(col("n")).over(wAll))
        .withColumn("ts", sum(col("sp")).over(wAll))
        .select(col("c_mktsegment"), col("n"),
          (d4(col("sp")) / col("n").cast(DoubleType)).as("mean_price"),
          ((d4(col("sp")) + lit(100.0d) * gm) /
            (col("n").cast(DoubleType) + lit(100.0d))).as("smoothed"))
        .orderBy("c_mktsegment")
    }),

    // LEAKAGE-FREE cross-fold target encoding (the deployment form of
    // q_feat_target_encode): each deterministic fold (o_orderkey % 5)
    // is encoded from the OTHER folds' statistics — leave-fold-out
    // sums by exact decimal subtraction from per-segment totals (one
    // aggregate pass; never 5 re-scans), the shrinkage prior is the
    // all-data global mean. Both totals ride windows over the
    // 25-row (segment × fold) frame — category-bounded at any scale.
    "q_feat_target_encode_cv" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val j = t(s, dir, "orders")
        .select(col("o_custkey"), (col("o_orderkey") % 5).as("fold"),
          D(col("o_totalprice")).as("p"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      val per = j.groupBy(col("c_mktsegment"), col("fold"))
        .agg(count(lit(1)).as("n_f"), sum(col("p")).as("s_f"))
      val wSeg = Window.partitionBy("c_mktsegment")
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val gm = d4(col("gs")) / col("gn").cast(DoubleType)
      per
        .withColumn("tn", sum(col("n_f")).over(wSeg))
        .withColumn("ts", sum(col("s_f")).over(wSeg))
        .withColumn("gn", sum(col("n_f")).over(wAll))
        .withColumn("gs", sum(col("s_f")).over(wAll))
        .select(col("c_mktsegment"), col("fold"), col("n_f"),
          ((d4(col("ts") - col("s_f")) + lit(100.0d) * gm) /
            ((col("tn") - col("n_f")).cast(DoubleType) + lit(100.0d)))
            .as("encode"))
        .orderBy("c_mktsegment", "fold")
    }),

    // Distributed k-means (k = 8, 2 unrolled Lloyd iterations — fixed
    // so the oracle is a plain chained-CTE query, like pagerank's 3
    // iterations): deterministic seeding (the k vec_ids ranked first
    // by md5 — a content-independent spread with no runtime
    // randomness, SURVEY.md A.6), integer micro-unit arithmetic
    // throughout. Output: each vector's final cluster + exact int64
    // squared distance. Seeds come from a distributed TakeOrdered
    // top-k, not a global sort.
    "q_cluster_kmeans" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val x = microCoords(s, dir).persist()
      val seeds = t(s, dir, "embeddings")
        .select(col("vec_id"), md5(col("vec_id").cast("string")).as("h"))
        .orderBy(col("h"), col("vec_id")).limit(K)
      val wc = Window.orderBy(col("h"), col("vec_id"))
      val init = seeds
        .withColumn("cl", row_number().over(wc).cast(LongType))
        .select("vec_id", "cl")
      val c0 = init.join(x, "vec_id")
        .select(col("cl"), col("pos"), col("xq").as("cq"))
      val a1 = assign(x, c0)
      // localCheckpoint the k×dim centroid frame between Lloyd rounds:
      // values are identical (it only materializes c1 eagerly), but the
      // final job's plan tree no longer carries round 1's whole
      // join→window→aggregate subtree, which AQE otherwise re-optimizes
      // at every stage of round 2 — single-sample cold time 6.8 s →
      // ~3 s on identical data (warm medians unchanged; the componentReps
      // lineage-truncation precedent applied to an unrolled loop)
      // cutLineage = localCheckpoint in-image, reliable checkpoint
      // when spark.graft.checkpointDir is configured (cluster posture)
      val c1 = cutLineage(update(x, a1))
      val a2 = assign(x, c1)
      a2.select(col("vec_id"), col("cl").as("cluster"), col("dist"))
        .orderBy("vec_id")
    }),

    // Covariance matrix of the embedding corpus (upper triangle,
    // p1 ≤ p2): second moments fold from an in-row pair explode —
    // round-then-decimal-sum (A.8) makes the Σx·y accumulation
    // order-independent (float products are binary fractions, so no
    // decimal round can land on a half — the cast is engine-exact);
    // cov = (Σxy − Σx·Σy/n)/(n−1) is then the identical IEEE
    // expression shape on both engines.
    "q_feat_cov" -> ((s, dir) => featCov(s, dir)),

    // Per-language quality calibration: type-token ratio scored per
    // doc, percentile-ranked WITHIN its language, bottom quintile
    // flagged for drop — the per-group quality floor a multilingual
    // corpus needs (a global threshold would gut low-resource
    // languages). ttr is ONE IEEE division of exact ints; percent_rank
    // over the unique (ttr, doc_id) order is (rank−1)/(n−1) on both
    // engines.
    "q_quality_calibrate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("lang"),
          (size(array_distinct(col("tk"))).cast(DoubleType) /
            size(col("tk"))).as("ttr"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("ttr"), col("doc_id"))
      d.withColumn("pctl", percent_rank().over(w))
        .withColumn("keep", (col("pctl") >= 0.2).cast(LongType))
        .orderBy("doc_id")
    }),

    // Shuffle-key skew report over events.user_id: the top-10 heavy
    // keys with their ratio to the mean key load and the cumulative
    // share of all rows they carry — exactly what you read before
    // deciding to salt a join (q_join_salted) or lean on AQE skew
    // handling. ratio = cnt·nkeys/total and share = cum/total are each
    // ONE IEEE division of exact int64s.
    "q_skew_diagnose" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val tot = cnt.agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("nkeys"))
      val top = cnt.orderBy(col("cnt").desc, col("user_id")).limit(10)
      val w = Window.orderBy(col("cnt").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.withColumn("cum", sum(col("cnt")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("user_id"), col("cnt"),
          ((col("cnt") * col("nkeys")).cast(DoubleType) / col("total"))
            .as("ratio_to_mean"),
          (col("cum").cast(DoubleType) / col("total")).as("cum_share"))
        .orderBy(col("cnt").desc, col("user_id"))
    })
  )

  /** The declared q_feat_cov body. `cutSx` cuts lineage at the
    * per-position first-moment frame `sx` (DIMENSION rows — ~32): it
    * joins the covariance grid TWICE (as sx1 on p1 and sx2 on p2), so
    * the uncut plan re-runs its corpus posexplode + aggregate once per
    * consumer (3 embedding scans, r14 --rescans sweep). The cut trades
    * one corpus pass for a dim-sized materialization. Two consumers ×
    * one corpus pass each — the naive-Bayes cls5 precedent rather than
    * the ≥3-consumer rule; adopted/refuted on the duo. Output
    * toggle-invariant (R14TogglesSpec).
    */
  private[graft] def featCov(s: org.apache.spark.sql.SparkSession,
      dir: String, cutSx: Boolean = false): DataFrame = {
    val emb = t(s, dir, "embeddings").select(
      expr("transform(embedding, e -> cast(e as double))").as("v"))
    val pairs = emb.select(explode(expr(
      "flatten(transform(sequence(0, size(v)-1), i -> " +
        "transform(sequence(i, size(v)-1), j -> " +
        "struct(i as p1, j as p2, round(v[i] * v[j], 10) as xy))))"))
      .as("pr"))
      .select(col("pr.p1").cast(LongType).as("p1"),
        col("pr.p2").cast(LongType).as("p2"), col("pr.xy").as("xy"))
    val sxy = pairs.groupBy("p1", "p2").agg(
      count(lit(1)).as("n"),
      sum(col("xy").cast(DecimalType(30, 10))).cast(StringType)
        .cast(DoubleType).as("sxy"))
    val sxRaw = emb.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(col("x").cast(DecimalType(19, 8))).cast(StringType)
        .cast(DoubleType).as("sx"))
      .select(col("pos").cast(LongType).as("pos"), col("sx"))
    val sx = if (cutSx) cutLineage(sxRaw) else sxRaw
    sxy
      .join(broadcast(sx.select(col("pos").as("p1"), col("sx").as("sx1"))),
        "p1")
      .join(broadcast(sx.select(col("pos").as("p2"), col("sx").as("sx2"))),
        "p2")
      .select(col("p1"), col("p2"),
        ((col("sxy") - col("sx1") * col("sx2") / col("n")) /
          (col("n") - lit(1L))).as("cov"))
      .orderBy("p1", "p2")
  }

  val oracle: Map[String, String] = Map(
    "q_feat_target_encode" ->
      """WITH j AS (
        |  SELECT c_mktsegment,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS p
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT c_mktsegment, COUNT(*) n, SUM(p) sp
        |        FROM j GROUP BY 1),
        |tot AS (SELECT c_mktsegment, n, sp,
        |  CAST(SUM(n) OVER () AS BIGINT) tn, SUM(sp) OVER () ts
        |  FROM per)
        |SELECT c_mktsegment, n,
        |  CAST(CAST(CAST(sp AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
        |    / CAST(n AS DOUBLE) AS mean_price,
        |  (CAST(CAST(CAST(sp AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
        |     + 100.0 *
        |       (CAST(CAST(CAST(ts AS DECIMAL(18,4)) AS VARCHAR)
        |          AS DOUBLE) / CAST(tn AS DOUBLE)))
        |    / (CAST(n AS DOUBLE) + 100.0) AS smoothed
        |FROM tot ORDER BY c_mktsegment""".stripMargin,

    "q_feat_target_encode_cv" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey % 5 AS fold,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS p
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT c_mktsegment, fold, COUNT(*) n_f, SUM(p) s_f
        |        FROM j GROUP BY 1, 2),
        |tot AS (SELECT c_mktsegment, fold, n_f, s_f,
        |  CAST(SUM(n_f) OVER (PARTITION BY c_mktsegment) AS BIGINT) tn,
        |  SUM(s_f) OVER (PARTITION BY c_mktsegment) ts,
        |  CAST(SUM(n_f) OVER () AS BIGINT) gn,
        |  SUM(s_f) OVER () gs
        |  FROM per)
        |SELECT c_mktsegment, fold, n_f,
        |  (CAST(CAST(CAST(ts - s_f AS DECIMAL(18,4)) AS VARCHAR)
        |     AS DOUBLE)
        |   + 100.0 *
        |     (CAST(CAST(CAST(gs AS DECIMAL(18,4)) AS VARCHAR)
        |        AS DOUBLE) / CAST(gn AS DOUBLE)))
        |  / (CAST(tn - n_f AS DOUBLE) + 100.0) AS encode
        |FROM tot ORDER BY c_mktsegment, fold""".stripMargin,

    "q_cluster_kmeans" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |    CAST(floor((CAST(unnest(embedding) AS DOUBLE) + 1.0)
        |      * 1000000) AS BIGINT) AS xq
        |  FROM embeddings),
        |sd AS (
        |  SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h
        |  FROM embeddings ORDER BY h, vec_id LIMIT 8),
        |init AS (
        |  SELECT vec_id,
        |    row_number() OVER (ORDER BY h, vec_id) AS cl
        |  FROM sd),
        |c0 AS (
        |  SELECT i.cl, x.pos, x.xq AS cq
        |  FROM init i JOIN x ON x.vec_id = i.vec_id),
        |d1 AS (
        |  SELECT x.vec_id, c.cl,
        |    CAST(SUM((x.xq - c.cq) * (x.xq - c.cq)) AS BIGINT) AS dist
        |  FROM x JOIN c0 c ON x.pos = c.pos GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cl, dist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, cl) AS rn FROM d1) WHERE rn = 1),
        |c1 AS (
        |  SELECT a.cl, x.pos, CAST(SUM(x.xq) // COUNT(*) AS BIGINT) AS cq
        |  FROM a1 a JOIN x ON x.vec_id = a.vec_id GROUP BY 1, 2),
        |d2 AS (
        |  SELECT x.vec_id, c.cl,
        |    CAST(SUM((x.xq - c.cq) * (x.xq - c.cq)) AS BIGINT) AS dist
        |  FROM x JOIN c1 c ON x.pos = c.pos GROUP BY 1, 2),
        |a2 AS (
        |  SELECT vec_id, cl, dist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist, cl) AS rn FROM d2) WHERE rn = 1)
        |SELECT vec_id, cl AS cluster, dist FROM a2
        |ORDER BY vec_id""".stripMargin,

    "q_feat_cov" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |p AS (
        |  SELECT a.pos AS p1, b.pos AS p2, round(a.x * b.x, 10) AS xy
        |  FROM x a JOIN x b
        |    ON a.vec_id = b.vec_id AND a.pos <= b.pos),
        |sxy AS (
        |  SELECT p1, p2, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(xy AS DECIMAL(30,10))) AS VARCHAR)
        |      AS DOUBLE) AS sxy
        |  FROM p GROUP BY 1, 2),
        |sx AS (
        |  SELECT pos,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,8))) AS VARCHAR)
        |      AS DOUBLE) AS sx
        |  FROM x GROUP BY pos)
        |SELECT s.p1, s.p2,
        |  (s.sxy - a.sx * b.sx / s.n) / (s.n - 1) AS cov
        |FROM sxy s
        |JOIN sx a ON a.pos = s.p1
        |JOIN sx b ON b.pos = s.p2
        |ORDER BY p1, p2""".stripMargin,

    "q_quality_calibrate" ->
      """SELECT doc_id, lang, ttr,
        |  percent_rank() OVER (PARTITION BY lang
        |    ORDER BY ttr, doc_id) AS pctl,
        |  CAST(percent_rank() OVER (PARTITION BY lang
        |    ORDER BY ttr, doc_id) >= 0.2 AS BIGINT) AS keep
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_skew_diagnose" ->
      """WITH c AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |    COUNT(*) AS nkeys FROM c),
        |r AS (
        |  SELECT user_id, cnt,
        |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM c)
        |SELECT user_id, cnt,
        |  CAST(cnt * t.nkeys AS DOUBLE) / t.total AS ratio_to_mean,
        |  CAST(cum AS DOUBLE) / t.total AS cum_share
        |FROM r, t
        |ORDER BY cnt DESC, user_id
        |LIMIT 10""".stripMargin
  )
}
