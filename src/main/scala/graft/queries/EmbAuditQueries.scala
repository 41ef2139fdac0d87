package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-6 eighteenth-pass batch: embedding-corpus health audits — the
  * per-dimension mean-drift monitor (the "did the encoder change"
  * screen run between index builds) and the L2-norm histogram (the
  * norm-collapse / outlier screen for a vector index).
  *
  * Determinism posture (SURVEY.md Appendix A + q_feat_standardize
  * precedent): float32 → double casts are EXACT; per-dim sums go
  * through DECIMAL(19,6) (order-free); squared terms round(·,12)
  * before the decimal sum; every derived float is one shared IEEE
  * expression over string-hopped exact bases; histogram bucketing is
  * floor of an IEEE-identical expression.
  */
object EmbAuditQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Per-dimension mean drift between the even-id (reference) and
    // odd-id (current) halves of the embedding corpus — top-10
    // drifting dimensions. One posexplode pass (map-side), one
    // dim×side aggregate (dim-bounded: 64 groups), drift arithmetic
    // on the 64-row frame. At 100 TB this is a single partial-agg
    // scan; nothing else grows.
    "q_emb_drift" -> ((s, dir) => {
      val x = t(s, dir, "embeddings")
        .select((col("vec_id") % 2).as("side"),
          posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select(col("side"), col("pos"),
          col("xf").cast(DoubleType).as("x"))
      val g = x.groupBy("pos", "side")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(19, 6))).as("sx"))
        .withColumn("mean",
          col("sx").cast(DecimalType(38, 8)).cast(StringType)
            .cast(DoubleType) / col("n").cast(DoubleType))
      val ref = g.filter(col("side") === 0)
        .select(col("pos"), col("mean").as("mean_ref"))
      val cur = g.filter(col("side") === 1)
        .select(col("pos"), col("mean").as("mean_cur"))
      ref.join(cur, "pos")
        .select(col("pos").cast(LongType).as("dim"), col("mean_ref"),
          col("mean_cur"),
          abs(col("mean_ref") - col("mean_cur")).as("abs_shift"))
        .orderBy(col("abs_shift").desc, col("dim"))
        .limit(10)
    }),

    // L2-norm histogram of the embedding corpus: per-vector norm² via
    // the round-then-decimal-sum recipe, then 10 equal-width buckets
    // over [0, maxn2) from the 1-row max attach — the norm-collapse
    // screen (a healthy encoder's norms cluster; a broken one's
    // spread or pile at zero). Vec-keyed aggregate + 10-row report.
    "q_emb_norm_hist" -> ((s, dir) => embNormHist(s, dir))
  )

  /** The declared q_emb_norm_hist body. `cutN2` cuts lineage at the
    * per-vector norm² frame: its TWO consumers (the 1-row max and the
    * bucket pass) each otherwise re-run the corpus explode + decimal
    * aggregate (2 embedding scans, r14 --rescans sweep). The frame is
    * one narrow row per vector — far smaller than the N×D explode it
    * saves — but only 2 consumers, so this is the naive-Bayes-boundary
    * case: adopted/refuted on the duo. Output toggle-invariant
    * (R14TogglesSpec). */
  private[graft] def embNormHist(s: org.apache.spark.sql.SparkSession,
      dir: String, cutN2: Boolean = false): DataFrame = {
    val n2Raw = t(s, dir, "embeddings")
      .select(col("vec_id"), explode(col("embedding")).as("xf"))
      .select(col("vec_id"), col("xf").cast(DoubleType).as("x"))
      .withColumn("x2", round(col("x") * col("x"), 12))
      .groupBy("vec_id")
      .agg(sum(col("x2").cast(DecimalType(28, 12)))
        .cast(StringType).cast(DoubleType).as("n2"))
    val n2 = if (cutN2) cutLineage(n2Raw) else n2Raw
    val mx = n2.agg(max(col("n2")).as("maxn2"))
    n2.crossJoin(broadcast(mx))
      .withColumn("bucket", least(
        floor(col("n2") * lit(10.0) / col("maxn2")), lit(9.0))
        .cast(LongType))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"),
        d4(min(col("n2")).cast(DecimalType(18, 4))).as("min_n2"),
        d4(max(col("n2")).cast(DecimalType(18, 4))).as("max_n2"))
      .orderBy("bucket")
  }

  val oracle: Map[String, String] = Map(
    "q_emb_drift" ->
      """WITH x AS (SELECT vec_id % 2 side,
        |    unnest(generate_series(1, len(embedding))) i,
        |    unnest(embedding) xf
        |  FROM embeddings),
        |g AS (SELECT side, i - 1 pos,
        |    CAST(COUNT(*) AS BIGINT) n,
        |    SUM(CAST(CAST(xf AS DOUBLE) AS DECIMAL(19,6))) sx
        |  FROM x GROUP BY 1, 2),
        |m AS (SELECT side, pos,
        |    CAST(CAST(CAST(sx AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)
        |      / CAST(n AS DOUBLE) mean FROM g)
        |SELECT CAST(r.pos AS BIGINT) dim, r.mean mean_ref,
        |  c.mean mean_cur, abs(r.mean - c.mean) abs_shift
        |FROM (SELECT pos, mean FROM m WHERE side = 0) r
        |JOIN (SELECT pos, mean FROM m WHERE side = 1) c
        |  ON r.pos = c.pos
        |ORDER BY abs_shift DESC, dim LIMIT 10""".stripMargin,

    "q_emb_norm_hist" ->
      """WITH x AS (SELECT vec_id, unnest(embedding) xf FROM embeddings),
        |sq AS (SELECT vec_id,
        |    round(CAST(xf AS DOUBLE) * CAST(xf AS DOUBLE), 12) x2
        |  FROM x),
        |n2 AS (SELECT vec_id,
        |    CAST(CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS VARCHAR)
        |      AS DOUBLE) n2 FROM sq GROUP BY vec_id),
        |mx AS (SELECT MAX(n2) maxn2 FROM n2),
        |b AS (SELECT vec_id, n2,
        |    CAST(least(floor(n2 * 10.0e0 / maxn2), 9.0e0) AS BIGINT)
        |      bucket
        |  FROM n2, mx)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) n_vecs,
        |  CAST(CAST(CAST(MIN(n2) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
        |    min_n2,
        |  CAST(CAST(CAST(MAX(n2) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
        |    max_n2
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
