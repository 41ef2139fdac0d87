package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Reshaping / utility operators that round out the engine surface:
  * pivot, unpivot, ordered string aggregation, time-series resampling
  * with gap fill, and deterministic hash sampling.
  *
  * Hash sampling uses md5 over INTEGER key columns only — md5 is
  * byte-identical across engines, while double→string casts are not.
  */
object MiscQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }),

    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"),
            col("p_retailprice").as("p_retailprice")),
          "attr", "val")
        .orderBy("p_partkey", "attr")
    }),

    "q_agg_string_agg" -> ((s, dir) => {
      // ordered distinct concatenation — deterministic on both engines
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          array_join(array_sort(collect_set(col("source"))), ",")
            .as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    "q_ts_resample_fill" -> ((s, dir) => {
      // daily resample over the observed span with zero-fill: the day
      // spine derives from the DATA (no literals), so the query is
      // scale- and window-agnostic; spine build is a 1-row broadcast.
      val ev = events(s, dir)
      val daily = ev
        .groupBy(date_trunc("day", col("ts_us")).cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"),
          d4(sum(D(col("value")))).as("sum_val"))
      val span = ev.agg(
        min(date_trunc("day", col("ts_us")).cast("date")).as("d0"),
        max(date_trunc("day", col("ts_us")).cast("date")).as("d1"))
      val spine = span
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(col("sum_val"), lit(0.0)).as("sum_val"))
        .orderBy("day")
    }),

    // Non-oracle (the deterministic stub codec is JVM-side, not
    // SQL-expressible): full multimodal pipeline — pack text payloads
    // into the canonical binary media schema, batched decode → feature
    // extraction per partition (the mapInPandas-shaped path), then a
    // relational projection over the features. MultimodalSpec asserts
    // exact feature values; the driver records the rows-only check.
    "q_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.Multimodal.pack(
        t(s, dir, "documents").select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", "image", width = 64, height = 64)
        .as[graft.multimodal.Multimodal.MediaRow]
      graft.multimodal.Multimodal.extractFeatures(media, batchSize = 64,
        dim = 16).toDF
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
        .orderBy("media_id")
    }),

    "q_sample_hash" -> ((s, dir) => {
      // deterministic ~1/16 sample: first hex digit of md5 over the key
      // triple — reproducible, partition-count-independent, and
      // identical in any engine with md5.
      t(s, dir, "lineitem")
        .filter(substring(md5(concat_ws("-",
          col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))), 1, 1)
          === "0")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        |ORDER BY p_partkey, attr""".stripMargin,

    "q_agg_string_agg" ->
      """SELECT lang,
        | (SELECT string_agg(src, ',' ORDER BY src)
        |  FROM (SELECT DISTINCT d2.source AS src FROM documents d2
        |        WHERE d2.lang = d.lang)) AS sources,
        | COUNT(*) AS n_docs
        |FROM documents d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_ts_resample_fill" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |   COUNT(*) AS cnt,
        |   CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_val
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    (SELECT MIN(day) FROM daily),
        |    (SELECT MAX(day) FROM daily), INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT spine.day, COALESCE(cnt, 0) AS cnt,
        | COALESCE(sum_val, 0.0) AS sum_val
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin,

    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity FROM lineitem
        |WHERE substring(md5(l_orderkey || '-' || l_linenumber || '-' || l_suppkey), 1, 1) = '0'
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_quantity""".stripMargin
  )
}
