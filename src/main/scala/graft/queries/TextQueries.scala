package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** SURVEY.md §2.8 — text analysis + quality scoring + multimodal join.
  * Token counts and lengths stay in exact integer math; ratios divide
  * exact integers in DOUBLE with the same expression shape on both
  * engines; TF-IDF rounds its ln()-product to 4dp before ranking so both
  * engines rank identical values (Java vs libm ln differs in the ulp).
  */
object TextQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          split(col("text"), " ").as("tk"))
        .select(
          col("doc_id"), col("lang"), col("n_chars"),
          size(col("tk")).cast("long").as("n_tok"),
          size(array_distinct(col("tk"))).cast("long").as("n_uniq"),
          (expr("aggregate(transform(tk, x -> cast(length(x) as bigint)), cast(0 as bigint), (acc, x) -> acc + x)")
            .cast(DoubleType) / size(col("tk"))).as("avg_tok_len"))
        .orderBy("doc_id")
    }),

    "q_text_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
      val df = tok.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", round(
          col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 4))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select("lang", "rnk", "term", "tf", "df", "score")
        .orderBy("lang", "rnk")
    }),

    "q_quality_rules" -> ((s, dir) => {
      // per-doc boolean defect flags → per-source defect rates; the
      // dingo-style ETL quality-gate shape. All flags are Column
      // expressions (pushable, codegen'd).
      val flagged = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          split(col("text"), " ").as("tk"), col("text"))
        .select(
          col("doc_id"), col("source"),
          (col("n_chars") < 50).as("too_short"),
          (size(col("tk")) < 8).as("few_words"),
          (size(array_distinct(col("tk"))).cast(DoubleType) / size(col("tk")) < 0.1)
            .as("low_diversity"),
          col("text").rlike("[^\\x00-\\x7F]").as("non_ascii"))
      flagged
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("too_short"), 1L).otherwise(0L)).as("n_short"),
          sum(when(col("few_words"), 1L).otherwise(0L)).as("n_few_words"),
          sum(when(col("low_diversity"), 1L).otherwise(0L)).as("n_low_div"),
          sum(when(col("non_ascii"), 1L).otherwise(0L)).as("n_non_ascii"),
          sum(when(col("too_short") || col("few_words") || col("low_diversity")
            || col("non_ascii"), 1L).otherwise(0L)).as("n_defect"))
        .withColumn("defect_rate",
          col("n_defect").cast(DoubleType) / col("n_docs"))
        .orderBy("source")
    }),

    "q_multimodal_join" -> ((s, dir) => {
      // text + vector + label carried through one row ("multimodal
      // column" shape); ArrayType survives the join untouched.
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .filter(col("label") < 5)
        .select(
          col("doc_id"), col("lang"), col("label"), col("n_chars"),
          size(col("embedding")).cast("long").as("dim"),
          expr("round(sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), cast(0 as double), (acc, x) -> acc + x)), 4)")
            .as("l2_norm"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT doc_id, lang, n_chars,
        | CAST(len(tk) AS BIGINT) AS n_tok,
        | CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
        | CAST(list_sum(list_transform(tk, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |   / len(tk) AS avg_tok_len
        |FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT lang, term, tf, df,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT lang, rnk, term, tf, df, score FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY score DESC, term) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "q_quality_rules" ->
      """WITH flagged AS (
        |  SELECT doc_id, source,
        |    n_chars < 50 AS too_short,
        |    len(tk) < 8 AS few_words,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) < 0.1 AS low_diversity,
        |    regexp_matches(text, '[^\x00-\x7F]') AS non_ascii
        |  FROM (SELECT doc_id, source, n_chars, text,
        |        string_split(text, ' ') AS tk FROM documents))
        |SELECT source, count(*) AS n_docs,
        |  SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS n_short,
        |  SUM(CASE WHEN few_words THEN 1 ELSE 0 END) AS n_few_words,
        |  SUM(CASE WHEN low_diversity THEN 1 ELSE 0 END) AS n_low_div,
        |  SUM(CASE WHEN non_ascii THEN 1 ELSE 0 END) AS n_non_ascii,
        |  SUM(CASE WHEN too_short OR few_words OR low_diversity OR non_ascii
        |      THEN 1 ELSE 0 END) AS n_defect,
        |  CAST(SUM(CASE WHEN too_short OR few_words OR low_diversity OR non_ascii
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS defect_rate
        |FROM flagged GROUP BY source ORDER BY source""".stripMargin,

    "q_multimodal_join" ->
      """SELECT doc_id, lang, label, n_chars,
        | CAST(len(embedding) AS BIGINT) AS dim,
        | round(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |WHERE label < 5
        |ORDER BY doc_id""".stripMargin
  )
}
