package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 corpus-operations batch: the data-governance and
  * corpus-construction shapes a training-data pipeline runs between
  * ingest and packing — each one written the way it must be written at
  * 100 TB, with the naive formulation it replaces noted inline.
  *
  * Scale notes per query live at the definition site; the common theme
  * is replacing O(n·spine) / O(n²) / driver-side patterns with delta
  * events, bounded-key aggregates, and count-derived broadcast maps.
  */
object CorpusOpsQueries extends QSet {

  /** q_corpus_mix body — balanced-corpus downsampling: derive each
    * language's keep-rate from its OWN count so every class lands at
    * the minority class's size — the class-rebalance shape. The rate
    * table is one row per lang (broadcast by construction); selection
    * is the deterministic md5-threshold from q_sample_hash, with the
    * 16-bit threshold in exact integer arithmetic ((t·65536) div n,
    * hex-printed) so both engines cut at the identical hash value. No
    * driver loop, no sampleBy approximation, reproducible under
    * re-runs.
    *
    * `windowTarget` (r14): ride the minority-class minimum over the
    * LANG-BOUNDED cnt frame as a window instead of a separate
    * agg + crossJoin — the incumbent's `cnt` had two consumers (the
    * 1-row min and the rate table), so the documents scan + lang
    * aggregate ran TWICE (plan_audit: scan=3). The window keeps one
    * consumer: 3 corpus scans → 2, zero materialization (the same
    * vocab-frame-window discipline as q_text_collocation). min over
    * all rows of the identical frame — values unchanged
    * (R14TogglesSpec pins both shapes row-for-row). */
  private[graft] def corpusMix(s: org.apache.spark.sql.SparkSession,
      dir: String, windowTarget: Boolean = true): DataFrame = {
    val d = t(s, dir, "documents")
    val cnt = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val rates0 =
      if (windowTarget) {
        val all = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        cnt.withColumn("t", min(col("n")).over(all))
      } else {
        val target = cnt.agg(min(col("n")).as("t"))
        cnt.crossJoin(broadcast(target))
      }
    val rates = rates0.select(col("lang"), col("n"), col("t"),
      lpad(lower(hex(expr("(t * 65536) div n"))), 4, "0").as("thr"))
    d.join(broadcast(rates), "lang")
      .filter(col("n") === col("t") ||
        substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Tokenized documents — the shared explode for the n-gram queries. */
  private def toks(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))

  val queries: Map[String, QFn] = Map(
    // Lines "in fulfillment" per day (ordered, not yet shipped): the
    // interval-counting shape. The naive form joins a day spine to
    // every [o_orderdate, l_shipdate] interval — O(rows × days) and a
    // non-equi join. The scale form emits TWO delta events per
    // interval (+1 open, -1 after close), aggregates to the day spine
    // (one shuffle, partial-agg), and runs ONE running sum over the
    // ~2.5k-row spine — the unpartitioned window rides the spine,
    // never the fact, so it is bounded at any fact size.
    "q_ts_active_intervals" -> ((s, dir) => {
      val iv = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("d1"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d0")),
          col("l_orderkey") === col("o_orderkey"))
      val deltas = iv.select(col("d0").as("day"), lit(1L).as("delta"))
        .unionAll(iv.select(date_add(col("d1"), 1).as("day"),
          lit(-1L).as("delta")))
      val byDay = deltas.groupBy("day")
        .agg(sum(col("delta")).as("net_change"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDay.withColumn("in_flight", sum(col("net_change")).over(w))
        .orderBy("day")
    }),

    // Duplicate-cluster canonicalization: docs sharing a token SET are
    // reorder-duplicates; keep the best representative (longest text,
    // ties to the smallest doc_id) — the "which copy survives dedup"
    // policy every corpus build needs. One shuffle on the bag key, one
    // hash aggregate; the argmax rides a collision-free BIGINT ordering
    // key (n_chars × 10⁷ − doc_id, the q_agg_minmax_by recipe) so ties
    // cannot diverge across engines.
    "q_dedup_keep_best" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          md5(array_join(array_sort(array_distinct(
            split(col("text"), " "))), " ")).as("key_h"))
        .withColumn("ord",
          col("n_chars") * lit(10000000L) - col("doc_id"))
        .groupBy("key_h")
        .agg(expr("max_by(doc_id, ord)").as("doc_id"),
          max(col("n_chars")).as("n_chars"),
          count(lit(1)).as("group_size"))
        .orderBy("doc_id")
    }),

    // Balanced-corpus downsampling: derive each language's keep-rate
    // from its OWN count so every class lands at the minority class's
    // size — the class-rebalance shape. The rate table is one row per
    // lang (broadcast by construction); selection is the deterministic
    // md5-threshold from q_sample_hash, with the 16-bit threshold in
    // exact integer arithmetic ((t·65536) div n, hex-printed) so both
    // engines cut at the identical hash value. No driver loop, no
    // sampleBy approximation, reproducible under re-runs.
    "q_corpus_mix" -> ((s, dir) => corpusMix(s, dir)),

    // Collocation mining by ASSOCIATION STRENGTH (the PMI ranking,
    // kept libm-free): lift(w1,w2) = c_ab·N / (c_a·c_b) — PMI is its
    // log, a monotone map that cannot change the ranking, so omitting
    // it keeps the compare off engine libm. Unigram counts are a
    // vocab-bounded aggregate whose corpus total rides a window over
    // the VOCAB frame (never a 1-row broadcast); bigram support ≥ 10
    // prunes the noise floor before the two vocab-keyed joins; top-30
    // is a TakeOrdered over the bounded aggregate. Every count is
    // exact int64; lift is one IEEE expression over exact bases.
    "q_text_collocation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tk = toks(s, dir)
      val uni = tk.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cw"))
        .withColumn("nn", sum(col("cw")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      val big = tk.filter(size(col("tk")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(tk) - 2), " +
            "i -> struct(tk[i] as w1, tk[i+1] as w2))")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 10)
      big
        .join(uni.select(col("w").as("w1"), col("cw").as("c_a"),
          col("nn")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("c_b")), "w2")
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          ((col("c_ab").cast(DoubleType) * col("nn").cast(DoubleType)) /
            (col("c_a").cast(DoubleType) * col("c_b").cast(DoubleType)))
            .as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(30)
    }),

    // Class-balanced EXACT-CAP sampling (the other half of
    // q_sample_stratified's rate-based rebalancing): every language
    // contributes min(n_lang, 100) documents, chosen by md5 rank — the
    // deterministic "cap the majority classes" selection a balanced
    // training mix needs when rates can't express an exact budget.
    // row_number ≤ k triggers WindowGroupLimit (each map task keeps
    // its local top-k per language BEFORE the exchange), so the
    // shuffle carries O(languages × k) rows at any corpus size.
    "q_sample_balanced" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("hk"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))))
        .filter(col("rn") <= 100)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // Corpus-wide top-50 bigrams by occurrence (with document
    // frequency): the collocation-mining shape. The explode is linear
    // in corpus tokens; the aggregate key space is vocab²-bounded, so
    // partials fold map-side and the top-k is a TakeOrdered over the
    // bounded aggregate — never a global sort of the explode.
    "q_text_ngram_topk" -> ((s, dir) => {
      toks(s, dir).filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk) - 2), " +
            "i -> struct(tk[i] as w1, tk[i+1] as w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(col("n_occ").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // Cross-source duplication signal: content prefixes (first 5
    // tokens) appearing in ≥ 2 distinct sources — the "which sources
    // mirror each other" audit that decides crawl dedup priorities.
    // One shuffle on the prefix hash; collect_set is bounded by the
    // source cardinality (20 here, small by nature), NOT by corpus
    // size, so the state per key is tiny at any scale.
    "q_dedup_cross_source" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(array_join(slice(split(col("text"), " "), 1, 5), " "))
            .as("key_h"))
        .groupBy("key_h")
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          expr("array_join(sort_array(collect_set(source)), ',')")
            .as("sources"))
        .filter(col("n_sources") >= 2)
        .orderBy("key_h")
    }),

    // k-anonymity audit over quasi-identifiers (nation × segment ×
    // account-balance kilobucket): groups smaller than k = 5 are
    // re-identification risks a privacy review must surface. One hash
    // aggregate over the QI tuple; the risky-group report is a
    // filtered aggregate, so output is bounded by the violation count.
    "q_privacy_kanon" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("bal_bucket"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(count(lit(1)).as("k"))
        .filter(col("k") < 5)
        .orderBy("c_nationkey", "c_mktsegment", "bal_bucket")
    }),

    // Referential-integrity audit: orphan facts / dangling keys across
    // the fk chain lineitem→orders→customer→nation, as the three-row
    // report a load-validation job emits. Each check is an anti-join
    // COUNT — dims broadcast; the lineitem→orders check shuffles on
    // the order key exactly once. (Counts are zero on intact data —
    // the audit proves it, and broken loads fail loudly downstream.)
    "q_ref_integrity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"))
      def check(name: String, bad: DataFrame, total: DataFrame) =
        bad.agg(count(lit(1)).as("n_violations"))
          .crossJoin(total.agg(count(lit(1)).as("n_total")))
          .select(lit(name).as("check_name"), col("n_violations"),
            col("n_total"))
      check("customer_bad_nation",
          c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"),
            "left_anti"), c)
        .unionAll(check("lineitem_orphan",
          li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti"),
          li))
        .unionAll(check("orders_orphan_cust",
          o.join(c.select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti"), o))
        .orderBy("check_name")
    }),

    // Curriculum length-bucketing: docs binned by token count into
    // power-of-two buckets (the sequence-length curriculum / batch
    // shape planner). Buckets are explicit CASE boundaries — integer
    // comparisons only, no float log2 whose half-way behavior could
    // split engines at exact powers of two. One aggregate over
    // (bucket, lang); partials fold map-side.
    "q_length_curriculum" -> ((s, dir) => {
      val nTok = size(split(col("text"), " "))
      val bucket = when(nTok < 16, "b016").when(nTok < 32, "b032")
        .when(nTok < 64, "b064").when(nTok < 128, "b128")
        .when(nTok < 256, "b256").otherwise("b999")
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars"), nTok.as("n_tok"),
          bucket.as("bucket"))
        .groupBy("bucket", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          // exact int64 sum, ONE double division — bit-identical on
          // both engines with no decimal-rounding half-way hazard
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1)))
            .as("avg_chars"))
        .orderBy("bucket", "lang")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ts_active_intervals" ->
      """WITH iv AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS d0,
        |         CAST(l.l_shipdate AS DATE) AS d1
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |dl AS (
        |  SELECT d0 AS day, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT d1 + 1, -1 FROM iv),
        |bd AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS net_change
        |       FROM dl GROUP BY day)
        |SELECT day, net_change,
        |  CAST(SUM(net_change) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS in_flight
        |FROM bd ORDER BY day""".stripMargin,

    "q_dedup_keep_best" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(text, ' '))), ' ')) AS key_h,
        |    n_chars * 10000000 - doc_id AS ord
        |  FROM documents)
        |SELECT key_h, arg_max(doc_id, ord) AS doc_id,
        |  MAX(n_chars) AS n_chars, COUNT(*) AS group_size
        |FROM b GROUP BY key_h
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_mix" ->
      """WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |tg AS (SELECT MIN(n) AS t FROM cnt),
        |rates AS (
        |  SELECT lang, n, t,
        |    lpad(lower(to_hex((t * 65536) // n)), 4, '0') AS thr
        |  FROM cnt, tg)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE r.n = r.t
        |   OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < r.thr
        |ORDER BY d.doc_id""".stripMargin,

    "q_text_collocation" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |uni AS (SELECT w, COUNT(*) cw FROM
        |  (SELECT unnest(tk) w FROM toks) GROUP BY w),
        |unn AS (SELECT w, cw, CAST(SUM(cw) OVER () AS BIGINT) nn
        |        FROM uni),
        |big AS (SELECT unnest(tk[1:len(tk)-1]) w1,
        |               unnest(tk[2:len(tk)]) w2
        |        FROM toks WHERE len(tk) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) c_ab FROM big
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 10)
        |SELECT b.w1, b.w2, b.c_ab, ua.cw AS c_a, ub.cw AS c_b,
        |  (CAST(b.c_ab AS DOUBLE) * CAST(ua.nn AS DOUBLE)) /
        |    (CAST(ua.cw AS DOUBLE) * CAST(ub.cw AS DOUBLE)) AS lift
        |FROM bc b
        |JOIN unn ua ON ua.w = b.w1
        |JOIN unn ub ON ub.w = b.w2
        |ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin,

    "q_sample_balanced" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 100 ORDER BY doc_id""".stripMargin,

    "q_text_ngram_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |big AS (
        |  SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
        |    unnest(tk[2:len(tk)]) AS w2
        |  FROM toks)
        |SELECT w1, w2, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS df
        |FROM big GROUP BY w1, w2
        |ORDER BY n_occ DESC, w1, w2
        |LIMIT 50""".stripMargin,

    "q_dedup_cross_source" ->
      """WITH k AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(string_split(text, ' ')[1:5], ' '))
        |      AS key_h
        |  FROM documents)
        |SELECT key_h, COUNT(DISTINCT source) AS n_sources,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc,
        |  array_to_string(list_sort(list(DISTINCT source)), ',') AS sources
        |FROM k GROUP BY key_h
        |HAVING COUNT(DISTINCT source) >= 2
        |ORDER BY key_h""".stripMargin,

    "q_privacy_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |  COUNT(*) AS k
        |FROM customer
        |GROUP BY 1, 2, 3
        |HAVING COUNT(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, bal_bucket""".stripMargin,

    "q_ref_integrity" ->
      """SELECT 'customer_bad_nation' AS check_name,
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |    AS n_violations,
        |  (SELECT COUNT(*) FROM customer) AS n_total
        |UNION ALL
        |SELECT 'lineitem_orphan',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |  (SELECT COUNT(*) FROM lineitem)
        |UNION ALL
        |SELECT 'orders_orphan_cust',
        |  (SELECT COUNT(*) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |  (SELECT COUNT(*) FROM orders)
        |ORDER BY check_name""".stripMargin,

    "q_length_curriculum" ->
      s"""WITH d AS (
        |  SELECT lang, n_chars, len(string_split(text, ' ')) AS n_tok,
        |    CASE WHEN len(string_split(text, ' ')) < 16 THEN 'b016'
        |         WHEN len(string_split(text, ' ')) < 32 THEN 'b032'
        |         WHEN len(string_split(text, ' ')) < 64 THEN 'b064'
        |         WHEN len(string_split(text, ' ')) < 128 THEN 'b128'
        |         WHEN len(string_split(text, ' ')) < 256 THEN 'b256'
        |         ELSE 'b999' END AS bucket
        |  FROM documents)
        |SELECT bucket, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*)
        |    AS avg_chars
        |FROM d GROUP BY bucket, lang
        |ORDER BY bucket, lang""".stripMargin
  )
}
