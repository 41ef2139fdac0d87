package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.functions.GeoMean

/** SURVEY.md §2.9 — UDF / UDAF / UDTF extension surface.
  *
  * The scalar UDF and the generator are SQL-expressible on purpose (so
  * they stay oracle-able); the typed Aggregator demonstrates the stable
  * public extension API (functions.udaf) — no Catalyst internals.
  */
object UdfQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_udf_scalar" -> ((s, dir) => {
      val tier = udf((price: Double) =>
        if (price < 10000.0) "low"
        else if (price < 100000.0) "mid"
        else "high")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          tier(col("o_totalprice")).as("tier"))
        .orderBy("o_orderkey")
    }),

    "q_udaf_typed" -> ((s, dir) => {
      val geoMean = udaf(GeoMean)
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(geoMean(col("o_totalprice")), 4).as("geo_mean"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    "q_udtf_generator" -> ((s, dir) => {
      // one-row→many generator in expression form (Catalyst sees through
      // it: posexplode is a built-in Generator, fully codegen-adjacent).
      t(s, dir, "part")
        .filter(length(col("p_name")) >= 3)
        .select(col("p_partkey"), posexplode(expr(
          "transform(sequence(0, length(p_name) - 3), i -> substr(p_name, i + 1, 3))"))
          .as(Seq("pos", "gram")))
        .select(col("p_partkey"), col("pos").cast("long").as("pos"),
          col("gram"))
        .orderBy("p_partkey", "pos")
    }),

    // Misra–Gries frequent-items summary (mergeable-sketch UDAF): top-10
    // terms per language from O(k)-state partial summaries. k=64 exceeds
    // the fixture vocabulary (31 terms at every SF), so the summary is
    // exact here and the plain GROUP BY oracle applies; the eviction /
    // lower-bound path is property-tested in LibrarySpec on skewed data.
    "q_agg_heavy_hitters" -> ((s, dir) => {
      val fi = udaf(graft.functions.FrequentItems(64))
      t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .groupBy("lang")
        .agg(fi(col("term")).as("items"))
        .select(col("lang"), posexplode(col("items")).as(Seq("rk", "it")))
        .select(col("lang"), (col("rk") + 1).cast("long").as("rank"),
          col("it.term").as("term"), col("it.lb_count").as("lb_count"))
        .filter(col("rank") <= 10)
        .orderBy("lang", "rank")
    }),

    // Count-Min sketch (mergeable-sketch UDAF #2): ONE O(d·w) sketch of
    // the whole fact's priority stream, point-estimates read back by
    // pure expression (xxhash64 + element_at — no UDF in the read
    // path). The 5-key fixture domain is collision-free at d=4, w=256
    // (deterministic hash layout, asserted in LibrarySpec), so the
    // estimates ARE the exact counts and the plain GROUP BY oracle
    // applies; the overestimate/merge guarantees are property-tested on
    // adversarial streams. The 1-row sketch attach is the q_text_tfidf
    // broadcast shape (n × 1, lint-allowlisted).
    "q_agg_countmin" -> ((s, dir) => {
      import graft.functions.CountMin
      val d = 4; val w = 256
      val cm = udaf(CountMin(d, w))
      val sk = t(s, dir, "orders")
        .agg(cm(col("o_orderpriority")).as("sk"))
      t(s, dir, "orders")
        .select(col("o_orderpriority").as("key")).distinct()
        .join(broadcast(sk))
        .select(col("key"),
          CountMin.estimate(col("sk"), col("key"), d, w).as("est"))
        .orderBy("key")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT o_orderkey, o_totalprice,
        | CASE WHEN o_totalprice < 10000.0 THEN 'low'
        |      WHEN o_totalprice < 100000.0 THEN 'mid'
        |      ELSE 'high' END AS tier
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_udaf_typed" ->
      """SELECT o_orderstatus,
        | round(exp(avg(ln(o_totalprice))), 4) AS geo_mean,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_udtf_generator" ->
      """SELECT p_partkey, pos, gram FROM (
        | SELECT p_partkey,
        |  unnest(range(length(p_name) - 2)) AS pos,
        |  unnest(list_transform(generate_series(1, length(p_name) - 2),
        |    i -> substr(p_name, i, 3))) AS gram
        | FROM part WHERE length(p_name) >= 3)
        |ORDER BY p_partkey, pos""".stripMargin,

    "q_agg_heavy_hitters" ->
      """SELECT lang, rank, term, lb_count FROM (
        |  SELECT lang, term, lb_count,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY lb_count DESC, term) AS BIGINT) AS rank
        |  FROM (
        |    SELECT lang, term, count(*) AS lb_count
        |    FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
        |          FROM documents)
        |    GROUP BY lang, term))
        |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,

    "q_agg_countmin" ->
      """SELECT o_orderpriority AS key, COUNT(*) AS est
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
