package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Round-6 fifteenth-pass batch: plain-text source round-trip (closing
  * the last built-in-source gap), nth_value window coverage, daily
  * categorical-entropy profiling, ABC (Pareto) revenue classification,
  * and an l-diversity privacy audit beside the existing k-anonymity
  * one.
  *
  * Determinism posture (SURVEY.md Appendix A): entropy terms are
  * floor-scaled to int64 nano-nats BEFORE summation (the double
  * product p·round(ln p,6) is bit-identical on both engines, floor of
  * it is exact, and the int sum is order-free — a raw double Σ would
  * be accumulation-order-dependent); everything else is exact
  * counts/decimals with shared IEEE tails.
  */
object GovernanceQueries extends QSet {

  private def tmpDir(s: org.apache.spark.sql.SparkSession, kind: String,
      dir: String): String =
    s"${graft.engine.Tables.tmpRoot}/graft_gov_${kind}_" +
      s"${new java.io.File(dir).getName}_" +
      s.sparkContext.applicationId

  val queries: Map[String, QFn] = Map(
    // Plain-text (line-oriented) source round-trip — the last built-in
    // Spark source format not yet in the graded set (csv/json/orc/
    // parquet/binary are). Structured fields serialize to one
    // tab-joined line per doc; spark.read.text reads lines back and
    // the query re-parses and aggregates. The oracle computes the same
    // aggregate from the original parquet: the text hop is lossless
    // for these fields, so results must match exactly.
    "q_source_text_roundtrip" -> ((s, dir) => {
      val path = tmpDir(s, "text", dir)
      graft.sources.Readers.writeText(
        t(s, dir, "documents").select(concat(
          col("doc_id").cast(StringType), lit("\t"),
          col("lang"), lit("\t"),
          col("n_chars").cast(StringType)).as("value")),
        path)
      s.read.text(path)
        .select(split(col("value"), "\t").as("f"))
        .select(col("f").getItem(1).as("lang"),
          col("f").getItem(2).cast(LongType).as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
    }),

    // nth_value window coverage: per customer, the 1st/2nd/3rd largest
    // order values over the full partition frame (customers with fewer
    // orders get NULLs — the outer-frame semantics nth_value exists
    // for). Customer-partitioned frames; ties broken by order key.
    "q_win_nth_value" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .withColumn("v1", nth_value(col("o_totalprice"), 1).over(w))
        .withColumn("v2", nth_value(col("o_totalprice"), 2).over(w))
        .withColumn("v3", nth_value(col("o_totalprice"), 3).over(w))
        .groupBy("o_custkey")
        .agg(max(col("v1")).as("top1"), max(col("v2")).as("top2"),
          max(col("v3")).as("top3"))
        .orderBy("o_custkey")
    }),

    // Daily categorical entropy of the event-type mix — the
    // drift-profiling scalar ("did the traffic composition change").
    // Every per-type term is floor-scaled to int64 nano-nats before
    // the per-day sum (ORDER-FREE; a double Σ would depend on
    // accumulation order), using the established round(ln,6) recipe
    // on exact count ratios. All frames are |days|×|types|.
    "q_stats_cat_entropy" -> ((s, dir) => {
      val g = events(s, dir)
        .groupBy(date_trunc("day", col("ts_us")).cast("date").as("d"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val tot = Window.partitionBy("d")
      val p = col("n").cast(DoubleType) / col("t").cast(DoubleType)
      g.withColumn("t", sum(col("n")).over(tot))
        .withColumn("term",
          floor(p * round(log(p), 6) * lit(-1.0e9)))
        .groupBy("d")
        .agg(count(lit(1)).as("n_types"), sum(col("t")).as("tchk"),
          sum(col("term")).as("h_scaled"))
        .select(col("d").as("day"), col("n_types"),
          (col("h_scaled").cast(DoubleType) / lit(1.0e9)).as("entropy_nats"))
        .orderBy("day")
    }),

    // ABC (Pareto) classification of customers by revenue: rank the
    // customer DIMENSION aggregate by revenue, class A = the head up
    // to 80% cumulative share, B to 95%, C the tail; report the class
    // rollup. Rank/cumsum windows ride the customer frame (the
    // q_stats_gini precedent — never the order fact); shares are one
    // shared IEEE division over string-hopped exact decimal sums.
    "q_orders_abc_analysis" -> ((s, dir) => {
      val hop = (c: org.apache.spark.sql.Column) =>
        c.cast(DecimalType(38, 8)).cast(StringType).cast(DoubleType)
      val rev = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(D(col("o_totalprice"))).cast(Dec).as("rev"))
      val ord = Window.orderBy(col("rev").desc, col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      rev
        .withColumn("cum", sum(col("rev")).over(ord))
        .withColumn("tot", sum(col("rev")).over(all))
        .withColumn("shr", hop(col("cum")) / hop(col("tot")))
        .withColumn("clazz",
          when(col("shr") <= 0.80, "A")
            .when(col("shr") <= 0.95, "B").otherwise("C"))
        .groupBy("clazz")
        .agg(count(lit(1)).as("n_customers"),
          d4(sum(col("rev"))).as("class_rev"))
        .orderBy("clazz")
    }),

    // l-diversity audit (companion to q_privacy_kanon): for each
    // quasi-identifier group, how many DISTINCT sensitive values
    // (market segment) appear — groups with l < 3 are re-identifiable
    // by attribute disclosure even when k-anonymous. One grouped
    // count-distinct over the dimension.
    "q_privacy_ldiversity" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("bal_bucket"),
          col("c_mktsegment"))
        .groupBy("c_nationkey", "bal_bucket")
        .agg(count(lit(1)).as("k"),
          countDistinct(col("c_mktsegment")).as("l"))
        .filter(col("l") < 3)
        .orderBy("c_nationkey", "bal_bucket")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_source_text_roundtrip" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_win_nth_value" ->
      """WITH w AS (SELECT o_custkey,
        |    nth_value(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      v1,
        |    nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      v2,
        |    nth_value(o_totalprice, 3) OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      v3
        |  FROM orders)
        |SELECT o_custkey, MAX(v1) top1, MAX(v2) top2, MAX(v3) top3
        |FROM w GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_stats_cat_entropy" ->
      """WITH g AS (SELECT CAST(date_trunc('day', ts) AS DATE) d,
        |    event_type, COUNT(*) n FROM events GROUP BY 1, 2),
        |tt AS (SELECT d, event_type, n,
        |    CAST(SUM(n) OVER (PARTITION BY d) AS BIGINT) t FROM g),
        |term AS (SELECT d, t,
        |    CAST(floor((CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
        |      * round(ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)), 6)
        |      * -1.0e9) AS BIGINT) term
        |  FROM tt)
        |SELECT d AS day, CAST(COUNT(*) AS BIGINT) n_types,
        |  CAST(SUM(term) AS DOUBLE) / 1.0e9 entropy_nats
        |FROM term GROUP BY d ORDER BY d""".stripMargin,

    "q_orders_abc_analysis" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) rev
        |  FROM orders GROUP BY 1),
        |c AS (SELECT o_custkey, rev,
        |    SUM(rev) OVER (ORDER BY rev DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
        |    SUM(rev) OVER () tot FROM rev),
        |s AS (SELECT o_custkey, rev,
        |    CAST(CAST(CAST(cum AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(CAST(tot AS DECIMAL(38,8)) AS VARCHAR)
        |        AS DOUBLE) shr
        |  FROM c),
        |cl AS (SELECT rev, CASE WHEN shr <= 0.80e0 THEN 'A'
        |    WHEN shr <= 0.95e0 THEN 'B' ELSE 'C' END clazz FROM s)
        |SELECT clazz, CAST(COUNT(*) AS BIGINT) n_customers,
        |  CAST(CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS VARCHAR)
        |    AS DOUBLE) class_rev
        |FROM cl GROUP BY clazz ORDER BY clazz""".stripMargin,

    "q_privacy_ldiversity" ->
      """SELECT c_nationkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) bal_bucket,
        |  CAST(COUNT(*) AS BIGINT) k,
        |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) l
        |FROM customer GROUP BY 1, 2
        |HAVING COUNT(DISTINCT c_mktsegment) < 3
        |ORDER BY c_nationkey, bal_bucket""".stripMargin
  )
}
