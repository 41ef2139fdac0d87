package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Round-7 eighth-pass batch (closer): recall@k retrieval evaluation
  * and repeat-customer accounting — two single-scan exact-count shapes
  * finishing the evaluation and customer-analytics families.
  *
  * Determinism: both are pure int64 counts up to one shared IEEE
  * division each.
  */
object RetentionEvalQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    // Recall@10 per user on the q_ml_map_at_k ranking substrate —
    // the coverage companion (MAP says how EARLY the hits rank;
    // recall says how MANY of the relevant items the cutoff catches).
    // Hits are integer window counts; recall is one shared division.
    "q_ml_recall_at_k" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("rel"))
      val wu = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      val hits = ev.withColumn("rnk", row_number().over(wu))
        .filter(col("rnk") <= 10)
        .groupBy("user_id").agg(sum(col("rel")).as("hits10"))
      val npos = ev.groupBy("user_id").agg(sum(col("rel")).as("n_rel"))
        .filter(col("n_rel") >= 1)
      npos.join(hits, Seq("user_id"), "left")
        .select(col("user_id"), col("n_rel"),
          coalesce(col("hits10"), lit(0L)).as("hits10"),
          (coalesce(col("hits10"), lit(0L)).cast(DoubleType) /
            col("n_rel").cast(DoubleType)).as("recall10"))
        .orderBy("user_id")
    }),

    // Repeat-customer rate per nation — the retention KPI beside
    // q_retention_cohort's time curves (what share of buyers come
    // back at all). One orders aggregate keyed by customer, one
    // broadcast dimension attach, exact counts, one division.
    "q_orders_repeat_rate" -> ((s, dir) => {
      val perCust = t(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      perCust
        .join(dim(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_buyers"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L))
            .as("repeat_buyers"),
          sum(col("n_orders")).as("n_orders"))
        .select(col("nation"), col("n_buyers"), col("repeat_buyers"),
          col("n_orders"),
          (col("repeat_buyers").cast(DoubleType) /
            col("n_buyers").cast(DoubleType)).as("repeat_rate"))
        .orderBy("nation")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ml_recall_at_k" ->
      """WITH ev AS (SELECT user_id, event_id, value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END rel
        |  FROM events),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY value DESC, event_id) rnk FROM ev),
        |hits AS (SELECT user_id, CAST(SUM(rel) AS BIGINT) hits10
        |  FROM ranked WHERE rnk <= 10 GROUP BY 1),
        |npos AS (SELECT user_id, CAST(SUM(rel) AS BIGINT) n_rel
        |  FROM ev GROUP BY 1 HAVING SUM(rel) >= 1)
        |SELECT n.user_id, n.n_rel,
        |  CAST(COALESCE(h.hits10, 0) AS BIGINT) hits10,
        |  CAST(COALESCE(h.hits10, 0) AS DOUBLE)
        |    / CAST(n.n_rel AS DOUBLE) recall10
        |FROM npos n LEFT JOIN hits h ON n.user_id = h.user_id
        |ORDER BY n.user_id""".stripMargin,

    "q_orders_repeat_rate" ->
      """WITH pc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT)
        |    n_orders FROM orders GROUP BY 1)
        |SELECT c.c_nationkey nation,
        |  CAST(COUNT(*) AS BIGINT) n_buyers,
        |  CAST(SUM(CASE WHEN pc.n_orders >= 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) repeat_buyers,
        |  CAST(SUM(pc.n_orders) AS BIGINT) n_orders,
        |  CAST(SUM(CASE WHEN pc.n_orders >= 2 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) repeat_rate
        |FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey ORDER BY nation""".stripMargin
  )
}
