package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** SURVEY.md §2.6 — sorts, limits, top-k, set operations.
  *
  * NULL-ordering is always explicit (Spark defaults NULLS FIRST asc,
  * DuckDB NULLS LAST — A.5). Set ops use Spark's distinct-semantics
  * intersect/except which match SQL INTERSECT/EXCEPT.
  */
object SortSetQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_sort_multikey" -> ((s, dir) => {
      // testdata has no NULLs — nullif manufactures them so the NULLS
      // LAST spec is actually exercised.
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("st"),
          col("o_totalprice"))
        .orderBy(col("st").desc_nulls_last, col("o_totalprice").asc,
          col("o_orderkey").asc)
    }),

    "q_limit_topn" -> ((s, dir) => {
      // global sort + limit ⇒ TakeOrderedAndProject: at scale this is a
      // per-partition top-20 + single tiny merge, never a full sort.
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    "q_set_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val y95 = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
      val y00 = o.filter(year(col("o_orderdate")) === 2000)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
      y95.unionAll(y00).orderBy("o_orderkey", "yr")
    }),

    "q_set_union_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")))
        .distinct()
        .orderBy("nk")
    }),

    "q_set_intersect" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
        .intersect(
          t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")))
        .orderBy("nk")
    }),

    "q_set_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
        .except(
          t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")))
        .orderBy("nk")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multikey" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st, o_totalprice
        |FROM orders
        |ORDER BY st DESC NULLS LAST, o_totalprice ASC, o_orderkey ASC""".stripMargin,

    "q_limit_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_set_union_all" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr
        |FROM orders WHERE year(o_orderdate) = 1995
        |UNION ALL
        |SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr
        |FROM orders WHERE year(o_orderdate) = 2000
        |ORDER BY o_orderkey, yr""".stripMargin,

    "q_set_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin
  )
}
