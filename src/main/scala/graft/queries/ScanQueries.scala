package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** SURVEY.md §2.1 — scans / sources. Column pruning + predicate pushdown
  * are delegated to Catalyst (verified in plans: `PushedFilters`,
  * `ReadSchema` carry them into the vectorized parquet reader), so these
  * queries are deliberately thin: their value is proving the scan path,
  * the ns-timestamp recipe, and the JSON-in-string source shape.
  *
  * NOTE (measured at sf0.01): (l_orderkey, l_linenumber) is NOT unique in
  * this generator's lineitem — scans over it must ORDER BY every projected
  * column for a total order (SURVEY.md A.3).
  */
object ScanQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    "q_scan_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    }),

    "q_scan_events_ns" -> ((s, dir) => {
      // ns-timestamp hazard demo: ts_us (µs-truncated) equals DuckDB's
      // plain read of the same ns column. SURVEY.md Appendix A.1.
      events(s, dir)
        .select(col("event_id"), col("ts_us").as("ts"))
        .orderBy("event_id")
    }),

    "q_source_json_props" -> ((s, dir) => {
      events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin,

    "q_scan_events_ns" ->
      "SELECT event_id, ts FROM events ORDER BY event_id",

    "q_source_json_props" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
