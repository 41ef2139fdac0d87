package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One category of SURVEY.md §2 — a named bundle of graded queries.
  * `queries` keys and `oracle` keys must line up except for declared
  * non-oracle (approximate / streaming-only) operators.
  */
trait QSet {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracle: Map[String, String]
}
