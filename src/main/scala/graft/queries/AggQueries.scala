package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** §2.4 aggregations. Flagship first; the rest land in batch 2.
  *
  * Cross-engine decimal discipline (SURVEY.md A.2, hardened by local
  * experiments this round):
  *  - money columns are exactly 2dp → decimal(18,4) accumulation is EXACT;
  *  - products keep their exact scale (2dp×2dp=4dp, ×2dp again=6dp) and
  *    any decimal cast lands on or above that scale — DuckDB TRUNCATES
  *    decimal downcasts while Spark rounds HALF_UP, so a cast that
  *    actually rounds is forbidden;
  *  - inexact math (division/avg, sqrt, ln) runs in DOUBLE over the
  *    exactly-accumulated decimals with the same expression shape on both
  *    engines → bit-identical IEEE results, no rounding step at all.
  */
object AggQueries extends QSet {

  /** FLAGSHIP — TPC-H Q1 shape over the full lineitem table.
    * Map-side partial agg + final agg over 2×3 groups; at 100 TB this is
    * the ideal Spark shape (partial combine collapses the shuffle to
    * #groups × #partitions rows).
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val one = lit(1).cast(Dec)
    // exact: 2dp * (1 - 2dp) = 4dp; cast back to scale 4 loses nothing
    val discPrice = (D(col("l_extendedprice")) * (one - D(col("l_discount")))).cast(Dec)
    // exact: 4dp * (1 + 2dp) = 6dp
    val charge = (discPrice * (one + D(col("l_tax")))).cast(DecimalType(18, 6))
    val cnt = count(lit(1))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d4(sum(D(col("l_quantity")))).as("sum_qty"),
        d4(sum(D(col("l_extendedprice")))).as("sum_base_price"),
        d4(sum(discPrice)).as("sum_disc_price"),
        sum(charge).cast(DecimalType(24, 6)).as("sum_charge"),
        (sum(D(col("l_quantity"))).cast(DoubleType) / cnt).as("avg_qty"),
        (sum(D(col("l_extendedprice"))).cast(DoubleType) / cnt).as("avg_price"),
        (sum(D(col("l_discount"))).cast(DoubleType) / cnt).as("avg_disc"),
        cnt.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, QFn] = Map(
    "q_agg_pricing_summary" -> (pricingSummary _)
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_base_price,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
        | CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
