package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization-round equality pins: every new toggle shape
  * must be row-identical to the declared incumbent (the LineageCutSpec
  * pattern — plan-level accelerators, never semantics).
  */
class R14TogglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("banded knn: in-row array top-k shape equals the declared row " +
    "shape row for row") {
    val declared = rows(SparkEntry.queries("q_ml_knn_accuracy_banded")(
      spark, sf))
    spark.catalog.clearCache()
    val arr = rows(graft.queries.KnnOpsQueries.bandedKnnAccuracyOn(
      graft.queries.DedupQueries.buildCellIndex(spark, sf),
      arrayTopK = true))
    assert(arr == declared, s"arr=${arr.take(3)} decl=${declared.take(3)}")
  }

  test("banded knn array shape with the floor filter FORCED ON still " +
    "equals the declared output (the l5 prune is provably lossless)") {
    val declared = rows(SparkEntry.queries("q_ml_knn_accuracy_banded")(
      spark, sf))
    spark.catalog.clearCache()
    val arrFloor = rows(graft.queries.KnnOpsQueries.bandedKnnAccuracyOn(
      graft.queries.DedupQueries.buildCellIndex(spark, sf),
      floorFilterMinRows = 0L, arrayTopK = true))
    assert(arrFloor == declared)
  }

  test("containment prefix: the ADOPTED hash-only candidate keys and " +
    "the string-keyed incumbent shape are row-identical (collision " +
    "candidates die in the exact verify)") {
    val declared = rows(SparkEntry.queries("q_dedup_containment_prefix")(
      spark, sf))
    spark.catalog.clearCache()
    val stringKeyed = rows(graft.queries.DedupQueries
      .containmentPrefixPairs(spark, sf, hashOnlyCands = false))
    assert(stringKeyed == declared)
  }

  test("prefix filter: the ADOPTED hash-only candidate keys and the " +
    "string-keyed incumbent shape are row-identical") {
    val declared = rows(SparkEntry.queries("q_dedup_prefix_filter")(
      spark, sf))
    spark.catalog.clearCache()
    val stringKeyed = rows(graft.queries.DedupQueries
      .prefixFilterPairs(spark, sf, hashOnlyCands = false))
    assert(stringKeyed == declared)
  }
}
