package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 optimization pins: the lineage-cut toggles adopted this
  * round (bpePipeline cutSteps, naiveBayes/qualityLm2 cutModel) change
  * ONLY the physical plan — cutting at a bounded model/step frame so
  * multi-consumer subtrees stop re-deriving their corpus prefix
  * (9→1 parquet scans for the BPE pipeline, 9→6 naive Bayes, 3→2
  * quality_lm2; see OPTIMIZATION_r13.md and plans/r13/). These pins
  * hold the toggles to row-for-row output equality with the uncut
  * shapes, so a future edit cannot quietly let a cut drift semantics.
  */
class LineageCutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("bpe encode: cutSteps and uncut shapes are row-identical") {
    assert(rows(queries.TextQueries.bpeEncode(spark, sf, cutSteps = true))
      == rows(queries.TextQueries.bpeEncode(spark, sf, cutSteps = false)))
  }

  test("bpe train: cutSteps and uncut shapes are row-identical") {
    assert(rows(queries.TextQueries.bpeTrain(spark, sf, cutSteps = true))
      == rows(queries.TextQueries.bpeTrain(spark, sf, cutSteps = false)))
  }

  test("naive bayes: cutModel and uncut shapes are row-identical") {
    assert(rows(queries.SearchStatsQueries.naiveBayes(spark, sf,
        cutModel = true))
      == rows(queries.SearchStatsQueries.naiveBayes(spark, sf,
        cutModel = false)))
  }

  test("quality_lm2: cutModel and uncut shapes are row-identical") {
    assert(rows(queries.AnalyticsQueries.qualityLm2(spark, sf,
        cutModel = true))
      == rows(queries.AnalyticsQueries.qualityLm2(spark, sf,
        cutModel = false)))
  }
}
