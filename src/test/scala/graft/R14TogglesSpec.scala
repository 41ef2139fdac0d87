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

  test("multimodal phash: the shared-hash frame (one codec pass) and " +
    "the unshared incumbent shape are row-identical") {
    val declared = rows(SparkEntry.queries("q_multimodal_phash")(
      spark, sf))
    spark.catalog.clearCache()
    val unshared = rows(graft.queries.MiscQueries
      .phashPairs(spark, sf, shareHashes = false))
    assert(unshared == declared)
  }

  test("bm25: the ADOPTED fused-dl + df-from-tf shape equals the " +
    "pre-r14 four-scan incumbent row for row") {
    val declared = rows(SparkEntry.queries("q_text_bm25")(spark, sf))
    spark.catalog.clearCache()
    val incumbent = rows(graft.queries.SearchStatsQueries
      .bm25(spark, sf, fuseDl = false, dfFromTf = false))
    assert(incumbent == declared)
  }

  test("bm25: the fused-dl-only intermediate shape also equals the " +
    "incumbent row for row") {
    val incumbent = rows(graft.queries.SearchStatsQueries
      .bm25(spark, sf, fuseDl = false, dfFromTf = false))
    spark.catalog.clearCache()
    val fused = rows(graft.queries.SearchStatsQueries
      .bm25(spark, sf, fuseDl = true, dfFromTf = false))
    assert(fused == incumbent)
  }

  test("corpus mix: the window-target shape (one lang-count pass) " +
    "equals the agg+crossJoin incumbent row for row") {
    val incumbent = rows(graft.queries.CorpusOpsQueries
      .corpusMix(spark, sf, windowTarget = false))
    spark.catalog.clearCache()
    val win = rows(graft.queries.CorpusOpsQueries
      .corpusMix(spark, sf, windowTarget = true))
    assert(win == incumbent)
  }

  test("feat cov: the cut sx frame equals the uncut incumbent " +
    "row for row") {
    val incumbent = rows(graft.queries.MlOpsQueries
      .featCov(spark, sf, cutSx = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.MlOpsQueries
      .featCov(spark, sf, cutSx = true))
    assert(cut == incumbent)
  }

  test("vocab overlap: the shared sw frame equals the unshared " +
    "incumbent row for row") {
    val incumbent = rows(graft.queries.EvalGraphQueries
      .vocabOverlap(spark, sf, shareSw = false))
    spark.catalog.clearCache()
    val shared = rows(graft.queries.EvalGraphQueries
      .vocabOverlap(spark, sf, shareSw = true))
    assert(shared == incumbent)
  }

  test("kaplan meier: the cut user ledger equals the uncut incumbent " +
    "row for row") {
    val incumbent = rows(graft.queries.EvalGraphQueries
      .kaplanMeier(spark, sf, cutUsers = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.EvalGraphQueries
      .kaplanMeier(spark, sf, cutUsers = true))
    assert(cut == incumbent)
  }

  test("ts hazard: the cut user ledger equals the uncut incumbent " +
    "row for row") {
    val incumbent = rows(graft.queries.ExperimentQueries
      .tsHazard(spark, sf, cutUsers = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.ExperimentQueries
      .tsHazard(spark, sf, cutUsers = true))
    assert(cut == incumbent)
  }

  test("quality lm: the window-total shape equals the separate-count " +
    "incumbent row for row") {
    val incumbent = rows(graft.queries.TextQueries
      .qualityLm(spark, sf, windowTotal = false))
    spark.catalog.clearCache()
    val win = rows(graft.queries.TextQueries
      .qualityLm(spark, sf, windowTotal = true))
    assert(win == incumbent)
  }

  test("pipeline corpus: pre-dedup contamination mining equals the " +
    "post-dedup incumbent row for row (contamination is " +
    "text-determined; anti-join ignores absent ids)") {
    val incumbent = rows(graft.queries.PipelineQueries
      .pipelineCorpus(spark, sf, contamPreDedup = false))
    spark.catalog.clearCache()
    val pre = rows(graft.queries.PipelineQueries
      .pipelineCorpus(spark, sf, contamPreDedup = true))
    assert(pre == incumbent)
  }

  test("stats qq: the single-pass grouped-decile shape equals the " +
    "two-scan incumbent row for row") {
    val incumbent = rows(graft.queries.VarianceSeqQueries
      .statsQq(spark, sf, singlePass = false))
    spark.catalog.clearCache()
    val single = rows(graft.queries.VarianceSeqQueries
      .statsQq(spark, sf, singlePass = true))
    assert(single == incumbent)
  }

  test("theil sen: the cut cell grid equals the uncut incumbent " +
    "row for row") {
    val incumbent = rows(graft.queries.RobustStatsQueries
      .theilSen(spark, sf, cutCells = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.RobustStatsQueries
      .theilSen(spark, sf, cutCells = true))
    assert(cut == incumbent)
  }

  test("kendall: the cut cell grid equals the uncut incumbent " +
    "row for row") {
    val incumbent = rows(graft.queries.AssocStatsQueries
      .kendall(spark, sf, cutCells = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.AssocStatsQueries
      .kendall(spark, sf, cutCells = true))
    assert(cut == incumbent)
  }

  test("ts pacf: the cut day spine + exploded output equals the " +
    "uncut unionAll incumbent row for row") {
    val incumbent = rows(graft.queries.SignalQueries
      .tsPacf(spark, sf, shareDaily = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.SignalQueries
      .tsPacf(spark, sf, shareDaily = true))
    assert(cut == incumbent)
  }

  test("emb norm hist: the cut per-vector norm frame equals the " +
    "uncut incumbent row for row") {
    val incumbent = rows(graft.queries.EmbAuditQueries
      .embNormHist(spark, sf, cutN2 = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.EmbAuditQueries
      .embNormHist(spark, sf, cutN2 = true))
    assert(cut == incumbent)
  }

  test("forecast snaive: the cut hour spine equals the uncut " +
    "incumbent row for row") {
    val incumbent = rows(graft.queries.MlEvalQueries
      .forecastSnaive(spark, sf, shareByh = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.MlEvalQueries
      .forecastSnaive(spark, sf, shareByh = true))
    assert(cut == incumbent)
  }

  test("retention cohort: the cut first-week ledger equals the uncut " +
    "incumbent row for row") {
    val incumbent = rows(graft.queries.PipelineQueries
      .retentionCohort(spark, sf, cutFirst = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.PipelineQueries
      .retentionCohort(spark, sf, cutFirst = true))
    assert(cut == incumbent)
  }

  test("orders rfm: the cut customer ledger equals the uncut " +
    "incumbent row for row") {
    val incumbent = rows(graft.queries.WarehouseQueries
      .ordersRfm(spark, sf, cutRfm = false))
    spark.catalog.clearCache()
    val cut = rows(graft.queries.WarehouseQueries
      .ordersRfm(spark, sf, cutRfm = true))
    assert(cut == incumbent)
  }
}
