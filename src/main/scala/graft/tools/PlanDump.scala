package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Round-13 optimization artifact dumper: writes
  * `plans/r13/<query>_<suffix>.txt` (explain("formatted")) for the
  * named queries — the before/after plan evidence the optimization
  * round commits alongside the A/B numbers. Not part of the driver
  * contract. Usage:
  *   sbt "runMain graft.tools.PlanDump before q_ml_naive_bayes ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.getOrElse("GRAFT_PLANDUMP_DIR", "plans/r14")
    Files.createDirectories(Paths.get(outDir))
    // GRAFT_PLANDUMP_UNCUT=1: dump the PRE-round-13 shape of the four
    // lineage-cut queries via their uncut toggles (the toggle is the
    // old shape bit-for-bit), so before/after plans stay regenerable
    // from HEAD.
    val uncut = sys.env.get("GRAFT_PLANDUMP_UNCUT").contains("1")
    def frame(k: String) =
      if (!uncut) graft.SparkEntry.queries(k)(spark, sfDir)
      else k match {
        case "q_text_bpe_encode" =>
          graft.queries.TextQueries.bpeEncode(spark, sfDir, cutSteps = false)
        case "q_text_bpe_train" =>
          graft.queries.TextQueries.bpeTrain(spark, sfDir, cutSteps = false)
        case "q_ml_naive_bayes" =>
          graft.queries.SearchStatsQueries
            .naiveBayes(spark, sfDir, cutModel = false)
        case "q_quality_lm2" =>
          graft.queries.AnalyticsQueries
            .qualityLm2(spark, sfDir, cutModel = false)
        // r14 continuation adoptions — toggles reproduce the pre-r14
        // shapes bit-for-bit
        case "q_multimodal_phash" =>
          graft.queries.MiscQueries
            .phashPairs(spark, sfDir, shareHashes = false)
        case "q_text_bm25" =>
          graft.queries.SearchStatsQueries
            .bm25(spark, sfDir, fuseDl = false, dfFromTf = false)
        case "q_corpus_mix" =>
          graft.queries.CorpusOpsQueries
            .corpusMix(spark, sfDir, windowTarget = false)
        case "q_source_vocab_overlap" =>
          graft.queries.EvalGraphQueries
            .vocabOverlap(spark, sfDir, shareSw = false)
        case "q_ts_kaplan_meier" =>
          graft.queries.EvalGraphQueries
            .kaplanMeier(spark, sfDir, cutUsers = false)
        case "q_quality_lm" =>
          graft.queries.TextQueries
            .qualityLm(spark, sfDir, windowTotal = false)
        case "q_pipeline_corpus" =>
          graft.queries.PipelineQueries
            .pipelineCorpus(spark, sfDir, contamPreDedup = false)
        case "q_ts_pacf" =>
          graft.queries.SignalQueries
            .tsPacf(spark, sfDir, shareDaily = false)
        case other => graft.SparkEntry.queries(other)(spark, sfDir)
      }
    names.foreach { k =>
      val plan = frame(k).queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${k}_$suffix.txt"),
        s"== $k ($suffix) — $sfDir, local[$cpus], " +
          s"shuffle.partitions=$cpus ==\n\n" + plan)
      println(s"wrote $outDir/${k}_$suffix.txt")
    }
    spark.stop()
  }
}
