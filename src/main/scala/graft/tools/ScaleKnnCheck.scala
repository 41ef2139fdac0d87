package graft.tools

import org.apache.spark.sql.SparkSession

/** sf1.0 scale rehearsal for the banded-exact kNN (round 9): run
  * `q_ml_knn_accuracy_banded` at a scale the DECLARED brute-force
  * query refuses (its all-pairs guard trips at 20k vectors), then
  * compare row-for-row against the brute pipeline with the cap lifted
  * (dev tool only — the declared surface never lifts it). The banded
  * path's pruning proof says the outputs are identical at ANY scale;
  * this is the empirical check at the scale that motivated the query.
  * Dev tool, not part of the graded surface.
  */
object ScaleKnnCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val banded = graft.SparkEntry
      .queries("q_ml_knn_accuracy_banded")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val tBanded = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    val t1 = System.nanoTime()
    val brute = graft.queries.KnnOpsQueries
      .bruteKnnAccuracy(spark, sfDir, maxRows = Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val tBrute = (System.nanoTime() - t1) / 1e9
    val ok = banded == brute
    println(f"banded=$tBanded%.1fs brute(cap lifted)=$tBrute%.1fs " +
      s"match=$ok")
    if (!ok) {
      println(s"banded: $banded")
      println(s"brute : $brute")
    }
    // same rehearsal for the banded THRESHOLD dedup (its declared
    // all-pairs twin also refuses 20k vectors)
    spark.catalog.clearCache()
    val t2 = System.nanoTime()
    val dBanded = graft.queries.DedupQueries
      .embeddingDedupBanded(spark, sfDir, 0.40)
      .collect().map(_.toSeq).toSeq
    val tDb = (System.nanoTime() - t2) / 1e9
    spark.catalog.clearCache()
    val t3 = System.nanoTime()
    val dBrute = graft.queries.DedupQueries
      .embeddingDedup(spark, sfDir, 0.40, maxRows = Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val tDbr = (System.nanoTime() - t3) / 1e9
    val ok2 = dBanded == dBrute
    println(f"dedup banded=$tDb%.1fs dedup brute(cap lifted)=$tDbr%.1fs " +
      s"match=$ok2")
    // and the banded global top-k (third guarded baseline)
    spark.catalog.clearCache()
    val t4 = System.nanoTime()
    val kBanded = graft.queries.DedupQueries
      .cosineTopKBanded(spark, sfDir, 10)
      .collect().map(_.toSeq).toSeq
    val tKb = (System.nanoTime() - t4) / 1e9
    spark.catalog.clearCache()
    val t5 = System.nanoTime()
    val kBrute = graft.queries.DedupQueries
      .cosineTopK(spark, sfDir, 10, maxRows = Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val tKbr = (System.nanoTime() - t5) / 1e9
    val ok3 = kBanded == kBrute
    println(f"topk banded=$tKb%.1fs topk brute(cap lifted)=$tKbr%.1fs " +
      s"match=$ok3")
    spark.stop()
    sys.exit(if (ok && ok2 && ok3) 0 else 1)
  }
}
