package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the graph-ANN family at 100k vectors — the
  * ClusteredVecCheck geometry (50 tight axis clusters, deterministic
  * hash jitter), 5× past guardAllPairs' refusal point. Ground truth
  * is the EXACT cell-index serve (knnQueryOn — proven row-for-row
  * elsewhere), so the rehearsal measures: NN-Descent build cost at
  * 25.6M scored candidates/iteration, beam-serve cost + recall@5 for
  * a 200-query batch, and the IVF nprobe serve on the same batch for
  * the honest comparison. Run: runMain graft.tools.GraphAnnScaleCheck
  * [nVectors] [nClusters].
  */
object GraphAnnScaleCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val nClusters = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{DedupQueries, KnnOpsQueries}
    import graft.functions.GraphAnn

    val dir = s"/tmp/graph_scale_$n"
    spark.range(n)
      .select(col("id").as("vec_id"),
        (col("id") % nClusters).cast("int").as("label"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  cast(if(j = label % $dim, 1.0,
           |    (cast((xxhash64(vec_id, j) % 7 + 7) % 7 as double) - 3.0)
           |      * 0.015) as float))""".stripMargin))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val corpus = graft.engine.Tables.t(spark, dir, "embeddings")
    val q = corpus.filter(col("vec_id") % (n / 200) === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        col("embedding"))
    val nQ = q.count()

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    // exact ground truth via the proven cell-index serve
    val ci = t("cell-index build") {
      DedupQueries.buildCellIndex(spark, dir) }
    val exact = t("exact knnQueryOn") {
      KnnOpsQueries.knnQueryOn(ci, q, 5)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet }
    // IVF approx on the same batch (nprobe from the selector at 0.5)
    val pick = KnnOpsQueries.nprobeFor(ci, 0.5)
    val ivf = t(s"ivf nprobe=${pick.nprobe}") {
      KnnOpsQueries.knnQueryApproxOn(ci, q, 5, pick.nprobe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet }
    println(f"ivf recall@5 ${exact.intersect(ivf).size.toDouble / exact.size}%.3f (scanFraction ${pick.scanFraction}%.3f)")
    spark.catalog.clearCache()
    // graph build + serve
    val adj = t("graph build (k=8,it=3)") {
      val a = GraphAnn.buildKnnGraph(corpus, "vec_id", "embedding",
        k = 8, iters = 3).persist()
      a.count(); a }
    val served = t("graph beam serve") {
      GraphAnn.knnQueryGraphOn(adj, corpus, "vec_id", "embedding",
        q, k = 5, beam = 16, hops = 4, entries = 16)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet }
    val recall = exact.intersect(served).size.toDouble / exact.size
    // the semantically meaningful retrieval metric on this geometry:
    // did the returned neighbours land in the query's cluster?
    val lbl = corpus.select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val clusterHit = served.count { case (qid, nid) =>
      lbl(nid) == ((qid - 10000000L) % nClusters) }.toDouble /
      (nQ * 5)
    println(f"graph recall@5 $recall%.3f  cluster-hit $clusterHit%.3f  " +
      f"(bound/query <= ${16 + 16 * 20 * 4} scores of $n)")
    spark.stop()
  }
}
