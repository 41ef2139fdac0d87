package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries ns timestamps; see graft.engine.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay one-time JVM/codegen/parquet-footer costs
    // before the measured loop (the first timed query otherwise carries
    // ~4s of JIT and session warmup that no steady-state run would see)
    try SparkEntry.queries("q_agg_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // optional args = bench only the named queries (dev loop; the
    // driver invokes with no args and times the full set). Unknown
    // names fail loudly: a typo'd filter silently benching nothing
    // prints a misleading total: 0.0 otherwise. `--median3` reports
    // the per-query median of 3 runs — this host's wall clock drifts
    // 2-3x across hours on identical code (SURVEY.md §6), and a median
    // survives one bad run where a single sample doesn't.
    val median3 = args.contains("--median3")
    val wanted = args.toSet - "--median3"
    val unknown = wanted -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(
        s"Bench: unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val selected =
      if (wanted.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => wanted(k) }
    val runs = if (median3) 3 else 1
    val results = selected.map { case (name, fn) =>
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // a broken query must be LOUD: correctness catches it separately,
        // but a swallowed exception would quietly bench as ~0 s
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"Bench: query $name FAILED: $e")
            -1L
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop per-query persisted frames so caches never accumulate
        // across the suite (cache-memory pressure skews later timings)
        spark.catalog.clearCache()
        dt
      }.sorted
      name -> samples(samples.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
