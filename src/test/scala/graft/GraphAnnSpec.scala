package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Graph-based ANN (GraphAnn): NN-Descent build + beam-search serve.
  * Non-oracle surface (like the LSH/IVF ANN rows: the candidate set
  * is impl-defined), so these pins carry its correctness story:
  * deterministic construction, bounded degree, exact scores, measured
  * recall floors on both pinned geometries, and the capability claim
  * itself — on clustered geometry the graph walk reaches high recall
  * while scoring a bounded candidate set per query.
  */
class GraphAnnSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val fixtureDirs =
    scala.collection.mutable.Buffer[java.nio.file.Path]()
  private def fixtureDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    fixtureDirs += p
    p.toString
  }
  override def afterAll(): Unit = {
    fixtureDirs.foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    super.afterAll()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("buildKnnGraph: deterministic across runs, degree-capped, and " +
    "every edge's score equals the exact recomputation") {
    import graft.functions.GraphAnn
    val dir = "/root/testdata/sf0.01"
    val emb = graft.engine.Tables.t(spark, dir, "embeddings")
    val adj = GraphAnn.buildKnnGraph(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val got = rows(adj.orderBy("qid", "nid"))
    assert(got.nonEmpty)
    // degree cap: at most k out-edges per vertex
    val maxDeg = adj.groupBy("qid").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDeg <= 8, s"degree cap broken: $maxDeg")
    // no self edges, no duplicate edges
    assert(adj.filter(col("qid") === col("nid")).count() == 0)
    assert(adj.groupBy("qid", "nid").count()
      .filter(col("count") > 1).count() == 0)
    // deterministic rebuild
    spark.catalog.clearCache()
    assert(rows(GraphAnn.buildKnnGraph(emb, "vec_id", "embedding",
      k = 8, iters = 3).orderBy("qid", "nid")) == got)
    // score exactness: every edge's cos equals the brute recompute
    // (same rounded array-order fold)
    val vn = emb.select(col("vec_id"), col("embedding"),
      graft.functions.Native.l2NormF(col("embedding")).as("nrm"))
    val recheck = adj
      .join(vn.select(col("vec_id").as("qid"),
        col("embedding").as("e1"), col("nrm").as("n1")), "qid")
      .join(vn.select(col("vec_id").as("nid"),
        col("embedding").as("e2"), col("nrm").as("n2")), "nid")
      .withColumn("cos2",
        round(graft.functions.Native.dotF(col("e1"), col("e2")) /
          (col("n1") * col("n2")), 4))
      .filter(col("cos") =!= col("cos2"))
    assert(recheck.count() == 0, "edge scores must be exact")
    spark.catalog.clearCache()
  }

  /** 500 points on a circle (~0.7°/step — resolvable at the 4-dp
    * rounded cosine): CONTINUOUS local structure, the geometry real
    * embedding manifolds have and graph navigation exploits. The
    * spacing matters: a first-cut fixture at 0.15°/step rounded
    * every ±50-step neighbourhood to the same 4-dp cosine and
    * flattened the gradient the method climbs.
    */
  private def manifoldDir(): String = {
    import spark.implicits._
    val dim = 64
    val mdir = fixtureDir("graph_manifold")
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
    mdir
  }

  test("NN-Descent converges to the TRUE kNN graph on the manifold " +
    "(adjacency recall 1.000 measured at iters=3, pinned with " +
    "margin); graphCosineTopK recovers the exact global top-10") {
    import spark.implicits._
    import graft.functions.{GraphAnn, Native}
    import org.apache.spark.sql.expressions.Window
    val mdir = manifoldDir()
    val corpus = graft.engine.Tables.t(spark, mdir, "embeddings")
    val vn = corpus.select(col("vec_id"), col("embedding"),
      Native.l2NormF(col("embedding")).as("nrm"))
    val brute = vn.select(col("vec_id").as("qid"),
        col("embedding").as("e1"), col("nrm").as("n1"))
      .crossJoin(vn.select(col("vec_id").as("nid"),
        col("embedding").as("e2"), col("nrm").as("n2")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(Native.dotF(col("e1"), col("e2")) /
          (col("n1") * col("n2")), 4).as("cos"))
      .persist()
    val bruteTop8 = brute
      .withColumn("rk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= 8)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = GraphAnn.buildKnnGraph(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    val got = adj.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = bruteTop8.intersect(got).size.toDouble / bruteTop8.size
    // measured 1.000 at iters=3 (0.41 at 1, 0.98 at 2)
    assert(rec >= 0.95, s"manifold adjacency recall too low: $rec")
    // the graph's best edges ARE the global closest pairs
    val exactTop = brute.filter(col("qid") < col("nid"))
      .orderBy(col("cos").desc, col("qid"), col("nid")).limit(10)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    brute.unpersist()
    val gotTop = GraphAnn.graphCosineTopK(corpus, "vec_id",
      "embedding", 10, degree = 8, iters = 3)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exactTop.intersect(gotTop).size
    assert(overlap >= 8, s"graph top-10 recall too low: $overlap/10")
    spark.catalog.clearCache()
  }

  test("beam search on clustered geometry: recall@5 >= 0.9 vs the " +
    "exact scan with BOUNDED per-query work; deterministic serve; " +
    "exact scores on returned rows") {
    import spark.implicits._
    import graft.functions.GraphAnn
    // the knn_approx 3-cluster fixture recipe
    val dim = 64
    val cdir = fixtureDir("graph_clustered")
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
    val corpus = graft.engine.Tables.t(spark, cdir, "embeddings")
    val adj = GraphAnn.buildKnnGraph(corpus, "vec_id", "embedding",
      k = 8, iters = 3).persist()
    val q = corpus.limit(40)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val served = GraphAnn.knnQueryGraphOn(adj, corpus, "vec_id",
      "embedding", q, k = 5, beam = 16, hops = 3, entries = 8)
    val got = served.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth: bounded brute scan of the fixture
    val vn = corpus.select(col("vec_id").as("nbr"),
      col("embedding").as("e2"),
      graft.functions.Native.l2NormF(col("embedding")).as("n2"))
    val qv = q.select(col("vec_id").as("qid"),
      col("embedding").as("e1"),
      graft.functions.Native.l2NormF(col("embedding")).as("n1"))
    val exact = qv.crossJoin(vn)
      .select(col("qid"), col("nbr"),
        round(graft.functions.Native.dotF(col("e1"), col("e2")) /
          (col("n1") * col("n2")), 4).as("cos"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("qid")
          .orderBy(col("cos").desc, col("nbr"))))
      .filter(col("rk") <= 5)
      .select("qid", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // measured 1.000 — the NSW shortcuts are what make it reachable
    // (a pure kNN graph measured 0.33 at the same beam/hops: short
    // edges only, the walk crawls)
    assert(recall >= 0.9, s"clustered beam recall too low: $recall")
    // per-query output is exactly k ranked rows with exact scores
    val perQ = served.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) == 5))
    // deterministic serve
    assert(rows(GraphAnn.knnQueryGraphOn(adj, corpus, "vec_id",
        "embedding", q, k = 5, beam = 16, hops = 3, entries = 8))
      == rows(served))
    adj.unpersist()
    spark.catalog.clearCache()
  }

  test("kNN-graph lifecycle: the artifact round-trips byte-identically " +
    "into serving; an append-maintained graph serves the union corpus " +
    "with high recall and reaches incoming vectors from both sides") {
    import spark.implicits._
    import graft.functions.{GraphAnn, Native}
    import org.apache.spark.sql.expressions.Window
    val mdir = manifoldDir()
    val full = graft.engine.Tables.t(spark, mdir, "embeddings")
    val existing = full.filter($"vec_id" % 5 =!= 0)
    val incoming = full.filter($"vec_id" % 5 === 0)
    val adj = GraphAnn.buildKnnGraph(existing, "vec_id", "embedding",
      k = 8, iters = 3).persist()
    val q = full.limit(40)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val servedBuilt = rows(GraphAnn.knnQueryGraphOn(adj, existing,
      "vec_id", "embedding", q, k = 5))
    // artifact round-trip: loaded edges serve identically
    val p = fixtureDir("knn_graph_artifact")
    GraphAnn.writeKnnGraph(adj, p)
    assert(rows(GraphAnn.knnQueryGraphOn(
        GraphAnn.loadKnnGraph(spark, p), existing,
        "vec_id", "embedding", q, k = 5)) == servedBuilt)
    // append maintenance: incoming vectors get beam-searched edges;
    // serve the UNION corpus over the appended graph
    val appended = GraphAnn.appendToKnnGraph(adj, existing,
      "vec_id", "embedding", incoming, k = 8).persist()
    assert(appended.count() > adj.count(),
      "append must add the incoming vertices' edges")
    val got = GraphAnn.knnQueryGraphOn(appended, full, "vec_id",
        "embedding", q, k = 5, beam = 16, hops = 3, entries = 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vn = full.select(col("vec_id").as("nid"),
      col("embedding").as("e2"),
      Native.l2NormF(col("embedding")).as("n2"))
    val exact = q.select(col("vec_id").as("qid"),
        col("embedding").as("e1"),
        Native.l2NormF(col("embedding")).as("n1"))
      .crossJoin(vn)
      .select(col("qid"), col("nid"),
        round(Native.dotF(col("e1"), col("e2")) /
          (col("n1") * col("n2")), 4).as("cos"))
      .withColumn("rk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.85,
      s"appended-graph union recall too low: $recall")
    // incoming vectors are REACHED (their only edges are their own
    // out-edges — the undirected serve walks them in reverse): the
    // union ground truth necessarily contains incoming ids as
    // neighbours of queries near them, so high recall above already
    // implies reachability; assert it explicitly anyway
    val incomingIds = incoming.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.exists { case (_, nid) => incomingIds.contains(nid) },
      "served neighbours must include incoming vectors")
    appended.unpersist(); adj.unpersist()
    spark.catalog.clearCache()
  }

  test("beam search on the manifold reaches recall >= 0.95; on the " +
    "graded ISOTROPIC geometry it sits near the scanned-fraction " +
    "floor like every other method (honesty pin)") {
    import graft.functions.{GraphAnn, Native}
    import org.apache.spark.sql.expressions.Window
    def beamRecall(dir: String): Double = {
      val corpus = graft.engine.Tables.t(spark, dir, "embeddings")
      val adj = GraphAnn.buildKnnGraph(corpus, "vec_id", "embedding",
        k = 8, iters = 3)
      val q = corpus.limit(40)
        .selectExpr("vec_id + 100000 AS vec_id", "embedding")
      val got = GraphAnn.knnQueryGraphOn(adj, corpus, "vec_id",
          "embedding", q, k = 5, beam = 16, hops = 3, entries = 8)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val vn = corpus.select(col("vec_id").as("nid"),
        col("embedding").as("e2"),
        Native.l2NormF(col("embedding")).as("n2"))
      val exact = q.select(col("vec_id").as("qid"),
          col("embedding").as("e1"),
          Native.l2NormF(col("embedding")).as("n1"))
        .crossJoin(vn)
        .select(col("qid"), col("nid"),
          round(Native.dotF(col("e1"), col("e2")) /
            (col("n1") * col("n2")), 4).as("cos"))
        .withColumn("rk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("nid"))))
        .filter(col("rk") <= 5)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      exact.intersect(got).size.toDouble / exact.size
    }
    // measured 1.000 on the manifold (the capability claim: graph
    // navigation exploits continuous local structure)
    assert(beamRecall(manifoldDir()) >= 0.95)
    // measured 0.925 on the graded isotropic sf0.01 geometry — but at
    // this fixture size the beam's candidate budget is a large
    // fraction of the 500-vector corpus, so this is the documented
    // no-locality floor (recall ≈ scanned fraction), NOT a claim that
    // graph search beats it; pinned loosely as a regression canary.
    assert(beamRecall("/root/testdata/sf0.01") >= 0.7)
  }
}
