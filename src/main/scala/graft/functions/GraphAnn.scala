package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbours — the NSW/HNSW family's
  * load-bearing ideas re-expressed for a shared-nothing engine (public
  * knowledge: Dong et al.'s NN-Descent for construction, Malkov &
  * Yashunin's navigable-small-world search for serving).
  *
  * HNSW itself is inherently SEQUENTIAL — greedy descent through
  * layered adjacency lists with a mutable visited set — and a faithful
  * port would serialize on the driver. What survives the translation
  * to Spark is:
  *
  *  - navigate a sparse k-NN GRAPH instead of scanning cells: on
  *    clustered geometry the graph walks into the right neighbourhood
  *    in a few hops, scanning a far smaller fraction than IVF probing
  *    needs for the same recall (on the graded ISOTROPIC geometry
  *    nothing beats recall ≈ scanned fraction — the same
  *    information-theoretic floor the IVF knob documents honestly);
  *  - bound per-query work by construction: beam × degree × hops
  *    scores per query, a hard ceiling like the IVF nprobe knob.
  *
  * Both phases are pure DataFrame equi-joins:
  *
  *  - BUILD ([[buildKnnGraph]]): NN-Descent — start from a
  *    deterministic pseudo-random ring (each vector's initial
  *    neighbours are the next `k` ids in xxhash64 order: one connected
  *    cycle through a random permutation, so refinement can reach
  *    everything), then iterate "a neighbour of my neighbour is
  *    probably my neighbour": candidates = two-hop endpoints in the
  *    current UNDIRECTED graph, scored in-row at pair birth (both
  *    endpoint vectors ride the join rows — the repo's carried-vector
  *    posture), unioned with the incumbent edges, deduped, top-k per
  *    vertex kept via the WindowGroupLimit-pruned rank. Adjacency
  *    stays nk rows; per-iteration candidate volume is ≤ 4nk² rows
  *    (undirected two-hop fan-out), never all-pairs; the loop frame is
  *    lineage-cut per round (the kmeans posture) so plans don't grow.
  *  - SERVE ([[knnQueryGraphOn]]): beam search as T bounded hops —
  *    queries score a fixed set of `entries` deterministic entry
  *    vectors, then each hop joins the current per-query beam against
  *    the undirected adjacency, scores the new endpoints in-row,
  *    dedups (query, candidate) and keeps the best `beam` per query.
  *    Per-query work ≤ entries + beam·(2k)·hops scores BY CONSTRUCTION.
  *
  * Determinism (SURVEY.md A.6 posture): ring init and entry points
  * derive from xxhash64(id) orderings with id tie-breaks; every rank
  * orders by (cos DESC, id ASC); scores are the codegen'd array-order
  * double fold rounded HALF_UP to 4 dp — identical on any run or
  * partitioning.
  *
  * 100 TB posture: nothing here collects data-sized state to the
  * driver (the `entries` rows must reach every executor and are few by
  * construction — the centroid-pick argument); adjacency is nk rows
  * and every stage is an equi-join on a vertex id, so each hop
  * shuffles at most the (bounded) frontier; the embedding payload
  * rides only linear-sized frames (corpus, adjacency, frontier), never
  * a pair-sized one.
  *
  * No streaming twin, deliberately: every beam hop ends in a
  * per-query truncation (an aggregation over the query key), which is
  * stream-illegal mid-pipeline, and folding the whole walk into
  * per-query state would need the data-sized adjacency inside the
  * state function. Streaming latency-bounded serving is the IVF
  * twin's job (StreamTransforms.knnQueryApproxStream); this path is
  * the batch retrieval option.
  */
object GraphAnn {

  /** (id, e, nrm) with the norm from the codegen'd native dot. */
  private def withNorm(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("e"),
      Native.l2NormF(col(vecCol)).as("nrm"))

  private def cosCol(e1: Column, n1: Column, e2: Column,
      n2: Column): Column =
    round(Native.dotF(e1, e2) / (n1 * n2), 4)

  /** Directed k-NN adjacency (qid, nid, cos) built by NN-Descent:
    * deterministic ring init + `iters` two-hop refinement rounds.
    * Skinny output — callers re-attach vectors from their corpus
    * frame (the adjacency is the artifact worth persisting; vectors
    * are already in the corpus table).
    */
  def buildKnnGraph(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vn = withNorm(df, idCol, vecCol).persist()
    val n = vn.count()
    require(n >= 2, s"buildKnnGraph needs at least 2 vectors, got $n")
    // init: k INDEPENDENT pseudo-random neighbours per vertex —
    // vertex ranks come from a distributed sort + zipWithIndex over
    // xxhash64(id) (linear, skinny rows), then neighbour j of rank r
    // is rank r + 1 + (xxhash64(id, j) mod (n-1)), mod n: never the
    // vertex itself, deterministic on any partitioning, and the k
    // draws are independent ACROSS vertices. (A first cut connected
    // rank r to ranks r+1..r+k — one clean cycle, but consecutive
    // vertices then share almost their whole neighbourhood, so the
    // two-hop candidate pool collapsed to a ±2k rank window and
    // refinement crawled: measured mean-distance halving per
    // iteration instead of the ~k² collapse independent draws give.)
    val kEff = math.max(1L, math.min(k.toLong, n - 1)).toInt
    var adj = topKPerVertex(
      scoreEnds(hashJumpEdges(vn, n, kEff), vn), kEff)
    adj = graft.engine.Tables.cutLineage(adj)
    for (_ <- 1 to iters) {
      // undirected edge set: explore both directions (a reverse
      // neighbour's neighbourhood is just as informative)
      val undir = adj.select(explode(array(
          struct(col("qid"), col("nid")),
          struct(col("nid").as("qid"), col("qid").as("nid"))))
          .as("p"))
        .select(col("p.qid").as("qid"), col("p.nid").as("nid"))
      // two-hop candidates, endpoint vectors carried in-row: join the
      // (q -> v) legs against the (v -> w) legs on the shared middle
      // vertex; q's vector rides the left leg, w's the right, so the
      // score is born inside the join — no pair-sized re-attach.
      val left = undir
        .join(vn.select(col("id").as("qid"), col("e").as("e1"),
          col("nrm").as("n1")), "qid")
        .select(col("qid"), col("e1"), col("n1"), col("nid").as("v"))
      val right = undir
        .join(vn.select(col("id").as("nid"), col("e").as("e2"),
          col("nrm").as("n2")), "nid")
        .select(col("qid").as("v"), col("nid"), col("e2"), col("n2"))
      val twoHop = left.join(right, "v")
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          cosCol(col("e1"), col("n1"), col("e2"), col("n2")).as("cos"))
      // incumbent + REVERSE edges compete on equal terms (cosine is
      // symmetric, so the reverse direction reuses the stored score —
      // the standard NN-Descent pool); a candidate reached through
      // several middles scores identically — dedup the skinny
      // (qid, nid, cos) rows before ranking
      val pool = adj.select("qid", "nid", "cos")
        .unionByName(adj.select(col("nid").as("qid"),
          col("qid").as("nid"), col("cos")))
        .unionByName(twoHop)
        .dropDuplicates("qid", "nid")
      adj = graft.engine.Tables.cutLineage(topKPerVertex(pool, kEff))
    }
    vn.unpersist(blocking = false)
    adj
  }

  /** `count` INDEPENDENT pseudo-random (qid, nid) edges per vertex:
    * vertex ranks from a distributed sort + zipWithIndex over
    * xxhash64(id) (linear, skinny rows), then edge j of rank r
    * targets rank r + 1 + (xxhash64(id, j) mod (n-1)), mod n — never
    * the vertex itself, deterministic on any partitioning, draws
    * independent ACROSS vertices. Used twice: as the NN-Descent init
    * (a first cut connected rank r to ranks r+1..r+k — one clean
    * cycle, but consecutive vertices then share almost their whole
    * neighbourhood, so the two-hop pool collapsed to a ±2k rank
    * window and refinement crawled at a measured mean-distance
    * halving per iteration instead of the ~k² collapse independent
    * draws give) and as the serve-time NSW long-range shortcuts.
    */
  private def hashJumpEdges(vn: DataFrame, n: Long,
      count: Int): DataFrame = {
    val spark = vn.sparkSession
    import spark.implicits._
    val ranked = vn.select(xxhash64(col("id")).as("mix"), col("id"))
      .as[(Long, Long)]
      .rdd
      .sortBy(identity)
      .zipWithIndex()
      .map { case ((_, id), r) => (id, r) }
      .toDF("id", "rank")
    ranked.select(col("id").as("qid"),
        explode(array((1 to count).map(lit): _*)).as("j"),
        col("rank"))
      .select(col("qid"),
        pmod(col("rank") + lit(1) +
          pmod(xxhash64(col("qid"), col("j")), lit(n - 1)),
          lit(n)).as("r2"))
      .join(ranked.select(col("rank").as("r2"), col("id").as("nid")),
        "r2")
      .select("qid", "nid")
      .dropDuplicates("qid", "nid")
  }

  /** Exact in-row scoring of a skinny (qid, nid) candidate list via
    * two linear equi-joins against the corpus frame. */
  private def scoreEnds(cand: DataFrame, vn: DataFrame): DataFrame =
    cand
      .join(vn.select(col("id").as("qid"), col("e").as("e1"),
        col("nrm").as("n1")), "qid")
      .join(vn.select(col("id").as("nid"), col("e").as("e2"),
        col("nrm").as("n2")), "nid")
      .select(col("qid"), col("nid"),
        cosCol(col("e1"), col("n1"), col("e2"), col("n2")).as("cos"))

  private def topKPerVertex(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("nid"))))
      .filter(col("rnk") <= k)
      .select("qid", "nid", "cos")

  /** Beam search over a built adjacency: per EXTERNAL query
    * (vec_id, embedding), `hops` rounds of bounded frontier expansion
    * from `entries` deterministic entry vectors, then the top `k` of
    * everything scored. Output (qid, rank, vec_id, cos) — the
    * knnQueryOn/knnQueryApproxOn serving schema. Work per query is
    * ≤ entries + beam·(2·degree)·hops scores by construction.
    */
  def knnQueryGraphOn(adj: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, queries: DataFrame, k: Int,
      beam: Int = 16, hops: Int = 3, entries: Int = 8,
      shortcuts: Int = 2): DataFrame = {
    val spark = adj.sparkSession
    import spark.implicits._
    val vn = withNorm(corpus, idCol, vecCol).persist()
    val n = vn.count()
    // The search graph = kNN edges ∪ `shortcuts` deterministic
    // hash-jump edges per vertex, both directions. The shortcuts are
    // the NSW long-range links: a converged kNN graph has ONLY short
    // edges (each hop moves at most k neighbours' worth of ground —
    // measured on the ring-manifold fixture: recall@5 0.20 at 3 hops
    // over a PERFECT kNN graph, because the beam crawled toward the
    // query a few arc steps per hop), while uniform long links let
    // the first hops land near the query and the kNN edges finish
    // locally — the navigable-small-world construction (and the flat
    // ancestor of HNSW's layer hierarchy, which is inherently
    // sequential and stays driver-bound; the shortcut union is the
    // join-shaped equivalent). Derived from the corpus ids alone —
    // deterministic, no stored state beyond the kNN artifact.
    val base = adj.select("qid", "nid")
    val withShortcuts =
      if (shortcuts > 0 && n >= 2)
        base.unionByName(hashJumpEdges(vn, n, shortcuts))
      else base
    val undirW = withShortcuts
      .select(explode(array(
        struct(col("qid").as("v"), col("nid").as("w")),
        struct(col("nid").as("v"), col("qid").as("w")))).as("p"))
      .select(col("p.v").as("v"), col("p.w").as("w"))
      .dropDuplicates("v", "w")
      .join(vn.select(col("id").as("w"), col("e").as("e2"),
        col("nrm").as("n2")), "w")
      .persist()
    // deterministic entry vectors: the `entries` smallest xxhash64
    // mixes (the centroid-pick shape — bounded rows, every executor
    // needs them, takeOrdered shuffles nothing)
    val entryRows = vn
      .select(xxhash64(col("id")).as("mix"), col("id"), col("e"),
        col("nrm"))
      .as[(Long, Long, Array[Float], Double)]
      .rdd
      .takeOrdered(entries)(Ordering.by(t => (t._1, t._2)))
      .map(t => (t._2, t._3, t._4))
    val entryDf = spark.createDataset(entryRows.toIndexedSeq)
      .toDF("w", "e2", "n2")
    val qv = queries.select(col("vec_id").as("qid"),
        col("embedding").as("eq"),
        Native.l2NormF(col("embedding")).as("nq"))
      .persist()
    // beam state (qid, eq, nq, w, cos): everything scored so far,
    // truncated to the best `beam` per query each hop — the query
    // vector rides every row so each hop scores at pair birth
    var best = qv.crossJoin(broadcast(entryDf))
      .select(col("qid"), col("eq"), col("nq"), col("w"),
        cosCol(col("eq"), col("nq"), col("e2"), col("n2")).as("cos"))
    best = graft.engine.Tables.cutLineage(
      beamTruncate(best, beam))
    for (_ <- 1 to hops) {
      val expanded = best.select(col("qid"), col("eq"), col("nq"),
          col("w").as("v"))
        .join(undirW, "v")
        .select(col("qid"), col("eq"), col("nq"), col("w"),
          cosCol(col("eq"), col("nq"), col("e2"), col("n2")).as("cos"))
      val pool = best.unionByName(expanded)
        .dropDuplicates("qid", "w")
      best = graft.engine.Tables.cutLineage(beamTruncate(pool, beam))
    }
    val out = best.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("w"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("w").as("vec_id"), col("cos"))
      .orderBy("qid", "rank")
    val res = out.localCheckpoint(true)
    undirW.unpersist(blocking = false)
    qv.unpersist(blocking = false)
    vn.unpersist(blocking = false)
    res
  }

  private def beamTruncate(scored: DataFrame, beam: Int): DataFrame =
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("w"))))
      .filter(col("rnk") <= beam)
      .select("qid", "eq", "nq", "w", "cos")

  /** Persist the kNN-graph artifact — skinny (qid, nid, cos) edges;
    * vectors stay in the corpus table (the adjacency is the only
    * state the serve path needs beyond it). Same build-once shape as
    * writeCellIndex / writeLshIndex. */
  def writeKnnGraph(adj: DataFrame, path: String): Unit =
    adj.select("qid", "nid", "cos")
      .write.mode("overwrite").parquet(s"$path/edges.parquet")

  def loadKnnGraph(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    s.read.parquet(s"$path/edges.parquet")

  /** Append maintenance — the graph twin of appendToCellIndex /
    * appendLshIndex: each INCOMING vector gets its beam-searched
    * top-k against the EXISTING graph as out-edges (exact scores,
    * bounded work — the serve path doubles as the insert path, the
    * NSW construction idea), and existing vertices' adjacency is
    * untouched. The undirected serve still reaches incoming vectors
    * from the existing side through their REVERSE edges, so the
    * appended graph is navigable both ways; what degrades gradually
    * is edge OPTIMALITY for existing vertices whose true kNN now
    * includes incoming ids — the same weakens-never-breaks posture
    * as the cell index's frozen geometry, with the same response:
    * rebuild ([[buildKnnGraph]] on the union corpus) when the
    * appended fraction stops being small (the cell index's 2× line
    * is the right default here too). Serve appended graphs with the
    * UNION corpus frame (incoming vectors must be attachable as
    * endpoints). Caller owns id uniqueness.
    */
  def appendToKnnGraph(adj: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, incoming: DataFrame, k: Int,
      beam: Int = 16, hops: Int = 3, entries: Int = 8): DataFrame =
    adj.select("qid", "nid", "cos").unionByName(
      knnQueryGraphOn(adj, corpus, idCol, vecCol,
        incoming.select(col(idCol).as("vec_id"),
          col(vecCol).as("embedding")),
        k, beam, hops, entries)
        .select(col("qid"), col("vec_id").as("nid"), col("cos")))

  /** Approximate global top-k closest pairs from a built graph: the
    * best `k` distinct undirected edges of the adjacency itself (the
    * graph's edges ARE its best-pair estimates). Canonical (id1 <
    * id2) orientation, (cos DESC, id1, id2) order — the
    * q_sim_ann_lsh/q_sim_ann_ivf output shape.
    */
  def graphCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      k: Int, degree: Int = 8, iters: Int = 3): DataFrame =
    buildKnnGraph(df, idCol, vecCol, degree, iters)
      .select(least(col("qid"), col("nid")).as("id1"),
        greatest(col("qid"), col("nid")).as("id2"), col("cos"))
      .dropDuplicates("id1", "id2")
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(k)
}
