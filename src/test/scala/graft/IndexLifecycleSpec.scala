package graft

import org.scalatest.funsuite.AnyFunSuite

/** The build-once / serve-many index lifecycle, end to end: both
  * persisted artifacts (the text-LSH index and the vector cell index)
  * must serve outputs identical to their in-memory builds, and the
  * maintenance paths (parquet append for text, assign-and-merge for
  * vectors) must equal a from-scratch build on the union corpus.
  */
class IndexLifecycleSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

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

  test("text-LSH artifact: loaded-index incremental dedup is " +
    "byte-identical to the declared in-corpus build") {
    import spark.implicits._
    import graft.queries.DedupQueries
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val declared = rows(
      SparkEntry.queries("q_dedup_incremental")(spark, sf))
    assert(declared.nonEmpty, "fixture must produce incremental pairs")
    spark.catalog.clearCache()
    val p = fixtureDir("lsh_index")
    DedupQueries.writeLshIndex(
      DedupQueries.buildLshIndex(docs.filter($"doc_id" % 10 =!= 0)), p)
    spark.catalog.clearCache()
    val served = rows(DedupQueries.incrementalDedupOn(
      DedupQueries.loadLshIndex(spark, p),
      docs.filter($"doc_id" % 10 === 0)))
    assert(served == declared,
      s"served=${served.take(3)} declared=${declared.take(3)}")
    spark.catalog.clearCache()
  }

  test("text-LSH artifact is append-only: any append sequence equals " +
    "the from-scratch build on the union corpus") {
    import spark.implicits._
    import graft.queries.DedupQueries
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val existing = docs.filter($"doc_id" % 10 =!= 0)
    val declared = rows(
      SparkEntry.queries("q_dedup_incremental")(spark, sf))
    spark.catalog.clearCache()
    // write a third of the corpus, append the rest in two batches —
    // both index frames are per-doc, so parquet append IS the merge
    val p = fixtureDir("lsh_index_append")
    DedupQueries.writeLshIndex(
      DedupQueries.buildLshIndex(existing.filter($"doc_id" % 3 === 0)), p)
    DedupQueries.appendLshIndex(p, existing.filter($"doc_id" % 3 === 1))
    DedupQueries.appendLshIndex(p, existing.filter($"doc_id" % 3 === 2))
    spark.catalog.clearCache()
    val served = rows(DedupQueries.incrementalDedupOn(
      DedupQueries.loadLshIndex(spark, p),
      docs.filter($"doc_id" % 10 === 0)))
    assert(served == declared)
    spark.catalog.clearCache()
  }

  test("streaming text-dedup serves from the loaded LSH artifact: " +
    "dedupIndexFrom(loadLshIndex) == the declared incremental batch") {
    import spark.implicits._
    import graft.queries.DedupQueries
    import graft.streaming.StreamTransforms
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val declared = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .select("d_in", "d_ex", "inter", "jaccard")
      .collect().map(_.toSeq).toSet
    spark.catalog.clearCache()
    val p = fixtureDir("lsh_index_stream")
    DedupQueries.writeLshIndex(
      DedupQueries.buildLshIndex(docs.filter($"doc_id" % 10 =!= 0)), p)
    spark.catalog.clearCache()
    val served = StreamTransforms.dedupIncoming(
        docs.filter($"doc_id" % 10 === 0),
        StreamTransforms.dedupIndexFrom(
          DedupQueries.loadLshIndex(spark, p)))
      .collect().map(_.toSeq).toSet
    assert(served == declared)
    spark.catalog.clearCache()
  }

  test("cell-index append maintenance: banded operators on an appended " +
    "index exactly match the brute baselines on the union corpus") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    // build the index on 3/4 of the corpus, append the remaining 1/4 —
    // the union is the full graded table, so the brute baselines on
    // the original dir ARE the ground truth for the appended index
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_append_base")
    full.filter($"vec_id" % 4 =!= 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val extra = full.filter($"vec_id" % 4 === 0)
      .select("vec_id", "label", "embedding")
    val ci = DedupQueries.appendToCellIndex(
      DedupQueries.buildCellIndex(spark, base), extra)
    // bookkeeping: count and per-cell sizes track the union exactly
    assert(ci.nVec == full.count())
    assert(ci.cellSizes.values.sum == ci.nVec)
    val knnApp = rows(KnnOpsQueries.bandedKnnAccuracyOn(ci))
    val dedupApp = rows(DedupQueries.embeddingDedupBandedOn(ci, 0.40))
    val topkApp = rows(DedupQueries.cosineTopKBandedOn(ci, 10))
    spark.catalog.clearCache()
    assert(knnApp == rows(KnnOpsQueries.bruteKnnAccuracy(spark, sf)))
    spark.catalog.clearCache()
    assert(dedupApp == rows(DedupQueries.embeddingDedup(spark, sf, 0.40)))
    spark.catalog.clearCache()
    assert(topkApp == rows(DedupQueries.cosineTopK(spark, sf, 10)))
    spark.catalog.clearCache()
  }

  test("degenerate maintenance inputs: empty vector batch is a no-op " +
    "append; shingle-less docs vanish from the LSH artifact; serving " +
    "surfaces work against an appended index") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_append_edge")
    full.filter($"vec_id" % 4 =!= 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val ci = DedupQueries.buildCellIndex(spark, base)
    // empty append: bookkeeping unchanged, outputs unchanged
    val before = rows(DedupQueries.cosineTopKBandedOn(ci, 10))
    val ciEmpty = DedupQueries.appendToCellIndex(ci,
      full.filter("1 = 0").select("vec_id", "label", "embedding"))
    assert(ciEmpty.nVec == ci.nVec &&
      ciEmpty.cellSizes == ci.cellSizes)
    assert(rows(DedupQueries.cosineTopKBandedOn(ciEmpty, 10)) == before)
    // the PER-QUERY serving surfaces work against an APPENDED index:
    // queries that are near-copies of the appended quarter must find
    // their sources (they are only in the index via the append path)
    val ciApp = DedupQueries.appendToCellIndex(ci,
      full.filter($"vec_id" % 4 === 0)
        .select("vec_id", "label", "embedding"))
    val q = full.filter($"vec_id" % 4 === 0).limit(5)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val dd = DedupQueries.embeddingDedupIncoming(ciApp, q, 0.9999)
      .collect()
    assert(dd.length == 5 && dd.forall(r =>
      !r.isNullAt(1) && r.getLong(1) == r.getLong(0) - 100000L),
      dd.mkString(","))
    val knn = KnnOpsQueries.knnQueryOn(ciApp, q, 1).collect()
    assert(knn.forall(r => r.getLong(2) == r.getLong(0) - 100000L &&
      r.getDouble(3) == 1.0), knn.mkString(","))
    spark.catalog.clearCache()

    // LSH artifact: a batch of only shingle-less docs appends nothing
    import graft.queries.DedupQueries.{buildLshIndex, loadLshIndex,
      writeLshIndex, appendLshIndex, incrementalDedupOn}
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val p = fixtureDir("lsh_edge")
    writeLshIndex(buildLshIndex(docs.filter($"doc_id" % 10 =!= 0)), p)
    appendLshIndex(p, Seq((999999L, "one two")).toDF("doc_id", "text"))
    val declared = rows(
      SparkEntry.queries("q_dedup_incremental")(spark, sf))
    spark.catalog.clearCache()
    assert(rows(incrementalDedupOn(loadLshIndex(spark, p),
      docs.filter($"doc_id" % 10 === 0))) == declared)
    spark.catalog.clearCache()
  }

  test("takedown: removing vectors from the cell index exactly matches " +
    "the brute baselines on the remaining corpus (radii stay valid " +
    "upper bounds)") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val rest = fixtureDir("cell_remove_rest")
    full.filter($"vec_id" % 4 =!= 0)
      .write.mode("overwrite").parquet(s"$rest/embeddings.parquet")
    val ci = DedupQueries.removeFromCellIndex(
      DedupQueries.buildCellIndex(spark, sf),
      full.filter($"vec_id" % 4 === 0).select("vec_id"))
    assert(ci.nVec == full.filter($"vec_id" % 4 =!= 0).count())
    assert(ci.cellSizes.values.sum == ci.nVec &&
      ci.cellSizes.values.forall(_ > 0))
    val knn = rows(KnnOpsQueries.bandedKnnAccuracyOn(ci))
    val dedup = rows(DedupQueries.embeddingDedupBandedOn(ci, 0.40))
    val topk = rows(DedupQueries.cosineTopKBandedOn(ci, 10))
    spark.catalog.clearCache()
    assert(knn == rows(KnnOpsQueries.bruteKnnAccuracy(spark, rest)))
    spark.catalog.clearCache()
    assert(dedup == rows(DedupQueries.embeddingDedup(spark, rest, 0.40)))
    spark.catalog.clearCache()
    assert(topk == rows(DedupQueries.cosineTopK(spark, rest, 10)))
    // removing ids that are not in the index is a no-op
    val same = DedupQueries.removeFromCellIndex(ci,
      Seq(987654321L).toDF("vec_id"))
    assert(same.nVec == ci.nVec && same.cellSizes == ci.cellSizes)
    spark.catalog.clearCache()
  }

  test("takedown: LSH tombstones remove docs from every future load; " +
    "compaction reclaims them") {
    import spark.implicits._
    import graft.queries.DedupQueries._
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val existing = docs.filter($"doc_id" % 10 =!= 0)
    val incoming = docs.filter($"doc_id" % 10 === 0)
    // ground truth: incremental dedup against the existing docs MINUS
    // the removed third, built from scratch
    val expected = rows(incrementalDedupOn(
      buildLshIndex(existing.filter($"doc_id" % 3 =!= 1)), incoming))
    spark.catalog.clearCache()
    val p = fixtureDir("lsh_remove")
    writeLshIndex(buildLshIndex(existing), p)
    removeFromLshIndex(p, existing.filter($"doc_id" % 3 === 1)
      .select("doc_id"))
    spark.catalog.clearCache()
    assert(rows(incrementalDedupOn(loadLshIndex(spark, p), incoming))
      == expected)
    spark.catalog.clearCache()
    // compaction to a fresh path drops the tombstones but serves the
    // same corpus
    val pc = fixtureDir("lsh_remove_compact")
    compactLshIndex(spark, p, pc)
    assert(!new java.io.File(s"$pc/tombstones.parquet").exists)
    spark.catalog.clearCache()
    assert(rows(incrementalDedupOn(loadLshIndex(spark, pc), incoming))
      == expected)
    spark.catalog.clearCache()
  }

  test("streaming kNN against a TINY index (singleton cells, void " +
    "floors, dead own cells): stream function still equals knnQueryOn") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val dir = fixtureDir("knn_stream_tiny")
    (0L until 6L).map { id =>
      val e = Array.tabulate(64) { j =>
        (((id * 13 + j * 7) % 11) - 5).toFloat * 0.1f }
      (id, e.toSeq, (id % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) embedding",
        "cast(label as int) label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ci = DedupQueries.buildCellIndex(spark, dir)
    val q = graft.engine.Tables.t(spark, sf, "embeddings").limit(7)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val batch = rows(KnnOpsQueries.knnQueryOn(ci, q, 5))
    assert(batch.nonEmpty)
    val viaStreamFn = graft.streaming.StreamTransforms
      .knnQueryStream(q, ci, 5).toDF
      .orderBy("qid", "rank")
    assert(rows(viaStreamFn) == batch)
    spark.catalog.clearCache()
  }

  test("approximate kNN serving (nprobe knob): degrades to EXACTLY the " +
    "exact path at full probe width, and recovers high recall at " +
    "small nprobe on clustered geometry") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    // clustered fixture (the KnnOpsSpec recipe): 3 tight orthogonal
    // clusters — the geometry the nprobe knob exists for
    val dim = 64
    val dir = fixtureDir("knn_approx")
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
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ci = DedupQueries.buildCellIndex(spark, dir)
    val q = graft.engine.Tables.t(spark, dir, "embeddings").limit(40)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val exact = KnnOpsQueries.knnQueryOn(ci, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.catalog.clearCache()
    // anchor 1: nprobe >= live cells == the exact output, byte-for-byte
    val fullProbe = rows(KnnOpsQueries.knnQueryApproxOn(ci, q, 5,
      nprobe = ci.nCells))
    spark.catalog.clearCache()
    assert(fullProbe == rows(KnnOpsQueries.knnQueryOn(ci, q, 5)))
    spark.catalog.clearCache()
    // anchor 2: nprobe=3 on clustered geometry — mean recall >= 0.9
    val approx = KnnOpsQueries.knnQueryApproxOn(ci, q, 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // the bound is real: nprobe=1 emits at most k rows per query
    val one = KnnOpsQueries.knnQueryApproxOn(ci, q, 5, nprobe = 1)
      .groupBy("qid").count().collect()
    assert(one.forall(_.getLong(1) <= 5))
    spark.catalog.clearCache()
  }

  test("rebuilding an appended index from its own corpus frame equals " +
    "a from-scratch build of the union dir byte-identically (the " +
    "radius-drift response needs no raw corpus directory)") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_rebuild_base")
    full.filter($"vec_id" % 4 =!= 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val appended = DedupQueries.appendToCellIndex(
      DedupQueries.buildCellIndex(spark, base),
      full.filter($"vec_id" % 4 === 0)
        .select("vec_id", "label", "embedding"))
    val rb = DedupQueries.rebuildCellIndex(appended)
    // fresh centroids/radii: the rebuilt index has full-corpus-sized
    // cell geometry again (the appended one kept the base's √N)
    assert(rb.nCells > appended.nCells)
    assert(rb.nVec == appended.nVec)
    val knnRb = rows(KnnOpsQueries.bandedKnnAccuracyOn(rb))
    val topkRb = rows(DedupQueries.cosineTopKBandedOn(rb, 10))
    spark.catalog.clearCache()
    val fresh = DedupQueries.buildCellIndex(spark, sf)
    assert(rows(KnnOpsQueries.bandedKnnAccuracyOn(fresh)) == knnRb)
    assert(rows(DedupQueries.cosineTopKBandedOn(fresh, 10)) == topkRb)
    spark.catalog.clearCache()
  }

  test("appended cell index round-trips through the parquet artifact " +
    "byte-identically (write to a FRESH path, reload, serve)") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_append_rt_base")
    full.filter($"vec_id" % 4 =!= 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val ci = DedupQueries.appendToCellIndex(
      DedupQueries.buildCellIndex(spark, base),
      full.filter($"vec_id" % 4 === 0)
        .select("vec_id", "label", "embedding"))
    val mem = rows(KnnOpsQueries.bandedKnnAccuracyOn(ci))
    val memTopk = rows(DedupQueries.cosineTopKBandedOn(ci, 10))
    val fresh = fixtureDir("cell_append_rt_idx")
    DedupQueries.writeCellIndex(ci, fresh)
    spark.catalog.clearCache()
    val li = DedupQueries.loadCellIndex(spark, fresh)
    assert(li.nVec == ci.nVec && li.cellSizes == ci.cellSizes)
    assert(rows(KnnOpsQueries.bandedKnnAccuracyOn(li)) == mem)
    assert(rows(DedupQueries.cosineTopKBandedOn(li, 10)) == memTopk)
    spark.catalog.clearCache()
  }

  test("approx-kNN recall on the REAL (10-class isotropic) geometry: " +
    "monotone in nprobe, measured floors hold, full width == exact") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    // the graded table's actual distribution (the r11 recall pins
    // used only a synthetic clustered fixture); sf0.01 = 500 vectors,
    // 23 live cells — measured curve in SCALING.md Addendum 19:
    // recall@5 0.37/0.52/0.71/0.84/0.93 at nprobe 1/3/8/12/16, i.e.
    // recall tracks the SCANNED FRACTION (isotropy leaves IVF no
    // locality to exploit — the same information-theoretic floor as
    // the exact path's no-prune regime). Floors pinned with margin
    // (the driver regenerates testdata between rounds).
    val dir = "/root/testdata/sf0.01"
    val ci = DedupQueries.buildCellIndex(spark, dir)
    val q = graft.engine.Tables.t(spark, dir, "embeddings")
      .filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + 100000000L).as("vec_id"), $"embedding")
    val exact = KnnOpsQueries.knnQueryOn(ci, q, 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nprobe: Int): Double = {
      val got = KnnOpsQueries.knnQueryApproxOn(ci, q, 5, nprobe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val curve = Seq(1, 3, 8, 16).map(recallAt)
    assert(curve == curve.sorted,
      s"recall must be monotone in nprobe: $curve")
    assert(curve(0) >= 0.2 && curve(2) >= 0.55 && curve(3) >= 0.8,
      s"measured floors (0.2/0.55/0.8 at nprobe 1/8/16) broke: $curve")
    spark.catalog.clearCache()
  }

  test("rebuild trigger is executable: false on a fresh build, true " +
    "after the corpus doubles, baseline survives the artifact " +
    "round-trip, rebuild resets it") {
    import spark.implicits._
    import graft.queries.DedupQueries
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_trigger_base")
    full.filter($"vec_id" % 4 === 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val fresh = DedupQueries.buildCellIndex(spark, base)
    assert(!DedupQueries.shouldRebuild(fresh),
      "a fresh build must not trigger its own rebuild")
    // append 3× the built corpus: nVec crosses the 2× line
    val appended = DedupQueries.appendToCellIndex(fresh,
      full.filter($"vec_id" % 4 =!= 0)
        .select("vec_id", "label", "embedding"))
    assert(appended.buildMeta == fresh.buildMeta,
      "maintenance must carry the build-time baseline unchanged")
    assert(appended.nVec >= 2L * appended.buildMeta.nVecAtBuild)
    assert(DedupQueries.shouldRebuild(appended))
    // the baseline survives write → load: the trigger stays checkable
    // on a loaded artifact after appends (the judged gap)
    val p = fixtureDir("cell_trigger_idx")
    DedupQueries.writeCellIndex(appended, p)
    spark.catalog.clearCache()
    val loaded = DedupQueries.loadCellIndex(spark, p)
    assert(loaded.buildMeta == appended.buildMeta)
    assert(DedupQueries.shouldRebuild(loaded))
    // rebuilding re-captures the baseline: the trigger resets
    val rb = DedupQueries.rebuildCellIndex(loaded)
    assert(rb.buildMeta.nVecAtBuild == rb.nVec)
    assert(!DedupQueries.shouldRebuild(rb))
    // a fresh-build artifact round-trips to a non-triggering index
    val pf = fixtureDir("cell_trigger_fresh_idx")
    DedupQueries.writeCellIndex(fresh, pf)
    spark.catalog.clearCache()
    assert(!DedupQueries.shouldRebuild(
      DedupQueries.loadCellIndex(spark, pf)))
    spark.catalog.clearCache()
  }

  test("maintainCellIndex: appends below the trigger, rebuilds at it " +
    "(fresh geometry, reset baseline, fresh-build outputs); a " +
    "pre-meta artifact loads with the degraded baseline") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_maintain_base")
    full.filter($"vec_id" % 4 === 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val ci = DedupQueries.buildCellIndex(spark, base)
    // small batch: below both trigger lines — pure append
    val small = DedupQueries.maintainCellIndex(ci,
      full.filter($"vec_id" % 16 === 1)
        .select("vec_id", "label", "embedding"))
    assert(small.nCells == ci.nCells &&
      small.buildMeta == ci.buildMeta,
      "a below-trigger batch must stay an append")
    // large batch: crosses 2x - the composed step must rebuild
    val grown = DedupQueries.maintainCellIndex(ci,
      full.filter($"vec_id" % 4 =!= 0)
        .select("vec_id", "label", "embedding"))
    assert(grown.nCells > ci.nCells, "rebuild must re-derive sqrt(N')")
    assert(grown.buildMeta.nVecAtBuild == grown.nVec &&
      !DedupQueries.shouldRebuild(grown))
    val knn = rows(KnnOpsQueries.bandedKnnAccuracyOn(grown))
    spark.catalog.clearCache()
    assert(knn == rows(KnnOpsQueries.bandedKnnAccuracyOn(
      DedupQueries.buildCellIndex(spark, sf))),
      "post-rebuild serving must equal a fresh build of the union")
    spark.catalog.clearCache()
    // legacy artifact (no meta.parquet): loads with the CURRENT state
    // as baseline - trigger degrades to drift-since-load, no crash
    val p = fixtureDir("cell_legacy_idx")
    DedupQueries.writeCellIndex(ci, p)
    val metaDir = new java.io.File(s"$p/meta.parquet")
    org.apache.commons.io.FileUtils.deleteQuietly(metaDir)
    assert(!metaDir.exists)
    spark.catalog.clearCache()
    val legacy = DedupQueries.loadCellIndex(spark, p)
    assert(legacy.buildMeta.nVecAtBuild == legacy.nVec)
    assert(!DedupQueries.shouldRebuild(legacy))
    spark.catalog.clearCache()
  }

  test("LSH compaction trigger fires at tombstone ratio >= tau; " +
    "compact-at-trigger serves byte-identically; writeLshIndex over " +
    "a tombstoned path defines the FULL artifact") {
    import spark.implicits._
    import graft.queries.DedupQueries._
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val existing = docs.filter($"doc_id" % 10 =!= 0)
    val incoming = docs.filter($"doc_id" % 10 === 0)
    val p = fixtureDir("lsh_trigger")
    writeLshIndex(buildLshIndex(existing), p)
    assert(!shouldCompactLsh(spark, p),
      "a fresh artifact has no tombstones to compact")
    // tombstone ~a third of the corpus: ratio 0.33 >= default 0.2
    removeFromLshIndex(p,
      existing.filter($"doc_id" % 3 === 1).select("doc_id"))
    assert(shouldCompactLsh(spark, p))
    val served = rows(incrementalDedupOn(loadLshIndex(spark, p),
      incoming))
    spark.catalog.clearCache()
    // compacting at the trigger serves byte-identically and resets it
    val pc = fixtureDir("lsh_trigger_compact")
    compactLshIndex(spark, p, pc)
    assert(!shouldCompactLsh(spark, pc))
    assert(rows(incrementalDedupOn(loadLshIndex(spark, pc), incoming))
      == served)
    spark.catalog.clearCache()
    // writeLshIndex DEFINES the artifact: rewriting over the
    // previously tombstoned path must not let the stale tombstone
    // table silently anti-join the fresh docs away
    val declared = rows(incrementalDedupOn(buildLshIndex(existing),
      incoming))
    spark.catalog.clearCache()
    writeLshIndex(buildLshIndex(existing), p)
    assert(!shouldCompactLsh(spark, p),
      "rewriting the artifact must delete the stale tombstone table")
    assert(rows(incrementalDedupOn(loadLshIndex(spark, p), incoming))
      == declared)
    spark.catalog.clearCache()
  }

  test("maintainLshIndex: a below-trigger batch is a pure append " +
    "(tombstones untouched); an at-trigger batch compacts IN PLACE " +
    "(tombstones dropped, ratio reset, no staging residue); serving " +
    "equals the from-scratch tombstone-applied build on both sides " +
    "of the boundary") {
    import spark.implicits._
    import graft.queries.DedupQueries._
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val existing = docs.filter($"doc_id" % 10 >= 1 && $"doc_id" % 10 <= 7)
    val batch1 = docs.filter($"doc_id" % 10 === 8)
    val batch2 = docs.filter($"doc_id" % 10 === 9)
    val incoming = docs.filter($"doc_id" % 10 === 0)
    val p = fixtureDir("lsh_maintain")
    writeLshIndex(buildLshIndex(existing), p)
    // ~1/8 of the corpus tombstoned: ratio ~0.125 < tau=0.2
    val tomb1 = existing.filter($"doc_id" % 8 === 1).select("doc_id")
    removeFromLshIndex(p, tomb1)
    val nTomb1 = spark.read.parquet(s"$p/tombstones.parquet").count()
    maintainLshIndex(spark, p, batch1)
    // below the trigger: pure append — the tombstone table untouched
    val tombFile = new java.io.File(s"$p/tombstones.parquet")
    assert(tombFile.exists, "below-trigger maintain must not compact")
    assert(spark.read.parquet(s"$p/tombstones.parquet").count()
      == nTomb1, "below-trigger maintain must not touch tombstones")
    assert(!shouldCompactLsh(spark, p))
    val live1 = existing.unionByName(batch1)
      .join(tomb1, Seq("doc_id"), "left_anti")
    assert(rows(incrementalDedupOn(loadLshIndex(spark, p), incoming))
      == rows(incrementalDedupOn(buildLshIndex(live1), incoming)),
      "served-below-trigger must equal the tombstone-applied build")
    spark.catalog.clearCache()
    // two more eighths tombstoned: ratio crosses tau
    val tomb23 = existing
      .filter($"doc_id" % 8 === 3 || $"doc_id" % 8 === 5)
      .select("doc_id")
    removeFromLshIndex(p, tomb23)
    assert(shouldCompactLsh(spark, p))
    maintainLshIndex(spark, p, batch2)
    // at the trigger: compacted in place — tombstones dropped, ratio
    // reset, and the stage-then-swap leaves no residue
    assert(!tombFile.exists,
      "at-trigger maintain must compact (tombstones dropped)")
    assert(!shouldCompactLsh(spark, p))
    val stage = new java.io.File(
      new java.io.File(p).getParentFile,
      s".${new java.io.File(p).getName}.staging")
    assert(!stage.exists, s"staging residue left at $stage")
    val live2 = existing.unionByName(batch1).unionByName(batch2)
      .join(tomb1.unionByName(tomb23), Seq("doc_id"), "left_anti")
    assert(rows(incrementalDedupOn(loadLshIndex(spark, p), incoming))
      == rows(incrementalDedupOn(buildLshIndex(live2), incoming)),
      "served-after-compaction must equal the tombstone-applied build")
    spark.catalog.clearCache()
  }

  test("maintenance preserves the vn cache posture (ADVICE r12): a " +
    "persistVn=false index stays uncached through append, remove, " +
    "load, and a trigger-fired rebuild; the default stays cached") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    import graft.queries.DedupQueries
    val full = graft.engine.Tables.t(spark, sf, "embeddings")
    val base = fixtureDir("cell_posture_base")
    full.filter($"vec_id" % 4 === 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val ci = DedupQueries.buildCellIndex(spark, base, persistVn = false)
    assert(!ci.persistVn && ci.vn.storageLevel == StorageLevel.NONE)
    // append below the trigger: the union must not persist either
    val appended = DedupQueries.appendToCellIndex(ci,
      full.filter($"vec_id" % 16 === 1)
        .select("vec_id", "label", "embedding"))
    assert(!appended.persistVn &&
      appended.vn.storageLevel == StorageLevel.NONE)
    // removal: same
    val removed = DedupQueries.removeFromCellIndex(ci,
      ci.memVec.select("vec_id").limit(3))
    assert(!removed.persistVn &&
      removed.vn.storageLevel == StorageLevel.NONE)
    // trigger-fired rebuild via the composed step: before r13 this
    // silently re-persisted vn (rebuild ignored the caller's posture)
    val grown = DedupQueries.maintainCellIndex(ci,
      full.filter($"vec_id" % 4 =!= 0)
        .select("vec_id", "label", "embedding"))
    assert(grown.nCells > ci.nCells, "the 2x trigger must have fired")
    assert(!grown.persistVn &&
      grown.vn.storageLevel == StorageLevel.NONE,
      "rebuild must preserve the build-time persistVn=false posture")
    // artifact round-trip records the load-time posture
    val p = fixtureDir("cell_posture_idx")
    DedupQueries.writeCellIndex(ci, p)
    spark.catalog.clearCache()
    val lf = DedupQueries.loadCellIndex(spark, p, persistVn = false)
    assert(!lf.persistVn && lf.vn.storageLevel == StorageLevel.NONE)
    spark.catalog.clearCache()
    // and the cached default is unchanged
    val cip = DedupQueries.buildCellIndex(spark, base)
    assert(cip.persistVn &&
      cip.vn.storageLevel != StorageLevel.NONE)
    spark.catalog.clearCache()
  }

  test("nprobeFor: the conservative selector meets its target on the " +
    "REAL isotropic geometry, overshoots on clustered geometry, is " +
    "monotone in the target, hits the exact path at 1.0, and " +
    "surfaces the isotropic caveat in the result") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    val dir = "/root/testdata/sf0.01"
    val ci = DedupQueries.buildCellIndex(spark, dir)
    val q = graft.engine.Tables.t(spark, dir, "embeddings")
      .filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + 100000000L).as("vec_id"), $"embedding")
    val exact = KnnOpsQueries.knnQueryOn(ci, q, 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(np: Int): Double = {
      val got = KnnOpsQueries.knnQueryApproxOn(ci, q, 5, np)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    for (target <- Seq(0.5, 0.75)) {
      val pick = KnnOpsQueries.nprobeFor(ci, target)
      assert(pick.recallFloor >= target,
        s"promised floor ${pick.recallFloor} below target $target")
      assert(recallAt(pick.nprobe) >= target,
        s"measured recall at nprobe=${pick.nprobe} below $target")
      assert(pick.caveat.toLowerCase.contains("isotropic"),
        "the geometry caveat must travel in the result")
      assert(pick.scanFraction ==
        pick.nprobe.toDouble / ci.bcRadii.value.size)
    }
    // monotone in the target
    val picks = Seq(0.1, 0.5, 0.75, 1.0)
      .map(KnnOpsQueries.nprobeFor(ci, _).nprobe)
    assert(picks == picks.sorted, s"picks not monotone: $picks")
    // target 1.0 = full width = EXACTLY the exact path
    val full = KnnOpsQueries.nprobeFor(ci, 1.0)
    assert(full.nprobe == ci.bcRadii.value.size &&
      full.recallFloor == 1.0 && full.scanFraction == 1.0)
    assert(rows(KnnOpsQueries.knnQueryApproxOn(ci, q, 5, full.nprobe)
        .orderBy("qid", "rank"))
      == rows(KnnOpsQueries.knnQueryOn(ci, q, 5).orderBy("qid", "rank")))
    spark.catalog.clearCache()
    // clustered geometry (the knn_approx fixture recipe): the same
    // conservative pick OVERSHOOTS — the floors are the isotropic
    // worst case
    val dim = 64
    val cdir = fixtureDir("nprobe_clustered")
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
    val cic = DedupQueries.buildCellIndex(spark, cdir)
    val cq = graft.engine.Tables.t(spark, cdir, "embeddings").limit(40)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    val cExact = KnnOpsQueries.knnQueryOn(cic, cq, 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val cPick = KnnOpsQueries.nprobeFor(cic, 0.5)
    val cGot = KnnOpsQueries.knnQueryApproxOn(cic, cq, 5, cPick.nprobe)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cRecall = cExact.intersect(cGot).size.toDouble / cExact.size
    assert(cRecall >= 0.9,
      s"clustered geometry should overshoot a 0.5 target: $cRecall")
    spark.catalog.clearCache()
  }

  test("scoped serving release: repeated serve batches return the " +
    "cache registry to the index-only baseline; the members frame " +
    "is memoized per index and released by unpersist") {
    import spark.implicits._
    import graft.queries.{DedupQueries, KnnOpsQueries}
    spark.catalog.clearCache()
    def nCached = spark.sparkContext.getPersistentRDDs.size
    val ci = DedupQueries.buildCellIndex(spark, sf)
    val q = graft.engine.Tables.t(spark, sf, "embeddings").limit(8)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    // warm-up batch materializes everything the serve path touches
    // (index caches included); its per-call frames release on exit
    val expKnn = KnnOpsQueries.serveKnnBatch(ci, q, 5)(rows)
    val expDedup =
      DedupQueries.serveEmbeddingDedupBatch(ci, q, 0.8)(rows)
    assert(expKnn.nonEmpty && expDedup.nonEmpty)
    val base = nCached
    for (_ <- 1 to 3) {
      assert(KnnOpsQueries.serveKnnBatch(ci, q, 5)(rows) == expKnn)
      assert(DedupQueries.serveEmbeddingDedupBatch(ci, q, 0.8)(rows)
        == expDedup)
    }
    assert(nCached == base,
      s"serving batches leaked caches: $base -> $nCached")
    // cellMembers: ONE memoized frame per index (repeated streaming
    // serve construction used to persist a fresh copy per call)...
    assert(ci.cellMembers eq ci.cellMembers)
    ci.cellMembers.count()
    assert(nCached == base + 1)
    // ...released with the index's own caches
    ci.unpersist()
    assert(nCached < base,
      s"unpersist must release the index frames: $base -> $nCached")
    spark.catalog.clearCache()
  }
}
