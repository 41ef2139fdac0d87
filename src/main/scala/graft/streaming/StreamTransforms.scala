package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.engine.Tables.{D, d4}

/** Row/state/output types for the custom stateful operator. */
case class EvRow(event_id: Long, user_id: Long, event_type: String,
  value: Double, ts_us: java.sql.Timestamp)
/** One incoming document for the streaming dedup firehose. */
case class DocRow(doc_id: Long, text: String)
/** One incoming embedding for the streaming vector-dedup firehose. */
case class VecRow(vec_id: Long, embedding: Seq[Float])
/** One scored kNN candidate row feeding the per-query merge. */
case class KnnCand(qid: Long, nbr: Long, cos: Double)
/** One ranked kNN result row (the knnQueryOn output schema). */
case class KnnHit(qid: Long, rank: Long, vec_id: Long, cos: Double)
case class CounterState(n: Long)
case class PurchaseCount(user_id: Long, event_id: Long,
  purchases_since_error: Long)

/** SURVEY.md §2.10 — the single transform function behind each
  * streaming operator. Each takes an events frame (batch OR streaming,
  * schema: event_id, user_id, event_type, value, props, ts_us) so the
  * batch twin declared in SparkEntry.queries and the readStream twin
  * asserted in scalatest share one code path.
  *
  * Windowed aggs work unchanged on streaming input (group-by window is
  * Spark's native streaming agg); the gaps-and-islands session transform
  * is batch-only — its streaming twin uses session_window (see
  * StreamingSpec) and scalatest asserts the two agree on replay.
  */
object StreamTransforms {

  /** 1-day tumbling window × event_type: count + exact decimal sum. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts_us"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("sum_val"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** 1-day windows sliding every 6 hours (each event in 4 windows). */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts_us"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("sum_val"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** Batch gaps-and-islands sessionization, 30-minute inactivity gap:
    * (user_id, session_id, n_events, start_ts, end_ts). The streaming
    * twin is session_window(ts_us, "30 minutes") — same session bounds.
    */
  def sessionsBatch(ev: DataFrame): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val run = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev", lag(col("ts_us"), 1).over(byTs))
      .withColumn("is_new",
        when(col("prev").isNull ||
          (unix_micros(col("ts_us")) - unix_micros(col("prev")) >
            1800000000L), 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_ts"), max(col("ts_us")).as("end_ts"))
  }

  /** Key-dedup: one row per event_id (rows for a key are identical in
    * the doubled replay, so the arbitrary keep is deterministic).
    * Streaming twin: dropDuplicatesWithinWatermark. */
  def dedupByKey(ev: DataFrame): DataFrame =
    ev.select("event_id", "user_id", "event_type", "ts_us")
      .dropDuplicates("event_id")

  /** Custom stateful operator (flatMapGroupsWithState): per-user running
    * count of purchases since the last error event. State is one counter
    * per user — bounded by user cardinality, the 100 TB-safe shape.
    * Within a micro-batch the group iterator is sorted by (ts, id) so
    * replay order, not arrival order, defines the result — at FULL
    * microsecond precision (Timestamp.getTime truncates to ms, which
    * would order two same-millisecond events differently from the
    * full-precision oracle sort). Works on batch Datasets too (Spark
    * runs it as a single "batch" group pass).
    */
  def purchasesSinceError(ev: Dataset[EvRow]): Dataset[PurchaseCount] = {
    import ev.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[CounterState, PurchaseCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EvRow], state: GroupState[CounterState]) =>
          var n = state.getOption.map(_.n).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[PurchaseCount]
          it.toSeq.sortBy(e => (micros(e.ts_us), e.event_id)).foreach { e =>
            e.event_type match {
              case "error"    => n = 0L
              case "purchase" => n += 1; out += PurchaseCount(uid, e.event_id, n)
              case _          =>
            }
          }
          state.update(CounterState(n))
          out.iterator
      }
  }

  /** Stream ⋈ stream interval join: same-user event pairs within one
    * hour (the streaming twin of the q_join_theta_range batch query).
    * Both sides carry a 2-hour watermark — at least the 1-hour join
    * window plus slack — so the state store provably evicts rows older
    * than the reachable match range: bounded state at any scale. Works
    * unchanged on batch frames (withWatermark is a no-op in batch).
    */
  def pairsWithin1h(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("event_id").as("id1"), col("user_id"),
      col("ts_us").as("ts1")).withWatermark("ts1", "2 hours")
    val r = b.select(col("event_id").as("id2"), col("user_id").as("user2"),
      col("ts_us").as("ts2")).withWatermark("ts2", "2 hours")
    l.join(r,
      col("user_id") === col("user2") &&
        col("id1") < col("id2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR"))
      .select("id1", "id2", "user_id", "ts1", "ts2")
  }

  /** Last-writer-wins compaction of a CDC changelog (columns: key,
    * value, ver, seq, op ∈ {U, D}): one row per key — the (ver, seq)-
    * greatest — delete tombstones retained. Compaction is commutative
    * and associative over row batches, so any micro-batch chunking of
    * the log converges to the same state; one shuffle on the merge key
    * (at 100 TB the state table and each batch co-partition on it).
    */
  def cdcCompact(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ver").desc, col("seq").desc)
    changelog.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** CDC apply: final table state = compacted changelog minus delete
    * tombstones (a key whose latest entry is a delete is absent). */
  def cdcApply(changelog: DataFrame): DataFrame =
    cdcCompact(changelog).filter(col("op") =!= "D")

  /** Streaming CDC apply via foreachBatch: the parquet state at
    * `targetPath` is hash-partitioned on `bucket = pmod(xxhash64(key),
    * buckets)`, and every micro-batch merges ONLY the buckets its keys
    * touch — read those partitions (directory-pruned), union the batch,
    * re-compact, dynamic-partition-overwrite them. Per-batch cost is
    * O(batch + state/buckets · touched) — never a full-state rewrite, so
    * a small batch against a huge state stays cheap; size `buckets` so
    * one bucket ≈ a comfortable task unit at the deployed scale. State
    * stays key-compacted INCLUDING tombstones, so late rows in later
    * batches resolve exactly as a batch [[cdcApply]] over the full log
    * would (an out-of-order update older than a stored delete cannot
    * resurrect the key). Readers take live rows with `op != 'D'`.
    * In production the same merge runs against a MERGE-capable table
    * format (which adds per-commit atomicity); dynamic partition
    * overwrite keeps the local twin dependency-free.
    */
  def cdcApplyStream(changelog: DataFrame, targetPath: String,
      checkpoint: String, buckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changelog.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val target = new org.apache.hadoop.fs.Path(targetPath)
        val fs = target.getFileSystem(conf)
        val b = batch.toDF()
          .withColumn("bucket", pmod(xxhash64(col("key")), lit(buckets)))
          .localCheckpoint(true) // batch frame is consumed twice below
        // the touched-bucket list is bounded by `buckets` — a scalar-
        // sized collect, independent of state or batch row counts
        val touched = b.select("bucket").distinct()
          .collect().map(_.getLong(0))
        val cur =
          if (fs.exists(target))
            spark.read.parquet(targetPath)
              .filter(col("bucket").isin(touched.toIndexedSeq: _*))
              .unionByName(b)
          else b
        cdcCompact(cur)
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(targetPath)
        ()
      }
      .start()

  /** Stream ⋈ static dim: events joined to a customer-derived tier. */
  def joinDim(ev: DataFrame, customer: DataFrame): DataFrame =
    ev.join(customer.select(col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier")),
        ev("user_id") === col("c_custkey"))
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("sum_val"))

  // --- streaming incremental dedup (the ingest-firehose shape) ---
  // New documents arrive as a stream and must be near-dup-checked
  // against the ACCEPTED corpus: per micro-batch everything is either a
  // narrow per-row computation or a stream⋈static equi-join, so the
  // operator needs NO stream-stream join and NO watermark state — the
  // only stateful step is the final (d_in, d_ex) de-duplication of
  // multi-band hits. The MinHash construction is bit-identical to
  // graft.queries.DedupQueries.minhashBuckets (hb = xxhash64(sh);
  // x_i = xxhash64(hb, i); h_i = min x_i; band key = xxhash64 over the
  // band's h_i), so StreamingSpec can assert stream == the declared
  // batch q_dedup_incremental exactly.

  private val DedupBands = 16 // × 2 rows per band, as the batch pipeline

  /** (doc_id, shs): the distinct 3-gram shingle SET as an array column.
    * Arrays ride the row, so candidate verification downstream is
    * per-row set math (array_intersect) instead of a join against an
    * exploded shingle table — the trick that keeps the stream side
    * join-free.
    */
  def shingleArrays(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"))
        .as("shs"))

  /** (band, key) struct array for one shingle-set row — the per-row
    * (no groupBy) formulation of the banded MinHash signature, exact
    * same hash chain as the batch pipeline.
    */
  private def bandKeys = expr(
    s"""transform(sequence(0, ${DedupBands - 1}), b -> named_struct(
       |  'band', b,
       |  'key', xxhash64(
       |    array_min(transform(shs, x -> xxhash64(xxhash64(x), 2 * b))),
       |    array_min(transform(shs, x -> xxhash64(xxhash64(x), 2 * b + 1))))))
       |""".stripMargin)

  /** Static LSH index of the accepted corpus: (band, key, d_ex, shs_ex,
    * sz_ex). At deployment this is a persisted table that appends as
    * documents are accepted; here it is derived from the existing docs.
    */
  def dedupIndex(existing: DataFrame): DataFrame =
    shingleArrays(existing)
      .select(col("doc_id").as("d_ex"), col("shs").as("shs_ex"),
        explode(bandKeys).as("b"))
      .select(col("d_ex"), col("shs_ex"),
        size(col("shs_ex")).as("sz_ex"),
        col("b.band").as("band"), col("b.key").as("key"))

  /** The same streaming-dedup index ASSEMBLED from a persisted
    * DedupQueries.LshIndex artifact (loadLshIndex) instead of
    * re-deriving signatures from the raw corpus: one equi-join of the
    * artifact's bucket rows with its per-doc shingle arrays. The
    * artifact's MinHash chain is bit-identical to [[bandKeys]]
    * (hb = xxhash64(sh); x_i = xxhash64(hb, i); band key = xxhash64
    * over the band's minima — StreamingSpec pins the equality), and
    * array_intersect is order-insensitive, so a stream served from
    * the loaded artifact equals one served from [[dedupIndex]] row
    * for row. This closes the text half of the serve loop: build +
    * append with the batch artifact API, serve the firehose from it.
    */
  def dedupIndexFrom(
      idx: graft.queries.DedupQueries.LshIndex): DataFrame =
    idx.buckets
      .join(idx.arrs, Seq("doc_id"))
      .select(col("doc_id").as("d_ex"), col("arr").as("shs_ex"),
        size(col("arr")).as("sz_ex"), col("band"), col("key"))

  /** Near-dup pairs of an incoming doc frame (batch OR streaming)
    * against a static [[dedupIndex]]: LSH-bucket equi-join → per-row
    * exact Jaccard on the carried shingle arrays → ≥ 0.8 pairs, one row
    * per (d_in, d_ex). Output schema matches q_dedup_incremental.
    */
  /** Near-dup pairs of an incoming EMBEDDING frame (batch OR
    * streaming) against a static cell index
    * (DedupQueries.buildCellIndex / loadCellIndex) — the vector twin
    * of [[dedupIncoming]], and strictly more stream-friendly: each
    * qualifying (incoming, existing) pair emits EXACTLY once (one row
    * per surviving (q, cell) probe × unique cell members), so there
    * is NO collapse aggregate and no state store at all — an in-row
    * probe pass against broadcast index state, then one stream-static
    * join; runs in append mode. The probe rows carry the incoming
    * vector (a re-join by id would be an illegal stream-stream
    * self-join). Exactness: round(cos,4) ≥ τ ⇒ the partner's cell
    * survives the cap filter (the embeddingDedupIncoming proof);
    * StreamingSpec pins stream == batch.
    */
  def dedupIncomingVec(incoming: DataFrame,
      ci: graft.queries.DedupQueries.CellIndex,
      tau: Double): DataFrame = {
    import graft.queries.DedupQueries
    val inc = incoming.select(col("vec_id"), col("embedding"),
      graft.functions.Native.l2NormF(col("embedding")).as("nrm"),
      lit(tau).cast(DoubleType).as("floor"))
    ci.probes(inc, includeOwn = true)
      .join(DedupQueries.maybeBroadcast(
        ci.memVec.select(col("vec_id").as("match_id"), col("cell"),
          col("embedding").as("e2"), col("nrm").as("n2")),
        ci.nVec, DedupQueries.BroadcastHintMaxRows / 8), "cell")
      .withColumn("cos", DedupQueries.pairCosCol(col("e1"), col("n1"),
        col("e2"), col("n2")))
      .filter(col("cos") >= tau)
      .select(col("id1").as("vec_id"), col("match_id"), col("cos"))
  }

  /** Streaming per-query EXACT k-NN against a static cell index — the
    * serving twin of KnnOpsQueries.knnQueryOn, with the same
    * floor/cap exactness proof and the dedupIncomingVec legality
    * recipe: every stage is either a narrow in-row pass against
    * broadcast index state, a stream-static equi-join, or (the one
    * stateful step) a per-query merge whose group is born complete
    * inside a single micro-batch. The batch shape's per-query
    * row_number windows are illegal on a stream, so ranking moves
    * in-row and into the group merge:
    *  1. assign (narrow map) attaches each query's own cell; a
    *     stream-static LEFT join on the √N-row (cell, members-array)
    *     frame brings the whole own cell INTO the row, where the
    *     top-k (cos DESC, nbr ASC — same rounded-4dp cosine, same
    *     tie order as knnQueryOn) computes as an array sort. The
    *     query's floor is its k-th own-cell cosine (null when the
    *     cell holds fewer — or the cell is dead and the left join
    *     found nothing: prune nothing, exactly the batch fallback).
    *  2. CellIndex.probes (narrow flatMap, carrying the query vector)
    *     emits the surviving foreign cells; the same stream-static
    *     join + in-row top-k scores each of them. Keeping only each
    *     cell's top-k loses nothing: a member outside its own cell's
    *     top-k has ≥ k cell-mates ahead of it in the global
    *     (cos DESC, nbr ASC) order too.
    *  3. The per-cell candidate arrays collapse to the final top-k in
    *     flatMapGroupsWithState keyed by query id — all of a query's
    *     candidate rows derive from its one input row, so the group
    *     is complete within its micro-batch; no state is carried
    *     (NoTimeout, never updated) and append mode stays legal.
    * The members-array frame is √N rows (one per live cell, each
    * ~√N wide) — n total bytes but never a pair-sized or n×√n frame;
    * it is memoized on the index (CellIndex.cellMembers) and released
    * by CellIndex.unpersist. StreamingSpec pins stream == knnQueryOn
    * batch output.
    */
  /** The √N-row (cell, members-array) frame the streaming kNN twins
    * join against — memoized ON the index (CellIndex.cellMembers), so
    * repeated serving-query construction reuses ONE persisted frame
    * and CellIndex.unpersist releases it with the index's other
    * caches (the per-call persist this replaced accumulated frames
    * only a global clearCache could free). */
  private def cellMembersOf(
      ci: graft.queries.DedupQueries.CellIndex): DataFrame =
    ci.cellMembers

  /** In-row scored top-k of one cell's member array for one query
    * vector — the shared DedupQueries.topkScoredCol (hoisted in r14 so
    * the batch banded-kNN array path and these stream twins cannot
    * drift apart).
    */
  private def topkCol(k: Int)(ms: Column, e1: Column, n1: Column)
      : Column =
    graft.queries.DedupQueries.topkScoredCol(k)(ms, e1, n1)

  /** Per-query top-k merge in flatMapGroupsWithState: every candidate
    * row derives from one input row, so each group is complete within
    * its micro-batch — no state carried, append mode legal. The merge
    * replays knnQueryOn's (cos DESC, nbr ASC) ranking. */
  private def mergeTopK(cands: Dataset[KnnCand], k: Int)
      : Dataset[KnnHit] = {
    import cands.sparkSession.implicits._
    cands
      .groupByKey(_.qid)
      .flatMapGroupsWithState[CounterState, KnnHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, it: Iterator[KnnCand], _: GroupState[CounterState]) =>
          it.toArray
            .sortWith { (x, y) =>
              val c = java.lang.Double.compare(x.cos, y.cos)
              c > 0 || (c == 0 && x.nbr < y.nbr)
            }
            .take(k)
            .zipWithIndex
            .map { case (c, i) =>
              KnnHit(qid, (i + 1).toLong, c.nbr, c.cos) }
            .iterator
      }
  }

  def knnQueryStream(queries: DataFrame,
      ci: graft.queries.DedupQueries.CellIndex, k: Int)
      : Dataset[KnnHit] = {
    import graft.functions.Native
    val sp = queries.sparkSession
    import sp.implicits._
    val cellArr = cellMembersOf(ci)
    val emptyMs = expr(
      "CAST(array() AS array<struct<nbr:bigint,e2:array<float>,n2:double>>)")
    val own = ci.assign(queries.select(col("vec_id"), col("embedding"),
        Native.l2NormF(col("embedding")).as("nrm")))
      .join(cellArr, Seq("cell"), "left")
      .withColumn("topk", topkCol(k)(coalesce(col("ms"), emptyMs),
        col("embedding"), col("nrm")))
      .withColumn("floor", when(size(col("topk")) >= k,
        element_at(col("topk"), k).getField("cos")))
    val ownCands = own.select(col("vec_id").as("qid"),
        explode(col("topk")).as("c"))
      .select(col("qid"), col("c.nbr").as("nbr"), col("c.cos").as("cos"))
    val crossCands = ci.probes(own.select(col("vec_id"), col("embedding"),
        col("nrm"), col("floor")), includeOwn = false)
      .join(cellArr, Seq("cell"))
      .select(col("id1").as("qid"),
        explode(topkCol(k)(col("ms"), col("e1"), col("n1"))).as("c"))
      .select(col("qid"), col("c.nbr").as("nbr"), col("c.cos").as("cos"))
    mergeTopK(ownCands.unionAll(crossCands).as[KnnCand], k)
  }

  /** Streaming twin of KnnOpsQueries.knnQueryApproxOn — the
    * latency-bounded (nprobe) serving shape on a stream: the shared
    * nprobe probe pass (narrow, vector-carrying, own cell is simply
    * one of the nearest), a stream-static join with the cell-members
    * frame, in-row per-cell top-k, and the same per-query merge.
    * Simpler than the exact twin (no floor, no own/cross split):
    * every query emits exactly nprobe candidate rows of ≤ k hits
    * each, so per-query state and work are hard-capped.
    * IndexLifecycleSpec pins batch-path == knnQueryApproxOn;
    * StreamingSpec pins stream == batch. */
  def knnQueryApproxStream(queries: DataFrame,
      ci: graft.queries.DedupQueries.CellIndex, k: Int, nprobe: Int)
      : Dataset[KnnHit] = {
    val sp = queries.sparkSession
    import sp.implicits._
    val cands = graft.queries.KnnOpsQueries
      .approxProbes(ci, queries, nprobe)
      .join(cellMembersOf(ci), Seq("cell"))
      .select(col("id1").as("qid"),
        explode(topkCol(k)(col("ms"), col("e1"), col("n1"))).as("c"))
      .select(col("qid"), col("c.nbr").as("nbr"), col("c.cos").as("cos"))
    mergeTopK(cands.as[KnnCand], k)
  }

  def dedupIncoming(incoming: DataFrame, index: DataFrame): DataFrame =
    shingleArrays(incoming)
      .select(col("doc_id").as("d_in"), col("shs"),
        explode(bandKeys).as("b"))
      .select(col("d_in"), col("shs"), col("b.band").as("band"),
        col("b.key").as("key"))
      .join(index, Seq("band", "key"))
      .withColumn("inter",
        size(array_intersect(col("shs"), col("shs_ex"))).cast(LongType))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("shs")) + col("sz_ex") - col("inter")))
      .filter(col("jaccard") >= 0.8)
      // multi-band hits collapse here — the one stateful step on a
      // stream; every duplicate row is identical, so first() is exact
      .groupBy("d_in", "d_ex")
      .agg(first(col("inter")).as("inter"),
        first(col("jaccard")).as("jaccard"))
}
