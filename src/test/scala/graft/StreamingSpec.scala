package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.streaming._

/** One CDC changelog entry (the q_cdc_apply schema) for MemoryStream. */
case class CdcRow(key: Long, value: Double, ver: java.sql.Date, seq: Long,
  op: String)

/** SURVEY.md §5.2.4 — stream/batch equivalence: every streaming operator
  * replayed through MemoryStream must agree with its batch twin (the one
  * t2 grades), plus watermark late-data semantics and the custom
  * stateful operator.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventRows: Seq[EvRow] =
    graft.engine.Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts_us")
      .as[EvRow].collect().toSeq.sortBy(e => (e.ts_us.getTime, e.event_id))

  /** Replay rows through MemoryStream in `chunks` micro-batches, apply
    * `transform`, collect via the memory sink. */
  private def runStream(name: String, rows: Seq[EvRow], chunks: Int,
      mode: String)(transform: DataFrame => DataFrame): Array[Row] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[EvRow]
    val q = transform(ms.toDF).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      val size = math.max(1, rows.size / chunks)
      rows.grouped(size).foreach { g => ms.addData(g); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("checkpointed file-source stream survives restart exactly-once") {
    // The operational property every 100 TB ingest pipeline leans on:
    // a file-source stream with a checkpoint, stopped and RESTARTED,
    // must process each input file exactly once — no duplicates from
    // re-reading committed files, no gaps from files that arrived while
    // down. Parquet sink + checkpoint give exactly-once through the
    // sink's commit manifest.
    val base = new java.io.File("/tmp/graft_ckpt_restart")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    val srcDir = s"$base/src"; val sinkDir = s"$base/sink"
    val ckpt = s"$base/ckpt"
    val ev = graft.engine.Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts_us")
    val schema = ev.schema
    val total = ev.count()
    val parts = ev.collect().grouped((total / 4 + 1).toInt).toSeq
    def writeFile(i: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(parts(i).toSeq, 1), schema)
        .write.mode("append").parquet(srcDir)
    def startQ() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckpt)
      .start()
    writeFile(0); writeFile(1)
    val q1 = startQ()
    q1.processAllAvailable(); q1.stop()
    // files arriving while the stream is DOWN
    writeFile(2); writeFile(3)
    val q2 = startQ()
    q2.processAllAvailable(); q2.stop()
    val sunk = spark.read.parquet(sinkDir)
    assert(sunk.count() == total, "restart lost or duplicated rows")
    assert(sunk.select("event_id").distinct().count() == total,
      "restart duplicated event_ids")
  }

  test("tumbling window: stream == batch") {
    val batch = StreamTransforms.tumbling(
      graft.engine.Tables.events(spark, TestSpark.Sf)).collect()
    val stream = runStream("s_tumbling", eventRows, 5, "complete")(
      StreamTransforms.tumbling)
    assert(canon(stream) == canon(batch))
  }

  test("sliding window: stream == batch") {
    val batch = StreamTransforms.sliding(
      graft.engine.Tables.events(spark, TestSpark.Sf)).collect()
    val stream = runStream("s_sliding", eventRows, 5, "complete")(
      StreamTransforms.sliding)
    assert(canon(stream) == canon(batch))
  }

  test("key dedup: stream (doubled replay) == batch") {
    val ev = graft.engine.Tables.events(spark, TestSpark.Sf)
    val batch = StreamTransforms.dedupByKey(ev.unionAll(ev)).collect()
    val doubled = eventRows ++ eventRows
    val stream = runStream("s_dedup", doubled, 6, "append")(
      StreamTransforms.dedupByKey)
    assert(canon(stream) == canon(batch))
  }

  test("mergeable KMV sketch under streaming update mode == batch sketch") {
    // the sketch's merge() is what streaming aggregation state exercises
    // on every micro-batch — replaying the corpus in 7 chunks must land
    // on the SAME bottom-128 sample the one-shot batch aggregate keeps
    import org.apache.spark.sql.functions.{col, md5, udaf}
    val sk = udaf(new graft.functions.KmvAgg(128))
    def sketch(df: DataFrame): DataFrame =
      df.select(col("event_type"),
          md5(col("event_id").cast("string")).as("h"), col("value"))
        .groupBy(col("event_type"))
        .agg(sk(col("h"), col("value")).as("sample"))
    // complete mode: the memory sink holds exactly the final state
    val streamed = runStream("s_kmv", eventRows, 7, "complete")(sketch)
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val batch = sketch(
      graft.engine.Tables.events(spark, TestSpark.Sf)
        .select($"event_id", $"event_type", $"value"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (t, s) =>
      assert(s == batch(t), s"$t: streamed sketch diverges from batch")
    }
  }

  test("stateful aggregation under the RocksDB state store provider") {
    // the 100 TB posture for long-running stateful streams: HDFS-backed
    // in-memory state grows with key cardinality until executors OOM;
    // RocksDB spills state to local disk with bounded heap. Run a
    // stateful twin (tumbling agg + key dedup) end-to-end under the
    // RocksDB provider and require exact agreement with the batch twin —
    // proving the provider is present, loads, and checkpoints correctly
    // in this Spark build, so a deployment can flip the conf without
    // touching query code.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = StreamTransforms.tumbling(
        graft.engine.Tables.events(spark, TestSpark.Sf)).collect()
      val stream = runStream("s_tumbling_rocks", eventRows, 5, "complete")(
        StreamTransforms.tumbling)
      assert(canon(stream) == canon(batch))
      val ev = graft.engine.Tables.events(spark, TestSpark.Sf)
      val batchDedup = StreamTransforms.dedupByKey(ev.unionAll(ev)).collect()
      val streamDedup = runStream("s_dedup_rocks",
        eventRows ++ eventRows, 6, "append")(StreamTransforms.dedupByKey)
      assert(canon(streamDedup) == canon(batchDedup))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming VECTOR dedup against the static cell index: " +
    "stream == batch, stateless append mode") {
    // the embedding twin of the LSH incremental path — no collapse
    // aggregate, no state store: probe pass (carrying the incoming
    // vector) + one stream-static join, append-mode clean
    val ci = graft.queries.DedupQueries.buildCellIndex(
      spark, TestSpark.Sf)
    val incoming = graft.engine.Tables.t(spark, TestSpark.Sf,
        "embeddings")
      .filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val batch = StreamTransforms.dedupIncomingVec(incoming, ci, 0.8)
      .collect()
    // every re-submitted vector matches its own source at cos 1.0
    val selfPairs = batch.filter(r =>
      r.getLong(0) - 100000L == r.getLong(1)).map(_.getDouble(2))
    assert(selfPairs.length == incoming.count() &&
      selfPairs.forall(_ == 1.0),
      s"${selfPairs.length} self matches of ${incoming.count()}")
    val rows = incoming.selectExpr("vec_id",
        "cast(embedding as array<float>) embedding")
      .as[VecRow].collect().toSeq.sortBy(_.vec_id)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[VecRow]
    val q = StreamTransforms.dedupIncomingVec(ms.toDF, ci, 0.8)
      .writeStream.format("memory").queryName("s_dedup_vec")
      .outputMode("append").start()
    try {
      val size = math.max(1, rows.size / 4)
      rows.grouped(size).foreach { g =>
        ms.addData(g); q.processAllAvailable() }
      assert(canon(spark.table("s_dedup_vec").collect()) == canon(batch))
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("streaming kNN serving against the static cell index: " +
    "stream == knnQueryOn batch, per-query merge complete within " +
    "each micro-batch") {
    val ci = graft.queries.DedupQueries.buildCellIndex(
      spark, TestSpark.Sf)
    val incoming = graft.engine.Tables.t(spark, TestSpark.Sf,
        "embeddings")
      .filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    // the EXACT per-query kNN batch surface is the ground truth (it is
    // itself pinned against the exhaustive scan in KnnOpsSpec)
    val batch = graft.queries.KnnOpsQueries.knnQueryOn(ci, incoming, 5)
      .collect()
    assert(batch.nonEmpty)
    // shared-code batch path of the stream function agrees first
    val viaFn = StreamTransforms.knnQueryStream(incoming, ci, 5)
      .toDF.collect()
    assert(canon(viaFn) == canon(batch))
    val rows = incoming.selectExpr("vec_id",
        "cast(embedding as array<float>) embedding")
      .as[VecRow].collect().toSeq.sortBy(_.vec_id)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[VecRow]
    val q = StreamTransforms.knnQueryStream(ms.toDF, ci, 5)
      .toDF.writeStream.format("memory").queryName("s_knn_serve")
      .outputMode("append").start()
    try {
      val size = math.max(1, rows.size / 4)
      rows.grouped(size).foreach { g =>
        ms.addData(g); q.processAllAvailable() }
      assert(canon(spark.table("s_knn_serve").collect()) == canon(batch))
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("streaming APPROX kNN serving (nprobe knob): stream == " +
    "knnQueryApproxOn batch") {
    val ci = graft.queries.DedupQueries.buildCellIndex(
      spark, TestSpark.Sf)
    val incoming = graft.engine.Tables.t(spark, TestSpark.Sf,
        "embeddings")
      .filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val batch = graft.queries.KnnOpsQueries
      .knnQueryApproxOn(ci, incoming, 5, nprobe = 3).collect()
    assert(batch.nonEmpty)
    val viaFn = StreamTransforms.knnQueryApproxStream(
      incoming, ci, 5, nprobe = 3).toDF.collect()
    assert(canon(viaFn) == canon(batch))
    val rows = incoming.selectExpr("vec_id",
        "cast(embedding as array<float>) embedding")
      .as[VecRow].collect().toSeq.sortBy(_.vec_id)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[VecRow]
    val q = StreamTransforms.knnQueryApproxStream(ms.toDF, ci, 5, 3)
      .toDF.writeStream.format("memory").queryName("s_knn_approx")
      .outputMode("append").start()
    try {
      val size = math.max(1, rows.size / 4)
      rows.grouped(size).foreach { g =>
        ms.addData(g); q.processAllAvailable() }
      assert(canon(spark.table("s_knn_approx").collect()) == canon(batch))
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("incremental dedup: incoming stream vs static index == declared batch") {
    val docs = graft.engine.Tables.t(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text")
    val index = StreamTransforms.dedupIndex(
      docs.filter($"doc_id" % 10 =!= 0))
    // the declared batch query is the ground truth (itself DuckDB-
    // oracle-compared); project to the stream function's output schema
    val batch = graft.SparkEntry.queries("q_dedup_incremental")(
      spark, TestSpark.Sf).select("d_in", "d_ex", "inter", "jaccard")
      .collect()
    // sanity: the shared-code batch path of the stream function agrees
    val viaFn = StreamTransforms.dedupIncoming(
      docs.filter($"doc_id" % 10 === 0), index)
      .select("d_in", "d_ex", "inter", "jaccard").collect()
    assert(canon(viaFn) == canon(batch))
    // replay the incoming 10% batch through MemoryStream micro-batches
    val rows = docs.filter($"doc_id" % 10 === 0)
      .as[DocRow].collect().toSeq.sortBy(_.doc_id)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[DocRow]
    val q = StreamTransforms.dedupIncoming(ms.toDF, index)
      .select("d_in", "d_ex", "inter", "jaccard")
      .writeStream.format("memory").queryName("s_dedup_inc")
      .outputMode("complete").start()
    try {
      val size = math.max(1, rows.size / 4)
      rows.grouped(size).foreach { g => ms.addData(g); q.processAllAvailable() }
      assert(canon(spark.table("s_dedup_inc").collect()) == canon(batch))
    } finally q.stop()
  }

  test("stream-static dim join: stream == batch") {
    val cust = graft.engine.Tables.t(spark, TestSpark.Sf, "customer")
    val batch = StreamTransforms.joinDim(
      graft.engine.Tables.events(spark, TestSpark.Sf), cust).collect()
    val stream = runStream("s_joindim", eventRows, 4, "complete")(
      df => StreamTransforms.joinDim(df, cust))
    assert(canon(stream) == canon(batch))
  }

  test("session_window (streaming-native) == gaps-and-islands batch twin") {
    val ev = graft.engine.Tables.events(spark, TestSpark.Sf)
    // native session_window on the same frame (works in batch too — same
    // operator the streaming twin uses)
    val native = ev
      .groupBy(session_window($"ts_us", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("start_ts"),
        $"session_window.end".as("end_w"), $"n_events")
      .collect()
      // session_window's end = last event + gap, truncated to MILLIS by
      // the implementation — normalize to last-event-at-ms for compare.
      .map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2).getTime - 30 * 60 * 1000, r.getLong(3)))
      .toSet
    val batch = StreamTransforms.sessionsBatch(ev)
      .select($"user_id", $"start_ts", $"end_ts", $"n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2).getTime,
        r.getLong(3)))
      .toSet
    assert(native == batch)
  }

  test("stream-stream interval join == batch theta-range join") {
    val batch = SparkEntry.queries("q_join_theta_range")(spark, TestSpark.Sf)
      .collect()
    implicit val ctx = spark.sqlContext
    val msA = MemoryStream[EvRow]
    val msB = MemoryStream[EvRow]
    val q = StreamTransforms.pairsWithin1h(msA.toDF, msB.toDF)
      .writeStream.format("memory").queryName("s_sspairs")
      .outputMode("append").start()
    val stream = try {
      val rows = eventRows
      val size = math.max(1, rows.size / 4)
      rows.grouped(size).foreach { g =>
        msA.addData(g); msB.addData(g); q.processAllAvailable()
      }
      spark.table("s_sspairs").collect()
    } finally q.stop()
    assert(canon(stream) == canon(batch))
  }

  test("watermark drops late data past the 1h delay") {
    def ts(s: String) = Timestamp.valueOf(s)
    def ev(id: Long, t: String) = EvRow(id, 0L, "click", 1.0, ts(t))
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[EvRow]
    val q = StreamTransforms.tumbling(
        ms.toDF.withWatermark("ts_us", "1 hour"))
      .writeStream.format("memory").queryName("s_late")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:00:00"),
        ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // advance watermark to 2024-01-02 23:00 → day-1 window finalized
      ms.addData(ev(4, "2024-01-03 00:00:00"))
      q.processAllAvailable()
      // late: before the watermark → must be DROPPED
      ms.addData(ev(5, "2024-01-01 15:00:00"))
      q.processAllAvailable()
      // flush the rest
      ms.addData(ev(6, "2024-01-05 00:00:00"))
      q.processAllAvailable()
      val day1 = spark.table("s_late").collect()
        .filter(_.getDate(0).toString == "2024-01-01")
      assert(day1.length == 1)
      assert(day1.head.getLong(2) == 3L, "late event must not be counted")
    } finally q.stop()
  }

  test("flatMapGroupsWithState: stream == batch == window formulation") {
    val rows = eventRows
    // streaming run (3 micro-batches, ts order)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[EvRow]
    val q = StreamTransforms.purchasesSinceError(ms.toDS)
      .writeStream.format("memory").queryName("s_state")
      .outputMode("append").start()
    val streamed = try {
      rows.grouped(math.max(1, rows.size / 3)).foreach { g =>
        ms.addData(g); q.processAllAvailable()
      }
      spark.table("s_state").collect()
    } finally q.stop()

    // batch run of the SAME function
    val batch = StreamTransforms.purchasesSinceError(rows.toDS).toDF.collect()

    // independent window-based formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withEpoch = rows.toDS
      .withColumn("err_epoch",
        sum(when($"event_type" === "error", 1L).otherwise(0L)).over(w))
    val wp = Window.partitionBy($"user_id", $"err_epoch")
      .orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = withEpoch
      .withColumn("psn",
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(wp))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"psn".as("purchases_since_error"))
      .collect()

    assert(canon(streamed) == canon(batch))
    assert(canon(batch) == canon(windowed))
  }

  test("cdcApplyStream: out-of-order micro-batched replay == batch cdcApply") {
    val changelog = graft.queries.StreamQueries
      .ordersChangelog(spark, TestSpark.Sf)
    val rows = changelog
      .select($"key".cast("long"), $"value".cast("double"),
        $"ver".cast("date"), $"seq".cast("long"), $"op")
      .as[CdcRow].collect().toSeq
      // deterministic scramble: versions interleave across micro-batches,
      // so updates OLDER than an already-applied delete/update arrive in
      // later batches — the exact late-data case the merge must resolve
      .sortBy(r => scala.util.hashing.byteswap64(r.seq))
    val base = java.nio.file.Files
      .createTempDirectory("graft_cdc_stream").toString
    val target = s"$base/state"
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[CdcRow]
    val q = StreamTransforms.cdcApplyStream(ms.toDF, target,
      s"$base/checkpoint")
    try {
      val size = math.max(1, rows.size / 4)
      rows.grouped(size).foreach { g => ms.addData(g); q.processAllAvailable() }
    } finally q.stop()
    // readers take live rows (op != 'D'); tombstones stay in the state
    val streamed = spark.read.parquet(target)
      .filter($"op" =!= "D")
      .select("key", "value", "ver", "seq", "op").collect()
    val batch = StreamTransforms.cdcApply(changelog)
      .select($"key".cast("long"), $"value".cast("double"),
        $"ver".cast("date"), $"seq".cast("long"), $"op").collect()
    assert(streamed.nonEmpty)
    assert(canon(streamed) == canon(batch))
  }
}
