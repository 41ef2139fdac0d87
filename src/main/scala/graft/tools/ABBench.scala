package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch interleaved A/B harness: this host's wall clock drifts 2-3×
  * across hours (and 1.5× within minutes — measured), so only
  * round-robin medians within ONE session are comparable (the AnnBench
  * methodology). Not part of the driver contract; used for perf work,
  * kept out of SparkEntry.
  */
object ABBench {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.engine.Tables.t(s, dir, name)

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
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.DedupQueries

    // ngram_new: ONE shuffle on the shingle hash + in-row pair
    // generation per shingle group (vs the two-sided hash-led
    // sort-merge self-join of the current ngramPairs)
    def ngramNew(s: SparkSession, dir: String): DataFrame = {
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val shs = sh.join(broadcast(sizes), "doc_id")
      val repPairs = shs
        .groupBy(xxhash64(col("sh")).as("hb"), col("sh"))
        .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
        .select(explode(expr(
          """filter(
            |  flatten(transform(ds, (x, i) ->
            |    transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            |      if(x.doc_id < y.doc_id,
            |         struct(x.doc_id AS r1, y.doc_id AS r2,
            |                x.sz AS sz1, y.sz AS sz2),
            |         struct(y.doc_id AS r1, x.doc_id AS r2,
            |                y.sz AS sz1, x.sz AS sz2))))),
            |  p -> p.sz1 * 5 >= p.sz2 * 4 AND p.sz2 * 5 >= p.sz1 * 4)
            |""".stripMargin)).as("p"))
        .select(col("p.r1").as("r1"), col("p.r2").as("r2"),
          col("p.sz1").as("sz1"), col("p.sz2").as("sz2"))
        .groupBy("r1", "r2", "sz1", "sz2").agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) /
            (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select("r1", "r2", "inter", "jaccard")
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes, "jaccard")
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
    }

    // mj_cached: the verified-LSH pipeline with minhashBuckets fed the
    // PERSISTED shingle frame (it is materialized for verify anyway)
    // instead of re-fusing tokenize→shingle→hash from the scan
    def mjCached(s: SparkSession, dir: String): DataFrame = {
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val repPairs = DedupQueries.verifyJaccard(sh,
        DedupQueries.bucketPairs(DedupQueries.minhashBuckets(sh, 16))
          .select(col("d1").as("r1"), col("d2").as("r2")),
        "r1", "r2")
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes, "jaccard")
        .orderBy("d1", "d2")
    }

    // prefix_new: in-row candidate pair generation per prefix token
    // (prefix tokens are the RAREST grams of each doc by construction,
    // so groups are small) instead of the prefix-prefix self-join
    def prefixNew(s: SparkSession, dir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("dfq"))
      val ranked = sh.join(dfreq, "sh")
        .join(broadcast(sizes), "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("dfq"), col("sh"))))
      val prefix = ranked
        .filter(col("rk") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
        .select("doc_id", "sh", "sz")
      val cands = prefix
        .groupBy(xxhash64(col("sh")).as("hb"), col("sh"))
        .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
        .select(explode(expr(
          """filter(
            |  flatten(transform(ds, (x, i) ->
            |    transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            |      if(x.doc_id < y.doc_id,
            |         struct(x.doc_id AS r1, y.doc_id AS r2,
            |                x.sz AS sz1, y.sz AS sz2),
            |         struct(y.doc_id AS r1, x.doc_id AS r2,
            |                y.sz AS sz1, x.sz AS sz2))))),
            |  p -> p.sz1 * 5 >= p.sz2 * 4 AND p.sz2 * 5 >= p.sz1 * 4)
            |""".stripMargin)).as("p"))
        .select(col("p.r1").as("r1"), col("p.r2").as("r2"),
          col("p.sz1").as("sz1"), col("p.sz2").as("sz2"))
        .distinct()
      val shh = sh.withColumn("hb", xxhash64(col("sh")))
      val repPairs = cands
        .join(shh.select(col("doc_id").as("r1"), col("hb"), col("sh")), "r1")
        .join(shh.select(col("doc_id").as("rb"), col("hb").as("hb2"),
          col("sh").as("sh2")),
          col("r2") === col("rb") && col("hb") === col("hb2") &&
            col("sh") === col("sh2"))
        .groupBy("r1", "r2", "sz1", "sz2").agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) /
            (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select("r1", "r2", "inter", "jaccard")
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes, "jaccard")
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
    }

    // prefix_v2: hash-led dfreq join + docArr verify (per-doc sorted
    // shingle arrays, in-row array_intersect) — replaces the two
    // full-frame verify shuffles with one grouped shuffle + two joins
    // against the doc-sized array frame
    def prefixV2(s: SparkSession, dir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val shh = sh.withColumn("hb", xxhash64(col("sh")))
      val dfreq = shh.groupBy("hb", "sh").agg(count(lit(1)).as("dfq"))
      val ranked = shh.join(dfreq, Seq("hb", "sh"))
        .join(broadcast(sizes), "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("dfq"), col("sh"))))
      val prefix = ranked
        .filter(col("rk") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
        .select("doc_id", "hb", "sh", "sz")
        .persist()
      val cands = prefix.select(col("doc_id").as("r1"), col("hb"),
          col("sh"), col("sz").as("sz1"))
        .join(prefix.select(col("doc_id").as("r2"), col("hb").as("hb2"),
          col("sh").as("sh2"), col("sz").as("sz2")),
          col("hb") === col("hb2") && col("sh") === col("sh2") &&
            col("r1") < col("r2") &&
            col("sz1") * 5 >= col("sz2") * 4 &&
            col("sz2") * 5 >= col("sz1") * 4)
        .select("r1", "r2", "sz1", "sz2").distinct()
      val docArr = sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("sh"))).as("arr"))
      val repPairs = cands
        .join(docArr.select(col("doc_id").as("r1"), col("arr").as("a1")),
          "r1")
        .join(docArr.select(col("doc_id").as("r2"), col("arr").as("a2")),
          "r2")
        .withColumn("inter",
          size(array_intersect(col("a1"), col("a2"))).cast(LongType))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) /
            (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select("r1", "r2", "inter", "jaccard")
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes, "jaccard")
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
    }

    // mj_v2: verified-LSH pipeline with the docArr verify stage
    def mjV2(s: SparkSession, dir: String): DataFrame = {
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val cand = DedupQueries.bucketPairs(
        DedupQueries.minhashBuckets(sh, 16))
        .select(col("d1").as("r1"), col("d2").as("r2"))
      val docArr = sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("sh"))).as("arr"))
      val repPairs = broadcast(cand)
        .join(docArr.select(col("doc_id").as("r1"), col("arr").as("a1")),
          "r1")
        .join(docArr.select(col("doc_id").as("r2"), col("arr").as("a2")),
          "r2")
        .join(broadcast(sizes.select(col("doc_id").as("r1"),
          col("sz").as("sz1"))), "r1")
        .join(broadcast(sizes.select(col("doc_id").as("r2"),
          col("sz").as("sz2"))), "r2")
        .withColumn("inter",
          size(array_intersect(col("a1"), col("a2"))).cast(LongType))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) /
            (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("r1"), col("r2"), col("inter"), col("jaccard"))
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes, "jaccard")
        .orderBy("d1", "d2")
    }

    // textGroups with groups/members persisted: the md5 scan+groupBy
    // subtree otherwise recomputes per consumer (repToG x2, members x2,
    // selfPairs) in every expandRepPairs call
    def textGroupsP(s: SparkSession, dir: String) = {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), md5(col("text")).as("gkey"))
      val groups = docs.groupBy("gkey")
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("gn"))
        .persist()
      val members = docs.select("gkey", "doc_id").persist()
      val repDocs = docs.join(groups.select(col("gkey"),
          col("rep").as("doc_id")), Seq("gkey", "doc_id"))
        .select("doc_id", "text").persist()
      (groups, members, repDocs)
    }
    def ngramTgPersist(s: SparkSession, dir: String): DataFrame = {
      val (groups, members, repDocs) = textGroupsP(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val shs = sh.join(broadcast(sizes), "doc_id")
      val repPairs = shs
        .groupBy(xxhash64(col("sh")).as("hb"), col("sh"))
        .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
        .select(explode(expr(
          """filter(
            |  flatten(transform(ds, (x, i) ->
            |    transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            |      if(x.doc_id < y.doc_id,
            |         struct(x.doc_id AS r1, y.doc_id AS r2,
            |                x.sz AS sz1, y.sz AS sz2),
            |         struct(y.doc_id AS r1, x.doc_id AS r2,
            |                y.sz AS sz1, x.sz AS sz2))))),
            |  p -> p.sz1 * 5 >= p.sz2 * 4 AND p.sz2 * 5 >= p.sz1 * 4)
            |""".stripMargin)).as("p"))
        .select(col("p.r1").as("r1"), col("p.r2").as("r2"),
          col("p.sz1").as("sz1"), col("p.sz2").as("sz2"))
        .groupBy("r1", "r2", "sz1", "sz2").agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) /
            (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select("r1", "r2", "inter", "jaccard")
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes, "jaccard")
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
    }
    // knn_nofloor: the pre-round-10 vote-tail shape — NO in-row l5
    // floor filter on the scored candidates, full ~n² rows into the
    // WindowGroupLimit sort
    def knnNoFloor(s: SparkSession, dir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.{KnnOpsQueries => KQ}
      val ci = DedupQueries.buildCellIndex(s, dir)
      val cap = DedupQueries.BroadcastHintMaxRows / 8
      def bcWide(df: DataFrame) = DedupQueries.maybeBroadcast(df, ci.nVec, cap)
      def bcSkinny(df: DataFrame) = DedupQueries.maybeBroadcast(df, ci.nVec, cap * 8)
      def pairCos(e1: org.apache.spark.sql.Column,
          n1: org.apache.spark.sql.Column,
          e2: org.apache.spark.sql.Column,
          n2: org.apache.spark.sql.Column) =
        DedupQueries.pairCosCol(e1, n1, e2, n2).as("cos")
      val memVec = ci.memVec
      val withinHalf = memVec
        .select(col("vec_id").as("id1"), col("cell"),
          col("embedding").as("e1"), col("nrm").as("n1"))
        .join(bcWide(memVec.select(col("vec_id").as("id2"),
          col("cell").as("c2"), col("embedding").as("e2"),
          col("nrm").as("n2"))),
          col("cell") === col("c2") && col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          pairCos(col("e1"), col("n1"), col("e2"), col("n2")))
        .persist()
      val withinDir = withinHalf.unionAll(withinHalf.select(
        col("id2").as("id1"), col("id1").as("id2"), col("cos")))
      val l5 = withinDir.withColumn("rk", row_number().over(
          Window.partitionBy("id1").orderBy(col("cos").desc, col("id2"))))
        .filter(col("rk") === 5)
        .select(col("id1").as("vec_id"), col("cos").as("l5"))
      val probes = ci.probes(ci.vn
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .join(bcSkinny(l5), Seq("vec_id"), "left")
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("l5").as("floor")))
      val crossDir = probes
        .join(bcWide(memVec.select(col("vec_id").as("id1"),
          col("embedding").as("e1"), col("nrm").as("n1"))), "id1")
        .join(bcWide(memVec.select(col("vec_id").as("id2"), col("cell"),
          col("embedding").as("e2"), col("nrm").as("n2"))), "cell")
        .select(col("id1"), col("id2"),
          pairCos(col("e1"), col("n1"), col("e2"), col("n2")))
      KQ.knnVoteTail(withinDir.unionAll(crossDir),
        bcSkinny(ci.vn.select(col("vec_id"), col("label"))))
    }

    // topk_old: the round-10 banded top-k floor — k-th best of ALL
    // within-cell pairs, forcing the full within self-join to
    // materialize (persisted) before the probe pass can start
    def topkOldFloor(s: SparkSession, dir: String): DataFrame = {
      val ci = DedupQueries.buildCellIndex(s, dir)
      def bcWide(df: DataFrame): DataFrame =
        DedupQueries.maybeBroadcast(df, ci.nVec,
          DedupQueries.BroadcastHintMaxRows / 8)
      val within = ci.memVec
        .select(col("vec_id").as("id1"), col("cell"),
          col("embedding").as("e1"), col("nrm").as("n1"))
        .join(bcWide(ci.memVec.select(col("vec_id").as("id2"),
          col("cell").as("c2"), col("embedding").as("e2"),
          col("nrm").as("n2"))),
          col("cell") === col("c2") && col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          DedupQueries.pairCosCol(col("e1"), col("n1"),
            col("e2"), col("n2")).as("cos"))
        .persist()
      val floorRow = within
        .orderBy(col("cos").desc, col("id1"), col("id2")).limit(10)
        .agg(min(col("cos")).as("floor"), count(lit(1)).as("nw"))
        .head()
      val floorOpt: Option[Double] =
        if (floorRow.getLong(1) < 10) None
        else Some(floorRow.getDouble(0))
      val probes = ci.probes(ci.vn.select(col("vec_id"),
        col("embedding"), col("nrm"),
        floorOpt.map(lit(_)).getOrElse(lit(null))
          .cast(DoubleType).as("floor")))
      val cross = probes
        .join(bcWide(ci.memVec.select(col("vec_id").as("id2"),
          col("cell"), col("embedding").as("e2"),
          col("nrm").as("n2"))), Seq("cell"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          DedupQueries.pairCosCol(col("e1"), col("n1"),
            col("e2"), col("n2")).as("cos"))
      within.unionAll(cross)
        .orderBy(col("cos").desc, col("id1"), col("id2"))
        .limit(10)
    }

    // cp_old: the round-10 containment-prefix candidate stage — no
    // positional filter, distinct() instead of the bounding groupBy,
    // count-guarded hint on the verify join (its one winning site)
    def cpOld(s: SparkSession, dir: String, shjHint: Boolean = false)
        : DataFrame = {
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("dfq"))
      val docArr = sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("dfq"), col("sh"))))
          .as("fa"))
        .select(col("doc_id"),
          expr("transform(fa, x -> x.sh)").as("arr"),
          expr("slice(fa, 1, size(fa) - (9 * size(fa) + 9) div 10 + 1)")
            .as("pa"))
        .persist()
      val prefix = docArr
        .select(col("doc_id").as("dp"),
          size(col("arr")).cast(LongType).as("szp"),
          explode(col("pa")).as("p"))
        .select(col("dp"), xxhash64(col("p.sh")).as("hb"),
          col("p.sh").as("sh"), col("szp"))
      val full = docArr
        .select(col("doc_id").as("dq"), size(col("arr")).cast(LongType)
          .as("szq"), explode(col("arr")).as("sh2"))
        .withColumn("hb2", xxhash64(col("sh2")))
      val cands = prefix.join(full,
          col("hb") === col("hb2") && col("sh") === col("sh2") &&
            col("dp") =!= col("dq") && col("szp") <= col("szq"))
        .select(least(col("dp"), col("dq")).as("r1"),
          greatest(col("dp"), col("dq")).as("r2"))
        .distinct()
      val candsH = if (shjHint) cands.hint("shuffle_hash") else {
        val c = cands.persist()
        DedupQueries.maybeBroadcast(c, c.count())
      }
      val repPairs = candsH
        .join(docArr.select(col("doc_id").as("r1"), col("arr").as("a1")),
          "r1")
        .join(docArr.select(col("doc_id").as("r2"), col("arr").as("a2")),
          "r2")
        .withColumn("inter",
          size(array_intersect(col("a1"), col("a2"))).cast(LongType))
        .withColumn("containment", col("inter").cast(DoubleType) /
          least(size(col("a1")), size(col("a2"))))
        .filter(col("containment") >= 0.9)
        .select("r1", "r2", "inter", "containment")
      val sizes = docArr.select(col("doc_id"),
        size(col("arr")).cast(LongType).as("sz"))
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes,
          "containment")
        .select(col("d1"), col("d2"), col("inter"), col("containment"))
        .orderBy("d1", "d2")
    }

    // build_old: the round-10 cell-index bookkeeping — full-scan
    // vn.count() (deserializes every embedding into the cache) +
    // takeOrdered + a groupBy(cell) radii aggregate job with its
    // √N-keyed exchange
    def buildOld(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      val vn = t(s, dir, "embeddings").select(col("vec_id"),
          col("label"), col("embedding"),
          graft.functions.Native.l2NormF(col("embedding")).as("nrm"))
        .persist()
      val nVec = vn.count()
      val nCells = math.max(16, math.ceil(math.sqrt(nVec.toDouble)).toInt)
      val centroids = vn
        .select(xxhash64(col("vec_id")).as("mix"), col("vec_id"),
          col("embedding"), col("nrm"))
        .as[(Long, Long, Array[Float], Double)]
        .rdd
        .takeOrdered(nCells)(Ordering.by(t => (t._1, t._2)))
        .map(t => (t._2, t._3, t._4))
      val bcCent = s.sparkContext.broadcast(centroids)
      val memVec = vn.select(col("vec_id"), col("embedding"), col("nrm"))
        .as[(Long, Array[Float], Double)]
        .mapPartitions { it =>
          val cs = bcCent.value
          it.map { case (id, e, n1) =>
            val cos = new Array[Double](cs.length)
            var i = 0
            while (i < cs.length) {
              val ce = cs(i)._2
              var acc = 0.0
              var j = 0
              while (j < e.length) {
                acc += e(j).toDouble * ce(j).toDouble; j += 1 }
              cos(i) = acc / (n1 * cs(i)._3); i += 1
            }
            var bestCid = Long.MaxValue
            var bestCos = Double.NegativeInfinity
            var first = true
            i = 0
            while (i < cs.length) {
              val cmp = java.lang.Double.compare(cos(i), bestCos)
              if (first || cmp > 0 || (cmp == 0 && cs(i)._1 < bestCid)) {
                bestCos = cos(i); bestCid = cs(i)._1; first = false }
              i += 1
            }
            (id, bestCid,
              math.acos(math.min(1.0, math.max(-1.0, bestCos))), e, n1)
          }
        }.toDF("vec_id", "cell", "own_theta", "embedding", "nrm")
        .persist()
      val radii = memVec.groupBy("cell")
        .agg(max(col("own_theta")).as("r"))
        .as[(Long, Double)]
        .collect()
      val _ = (s.sparkContext.broadcast(radii.toMap), nVec)
      memVec
    }

    // round-11 A/B: reworked index bookkeeping (metadata count +
    // fused shuffle-free stats) vs the round-10 build, build-only —
    // plus the driver-window spike set (q_ts_anomaly / q_tpch_q11 /
    // q_stats_gini / q_tpch_q2 hit 30-46× single-sample spikes in the
    // round-10 driver run): 5+ consecutive same-JVM samples each, to
    // separate code-side allocation pathology (would repeat here)
    // from host noise (would not)
    // round-13 spike cluster (judge #5): the r12 driver window spiked
    // q_ts_delta_stats 22×, q_ts_forecast_snaive 14×, q_tpch_q17 13×
    // — they join the consecutive-sample in-process profile alongside
    // the standing q_tpch_q19 canary. (The r11/r12 set was
    // q_ts_anomaly / q_tpch_q11 / q_stats_gini / q_tpch_q2.)
    val spikeSet = Seq("q_ts_delta_stats", "q_ts_forecast_snaive",
      "q_tpch_q17", "q_tpch_q19")
    val nbOld: (SparkSession, String) => DataFrame = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val Dec6 = DecimalType(18, 6)
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val ttoks = train.select(col("lang"),
        explode(split(col("text"), " ")).as("term"))
      val cls = ttoks.groupBy("lang").agg(count(lit(1)).as("tot_l"))
      val nd = train.groupBy("lang").agg(count(lit(1)).as("n_docs_l"))
      val vc = ttoks.agg(countDistinct(col("term")).as("v"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cls5 = cls.join(nd, "lang")
        .withColumn("n_train", sum(col("n_docs_l")).over(all))
        .crossJoin(broadcast(vc))
        .withColumn("logprior", round(log(
          col("n_docs_l").cast(DoubleType) / col("n_train")), 6))
      val cnt = ttoks.groupBy("term", "lang").agg(count(lit(1)).as("c"))
      val logp = ttoks.select("term").distinct()
        .crossJoin(broadcast(cls5.select("lang", "tot_l", "v")))
        .join(cnt, Seq("term", "lang"), "left")
        .withColumn("logp", round(log(
          (coalesce(col("c"), lit(0L)) + lit(1.0)) /
            (col("tot_l") + col("v"))), 6))
        .select("term", "lang", "logp")
      val stoks = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang").as("lang_actual"),
          explode(split(col("text"), " ")).as("term"))
      stoks.join(logp, "term")
        .groupBy("doc_id", "lang_actual", "lang")
        .agg(sum(col("logp").cast(Dec6)).as("sum_logp"))
        .join(broadcast(cls5.select(col("lang"), col("logprior"))), "lang")
        .withColumn("score", col("sum_logp") + col("logprior").cast(Dec6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang_actual"),
          col("lang").as("lang_pred"),
          col("score").cast(StringType).cast(DoubleType).as("score"))
        .orderBy("doc_id")
    }

    // default legs = the latest A/B (edit in place per experiment);
    // AB_SPIKES=1 appends the driver-window spike set for consecutive
    // single-sample profiling
    //
    // round-12 experiment 1 (judge #1/#7), RESULT in SCALING.md
    // Addendum 19: the four untouched-code ~2x r11 bench movers
    // interleaved with three window anchors + q_tpch_q19 — all four
    // movers measured at/below their r10 shape once anchor-adjusted
    // (noise confirmed), q_tpch_q19 max-of-7 1.55x median.
    val exp1 = Seq("q_ml_knn_accuracy", "q_feat_cov",
      "q_sim_cosine_topk", "q_stream_pair_join",
      "q_ts_anomaly", "q_tpch_q11", "q_stats_gini", "q_tpch_q19")

    // round-12 experiment 2 (judge #2): the prefix-family verify
    // payload. Incumbent = count-guarded broadcast of the pair-id
    // list + per-pair array_intersect on the wide sorted arrays.
    // Challenger A (cp_cnt) = the judge's grouped COUNT over the
    // exploded candidate×shingle equi-join (skinny rows, no wide
    // arrays through any exchange). Challenger B (merge) = same join
    // shape as the incumbent but the codegen'd sorted-merge intersect
    // SIZE (no hash set, no intersected-array allocation).
    def cpCnt(s: SparkSession, dir: String): DataFrame = {
      val (groups, members, repDocs) = DedupQueries.textGroups(s, dir)
      val sh = DedupQueries.shinglesOf(repDocs).persist()
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("dfq"))
      val docArr = sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("dfq"), col("sh"))))
          .as("fa"))
        .select(col("doc_id"),
          expr("transform(fa, x -> x.sh)").as("arr"),
          expr("slice(fa, 1, size(fa) - (9 * size(fa) + 9) div 10 + 1)")
            .as("pa"))
        .persist()
      val prefix = docArr
        .select(col("doc_id").as("dp"),
          size(col("arr")).cast(LongType).as("szp"),
          explode(col("pa")).as("p"))
        .select(col("dp"), xxhash64(col("p.sh")).as("hb"),
          col("p.sh").as("sh"), col("szp"))
      val full = docArr
        .select(col("doc_id").as("dq"), size(col("arr")).cast(LongType)
          .as("szq"), explode(col("arr")).as("sh2"))
        .withColumn("hb2", xxhash64(col("sh2")))
      val cands = prefix.join(full,
          col("hb") === col("hb2") && col("sh") === col("sh2") &&
            col("dp") =!= col("dq") && col("szp") <= col("szq"))
        .select(least(col("dp"), col("dq")).as("r1"),
          greatest(col("dp"), col("dq")).as("r2"))
        .distinct()
      val c = cands.persist()
      val candsH = DedupQueries.maybeBroadcast(c, c.count())
      // verify: count matched shingles per pair over the HASHED
      // skinny stream — no array column crosses an exchange
      val shh = sh.withColumn("hb", xxhash64(col("sh")))
      val inter = candsH
        .join(shh.select(col("doc_id").as("r1"), col("hb"),
          col("sh")), "r1")
        .join(shh.select(col("doc_id").as("rb"), col("hb").as("hb2"),
          col("sh").as("sh2")),
          col("r2") === col("rb") && col("hb") === col("hb2") &&
            col("sh") === col("sh2"))
        .groupBy("r1", "r2").agg(count(lit(1)).as("inter"))
      val sizes = docArr.select(col("doc_id"),
        size(col("arr")).cast(LongType).as("sz"))
      val repPairs = inter
        .join(broadcast(sizes.select(col("doc_id").as("r1"),
          col("sz").as("sz1"))), "r1")
        .join(broadcast(sizes.select(col("doc_id").as("r2"),
          col("sz").as("sz2"))), "r2")
        .withColumn("containment", col("inter").cast(DoubleType) /
          least(col("sz1"), col("sz2")))
        .filter(col("containment") >= 0.9)
        .select("r1", "r2", "inter", "containment")
      DedupQueries.expandRepPairs(repPairs, groups, members, sizes,
          "containment")
        .select(col("d1"), col("d2"), col("inter"), col("containment"))
        .orderBy("d1", "d2")
    }
    // exp2 result (7 interleaved rounds): cp_cnt 3.89 s vs incumbent
    // 2.53 — the exploded grouped-count verify REFUTED decisively
    // (the skinny stream pays two candidate-sized exchanges where the
    // incumbent pays none). exp2b below re-ran the merge package
    // after fixing its lexicographic-order precondition (the first
    // run's merge legs were invalid: fa is (dfq,sh)-ordered).
    val _ = cpCnt _
    // exp2b result: the merge walk LOSES on the prefix family too
    // (cp 3.24 vs 2.98, pf 3.07 vs 2.70 — the in-row lexicographic
    // re-sort its precondition needs costs more than the hash set it
    // saves). Incumbent kept, defaults false.
    //
    // exp3: (a) the banded-kNN index WITHOUT the vn cache (memVec
    // carries every probe/serving column; labels re-scan
    // column-pruned parquet) vs the incumbent build; (b) the merge
    // walk on verifyJaccard/incrementalDedupOn, whose arrays are
    // ALREADY lexicographic — no re-sort, pure CPU swap.
    // exp3 result (7 rounds): bk_novn 2.62 vs bk_inc 3.78 (-31% —
    // the vn cache build is pure cost once memVec feeds the probes),
    // mv_merge 2.68 vs 3.40 (-21%), inc_merge 1.42 vs 1.58 (-10%) —
    // the walk wins wherever the arrays are born lexicographic.
    // exp3b: the other two banded operators + dedup components on the
    // vn-less index / merge defaults, incumbent vs challenger.
    // exp3b result (7 rounds): tk_novn 1.14 vs 1.96 (-42%), cc_merge
    // 3.12 vs 4.02 (-22%); ed_novn 0.71 vs 0.64 tied-to-slightly-worse
    // because repExpandEmbedding still read vn — exp3c re-runs the ed
    // pair after switching its ids source to memVec (vn-free path).
    // exp3c result: ed ties once repExpandEmbedding reads memVec
    // (0.73 novn vs 0.77). exp4 = post-closing-bench confirmation:
    // the r12 closing window showed the touched family ELEVATED vs
    // r11's bench samples — re-interleave the adopted defaults
    // against the incumbent shapes to separate adoption effect from
    // the documented per-query window drift.
    // exp4 REVERSED exp3's verdicts at 30-45% amplitude with tight
    // spreads — both "interleaved" runs put each pair's variants in
    // ADJACENT slots, and in every reversing pair the SECOND slot
    // won: near-identical variants share whole-stage-codegen
    // compilation, so the successor skips janino. The protocol fix is
    // COUNTERBALANCING: each variant occupies both slots equally, so
    // adjacency reuse cancels in the per-variant median. exp5 runs
    // the three contested pairs that way (x1/x2 are the same function
    // registered at both positions; read the combined median).
    val bkNew = () => graft.queries.KnnOpsQueries
      .bandedKnnAccuracy(spark, sfDir)
    val bkOld = () => graft.queries.KnnOpsQueries
      .bandedKnnAccuracyOn(
        DedupQueries.buildCellIndex(spark, sfDir, persistVn = true))
    val mvNew = () => DedupQueries.minhashVerifiedPairs(spark, sfDir)
    val mvOld = () => DedupQueries.minhashVerifiedPairs(
      spark, sfDir, mergeIntersect = false)
    val ccNew = () => DedupQueries.componentReps(spark, sfDir)
    val ccOld = () => DedupQueries.componentReps(spark, sfDir,
      mergeVerify = false)
    // duo protocol: [X, X] back-to-back, read ONLY the second slot
    // (self-warmed codegen — the repeated-serving regime and what the
    // driver's median-of-3 approximates); cross-pair adjacency then
    // only affects the ignored first slots.
    // exp5 (duo protocol) verdicts: bk OLD wins warm-vs-warm (1.89
    // vs 2.24 — exp3's novn "win" was the adjacency artifact); mv and
    // cc are TIES (2.25/2.16, 2.43/2.41). exp6 re-runs the remaining
    // exp3 adoptions under the fixed protocol: topk + embedding-dedup
    // persistVn pairs, incremental-dedup merge pair.
    val tkNew = () => DedupQueries.cosineTopKBandedOn(
      DedupQueries.buildCellIndex(spark, sfDir, persistVn = false), 10)
    val tkOld = () => DedupQueries.cosineTopKBandedOn(
      DedupQueries.buildCellIndex(spark, sfDir, persistVn = true), 10)
    val edNew = () => DedupQueries.embeddingDedupBandedOn(
      DedupQueries.buildCellIndex(spark, sfDir, persistVn = false), 0.40)
    val edOld = () => DedupQueries.embeddingDedupBandedOn(
      DedupQueries.buildCellIndex(spark, sfDir, persistVn = true), 0.40)
    def incWith(merge: Boolean) = () => {
      import graft.engine.Tables
      val docs = Tables.t(spark, sfDir, "documents")
        .select("doc_id", "text")
      DedupQueries.incrementalDedupOn(
        DedupQueries.buildLshIndex(docs.filter(col("doc_id") % 10 =!= 0)),
        docs.filter(col("doc_id") % 10 === 0), mergeIntersect = merge)
    }
    // exp6 verdicts (duo): tk 0.80 new vs 0.78 old = tie, ed 0.51 vs
    // 0.46 slight old edge, inc 1.10 vs 1.10 tie — incumbents kept.
    // exp7: (a) shared-broadcast-side banded kNN (ReuseExchange, one
    // wide broadcast build instead of two) vs the two-broadcast
    // incumbent; (b) duo RE-CHECK of Addendum 18 #7's build
    // bookkeeping win (flagged: it was measured adjacent-slot).
    // (the shared-side variant was reverted after the exp7 tie — see
    // the negative-result note at bandedKnnAccuracyOn; both legs now
    // resolve to the incumbent shape)
    val bkrNew = () => graft.queries.KnnOpsQueries
      .bandedKnnAccuracy(spark, sfDir)
    val bkrOld = () => graft.queries.KnnOpsQueries
      .bandedKnnAccuracyOn(DedupQueries.buildCellIndex(spark, sfDir))
    val boNew = () => DedupQueries.buildCellIndex(spark, sfDir).memVec
    val boOld = () => buildOld(spark, sfDir)
    // exp7 results: bkr shared-vs-per-join broadcast side = dead tie
    // (2.42 vs 2.44; reverted — the persist boundary precludes reuse);
    // bo bookkeeping win REPLICATES under duo (0.60 vs 0.69) — flag
    // closed. exp8: duo re-check of the LAST small-margin
    // adjacent-slot win still shipped (Addendum 18 #6, the banded
    // top-k densest-cells floor, 1.28-vs-1.50 measured adjacent).
    val _ = (bkrNew, bkrOld, boNew, boOld)
    val tkfNew = () => DedupQueries.cosineTopKBanded(spark, sfDir, 10)
    val tkfOld = () => topkOldFloor(spark, sfDir)
    val _ = (tkfNew, tkfOld)
    // exp9 (round 13): everything below runs DUO ([X_A, X_B]
    // back-to-back; read ONLY the B slot — self-warmed codegen).
    // (a) judge #1/#8: noise adjudication of the two untouched-code
    //     budget movers — q_dedup_near_ngram (1.94 r11-final →
    //     2.78/2.48 in the two r12 windows) and q_rec_item_neighbors
    //     (1.70 → 1.89/1.82) — against three duo'd window anchors
    //     (q_tpch_q11 / q_stats_gini / q_ts_anomaly, r11-final
    //     1.149/0.527/0.354, r12-final 0.977/0.419/0.354): anchor
    //     ratio vs the final-bench values gives the window factor,
    //     movers compare anchor-adjusted vs their r11 shape.
    // (b) judge #3: duo sweep of the pre-duo adjacent-slot shipped
    //     wins — the r10 verify-hint drops (Addendum 17 #2:
    //     minhash_jaccard 2.46-vs-2.84, prefix_filter 2.58-vs-2.86,
    //     components 2.87-vs-3.53) and the r11 AQE-width partitioner
    //     (Addendum 18 #5: counted 4.10 vs flat 5.16; shipped
    //     AQE-width 3.51 vs counted 3.54). Incumbent = defaults;
    //     old shape via the kept toggles.
    // (c) judge #5: spikeSet singles appended for the max-of-rounds
    //     consecutive-sample profile.
    def q(name: String) = () =>
      graft.SparkEntry.queries(name)(spark, sfDir)
    val mv9I = () => DedupQueries.minhashVerifiedPairs(spark, sfDir)
    val mv9O = () => DedupQueries.minhashVerifiedPairs(spark, sfDir,
      hintCands = true)
    val pf9I = () => DedupQueries.prefixFilterPairs(spark, sfDir)
    val pf9O = () => DedupQueries.prefixFilterPairs(spark, sfDir,
      hintCands = true)
    val cc9I = () => DedupQueries.componentReps(spark, sfDir)
    val cc9H = () => DedupQueries.componentReps(spark, sfDir,
      hintCands = true)
    val cc9P = () => DedupQueries.componentReps(spark, sfDir,
      countSizedParts = true)
    // exp10 (round-13 OPTIMIZATION round, AB_EXP=r13opt) — NEGATIVE
    // RESULT, challenger bodies deleted in r14 (they duplicated the
    // declared naiveBayes/qualityLm2/keywordExtract/bpeEncode/tfidf
    // bodies verbatim and would silently drift; the full record lives
    // in OPTIMIZATION_r13.md "broadcast-hint hypothesis"): the
    // hypothesized corpus-stream exchange in the five text-model
    // scoring joins does not exist at bench scale — every scoring join
    // the challengers would hint is ALREADY a BroadcastHashJoin in the
    // incumbent plans (plans/r13/*_before.txt), so a gated-broadcast
    // hint has nothing to remove and timing would only measure noise.
    // To rebuild a challenger, wrap the model side of the declared
    // query body in Tables.underDimGate(spark, sfDir, "documents") ?
    // broadcast(_) : identity — hint-only, results identical by
    // construction. The r13opt legs below are exp11, the lineage-cut
    // family the plan audit surfaced instead (PlanAudit: bpe_encode 9
    // parquet scans, naive_bayes 9, quality_lm2 3 — multi-consumer
    // bounded frames re-deriving their corpus prefix; the kmeans
    // cutLineage precedent applied).
    import graft.queries.{TextQueries => TQ, SearchStatsQueries => SSQ,
      AnalyticsQueries => AQ}
    val r13opt: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "beI_A" -> (() => TQ.bpeEncode(spark, sfDir, cutSteps = false)),
      "beI_B" -> (() => TQ.bpeEncode(spark, sfDir, cutSteps = false)),
      "beC_A" -> (() => TQ.bpeEncode(spark, sfDir, cutSteps = true)),
      "beC_B" -> (() => TQ.bpeEncode(spark, sfDir, cutSteps = true)),
      "btI_A" -> (() => TQ.bpeTrain(spark, sfDir, cutSteps = false)),
      "btI_B" -> (() => TQ.bpeTrain(spark, sfDir, cutSteps = false)),
      "btC_A" -> (() => TQ.bpeTrain(spark, sfDir, cutSteps = true)),
      "btC_B" -> (() => TQ.bpeTrain(spark, sfDir, cutSteps = true)),
      "nbI_A" -> (() => SSQ.naiveBayes(spark, sfDir, cutModel = false)),
      "nbI_B" -> (() => SSQ.naiveBayes(spark, sfDir, cutModel = false)),
      "nbC_A" -> (() => SSQ.naiveBayes(spark, sfDir, cutModel = true)),
      "nbC_B" -> (() => SSQ.naiveBayes(spark, sfDir, cutModel = true)),
      "lmI_A" -> (() => AQ.qualityLm2(spark, sfDir, cutModel = false)),
      "lmI_B" -> (() => AQ.qualityLm2(spark, sfDir, cutModel = false)),
      "lmC_A" -> (() => AQ.qualityLm2(spark, sfDir, cutModel = true)),
      "lmC_B" -> (() => AQ.qualityLm2(spark, sfDir, cutModel = true)),
    )
    // AB_EXP=ng2: the SECOND ng window (judge #1 needs min-of-windows
    // — the first exp9 window ran the whole dedup family 1.25-1.42x
    // its r12 duo medians, so a single window cannot adjudicate).
    // Focused: anchors + the two movers + mv/cc as untouched
    // heavy-family references with r12 duo baselines (2.16-2.25 /
    // 2.41-2.43).
    val ng2: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "angi_A" -> q("q_stats_gini"), "angi_B" -> q("q_stats_gini"),
      "anan_A" -> q("q_ts_anomaly"), "anan_B" -> q("q_ts_anomaly"),
      "ng_A" -> q("q_dedup_near_ngram"),
      "ng_B" -> q("q_dedup_near_ngram"),
      "rec_A" -> q("q_rec_item_neighbors"),
      "rec_B" -> q("q_rec_item_neighbors"),
      "mvI_A" -> mv9I, "mvI_B" -> mv9I,
      "ccI_A" -> cc9I, "ccI_B" -> cc9I,
    )
    // exp12 (AB_EXP=r13opt2): the second r13-optimization batch — the
    // plan audit's multi-consumer recompute family in the graph/entity
    // tier. Same duo protocol. The graph queries read the
    // warmup-materialized layouts, so the experiment replays Bench's
    // untimed prep first.
    if (sys.env.get("AB_EXP").contains("r13opt2")) {
      graft.queries.AnalyticsQueries.ensureEdgeList(spark, sfDir)
      graft.queries.GraphMediaQueries.ensureAffinityGraph(spark, sfDir)
    }
    import graft.queries.{AuditOpsQueries => AOQ, EvalGraphQueries => EGQ,
      SignalQueries => SGQ, GraphMediaQueries => GMQ,
      EntityOpsQueries => EOQ}
    val r13opt2: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "blI_A" -> (() => AOQ.bellman3(spark, sfDir, cutIters = false)),
      "blI_B" -> (() => AOQ.bellman3(spark, sfDir, cutIters = false)),
      "blC_A" -> (() => AOQ.bellman3(spark, sfDir, cutIters = true)),
      "blC_B" -> (() => AOQ.bellman3(spark, sfDir, cutIters = true)),
      "hiI_A" -> (() => EGQ.graphHits(spark, sfDir, share = false)),
      "hiI_B" -> (() => EGQ.graphHits(spark, sfDir, share = false)),
      "hiC_A" -> (() => EGQ.graphHits(spark, sfDir, share = true)),
      "hiC_B" -> (() => EGQ.graphHits(spark, sfDir, share = true)),
      "clI_A" -> (() => SGQ.closeness3(spark, sfDir, share = false)),
      "clI_B" -> (() => SGQ.closeness3(spark, sfDir, share = false)),
      "clC_A" -> (() => SGQ.closeness3(spark, sfDir, share = true)),
      "clC_B" -> (() => SGQ.closeness3(spark, sfDir, share = true)),
      "asI_A" -> (() => GMQ.assortativity(spark, sfDir, share = false)),
      "asI_B" -> (() => GMQ.assortativity(spark, sfDir, share = false)),
      "asC_A" -> (() => GMQ.assortativity(spark, sfDir, share = true)),
      "asC_B" -> (() => GMQ.assortativity(spark, sfDir, share = true)),
      "cnI_A" -> (() => GMQ.commonNeighbors(spark, sfDir, share = false)),
      "cnI_B" -> (() => GMQ.commonNeighbors(spark, sfDir, share = false)),
      "cnC_A" -> (() => GMQ.commonNeighbors(spark, sfDir, share = true)),
      "cnC_B" -> (() => GMQ.commonNeighbors(spark, sfDir, share = true)),
      "fzI_A" -> (() => EOQ.fuzzyName(spark, sfDir,
        shareFuzzyFrames = false)),
      "fzI_B" -> (() => EOQ.fuzzyName(spark, sfDir,
        shareFuzzyFrames = false)),
      "fzC_A" -> (() => EOQ.fuzzyName(spark, sfDir,
        shareFuzzyFrames = true)),
      "fzC_B" -> (() => EOQ.fuzzyName(spark, sfDir,
        shareFuzzyFrames = true)),
    )
    // exp13 (AB_EXP=r14opt, round-14 optimization round): duo A/Bs of
    // the two new structural challengers plus the judge-requested
    // re-adjudication duos.
    //  kb: banded kNN — in-row ARRAY per-cell top-5 (the stream twin's
    //      shape, bandedKnnAccuracyArrayOn) vs the incumbent row shape
    //      whose WindowGroupLimit sorts every scored pair map-side.
    //  cp/pf: containment_prefix / prefix_filter — hash-only candidate
    //      join keys (drop the gram string from the candidate
    //      exchange; exact verify kills collision candidates).
    //  bl/rec: A/A anchor duos for the two window-inflated untouched
    //      heavies (VERDICT r13 #7) — parked-or-drifting check only.
    import graft.queries.{KnnOpsQueries => KOQ}
    val r14opt: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "kbI_A" -> (() => KOQ.bandedKnnAccuracyOn(
        DedupQueries.buildCellIndex(spark, sfDir))),
      "kbI_B" -> (() => KOQ.bandedKnnAccuracyOn(
        DedupQueries.buildCellIndex(spark, sfDir))),
      "kbC_A" -> (() => KOQ.bandedKnnAccuracyOn(
        DedupQueries.buildCellIndex(spark, sfDir), arrayTopK = true)),
      "kbC_B" -> (() => KOQ.bandedKnnAccuracyOn(
        DedupQueries.buildCellIndex(spark, sfDir), arrayTopK = true)),
      "cpI_A" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = false)),
      "cpI_B" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = false)),
      "cpC_A" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = true)),
      "cpC_B" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = true)),
      "pfI_A" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = false)),
      "pfI_B" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = false)),
      "pfC_A" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = true)),
      "pfC_B" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = true)),
      "bl_A" -> q("q_basket_lift"), "bl_B" -> q("q_basket_lift"),
      "rec_A" -> q("q_rec_item_neighbors"),
      "rec_B" -> q("q_rec_item_neighbors"),
    )
    // AB_EXP=r14opt2: the second r14 window, focused — kb dropped
    // (refuted at +70% in window 1: the in-row HOF scoring lambda
    // costs more than the row-shape sort it saves), cp/pf/bl/rec kept
    // (window 1 was noisy: an11 first-slots ran 1.5x second slots).
    val r14opt2: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "cpI_A" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = false)),
      "cpI_B" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = false)),
      "cpC_A" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = true)),
      "cpC_B" -> (() => DedupQueries.containmentPrefixPairs(spark, sfDir,
        hashOnlyCands = true)),
      "pfI_A" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = false)),
      "pfI_B" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = false)),
      "pfC_A" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = true)),
      "pfC_B" -> (() => DedupQueries.prefixFilterPairs(spark, sfDir,
        hashOnlyCands = true)),
      "bl_A" -> q("q_basket_lift"), "bl_B" -> q("q_basket_lift"),
      "rec_A" -> q("q_rec_item_neighbors"),
      "rec_B" -> q("q_rec_item_neighbors"),
    )
    // AB_EXP=r14opt3 (round-14 continuation window): duo A/Bs of the
    // two fresh structural challengers + the flagged bl re-duo.
    //  ph: multimodal_phash — persist the (media_id, phash) frame
    //      before the banded self-join (codec MapPartitions ×2 → ×1,
    //      the simhash signature-persist precedent).
    //  bm: text_bm25 — F = dl fused into the token pass (corpus dl
    //      join removed); S = F + df derived from the persisted tf
    //      frame (4 corpus scans → 2).
    //  bl: q_basket_lift A/A re-duo (r14 upper-envelope drift flag).
    import graft.queries.{MiscQueries => MQ, SearchStatsQueries => SSQ}
    val r14opt3: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "phI_A" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = false)),
      "phI_B" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = false)),
      "phC_A" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = true)),
      "phC_B" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = true)),
      "bmI_A" -> (() => SSQ.bm25(spark, sfDir)),
      "bmI_B" -> (() => SSQ.bm25(spark, sfDir)),
      "bmF_A" -> (() => SSQ.bm25(spark, sfDir, fuseDl = true)),
      "bmF_B" -> (() => SSQ.bm25(spark, sfDir, fuseDl = true)),
      "bmS_A" -> (() => SSQ.bm25(spark, sfDir, fuseDl = true,
        dfFromTf = true)),
      "bmS_B" -> (() => SSQ.bm25(spark, sfDir, fuseDl = true,
        dfFromTf = true)),
      "bl_A" -> q("q_basket_lift"), "bl_B" -> q("q_basket_lift"),
    )
    // AB_EXP=r14opt4 (round-14 continuation window 2): duos for the
    // --rescans sweep batch — bounded-frame cuts (fc/vo/km/hz), the
    // zero-materialization window rewrites (ql/cm), and the pre-dedup
    // contamination restructure (pc).
    import graft.queries.{CorpusOpsQueries => COQ,
      EvalGraphQueries => EGQ, ExperimentQueries => EXQ,
      MlOpsQueries => MOQ, PipelineQueries => PQ, TextQueries => TQ}
    val r14opt4: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "fcI_A" -> (() => MOQ.featCov(spark, sfDir, cutSx = false)),
      "fcI_B" -> (() => MOQ.featCov(spark, sfDir, cutSx = false)),
      "fcC_A" -> (() => MOQ.featCov(spark, sfDir, cutSx = true)),
      "fcC_B" -> (() => MOQ.featCov(spark, sfDir, cutSx = true)),
      "voI_A" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = false)),
      "voI_B" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = false)),
      "voC_A" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = true)),
      "voC_B" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = true)),
      "kmI_A" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = false)),
      "kmI_B" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = false)),
      "kmC_A" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = true)),
      "kmC_B" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = true)),
      "hzI_A" -> (() => EXQ.tsHazard(spark, sfDir, cutUsers = false)),
      "hzI_B" -> (() => EXQ.tsHazard(spark, sfDir, cutUsers = false)),
      "hzC_A" -> (() => EXQ.tsHazard(spark, sfDir, cutUsers = true)),
      "hzC_B" -> (() => EXQ.tsHazard(spark, sfDir, cutUsers = true)),
      "qlI_A" -> (() => TQ.qualityLm(spark, sfDir, windowTotal = false)),
      "qlI_B" -> (() => TQ.qualityLm(spark, sfDir, windowTotal = false)),
      "qlC_A" -> (() => TQ.qualityLm(spark, sfDir, windowTotal = true)),
      "qlC_B" -> (() => TQ.qualityLm(spark, sfDir, windowTotal = true)),
      "pcI_A" -> (() => PQ.pipelineCorpus(spark, sfDir,
        contamPreDedup = false)),
      "pcI_B" -> (() => PQ.pipelineCorpus(spark, sfDir,
        contamPreDedup = false)),
      "pcC_A" -> (() => PQ.pipelineCorpus(spark, sfDir,
        contamPreDedup = true)),
      "pcC_B" -> (() => PQ.pipelineCorpus(spark, sfDir,
        contamPreDedup = true)),
      "cmI_A" -> (() => COQ.corpusMix(spark, sfDir, windowTarget = false)),
      "cmI_B" -> (() => COQ.corpusMix(spark, sfDir, windowTarget = false)),
      "cmC_A" -> (() => COQ.corpusMix(spark, sfDir, windowTarget = true)),
      "cmC_B" -> (() => COQ.corpusMix(spark, sfDir, windowTarget = true)),
    )
    // AB_EXP=r14opt5 (round-14 continuation window 3): the second
    // --rescans batch — qq single-pass restructure, grid/spine/ledger
    // cuts (ts/kd/pf2/nh/rf).
    import graft.queries.{AssocStatsQueries => ASQ,
      EmbAuditQueries => EAQ, RobustStatsQueries => RSQ,
      SignalQueries => SGQ, VarianceSeqQueries => VSQ,
      WarehouseQueries => WQ}
    val r14opt5: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "qqI_A" -> (() => VSQ.statsQq(spark, sfDir, singlePass = false)),
      "qqI_B" -> (() => VSQ.statsQq(spark, sfDir, singlePass = false)),
      "qqC_A" -> (() => VSQ.statsQq(spark, sfDir, singlePass = true)),
      "qqC_B" -> (() => VSQ.statsQq(spark, sfDir, singlePass = true)),
      "tsI_A" -> (() => RSQ.theilSen(spark, sfDir, cutCells = false)),
      "tsI_B" -> (() => RSQ.theilSen(spark, sfDir, cutCells = false)),
      "tsC_A" -> (() => RSQ.theilSen(spark, sfDir, cutCells = true)),
      "tsC_B" -> (() => RSQ.theilSen(spark, sfDir, cutCells = true)),
      "kdI_A" -> (() => ASQ.kendall(spark, sfDir, cutCells = false)),
      "kdI_B" -> (() => ASQ.kendall(spark, sfDir, cutCells = false)),
      "kdC_A" -> (() => ASQ.kendall(spark, sfDir, cutCells = true)),
      "kdC_B" -> (() => ASQ.kendall(spark, sfDir, cutCells = true)),
      "pf2I_A" -> (() => SGQ.tsPacf(spark, sfDir, shareDaily = false)),
      "pf2I_B" -> (() => SGQ.tsPacf(spark, sfDir, shareDaily = false)),
      "pf2C_A" -> (() => SGQ.tsPacf(spark, sfDir, shareDaily = true)),
      "pf2C_B" -> (() => SGQ.tsPacf(spark, sfDir, shareDaily = true)),
      "nhI_A" -> (() => EAQ.embNormHist(spark, sfDir, cutN2 = false)),
      "nhI_B" -> (() => EAQ.embNormHist(spark, sfDir, cutN2 = false)),
      "nhC_A" -> (() => EAQ.embNormHist(spark, sfDir, cutN2 = true)),
      "nhC_B" -> (() => EAQ.embNormHist(spark, sfDir, cutN2 = true)),
      "rfI_A" -> (() => WQ.ordersRfm(spark, sfDir, cutRfm = false)),
      "rfI_B" -> (() => WQ.ordersRfm(spark, sfDir, cutRfm = false)),
      "rfC_A" -> (() => WQ.ordersRfm(spark, sfDir, cutRfm = true)),
      "rfC_B" -> (() => WQ.ordersRfm(spark, sfDir, cutRfm = true)),
    )
    // AB_EXP=r14opt6: the sf1.0 confirmation window for the four
    // material r14-continuation adoptions (run with
    // SPARK_GRAFT_SF_DIR=/tmp/sf1.0, 5 rounds).
    val r14opt6: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "phI_A" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = false)),
      "phI_B" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = false)),
      "phC_A" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = true)),
      "phC_B" -> (() => MQ.phashPairs(spark, sfDir, shareHashes = true)),
      "bmI_A" -> (() => SSQ.bm25(spark, sfDir, fuseDl = false,
        dfFromTf = false)),
      "bmI_B" -> (() => SSQ.bm25(spark, sfDir, fuseDl = false,
        dfFromTf = false)),
      "bmS_A" -> (() => SSQ.bm25(spark, sfDir, fuseDl = true,
        dfFromTf = true)),
      "bmS_B" -> (() => SSQ.bm25(spark, sfDir, fuseDl = true,
        dfFromTf = true)),
      "voI_A" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = false)),
      "voI_B" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = false)),
      "voC_A" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = true)),
      "voC_B" -> (() => EGQ.vocabOverlap(spark, sfDir, shareSw = true)),
      "kmI_A" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = false)),
      "kmI_B" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = false)),
      "kmC_A" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = true)),
      "kmC_B" -> (() => EGQ.kaplanMeier(spark, sfDir, cutUsers = true)),
    )
    // AB_EXP=r14opt7: the events-ledger boundary probes — forecast
    // snaive hour spine (3 consumers) and retention cohort user ledger
    // (2 consumers), the km-won / hz-lost family.
    import graft.queries.{MlEvalQueries => MEQ}
    val r14opt7: Seq[(String, () => DataFrame)] = Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "fsI_A" -> (() => MEQ.forecastSnaive(spark, sfDir,
        shareByh = false)),
      "fsI_B" -> (() => MEQ.forecastSnaive(spark, sfDir,
        shareByh = false)),
      "fsC_A" -> (() => MEQ.forecastSnaive(spark, sfDir,
        shareByh = true)),
      "fsC_B" -> (() => MEQ.forecastSnaive(spark, sfDir,
        shareByh = true)),
      "rcI_A" -> (() => PQ.retentionCohort(spark, sfDir,
        cutFirst = false)),
      "rcI_B" -> (() => PQ.retentionCohort(spark, sfDir,
        cutFirst = false)),
      "rcC_A" -> (() => PQ.retentionCohort(spark, sfDir,
        cutFirst = true)),
      "rcC_B" -> (() => PQ.retentionCohort(spark, sfDir,
        cutFirst = true)),
    )
    val variants: Seq[(String, () => DataFrame)] =
      (if (sys.env.get("AB_EXP").contains("r14opt7")) r14opt7
      else if (sys.env.get("AB_EXP").contains("r14opt6")) r14opt6
      else if (sys.env.get("AB_EXP").contains("r14opt5")) r14opt5
      else if (sys.env.get("AB_EXP").contains("r14opt4")) r14opt4
      else if (sys.env.get("AB_EXP").contains("r14opt3")) r14opt3
      else if (sys.env.get("AB_EXP").contains("r14opt2")) r14opt2
      else if (sys.env.get("AB_EXP").contains("r14opt")) r14opt
      else if (sys.env.get("AB_EXP").contains("r13opt2")) r13opt2
      else if (sys.env.get("AB_EXP").contains("r13opt")) r13opt
      else if (sys.env.get("AB_EXP").contains("ng2")) ng2 else Seq(
      "an11_A" -> q("q_tpch_q11"), "an11_B" -> q("q_tpch_q11"),
      "angi_A" -> q("q_stats_gini"), "angi_B" -> q("q_stats_gini"),
      "anan_A" -> q("q_ts_anomaly"), "anan_B" -> q("q_ts_anomaly"),
      "ng_A" -> q("q_dedup_near_ngram"),
      "ng_B" -> q("q_dedup_near_ngram"),
      "rec_A" -> q("q_rec_item_neighbors"),
      "rec_B" -> q("q_rec_item_neighbors"),
      "mvI_A" -> mv9I, "mvI_B" -> mv9I,
      "mvO_A" -> mv9O, "mvO_B" -> mv9O,
      "pfI_A" -> pf9I, "pfI_B" -> pf9I,
      "pfO_A" -> pf9O, "pfO_B" -> pf9O,
      "ccI_A" -> cc9I, "ccI_B" -> cc9I,
      "ccH_A" -> cc9H, "ccH_B" -> cc9H,
      "ccP_A" -> cc9P, "ccP_B" -> cc9P,
    )) ++ (if (sys.env.contains("AB_SPIKES")) spikeSet.map(q =>
      q -> (() => graft.SparkEntry.queries(q)(spark, sfDir))) else Nil)
    // ---- round-robin medians ----
    val rounds = args.headOption.map(_.toInt).getOrElse(5)
    // warmup
    variants.foreach { case (_, f) => f().count(); spark.catalog.clearCache() }
    val times = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    for (_ <- 1 to rounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f().count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      times(name) = times(name) :+ dt
    }
    for ((name, _) <- variants) {
      val v = times(name).sorted
      println(f"$name%-12s median ${v(v.length / 2)}%6.3f  all ${v.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
