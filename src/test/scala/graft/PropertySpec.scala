package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.queries.DedupQueries

/** SURVEY.md §5.2.3 — invariants over the real testdata (sf0.001), not
  * golden values: these hold for ANY correct implementation.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf
  import spark.implicits._

  test("exact dedup is idempotent and collapses synthesized duplicates") {
    val docs = Tables.t(spark, sf, "documents")
    // double every doc with a shifted id → guaranteed exact duplicates
    val doubled = docs.unionAll(
      docs.withColumn("doc_id", col("doc_id") + 1000000L))
    def dedup(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
    }
    val once = dedup(doubled)
    val twice = dedup(once)
    assert(once.count() == docs.count(), "each text keeps exactly one copy")
    assert(twice.count() == once.count(), "idempotent")
    assert(once.agg(max(col("doc_id"))).head.getLong(0) < 1000000L,
      "keeps the LOWEST doc_id of each duplicate group")
  }

  test("minhash-LSH candidates cover all pairs with jaccard >= 0.9") {
    val candidates = DedupQueries.minhashCandidates(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val highJaccard = SparkEntry.queries("q_dedup_near_ngram")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(highJaccard.nonEmpty, "testdata must contain near-dups")
    val missed = highJaccard -- candidates
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
  }

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val approx = ev.agg(approx_count_distinct(col("user_id"), 0.02))
      .head.getLong(0)
    val exact = ev.agg(countDistinct(col("user_id"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }

  test("cosine(v, v) == 1 under the engine's cosine expression") {
    val v = Tables.t(spark, sf, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("e"))
    val selfCos = v.select(expr(
      """round(aggregate(zip_with(e, e, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)
        | / (sqrt(aggregate(transform(e, x -> x * x), cast(0 as double), (acc, x) -> acc + x))
        |    * sqrt(aggregate(transform(e, x -> x * x), cast(0 as double), (acc, x) -> acc + x))), 6)""".stripMargin)
      .as("c"))
    assert(selfCos.filter(col("c") =!= 1.0).count() == 0)
  }

  test("set algebra: intersect + except partitions the left distinct set") {
    val c = Tables.t(spark, sf, "customer").select(col("c_nationkey").as("nk"))
    val s = Tables.t(spark, sf, "supplier").select(col("s_nationkey").as("nk"))
    val left = c.distinct()
    val inter = c.intersect(s)
    val exc = c.except(s)
    assert(inter.count() + exc.count() == left.count())
    assert(inter.intersect(exc).count() == 0)
    assert(inter.union(exc).distinct().count() == left.count())
  }

  test("running sum's last row per customer equals the group sum") {
    val rs = SparkEntry.queries("q_win_running_sum")(spark, sf)
    // "last" follows the window's ordering: (o_orderdate, o_orderkey)
    val lastPerCust = rs.groupBy("o_custkey")
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"), col("run_sum")))
        .as("m"))
      .select(col("o_custkey"), col("m.run_sum").as("final_sum"))
    val direct = Tables.t(spark, sf, "orders").groupBy("o_custkey")
      .agg(Tables.d4(sum(Tables.D(col("o_totalprice")))).as("total"))
    val joined = lastPerCust.join(direct, "o_custkey")
    assert(joined.filter(col("final_sum") =!= col("total")).count() == 0)
  }

  test("union distinct is a subset of union all") {
    val all = SparkEntry.queries("q_set_union_all")(spark, sf)
    val dst = all.distinct()
    assert(dst.count() <= all.count())
    assert(dst.exceptAll(all).count() == 0)
  }

  test("simhash banding finds every exact-duplicate text as hamming 0") {
    // identical texts (different ids) MUST produce identical signatures
    // and be recalled by the chunk banding (hamming 0 ≤ any threshold)
    val exactDupPairs = {
      val docs = Tables.t(spark, sf, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
      docs.select(col("doc_id").as("d1"), col("h"))
        .join(docs.select(col("doc_id").as("d2"), col("h").as("h2")),
          col("h") === col("h2") && col("d1") < col("d2"))
        .select("d1", "d2").as[(Long, Long)].collect().toSet
    }
    val simhash = DedupQueries.simhashPairs(spark, sf, 3)
    val found = simhash.select("d1", "d2").as[(Long, Long)].collect().toSet
    val zeroHam = simhash.filter(col("hamming") === 0)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert((exactDupPairs -- zeroHam).isEmpty,
      s"exact dups missing or nonzero hamming: ${exactDupPairs -- zeroHam}")
    assert((exactDupPairs -- found).isEmpty)
  }

  test("embedding dedup: reps point strictly earlier, flags consistent") {
    // NOTE: rep(rep) == rep does NOT hold by design — this is single-link
    // threshold dedup (each vector keeps its earliest neighbor above τ),
    // not connected components: B can be A's dup while still serving as
    // C's representative when cos(A,C) < τ.
    val rep = SparkEntry.queries("q_dedup_embedding")(spark, sf)
    assert(rep.filter(col("rep_id") > col("vec_id")).count() == 0,
      "representative must never be a later vector")
    assert(rep.filter(
      (col("is_dup") === 1) =!= (col("rep_id") =!= col("vec_id"))).count() == 0,
      "is_dup flag must mirror rep_id != vec_id")
    assert(rep.filter(col("is_dup") === 1).count() > 0,
      "testdata must contain embedding near-dups at tau = 0.40")
  }

  test("winnowing fingerprints: identical docs share identical fp sets") {
    val fp = SparkEntry.queries("q_text_fingerprint")(spark, sf)
      .groupBy("doc_id").agg(sort_array(collect_list(col("fp"))).as("fps"))
    val texts = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val joined = fp.join(texts, "doc_id")
    // same text hash → same fingerprint set
    val distinctPerText = joined.groupBy("h")
      .agg(countDistinct(col("fps")).as("n"))
    assert(distinctPerText.filter(col("n") > 1).count() == 0)
  }

  test("token counts: BPE-ish regex tokens are at least whitespace tokens") {
    // every whitespace token contributes ≥1 regex token (letters/digits/
    // symbols all match some alternative), so bpe >= ws for these texts
    val tc = SparkEntry.queries("q_text_token_count")(spark, sf)
    assert(tc.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
    assert(tc.filter(col("ws_tokens") < 1).count() == 0)
  }

  test("correlation lies in [-1, 1] and matches the covariance sign") {
    // NOTE: this generator draws quantity and price INDEPENDENTLY
    // (measured corr ≈ -0.02) — unlike real TPC-H, where price scales
    // with quantity — so only the analytic invariants are asserted.
    val c = SparkEntry.queries("q_agg_corr")(spark, sf).collect()
    c.foreach { r =>
      val covar = r.getDouble(2)
      val corr = r.getDouble(3)
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
      assert(corr.sign == covar.sign,
        s"corr $corr and covar $covar must share a sign")
    }
  }

  test("mode: no value in the group has a higher count than the mode") {
    val modes = SparkEntry.queries("q_agg_mode")(spark, sf)
      .select("l_returnflag", "mode_qty", "cnt")
      .as[(String, Double, Long)].collect()
    val counts = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag", "l_quantity").count()
      .select(col("l_returnflag"), col("l_quantity"), col("count"))
      .as[(String, Double, Long)].collect()
      .groupBy(_._1)
    modes.foreach { case (flag, q, cnt) =>
      val best = counts(flag).map(_._3).max
      assert(cnt == best, s"$flag: mode count $cnt != max count $best")
      // tiebreak: smallest value among max-count values
      val tied = counts(flag).filter(_._3 == best).map(_._2).min
      assert(q == tied, s"$flag: mode $q != smallest tied value $tied")
    }
  }

  test("multiset algebra: |A EXCEPT ALL B| + |A INTERSECT ALL B| == |A|") {
    val a = Tables.t(spark, sf, "lineitem").filter(col("l_quantity") > 48)
      .select(col("l_partkey").as("k"))
    val b = Tables.t(spark, sf, "part").filter(col("p_size") > 25)
      .select(col("p_partkey").as("k"))
    val except = a.exceptAll(b).count()
    val intersect = a.intersectAll(b).count()
    assert(except + intersect == a.count())
  }

  test("range-frame revenue brackets: own price <= rev_7d <= customer total") {
    val q = SparkEntry.queries("q_win_range_frame")(spark, sf)
    val orders = Tables.t(spark, sf, "orders")
    val totals = orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("total"))
    val joined = q.join(totals, "o_custkey")
      .join(orders.select("o_orderkey", "o_totalprice"), "o_orderkey")
    // the value-range frame always contains the current row and never
    // more than the customer's full history
    assert(joined.filter(col("rev_7d") < col("o_totalprice") - 1e-4)
      .count() == 0)
    assert(joined.filter(col("rev_7d") > col("total") + 1e-4).count() == 0)
  }

  test("components: reps are fixpoints and every near-dup pair shares one") {
    val reps = SparkEntry.queries("q_dedup_components")(spark, sf)
      .select("doc_id", "rep_id").as[(Long, Long)].collect().toMap
    // rep(rep) == rep — exactly the property single-link PAIR dedup
    // lacks and clustering restores
    reps.values.foreach(r => assert(reps(r) == r, s"rep $r is not a fixpoint"))
    // connectivity: both ends of every jaccard ≥ 0.8 edge share a rep
    val pairs = SparkEntry.queries("q_dedup_near_ngram")(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(reps(a) == reps(b), s"pair ($a,$b) split across clusters") }
    // minimality: a rep is the smallest id in its cluster
    reps.foreach { case (d, r) => assert(r <= d) }
  }

  test("incremental dedup: exactly the cross-set restriction of the " +
      "exhaustive pairs") {
    val inc = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .select("d_in", "d_ex").as[(Long, Long)].collect()
    // side discipline: incoming on the left, existing on the right
    inc.foreach { case (i, e) =>
      assert(i % 10 == 0 && e % 10 != 0, s"($i,$e) violates the split") }
    // completeness + soundness vs the exhaustive unordered ground truth
    val exhaustive = SparkEntry.queries("q_dedup_near_ngram")(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }
      .toSet
    assert(inc.toSet == exhaustive,
      s"incremental ${inc.length} pairs vs exhaustive cross-set " +
        s"${exhaustive.size}")
  }

  test("pagination: offset page is disjoint from and follows page one") {
    val ordered = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val page1 = ordered.limit(20).collect()
    val page2 = SparkEntry.queries("q_limit_offset")(spark, sf).collect()
    val ids1 = page1.map(_.getLong(0)).toSet
    val ids2 = page2.map(r => r.getLong(0)).toSet
    assert(ids1.intersect(ids2).isEmpty)
    val minP1 = page1.map(_.getDouble(1)).min
    val maxP2 = page2.map(r => r.getDouble(2)).max
    assert(maxP2 <= minP1, "page 2 prices must not exceed page 1 prices")
  }
}
