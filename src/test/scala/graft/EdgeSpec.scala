package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2.2 — the testdata contains no NULLs, empty strings, or
  * degenerate documents (verified), so hand-built rows are the only
  * coverage for those edges. Each test exercises an operator family's
  * building blocks exactly as the declared queries compose them.
  */
class EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("outer join: unmatched side aggregates as 0 via coalesce, not null") {
    val cust = Seq((1L, "a"), (2L, "b")).toDF("ck", "name")
    val orders = Seq((1L, 10.0)).toDF("ck", "price")
    val got = cust.join(orders, Seq("ck"), "left")
      .groupBy("ck")
      .agg(coalesce(sum(col("price").cast("decimal(18,4)")),
        lit(0).cast("decimal(18,4)")).as("total"))
      .orderBy("ck").as[(Long, java.math.BigDecimal)].collect()
    assert(got(0)._2.doubleValue == 10.0)
    assert(got(1)._2.doubleValue == 0.0, "no-order customer sums to 0, not null")
  }

  test("window functions: single-row partitions and NULL ordering") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some(5.0)), (2L, None), (2L, Some(3.0)))
      .toDF("k", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("v").asc_nulls_first)
    val got = df.withColumn("rn", row_number().over(w))
      .orderBy("k", "rn")
      .as[(Long, Option[Double], Int)].collect().toSeq
    assert(got.head == ((1L, Some(5.0), 1)), "singleton partition ranks 1")
    assert(got(1) == ((2L, None, 1)), "explicit NULLS FIRST puts null at rank 1")
  }

  test("dedup building blocks: empty strings and empty token arrays") {
    val docs = Seq((1L, ""), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    // md5 of empty string is well-defined → empty docs dedupe together
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val kept = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), "empty texts are still exact duplicates")
    // shingling guards: docs below the 3-token minimum produce no rows
    val tk = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")).as("sh"))
    assert(tk.select("doc_id").distinct().as[Long].collect().toSet == Set(3L))
  }

  test("native dot product: NULL array, empty arrays, length mismatch") {
    import graft.functions.Native
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (2L, None, Some(Seq(1.0f))),
      (3L, Some(Seq.empty[Float]), Some(Seq.empty[Float])),
      (4L, Some(Seq(1.0f, 2.0f, 5.0f)), Some(Seq(2.0f))))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), Native.dotF(col("a"), col("b")).as("d"))
      .orderBy("id").as[(Long, Option[Double])].collect().toSeq
    assert(got(0)._2.contains(11.0))
    assert(got(1)._2.isEmpty, "NULL input → NULL (null-intolerant)")
    assert(got(2)._2.contains(0.0), "empty arrays → 0")
    assert(got(3)._2.isEmpty,
      "length mismatch → NULL, matching the HOF zip_with pad-with-NULL fold")
  }

  test("salted aggregation collapses to plain aggregation on tiny groups") {
    val df = Seq((1L, 1.5), (1L, 2.5), (2L, 0.25)).toDF("k", "v")
    val salted = df
      .withColumn("salt", pmod(xxhash64(col("v")), lit(16)))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pc"), sum(col("v").cast("decimal(18,4)")).as("pv"))
      .groupBy("k")
      .agg(sum(col("pc")).as("n"), sum(col("pv")).cast("decimal(18,4)").as("s"))
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(18,4)").as("s"))
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }

  test("as-of join: empty right side yields all-null attachments") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("rk", "rt", "tag")
    val got = graft.plans.AsOf.join(left, right,
      col("k"), col("t"), col("rk"), col("rt"))
      .select("k", "tag").as[(Long, Option[String])].collect().toSeq
    assert(got == Seq((1L, None)))
  }

  test("frequent items: empty group, k=1 degenerate, and ties stay deterministic") {
    import graft.functions.FrequentItems
    val fi1 = udaf(FrequentItems(1))
    // k=1 on a strict-majority stream must keep the majority element
    // (the Boyer-Moore special case of Misra-Gries)
    val majority = (Seq.fill(7)("m") ++ Seq("a", "b", "c", "d", "e"))
      .toDF("t").repartition(3)
    val got1 = majority.agg(fi1(col("t")).as("it"))
      .select(explode(col("it.term"))).as[String].collect().toSeq
    assert(got1 == Seq("m"))
    // empty input → empty summary, not a crash or a null row
    val fi4 = udaf(FrequentItems(4))
    val empty = Seq.empty[String].toDF("t")
    val got0 = empty.agg(fi4(col("t")).as("it"))
      .select(size(col("it"))).as[Int].collect().toSeq
    assert(got0 == Seq(0))
    // exact ties under no eviction sort by (-count, term): stable output
    val ties = Seq("x", "y", "x", "y", "z").toDF("t")
    val gotT = ties.agg(fi4(col("t")).as("it"))
      .select(explode(col("it"))).select("col.term", "col.lb_count")
      .as[(String, Long)].collect().toSeq
    assert(gotT == Seq(("x", 2L), ("y", 2L), ("z", 1L)))
  }

  test("chunking building blocks: empty and single-token text still chunk") {
    // split("") yields [""] — one 1-token chunk, never zero rows: the
    // q_text_chunk shape can't silently drop degenerate documents
    val df = Seq((1L, ""), (2L, "solo"), (3L, "a b c d e f g h i j k l m"))
      .toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("tk"))
      .select(col("id"), col("tk"),
        explode(expr("sequence(1, size(tk), 8)")).as("st"))
      .select(col("id"), col("st"),
        expr("slice(tk, st, 12)").as("ck"))
    val counts = df.groupBy("id").count().orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(counts == Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("q15 shape: exact-decimal revenue ties return BOTH suppliers") {
    import graft.engine.Tables.{D, Dec}
    // supplier 1: one line of 200.00; supplier 2: two lines of 100.00 —
    // identical totals ONLY under exact decimal accumulation (the
    // declared q_tpch_q15 discipline); supplier 3 strictly lower. The
    // global-max equality filter must keep both tied winners.
    val li = Seq((1L, 200.0, 0.0), (2L, 100.0, 0.0), (2L, 100.0, 0.0),
      (3L, 150.0, 0.05)).toDF("l_suppkey", "l_extendedprice", "l_discount")
    val rev = (D(col("l_extendedprice")) *
      (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
    import org.apache.spark.sql.expressions.Window
    val winners = li.groupBy("l_suppkey").agg(sum(rev).as("total_rev"))
      .withColumn("mx", max(col("total_rev")).over(Window.partitionBy()))
      .filter(col("total_rev") === col("mx"))
      .select("l_suppkey").as[Long].collect().toSet
    assert(winners == Set(1L, 2L), s"tied winners must both survive: $winners")
  }

  test("q2 shape: unit-cost ties keep every best supplier of a part") {
    import org.apache.spark.sql.expressions.Window
    // suppliers 1 and 2 both hit unit cost 5.0 for part 100 (via
    // different price/qty splits whose double division is exact);
    // supplier 3 is strictly worse. The window-min equality filter must
    // keep BOTH tied best suppliers — the same ties-survive discipline
    // as the q15 shape, on the per-(part,supplier) aggregate.
    val li = Seq((100L, 1L, 10.0, 2.0), (100L, 1L, 20.0, 2.0),
      (100L, 2L, 40.0, 8.0), (100L, 3L, 60.0, 10.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val best = li.groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      .withColumn("best_cost",
        min(col("unit_cost")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("unit_cost") === col("best_cost"))
      .select("l_suppkey").as[Long].collect().toSet
    assert(best == Set(1L, 2L), s"tied best suppliers must survive: $best")
  }

  test("q20 shape: the relative threshold is strict — boundary excluded") {
    import graft.engine.Tables.{d4, D, Dec}
    // three suppliers shipped 10/20/30 → mean 20; qty > 1.2·mean = 24
    // keeps ONLY the 30 shipper; the 20-at-the-boundary×1.2=24 case is
    // excluded by the strict inequality on both engines.
    val shipped = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("l_suppkey", "qty_raw")
      .groupBy("l_suppkey").agg(sum(D(col("qty_raw"))).cast(Dec).as("qty"))
    val thr = shipped.agg((d4(sum(col("qty"))) / count(lit(1))).as("thr"))
    val kept = shipped.join(broadcast(thr))
      .filter(d4(col("qty")) > lit(1.2) * col("thr"))
      .select("l_suppkey").as[Long].collect().toSet
    assert(kept == Set(3L), s"only the strictly-above supplier survives: $kept")
  }

  test("q16 shape: empty and full complaint-supplier anti sides") {
    // the anti join's build side is a FILTERED dim — when the filter
    // matches nothing, the anti join must pass everything through (not
    // drop everything), and when it matches every supplier the result
    // must be empty (not a 0-count row: groups vanish with their rows)
    val li = Seq((10L, 1L), (10L, 2L), (20L, 2L))
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((10L, "b1", "t1", 5), (20L, "b2", "t2", 9))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    def q16(complaints: Seq[Long]) = {
      val supp = complaints.toDF("s_suppkey")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .select("p_brand", "supplier_cnt")
        .as[(String, Long)].collect().toMap
    }
    assert(q16(Nil) == Map("b1" -> 2L, "b2" -> 1L),
      "empty anti side keeps every supplier")
    assert(q16(Seq(1L, 2L)) == Map.empty[String, Long],
      "all-complaint anti side yields NO groups (not 0-count rows)")
    assert(q16(Seq(1L)) == Map("b1" -> 1L, "b2" -> 1L))
  }

  test("q19 shape: disjunctive arms are inclusive at bounds and never mix") {
    // each OR arm fixes (brand, size range, quantity range); a line may
    // satisfy one arm's quantity bound and another arm's brand — such
    // cross-arm mixes must NOT match. Boundary values are inclusive
    // (between semantics) and a multi-arm filter counts a row ONCE.
    val arm = (b: String, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === b && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    val rows = Seq(
      // matches arm1 exactly at both quantity bounds (inclusive)
      ("Brand#12", 15, 1.0), ("Brand#12", 15, 20.0),
      // arm1 brand + arm2-only quantity → cross-arm mix, must drop
      ("Brand#12", 15, 30.0),
      // arm2 match, interior point
      ("Brand#23", 20, 25.0),
      // arm2 brand but size above arm2's cap → drop
      ("Brand#23", 30, 25.0))
      .toDF("p_brand", "p_size", "l_quantity")
    val got = rows
      .filter(arm("Brand#12", 15, 1, 20) || arm("Brand#23", 25, 10, 35) ||
        arm("Brand#13", 35, 20, 50))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("Brand#12" -> 2L, "Brand#23" -> 1L), got.toString)
  }

  test("bloom prefilter: false positives are cancelled by the exact rejoin") {
    // force false positives with a deliberately tiny filter (64 bits for
    // 40 member keys), mirroring q_join_bloom_prefilter's structure: the
    // bloom is a PREFILTER only — the exact semi join afterwards must
    // cancel every false positive, so the result equals the exact
    // answer no matter how saturated the filter is. xxhash64 is
    // deterministic, so the FP set (and this test) is stable.
    val members = (1L to 40L).map(k => k * 7L)
    val probes = (1L to 400L)
    members.toDF("k").createOrReplaceTempView("bf_edge_members")
    probes.toDF("k").createOrReplaceTempView("bf_edge_probes")
    val passed = spark.sql(
      """SELECT k FROM bf_edge_probes
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k), 40L, 64L)
        |   FROM bf_edge_members),
        |  xxhash64(k))""".stripMargin)
      .as[Long].collect().toSet
    val trueMembers = members.filter(_ <= 400L).toSet
    assert(trueMembers.subsetOf(passed), "bloom must never false-negative")
    assert((passed -- trueMembers).nonEmpty,
      "a 64-bit filter over 40 keys must produce false positives — " +
        "otherwise this test proves nothing")
    val exact = spark.sql(
      """SELECT p.k FROM bf_edge_probes p
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k), 40L, 64L)
        |   FROM bf_edge_members),
        |  xxhash64(p.k))
        |AND EXISTS (SELECT 1 FROM bf_edge_members m WHERE m.k = p.k)""".stripMargin)
      .as[Long].collect().toSet
    assert(exact == trueMembers,
      s"rejoin must cancel every false positive: ${exact -- trueMembers}")
  }

  test("bitmap distinct: bit 63 (sign bit) and bucket boundaries count") {
    // ids on both sides of every 64-boundary, including 63 whose mask
    // 1L<<63 is Long.MIN_VALUE — bit_or/bit_count must treat the sign
    // bit as an ordinary bit, and duplicates must not double-count
    val ids = Seq(0L, 63L, 63L, 64L, 127L, 128L, 191L, 191L)
    val got = ids.toDF("user_id")
      .groupBy(expr("user_id div 64").as("bk"))
      .agg(expr("bit_or(shiftleft(1L, cast(user_id % 64 as int)))").as("bm"))
      .agg(sum(expr("bit_count(bm)")).cast("long")).as[Long].head()
    assert(got == 6L, s"expected 6 distinct, got $got")
  }

  test("TopKAgg: group smaller than k, empty input, all-tied values") {
    val agg = new graft.functions.TopKAgg(5)
    import graft.functions.TopKEntry
    assert(agg.finish(agg.zero).isEmpty)
    val two = Seq(TopKEntry(1.0, 2L), TopKEntry(3.0, 1L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(two.map(_.id) == Seq(1L, 2L), "undersized group keeps all, sorted")
    val tied = (1L to 9L).map(TopKEntry(7.0, _))
      .foldLeft(agg.zero)(agg.reduce)
    assert(tied.map(_.id) == Seq(1L, 2L, 3L, 4L, 5L),
      "ties resolve by ascending id, buffer stays at k")
  }

  test("z-interleave: zero, max 21-bit keys, and single-dim monotonicity") {
    // reuse the exact expression the declared query generates
    def z(a: Long, b: Long): Long = {
      val df = Seq((a, b)).toDF("l_partkey", "l_suppkey")
      val e = (0 until 21).map { i =>
        val p = 1L << i; val c = 1L << (2 * i)
        s"(((l_partkey div $p) % 2) * $c + ((l_suppkey div $p) % 2) * ${2 * c})"
      }.mkString(" + ")
      df.selectExpr(s"$e as zv").as[Long].head()
    }
    assert(z(0, 0) == 0L)
    val m = (1L << 21) - 1
    assert(z(m, m) == (1L << 42) - 1, "all 42 bits set at max keys")
    assert(z(1, 0) == 1L && z(0, 1) == 2L, "bit assignment: a=even, b=odd")
    // interleave preserves per-dimension order at fixed other key
    assert(z(5, 9) < z(6, 9) && z(5, 9) < z(5, 10))
  }
}
