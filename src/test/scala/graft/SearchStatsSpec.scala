package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the SearchStatsQueries batch — properties
  * the DuckDB hash-compare cannot see (it proves Spark == DuckDB, not
  * that either implements the intended operator).
  */
class SearchStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("spatial grid join equals the brute-force all-pairs nearest") {
    import spark.implicits._
    val got = SparkEntry.queries("q_join_spatial_grid")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // brute force in test scope: every (customer, supplier) pair
    val c = graft.engine.Tables.t(spark, sf, "customer")
      .select(col("c_custkey")).as[Long].collect()
    val s = graft.engine.Tables.t(spark, sf, "supplier")
      .select(col("s_suppkey")).as[Long].collect()
    def cxy(k: Long) = (k * 7919 % 10000, k * 104729 % 10000)
    def sxy(k: Long) = (k * 6151 % 10000, k * 3571 % 10000)
    val expected = c.flatMap { ck =>
      val (cx, cy) = cxy(ck)
      val within = s.flatMap { sk =>
        val (sx, sy) = sxy(sk)
        val d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
        if (d2 <= 250000L) Some((sk, d2)) else None
      }
      if (within.isEmpty) None
      else Some { val (sk, d2) = within.minBy(p => (p._2, p._1))
        (ck, sk, d2) }
    }.sortBy(t => (t._3, t._1)).take(200).toSeq
    assert(got == expected)
  }

  test("spatial grid: cell = R with ±1 neighbors misses no pair (edge case)") {
    // the coverage proof's boundary: |a−b| = R exactly still lands in
    // an adjacent cell after div R
    for (a <- Seq(0L, 499L, 500L, 999L); b <- Seq(a + 500L, a - 500L)
         if b >= 0) {
      assert(math.abs(a / 500 - b / 500) <= 1, s"a=$a b=$b")
    }
  }

  test("bm25: per-term ranking is by score, capped at 20, idf sane") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_text_bm25")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val byTerm = rows.groupBy(_._1)
    assert(byTerm.keySet.subsetOf(Set("merge", "window", "scan")))
    for ((t, rs) <- byTerm) {
      assert(rs.length <= 20, s"$t returned ${rs.length} docs")
      assert(rs.map(_._5).sameElements(rs.map(_._5).sortBy(-_)),
        s"$t not score-descending")
      assert(rs.forall(_._5 > 0), s"$t has non-positive scores")
      // saturation: score is bounded by idf·(k1+1) — with idf ≤ ln(N)
      assert(rs.forall(_._5 < math.log(5000.0) * 2.2))
    }
  }

  test("psi: buckets partition both sides; identical halves give ~0 drift") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_stats_psi")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (1L to 10L), "all ten decile buckets")
    val ev = graft.engine.Tables.t(spark, sf, "events")
    val nRef = ev.filter(col("event_id") % 2 === 0).count()
    val nCur = ev.filter(col("event_id") % 2 === 1).count()
    assert(rows.map(_._2).sum == nRef && rows.map(_._3).sum == nCur)
    // reference deciles bucket the reference side into ~equal tenths
    assert(rows.forall(r => math.abs(r._4 - 0.1) < 0.02))
    // both halves draw from one generator: total PSI is near zero
    // (industry rule of thumb: < 0.1 = no shift; these are HALVES of
    // the same distribution, so they sit far below the alarm line)
    assert(math.abs(rows.map(_._6).sum) < 0.05)
  }

  test("gini matches a local recomputation from per-customer revenue") {
    import spark.implicits._
    val (n, total, gini) = SparkEntry.queries("q_stats_gini")(spark, sf)
      .as[(Long, Double, Double)].collect().head
    val rev = graft.engine.Tables.t(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
      .select(col("o_custkey"), col("rev"))
      .as[(Long, java.math.BigDecimal)].collect()
    assert(n == rev.length)
    val sorted = rev.sortBy { case (k, v) => (v, k) }.map(_._2)
    val srev = sorted.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val srnrev = sorted.zipWithIndex.foldLeft(java.math.BigDecimal.ZERO) {
      case (acc, (v, i)) =>
        acc.add(v.multiply(java.math.BigDecimal.valueOf(i + 1L)))
    }
    val expected = (2.0 * srnrev.doubleValue() -
      (n + 1) * srev.doubleValue()) / (n * srev.doubleValue())
    assert(math.abs(gini - expected) < 1e-12, s"$gini vs $expected")
    assert(gini > 0.0 && gini < 1.0)
    assert(math.abs(total - srev.doubleValue()) < 1e-6)
  }

  test("naive bayes: every test doc classified once, better than chance") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_ml_naive_bayes")(spark, sf)
      .as[(Long, String, String, Double)].collect()
    val docs = graft.engine.Tables.t(spark, sf, "documents")
    val testIds = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(rows.map(_._1).toSet == testIds, "one prediction per test doc")
    assert(rows.length == testIds.size)
    val langs = docs.select(col("lang")).distinct()
      .as[String].collect().toSet
    assert(rows.forall(r => langs.contains(r._3)), "prediction ∈ classes")
    assert(rows.forall(_._4 < 0), "log-space scores are negative")
    // word-unigram NB on this synthetic corpus carries weak but real
    // signal: materially better than the 1/5 chance line
    val acc = rows.count(r => r._2 == r._3).toDouble / rows.length
    assert(acc > 0.2, s"accuracy $acc not above 5-class chance")
  }
}
