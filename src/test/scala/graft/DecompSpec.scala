package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the DecompQueries batch. */
class DecompSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("stl: trend+seasonal+residual reassembles the daily series") {
    val rows = SparkEntry.queries("q_ts_stl_decompose")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val daily = graft.engine.Tables.t(spark, sf, "lineitem")
      .selectExpr(
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 as d",
        "l_extendedprice as v").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sum.toDouble) }
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      assert(r.getAs[Long]("dow") == (d + 4) % 7)
      // additive identity up to the three 4dp roundings
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(recon - daily(d)) < 2e-4,
        s"day $d: $recon vs ${daily(d)}")
    }
    // seasonal component sums to ~0 across a full week of daily means
    val seasByDow = rows.map(r =>
      (r.getAs[Long]("dow"), r.getAs[Double]("seasonal"))).toMap
    assert(seasByDow.size == 7)
  }

  test("novelty: doc 0's grams are all novel; shares recompute locally") {
    val rows = SparkEntry.queries("q_text_ngram_novelty")(spark, sf)
      .collect().sortBy(_.getAs[Long]("doc_id"))
    assert(rows.nonEmpty)
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(text: String): Seq[String] =
      text.split(" ", -1).toSeq.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      grams(text).foreach(g =>
        if (!firstSeen.contains(g)) firstSeen(g) = id)
    }
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.sortBy(_._1).foreach { case (id, text) =>
      val gs = grams(text)
      if (gs.nonEmpty) {
        val novel = gs.count(g => firstSeen(g) == id)
        val r = byId(id)
        assert(r.getAs[Long]("n_grams") == gs.length.toLong)
        assert(r.getAs[Long]("n_novel") == novel.toLong, s"doc $id")
      }
    }
    // the lowest-id document is all-novel by construction
    val first = rows.head
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_grams"))
  }

  test("mutual info: nonnegative, bounded by min marginal entropy") {
    val r = SparkEntry.queries("q_stats_mutual_info")(spark, sf)
      .collect().head
    val mi = r.getAs[Double]("mi_nats")
    val hx = r.getAs[Double]("h_flag")
    val hy = r.getAs[Double]("h_bin")
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-6)
    assert(hx > 0 && hy > 0)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-6)
    // local recompute from the contingency table
    val li = graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(x => (x.getString(0), (x.getDouble(1).toLong - 1) / 5))
    val n = li.length.toDouble
    val pij = li.groupBy(identity).map { case (_, g) => g.length / n }
    val pi = li.groupBy(_._1).map { case (_, g) => g.length / n }
    val pj = li.groupBy(_._2).map { case (_, g) => g.length / n }
    val miLocal = li.groupBy(identity).map { case ((a, b), g) =>
      val p = g.length / n
      p * math.log(p / (pi2(li, a, n) * pj2(li, b, n)))
    }.sum
    assert(math.abs(mi - miLocal) < 1e-4)
  }

  private def pi2(li: Array[(String, Long)], a: String, n: Double) =
    li.count(_._1 == a) / n
  private def pj2(li: Array[(String, Long)], b: Long, n: Double) =
    li.count(_._2 == b) / n

  test("power analysis: monotone in MDE and matches the closed form") {
    val rows = SparkEntry.queries("q_stats_power_analysis")(spark, sf)
      .collect().sortBy(_.getAs[Double]("mde"))
    assert(rows.length == 3)
    // larger detectable effects need fewer samples
    val ns = rows.map(_.getAs[Long]("n_per_arm"))
    assert(ns(0) > ns(1) && ns(1) > ns(2))
    val li = graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag").collect().map(_.getString(0))
    val p1 = li.count(_ == "R").toDouble / li.length
    rows.foreach { r =>
      val mde = r.getAs[Double]("mde")
      val p2 = p1 + mde
      val pbar = (p1 + p2) / 2
      val expect = math.ceil(math.pow(
        1.959964 * math.sqrt(2 * pbar * (1 - pbar)) +
          0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) /
        (mde * mde)).toLong
      assert(r.getAs[Long]("n_per_arm") == expect)
      assert(math.abs(r.getAs[Double]("baseline_rate") - p1) < 1e-5)
    }
  }
}
