package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the MonitorQueries batch (round-7 seventh
  * pass): peak soundness+completeness, runs-test local replay, and
  * fairness-audit recomputation.
  */
class MonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def daily(): Seq[(Long, BigDecimal)] =
    graft.engine.Tables.t(spark, sf, "orders")
      .selectExpr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 d",
        "o_totalprice v").collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)

  test("peaks: sound and complete against a local scan") {
    val rows = SparkEntry.queries("q_ts_peak_detect")(spark, sf)
      .collect().map(_.getAs[Long]("day")).toSet
    val d = daily()
    val expected = (3 until d.length - 3).filter { i =>
      val r = d(i)._2
      val s7 = (i - 3 to i + 3).map(d(_)._2).sum.toDouble
      r > d(i - 1)._2 && r > d(i + 1)._2 &&
        r.toDouble / (s7 / 7.0) > 1.15
    }.map(d(_)._1).toSet
    assert(rows == expected)
  }

  test("runs test: local replay of runs/counts/z") {
    val r = SparkEntry.queries("q_stats_runs_test")(spark, sf)
      .collect().head
    val d = daily()
    val med = d.map(_._2).sorted.apply(
      math.ceil(d.length * 0.5).toInt - 1)
    val signs = d.filter(_._2 != med).map(_._2 > med)
    val runs = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
    val n1 = signs.count(identity).toLong
    val n2 = signs.length - n1
    assert(r.getAs[Long]("runs") == runs)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    val er = 2.0 * n1 * n2 / (n1 + n2) + 1
    val vr = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1))
    val z = (runs - er) / math.sqrt(vr)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
    assert(r.getAs[Int]("looks_random") ==
      (if (math.abs(z) <= 1.96) 1 else 0))
  }

  test("fairness: rates recompute; exactly one nation at ratio 1") {
    val rows = SparkEntry.queries("q_ml_fairness_dpr")(spark, sf)
      .collect()
    assert(rows.length == 25)
    val ratios = rows.map(_.getAs[Double]("impact_ratio"))
    assert(ratios.forall(x => x > 0 && x <= 1.0 + 1e-12))
    assert(ratios.count(x => math.abs(x - 1.0) < 1e-12) >= 1)
    rows.foreach { r =>
      val rate = r.getAs[Long]("pos").toDouble / r.getAs[Long]("n")
      assert(math.abs(r.getAs[Double]("rate") - rate) < 1e-12)
      assert(r.getAs[Int]("di_flag") ==
        (if (r.getAs[Double]("impact_ratio") < 0.8) 1 else 0))
    }
    // conservation: per-nation order counts sum to the orders table
    val total = graft.engine.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
  }
}
