package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ControlQueries batch (round-7 second
  * pass): SPC breach soundness+completeness, Brier/calibration local
  * recomputation, t-closeness TV recomputation+completeness, and
  * centroid-distance geometry.
  */
class ControlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def dailyRevenue(): Seq[(Long, BigDecimal)] =
    graft.engine.Tables.t(spark, sf, "orders")
      .selectExpr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 d",
        "o_totalprice v").collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)

  test("spc: reported breaches are sound and rule-1 complete") {
    val rows = SparkEntry.queries("q_ts_spc")(spark, sf).collect()
    val daily = dailyRevenue()
    val n = daily.length
    val xs = daily.map(_._2.toDouble)
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => x * x).sum / n - mean * mean)
    val r1days = daily.filter { case (_, v) =>
      math.abs(v.toDouble - mean) > 3 * sd }.map(_._1).toSet
    val reported = rows.map(r => (r.getAs[Long]("day"),
      r.getAs[Int]("rule1"), r.getAs[Int]("rule2")))
    reported.foreach { case (d, r1, r2) =>
      assert(r1 == 1 || r2 == 1, s"day $d flagged without a rule")
      if (r1 == 1) assert(r1days.contains(d), s"day $d rule1 unsound")
    }
    // completeness: every local rule-1 day appears flagged
    val flaggedR1 = reported.filter(_._2 == 1).map(_._1).toSet
    assert(r1days == flaggedR1)
  }

  test("calibration: bins recompute locally; rates bounded") {
    val rows = SparkEntry.queries("q_ml_calibration")(spark, sf)
      .collect()
    val ev = graft.engine.Tables.events(spark, sf)
      .select("value", "event_type").collect()
      .map(x => (x.getDouble(0), x.getString(1) == "purchase"))
    val byBin = ev.map { case (v, y) =>
      val p = v / (v + 100.0)
      (math.floor(p * 10).toLong, p, if (y) 1 else 0)
    }.groupBy(_._1)
    assert(rows.map(_.getAs[Long]("bin")).toSet == byBin.keySet)
    rows.foreach { r =>
      val g = byBin(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n") == g.length)
      val obs = g.map(_._3).sum.toDouble / g.length
      val pred = g.map(_._2).sum / g.length
      val brier = g.map(x => (x._2 - x._3) * (x._2 - x._3)).sum / g.length
      assert(math.abs(r.getAs[Double]("obs_rate") - obs) < 1e-9)
      assert(math.abs(r.getAs[Double]("avg_pred") - pred) < 1e-6)
      assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-6)
      assert(r.getAs[Double]("avg_pred") >= 0 &&
        r.getAs[Double]("avg_pred") <= 1)
    }
  }

  test("t-closeness: TV recomputes; every skewed group reported") {
    val rows = SparkEntry.queries("q_privacy_tcloseness")(spark, sf)
      .collect().map(r => ((r.getAs[Int]("c_nationkey"),
        r.getAs[Long]("bal_bucket")),
        (r.getAs[Long]("k"), r.getAs[Double]("t_closeness")))).toMap
    val cust = graft.engine.Tables.t(spark, sf, "customer")
      .selectExpr("c_nationkey",
        "CAST(floor(c_acctbal / 1000) AS LONG) bb", "c_mktsegment")
      .collect()
      .map(x => ((x.getInt(0), x.getLong(1)), x.getString(2)))
    val n = cust.length.toLong
    val globMix = cust.groupBy(_._2).map { case (s, v) =>
      (s, v.length.toLong) }
    val local = cust.groupBy(_._1).map { case (qi, members) =>
      val ng = members.length.toLong
      val mix = members.groupBy(_._2).map { case (s, v) =>
        (s, v.length.toLong) }
      val tvnum = globMix.map { case (s, ns) =>
        math.abs(mix.getOrElse(s, 0L) * n - ns * ng) }.sum
      (qi, (ng, tvnum.toDouble / (2.0 * ng * n)))
    }
    val expected = local.filter(_._2._2 > 0.3)
    assert(rows.keySet == expected.keySet)
    rows.foreach { case (qi, (k, tv)) =>
      assert(k == expected(qi)._1)
      assert(math.abs(tv - expected(qi)._2) < 1e-9, s"qi $qi")
    }
  }

  test("centroid distances: local recomputation, full pair coverage") {
    val rows = SparkEntry.queries("q_emb_centroid_dist")(spark, sf)
      .collect().map(r => ((r.getAs[Int]("la"), r.getAs[Int]("lb")),
        r.getAs[Double]("dist"))).toMap
    val em = graft.engine.Tables.t(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
    val cents = em.groupBy(_._1).map { case (l, vs) =>
      val n = vs.length
      (l, (0 until 64).map(d => vs.map(_._2(d)).sum / n))
    }
    val labels = cents.keys.toSeq.sorted
    assert(rows.size == labels.size * (labels.size - 1) / 2)
    for (a <- labels; b <- labels if a < b) {
      val d = math.sqrt((0 until 64).map(i =>
        math.pow(cents(a)(i) - cents(b)(i), 2)).sum)
      assert(math.abs(rows((a, b)) - d) < 1e-6, s"pair ($a,$b)")
      assert(rows((a, b)) > 0.0)
    }
  }
}
