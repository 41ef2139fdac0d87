package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the DivergenceQueries batch (round-7
  * first pass): ANOVA recomputation, JSD bounds + recomputation, SRM
  * count conservation, drawdown brute-force agreement, and a full
  * local label-propagation replay.
  */
class DivergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("anova: F recomputes from a local exact-moment fold") {
    val r = SparkEntry.queries("q_stats_anova")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val xs = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val n = xs.length.toLong
    val groups = xs.groupBy(_._1).values.toSeq
    assert(row.getAs[Long]("k") == groups.size)
    assert(row.getAs[Long]("n") == n)
    val mean = xs.map(_._2).sum.toDouble / n
    val ssb = groups.map { g =>
      val m = g.map(_._2).sum.toDouble / g.length
      g.length * (m - mean) * (m - mean)
    }.sum
    val ssw = groups.map { g =>
      val s = g.map(_._2).sum.toDouble
      g.map(v => (v._2 * v._2).toDouble).sum - s * s / g.length
    }.sum
    val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(math.abs(row.getAs[Double]("ss_between") - ssb) / ssb < 1e-9)
    assert(math.abs(row.getAs[Double]("ss_within") - ssw) / ssw < 1e-9)
    assert(math.abs(row.getAs[Double]("f_stat") - f) / f < 1e-9)
  }

  test("jsd: bounded by ln 2, recomputes from half counts") {
    val r = SparkEntry.queries("q_stats_js_divergence")(spark, sf)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val jsd = row.getAs[Double]("jsd_nats")
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-12)
    val norm = row.getAs[Double]("jsd_norm")
    assert(norm >= 0.0 && norm <= 1.0 + 1e-12)
    val ev = graft.engine.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts_us) tu").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val na = ev.count(_._2 < mid).toDouble
    val nb = ev.count(_._2 >= mid).toDouble
    assert(row.getAs[Long]("na") == na.toLong)
    assert(row.getAs[Long]("nb") == nb.toLong)
    val types = ev.map(_._1).distinct
    val local = types.map { t =>
      val pa = ev.count(e => e._1 == t && e._2 < mid) / na
      val pb = ev.count(e => e._1 == t && e._2 >= mid) / nb
      val m = (pa + pb) / 2
      (if (pa > 0) pa * math.log(pa / m) else 0.0) / 2 +
        (if (pb > 0) pb * math.log(pb / m) else 0.0) / 2
    }.sum
    assert(math.abs(jsd - local) < 1e-6)
  }

  test("srm: arm counts conserve distinct users; chi2 recomputes") {
    val rows = SparkEntry.queries("q_stats_srm")(spark, sf).collect()
    val ev = graft.engine.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val bySeg = ev.groupBy(_._1).map { case (k, v) =>
      (k, v.map(_._2).distinct) }
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val users = if (seg == "ALL") ev.map(_._2).distinct
        else bySeg(seg)
      val na = users.count(_ % 2 == 0).toLong
      val nb = users.count(_ % 2 == 1).toLong
      assert(r.getAs[Long]("n_a") == na, s"seg $seg n_a")
      assert(r.getAs[Long]("n_b") == nb, s"seg $seg n_b")
      val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-6)
      assert(r.getAs[Int]("srm_flag") == (if (chi2 > 3.841459) 1 else 0))
    }
    assert(rows.map(_.getAs[String]("segment")).contains("ALL"))
  }

  test("drawdown: brute-force daily scan agrees") {
    val r = SparkEntry.queries("q_ts_drawdown")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val daily = graft.engine.Tables.t(spark, sf, "orders")
      .selectExpr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 d",
        "o_totalprice v").collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    var peak = BigDecimal(0)
    var best = (BigDecimal(-1), 0L, BigDecimal(0), BigDecimal(0))
    daily.foreach { case (d, v) =>
      if (v > peak) peak = v
      val dd = peak - v
      if (dd > best._1) best = (dd, d, peak, v)
    }
    assert(row.getAs[Long]("trough_day") == best._2)
    assert(math.abs(row.getAs[Double]("max_drawdown") -
      best._1.toDouble) < 1e-6)
    assert(math.abs(row.getAs[Double]("peak_rev") -
      best._3.toDouble) < 1e-6)
    assert(row.getAs[Long]("peak_day") <= row.getAs[Long]("trough_day"))
    // peak day really attains the peak value
    val peakDayVal = daily.toMap.apply(row.getAs[Long]("peak_day"))
    assert(peakDayVal == best._3)
  }

  test("label propagation: full local 2-round replay matches") {
    val rows = SparkEntry.queries("q_graph_label_prop")(spark, sf)
      .collect().map(r =>
        (r.getAs[Long]("community"), r.getAs[Long]("n_members")))
    val e = graft.queries.GraphMediaQueries.affinityEdges(spark, sf)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val ed = e ++ e.map(p => (p._2, p._1))
    val adj = ed.groupBy(_._1).map { case (v, n) => (v, n.map(_._2)) }
    var lab = adj.keys.map(v => (v, v)).toMap
    for (_ <- 1 to 2) {
      lab = adj.map { case (v, ns) =>
        val cnt = ns.map(lab).groupBy(identity)
          .map { case (l, o) => (l, o.size) }
        val bestC = cnt.values.max
        (v, cnt.filter(_._2 == bestC).keys.min)
      }
    }
    val local = lab.values.groupBy(identity)
      .map { case (l, o) => (l, o.size.toLong) }
    assert(rows.toMap == local)
    assert(rows.map(_._2).sum == adj.size)
  }
}
