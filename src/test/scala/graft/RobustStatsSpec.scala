package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the RobustStatsQueries batch. */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def lineitems: Array[(String, Long, Long)] =
    graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))

  test("theil-sen: weighted median of pairwise cell slopes, recomputed") {
    val rows = SparkEntry.queries("q_stats_theil_sen")(spark, sf).collect()
    assert(rows.length == 3)
    val li = lineitems
    rows.foreach { row =>
      val rf = row.getAs[String]("l_returnflag")
      val cells = li.filter(_._1 == rf).groupBy(t => (t._2, t._3))
        .map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSeq
      val slopes = (for {
        a <- cells; b <- cells if a._1 < b._1
      } yield ((b._2 - a._2).toDouble / (b._1 - a._1).toDouble,
        a._3 * b._3))
        .groupBy(_._1).map { case (sl, ws) => (sl, ws.map(_._2).sum) }
        .toSeq.sortBy(_._1)
      val wt = slopes.map(_._2).sum
      assert(row.getAs[Long]("n_pairs") == wt)
      var cum = 0L
      val med = slopes.find { case (_, w) =>
        cum += w; cum >= (wt + 1) / 2.0
      }.get._1
      assert(math.abs(row.getAs[Double]("theil_sen_slope") - med) < 1e-8)
    }
  }

  test("mann-whitney: U and z recompute from the value counts") {
    val row = SparkEntry.queries("q_stats_mannwhitney")(spark, sf)
      .collect().head
    val li = lineitems.filter(t => t._1 == "R" || t._1 == "A")
    val nr = li.count(_._1 == "R").toLong
    val na = li.count(_._1 == "A").toLong
    assert(row.getAs[Long]("n_r") == nr)
    assert(row.getAs[Long]("n_a") == na)
    // U = #{(r,a): qr > qa} + #{ties}/2, brute-forced from value counts
    val cr = li.filter(_._1 == "R").groupBy(_._2)
      .map { case (v, g) => (v, g.length.toLong) }
    val ca = li.filter(_._1 == "A").groupBy(_._2)
      .map { case (v, g) => (v, g.length.toLong) }
    var u2 = 0L
    for ((vr, nrv) <- cr; (va, nav) <- ca) {
      if (vr > va) u2 += 2 * nrv * nav
      else if (vr == va) u2 += nrv * nav
    }
    assert(math.abs(row.getAs[Double]("u") - u2 / 2.0) < 1e-9)
    val n = nr + na
    val pooled = li.groupBy(_._2).map(_._2.length.toLong)
    val ties = pooled.map(c => c * c * c - c).sum
    val sigma = math.sqrt(nr.toDouble * na / 12.0 *
      ((n + 1).toDouble - ties.toDouble / (n.toDouble * (n - 1))))
    val z = (u2 / 2.0 - nr.toDouble * na / 2.0) / sigma
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-5)
  }

  test("zipf fit: slope recomputes from the top-100 term frequencies") {
    val rows = SparkEntry.queries("q_text_zipf_fit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { row =>
      val lang = row.getAs[String]("lang")
      val freqs = docs.filter(_._1 == lang).flatMap(_._2.split(" ", -1))
        .groupBy(identity).toSeq
        .map { case (term, g) => (term, g.length.toLong) }
        .sortBy { case (term, f) => (-f, term) }.take(100)
      assert(row.getAs[Long]("n_terms") == freqs.length.toLong)
      val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
        (BigDecimal(math.log(i + 1.0)).setScale(8,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(math.log(f.toDouble)).setScale(8,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val got = row.getAs[Double]("zipf_slope")
      assert(got < 0.0, "zipf slope must be negative")
      assert(math.abs(got - slope) < 1e-4)
    }
  }

  test("woe: per-bin weight of evidence and IV recompute") {
    val rows = SparkEntry.queries("q_feat_woe")(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    val li = lineitems
    val bins = li.groupBy(t => (t._2 - 1) / 5).map { case (b, g) =>
      (b, g.length.toLong, g.count(_._1 == "R").toLong)
    }.toSeq.sortBy(_._1)
    val tp = bins.map(_._3).sum.toDouble
    val tn = bins.map(b => b._2 - b._3).sum.toDouble
    assert(rows.length == bins.length)
    var iv = BigDecimal(0)
    val expected = bins.map { case (b, n2, np) =>
      val gs = np / tp; val bs = (n2 - np) / tn
      val woe = BigDecimal(math.log(gs / bs)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      iv += BigDecimal((gs - bs) * woe).setScale(8,
        BigDecimal.RoundingMode.HALF_UP)
      (b, n2, np, woe)
    }
    (rows, expected).zipped.foreach { case (r, (b, n2, np, woe)) =>
      assert(r.getAs[Long]("bin") == b)
      assert(r.getAs[Long]("n") == n2)
      assert(r.getAs[Long]("n_pos") == np)
      assert(math.abs(r.getAs[Double]("woe") - woe) < 1e-9)
      assert(math.abs(r.getAs[Double]("iv") - iv.toDouble) < 1e-5)
    }
  }

  test("cohens d: standardized mean difference recomputes") {
    val row = SparkEntry.queries("q_stats_cohens_d")(spark, sf)
      .collect().head
    val o = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val u = o.filter(_._1 == "1-URGENT").map(_._2)
    val l = o.filter(_._1 == "5-LOW").map(_._2)
    assert(row.getAs[Long]("n_urgent") == u.length.toLong)
    assert(row.getAs[Long]("n_low") == l.length.toLong)
    def stats(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum)
    }
    val (mu, ssu) = stats(u); val (ml, ssl) = stats(l)
    val sp = math.sqrt((ssu + ssl) / (u.length + l.length - 2))
    val d = (mu - ml) / sp
    assert(math.abs(row.getAs[Double]("mean_urgent") - mu) < 1e-2)
    assert(math.abs(row.getAs[Double]("mean_low") - ml) < 1e-2)
    assert(math.abs(row.getAs[Double]("cohens_d") - d) < 1e-4)
  }
}
