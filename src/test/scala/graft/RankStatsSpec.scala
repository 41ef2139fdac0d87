package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the RankStatsQueries batch — each query is
  * re-derived locally from collected fixture rows, independently of the
  * DataFrame formulation (the DuckDB oracle checks cross-engine
  * equality; these check the MATH).
  */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("spearman: matches a local average-rank recomputation, |rho| <= 1") {
    val rows = SparkEntry.queries("q_stats_spearman")(spark, sf).collect()
    assert(rows.length == 3)
    val li = graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))
    def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.distinct.map { v =>
        val less = sorted.count(_ < v)
        val eq = sorted.count(_ == v)
        v -> (less + (eq + 1) / 2.0)
      }.toMap
    }
    rows.foreach { r =>
      val rf = r.getAs[String]("l_returnflag")
      val g = li.filter(_._1 == rf)
      assert(r.getAs[Long]("n") == g.length.toLong)
      val rx = avgRanks(g.map(_._2))
      val ry = avgRanks(g.map(_._3))
      val n = g.length
      val mean = (n + 1) / 2.0
      val xs = g.map(t => rx(t._2) - mean)
      val ys = g.map(t => ry(t._3) - mean)
      val num = (xs, ys).zipped.map(_ * _).sum
      val den = math.sqrt(xs.map(x => x * x).sum * ys.map(y => y * y).sum)
      val rho = r.getAs[Double]("spearman")
      assert(math.abs(rho) <= 1.0 + 1e-12)
      assert(math.abs(rho - num / den) < 1e-9)
    }
  }

  test("cramers v: matches a local chi-square recomputation, v in [0,1]") {
    val r = SparkEntry.queries("q_stats_cramers_v")(spark, sf)
      .collect().head
    val o = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = o.length.toDouble
    val cells = o.groupBy(identity).map { case (k, v) => (k, v.length) }
    val ri = o.groupBy(_._1).map { case (k, v) => (k, v.length) }
    val cj = o.groupBy(_._2).map { case (k, v) => (k, v.length) }
    val chi2 = cells.map { case ((p, st), nij) =>
      val e = ri(p).toDouble * cj(st) / n
      (nij - e) * (nij - e) / e
    }.sum
    assert(r.getAs[Long]("n") == o.length.toLong)
    assert(r.getAs[Long]("n_rows_dim") == ri.size.toLong)
    assert(r.getAs[Long]("n_cols_dim") == cj.size.toLong)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-4)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    val expV = math.sqrt(chi2 / (n * (math.min(ri.size, cj.size) - 1)))
    assert(math.abs(v - expV) < 1e-4)
  }

  test("rolling corr: bounded, full-window-only, and locally recomputed") {
    val rows = SparkEntry.queries("q_ts_rolling_corr")(spark, sf)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val daily = graft.engine.Tables.t(spark, sf, "lineitem")
      .selectExpr(
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 as d",
        "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) =>
        (d, v.map(_._2).sum.toDouble, v.map(_._3).sum.toDouble)
      }.toSeq.sortBy(_._1)
    assert(rows.length == daily.length - 6)
    val byDay = rows.map(r =>
      r.getAs[Long]("day") -> r.getAs[Double]("corr_7d")).toMap
    daily.sliding(7).foreach { wnd =>
      if (wnd.length == 7) {
        val xs = wnd.map(_._2); val ys = wnd.map(_._3)
        val n = 7.0
        val num = n * (xs, ys).zipped.map(_ * _).sum - xs.sum * ys.sum
        val den = math.sqrt(
          (n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
            (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
        val got = byDay(wnd.last._1)
        assert(math.abs(got) <= 1.0 + 1e-9)
        assert(math.abs(got - num / den) < 1e-6)
      }
    }
  }

  test("weighted sample: exact A-ES top-10 per language") {
    val rows = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)
    def key(docId: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 16777217.0d
      math.log(u) / w
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.toSeq.map(d => (lang, d._1, d._3, key(d._1, d._3)))
        .sortBy(t => (-t._4, t._2)).take(10).zipWithIndex
        .map { case ((l, id, nc, _), i) => ((l, i + 1L), (id, nc)) }
    }.toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[Long]("rk"))
      val (id, nc) = expected(k)
      assert(r.getAs[Long]("doc_id") == id, s"at $k")
      assert(r.getAs[Long]("n_chars") == nc)
    }
    assert(rows.length == expected.size)
  }

  test("kcore3: matches a local 3-round peel; survivors keep real edges") {
    val rows = SparkEntry.queries("q_graph_kcore3")(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg"))).toMap
    val ek = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "cast(get_json_object(props, '$.k') as long) as k")
      .where("k is not null").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1000000L))
    var edges: Seq[(Long, Long)] =
      ek.map(e => (e._1, e._2)) ++ ek.map(e => (e._2, e._1))
    for (_ <- 1 to 3) {
      val deg = edges.groupBy(_._1).map { case (k, v) => (k, v.length) }
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val local = edges.groupBy(_._1)
      .map { case (k, v) => (k, v.length.toLong) }
    assert(rows == local)
    assert(rows.values.forall(_ >= 1L))
  }
}
