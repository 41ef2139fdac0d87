package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the SignalQueries batch (round-7 sixth
  * pass): PACF closed-form recomputation, a full BH step-up replay,
  * local bounded-BFS closeness agreement, and burstiness recompute.
  */
class SignalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def daily(): Seq[Double] =
    graft.engine.Tables.t(spark, sf, "orders")
      .selectExpr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 d",
        "o_totalprice v").collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).sum.toDouble)

  test("pacf: Durbin-Levinson closed form recomputes") {
    val rows = SparkEntry.queries("q_ts_pacf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("lag"),
        (r.getAs[Double]("acf"), r.getAs[Double]("pacf")))).toMap
    val xs = daily()
    def rho(k: Int): Double = {
      val pairs = xs.drop(k).zip(xs.dropRight(k))
      val n = pairs.length
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      (sxy - sx * sy / n) /
        math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    }
    val (r1, r2) = (rho(1), rho(2))
    assert(math.abs(rows(1L)._1 - r1) < 1e-6)
    assert(math.abs(rows(1L)._2 - r1) < 1e-6)
    assert(math.abs(rows(2L)._1 - r2) < 1e-6)
    assert(math.abs(rows(2L)._2 - (r2 - r1 * r1) / (1 - r1 * r1)) < 1e-6)
  }

  test("bh-fdr: step-up replay matches; rejections are a rank prefix") {
    val rows = SparkEntry.queries("q_stats_fdr_bh")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(rows.length == 25)
    // z recomputes from counts
    val totN = rows.map(_.getAs[Long]("n_i")).sum
    val totX = rows.map(_.getAs[Long]("x_i")).sum
    val p0 = totX.toDouble / totN
    rows.foreach { r =>
      val z = (r.getAs[Long]("x_i").toDouble / r.getAs[Long]("n_i") -
        p0) / math.sqrt(p0 * (1 - p0) / r.getAs[Long]("n_i"))
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
    }
    // |z| is non-increasing in rank; rejections form a prefix ending
    // at the largest rank whose |z| clears its threshold
    val zs = rows.map(r => math.abs(r.getAs[Double]("z")))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b - 1e-12 })
    val cutoff = rows.filter(r => math.abs(r.getAs[Double]("z")) >=
      r.getAs[Double]("threshold")).map(_.getAs[Long]("rnk"))
      .sorted.lastOption.getOrElse(0L)
    rows.foreach(r => assert(r.getAs[Int]("rejected") ==
      (if (r.getAs[Long]("rnk") <= cutoff) 1 else 0)))
  }

  test("closeness3: local bounded BFS agrees") {
    val rows = SparkEntry.queries("q_graph_closeness3")(spark, sf)
      .collect()
    val e = graft.queries.GraphMediaQueries.affinityEdges(spark, sf)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val adj = (e ++ e.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (v, n) => (v, n.map(_._2).toSet) }
    val local = adj.keys.map { v =>
      val d1 = adj(v)
      val d2 = d1.flatMap(adj(_)) -- d1 - v
      val d3 = d2.flatMap(adj(_)) -- d1 -- d2 - v
      (v, (6L * d1.size + 3L * d2.size + 2L * d3.size,
        (d1.size + d2.size + d3.size).toLong))
    }.toMap
    val expected = local.toSeq
      .sortBy { case (v, (c, _)) => (-c, v) }.take(rows.length)
    rows.zip(expected).foreach { case (r, (v, (c, reach))) =>
      assert(r.getAs[Long]("node") == v)
      assert(r.getAs[Long]("closeness6") == c)
      assert(r.getAs[Long]("reach3") == reach)
    }
  }

  test("burstiness: exact-count recompute; full vocabulary coverage") {
    val rows = SparkEntry.queries("q_text_term_burstiness")(spark, sf)
      .collect()
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nSrc = docs.map(_._1).distinct.length
    val counts = docs.flatMap { case (s, t) =>
      t.split(" ").map(w => (s, w)) }
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val byTerm = counts.groupBy(_._1._2)
    assert(rows.map(_.getAs[String]("term")).toSet == byTerm.keySet)
    rows.foreach { r =>
      val g = byTerm(r.getAs[String]("term")).values
      val s = g.sum; val q = g.map(c => c * c).sum
      assert(r.getAs[Long]("df_src") == g.size)
      assert(r.getAs[Long]("total") == s)
      val b = (nSrc * q - s * s).toDouble / (nSrc * s)
      assert(math.abs(r.getAs[Double]("burstiness") - b) < 1e-9)
    }
  }
}
