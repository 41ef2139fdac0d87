package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the AssocStatsQueries batch — local
  * re-derivations independent of the DataFrame formulations.
  */
class AssocStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("kendall: matches a local pairwise-concordance recomputation") {
    val rows = SparkEntry.queries("q_stats_kendall")(spark, sf).collect()
    assert(rows.length == 3)
    val li = graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))
    rows.foreach { row =>
      val rf = row.getAs[String]("l_returnflag")
      val g = li.filter(_._1 == rf)
      val cells = g.groupBy(t => (t._2, t._3))
        .map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSeq
      var conc = 0L; var disc = 0L
      for (a <- cells; b <- cells if a._1 < b._1) {
        if (a._2 < b._2) conc += a._3 * b._3
        else if (a._2 > b._2) disc += a._3 * b._3
      }
      val n = g.length.toLong
      val n0 = n * (n - 1) / 2
      def tiePairs(vs: Seq[Long]): Long =
        vs.groupBy(identity).values.map(g2 =>
          g2.length.toLong * (g2.length - 1) / 2).sum
      val t1 = tiePairs(g.map(_._2).toSeq)
      val t2 = tiePairs(g.map(_._3).toSeq)
      assert(row.getAs[Long]("n") == n)
      assert(row.getAs[Long]("conc") == conc)
      assert(row.getAs[Long]("disc") == disc)
      val tau = (conc - disc).toDouble /
        math.sqrt((n0 - t1).toDouble * (n0 - t2).toDouble)
      val got = row.getAs[Double]("kendall_tau_b")
      assert(math.abs(got) <= 1.0 + 1e-12)
      assert(math.abs(got - tau) < 1e-9)
    }
  }

  test("regression metrics: slope/intercept/rmse/mae/r2 recompute locally") {
    val rows = SparkEntry.queries("q_ml_regression_metrics")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val part = graft.engine.Tables.t(spark, sf, "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (part(r.getLong(0)), r.getDouble(1), r.getDouble(2)))
    rows.foreach { row =>
      val brand = row.getAs[String]("brand")
      val g = li.filter(_._1 == brand)
      val n = g.length.toDouble
      assert(row.getAs[Long]("n") == g.length.toLong)
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-4)
      assert(math.abs(row.getAs[Double]("intercept") - icept) < 1e-3)
      val resid = g.map(t => t._3 - icept - slope * t._2)
      val rmse = math.sqrt(resid.map(r => r * r).sum / n)
      val mae = resid.map(math.abs).sum / n
      assert(math.abs(row.getAs[Double]("rmse") - rmse) < 0.01)
      assert(math.abs(row.getAs[Double]("mae") - mae) < 0.01)
      assert(row.getAs[Double]("mae") <= row.getAs[Double]("rmse") + 1e-9)
      assert(row.getAs[Double]("r2") <= 1.0 + 1e-9)
    }
  }

  test("dp count: noise is the exact inverse-CDF Laplace transform") {
    val rows = SparkEntry.queries("q_privacy_dp_count")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(et.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val v = (java.lang.Long.parseLong(hex, 16) + 1).toDouble /
        16777217.0d - 0.5
      val noise = BigDecimal(-math.signum(v) * math.log(1.0 - 2.0 * math.abs(v)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("noise") - noise) < 1e-9)
      assert(math.abs(r.getAs[Double]("n_dp") -
        (r.getAs[Long]("n_true") + noise)) < 1e-5)
    }
  }

  test("hapax: type/token/hapax counts conserve vs a local tokenizer") {
    val rows = SparkEntry.queries("q_text_hapax")(spark, sf).collect()
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val terms = bySrc(src).flatMap(_._2.split(" ", -1))
      val counts = terms.groupBy(identity).map { case (_, v) => v.length }
      assert(r.getAs[Long]("n_tokens") == terms.length.toLong)
      assert(r.getAs[Long]("n_types") == counts.size.toLong)
      assert(r.getAs[Long]("n_hapax") == counts.count(_ == 1).toLong)
      assert(r.getAs[Double]("hapax_share") >= 0.0 &&
        r.getAs[Double]("hapax_share") <= 1.0)
    }
    assert(rows.map(_.getAs[String]("source")).toSet == bySrc.keySet)
  }

  test("crosscorr lag: 8 bounded lags, each a local Pearson recompute") {
    val rows = SparkEntry.queries("q_ts_crosscorr_lag")(spark, sf)
      .collect().sortBy(_.getAs[Long]("lag_days"))
    assert(rows.map(_.getAs[Long]("lag_days")).toSeq == (0L to 7L))
    val ship = graft.engine.Tables.t(spark, sf, "lineitem")
      .selectExpr(
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 as d",
        "l_extendedprice as v").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sum.toDouble) }
    val ordr = graft.engine.Tables.t(spark, sf, "orders")
      .selectExpr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 as d",
        "o_totalprice as v").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sum.toDouble) }
    rows.foreach { r =>
      val lagD = r.getAs[Long]("lag_days")
      val pairs = ordr.toSeq.flatMap { case (d, y) =>
        ship.get(d + lagD).map(x => (x, y))
      }
      assert(r.getAs[Long]("n_days") == pairs.length.toLong)
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val got = r.getAs[Double]("xcorr")
      assert(math.abs(got) <= 1.0 + 1e-9)
      assert(math.abs(got - corr) < 1e-6)
    }
  }
}
