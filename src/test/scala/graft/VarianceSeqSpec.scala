package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the VarianceSeqQueries batch (round-7
  * fourth pass): Brown–Forsythe local recomputation, Q–Q monotonicity
  * + element membership, log-loss local recomputation + bounds, and
  * trigram path conservation.
  */
class VarianceSeqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("levene: W recomputes from a local median-deviation fold") {
    val row = SparkEntry.queries("q_stats_levene")(spark, sf)
      .collect().head
    val xs = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    def median(v: Seq[BigDecimal]): BigDecimal = {
      // percentile_disc(0.5): smallest element with cume_dist >= 0.5
      val s = v.sorted
      s(math.ceil(s.length * 0.5).toInt - 1)
    }
    val groups = xs.groupBy(_._1).values.map { g =>
      val m = median(g.map(_._2).toSeq)
      g.map(v => (v._2 - m).abs)
    }.toSeq
    val all = groups.flatten
    val n = all.length.toLong
    val mean = all.sum.toDouble / n
    val ssb = groups.map { g =>
      val m = g.map(_.toDouble).sum / g.length
      g.length * (m - mean) * (m - mean) }.sum
    val ssw = groups.map { g =>
      val s = g.sum.toDouble
      g.map(v => (v * v).toDouble).sum - s * s / g.length }.sum
    val w = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("w_stat") - w) / w < 1e-9)
  }

  test("qq: decile values are real elements and monotone") {
    val rows = SparkEntry.queries("q_stats_qq")(spark, sf).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 9)
    val xs = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0),
        BigDecimal(x.getDouble(1)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    val urgent = xs.filter(_._1 == "1-URGENT").map(_._2).toSet
    val low = xs.filter(_._1 == "5-LOW").map(_._2).toSet
    rows.foreach { r =>
      assert(urgent.contains(r.getAs[Double]("urgent_val")))
      assert(low.contains(r.getAs[Double]("low_val")))
      assert(math.abs(r.getAs[Double]("gap") -
        (r.getAs[Double]("urgent_val") - r.getAs[Double]("low_val")))
        < 1e-4)
    }
    val uv = rows.map(_.getAs[Double]("urgent_val"))
    assert(uv.zip(uv.tail).forall { case (a, b) => a <= b })
  }

  test("logloss: local recomputation; skill consistent") {
    val row = SparkEntry.queries("q_ml_logloss")(spark, sf)
      .collect().head
    val ev = graft.engine.Tables.events(spark, sf)
      .select("value", "event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val n = ev.length
    val ll = ev.map { case (v, y) =>
      val p = math.min(math.max(v / (v + 100.0), 1e-6), 1 - 1e-6)
      -((if (y) 1.0 else 0.0) * math.log(p) +
        (if (y) 0.0 else 1.0) * math.log(1 - p))
    }.sum / n
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("logloss") - ll) < 1e-6)
    val rate = ev.count(_._2).toDouble / n
    val base = -(rate * math.log(rate) + (1 - rate) * math.log(1 - rate))
    assert(math.abs(row.getAs[Double]("baseline_logloss") - base) < 1e-9)
    assert(math.abs(row.getAs[Double]("skill") -
      (1.0 - row.getAs[Double]("logloss") / base)) < 1e-9)
  }

  test("trigram paths: counts conserve against a local window replay") {
    val rows = SparkEntry.queries("q_seq_path_trigrams")(spark, sf)
      .collect()
    val ev = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts_us) tu",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val local = ev.groupBy(_._1).values.flatMap { u =>
      val s = u.sortBy(e => (e._3, e._2)).map(_._4)
      s.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    val topLocal = local.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(rows.length)
    rows.sortBy(r => (-r.getAs[Long]("n"), r.getAs[String]("path")))
      .zip(topLocal).foreach { case (r, (p, c)) =>
        assert(r.getAs[String]("path") == p)
        assert(r.getAs[Long]("n") == c)
      }
    val total = local.values.sum.toDouble
    rows.foreach(r => assert(math.abs(r.getAs[Double]("share") -
      r.getAs[Long]("n") / total) < 1e-12))
  }
}
