package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the EvalGraphQueries batch (round-7 third
  * pass): HITS local replay, Kaplan–Meier monotonicity + recompute,
  * AP@10 local recomputation, kappa recompute + bounds, and vocabulary
  * Jaccard brute-force agreement.
  */
class EvalGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("hits: two-iteration local replay matches the top list") {
    val rows = SparkEntry.queries("q_graph_hits")(spark, sf).collect()
    val e = graft.queries.GraphMediaQueries.affinityEdges(spark, sf)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val ed = e ++ e.map(p => (p._2, p._1))
    val a1 = ed.groupBy(_._2).map { case (v, l) => (v, l.size.toLong) }
    val h1 = ed.groupBy(_._1).map { case (v, l) =>
      (v, l.map(x => a1(x._2)).sum) }
    val a2 = ed.groupBy(_._2).map { case (v, l) =>
      (v, l.map(x => h1(x._1)).sum) }
    val tot = a2.values.sum.toDouble
    val expected = a2.toSeq.sortBy { case (v, a) => (-a, v) }
      .take(rows.length)
    rows.zip(expected).foreach { case (r, (v, a)) =>
      assert(r.getAs[Long]("node") == v)
      assert(r.getAs[Long]("auth2") == a)
      assert(r.getAs[Long]("hub1") == h1(v))
      assert(math.abs(r.getAs[Double]("auth_share") - a / tot) < 1e-12)
    }
  }

  test("kaplan-meier: at-risk/log-survival monotone, deaths conserve") {
    val rows = SparkEntry.queries("q_ts_kaplan_meier")(spark, sf)
      .collect().sortBy(_.getAs[Long]("h"))
    assert(rows.nonEmpty)
    val atRisk = rows.map(_.getAs[Long]("at_risk"))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => b <= a })
    val logs = rows.map(r => Option(r.get(
      r.fieldIndex("km_log_survival"))).map(_.asInstanceOf[Double]))
    val defined = logs.flatten
    assert(defined.zip(defined.tail).forall { case (a, b) =>
      b <= a + 1e-12 })
    assert(defined.forall(_ <= 1e-12))
    // deaths conserve: sum equals converted-user count
    val nConverted = graft.engine.Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("deaths")).sum == nConverted)
    // local recompute of the final defined log-survival
    var ls = 0.0
    rows.foreach { r =>
      val d = r.getAs[Long]("deaths"); val a = r.getAs[Long]("at_risk")
      if (d < a) {
        ls += BigDecimal(math.log((a - d).toDouble / a))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    assert(math.abs(defined.last - ls) < 1e-6)
  }

  test("map@10: local recomputation per user") {
    val rows = SparkEntry.queries("q_ml_map_at_k")(spark, sf).collect()
    val ev = graft.engine.Tables.events(spark, sf)
      .select("user_id", "event_id", "value", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3) == "purchase"))
    val byUser = ev.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val evs = byUser(u).sortBy(e => (-e._3, e._2))
      val nRel = evs.count(_._4).toLong
      assert(r.getAs[Long]("n_rel") == nRel && nRel >= 1)
      var cum = 0L; var apS = 0L
      evs.take(10).zipWithIndex.foreach { case (e, i) =>
        if (e._4) { cum += 1; apS += cum * (2520 / (i + 1)) }
      }
      assert(r.getAs[Long]("ap_scaled") == apS, s"user $u")
      val ap = apS.toDouble / (2520.0 * math.min(nRel, 10L))
      assert(math.abs(r.getAs[Double]("ap") - ap) < 1e-12)
      assert(r.getAs[Double]("ap") >= 0 && r.getAs[Double]("ap") <= 1)
    }
  }

  test("kappa: recomputes from the cells and stays in [-1, 1]") {
    val r = SparkEntry.queries("q_ml_cohen_kappa")(spark, sf)
      .collect().head
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val n = (tp + fp + fn + tn).toDouble
    val po = (tp + tn) / n
    val pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    val kappa = (po - pe) / (1.0 - pe)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-9)
    assert(kappa >= -1.0 - 1e-12 && kappa <= 1.0 + 1e-12)
    // the median threshold splits events into the table total
    val total = graft.engine.Tables.events(spark, sf).count()
    assert(tp + fp + fn + tn == total)
  }

  test("vocab overlap: brute-force jaccard agrees; full pair coverage") {
    val rows = SparkEntry.queries("q_source_vocab_overlap")(spark, sf)
      .collect()
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).map { case (s, d) =>
      (s, d.flatMap(_._2.split(" ")).toSet) }
    val sources = vocab.keys.toSeq.sorted
    assert(rows.length == sources.size * (sources.size - 1) / 2)
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("sa"), r.getAs[String]("sb"))
      val inter = (vocab(sa) & vocab(sb)).size.toLong
      assert(r.getAs[Long]("inter") == inter, s"pair ($sa,$sb)")
      assert(r.getAs[Long]("na") == vocab(sa).size.toLong)
      val j = inter.toDouble / (vocab(sa) | vocab(sb)).size
      assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-12)
    }
  }
}
