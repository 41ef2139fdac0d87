package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the RetentionEvalQueries batch (round-7
  * eighth pass): recall local recomputation + MAP consistency, and
  * repeat-rate conservation.
  */
class RetentionEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("recall@10: local recomputation; consistent with MAP substrate") {
    val rows = SparkEntry.queries("q_ml_recall_at_k")(spark, sf)
      .collect()
    val ev = graft.engine.Tables.events(spark, sf)
      .select("user_id", "event_id", "value", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3) == "purchase"))
    val byUser = ev.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val evs = byUser(u).sortBy(e => (-e._3, e._2))
      val nRel = evs.count(_._4).toLong
      val hits = evs.take(10).count(_._4).toLong
      assert(r.getAs[Long]("n_rel") == nRel && nRel >= 1)
      assert(r.getAs[Long]("hits10") == hits, s"user $u")
      assert(math.abs(r.getAs[Double]("recall10") -
        hits.toDouble / nRel) < 1e-12)
    }
    // same user universe as MAP
    val mapUsers = SparkEntry.queries("q_ml_map_at_k")(spark, sf)
      .collect().map(_.getAs[Long]("user_id")).toSet
    assert(rows.map(_.getAs[Long]("user_id")).toSet == mapUsers)
  }

  test("repeat rate: buyer and order counts conserve") {
    val rows = SparkEntry.queries("q_orders_repeat_rate")(spark, sf)
      .collect()
    val orders = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.length)
    assert(rows.map(_.getAs[Long]("n_buyers")).sum ==
      orders.distinct.length)
    val perCust = orders.groupBy(identity).map { case (_, v) => v.length }
    val repeats = perCust.count(_ >= 2).toLong
    assert(rows.map(_.getAs[Long]("repeat_buyers")).sum == repeats)
    rows.foreach { r =>
      assert(r.getAs[Long]("repeat_buyers") <= r.getAs[Long]("n_buyers"))
      val rr = r.getAs[Long]("repeat_buyers").toDouble /
        r.getAs[Long]("n_buyers")
      assert(math.abs(r.getAs[Double]("repeat_rate") - rr) < 1e-12)
    }
  }
}
