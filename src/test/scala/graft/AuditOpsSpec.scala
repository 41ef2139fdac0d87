package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the AuditOpsQueries batch. */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("bellman3: distances match a local 3-round relaxation") {
    val got = SparkEntry.queries("q_graph_bellman3")(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    val ek = graft.engine.Tables.events(spark, sf)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1000000L))
    val edges = ek.flatMap { case (u, k) => Seq((u, k), (k, u)) }
      .map { case (s0, d0) => (s0, d0, (s0 + d0) % 97 + 1) }
    var dist = edges.map(_._1).filter(_ <= 3L).distinct
      .map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = edges.flatMap { case (s0, d0, w) =>
        dist.get(s0).map(ds => d0 -> (ds + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).min }
    }
    assert(got == dist)
    // triangle sanity: distances are monotone in rounds (subset rule)
    assert(got.values.forall(_ >= 0))
  }

  test("double charge: every reported pair is same-customer within 2 days") {
    val rows = SparkEntry.queries("q_audit_double_charge")(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = graft.engine.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("d")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val seen = rows.map { r =>
      val (ok1, ok2) = (r.getAs[Long]("ok1"), r.getAs[Long]("ok2"))
      val ((c1, d1), (c2, d2)) = (orders(ok1), orders(ok2))
      assert(c1 == c2 && c1 == r.getAs[Long]("ck"))
      assert(ok1 < ok2)
      assert(math.abs(d1 - d2) <= 2 &&
        math.abs(d1 - d2) == r.getAs[Long]("day_gap"))
      assert(r.getAs[Double]("amount_delta") >= 0.0)
      (ok1, ok2)
    }.toSet
    // completeness: brute-force count matches
    val byCust = orders.toSeq.groupBy(_._2._1)
    val want = byCust.values.flatMap { os =>
      for {
        a <- os; b <- os
        if a._1 < b._1 && math.abs(a._2._2 - b._2._2) <= 2
      } yield (a._1, b._1)
    }.toSet
    assert(seen == want)
  }

  test("abandonment: rates recompute and bound in [0,1]") {
    val rows = SparkEntry.queries("q_sessions_abandonment")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("abandon_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == r.getAs[Long]("n_abandoned").toDouble /
        r.getAs[Long]("n_click_sessions"))
      assert(r.getAs[Long]("n_abandoned") <=
        r.getAs[Long]("n_click_sessions"))
    }
  }
}
