package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the GovernanceQueries batch. */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("text roundtrip: equals the direct parquet aggregate") {
    val got = SparkEntry.queries("q_source_text_roundtrip")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = graft.engine.Tables.t(spark, sf, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want))
  }

  test("nth_value: top1 >= top2 >= top3, nulls only for small customers") {
    val rows = SparkEntry.queries("q_win_nth_value")(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = graft.engine.Tables.t(spark, sf, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cust = r.getAs[Long]("o_custkey")
      val n = orders(cust)
      val (t1, t2, t3) = (Option(r.getAs[java.lang.Double]("top1")),
        Option(r.getAs[java.lang.Double]("top2")),
        Option(r.getAs[java.lang.Double]("top3")))
      assert(t1.isDefined)
      assert(t2.isDefined == (n >= 2) && t3.isDefined == (n >= 3))
      for (a <- t2) assert(t1.get >= a)
      for (a <- t3; b <- t2) assert(b >= a)
    }
  }

  test("cat entropy: bounded by ln(n_types), zero iff single type") {
    val rows = SparkEntry.queries("q_stats_cat_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val k = r.getAs[Long]("n_types")
      assert(h >= 0.0)
      assert(h <= math.log(k.toDouble) + 1e-9)
      if (k == 1) assert(h == 0.0)
    }
  }

  test("abc analysis: classes partition customers, A-head dominates") {
    val rows = SparkEntry.queries("q_orders_abc_analysis")(spark, sf)
      .collect().map(r => r.getAs[String]("clazz") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Double]("class_rev")))).toMap
    val nCust = graft.engine.Tables.t(spark, sf, "orders")
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(rows.values.map(_._1).sum == nCust)
    // Pareto: the A class holds >= its proportional share of revenue
    val totRev = rows.values.map(_._2).sum
    val (na, ra) = rows("A")
    assert(ra / totRev >= na.toDouble / nCust)
    assert(rows.keySet.subsetOf(Set("A", "B", "C")))
  }

  test("l-diversity: reported groups really have < 3 distinct segments") {
    val rows = SparkEntry.queries("q_privacy_ldiversity")(spark, sf).collect()
    val cust = graft.engine.Tables.t(spark, sf, "customer")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("b"),
        col("c_mktsegment")).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getString(2)))
      .groupBy(_._1).map { case (k, xs) =>
        k -> (xs.length.toLong, xs.map(_._2).distinct.length.toLong) }
    rows.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[Long]("bal_bucket"))
      val (k, l) = cust(key)
      assert(l < 3 && r.getAs[Long]("l") == l && r.getAs[Long]("k") == k)
    }
    // completeness: every low-diversity group is reported
    val reported = rows.map(r =>
      (r.getAs[Int]("c_nationkey"), r.getAs[Long]("bal_bucket"))).toSet
    cust.foreach { case (key, (_, l)) =>
      if (l < 3) assert(reported(key), s"missing group $key")
    }
  }
}
