package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the FeatureQueries batch. */
class FeatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("feature hashing: buckets match a local md5 recomputation") {
    val got = SparkEntry.queries("q_ml_feature_hashing")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(got.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(term: String): Long = {
      val hex = md.digest(term.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val alpha = "0123456789abcdef"
      ((alpha.indexOf(hex(0)) * 16 + alpha.indexOf(hex(1))) % 64).toLong
    }
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 100 === 0)
      .select("doc_id", "text").collect()
    val expected = docs.flatMap { r =>
      r.getAs[String]("text").split(" ")
        .map(t => (r.getAs[Long]("doc_id"), bucket(t)))
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(got == expected)
    assert(got.keys.forall { case (_, b) => b >= 0 && b < 64 })
  }

  test("downsample: picks the bucket's farthest-from-mean event") {
    val rows = SparkEntry.queries("q_ts_downsample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("event_id"), col("value"),
        (unix_micros(col("ts_us")) / 3600000000L).cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byB = ev.groupBy(_._3)
    assert(rows.length == byB.size) // one row per non-empty bucket
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val xs = byB(b)
      assert(r.getAs[Long]("n") == xs.length.toLong)
      val mean = xs.map(_._2).sum / xs.length
      val best = xs.map { case (id, v, _) =>
        (math.abs(v - mean), id, v)
      }.sortBy(x => (-x._1, x._2)).head
      // decimal-exact engine criterion agrees with the double check
      // up to 4-decimal quantization: assert the picked event's
      // deviation is within one quantum of the local optimum
      val picked = xs.find(_._1 == r.getAs[Long]("event_id")).get
      assert(math.abs(picked._2 - mean) >= best._1 - 2e-4 * xs.length)
    }
  }

  test("try-safe: null counts recompute from the raw frame") {
    val r = SparkEntry.queries("q_fn_try_safe")(spark, sf).collect()(0)
    val o = graft.engine.Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderpriority")).collect()
    val nDivNull = o.count(_.getLong(0) % 3 == 0).toLong
    val nPrio = o.count(r0 =>
      r0.getString(1).take(1).forall(_.isDigit) && r0.getString(1).nonEmpty)
      .toLong
    assert(r.getAs[Long]("n") == o.length.toLong)
    assert(r.getAs[Long]("n_div_null") == nDivNull)
    assert(r.getAs[Long]("n_prio_parsed") == nPrio)
    assert(r.getAs[Long]("n_status_null") == o.length.toLong) // no int statuses
    assert(r.getAs[Double]("sum_safe") > 0.0)
  }

  test("grouping id: levels partition the rollup, flags consistent") {
    val rows = SparkEntry.queries("q_agg_grouping_id")(spark, sf).collect()
    val total = graft.engine.Tables.t(spark, sf, "orders").count()
    // each rollup level independently sums to the table count
    Seq(0L, 1L, 3L).foreach { gid =>
      val lvl = rows.filter(_.getAs[Long]("gid") == gid)
      assert(lvl.map(_.getAs[Long]("n")).sum == total, s"gid=$gid")
    }
    rows.foreach { r =>
      val gid = r.getAs[Long]("gid")
      assert(Seq(0L, 1L, 3L).contains(gid)) // rollup levels only
      assert(r.getAs[Long]("g_status") == (if (gid == 3) 1L else 0L))
      if (gid >= 1) assert(r.getAs[String]("priority") == "ALL")
      if (gid == 3) assert(r.getAs[String]("status") == "ALL")
    }
  }
}
