package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the MlEvalQueries batch. */
class MlEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("auc: matches a local brute-force pair count over bucketed scores") {
    val r = SparkEntry.queries("q_ml_auc")(spark, sf).collect()(0)
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("value"), col("event_type")).collect()
      .map(x => (math.floor(x.getDouble(0) * 1000.0).toLong,
        x.getString(1) == "purchase"))
    val pos = ev.filter(_._2).map(_._1)
    val neg = ev.filter(!_._2).map(_._1)
    var u2 = 0L
    for (p <- pos; n <- neg) {
      if (p > n) u2 += 2 else if (p == n) u2 += 1
    }
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    assert(r.getAs[Long]("u2") == u2)
    val auc = r.getAs[Double]("auc")
    assert(auc == u2.toDouble / (2.0 * pos.length * neg.length))
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("pr curve: recall never increases with the threshold, " +
    "positives conserved") {
    val rows = SparkEntry.queries("q_ml_pr_curve")(spark, sf)
      .collect().sortBy(_.getAs[Double]("q"))
    assert(rows.length == 9)
    val totP = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct
    assert(totP.length == 1) // tp+fn is the fixed positive count
    val recalls = rows.map(_.getAs[Double]("recl"))
    assert((recalls, recalls.tail).zipped.forall(_ >= _))
    rows.foreach { r =>
      assert(r.getAs[Double]("prec") >= 0.0 && r.getAs[Double]("prec") <= 1.0)
      val f1 = r.getAs[Double]("f1")
      val (p, rc) = (r.getAs[Double]("prec"), r.getAs[Double]("recl"))
      assert(f1 == 2.0 * p * rc / (p + rc))
    }
  }

  test("interval merge: equals a local sweep-line merge for every user") {
    val got = SparkEntry.queries("q_ts_interval_merge")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_intervals"), r.getAs[Long]("covered_us"),
          r.getAs[Long]("max_len_us")))).toMap
    val byUser = graft.engine.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts_us")).as("tu")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    val expected = byUser.map { case (u, ts) =>
      var islands = List.empty[(Long, Long)]
      for (t <- ts) {
        val (s0, e0) = (t, t + 1800000000L)
        islands match {
          case (s1, e1) :: rest if s0 <= e1 =>
            islands = (s1, math.max(e0, e1)) :: rest
          case _ => islands = (s0, e0) :: islands
        }
      }
      val lens = islands.map { case (a, b) => b - a }
      u -> ((islands.length.toLong, lens.sum, lens.max))
    }
    assert(got == expected)
  }

  test("funnel latency: percentile ladder is ordered") {
    val rows = SparkEntry.queries("q_funnel_latency")(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50_us"),
        r.getAs[Long]("p90_us"), r.getAs[Long]("p99_us"))
      assert(p50 > 0 && p50 <= p90 && p90 <= p99)
      assert(r.getAs[Long]("n_converted") > 0)
    }
  }

  test("snaive forecast: skill recomputes from the two MAEs, " +
    "hour frame is the joinable intersection") {
    val r = SparkEntry.queries("q_ts_forecast_snaive")(spark, sf).collect()(0)
    val (m24, m1) = (r.getAs[Double]("mae_snaive"), r.getAs[Double]("mae_naive1"))
    assert(m24 >= 0.0 && m1 >= 0.0)
    assert(r.getAs[Double]("skill") == 1.0 - m24 / m1)
    val hours = graft.engine.Tables.events(spark, sf)
      .select((unix_micros(col("ts_us")) / 3600000000L).cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val joinable = hours.count(h => hours(h - 24) && hours(h - 1))
    assert(r.getAs[Long]("n_hours") == joinable.toLong)
  }

  test("encoding advisor: advice agrees with the reported metrics") {
    val rows = SparkEntry.queries("q_layout_encoding_advisor")(spark, sf)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (n, nd, nr) = (r.getAs[Long]("n"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("n_runs"))
      assert(nd <= n && nr <= n && nr >= nd / 200) // sanity bounds
      val want = if (nd * 100 <= n) "dict" else if (nr * 5 <= n) "rle"
        else "plain"
      assert(r.getAs[String]("advice") == want)
    }
    val byCol = rows.map(r => r.getAs[String]("col_name") ->
      r.getAs[String]("advice")).toMap
    // 3 order statuses / 5 priorities over thousands of rows: dictionary
    assert(byCol("o_orderstatus") == "dict")
    assert(byCol("o_orderpriority") == "dict")
  }
}
