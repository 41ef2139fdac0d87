package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the StatGraphQueries batch — properties the
  * DuckDB hash-compare cannot see (it proves Spark == DuckDB, not that
  * either implements the intended operator).
  */
class StatGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("bfs: seeds at depth 0, every hop certified by an adjacent parent") {
    import spark.implicits._
    val d = SparkEntry.queries("q_graph_bfs")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(d.nonEmpty)
    assert(d.values.forall(v => v >= 0L && v <= 3L), "hop budget is 3")
    val edges = graft.queries.AnalyticsQueries.prEdges(spark, sf)
      .as[(Long, Long)].collect()
    val seeds = edges.map(_._1).filter(_ <= 3L).toSet
    assert(seeds.forall(sd => d.get(sd).contains(0L)),
      "every seed labels itself depth 0")
    assert(d.filter(_._2 == 0L).keySet == seeds,
      "ONLY seeds sit at depth 0")
    // triangle inequality on the edge relation: a depth-d node (d>0)
    // must have a neighbour at depth d-1 (its BFS parent)
    val byNode = edges.groupBy(_._2).map { case (n, es) =>
      n -> es.map(_._1).toSet }
    for ((n, dep) <- d if dep > 0L)
      assert(byNode(n).exists(p => d.get(p).contains(dep - 1L)),
        s"node $n at depth $dep has no parent at ${dep - 1}")
  }

  test("snapshot diff: statuses reproduce the derivation arithmetic") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf)
      .select("o_orderkey", "status").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 != "added"),
      "derived snapshot only deletes/reprices — nothing is added")
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val removed = byStatus.getOrElse("removed", Set.empty)
    val changed = byStatus.getOrElse("changed", Set.empty)
    assert(removed.forall(_ % 10 == 3), "removed ⇔ key ≡ 3 (mod 10)")
    assert(changed.forall(k => k % 7 == 0 && k % 10 != 3),
      "changed ⇔ repriced and not deleted")
    val orders = graft.engine.Tables.t(spark, sf, "orders")
    val wantRemoved = orders.filter(expr("o_orderkey % 10 = 3")).count()
    val wantChanged = orders
      .filter(expr("o_orderkey % 7 = 0 AND o_orderkey % 10 <> 3")).count()
    assert(removed.size.toLong == wantRemoved)
    assert(changed.size.toLong == wantChanged)
  }

  test("welch t-test: matches an independent two-pass computation") {
    import spark.implicits._
    val got = SparkEntry.queries("q_stats_ttest")(spark, sf).collect()(0)
    // independent recomputation: collect the two samples and fold on
    // the driver with plain Kahan-free arithmetic (fixture is small)
    val vals = graft.engine.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    def stats(k: String) = {
      val xs = vals.filter(_._1 == k).map(_._2)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (n1, m1, v1) = stats("click")
    val (n2, m2, v2) = stats("error")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(got.getAs[Long]("n1") == n1.toLong)
    assert(got.getAs[Long]("n2") == n2.toLong)
    assert(math.abs(got.getAs[Double]("mean1") - m1) < 1e-4)
    assert(math.abs(got.getAs[Double]("t_stat") - t) < 1e-3,
      s"t ${got.getAs[Double]("t_stat")} vs independent $t")
    val df = got.getAs[Double]("df")
    assert(df > math.min(n1, n2) - 1 - 1e-9 && df <= n1 + n2 - 2 + 1e-9,
      "Welch df lies between min(n)-1 and the pooled df")
  }

  test("winsorize: clip counts bounded and totals between the extremes") {
    val rows = SparkEntry.queries("q_feat_winsorize")(spark, sf).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val n = r.getAs[Long]("n")
      val nc = r.getAs[Long]("n_clipped")
      assert(nc >= 0 && nc <= n)
      // ~10% of mass sits outside [p05, p95) by construction; the
      // discrete pick makes it approximate — allow a loose band
      assert(nc.toDouble / n <= 0.15, s"clip share ${nc.toDouble / n}")
      assert(r.getAs[Double]("sum_winsorized") > 0.0)
    }
  }

  test("transitions: matrix total = events − users (chain lengths n−1)") {
    val ev = graft.engine.Tables.events(spark, sf)
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    val got = SparkEntry.queries("q_seq_transitions")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(got == total - users)
  }

  test("dict encode: ids biject onto 1..|brands| ordered by frequency") {
    import spark.implicits._
    val got = SparkEntry.queries("q_feat_dict_encode")(spark, sf)
    assert(got.count() ==
      graft.engine.Tables.t(spark, sf, "part").count(),
      "encode preserves every part row")
    val dict = got.select("p_brand", "brand_id", "brand_freq")
      .distinct().as[(String, Long, Long)].collect().sortBy(_._2)
    assert(dict.map(_._2).toSeq == (1L to dict.length).toSeq,
      "ids are contiguous from 1")
    assert(dict.sliding(2).forall {
      case Array(a, b) =>
        a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)
      case _ => true
    }, "id order follows (freq desc, brand asc)")
  }

  test("chunk dedup: ratios in [0,1], totals match the chunk count") {
    import spark.implicits._
    val got = SparkEntry.queries("q_dedup_chunks")(spark, sf)
    val rows = got.select("n_chunks", "n_dup_chunks", "dup_ratio")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, d, r) =>
      d >= 0 && d <= n && r >= 0.0 && r <= 1.0 })
    // every doc splits into ceil(words/10) chunks
    val want = graft.engine.Tables.t(spark, sf, "documents")
      .select(((size(split(col("text"), " ")) + 9) / 10)
        .cast("long").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(rows.map(_._1).sum == want)
  }

  test("mad: nonnegative, and at most the half-range of its group") {
    val rows = SparkEntry.queries("q_stats_mad")(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val mad = r.getAs[Double]("mad")
      val med = r.getAs[Double]("med")
      assert(mad >= 0.0)
      assert(med > 0.0)
      // MAD can never exceed the max absolute deviation
      assert(mad <= 500000.0)
    }
  }

  test("file skipping: partitions cover the table; decisions are exact") {
    import spark.implicits._
    val got = SparkEntry.queries("q_layout_file_skipping")(spark, sf)
    val li = graft.engine.Tables.t(spark, sf, "lineitem")
    assert(got.agg(sum("n_rows")).collect()(0).getLong(0) == li.count(),
      "simulated files partition the table")
    // a file the planner skips must contain NO rows in the predicate
    // range; a file it scans must contain at least one boundary-
    // overlapping date range (min/max certify it)
    val skipped = got.filter(!col("would_scan"))
      .select("file_id").as[Long].collect().toSet
    val inRange = li.filter(
        col("l_shipdate").cast("date") >= lit("1995-01-01") &&
        col("l_shipdate").cast("date") <= lit("1995-03-31"))
      .select(expr("l_orderkey div 600").as("f"))
      .distinct().as[Long].collect().toSet
    assert(skipped.intersect(inRange).isEmpty,
      "no skipped file may contain a matching row")
  }
}
