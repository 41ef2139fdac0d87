package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the RecEvalQueries batch. */
class RecEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private val Disc = Seq(1000000000000L, 630929753571L, 500000000000L,
    430676558073L, 386852807235L, 356207187108L, 333333333333L,
    315464876786L, 301029995664L, 289064826318L)
  private val DiscPrefix = Disc.scanLeft(0L)(_ + _).tail

  test("ndcg: matches a local recomputation for every user") {
    val got = SparkEntry.queries("q_ml_ndcg")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Long]("dcg_scaled"),
          r.getAs[Long]("idcg_scaled"), r.getAs[Double]("ndcg")))).toMap
    val ev = graft.engine.Tables.events(spark, sf)
      .select("user_id", "event_id", "value", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value"), r.getAs[String]("event_type")))
    val expected = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val ranked = xs.sortBy(x => (-x._3, x._2))
      val rels = ranked.map(x => if (x._4 == "purchase") 1L else 0L)
      val nRel = rels.sum
      if (nRel < 1) None
      else {
        val dcg = rels.take(10).zip(Disc).map { case (r, d) => r * d }.sum
        val idcg = DiscPrefix(math.min(nRel, 10L).toInt - 1)
        Some(u -> ((nRel, dcg, idcg, dcg.toDouble / idcg.toDouble)))
      }
    }.toMap
    assert(got == expected)
  }

  test("confusion: cells conserve the event count, mcc in [-1,1]") {
    val r = SparkEntry.queries("q_ml_confusion")(spark, sf).collect()(0)
    val n = graft.engine.Tables.events(spark, sf).count()
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp + fp + fn + tn == n)
    assert(r.getAs[Double]("accuracy") == (tp + tn).toDouble / n)
    val mcc = r.getAs[Double]("mcc")
    assert(mcc >= -1.0 && mcc <= 1.0)
    val f1 = r.getAs[Double]("f1")
    assert(f1 == 2.0 * tp / (2.0 * tp + fp + fn))
  }

  test("cohort ltv: cumulative revenue is nondecreasing per cohort " +
    "and ends at the cohort total") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("weeks_since"))
      val cums = sorted.map(_.getAs[Double]("cum_rev"))
      assert((cums, cums.tail).zipped.forall(_ <= _))
      val revSum = sorted.map(_.getAs[Double]("rev")).sum
      assert(math.abs(cums.last - revSum) < 1e-6 * math.max(1.0, revSum))
      sorted.foreach(r => assert(r.getAs[Double]("rev") > 0.0))
    }
  }

  test("sessions quality: events conserved, bounce rate consistent") {
    val rows = SparkEntry.queries("q_sessions_quality")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalEvents = rows.map(_.getAs[Long]("events")).sum
    assert(totalEvents == graft.engine.Tables.events(spark, sf).count())
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { r =>
      assert(types(r.getAs[String]("entry")))
      val br = r.getAs[Double]("bounce_rate")
      assert(br == r.getAs[Long]("bounces").toDouble /
        r.getAs[Long]("n_sessions"))
      assert(br >= 0.0 && br <= 1.0)
      assert(r.getAs[Long]("p50_dur_us") >= 0)
    }
  }

  test("item neighbors: cosine recomputes from local basket counts, " +
    "ranks are per-item 1..3") {
    val rows = SparkEntry.queries("q_rec_item_neighbors")(spark, sf).collect()
    assert(rows.nonEmpty)
    val baskets = graft.engine.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ci = baskets.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val byOrder = baskets.groupBy(_._1).map { case (_, xs) => xs.map(_._2) }
    val cij = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (parts <- byOrder; a <- parts; b <- parts if a < b)
      cij((a, b)) = cij.getOrElse((a, b), 0L) + 1
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("item"), r.getAs[Long]("neighbor"))
      val key = (math.min(i, j), math.max(i, j))
      assert(cij(key) == r.getAs[Long]("cij"))
      val want = cij(key).toDouble / math.sqrt((ci(i) * ci(j)).toDouble)
      assert(r.getAs[Double]("cosine") == want)
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 3)
    }
    rows.groupBy(_.getAs[Long]("item")).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(rks.sameElements(1L to rks.length)) // contiguous from 1
      val cosines = rs.sortBy(_.getAs[Long]("rnk"))
        .map(_.getAs[Double]("cosine"))
      assert((cosines, cosines.tail).zipped.forall(_ >= _))
    }
  }
}
