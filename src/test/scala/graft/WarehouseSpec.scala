package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the WarehouseQueries batch. */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("compaction plan: bins are contiguous and cover every row") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_layout_compaction_plan")(spark, sf)
      .orderBy("month").collect()
    assert(rows.nonEmpty)
    val bins = rows.map(_.getAs[Long]("bin_id"))
    assert(bins.sliding(2).forall(p => p.length < 2 || p(1) >= p(0)),
      "bin ids are monotone over the month spine")
    val total = graft.engine.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total,
      "every order falls in exactly one month partition")
    assert(rows.last.getAs[Long]("cum_rows") == total)
  }

  test("keyword extract: at most 3 ranked keywords, scores non-increasing") {
    import spark.implicits._
    val got = SparkEntry.queries("q_text_keyword_extract")(spark, sf)
      .select("doc_id", "rank", "score")
      .as[(Long, Long, Double)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc.forall(_._2.length <= 3))
    assert(byDoc.forall { case (_, ks) =>
      val sorted = ks.sortBy(_._2)
      sorted.map(_._3).sliding(2).forall(p => p.length < 2 || p(1) <= p(0))
    }, "per-doc scores are non-increasing in rank")
  }

  test("rfm: scores are binary and the segment string encodes them") {
    import spark.implicits._
    val got = SparkEntry.queries("q_orders_rfm")(spark, sf)
      .select("r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (r, f, m, s) =>
      Seq(r, f, m).forall(x => x == 1L || x == 2L) && s == s"R${r}F${f}M${m}"
    })
    // a median split cannot put everyone in one bucket on varied data
    assert(got.map(_._4).distinct.length >= 2)
  }

  test("burst detect: flag implies the doubling and floor conditions") {
    val rows = SparkEntry.queries("q_ts_burst_detect")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Boolean]("is_burst")).foreach { r =>
      val n = r.getAs[Long]("n")
      val tm = r.getAs[Long]("trail_max")
      assert(n >= 10L && n >= tm * 2)
    }
    // first hour of each type has no trailing window -> never a burst
    val firsts = rows.groupBy(_.getAs[String]("event_type"))
      .map { case (_, rs) => rs.minBy(_.getAs[Long]("h")) }
    assert(firsts.forall(!_.getAs[Boolean]("is_burst")))
  }
}
