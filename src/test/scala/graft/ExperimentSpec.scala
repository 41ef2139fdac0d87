package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ExperimentQueries batch — properties the
  * DuckDB hash-compare cannot see (it proves Spark == DuckDB, not that
  * either implements the intended statistic).
  */
class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("prop test: z recomputes from the reported counts") {
    val r = SparkEntry.queries("q_stats_prop_test")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val (na, xa) = (row.getAs[Long]("n_a"), row.getAs[Long]("x_a"))
    val (nb, xb) = (row.getAs[Long]("n_b"), row.getAs[Long]("x_b"))
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(row.getAs[Double]("p_a") == pa)
    assert(row.getAs[Double]("p_b") == pb)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-12)
    assert(pp >= math.min(pa, pb) && pp <= math.max(pa, pb))
    assert(row.getAs[Int]("significant") == (if (math.abs(z) > 1.96) 1 else 0))
  }

  test("cuped: adjustment preserves the overall weighted mean; " +
    "reduction in [0,1)") {
    val rows = SparkEntry.queries("q_stats_cuped")(spark, sf).collect()
    assert(rows.length == 2)
    val n = rows.map(_.getAs[Long]("n_users").toDouble)
    val raw = rows.map(_.getAs[Double]("raw_mean"))
    val adj = rows.map(_.getAs[Double]("adj_mean"))
    val wRaw = (n, raw).zipped.map(_ * _).sum / n.sum
    val wAdj = (n, adj).zipped.map(_ * _).sum / n.sum
    // Σ n_v·θ·(x̄_v − x̄) = θ·(Σ n_v·x̄_v − N·x̄) = 0
    assert(math.abs(wRaw - wAdj) < 1e-9 * math.max(1.0, math.abs(wRaw)))
    val red = rows.map(_.getAs[Double]("var_reduction")).distinct
    assert(red.length == 1) // same global stat on both rows
    assert(red(0) >= 0.0 && red(0) < 1.0)
    val theta = rows.map(_.getAs[Double]("theta")).distinct
    assert(theta.length == 1)
  }

  test("bootstrap: CI brackets are ordered and the run is deterministic") {
    val r1 = SparkEntry.queries("q_stats_bootstrap")(spark, sf).collect()(0)
    assert(r1.getAs[Long]("b_reps") == 32L)
    val (lo, hi) = (r1.getAs[Double]("ci_lo"), r1.getAs[Double]("ci_hi"))
    val est = r1.getAs[Double]("est")
    assert(lo <= hi)
    // Poisson(1) resampling of thousands of orders: the 2.5/97.5
    // percentile bracket of replicate means contains the point estimate
    assert(lo <= est && est <= hi)
    val r2 = SparkEntry.queries("q_stats_bootstrap")(spark, sf).collect()(0)
    assert(r1 == r2)
  }

  test("hazard: at-risk starts at the user count, never increases, " +
    "deaths sum to converted users") {
    val rows = SparkEntry.queries("q_ts_hazard")(spark, sf)
      .collect().sortBy(_.getAs[Long]("h"))
    assert(rows.nonEmpty)
    val ev = graft.engine.Tables.events(spark, sf)
    val nUsers = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val nConverted = ev.filter(col("event_type") === "purchase")
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.head.getAs[Long]("h") == 0L)
    assert(rows.head.getAs[Long]("at_risk") == nUsers)
    val atRisk = rows.map(_.getAs[Long]("at_risk"))
    assert((atRisk, atRisk.tail).zipped.forall(_ >= _))
    assert(rows.map(_.getAs[Long]("deaths")).sum == nConverted)
    rows.foreach { r =>
      val hz = r.getAs[Double]("hazard")
      assert(hz >= 0.0 && hz <= 1.0)
      assert(hz == r.getAs[Long]("deaths").toDouble / r.getAs[Long]("at_risk"))
    }
  }

  test("attribution: channels are touch types, credit stays under one " +
    "unit per conversion") {
    val rows = SparkEntry.queries("q_attribution_linear")(spark, sf).collect()
    assert(rows.nonEmpty)
    val touchTypes = Set("view", "click", "signup")
    assert(rows.forall(r => touchTypes(r.getAs[String]("channel"))))
    val totalCredit = rows.map(_.getAs[Double]("credit")).sum
    // integer micro-unit flooring: each conversion distributes ≤ 1.0
    val nConvWithTouch = SparkEntry.queries("q_attribution_linear")(spark, sf)
      .agg(max(col("conversions"))).collect()(0).getLong(0)
    val nConv = graft.engine.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(totalCredit > 0.0 && totalCredit <= nConv.toDouble)
    assert(nConvWithTouch <= nConv)
  }

  test("phrase search: every reported doc really contains the phrase") {
    val hits = SparkEntry.queries("q_text_phrase_search")(spark, sf).collect()
    assert(hits.nonEmpty)
    val ids = hits.map(_.getAs[Long]("doc_id")).toSet
    val texts = graft.engine.Tables.t(spark, sf, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    hits.foreach { h =>
      val txt = texts(h.getAs[Long]("doc_id"))
      val toks = txt.split(" ")
      val occ = toks.indices.dropRight(1)
        .count(i => toks(i) == "table" && toks(i + 1) == "hash")
      assert(occ == h.getAs[Long]("n_occur"))
      val first = h.getAs[Long]("first_pos").toInt
      assert(toks(first - 1) == "table" && toks(first) == "hash")
    }
  }

  test("substring dedup: every gram is 40 chars and occurs in ≥2 docs " +
    "at a stride offset") {
    val rows = SparkEntry.queries("q_dedup_substring")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    rows.foreach { r =>
      val gram = r.getAs[String]("gram")
      assert(gram.length == 40)
      val holders = docs.filter { case (_, txt) =>
        (0 to txt.length - 40 by 20).exists(p => txt.substring(p, p + 40) == gram)
      }
      assert(holders.length == r.getAs[Long]("n_docs"))
      assert(holders.length >= 2)
    }
  }
}
