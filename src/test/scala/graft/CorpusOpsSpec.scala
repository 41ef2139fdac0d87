package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the CorpusOpsQueries batch — properties the
  * DuckDB hash-compare cannot see (it proves Spark == DuckDB, not that
  * either implements the intended operator).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("active intervals: every +1 is closed by a -1 (ends at zero)") {
    val rows = SparkEntry.queries("q_ts_active_intervals")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    assert(rows.last.getAs[Long]("in_flight") == 0L,
      "running sum must drain to 0 after the last close event")
    assert(rows.forall(_.getAs[Long]("in_flight") >= 0L),
      "an interval cannot close before it opens on this generator")
    val maxFlight = rows.map(_.getAs[Long]("in_flight")).max
    assert(maxFlight > 0L, "some day must have lines in flight")
  }

  test("keep-best: representative carries its group's max n_chars") {
    import spark.implicits._
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"),
        md5(array_join(array_sort(array_distinct(
          split(col("text"), " "))), " ")).as("key_h"))
    val best = docs.groupBy("key_h")
      .agg(max("n_chars").as("want_chars"), count(lit(1)).as("want_size"))
    val got = SparkEntry.queries("q_dedup_keep_best")(spark, sf)
    val joined = got.join(best, "key_h")
      .select(col("n_chars") === col("want_chars"),
        col("group_size") === col("want_size"))
      .as[(Boolean, Boolean)].collect()
    assert(joined.nonEmpty && joined.forall(p => p._1 && p._2))
    // representatives are distinct docs: one row per cluster
    assert(got.select("doc_id").distinct().count() == got.count())
  }

  test("corpus mix: minority language fully kept, others downsampled toward it") {
    import spark.implicits._
    val d = graft.engine.Tables.t(spark, sf, "documents")
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val minN = counts.values.min
    val kept = SparkEntry.queries("q_corpus_mix")(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    for ((lang, n) <- counts) {
      val k = kept.getOrElse(lang, 0L)
      if (n == minN) assert(k == n, s"minority lang $lang must keep all")
      else {
        // md5 selection is ~uniform: expect k ≈ minN within a loose
        // binomial bound (fixture is small; 4σ ≈ 4·√minN)
        val tol = 4 * math.sqrt(minN.toDouble)
        assert(math.abs(k - minN) <= tol,
          s"$lang kept $k, target $minN ± $tol")
      }
    }
  }

  test("kanon: every reported group is genuinely below the threshold") {
    val rows = SparkEntry.queries("q_privacy_kanon")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("k") < 5L))
  }

  test("ref integrity: generator data is referentially intact") {
    val rows = SparkEntry.queries("q_ref_integrity")(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("n_violations") == 0L))
    assert(rows.forall(_.getAs[Long]("n_total") > 0L))
    // and the audit actually detects a planted orphan
    import spark.implicits._
    val li = Seq((1L, 5.0), (999L, 6.0)).toDF("l_orderkey", "x")
    val o = Seq(Tuple1(1L)).toDF("o_orderkey")
    val orphans = li.join(o, col("l_orderkey") === col("o_orderkey"),
      "left_anti").count()
    assert(orphans == 1L)
  }

  test("curriculum buckets: partition the corpus exactly once") {
    import spark.implicits._
    val total = graft.engine.Tables.t(spark, sf, "documents").count()
    val got = SparkEntry.queries("q_length_curriculum")(spark, sf)
    assert(got.agg(sum("n_docs")).as[Long].head() == total,
      "every document falls in exactly one bucket")
  }

  test("cross-source dups: reported sources list matches n_sources") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_dedup_cross_source")(spark, sf)
      .select(col("n_sources"), col("sources")).as[(Long, String)]
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, s) => s.split(",").length.toLong == n })
  }
}
