package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** SURVEY.md §5.2.5 — determinism lint: every declared query must give
  * identical rows on a re-run (catches missing ORDER BY / accidental
  * nondeterminism long before the driver's hash compare would).
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: two runs collect identical rows") {
      val a = fn(spark, sf).collect().map(_.toString)
      val b = fn(spark, sf).collect().map(_.toString)
      assert(a.sameElements(b))
    }
  }

  test("every oracle-compared query sorts globally (row order is graded)") {
    // Single-row ungrouped aggregates are trivially ordered.
    val exempt = Set("q_agg_global", "q_tpch_q14", "q_tpch_q17", "q_tpch_q6")
    val unsorted = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(exempt).filterNot { name =>
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.analyzed
        plan.collectFirst { case s: Sort if s.global => s }.nonEmpty
      }
    assert(unsorted.isEmpty,
      s"queries missing a global ORDER BY: $unsorted")
  }

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
