package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** SURVEY.md §5.2.5 — determinism lint: every declared query must give
  * identical rows on a re-run (catches missing ORDER BY / accidental
  * nondeterminism long before the driver's hash compare would).
  *
  * Sharded (r14): the 351-query double-run sweep was the suite's
  * single longest pole (~470 s serial); five shard classes cover the
  * SAME query set partitioned by sorted index mod 5 — trivially a
  * partition, so coverage is unchanged — and the parallel test groups
  * (build.sbt testGrouping) run them in separate JVMs concurrently.
  */
abstract class DeterminismShard(shard: Int, of: Int) extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  for (((name, fn), i) <- SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
       if i % of == shard) {
    test(s"$name: two runs collect identical rows") {
      val a = fn(spark, sf).collect().map(_.toString)
      val b = fn(spark, sf).collect().map(_.toString)
      assert(a.sameElements(b))
    }
  }
}

class DeterminismSpec extends DeterminismShard(0, 5) {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

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

class DeterminismSpecB extends DeterminismShard(1, 5)
class DeterminismSpecC extends DeterminismShard(2, 5)
class DeterminismSpecD extends DeterminismShard(3, 5)
class DeterminismSpecE extends DeterminismShard(4, 5)
