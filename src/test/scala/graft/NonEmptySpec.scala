package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-emptiness lint over the whole declared query surface: a graded
  * query that silently degenerates to 0 rows "passes" the oracle while
  * exercising nothing (round 2 shipped exactly that — a star join
  * filtering on a region literal that matched no row at any scale).
  * Every SparkEntry query must touch real data at sf0.001, except a
  * short allowlist of results that are LEGITIMATELY empty by
  * construction.
  */
class NonEmptySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** q_set_except: lineitem-key EXCEPT orders-key is data-dependent and
    * genuinely drains to empty at some scale factors (both engines
    * agree) — the set-op shape, not the row count, is the contract.
    */
  private val mayBeEmpty = Set("q_set_except")

  test("every declared query returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n =
          try fn(spark, TestSpark.Sf).count()
          catch { case e: Throwable => fail(s"$name threw", e) }
        spark.catalog.clearCache()
        if (n == 0L && !mayBeEmpty(name)) Some(name) else None
    }
    assert(empties.isEmpty,
      s"queries returning 0 rows (vacuous coverage): ${empties.mkString(", ")}")
  }
}
