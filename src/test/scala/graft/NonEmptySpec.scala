package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-emptiness lint over the whole declared query surface: a graded
  * query that silently degenerates to 0 rows "passes" the oracle while
  * exercising nothing (round 2 shipped exactly that — a star join
  * filtering on a region literal that matched no row at any scale).
  * Every SparkEntry query must touch real data at sf0.001, except a
  * short allowlist of results that are LEGITIMATELY empty by
  * construction.
  *
  * Sharded (r14): the single 351-query sweep ran ~230 s serial; three
  * shard classes cover the same set partitioned by sorted index mod 3
  * (trivially a partition — coverage unchanged) so the parallel test
  * groups can run them concurrently in separate JVMs.
  */
abstract class NonEmptyShard(shard: Int, of: Int) extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** q_set_except: lineitem-key EXCEPT orders-key is data-dependent and
    * genuinely drains to empty at some scale factors (both engines
    * agree) — the set-op shape, not the row count, is the contract.
    */
  private val mayBeEmpty = Set("q_set_except")

  test(s"every declared query returns rows at sf0.001 (shard ${shard + 1}/$of)") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
      .filter(_._2 % of == shard).map(_._1).flatMap {
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

class NonEmptySpec extends NonEmptyShard(0, 3)
class NonEmptySpecB extends NonEmptyShard(1, 3)
class NonEmptySpecC extends NonEmptyShard(2, 3)
