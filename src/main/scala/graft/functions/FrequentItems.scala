package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed, MERGEABLE Aggregator
  * (the mergeable-summaries construction of Agarwal et al., PODS'12):
  * at most `k` counters per group, partial summaries fold map-side and
  * merge associatively, so the shuffle carries O(k) state per group
  * instead of every distinct term — the one-pass heavy-hitters shape
  * for 100 TB corpora where a full term groupBy is its own big job.
  *
  * Guarantees (property-tested in LibrarySpec on a skewed stream):
  *  - every term with true count > N/(k+1) survives in the summary;
  *  - reported counts are lower bounds, undercounting by ≤ N/(k+1).
  * When `k` exceeds the group's distinct-term cardinality no eviction
  * ever fires and the summary IS the exact term count — which is what
  * makes q_agg_heavy_hitters DuckDB-oracle-checkable on the fixtures
  * (31-term vocabulary at every scale factor, k = 64).
  */
case class MGBuf(m: Map[String, Long])
case class MGItem(term: String, lb_count: Long)

case class FrequentItems(k: Int)
    extends Aggregator[String, MGBuf, Seq[MGItem]] {

  def zero: MGBuf = MGBuf(Map.empty)

  def reduce(b: MGBuf, term: String): MGBuf = {
    val m = b.m
    m.get(term) match {
      case Some(c)            => MGBuf(m.updated(term, c + 1))
      case None if m.size < k => MGBuf(m.updated(term, 1L))
      case None               =>
        // classic MG step: a full summary meeting a new term decrements
        // every counter (dropping zeros) instead of inserting
        MGBuf(m.collect { case (t, c) if c > 1 => t -> (c - 1) })
    }
  }

  def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val m = (a.m.keySet ++ b.m.keySet).iterator
      .map(t => t -> (a.m.getOrElse(t, 0L) + b.m.getOrElse(t, 0L)))
      .toMap
    if (m.size <= k) MGBuf(m)
    else {
      // subtract the (k+1)-th largest weight from everything and drop
      // non-positives: ≤ k survivors, error bound telescopes
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      MGBuf(m.collect { case (t, c) if c > cut => t -> (c - cut) })
    }
  }

  def finish(b: MGBuf): Seq[MGItem] =
    b.m.toSeq.map { case (t, c) => MGItem(t, c) }
      .sortBy(i => (-i.lb_count, i.term))

  def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  def outputEncoder: Encoder[Seq[MGItem]] = ExpressionEncoder()
}
