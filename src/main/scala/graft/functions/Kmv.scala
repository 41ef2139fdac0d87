package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One sampled observation: deterministic hash key + the value. */
case class KmvEntry(h: String, v: Double)

/** K-minimum-values uniform row sample as a mergeable `Aggregator` —
  * the bounded-state quantile/distinct sketch building block (the KMV
  * construction behind theta sketches, here used for quantile
  * estimation).
  *
  * The "randomness" is a deterministic per-row hash (md5 of the row
  * key, supplied by the caller): keeping the k smallest hash keys IS a
  * uniform sample of the rows, it is MERGEABLE (union two samples,
  * keep the k smallest — associative and commutative, so partial
  * aggregation folds map-side and shuffle traffic is ≤ k rows per
  * partition per group where exact percentiles shuffle everything),
  * and it is engine-independent: the same bottom-k-by-md5 sample is
  * expressible as a window in plain SQL, which is exactly how the
  * oracle grades it. No runtime randomness anywhere (SURVEY.md A.6).
  *
  * Buffer: an always-sorted Vector of ≤ k entries by (h, v); reduce is
  * one ordered insert with early reject, merge a bounded fold. finish
  * returns the sampled VALUES sorted ascending, so a disc-quantile is
  * `element_at(sample, ceil(p · size))`.
  */
class KmvAgg(k: Int)
    extends Aggregator[KmvEntry, Seq[KmvEntry], Seq[Double]] {

  private def before(a: KmvEntry, b: KmvEntry): Boolean =
    a.h < b.h || (a.h == b.h && a.v < b.v)

  override def zero: Seq[KmvEntry] = Vector.empty

  override def reduce(b: Seq[KmvEntry], a: KmvEntry): Seq[KmvEntry] = {
    if (b.length == k && !before(a, b.last)) b
    else {
      val i = b.indexWhere(e => before(a, e)) match {
        case -1 => b.length
        case n  => n
      }
      ((b.take(i) :+ a) ++ b.drop(i)).take(k)
    }
  }

  override def merge(b1: Seq[KmvEntry], b2: Seq[KmvEntry]): Seq[KmvEntry] =
    b2.foldLeft(b1)(reduce)

  override def finish(r: Seq[KmvEntry]): Seq[Double] =
    r.map(_.v).sorted

  override def bufferEncoder: Encoder[Seq[KmvEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KmvEntry]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
