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

/** K-minimum-values DISTINCT sketch: the k smallest DISTINCT hash keys
  * of a set — the theta-sketch building block. Supports SET ALGEBRA
  * downstream: for two sketches with threshold θ = min of their kth
  * minima, each sketch holds ALL of its set's hashes below θ, so the
  * intersection of the samples below θ is exact there and |A∩B| ≈
  * |common < θ| / θ (exact whenever both sets are smaller than k).
  * Mergeable (union, dedupe, keep k smallest) and deterministic — the
  * same bottom-k-distinct sample is a plain SQL window, which is how
  * the oracle replays it.
  */
class KmvDistinctAgg(k: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {

  override def zero: Seq[String] = Vector.empty

  override def reduce(b: Seq[String], h: String): Seq[String] = {
    if (b.length == k && h >= b.last) b
    else {
      val i = b.indexWhere(e => h < e) match {
        case -1 => b.length
        case n  => n
      }
      if (i > 0 && b(i - 1) == h) b // already sampled
      else ((b.take(i) :+ h) ++ b.drop(i)).take(k)
    }
  }

  override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
    b2.foldLeft(b1)(reduce)

  override def finish(r: Seq[String]): Seq[String] = r

  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
