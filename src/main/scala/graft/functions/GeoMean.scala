package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.9): geometric mean via exp(mean(ln x)).
  *
  * Buffer is (sum of logs, count) — associative + commutative, so Spark
  * can partial-aggregate map-side and merge in any order; the result is
  * rounded to 4dp downstream because double merge order is not fixed.
  */
case class GeoMeanBuf(var sumLn: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    b.sumLn += math.log(x); b.n += 1; b
  }
  def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf = {
    a.sumLn += b.sumLn; a.n += b.n; a
  }
  def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
  def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
