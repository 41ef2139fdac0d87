package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan '05) as a typed, MERGEABLE
  * Aggregator: `depth` rows × `width` counters; each key increments one
  * counter per row (row-seeded hash), point-frequency estimates are the
  * MIN over rows. Partials fold map-side and merge by elementwise add,
  * so the shuffle carries O(depth·width) state per group regardless of
  * key cardinality — the frequency-table companion to the Misra–Gries
  * summary ([[FrequentItems]]): MG answers "which keys are heavy", CM
  * answers "how often is THIS key" for any key, including ones MG
  * evicted.
  *
  * Guarantees (property-tested in LibrarySpec):
  *  - estimates NEVER undercount (each counter ≥ the key's true count);
  *  - overcount ≤ N/width per row whp, so min-over-rows is within
  *    εN (ε = e/width) with prob ≥ 1 − e^−depth;
  *  - merge(a, b) ≡ sketching the concatenated stream (exact identity,
  *    not approximate — addition commutes with the fixed hash layout).
  *
  * Hashing is Spark's own XXH64 with the SQL function's seed chain, so
  * [[CountMin.estimate]] can locate counters from pure Column
  * expressions (`xxhash64(key, i)`) — bit-identical to what [[reduce]]
  * computed, no UDF in the read path.
  */
case class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(b: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      b(i * width + CountMin.slot(key, i, width)) += 1L
      i += 1
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {

  /** Row `i`'s counter slot for `key` — Spark's xxhash64(key, i) seed
    * chain (string under seed 42, then the row index folds in), mod
    * width. */
  private[graft] def slot(key: String, i: Int, width: Int): Int =
    math.floorMod(
      XXH64.hashInt(i, XXH64.hashUTF8String(UTF8String.fromString(key), 42L)),
      width).toInt

  /** Point-frequency estimate from a sketch COLUMN: min over rows of
    * the key's counter, located by the same `xxhash64(key, i)` chain
    * [[CountMin#reduce]] used — a pure expression (codegen'd hash +
    * element_at), no UDF. */
  def estimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { i =>
      element_at(sketch,
        (lit(i * width) +
          pmod(xxhash64(key, lit(i)), lit(width.toLong)).cast("int") +
          lit(1)).cast("int"))
    }: _*)
}
