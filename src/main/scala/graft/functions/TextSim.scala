package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection + document fingerprinting (SURVEY.md §2.8
  * breadth: "MinHash+LSH, SimHash, n-gram Jaccard" — the first two live
  * here and in DedupQueries respectively).
  *
  * SimHash: 64-bit signature whose bits vote over token hashes; near-dup
  * docs land within a small Hamming distance. Candidate generation bands
  * the signature into 4×16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ at
  * least one chunk equal) and equi-joins on (chunk_idx, chunk_value) —
  * LSH-for-Hamming, never all-pairs, the 100 TB path.
  */
object TextSim {

  /** 64-bit SimHash of a token-array column — pure Catalyst
    * expressions, no per-row JVM UDF (this was the library's last
    * one): the token array folds once into a 64-element vote array
    * (zip_with adds each token hash's ±1 bit votes), and a second
    * fold packs the vote signs into the signature. Token hash =
    * xxhash64, deterministic across JVMs and runs (SURVEY.md A.6
    * forbids runtime randomness); the declared q_dedup_simhash query
    * keeps its own md5-derived 60-bit variant for oracle parity —
    * this is the library form for callers who do not need a DuckDB
    * twin. Higher-order functions do not enter whole-stage codegen,
    * but they evaluate natively on array data with zero
    * serialization boundary — the UDF paid a full Catalyst→JVM row
    * conversion per call.
    */
  def simhash(tokens: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, transform(bitIdx, b =>
        when(call_function("shiftright", h, b)
          .bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))),
        (a, v) => a + v))
    aggregate(zip_with(votes, bitIdx, (v, b) =>
      when(v > 0, call_function("shiftleft", lit(1L), b))
        .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures (codegen'd). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling fingerprint over a token array — order-sensitive (unlike a
    * bag-of-tokens hash), pure expression, deterministic: each step
    * rehashes (accumulator, token), so no overflow (Spark 4 runs ANSI
    * mode by default and would reject a wrapping multiply). */
  def fingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, x) => xxhash64(acc, x))

  /** Near-dup candidate pairs (d1 < d2) within `maxHamming` of each
    * other, via 4×16-bit chunk banding + verification. Guaranteed to
    * contain every pair with hamming ≤ 3 (pigeonhole over 4 chunks);
    * with maxHamming > 3 it is a high-recall heuristic, not exhaustive.
    */
  def simhashNearDups(df: DataFrame, idCol: String, tokensCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash(col(tokensCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      explode(expr(
        "transform(sequence(0, 3), i -> struct(i as idx, shiftright(sig, i * 16) & 65535 as chunk))"))
        .as("c"))
      .select(col("id"), col("sig"), col("c.idx"), col("c.chunk"))
    chunked.select(col("id").as("d1"), col("sig").as("sig1"),
        col("idx"), col("chunk"))
      .join(chunked.select(col("id").as("d2"), col("sig").as("sig2"),
        col("idx").as("idx2"), col("chunk").as("chunk2")),
        col("idx") === col("idx2") && col("chunk") === col("chunk2") &&
          col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        hamming(col("sig1"), col("sig2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }
}
