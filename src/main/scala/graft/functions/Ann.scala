package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbours over an Array[Float] embedding column
  * (SURVEY.md §2.8 breadth: "IVF or LSH-bucketed variant as the scale
  * path"; the exact baseline is DedupQueries.cosineTopK).
  *
  * Random-hyperplane LSH: each table hashes a vector to a `bits`-bit
  * bucket (sign of dot with a fixed plane per bit); near-cosine vectors
  * collide with probability (1 - θ/π) per bit. Candidates = pairs
  * sharing any table's bucket — an equi-join on (table, bucket), never
  * all-pairs — then exact cosine re-ranks candidates only. Planes are
  * derived from a FIXED seed (deterministic across runs, SURVEY.md A.6).
  */
object Ann {

  private def planes(dim: Int, bits: Int, tables: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Approximate top-k neighbour pairs by cosine: (id1, id2, cos),
    * global top-k over candidate pairs (compare to the exact brute-force
    * top-k to measure recall).
    */
  def approxCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int = 64, bits: Int = 6, tables: Int = 32,
      seed: Long = 42L): DataFrame = {
    val ps = planes(dim, bits, tables, seed)
    val sigUdf = udf((e: Seq[Float]) => {
      val v = e.toArray
      ps.toIndexedSeq.map { table =>
        var sig = 0L
        var b = 0
        while (b < table.length) {
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += table(b)(i) * v(i); i += 1 }
          if (acc > 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    })
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("e"))
      .withColumn("sigs", sigUdf(col("e")))
      .select(col("id"), col("e"), posexplode(col("sigs")).as(Seq("tbl", "sig")))
    val cand = sigs.select(col("id").as("id1"), col("e").as("e1"),
        col("tbl"), col("sig"))
      .join(sigs.select(col("id").as("id2"), col("e").as("e2"),
        col("tbl").as("tbl2"), col("sig").as("sig2")),
        col("tbl") === col("tbl2") && col("sig") === col("sig2") &&
          col("id1") < col("id2"))
      .select("id1", "id2", "e1", "e2")
      .dropDuplicates("id1", "id2")
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    })
    cand.select(col("id1"), col("id2"), cosUdf(col("e1"), col("e2")).as("cos"))
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(k)
  }

  /** Per-query top-k: for every vector, its k nearest candidates. */
  def approxNeighbors(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int = 64, bits: Int = 6, tables: Int = 32,
      seed: Long = 42L): DataFrame = {
    val pairs = approxCosineTopK(df, idCol, vecCol, Int.MaxValue, dim, bits,
      tables, seed)
    // candidates are symmetric: expand to both directions, rank per id
    val directed = pairs.select(col("id1").as("qid"), col("id2").as("nid"),
        col("cos"))
      .unionAll(pairs.select(col("id2").as("qid"), col("id1").as("nid"),
        col("cos")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    directed.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("qid", "rnk")
  }
}
