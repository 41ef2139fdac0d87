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
    // Candidate generation carries ONLY (id, table, bucket) — never the
    // vectors: the bucket equi-join multiplies rows ×tables, and wide
    // embedding arrays through that join + the dedup shuffle dominate
    // runtime (measured 12s at sf0.1). The deduped skinny pair list is
    // then scored against a broadcast (vector, norm) map in a primitive
    // per-partition loop — same pattern as the exact brute-force top-k.
    // Rounding is HALF_UP at 4dp via floor(|x|·1e4 + 0.5) (BigDecimal
    // per pair measured ~3× slower over ~1M candidates).
    import org.apache.spark.sql.SparkSession
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("e"))
    val dimMap = vecs.as[(Long, Array[Float])].collect().map { case (id, e) =>
      var acc = 0.0; var i = 0
      while (i < e.length) { acc += e(i).toDouble * e(i).toDouble; i += 1 }
      (id, (e, math.sqrt(acc)))
    }.toMap
    val bc = spark.sparkContext.broadcast(dimMap)
    val sigs = vecs
      .select(col("id"), posexplode(sigUdf(col("e"))).as(Seq("tbl", "sig")))
    val cand = sigs.select(col("id").as("id1"), col("tbl"), col("sig"))
      .join(sigs.select(col("id").as("id2"), col("tbl").as("tbl2"),
        col("sig").as("sig2")),
        col("tbl") === col("tbl2") && col("sig") === col("sig2") &&
          col("id1") < col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
    cand.as[(Long, Long)].mapPartitions { it =>
      val m = bc.value
      it.map { case (id1, id2) =>
        val (e1, n1) = m(id1); val (e2, n2) = m(id2)
        var dot = 0.0; var i = 0
        while (i < e1.length) { dot += e1(i).toDouble * e2(i).toDouble; i += 1 }
        val c = dot / (n1 * n2)
        val r = if (c >= 0) math.floor(c * 1e4 + 0.5) / 1e4
                else -math.floor(-c * 1e4 + 0.5) / 1e4
        (id1, id2, r)
      }
    }.toDF("id1", "id2", "cos")
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: coarse-quantize vectors to centroid
    * buckets, generate candidates ONLY within shared buckets, exact
    * cosine re-rank. The scale path when the corpus outgrows LSH table
    * tuning: centroids = √N-ish coarse cells, each vector probes its
    * `nprobe` nearest cells, candidate generation is an equi-join on
    * cell id — never all-pairs.
    *
    * Determinism (SURVEY.md A.6): the coarse quantizer is NOT k-means
    * (iterative, init-sensitive) but a fixed data-driven sample —
    * centroids are the `nCentroids` vectors with the smallest
    * byteswap64(id) mix, reproducible on any run/partitioning.
    */
  def ivfCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.SparkSession
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("e"))
      .as[(Long, Array[Float])]
    val all = vecs.collect()
    val dimMap = all.map { case (id, e) =>
      var acc = 0.0; var i = 0
      while (i < e.length) { acc += e(i).toDouble * e(i).toDouble; i += 1 }
      (id, (e, math.sqrt(acc)))
    }.toMap
    val bc = spark.sparkContext.broadcast(dimMap)
    val centroids = all
      .sortBy { case (id, _) => scala.util.hashing.byteswap64(id) }
      .take(nCentroids)
      .map { case (id, e) =>
        var acc = 0.0; var i = 0
        while (i < e.length) { acc += e(i).toDouble * e(i).toDouble; i += 1 }
        (id, e, math.sqrt(acc))
      }
    val bcC = spark.sparkContext.broadcast(centroids)
    // assignment: nprobe nearest cells per vector (cos desc, cell asc)
    val assigned = vecs.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val cs = bcC.value
        it.flatMap { case (id, e) =>
          var n1 = 0.0; var i = 0
          while (i < e.length) { n1 += e(i).toDouble * e(i).toDouble; i += 1 }
          n1 = math.sqrt(n1)
          cs.map { case (cid, ce, cn) =>
            var dot = 0.0; var j = 0
            while (j < e.length) { dot += e(j).toDouble * ce(j).toDouble; j += 1 }
            (cid, dot / (n1 * cn))
          }.sortBy { case (cid, cos) => (-cos, cid) }
            .take(nprobe)
            .map { case (cid, _) => (id, cid) }
        }
      }.toDF("id", "cell")
    val cand = assigned.select(col("id").as("id1"), col("cell"))
      .join(assigned.select(col("id").as("id2"), col("cell").as("cell2")),
        col("cell") === col("cell2") && col("id1") < col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
    cand.as[(Long, Long)].mapPartitions { it =>
      val m = bc.value
      it.map { case (id1, id2) =>
        val (e1, n1) = m(id1); val (e2, n2) = m(id2)
        var dot = 0.0; var i = 0
        while (i < e1.length) { dot += e1(i).toDouble * e2(i).toDouble; i += 1 }
        val c = dot / (n1 * n2)
        val r = if (c >= 0) math.floor(c * 1e4 + 0.5) / 1e4
                else -math.floor(-c * 1e4 + 0.5) / 1e4
        (id1, id2, r)
      }
    }.toDF("id1", "id2", "cos")
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
