package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the MlOpsQueries batch plus the Pca
  * library — properties the DuckDB hash-compare cannot see.
  */
class MlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("kmeans: bit-exact vs a local Lloyd reimplementation") {
    import spark.implicits._
    // independent local model: same micro-unit recipe, plain Scala
    val vecs = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor((x.toDouble + 1.0) * 1000000.0).toLong)
          .toArray
      }.sortBy(_._1)
    val k = 8
    val seedIds = vecs.map(_._1)
      .sortBy(id => (md5hex(id.toString), id)).take(k)
    var centroids: Array[(Long, Array[Long])] =
      seedIds.zipWithIndex.map { case (id, i) =>
        (i + 1L, vecs.find(_._1 == id).get._2)
      }
    def assign(): Array[(Long, Long, Long)] =
      vecs.map { case (id, x) =>
        val best = centroids.map { case (cl, c) =>
          var d = 0L; var i = 0
          while (i < x.length) {
            val df = x(i) - c(i); d += df * df; i += 1
          }
          (d, cl)
        }.min
        (id, best._2, best._1)
      }
    val a1 = assign()
    centroids = a1.groupBy(_._2).toArray.sortBy(_._1).map {
      case (cl, members) =>
        val dim = vecs.head._2.length
        val sums = Array.ofDim[Long](dim)
        members.foreach { case (id, _, _) =>
          val x = vecs.find(_._1 == id).get._2
          var i = 0; while (i < dim) { sums(i) += x(i); i += 1 }
        }
        (cl, sums.map(_ / members.length))
    }
    val want = assign().map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_cluster_kmeans")(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, "distributed Lloyd diverges from the local model")
    assert(got.map(_._2).distinct.size > 1, "degenerate single cluster")
  }

  test("prefix filtering reproduces the exhaustive ground truth exactly") {
    import spark.implicits._
    def pairs(q: String) =
      SparkEntry.queries(q)(spark, sf)
        .select("d1", "d2", "inter", "jaccard")
        .as[(Long, Long, Long, Double)].collect().toSet
    val exhaustive = pairs("q_dedup_near_ngram")
    val prefix = pairs("q_dedup_prefix_filter")
    assert(exhaustive.nonEmpty)
    assert(prefix == exhaustive,
      s"missing=${(exhaustive -- prefix).take(3)} " +
        s"extra=${(prefix -- exhaustive).take(3)}")
  }

  test("covariance matrix: symmetric PSD shape and local agreement") {
    import spark.implicits._
    val tri = SparkEntry.queries("q_feat_cov")(spark, sf)
    val rows = tri.select("p1", "p2", "cov")
      .as[(Long, Long, Double)].collect()
    val d = rows.map(_._2).max.toInt + 1
    assert(rows.length == d * (d + 1) / 2, "full upper triangle")
    // diagonal entries are variances — nonnegative
    rows.filter(r => r._1 == r._2).foreach { case (i, _, c) =>
      assert(c >= 0.0, s"negative variance at dim $i")
    }
    // local recompute (plain double arithmetic): the decimal-sum query
    // must agree to ~1e-9 — same moments, different accumulation path
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding")).as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val want = rows.map { case (i, j, _) =>
      val c = vecs.map(v => (v(i.toInt) - mean(i.toInt)) *
        (v(j.toInt) - mean(j.toInt))).sum / (n - 1)
      (i, j) -> c
    }.toMap
    rows.foreach { case (i, j, got) =>
      assert(math.abs(got - want((i, j))) < 1e-9,
        s"cov($i,$j): got $got want ${want((i, j))}")
    }
  }

  test("pca: orthonormal components, descending eigenvalues, " +
    "eigen residual, trace conservation") {
    val (eig, vecs) = graft.functions.Pca.fit(
      SparkEntry.queries("q_feat_cov")(spark, sf))
    val d = eig.length
    assert(d == 64)
    // descending order, PSD spectrum (covariance matrices)
    assert(eig.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(eig.forall(_ > -1e-10), "covariance eigenvalues must be >= 0")
    // orthonormality
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => vecs(i)(k) * vecs(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$i, v$j> = $dot")
    }
    // A v = λ v residual against the original matrix
    import spark.implicits._
    val rows = SparkEntry.queries("q_feat_cov")(spark, sf)
      .select("p1", "p2", "cov").as[(Long, Long, Double)].collect()
    val a = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, c) =>
      a(i.toInt)(j.toInt) = c; a(j.toInt)(i.toInt) = c
    }
    for (e <- 0 until 4) { // the top components are the ones that matter
      val av = Array.tabulate(d)(r =>
        (0 until d).map(k => a(r)(k) * vecs(e)(k)).sum)
      val res = math.sqrt((0 until d)
        .map(r => math.pow(av(r) - eig(e) * vecs(e)(r), 2)).sum)
      assert(res < 1e-8, s"eigen residual for component $e: $res")
    }
    val trace = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(eig.sum - trace) < 1e-8, "eigenvalue sum != trace")
    // projection is a narrow map producing k columns
    val proj = graft.functions.Pca.project(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      "vec_id", "embedding", vecs, 2)
    assert(proj.columns.toSeq == Seq("vec_id", "pc1", "pc2"))
    assert(proj.count() ==
      spark.read.parquet(s"$sf/embeddings.parquet").count())
  }

  test("quality calibration: per-language keep floor matches a local " +
    "percentile recomputation") {
    import spark.implicits._
    val got = SparkEntry.queries("q_quality_calibrate")(spark, sf)
      .select("doc_id", "lang", "ttr", "pctl", "keep")
      .as[(Long, String, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      val sorted = rows.sortBy(r => (r._3, r._1))
      sorted.zipWithIndex.foreach { case (r, idx) =>
        val want = if (n == 1) 0.0 else idx.toDouble / (n - 1)
        assert(r._4 == want, s"$lang doc ${r._1}: pctl ${r._4} != $want")
        assert(r._5 == (if (want >= 0.2) 1L else 0L))
      }
      val kept = rows.count(_._5 == 1L)
      assert(kept >= (0.75 * n).toInt && kept <= (0.85 * n).ceil.toInt,
        s"$lang keeps $kept of $n — not ≈80%")
    }
  }

  test("kmv sketch: partitioning-invariant (mergeable), and estimates " +
    "land within the sample rank-error bound of exact percentiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    // mergeability: radically different partitionings → identical sample
    val sk = udaf(new graft.functions.KmvAgg(128))
    def run(parts: Int) =
      spark.read.parquet(s"$sf/events.parquet")
        .repartition(parts)
        .select(col("event_type"),
          md5(col("event_id").cast("string")).as("h"), col("value"))
        .groupBy(col("event_type"))
        .agg(sk(col("h"), col("value")).as("sample"))
        .as[(String, Seq[Double])].collect().toMap
    val a = run(1); val b = run(17)
    assert(a == b, "merge order changed the sketch — not associative")
    // rank accuracy: a 128-sample disc-median's TRUE rank should sit
    // within ~4 standard errors of 0.5·n (binomial se ≈ 0.5/√128 ≈ .044)
    val est = SparkEntry.queries("q_agg_quantile_sketch")(spark, sf)
      .select("event_type", "p50_est").as[(String, Double)].collect().toMap
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    est.foreach { case (t, p50) =>
      val vs = exact(t)
      val rank = vs.count(_ <= p50).toDouble / vs.length
      assert(math.abs(rank - 0.5) < 0.18,
        s"$t: estimated median sits at true rank $rank")
    }
  }

  test("deadline funnel never exceeds the open-ended funnel stage") {
    import spark.implicits._
    val win = SparkEntry.queries("q_funnel_window")(spark, sf)
      .select("user_id", "funnel_level").as[(Long, Long)].collect().toMap
    val open = SparkEntry.queries("q_funnel_conversion")(spark, sf)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(win.nonEmpty)
    win.foreach { case (u, lvl) =>
      assert(lvl >= 1L && lvl <= 3L)
      val stage = open.getOrElse(u,
        fail(s"user $u has views but no funnel_conversion row"))
      assert(lvl <= stage,
        s"user $u: 24h-deadline level $lvl beats open-ended stage $stage")
    }
  }

  test("bpe training: exact vs a local greedy-merge reimplementation") {
    import spark.implicits._
    val freqs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .filter(length(col("w")) > 0)
      .groupBy("w").count().as[(String, Long)].collect().toMap
    // independent local model over token LISTS (no string encoding)
    var state: Map[Vector[String], Long] =
      freqs.map { case (w, f) => w.split("").toVector -> f }
    def best: (String, String, Long) = {
      val counts = collection.mutable.Map[(String, String), Long]()
      state.foreach { case (tk, f) =>
        tk.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((w1, w2), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      (w1, w2, c)
    }
    def merge(w1: String, w2: String): Unit =
      state = state.map { case (tk, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < tk.length) {
          if (i + 1 < tk.length && tk(i) == w1 && tk(i + 1) == w2) {
            out += (w1 + w2); i += 2 // greedy left-to-right
          } else { out += tk(i); i += 1 }
        }
        out.result() -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
    val want = (1 to 3).map { step =>
      val (w1, w2, c) = best
      merge(w1, w2)
      (step.toLong, w1, w2, c)
    }
    val got = SparkEntry.queries("q_text_bpe_train")(spark, sf)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  test("theta intersect: exact when audiences fit the sketch; within " +
    "the KMV error bound in the estimating regime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    // exact regime (every sf0.001 audience < k): the estimate must
    // EQUAL the true intersection
    val est = SparkEntry.queries("q_agg_theta_intersect")(spark, sf)
      .select("t1", "t2", "est_intersect")
      .as[(String, String, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    val du = graft.engine.Tables.events(spark, sf)
      .select("event_type", "user_id").distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    for (((t1, t2), e) <- est) {
      val exact = (du(t1) & du(t2)).size
      assert(e == exact.toDouble,
        s"($t1,$t2): est $e != exact $exact in the complete regime")
    }
    // estimating regime: two synthetic 4000-element sets, 2000 shared
    val sk = udaf(new graft.functions.KmvDistinctAgg(256))
    val rows = ((0L until 4000L).map(("A", _)) ++
      (2000L until 6000L).map(("B", _))).toDF("grp", "v")
    val smp = rows.select(col("grp"), md5(col("v").cast("string")).as("h"))
      .groupBy("grp").agg(sk(col("h")).as("smp"))
      .as[(String, Seq[String])].collect().toMap
    def frac(h: String): Double =
      java.lang.Long.parseLong(h.take(15), 16).toDouble / math.pow(16, 15)
    val theta = math.min(frac(smp("A")(255)), frac(smp("B")(255)))
    val common = (smp("A").toSet & smp("B").toSet).count(frac(_) < theta)
    val estSyn = common / theta
    assert(math.abs(estSyn - 2000.0) / 2000.0 < 0.25,
      s"synthetic overlap estimate $estSyn vs true 2000")
  }

  test("skew report: ordered, cumulative, and mean-calibrated") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_skew_diagnose")(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      "counts must be nonincreasing")
    assert(rows.map(_._4).sliding(2).forall(p => p(0) < p(1)),
      "cumulative share must strictly increase")
    assert(rows.last._4 > 0.0 && rows.last._4 <= 1.0)
    // ratio_to_mean consistency: ratio / cnt constant across rows
    val perUnit = rows.map(r => r._3 / r._2)
    assert(perUnit.forall(u => math.abs(u - perUnit.head) < 1e-12))
  }
}
