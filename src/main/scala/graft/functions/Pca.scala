package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis split the way 100 TB forces it: the
  * data-sized work (second-moment/covariance accumulation) runs as the
  * distributed one-pass aggregate `q_feat_cov` declares; the d×d
  * eigenproblem that remains is driver-bounded by construction
  * (d = embedding dim, 64 here — the matrix is ~32 KB no matter how
  * many vectors produced it) and solves locally with cyclic Jacobi
  * rotations. No linear-algebra dependency: the solver is ~50 lines
  * and symmetric-PSD inputs are Jacobi's best case.
  */
object Pca {

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi:
    * repeatedly rotate away the largest-magnitude off-diagonal entries
    * until the off-diagonal Frobenius mass falls under `eps`.
    * Returns (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * DESCENDING, eigenvectors sign-normalized (largest-|coord| entry
    * positive) so results are deterministic.
    */
  def eigSym(a0: Array[Array[Double]], eps: Double = 1e-12,
      maxSweeps: Int = 100): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    require(n > 0 && a0.forall(_.length == n), "square matrix required")
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass(): Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (offMass() > eps && sweep < maxSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rotate rows/columns p and q of A
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            // accumulate the rotation into the eigenvector basis
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val eig = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      // sign normalization: flip so the largest-|coordinate| is positive
      val m = col.indices.maxBy(k => math.abs(col(k)))
      if (col(m) < 0.0) col.map(x => -x) else col
    }.toArray
    (eig, vecs)
  }

  /** Rebuild the full symmetric matrix from the (p1 ≤ p2, cov)
    * triangle `q_feat_cov` emits and eigensolve it. The collect is
    * d²-bounded by construction — the one driver-side step PCA
    * genuinely has. */
  def fit(covTriangle: DataFrame): (Array[Double], Array[Array[Double]]) = {
    val rows = covTriangle.select("p1", "p2", "cov").collect()
    val d = rows.iterator.map(_.getLong(1)).max.toInt + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val c = r.getDouble(2)
      m(i)(j) = c; m(j)(i) = c
    }
    eigSym(m)
  }

  /** Project an embedding column onto the top-k components: one narrow
    * map per row (the component matrix broadcasts as literals), no
    * shuffle — the scale path for dimensionality reduction. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      components: Array[Array[Double]], k: Int): DataFrame = {
    val v = expr(s"transform($vecCol, e -> cast(e as double))")
    def dot(comp: Array[Double]): Column =
      aggregate(
        zip_with(v, array(comp.map(lit).toIndexedSeq: _*), (x, y) => x * y),
        lit(0.0), (acc, e) => acc + e)
    val pcs = (0 until k).map(i => dot(components(i)).as(s"pc${i + 1}"))
    df.select(col(idCol) +: pcs: _*)
  }
}
