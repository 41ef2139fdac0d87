package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the EmbAuditQueries batch. */
class EmbAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def vecs: Array[(Long, Array[Float])] =
    graft.engine.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))

  test("emb drift: shifts match a local mean computation, sorted desc") {
    val rows = SparkEntry.queries("q_emb_drift")(spark, sf).collect()
    assert(rows.length == 10)
    val vs = vecs
    val dims = vs.head._2.length
    def mean(side: Int, d: Int): Double = {
      val xs = vs.filter(_._1 % 2 == side).map(_._2(d).toDouble)
      // mirror the engine: decimal(19,6) sum then divide
      val s = xs.map(x => BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum
      s.toDouble / xs.length
    }
    val shifts = rows.map(_.getAs[Double]("abs_shift"))
    assert((shifts, shifts.tail).zipped.forall(_ >= _))
    rows.foreach { r =>
      val d = r.getAs[Long]("dim").toInt
      assert(d >= 0 && d < dims)
      val (mr, mc) = (mean(0, d), mean(1, d))
      assert(math.abs(r.getAs[Double]("mean_ref") - mr) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_cur") - mc) < 1e-9)
      assert(math.abs(r.getAs[Double]("abs_shift") - math.abs(mr - mc))
        < 1e-9)
    }
  }

  test("emb norm hist: buckets conserve vectors, ranges nest in order") {
    val rows = SparkEntry.queries("q_emb_norm_hist")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == vecs.length.toLong)
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") <= 9)
      assert(r.getAs[Double]("min_n2") <= r.getAs[Double]("max_n2"))
    }
    // bucket ranges are disjoint and increasing
    val pairs = rows.map(r =>
      (r.getAs[Double]("min_n2"), r.getAs[Double]("max_n2")))
    (pairs, pairs.tail).zipped.foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2 + 1e-4) // d4 quantization slack
    }
  }
}
