package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.functions.{TopKAgg, TopKEntry}
import graft.queries.ScaleOpsQueries

/** Properties of the round-6 scale-technique operators beyond the
  * DuckDB hash gate: the bounded top-k aggregate equals the window
  * formulation and keeps its buffer bounded; Z-order buckets really
  * cluster BOTH keys; the skyline is exactly the non-dominated set
  * (checked against the O(n²) definition at fixture scale).
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("TopKAgg equals the window row_number formulation") {
    val viaAgg = ScaleOpsQueries.queries("q_topk_group_agg")(spark, sf)
      .collect().map(_.toString).toSeq
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWin = Tables.t(spark, sf, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("o_custkey", "rk")
      .collect().map(_.toString).toSeq
    assert(viaAgg == viaWin)
  }

  test("TopKAgg buffer never exceeds k and merge order is irrelevant") {
    val agg = new TopKAgg(3)
    val xs = (1 to 50).map(i => TopKEntry((i * 37 % 11).toDouble, i.toLong))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(whole.length == 3)
    // every split point and both merge orders give the same top-3
    for (cut <- 1 until xs.length) {
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(bl.length <= 3 && br.length <= 3)
      assert(agg.merge(bl, br) == whole)
      assert(agg.merge(br, bl) == whole)
    }
    // ties break by id ascending: equal v → lower id wins
    val tied = Seq(TopKEntry(5, 9), TopKEntry(5, 2), TopKEntry(5, 7),
      TopKEntry(5, 1))
    val top = tied.foldLeft(agg.zero)(agg.reduce)
    assert(top.map(_.id) == Seq(1, 2, 7))
  }

  test("z-order buckets cluster both keys (range product shrinks)") {
    val rows = ScaleOpsQueries.queries("q_layout_zorder")(spark, sf)
      .collect()
    assert(rows.length > 1)
    val li = Tables.t(spark, sf, "lineitem")
    val g = li.agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"),
      max("l_suppkey"), count(lit(1))).head()
    val full = (g.getLong(1) - g.getLong(0) + 1).toDouble *
      (g.getLong(3) - g.getLong(2) + 1)
    val nRows = g.getLong(4)
    // mean per-bucket (pk-range × sk-range) area, row-weighted, must be
    // well under the whole key plane: that shrinkage IS the min/max
    // file-skipping a Z-ordered layout buys on both dimensions at once
    val weighted = rows.map { r =>
      val n = r.getAs[Long]("n").toDouble
      val area = (r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min") + 1)
        .toDouble *
        (r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min") + 1)
      n * area
    }.sum / nRows
    assert(weighted < full * 0.5,
      s"z-buckets do not cluster: mean area $weighted vs plane $full")
  }

  test("skyline equals the quadratic non-dominated definition") {
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").cast("long"), col("o_totalprice"),
        datediff(col("o_orderdate").cast("date"),
          lit(java.sql.Date.valueOf("1995-01-01"))).as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val naive = o.filter { case (_, p, d) =>
      !o.exists { case (_, p2, d2) =>
        d2 <= d && p2 >= p && (d2 < d || p2 > p)
      }
    }.map(t => (t._3, t._1)).sortBy(identity).toSeq
    val got = ScaleOpsQueries.queries("q_skyline_pareto")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("day").toInt, r.getAs[Long]("o_orderkey")))
      .toSeq
    assert(got == naive)
  }

  test("bitmap distinct equals countDistinct on every event_type") {
    val got = ScaleOpsQueries.queries("q_agg_bitmap_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
