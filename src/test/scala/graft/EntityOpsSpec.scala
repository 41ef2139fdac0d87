package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the EntityOpsQueries batch. */
class EntityOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("fuzzy match: agrees with a brute-force block scan") {
    import spark.implicits._
    val parts = graft.engine.Tables.t(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_name")
      .as[(Long, String, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val byBlock = parts.toSeq.groupBy(p => (p._2, p._3.split(" ")(0)))
    val wantPairs = byBlock.values.toSeq.flatMap { ps =>
      for {
        a <- ps; b <- ps
        if a._1 < b._1 && lev(a._3, b._3) <= 2
      } yield (a._2, a._1, b._1)
    }
    val wantByBrand = wantPairs.groupBy(_._1).view.mapValues { ps =>
      (ps.size.toLong,
        ps.flatMap(p => Seq(p._2, p._3)).distinct.size.toLong)
    }.toMap
    val got = SparkEntry.queries("q_join_fuzzy_name")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == wantByBrand)
    assert(got.nonEmpty)
  }

  test("checksum: signature is partition-order independent") {
    import spark.implicits._
    val base = SparkEntry.queries("q_table_checksum")(spark, sf)
      .as[(java.sql.Date, Long, Long, Double)].collect().toSeq
    // same rows, radically different physical distribution
    val reshuffled = graft.engine.Tables.t(spark, sf, "orders")
      .repartition(17, col("o_orderstatus"))
    reshuffled.createOrReplaceTempView("orders_reshuffled")
    val again = {
      val df = reshuffled
        .select(
          date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          conv(substring(md5(concat_ws("|",
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))),
            1, 15), 16, 10).cast("long").as("sig"),
          col("o_totalprice"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(sig)").as("xor_sig"),
          graft.engine.Tables.d4(
            sum(graft.engine.Tables.D(col("o_totalprice"))))
            .as("sum_total"))
        .orderBy("month")
      df.as[(java.sql.Date, Long, Long, Double)].collect().toSeq
    }
    assert(base == again, "xor signature must survive any repartition")
    // sensitivity: dropping one row flips exactly that month's signature
    val k = graft.engine.Tables.t(spark, sf, "orders")
      .select("o_orderkey").as[Long].head()
    val mutated = graft.engine.Tables.t(spark, sf, "orders")
      .filter(col("o_orderkey") =!= k)
    val mutSig = mutated
      .select(
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        conv(substring(md5(concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))),
          1, 15), 16, 10).cast("long").as("sig"))
      .groupBy("month").agg(expr("bit_xor(sig)").as("xor_sig"))
      .as[(java.sql.Date, Long)].collect().toMap
    val baseSig = base.map(r => r._1 -> r._3).toMap
    val diffs = baseSig.keySet.count(m =>
      mutSig.get(m).exists(_ != baseSig(m)) ||
        (!mutSig.contains(m)))
    assert(diffs == 1, s"exactly one month signature must change, got $diffs")
  }

  test("yoy: ratio reproduces the division; first year has no sibling") {
    val rows = SparkEntry.queries("q_ts_yoy")(spark, sf)
      .orderBy("month").collect()
    assert(rows.length > 12)
    rows.take(12).foreach(r =>
      assert(r.isNullAt(r.fieldIndex("revenue_prev_year"))))
    for (r <- rows.drop(12)) {
      val prev = r.getAs[Double]("revenue_prev_year")
      val ratio = r.getAs[Double]("yoy_ratio")
      assert(ratio == r.getAs[Double]("revenue") / prev)
    }
  }

  test("nearest: chosen click minimizes |gap| over a brute-force scan") {
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts_us")).as("tsu"))
      .as[(Long, Long, String, Long)].collect()
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val got = SparkEntry.queries("q_join_nearest")(spark, sf)
      .select("event_id", "user_id", "nearest_click_id", "gap_us")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val evById = ev.map(e => e._1 -> e).toMap
    for ((pid, uid, cid, gap) <- got) {
      assert(gap >= 0L)
      val p = evById(pid)
      val best = clicksByUser(uid).map(c => math.abs(c._4 - p._4)).min
      assert(math.abs(evById(cid)._4 - p._4) == gap)
      assert(gap == best,
        s"purchase $pid: gap $gap but brute-force min is $best")
    }
    // every purchase of a user who has any click must appear
    val wantN = ev.filter(_._3 == "purchase")
      .count(p => clicksByUser.contains(p._2))
    assert(got.length == wantN)
  }

  test("gaps: arithmetic consistent and bounded by the span") {
    val rows = SparkEntry.queries("q_ts_gaps")(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val span = r.getAs[Long]("n_hours_span")
      val act = r.getAs[Long]("n_hours_active")
      val gaps = r.getAs[Long]("n_gaps")
      assert(act >= 1L && act <= span)
      assert(gaps == span - act)
    }
  }
}
