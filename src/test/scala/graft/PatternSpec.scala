package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the PatternQueries batch. */
class PatternSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("stream topk: two ranked rows per day, consistent with tumbling") {
    val rows = SparkEntry.queries("q_stream_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val tumb = graft.streaming.StreamTransforms
      .tumbling(graft.engine.Tables.events(spark, sf)).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("event_type")) -> r.getAs[Long]("cnt")).toMap
    rows.groupBy(_.getAs[java.sql.Date]("day").toString)
      .foreach { case (day, rs) =>
        assert(rs.length == 2)
        val sorted = rs.sortBy(_.getAs[Long]("rnk"))
        assert(sorted.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L))
        assert(sorted(0).getAs[Long]("cnt") >= sorted(1).getAs[Long]("cnt"))
        sorted.foreach { r =>
          assert(tumb((day, r.getAs[String]("event_type"))) ==
            r.getAs[Long]("cnt"))
        }
        // rank-1 really is the day's max count
        val dayMax = tumb.collect { case ((d, _), c) if d == day => c }.max
        assert(sorted(0).getAs[Long]("cnt") == dayMax)
      }
  }

  test("seq pattern: matches a local strict-adjacency scan") {
    val got = SparkEntry.queries("q_seq_pattern_match")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_matches")).toMap
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts_us")).as("tu")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val types = xs.sortBy(x => (x._4, x._2)).map(_._3)
      val n = types.indices.dropRight(2).count(i =>
        types(i) == "view" && types(i + 1) == "click" &&
          types(i + 2) == "purchase").toLong
      if (n >= 1) Some(u -> n) else None
    }.toMap
    assert(got == expected)
  }

  test("lift curve: gains accumulate to 1, lift = gain/pop_share") {
    val rows = SparkEntry.queries("q_ml_lift_curve")(spark, sf)
      .collect().sortBy(-_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val gains = rows.map(_.getAs[Double]("gain"))
    val shares = rows.map(_.getAs[Double]("pop_share"))
    assert((gains, gains.tail).zipped.forall(_ <= _))
    assert((shares, shares.tail).zipped.forall(_ <= _))
    assert(gains.last == 1.0 && shares.last == 1.0)
    assert(rows.last.getAs[Double]("lift") == 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("lift") ==
        r.getAs[Double]("gain") / r.getAs[Double]("pop_share"))
    }
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == graft.engine.Tables.events(spark, sf).count())
  }

  test("calendar profile: cells conserve events, dow matches java.time") {
    val rows = SparkEntry.queries("q_ts_calendar_profile")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      graft.engine.Tables.events(spark, sf).count())
    rows.foreach { r =>
      val (dow, hod) = (r.getAs[Long]("dow"), r.getAs[Long]("hod"))
      assert(dow >= 0 && dow <= 6 && hod >= 0 && hod <= 23)
    }
    // pin the numbering: sample events, recompute dow/hod via java.time
    val sample = graft.engine.Tables.events(spark, sf)
      .select(unix_micros(col("ts_us")).as("tu")).limit(50).collect()
      .map(_.getLong(0))
    sample.foreach { tu =>
      val ins = java.time.Instant.EPOCH.plus(tu,
        java.time.temporal.ChronoUnit.MICROS)
      val utc = ins.atZone(java.time.ZoneOffset.UTC)
      val wantDow = utc.getDayOfWeek.getValue % 7 // java: Mon=1..Sun=7
      assert(((tu / 86400000000L) + 4) % 7 == wantDow)
      assert((tu / 3600000000L) % 24 == utc.getHour)
    }
  }
}
