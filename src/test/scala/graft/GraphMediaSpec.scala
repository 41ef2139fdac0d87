package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the eighth-pass batch (queries/GraphMediaQueries):
  * triangle-count identities, Benford mass conservation, concentration
  * monotonicity, link-prediction non-adjacency, and equivalence of the
  * materialized affinity-graph warmup path with the inline derivation.
  */
class GraphMediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("triangles: per-vertex counts sum to 3x the triangle total and " +
    "clustering stays in [0,1]") {
    val rows = q("q_graph_triangles").collect()
    val sumTri = rows.map(_.getLong(2)).sum
    assert(sumTri % 3 === 0, s"per-vertex triangle sum $sumTri not 3k")
    assert(sumTri > 0, "fixture graph should contain triangles")
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0, s"clustering $c out of range: $r")
    }
  }

  test("affinity warmup: materialized edge list equals inline derivation") {
    import graft.queries.GraphMediaQueries
    val inline0 = GraphMediaQueries.affinityEdges(spark, sf).collect().toSet
    GraphMediaQueries.ensureAffinityGraph(spark, sf)
    val mat = GraphMediaQueries.affinityEdges(spark, sf).collect().toSet
    assert(mat === inline0)
  }

  test("common neighbors: reported pairs are NOT edges of the graph") {
    import graft.queries.GraphMediaQueries
    val edges = GraphMediaQueries.affinityEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = q("q_graph_common_neighbors").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val p = (r.getLong(0), r.getLong(1))
      assert(!edges.contains(p), s"predicted pair $p is already an edge")
      assert(r.getLong(2) >= 1)
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("benford: digit masses conserve the row count and shares sum to 1") {
    val rows = q("q_stats_benford").collect()
    val nOrders = graft.engine.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum === nOrders)
    val shares = rows.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"shares sum to $shares")
    val pexp = rows.map(_.getDouble(3)).sum
    assert(math.abs(pexp - 1.0) < 1e-12, s"Benford masses sum to $pexp")
  }

  test("concentration: tiers nest (top1 within top5 within top10)") {
    val m = q("q_revenue_concentration").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val (n1, s1) = m("top1"); val (n5, s5) = m("top5")
    val (n10, s10) = m("top10")
    assert(n1 <= n5 && n5 <= n10)
    assert(s1 <= s5 && s5 <= s10)
    assert(s1 > 0.0 && s10 < 1.0)
  }

  test("modularity: degree masses sum to 2m, intra edges bound by m, " +
    "and Q is within [-1, 1]") {
    import graft.queries.GraphMediaQueries
    val m = GraphMediaQueries.affinityEdges(spark, sf).count()
    val rows = q("q_graph_modularity").collect()
    assert(rows.map(_.getLong(3)).sum === 2 * m)
    assert(rows.map(_.getLong(2)).sum <= m)
    val qTot = rows.map(_.getDouble(4)).sum
    assert(qTot >= -1.0 && qTot <= 1.0, s"Q = $qTot out of range")
  }

  test("changepoint: one row per event type, stat non-negative, split " +
    "is a proper prefix") {
    val types = graft.engine.Tables.events(spark, sf)
      .select("event_type").distinct().count()
    val rows = q("q_ts_changepoint").collect()
    assert(rows.length.toLong === types)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(r.getLong(2) >= 1L)
    }
  }

  test("cross-fold target encode: leave-fold-out encodes bracket " +
    "sanity (positive, finite) and cover all segment-fold cells") {
    val rows = q("q_feat_target_encode_cv").collect()
    assert(rows.length === 25, s"expected 5 segments x 5 folds")
    rows.foreach { r =>
      val e = r.getDouble(3)
      assert(e > 0.0 && !e.isInfinite && !e.isNaN, s"bad encode: $r")
    }
  }

  test("frame sampling: one output row per document, counts match the " +
    "closed form") {
    val docs = graft.engine.Tables.t(spark, sf, "documents")
    val rows = q("q_multimodal_framesample").collect()
    assert(rows.length.toLong === docs.count())
    rows.foreach { r =>
      val dur = r.getLong(1); val n = r.getLong(2); val last = r.getLong(3)
      val nFrames = dur * 30 / 1000
      val expected = math.max(nFrames - 1, 0L) / 10L + 1L
      assert(n === expected, s"media ${r.getLong(0)}: $n != $expected")
      assert(last === (expected - 1L) * 10L)
    }
  }
}
