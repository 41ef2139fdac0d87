package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage decomposition of `q_ml_knn_accuracy_banded` — the judge's
  * round-12 ask: the query has sat at 2.7–2.8 s raw (duo-warm ~1.9 s)
  * against a 2 s budget for three rounds; either find the missing
  * second or price the fixed overhead and declare the floor. This
  * tool times each stage of the banded pipeline on the SAME built
  * index per round (persisting the stage boundary frames so later
  * stages don't recompute earlier ones), plus the whole declared
  * query duo-style, and prints per-stage medians:
  *
  *   build   buildCellIndex: footer count + takeOrdered centroid scan
  *           + assignment pass + cellStats collect (cache populated)
  *   within  the within-cell half self-join, scored + persisted
  *   l5      the per-vector 5th-best rank over the mirrored within
  *   probes  the linear cap-prune pass (floor attach + survivors)
  *   vote    cross-tier scoring + the WindowGroupLimit vote tail
  *           (includes the cross scoring join — the no-prune n² dot
  *           products on isotropic geometry)
  *   whole   bandedKnnAccuracy end-to-end (build + serve), duo pair
  *
  * Dev tool, not part of the graded surface. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.KnnDecomp [rounds]
  */
object KnnDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{DedupQueries, KnnOpsQueries}

    val times = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      r
    }
    def pairCos(e1: Column, n1: Column, e2: Column, n2: Column) =
      DedupQueries.pairCosCol(e1, n1, e2, n2).as("cos")

    // one untimed warmup round compiles every stage's codegen
    for (r <- 0 to rounds) {
      val rec = r > 0
      spark.catalog.clearCache()
      def tt[T](name: String)(f: => T): T =
        if (rec) t(name)(f) else f
      val ci = tt("build") { DedupQueries.buildCellIndex(spark, sfDir) }
      val memVec = ci.memVec
      val cap = DedupQueries.BroadcastHintMaxRows / 8
      def bcWide(df: DataFrame) =
        DedupQueries.maybeBroadcast(df, ci.nVec, cap)
      def bcSkinny(df: DataFrame) =
        DedupQueries.maybeBroadcast(df, ci.nVec, cap * 8)
      val withinHalf = tt("within") {
        val wh = memVec
          .select(col("vec_id").as("id1"), col("cell"),
            col("embedding").as("e1"), col("nrm").as("n1"))
          .join(bcWide(memVec.select(col("vec_id").as("id2"),
            col("cell").as("c2"), col("embedding").as("e2"),
            col("nrm").as("n2"))),
            col("cell") === col("c2") && col("id1") < col("id2"))
          .select(col("id1"), col("id2"),
            pairCos(col("e1"), col("n1"), col("e2"), col("n2")))
          .persist()
        wh.count()
        wh
      }
      val withinDir = withinHalf.unionAll(withinHalf.select(
        col("id2").as("id1"), col("id1").as("id2"), col("cos")))
      val l5 = tt("l5") {
        val f = withinDir.withColumn("rk", row_number().over(
            Window.partitionBy("id1")
              .orderBy(col("cos").desc, col("id2"))))
          .filter(col("rk") === 5)
          .select(col("id1").as("vec_id"), col("cos").as("l5"))
          .persist()
        f.count()
        f
      }
      val probes = tt("probes") {
        val p = ci.probes(memVec
          .select(col("vec_id"), col("embedding"), col("nrm"))
          .join(bcSkinny(l5), Seq("vec_id"), "left")
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("l5").as("floor")))
          .persist()
        p.count()
        p
      }
      tt("vote") {
        val crossDir = probes
          .join(bcWide(memVec.select(col("vec_id").as("id2"),
            col("cell").as("c2"), col("embedding").as("e2"),
            col("nrm").as("n2"))), col("cell") === col("c2"))
          .select(col("id1"), col("id2"),
            pairCos(col("e1"), col("n1"), col("e2"), col("n2")))
        KnnOpsQueries.knnVoteTail(withinDir.unionAll(crossDir),
          bcSkinny(ci.vn.select(col("vec_id"), col("label"))))
          .count()
      }
      spark.catalog.clearCache()
      // the declared query end-to-end, duo ([X, X], both recorded)
      tt("whole_A") {
        KnnOpsQueries.bandedKnnAccuracy(spark, sfDir).count() }
      spark.catalog.clearCache()
      tt("whole_B") {
        KnnOpsQueries.bandedKnnAccuracy(spark, sfDir).count() }
    }
    for (name <- Seq("build", "within", "l5", "probes", "vote",
        "whole_A", "whole_B")) {
      val v = times(name).sorted
      println(f"$name%-8s median ${v(v.length / 2)}%6.3f  " +
        s"all ${v.map(x => f"$x%.2f").mkString(" ")}")
    }
    val stages = Seq("build", "within", "l5", "probes", "vote")
      .map(n => { val v = times(n).sorted; v(v.length / 2) }).sum
    println(f"stage-sum $stages%6.3f (vs whole_B median)")
    spark.stop()
  }
}
