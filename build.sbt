ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "noveltidingospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes through undecorated: sbt's default logger
// prefixes every child stdout line with "[info] ", which breaks
// line-oriented JSON parsing of Bench's single-line report downstream.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- Parallel test groups (round 14) ----
// The full suite ran 24-28 min serial in one forked JVM — past the
// driver's test window (VERIFY_r13: tests_ok=false with a truncated
// all-warnings tail, no failing assertion). Suites are packed greedily
// by measured duration (r14 baseline run, -oD) into independent forked
// JVMs running concurrently; each group gets its OWN java.io.tmpdir
// and Spark warehouse dir so the fixed-name layout-preparation writes
// (Tables.tmpRoot consumers: bucketed tables, edge lists, partitioned
// orders) cannot race across JVMs. Coverage is unchanged — same
// suites, same tests, only the JVM placement differs; the two
// all-query sweeps (DeterminismSpec, NonEmptySpec) are additionally
// sharded by sorted-index mod so they parallelize too.
val testSuiteSeconds: Map[String, Int] = Map(
  "IndexLifecycleSpec" -> 149, "PlanSpec" -> 118,
  "DeterminismSpec" -> 100, "DeterminismSpecB" -> 94,
  "DeterminismSpecC" -> 94, "DeterminismSpecD" -> 94,
  "DeterminismSpecE" -> 94, "StreamingSpec" -> 89, "LibrarySpec" -> 86,
  "NonEmptySpec" -> 77, "NonEmptySpecB" -> 77, "NonEmptySpecC" -> 77,
  "GraphAnnSpec" -> 61, "KnnOpsSpec" -> 60, "DecompSpec" -> 35,
  "PropertySpec" -> 25, "StatGraphSpec" -> 19, "RankStatsSpec" -> 16,
  "EntityOpsSpec" -> 16, "MlOpsSpec" -> 15, "LineageCutSpec" -> 12,
  "RobustStatsSpec" -> 10, "MlEvalSpec" -> 9, "GraphMediaSpec" -> 7,
  "AssocStatsSpec" -> 7, "EdgeSpec" -> 7, "EvalGraphSpec" -> 7,
  "SqlParitySpec" -> 7, "PatternSpec" -> 6, "SearchStatsSpec" -> 6,
  "DivergenceSpec" -> 6, "ExperimentSpec" -> 6, "WarehouseSpec" -> 6,
  "SignalSpec" -> 5, "CorpusOpsSpec" -> 5, "ShuffleMetricsSpec" -> 5,
  "RecEvalSpec" -> 5, "GovernanceSpec" -> 4, "PlansSpec" -> 4,
  "FeatureSpec" -> 4, "ControlSpec" -> 4, "ScaleOpsSpec" -> 4,
  "AuditOpsSpec" -> 3, "VarianceSeqSpec" -> 3, "MonitorSpec" -> 3,
  "RetentionEvalSpec" -> 3, "EmbAuditSpec" -> 2, "SchemaCanarySpec" -> 1,
)
val testGroupCount = 8
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  // longest-processing-time greedy bin packing; unknown (new) suites
  // get a conservative default weight
  val weighted = tests.map { t =>
    t -> testSuiteSeconds.getOrElse(t.name.split('.').last, 10)
  }.sortBy { case (t, w) => (-w, t.name) }
  val load = Array.fill(testGroupCount)(0L)
  val buckets = Array.fill(testGroupCount)(List.empty[TestDefinition])
  weighted.foreach { case (t, w) =>
    val g = load.indices.minBy(load(_))
    load(g) += w
    buckets(g) = t :: buckets(g)
  }
  buckets.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    val tmp = file(s"/tmp/graft-tests-g$i")
    IO.createDirectory(tmp)
    Tests.Group(
      s"g$i",
      ts.reverse,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts ++ Vector(
        s"-Djava.io.tmpdir=$tmp",
        s"-Dspark.sql.warehouse.dir=$tmp/spark-warehouse"))))
  }.toSeq
}
// default restrictions cap ForkedTestGroup at 1 — lift it to the group
// count (each group is a local[4] SparkSession; 8 x 4 = the 32 cores)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(24),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
)
