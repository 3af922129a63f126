ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hoodiespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Java sources compile FIRST and scalac then reads their BYTECODE (not
// their source): the one Java shim bridges onto a Spark trait that is
// public in bytecode but `private[sql]` in its Scala signature
compileOrder := CompileOrder.JavaThenScala
Test / fork := true
run / fork := true
// The driver parses graft.Bench's stdout for a bare JSON line; sbt's
// default LoggedOutput prefixes forked output with "[info] " which breaks
// that parse (BENCH_r01.json recorded parsed:null). Inherit stdout instead.
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

// ---- test-suite wall time: distribute suites across forked JVMs ----
// Sequentially the 93 suites take ~40 min (measured 2026-08-18): they are
// driver-latency bound on one shared local[4] session, so a 32-core box
// sits mostly idle — and the round-16 CI run was killed by a wall-clock
// budget mid-suite (VERIFY_r16 tests_ok=false, shutdown hook tore down the
// shared SparkContext). Suites are self-contained (per-suite temp dirs, no
// cross-suite fixtures), so pack WHOLE suites onto N forked JVMs (greedy
// longest-first by measured weight; unknown suites count 15 s). Each JVM
// runs its suites sequentially on its own SparkTestBase session — same
// tests, same assertions, ~4x less wall time. SPARK_GRAFT_TEST_JVMS=1
// restores the single-JVM run.
val testSuiteWeights: Map[String, Int] = Map(
  "graft.OpSequenceFuzzSpec" -> 536,
  "graft.ConsistentBucketSpec" -> 140,
  "graft.MaterializedViewSpec" -> 134,
  "graft.BucketIndexSpec" -> 85,
  "graft.CatalogDmlFuzzSpec" -> 83,
  "graft.HashDedupFuzzSpec" -> 81,
  "graft.SchemaEvolutionFuzzSpec" -> 59,
  "graft.DedupServiceSpec" -> 57,
  "graft.RecordIndexSpec" -> 56,
  "graft.SecondaryIndexSpec" -> 49,
  "graft.PartitionEvolutionSpec" -> 49,
  "graft.CatalogDdlSpec" -> 44,
  "graft.PropertySpec" -> 39,
  "graft.ClusteringServiceSpec" -> 37,
  "graft.PipelineSpec" -> 36,
  "graft.SqlDmlSpec" -> 36,
  "graft.StreamingSourceSpec" -> 33,
  "graft.DecontaminateServiceSpec" -> 32,
  "graft.MvRewriteSpec" -> 30,
  "graft.PayloadSpec" -> 29,
  "graft.MergeStreamSpec" -> 29,
  "graft.CowTableSpec" -> 23,
  "graft.HashDedupServiceSpec" -> 22,
  "graft.SqlCallProcedureSpec" -> 22,
  "graft.CompactionAdminSpec" -> 22,
  "graft.FilesIndexSpec" -> 21,
  "graft.HiveCatalogTargetSpec" -> 21,
  "graft.ServicesSpec" -> 20,
  "graft.SpanDedupServiceSpec" -> 20,
  "graft.GraftCliSpec" -> 19,
  "graft.LifecycleSpec" -> 19,
  "graft.StatsAnswerSpec" -> 19,
  "graft.NestedLifecycleFuzzSpec" -> 17,
  "graft.MorTableSpec" -> 17,
  "graft.RollupServiceSpec" -> 17,
  "graft.PlanShapeSpec" -> 17,
  "graft.StorageSubstrateSpec" -> 17,
  "graft.AlterIngestSpec" -> 16,
  "graft.JobCountSpec" -> 16,
  "graft.PipelinePropertySpec" -> 16,
  "graft.IncrementalCdcSpec" -> 15,
  "graft.VectorIndexSpec" -> 15,
  "graft.TextIndexSpec" -> 15,
  "graft.DsirSpec" -> 15,
  "graft.CatalogSyncSpec" -> 15,
  "graft.ConcurrencyFuzzSpec" -> 15,
  "graft.ConstraintsSpec" -> 15,
)
val testJvms: Int =
  sys.env.get("SPARK_GRAFT_TEST_JVMS").map(_.toInt)
    .getOrElse(math.max(1, math.min(4,
      java.lang.Runtime.getRuntime.availableProcessors / 8)))
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  if (testJvms <= 1)
    Seq(new Tests.Group("tests", tests, Tests.SubProcess(opts)))
  else {
    val sorted = tests.sortBy(t =>
      (-testSuiteWeights.getOrElse(t.name, 15), t.name))
    val bins = Vector.fill(testJvms)(
      scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
    val loads = Array.fill(testJvms)(0L)
    for (t <- sorted) {
      val i = loads.indices.minBy(loads(_))
      bins(i) += t
      loads(i) += testSuiteWeights.getOrElse(t.name, 15).toLong
    }
    bins.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
      new Tests.Group(s"jvm-$i", ts.toSeq, Tests.SubProcess(opts))
    }
  }
}
// sbt's default restrictions cap forked test groups at 1 — raise it so the
// groups actually run concurrently (each is one local[4] Spark JVM)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors)),
  Tags.limit(Tags.ForkedTestGroup, math.max(1, testJvms)),
)
