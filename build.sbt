ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "melodistspark"
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
// Per-test durations in the test report (-oD): the suite's wall time
// is itself a driver gate (the verify window killed a 51-minute run
// in round 13), so every run must say where the minutes go.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// The suite is ~1,056 s of pure sequential work in one forked JVM (sum of
// suite times == wall). Suites share nothing across JVMs — each JVM gets
// its own TestSpark session (local[4]) and unique createTempDirectory
// dirs, and nothing writes to spark-warehouse or a metastore — so fork
// them into GRAFT_TEST_GROUPS parallel JVMs (default 6; 6×local[4]=24
// cores on a 32-core box). Greedy LPT bin-packing by measured suite
// weight keeps the critical path at the heaviest suite (~135 s).
val testSuiteWeights: Map[String, Int] = Map(
  "BpeSpec" -> 133, "StationSessionSpec" -> 116, "CorpusIndexStoreSpec" -> 115,
  "StreamingTokenizeSpec" -> 77, "InterpolateCalibrateSpec" -> 60,
  "SentenceIndexStoreSpec" -> 48, "GoldenDisaggSpec" -> 44,
  "CurationSpec" -> 40, "MultiStationSpec" -> 38, "RegistrySpec" -> 37,
  "GraphsSpec" -> 34, "ClustersSpec" -> 31, "ParagraphIndexStoreSpec" -> 27,
  "SimilaritySpec" -> 27, "CascadeSpec" -> 25, "PropertySpec" -> 25,
  "TextSpec" -> 21, "Cascade5minSpec" -> 17, "VectorIndexStoreSpec" -> 15,
  "GraphEdgeStoreSpec" -> 14, "MicroDotLongSpec" -> 13,
  "UrlIndexStoreSpec" -> 11, "StreamingAggSpec" -> 11,
  "StreamingCascadeSpec" -> 9, "UnigramSpec" -> 9, "WordPieceSpec" -> 8,
  "LanguageIdSpec" -> 6, "BqSpec" -> 6,
).map { case (k, v) => (k, v) }
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val nGroups = math.max(1, sys.env.getOrElse("GRAFT_TEST_GROUPS", "6").toInt)
  // each forked JVM must NOT size its GC/JIT/common pools for the whole
  // box: 6 JVMs × ~23 default GC threads thrashed the first parallel run
  // (sys time 99 min for 59 min of user work); cap each at its fair
  // share of the cores (local[4] Spark threads are explicit already)
  val coresPerJvm = math.max(4,
    java.lang.Runtime.getRuntime.availableProcessors / nGroups)
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector :+
      s"-XX:ActiveProcessorCount=$coresPerJvm")
  if (nGroups == 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(forkOpts)))
  else {
    def weight(t: TestDefinition): Int =
      testSuiteWeights.getOrElse(t.name.split('.').last, 3)
    val bins = Array.fill(nGroups)(
      (scala.collection.mutable.ListBuffer.empty[TestDefinition], Array(0)))
    // LPT: heaviest first into the lightest bin; name tiebreak keeps the
    // assignment deterministic run to run.
    tests.sortBy(t => (-weight(t), t.name)).foreach { t =>
      val bin = bins.minBy(_._2(0))
      bin._1 += t; bin._2(0) += weight(t)
    }
    bins.zipWithIndex.toSeq.map { case ((ts, _), i) =>
      Tests.Group(s"g$i", ts.toList, Tests.SubProcess(forkOpts))
    }
  }
}
// Suites WITHIN a JVM must stay sequential: ScaleGuard.probe and the
// conf-mutating suites are JVM-global state, and in-JVM suite
// parallelism (testForkedParallel) raced them (ScaleGuardSpec caught a
// CascadeSpec trip). Parallelism comes from the cross-JVM groups only.
Test / testForkedParallel := false
// 6 concurrent forked JVMs need the tag budget to allow them.
Global / concurrentRestrictions := Seq(Tags.limitAll(
  math.max(4, sys.env.getOrElse("GRAFT_TEST_GROUPS", "6").toInt + 2)))
