ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphframesspark"
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
// r15 (verdict ask #1): the suite is ~1500 s of mostly tiny iterative-
// algorithm tests run SEQUENTIALLY in one forked JVM — 37 min wall, past
// the driver's verify window (VERIFY_r14 tests_ok:false was the window
// expiring mid-suite, not a red test). Shard the suites across parallel
// forked JVMs: each JVM gets its own SparkSession (TestBase.session is
// per-process), so no shared-session races, and wall time drops to the
// slowest shard. Suites are dealt round-robin over sorted names so the
// heavy ones (AlgorithmsSpec, ExtendedSpec, TwoConnectivitySpec, …)
// spread out. GRAFT_TEST_SHARDS=1 restores the old single-JVM run.
val testShards = sys.env.getOrElse("GRAFT_TEST_SHARDS", "6").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  tests.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % testShards).toSeq.sortBy(_._1)
    .map { case (i, group) =>
      Tests.Group(s"shard$i", group.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts.toVector)))
    }
}
// sbt caps concurrent forked test groups at 1 by default
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testShards),
  Tags.limitAll(math.max(testShards, 4)))
// Pass the forked JVM's stdout straight through (no "[info] " logger
// prefix) so the one-line JSON contract of graft.Bench / graft.Verify
// stays machine-parseable from sbt's stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress the trailing "[success] Total time: ..." banner: the bench
// driver parses the LITERAL last stdout line as JSON, and the banner was
// shadowing graft.Bench's one-line artifact every round (BENCH_r* landed
// with parsed:null). With the banner off, the JSON line printed by the
// forked main IS the final stdout line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
