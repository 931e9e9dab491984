ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fits2dbspark"
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
// Forked program stdout goes straight through instead of being logged
// with an "[info] " prefix — the r1 bench record failed to parse because
// the driver captured "[info] {json}" (plus sbt's trailer). With
// StdoutOutput the JSON line is byte-clean on stdout.
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
// Parallel forked test groups (r15, r14 verdict #6): the suite had
// outgrown the driver's test budget (~30 min sequential; the driver's
// VERIFY truncated mid-run and could no longer confirm the suite green).
// Heavy suites get their own forked JVM and run CONCURRENTLY (each is a
// local[4] session — 6 in flight ≈ 24 task threads on 32 cores); light
// suites share the remainder group. Per-group warehouse/derby overrides
// keep catalog writers (a9's bucketed saveAsTable, DDL tests) from
// colliding across concurrent JVMs; everything else is already
// per-PID-scratch isolated (Util.scratch/fixtureOnce).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / javaOptions).value
  val ownGroup = Map(
    "graft.OpSmokeSpec" -> 0,
    "graft.OpSmokeSpecShard1" -> 1,
    "graft.OpSmokeSpecShard2" -> 2,
    "graft.OpSmokeSpecShard3" -> 3,
    "graft.StreamOpsSpec" -> 4,
    "graft.LlmOpsSpec" -> 5,
    "graft.IngestCliSpec" -> 6,
    "graft.PrepPipelineSpec" -> 6,
    "graft.ScanOpsSpec" -> 7,
    "graft.FitsSpec" -> 7,
  )
  tests.groupBy(t => ownGroup.getOrElse(t.name, 8)).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts, Tests.SubProcess(ForkOptions()
        .withRunJVMOptions((base ++ Seq(
          s"-Dspark.sql.warehouse.dir=/tmp/graft_test_wh_g$i",
          s"-Dderby.system.home=/tmp/graft_test_derby_g$i")).toVector)))
    }
}
// The ForkedTestGroup tag defaults to 1 concurrent group; allow 6.
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 6))
