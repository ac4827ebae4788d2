ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xorqspark"
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
// Let the forked `run` JVM inherit the real stdout/stderr instead of
// sbt's logger: Bench prints ONE machine-readable JSON line that the
// bench driver parses, and sbt's default LoggedOutput prefixes every
// line with [info]/[error], which broke that parse (BENCH "parsed:
// null" in rounds 1-5).
run / outputStrategy := Some(StdoutOutput)
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

// Gate-time sharding (r9 verdict ask #6; golden-hashed r11 per r10
// ask #1): the FullDeterminismShard0-3 suites each sweep a quarter of
// the registry at shuffle partitions=1 against committed partitions=32
// golden hashes (tools/determinism_golden_*.tsv, graft.GoldenGen) —
// half the executions of the old two-run sweep, so the gate stays
// sublinear in registry growth. Each shard goes to its OWN
// forked JVM so the four sweeps run CONCURRENTLY, and each shard JVM
// gets a PRIVATE java.io.tmpdir: the src_*/cache queries write fixture
// paths under the tmpdir (graft_src/, graft_cache/), so per-JVM
// tmpdirs make the shards fully isolated — no shared SparkContext,
// SQLConf, storage cache, or fixture directory anywhere.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  val (shards, rest) =
    tests.partition(_.name.startsWith("graft.FullDeterminismShard"))
  val shardGroups = shards.sortBy(_.name).map { t =>
    val tmp = s"/tmp/graft_det_tmp_${t.name.takeRight(1)}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    Tests.Group(t.name, Seq(t), Tests.SubProcess(ForkOptions()
      .withRunJVMOptions(baseOpts :+ s"-Djava.io.tmpdir=$tmp")))
  }
  Tests.Group("main", rest,
    Tests.SubProcess(ForkOptions().withRunJVMOptions(baseOpts))) +:
    shardGroups
}
// let all 5 forked groups (main + 4 shards) run at once; the box has
// 32 CPUs and each JVM's Spark session is local[4]
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(16))
