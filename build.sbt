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
) ++
  // forward the opt-in gate knobs into the FORKED test JVMs — a bare
  // `sbt -Dk=v` only reaches the sbt JVM itself
  Seq("graft.scale.ladder", "graft.shard.budget.sec")
    .flatMap(k => sys.props.get(k).map(v => s"-D$k=$v"))

// Gate-time sharding (r9 verdict ask #6; golden-hashed r11 per r10
// ask #1; 6 shards r13 per r12 ask #1): the FullDeterminismShard0-5
// suites each sweep a sixth of
// the registry at shuffle partitions=1 against committed partitions=32
// golden hashes (tools/determinism_golden_*.tsv, graft.GoldenGen) —
// half the executions of the old two-run sweep, so the gate stays
// sublinear in registry growth. Each shard goes to its OWN
// forked JVM so the six sweeps run CONCURRENTLY, and each shard JVM
// gets a PRIVATE java.io.tmpdir: the src_*/cache queries write fixture
// paths under the tmpdir (graft_src/, graft_cache/), so per-JVM
// tmpdirs make the shards fully isolated — no shared SparkContext,
// SQLConf, storage cache, or fixture directory anywhere.
// r13 (r12 verdict ask #1): the main group — ~76 unit suites in ONE
// forked JVM, hence strictly sequential under fork — had become the
// gate's long pole (the 4 shard JVMs finished by ~6.5 min of an 18:57
// wall). Split it into NMainGroups forked JVMs by suite-name hash;
// suites are JVM-isolated already (in-memory Derby, ephemeral HTTP
// ports, tmpdir-relative fixtures), so each split group just needs its
// own tmpdir + derby log like the shards.
val NMainGroups = 3
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  def grp(name: String, ts: Seq[TestDefinition], tmp: String) = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    Tests.Group(name, ts, Tests.SubProcess(ForkOptions()
      .withRunJVMOptions(baseOpts ++ Seq(
        s"-Djava.io.tmpdir=$tmp",
        s"-Dderby.stream.error.file=$tmp/derby.log",
        // 9 concurrent JVMs on one 32-core box: each JVM sizes every
        // internal pool (GC ~23 threads, JIT, netty event loops,
        // ForkJoin commonPool) for SOLE tenancy of all 32 cores, so
        // the full gate ran thousands of runnable threads and every
        // group measured 5-25x its solo wall (isolation A/B: the
        // 500-case RelJson fuzz is 18 s among 4 JVMs, 8:21 among 9).
        // ActiveProcessorCount is the canonical multi-tenant fix — the
        // JVM sizes everything for 6 cores (Spark is local[4] inside);
        // the explicit GC/JIT caps keep the two biggest pools tighter
        // still. 9 groups x 6 procs ≈ the 32-core budget.
        "-XX:ActiveProcessorCount=6",
        "-XX:ParallelGCThreads=4", "-XX:ConcGCThreads=2",
        "-XX:CICompilerCount=2"))))
  }
  val (shards, rest) =
    tests.partition(_.name.startsWith("graft.FullDeterminismShard"))
  val shardGroups = shards.sortBy(_.name).map { t =>
    grp(t.name, Seq(t), s"/tmp/graft_det_tmp_${t.name.takeRight(1)}")
  }
  val mainGroups = rest.groupBy(t =>
      java.lang.Math.floorMod(t.name.hashCode, NMainGroups))
    .toSeq.sortBy(_._1).map { case (i, ts) =>
      grp(s"main$i", ts, s"/tmp/graft_main_tmp_$i")
    }
  mainGroups ++ shardGroups
}
// let all 9 forked groups (3 main + 6 shards) run at once; the box has
// 32 CPUs and each JVM's Spark session is local[4]
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 9),
  Tags.limitAll(24))
// per-test durations in the log (-oD) so group balance is auditable
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
