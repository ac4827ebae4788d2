package graft.build

import graft.SparkSpec
import graft.rel._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Lineage capture + replay verification over build artifacts. */
class LineageSpec extends SparkSpec {

  private def freshBuilds(): String =
    Files.createTempDirectory("graft_lineage_").toString

  test("lineage walks every dependency kind: sources, unbound, " +
    "functions, caches, sinks") {
    val rel = Publish(
      UdxfRel(
        Cache(
          Filter(ScanParquet(s"$sfDir/lineitem.parquet"),
            RBin(">", RCol("l_quantity"), RLit("10", "int"))),
          "default", "snapshot"),
        "tokenize", Seq("a" -> "STRING"), Seq("b" -> "STRING")),
      "/tmp/graft_lineage_sink",
      UnboundTable("__staged", Nil))
    val report = Lineage.of(rel, spark)
    assert(report.sources.map(_.kind) == Seq("parquet"))
    val src = report.sources.head
    assert(src.path.endsWith("lineitem.parquet") &&
      src.length > 0 && src.mtime > 0,
      s"live fingerprint expected, got $src")
    assert(report.unbound == Seq("__staged"))
    assert(report.functions == Seq("udxf:tokenize"))
    assert(report.caches.length == 1 &&
      report.caches.head.startsWith("default/snapshot/"))
    assert(report.sinks == Seq("publish:/tmp/graft_lineage_sink"))
  }

  test("record → verify is Ok; a changed source is reported as Drift, " +
    "not a bare mismatch") {
    val sp = spark
    val builds = freshBuilds()
    // copy a source so the test can mutate it
    val srcDir = Files.createTempDirectory("graft_lineage_src_")
    val src = srcDir.resolve("data.parquet").toString
    sp.read.parquet(s"$sfDir/region.parquet").write.parquet(src)

    val rel = Aggregate(ScanParquet(src), Nil,
      Seq("n" -> RAgg("count", Nil)))
    val art = Build.save(rel, builds)
    val fp = Replay.record(builds, art.hash, sp)
    assert(fp.rows == 1L)
    assert(Files.exists(Paths.get(builds, art.hash, "lineage.json")))
    assert(Files.exists(Paths.get(builds, art.hash, "result.json")))

    assert(Replay.verify(builds, art.hash, sp) == Replay.Ok)
    assert(!Lineage.drifted(builds, art.hash, sp))

    // mutate the source: drop rows and rewrite → result changes AND
    // the lineage fingerprint changes → Drift
    val pruned = sp.read.parquet(src).limit(2).collect()
    val schema = sp.read.parquet(src).schema
    sp.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(pruned: _*)), schema)
      .write.mode("overwrite").parquet(src)
    assert(Lineage.drifted(builds, art.hash, sp))
    assert(Replay.verify(builds, art.hash, sp) == Replay.Drift)
  }

  test("record → verify works over a plan with Exchange and Publish " +
    "effects; source drift is still detected through the barriers") {
    val sp = spark
    val builds = freshBuilds()
    val srcDir = Files.createTempDirectory("graft_replay_fx_src_")
    val src = srcDir.resolve("data.parquet").toString
    sp.read.parquet(s"$sfDir/region.parquet").write.parquet(src)
    val sink = Files.createTempDirectory("graft_replay_fx_wap_")
      .toString + "/sink"
    val target = s"replay_fx_${System.nanoTime}"

    // audit: violations = staged rows with negative keys (none)
    val audit = Filter(UnboundTable(graft.ops.Wap.StagedBinding, Nil),
      RBin("<", RCol("r_regionkey"), RLit("0", "int")))
    val rel = Aggregate(
      Publish(Exchange(ScanParquet(src), target), sink, audit),
      Nil, Seq("n" -> RAgg("count", Nil)))

    val art = Build.save(rel, builds)
    val fp = Replay.record(builds, art.hash, sp)
    assert(fp.rows == 1L)
    // the lineage records both effect sinks
    val lineage = Files.readString(Paths.get(builds, art.hash, "lineage.json"))
    assert(lineage.contains(s"exchange:$target") &&
      lineage.contains(s"publish:$sink"), lineage)
    // the exchange artifact is durable AND self-describing (sidecar)
    val exRoot = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_exchange", target)
    val exDirs = Files.list(exRoot).toArray.map(_.toString)
    assert(exDirs.nonEmpty, "exchange artifact must exist after record")
    assert(Files.exists(Paths.get(exDirs.head, "_graft_plan.json")),
      "exchange artifact must carry its plan sidecar")

    // verify re-executes through BOTH effects (a fresh publish version
    // each run) and still fingerprints equal
    assert(Replay.verify(builds, art.hash, sp) == Replay.Ok)

    // mutate the source: drift must be detected even though the plan's
    // data flows through exchange + publish barriers
    val pruned = sp.read.parquet(src).limit(2).collect()
    val schema = sp.read.parquet(src).schema
    sp.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(pruned: _*)), schema)
      .write.mode("overwrite").parquet(src)
    assert(Replay.verify(builds, art.hash, sp) == Replay.Drift)
  }

  test("an unchanged-source result change is a Mismatch " +
    "(nondeterminism detector)") {
    val sp = spark
    val builds = freshBuilds()
    val rel = Aggregate(ScanParquet(s"$sfDir/nation.parquet"), Nil,
      Seq("n" -> RAgg("count", Nil)))
    val art = Build.save(rel, builds)
    Replay.record(builds, art.hash, sp)
    // tamper with the RECORDED fingerprint (simulates a nondeterministic
    // plan whose re-run diverges while sources are untouched)
    Files.writeString(Paths.get(builds, art.hash, "result.json"),
      """{"rows":999,"checksum":123}""")
    assert(Replay.verify(builds, art.hash, sp) == Replay.Mismatch)
  }
}
