package graft.build

import graft.SparkSpec
import graft.api.GraftSession
import graft.cache.ParquetDirStorage
import graft.rel._
import java.nio.file.{Files, Paths}

/** Orphan-artifact sweep: catalog-referenced and sidecar-live artifact
  * dirs survive; bare junk dirs and stale (re-keyed) artifacts go. */
class ContentStoreSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("sweep keeps catalog- and sidecar-live artifacts, removes " +
    "junk and stale keys; dry run touches nothing") {
    val sp = spark
    val builds = tmp("graft_cs_builds_")
    val cacheRoot = tmp("graft_cs_cache_")
    val session = new GraftSession(sp,
      storages = Map("default" -> new ParquetDirStorage(sp, cacheRoot)))
    val mgr = session.cacheManager
    val catalog = new Catalog(builds)

    // 1. cataloged artifact: cached plan, saved + aliased
    val cachedIn = Filter(ScanParquet(s"$sfDir/region.parquet"),
      RBin(">=", RCol("r_regionkey"), RLit("0", "int")))
    val plan = Aggregate(Cache(cachedIn, "default", "snapshot"), Nil,
      Seq("n" -> RAgg("count", Nil)))
    session.execute(plan).collect()
    catalog.register("daily", Build.save(plan, builds).hash)
    val catalogedKey = RelHash.cacheHash(cachedIn)

    // 2. sidecar-live artifact: cached but NOT cataloged — its sidecar
    // still re-keys onto the directory, so it must survive
    val cachedIn2 = Filter(ScanParquet(s"$sfDir/nation.parquet"),
      RBin(">=", RCol("n_nationkey"), RLit("0", "int")))
    session.execute(Aggregate(Cache(cachedIn2, "default", "snapshot"),
      Nil, Seq("n" -> RAgg("count", Nil)))).collect()
    val sidecarKey = RelHash.cacheHash(cachedIn2)

    // 3. junk: a bare directory, no sidecar, unknown key
    Files.createDirectories(Paths.get(cacheRoot, "deadbeef0000"))

    // 4. stale: a dir whose sidecar re-keys DIFFERENTLY than its name
    // (the artifact a renamed/drifted key leaves behind)
    val staleDir = Paths.get(cacheRoot, "not_this_plans_key")
    Files.createDirectories(staleDir)
    Files.copy(Paths.get(cacheRoot, sidecarKey, "_graft_plan.json"),
      staleDir.resolve("_graft_plan.json"))

    val dry = ContentStore.sweep(sp, catalog, builds, mgr,
      Seq(cacheRoot), delete = false)
    assert(dry.kept.exists(_.endsWith(catalogedKey)))
    assert(dry.kept.exists(_.endsWith(sidecarKey)))
    assert(dry.orphans.exists(_.endsWith("deadbeef0000")))
    assert(dry.orphans.exists(_.endsWith("not_this_plans_key")))
    assert(dry.orphans.length == 2, dry.toJson)
    // dry run deleted nothing
    assert(Files.exists(Paths.get(cacheRoot, "deadbeef0000")))

    val wet = ContentStore.sweep(sp, catalog, builds, mgr,
      Seq(cacheRoot), delete = true)
    assert(wet.orphans.length == 2)
    assert(!Files.exists(Paths.get(cacheRoot, "deadbeef0000")))
    assert(!Files.exists(staleDir))
    assert(Files.exists(Paths.get(cacheRoot, catalogedKey)))
    assert(Files.exists(Paths.get(cacheRoot, sidecarKey)))
    // the kept artifact still serves: re-execute hits, not recomputes
    val hitsBefore = mgr.hits
    session.execute(plan).collect()
    assert(mgr.hits == hitsBefore + 1)
  }

  test("exchange artifacts sweep by their sidecars too") {
    val sp = spark
    val builds = tmp("graft_cs_builds2_")
    val exRoot = tmp("graft_cs_ex_")
    val session = new GraftSession(sp, exchangeRoots = Map("x" -> exRoot))
    val mgr = session.cacheManager
    session.execute(Aggregate(
      Exchange(ScanParquet(s"$sfDir/region.parquet"), "x"), Nil,
      Seq("n" -> RAgg("count", Nil)))).collect()
    Files.createDirectories(Paths.get(exRoot, "junk_key"))
    val swept = ContentStore.sweep(sp, new Catalog(builds), builds, mgr,
      Seq(exRoot), delete = true)
    assert(swept.kept.length == 1 && swept.orphans.length == 1)
    assert(!Files.exists(Paths.get(exRoot, "junk_key")))
    // the surviving artifact is the exchange barrier, sidecar intact
    // (kept paths are Hadoop URIs like file:/tmp/... — strip the scheme)
    val keptDir = new org.apache.hadoop.fs.Path(swept.kept.head)
      .toUri.getPath
    assert(Files.exists(Paths.get(keptDir, "_graft_plan.json")))
  }
}
