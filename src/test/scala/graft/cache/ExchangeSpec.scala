package graft.cache

import graft.SparkSpec
import graft.api.GraftSession
import graft.rel._
import java.nio.file.Files

/** The durable Exchange barrier (RemoteTable/into_backend analogue):
  * a named target materializes its subtree under the target's exchange
  * root, keyed by content hash, and downstream re-reads the artifact —
  * so the barrier survives session loss and is shared across sessions
  * (unlike the `session` target's localCheckpoint). */
class ExchangeSpec extends SparkSpec {

  private def plan(dir: String): Rel =
    Aggregate(
      Exchange(
        Filter(ScanParquet(s"$dir/orders.parquet"),
          RBin(">", RCol("o_totalprice"), RLit("100000", "double"))),
        "warehouse"),
      keys = Nil,
      aggs = Seq("n" -> RAgg("count", Nil)))

  test("a named target writes once under its root and re-reads; a " +
    "second session over the same root reuses the artifact") {
    val root = Files.createTempDirectory("graft_exch_").toString
    val a = new GraftSession(spark,
      exchangeRoots = Map("warehouse" -> root))
    val n1 = a.execute(plan(sfDir)).collect()(0).getLong(0)

    val arts = new java.io.File(root).listFiles()
    assert(arts != null && arts.length == 1,
      "exactly one content-hash-keyed artifact under the target root")
    val mtime = arts(0).lastModified()

    // a DIFFERENT session (fresh manager) over the same root must hit
    // the artifact, not recompute: execute, then check mtime unchanged
    val b = new GraftSession(spark,
      exchangeRoots = Map("warehouse" -> root))
    val n2 = b.execute(plan(sfDir)).collect()(0).getLong(0)
    assert(n1 == n2)
    assert(arts(0).lastModified() == mtime,
      "second session must read the exchanged artifact, not rewrite it")
  }

  test("downstream of the barrier is a fresh scan of the artifact") {
    val root = Files.createTempDirectory("graft_exch_scan_").toString
    val g = new GraftSession(spark,
      exchangeRoots = Map("warehouse" -> root))
    val resolved = g.cacheManager.resolve(plan(sfDir))
    val scans = {
      val b = Seq.newBuilder[String]
      def walk(r: Rel): Unit = { r match {
        case ScanParquet(p) => b += p; case _ => }
        r.children.foreach(walk) }
      walk(resolved); b.result()
    }
    assert(scans.exists(_.startsWith(root)),
      "the resolved plan must scan the exchange artifact")
    // and the physical plan reads the artifact file, not the source
    val df = new Lower(spark).lower(resolved)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("graft_exch_scan_"))
    assert(!physical.contains("orders.parquet"))
  }

  test("target=session remains an in-session localCheckpoint barrier") {
    val g = new GraftSession(spark)
    val p = Aggregate(
      Exchange(ScanParquet(s"$sfDir/region.parquet"), "session"),
      Nil, Seq("n" -> RAgg("count", Nil)))
    assert(g.execute(p).collect()(0).getLong(0) == 5)
  }

  test("unlisted targets derive a per-target default root") {
    val g = new GraftSession(spark)
    val p = Aggregate(
      Exchange(ScanParquet(s"$sfDir/region.parquet"), "adhoc_t"),
      Nil, Seq("n" -> RAgg("count", Nil)))
    assert(g.execute(p).collect()(0).getLong(0) == 5)
    val d = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_exchange/adhoc_t")
    assert(d.exists, "default root must be per-target")
  }
}
