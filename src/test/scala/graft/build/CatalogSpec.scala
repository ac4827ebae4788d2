package graft.build

import graft.SparkSpec
import graft.rel._
import java.nio.file.Files

class CatalogSpec extends SparkSpec {

  def plan(cut: String): Rel = Aggregate(
    Filter(ScanParquet(s"$sfDir/orders.parquet"),
      RBin(">", RCol("o_totalprice"), RLit(cut, "double"))),
    Nil, Seq("n" -> RAgg("count", Nil)))

  test("alias registration, latest-wins resolution, and listing") {
    val dir = Files.createTempDirectory("graft_catalog_").toString
    val a1 = Build.save(plan("100000"), dir)
    val a2 = Build.save(plan("200000"), dir)
    val cat = new Catalog(dir)

    cat.register("prod", a1.hash)
    assert(cat.resolve("prod").contains(a1.hash))
    cat.register("prod", a2.hash) // repoint
    assert(cat.resolve("prod").contains(a2.hash))
    cat.register("prev", a1.hash)
    assert(cat.aliases == Map("prod" -> a2.hash, "prev" -> a1.hash))
    assert(cat.resolve("nope").isEmpty)
  }

  test("registering an alias for a missing build fails") {
    val dir = Files.createTempDirectory("graft_catalog_").toString
    intercept[IllegalArgumentException] {
      new Catalog(dir).register("x", "0" * 64)
    }
  }

  test("three-way merge: additions union ours-first, removals " +
    "propagate, one-sided repoints win, divergence conflicts") {
    def e(s: String*): Seq[(String, String)] =
      s.map { x => val Array(n, h) = x.split(":"); (n, h) }

    // both sides append different aliases → union, ours-first
    assert(Catalog.threeWayMerge(
      base = e("a:1"), ours = e("a:1", "b:2"), theirs = e("a:1", "c:3"))
      == e("a:1", "b:2", "c:3"))

    // a base entry dropped by one side is a removal, even though the
    // other side still lists it
    assert(Catalog.threeWayMerge(
      base = e("a:1", "old:9"), ours = e("a:1"),
      theirs = e("a:1", "old:9")) == e("a:1"))

    // only ours repointed → ours' target resolves; theirs' stale copy
    // of base doesn't fight back
    val m1 = Catalog.threeWayMerge(
      base = e("a:1"), ours = e("a:1", "a:2"), theirs = e("a:1"))
    assert(m1.filter(_._1 == "a").lastOption.contains(("a", "2")))
    // symmetric: only theirs repointed
    val m2 = Catalog.threeWayMerge(
      base = e("a:1"), ours = e("a:1"), theirs = e("a:1", "a:2"))
    assert(m2.filter(_._1 == "a").lastOption.contains(("a", "2")))

    // both repointed to the SAME target → collapses, no conflict
    assert(Catalog.threeWayMerge(
      base = e("a:1"), ours = e("a:1", "a:2"), theirs = e("a:1", "a:2"))
      .count(_ == ("a", "2")) == 1)

    // both repointed divergently → conflict naming both targets
    val c = intercept[CatalogMergeConflict] {
      Catalog.threeWayMerge(
        base = e("a:1"), ours = e("a:1", "a:2"), theirs = e("a:1", "a:3"))
    }
    assert(c.conflicts == Seq(("a", "2", "3")))
    assert(c.getMessage.contains("'a'"))

    // deletion wins over an unchanged side; modify/delete conflicts
    assert(Catalog.threeWayMerge(
      base = e("a:1", "b:2"), ours = e("b:2"), theirs = e("a:1", "b:2"))
      == e("b:2"))
    val md = intercept[CatalogMergeConflict] {
      Catalog.threeWayMerge(
        base = e("a:1"), ours = e(), theirs = e("a:1", "a:2"))
    }
    assert(md.conflicts == Seq(("a", "<deleted>", "2")))

    // instance merge writes back and the merged catalog resolves
    val dir = Files.createTempDirectory("graft_catalog_m_").toString
    val art = Build.save(plan("120000"), dir)
    val cat = new Catalog(dir)
    cat.register("prod", art.hash)
    val merged = cat.merge(
      theirs = cat.entryList :+ ("exp" -> "f" * 64),
      base = cat.entryList)
    assert(merged.contains(("exp", "f" * 64)))
    assert(cat.resolve("exp").contains("f" * 64))
    assert(cat.resolve("prod").contains(art.hash))
  }

  test("a saved plan re-executes from the artifact alone (run path)") {
    val dir = Files.createTempDirectory("graft_catalog_").toString
    val art = Build.save(plan("150000"), dir)
    // simulate `Cli run`: load by hash, lower, execute
    val rel = Build.load(dir, art.hash)
    val n = new Lower(spark).lower(rel).collect()(0).getLong(0)
    val direct = new Lower(spark).lower(plan("150000"))
      .collect()(0).getLong(0)
    assert(n == direct)
  }

  test("two stores round-trip aliases + artifacts through a bare file " +
    "remote: push/pull, repoint propagation, artifact verification") {
    val a = Files.createTempDirectory("graft_store_a_").toString
    val b = Files.createTempDirectory("graft_store_b_").toString
    val remote = Files.createTempDirectory("graft_remote_").toString +
      "/bare" // not pre-created: push must mkdir
    val p1 = Build.save(plan("100000"), a)
    new Catalog(a).register("prod", p1.hash)
    CatalogSync.push(a, remote)

    // B pulls: gets the alias AND the artifact, loadable + verified
    CatalogSync.pull(b, s"file://$remote")
    assert(new Catalog(b).resolve("prod").contains(p1.hash))
    assert(Build.load(b, p1.hash) == p1.rel)

    // B adds its own build + alias, pushes; A pulls → full round trip
    val p2 = Build.save(plan("200000"), b)
    new Catalog(b).register("staging", p2.hash)
    CatalogSync.push(b, remote)
    CatalogSync.pull(a, remote)
    assert(new Catalog(a).aliases ==
      Map("prod" -> p1.hash, "staging" -> p2.hash))
    assert(Build.load(a, p2.hash) == p2.rel)

    // A repoints prod and pushes; B pulls and sees the repoint
    val p3 = Build.save(plan("300000"), a)
    new Catalog(a).register("prod", p3.hash)
    CatalogSync.push(a, remote)
    CatalogSync.pull(b, remote)
    assert(new Catalog(b).resolve("prod").contains(p3.hash))
  }

  test("push refuses non-fast-forward; diverging repoints conflict on " +
    "pull and write nothing") {
    val a = Files.createTempDirectory("graft_store_a_").toString
    val b = Files.createTempDirectory("graft_store_b_").toString
    val remote = Files.createTempDirectory("graft_remote_").toString
    val p1 = Build.save(plan("100000"), a)
    new Catalog(a).register("prod", p1.hash)
    CatalogSync.push(a, remote)
    CatalogSync.pull(b, remote)

    // both repoint prod to DIFFERENT builds
    val pa = Build.save(plan("111111"), a)
    new Catalog(a).register("prod", pa.hash)
    CatalogSync.push(a, remote)
    val pb = Build.save(plan("222222"), b)
    new Catalog(b).register("prod", pb.hash)

    // B's push is not fast-forward (A pushed since B's last pull)
    val e = intercept[IllegalStateException] { CatalogSync.push(b, remote) }
    assert(e.getMessage.contains("pull first"))
    // and B's pull surfaces the divergence as a merge conflict,
    // leaving B's catalog untouched
    val before = new Catalog(b).entryList
    intercept[CatalogMergeConflict] { CatalogSync.pull(b, remote) }
    assert(new Catalog(b).entryList == before)
    // B resolves by withdrawing its diverging repoint (the "repoint
    // the alias on one side" instruction in the conflict message);
    // the pull then merges cleanly and fetches A's artifact
    new Catalog(b).writeEntries(
      new Catalog(b).entryList.filterNot(_ == ("prod", pb.hash)))
    val merged = CatalogSync.pull(b, remote)
    assert(merged.filter(_._1 == "prod").lastOption
      .contains(("prod", pa.hash)))
    assert(new Catalog(b).resolve("prod").contains(pa.hash))
    // and B can now push fast-forward again
    CatalogSync.push(b, remote)
  }
}
