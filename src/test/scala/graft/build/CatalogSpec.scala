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
}
