package graft.build

import graft.SparkSpec
import graft.rel._
import java.nio.file.Files

class BuildSpec extends SparkSpec {

  def plan: Rel = Sort(
    Aggregate(
      Filter(ScanParquet(s"$sfDir/lineitem.parquet"),
        RBin(">", RCol("l_quantity"), RLit("40", "int"))),
      keys = Seq("rf" -> RCol("l_returnflag")),
      aggs = Seq("n" -> RAgg("count", Nil))),
    Seq(SortKey(RCol("rf"), true, true)))

  test("save → load → re-execute produces the original result") {
    val dir = Files.createTempDirectory("graft_builds_").toString
    val art = Build.save(plan, dir)
    assert(art.hash == RelHash.buildHash(plan))

    val reloaded = Build.load(dir, art.hash)
    assert(reloaded == plan)

    val direct = new Lower(spark).lower(plan).collect()
    val viaBuild = new Lower(spark).lower(reloaded).collect()
    assert(direct.toSeq == viaBuild.toSeq)
  }

  test("save is idempotent; list sees the build") {
    val dir = Files.createTempDirectory("graft_builds_").toString
    val a1 = Build.save(plan, dir)
    val a2 = Build.save(plan, dir)
    assert(a1.hash == a2.hash)
    assert(Build.list(dir) == Seq(a1.hash))
  }

  test("a tampered plan fails hash verification on load") {
    val dir = Files.createTempDirectory("graft_builds_").toString
    val art = Build.save(plan, dir)
    val planFile = java.nio.file.Paths.get(art.path, "plan.json")
    val tampered = Files.readString(planFile)
      .replace("\"40\"", "\"41\"")
    Files.writeString(planFile, tampered)
    val err = intercept[IllegalArgumentException] {
      Build.load(dir, art.hash)
    }
    assert(err.getMessage.contains("fails verification"))
  }

  test("ReadCsv round-trips through a build (deferred Read node " +
    "participates in the artifact)") {
    val dir = Files.createTempDirectory("graft_builds_").toString
    val p = Aggregate(ReadCsv("/data/in.csv", header = true,
      inferSchema = false, delimiter = ";"),
      Nil, Seq("n" -> RAgg("count", Nil)))
    val art = Build.save(p, dir)
    assert(Build.load(dir, art.hash) == p)
    // options are part of the identity
    val p2 = Aggregate(ReadCsv("/data/in.csv", header = true,
      inferSchema = false, delimiter = ","),
      Nil, Seq("n" -> RAgg("count", Nil)))
    assert(RelHash.buildHash(p2) != art.hash)
  }
}
