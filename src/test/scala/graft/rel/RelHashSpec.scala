package graft.rel

import org.scalatest.funsuite.AnyFunSuite

class RelHashSpec extends AnyFunSuite {

  def q1: Rel = Aggregate(
    Filter(ScanParquet("/data/li.parquet"),
      RBin("<=", RCol("l_shipdate"), RLit("1998-09-02", "timestamp"))),
    keys = Seq("rf" -> RCol("l_returnflag")),
    aggs = Seq("qty" -> RAgg("sum", Seq(RCol("l_quantity")))))

  test("hash is stable across independent constructions") {
    assert(RelHash.buildHash(q1) == RelHash.buildHash(q1))
  }

  test("golden: build hash of the canonical q1 plan") {
    // regression-pins the canonical serialization + digest; if this
    // moves, every existing cache artifact and build dir is orphaned —
    // change deliberately or never (mirrors the reference's snapshot
    // tests, ibis_yaml/tests/test_compiler.py:80-84)
    assert(RelHash.buildHash(q1) ==
      "281de0c063375009185b06d92bf0fe95c12850ebc9fb3930a221442f409af433")
  }

  test("any literal change changes the hash") {
    val q2 = Aggregate(
      Filter(ScanParquet("/data/li.parquet"),
        RBin("<=", RCol("l_shipdate"), RLit("1998-09-03", "timestamp"))),
      keys = Seq("rf" -> RCol("l_returnflag")),
      aggs = Seq("qty" -> RAgg("sum", Seq(RCol("l_quantity")))))
    assert(RelHash.buildHash(q1) != RelHash.buildHash(q2))
  }

  test("source path participates in the hash (deferred Read identity)") {
    val moved = Aggregate(
      Filter(ScanParquet("/elsewhere/li.parquet"),
        RBin("<=", RCol("l_shipdate"), RLit("1998-09-02", "timestamp"))),
      keys = Seq("rf" -> RCol("l_returnflag")),
      aggs = Seq("qty" -> RAgg("sum", Seq(RCol("l_quantity")))))
    assert(RelHash.buildHash(q1) != RelHash.buildHash(moved))
  }

  test("non-hashing Tag and Tee are stripped from the cache hash " +
    "but not the build hash (ADR-0015 two-hash split)") {
    val tagged = Tee(Tag(q1, "stage", "dev"), "/tmp/t.parquet")
    assert(RelHash.cacheHash(tagged) == RelHash.cacheHash(q1))
    assert(RelHash.buildHash(tagged) != RelHash.buildHash(q1))
  }

  test("a HashingTag participates in both hashes") {
    val ht = Tag(q1, "version", "2", hashing = true)
    assert(RelHash.cacheHash(ht) != RelHash.cacheHash(q1))
    assert(RelHash.buildHash(ht) != RelHash.buildHash(q1))
  }

  test("Cache wrappers do not affect the cache hash") {
    val c = Cache(q1, "default", "snapshot")
    assert(RelHash.cacheHash(c) == RelHash.cacheHash(q1))
  }

  test("golden: cache hash of a Cache-wrapped plan is pinned " +
    "(artifact keys must survive releases)") {
    val cached = Cache(q1, "default", "snapshot")
    assert(RelHash.cacheHash(cached) == RelHash.cacheHash(q1))
    assert(RelHash.cacheHash(q1) ==
      "281de0c063375009185b06d92bf0fe95c12850ebc9fb3930a221442f409af433")
  }

  test("param binding changes the hash the way a literal would") {
    val p = Filter(ScanParquet("/d/t.parquet"),
      RBin(">", RCol("x"), RParam("cut", "int", Some("5"))))
    val bound5 = Params.bind(p, Map("cut" -> "5"))
    val bound9 = Params.bind(p, Map("cut" -> "9"))
    val lit5 = Filter(ScanParquet("/d/t.parquet"),
      RBin(">", RCol("x"), RLit("5", "int")))
    assert(RelHash.buildHash(bound5) == RelHash.buildHash(lit5))
    assert(RelHash.buildHash(bound5) != RelHash.buildHash(bound9))
  }
}
