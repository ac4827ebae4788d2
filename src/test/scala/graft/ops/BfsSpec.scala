package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def srcDf(ids: String*) = ids.toDF("node")

  test("hop distances on a path graph are exact; unreached nodes absent") {
    // a-b-c-d-e directed both ways; source a, maxHops 3 → e unreached
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toDF("src", "dst")
    val d = Bfs.hops(edges, srcDf("a"), maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("shortest path wins over a longer alternative route") {
    // triangle a-b, b-c plus shortcut a-c: dist(c) = 1, not 2
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toDF("src", "dst")
    val d = Bfs.hops(edges, srcDf("a"), maxHops = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("a" -> 0L, "b" -> 1L, "c" -> 1L))
  }

  test("multi-source BFS settles each node at the nearest source") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toDF("src", "dst")
    val d = Bfs.hops(edges, srcDf("a", "e"), maxHops = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("a" -> 0L, "e" -> 0L, "b" -> 1L, "d" -> 1L, "c" -> 2L))
  }

  test("early exhaustion stops expanding without error") {
    val edges = Seq(("a", "b")).flatMap { case (s, d) =>
      Seq((s, d), (d, s)) }.toDF("src", "dst")
    val d = Bfs.hops(edges, srcDf("a"), maxHops = 10)
    assert(d.count() == 2)
  }

  test("hopsFrom keeps per-root distances independent") {
    // path a-b-c-d-e; roots a and e see mirrored distance profiles
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toDF("src", "dst")
    val roots = Seq("a", "e").toDF("root")
    val got = Bfs.hopsFrom(edges, roots, maxHops = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "a")) == 0L && got(("a", "e")) == 4L)
    assert(got(("e", "e")) == 0L && got(("e", "a")) == 4L)
    assert(got(("a", "c")) == 2L && got(("e", "c")) == 2L)
    assert(got.size == 10) // 2 roots x 5 nodes, nothing cross-labeled
  }

  test("hopsFrom bounds each root at maxHops; unreached pairs absent") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toDF("src", "dst")
    val got = Bfs.hopsFrom(edges, Seq("a").toDF("root"), maxHops = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L)) // d beyond 2 hops
  }
}
