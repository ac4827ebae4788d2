package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components: validated against a local union-find oracle
  * on randomized graphs, plus the shapes that break naive approaches
  * (long chains → O(diameter) label propagation; high-degree stars →
  * skew; singletons and self-loops). */
class ComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    ids.map(i => i -> find(i)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs match a union-find oracle (components = min id)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 60 + trial * 30
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val got = run(edges)
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("a 200-node chain converges in logarithmic star rounds, not " +
    "O(diameter)") {
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("high-degree star, parallel/self edges, and singleton pairs") {
    val star = (1L to 100L).map(i => (50L, i)).filter(e => e._1 != e._2)
    val withNoise = star ++ star.map(_.swap) ++ Seq((200L, 200L), (300L, 301L))
    val got = run(withNoise)
    assert((1L to 100L).forall(got(_) == 1L) && got(50L) == 1L)
    assert(got(300L) == 300L && got(301L) == 300L)
    assert(!got.contains(200L), "pure self-loop nodes carry no edge")
  }

  test("non-integral id columns fail loud instead of dropping edges") {
    val sp = spark
    import sp.implicits._
    val strEdges = Seq(("doc-1", "doc-2"), ("3", "4")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(strEdges, "a", "b")
    }
    assert(e.getMessage.contains("integral"))
    assert(e.getMessage.contains("xxhash64"))
    // the suggested mapping works
    val mapped = Components.connectedComponents(
      strEdges.select(xxhash64(col("a")).as("a"), xxhash64(col("b")).as("b")),
      "a", "b")
    assert(mapped.count() == 4)
  }

  test("empty edge set yields an empty labeling") {
    val sp = spark
    import sp.implicits._
    val out = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(out.count() == 0)
  }
}
