package graft.ops

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("K4 has exactly 4 triangles, each emitted once") {
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a, b))
      .toDF("s", "d")
    val t = Triangles.enumerate(k4, "s", "d").collect()
    assert(t.length == 4)
    val sets = t.map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sets == Set(Set(1L, 2L, 3L), Set(1L, 2L, 4L),
      Set(1L, 3L, 4L), Set(2L, 3L, 4L)))
  }

  test("parallel edges, reversed edges, and self-loops do not inflate") {
    val messy = Seq((1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (2, 2))
      .toDF("s", "d")
    assert(Triangles.enumerate(messy, "s", "d").count() == 1)
  }

  test("non-integral id columns fail loudly instead of being silently " +
    "dropped by the long cast (advisor r5)") {
    val strIds = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val e = intercept[IllegalArgumentException] {
      Triangles.enumerate(strIds, "s", "d")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("a path has no triangles; per-node counts cover all members") {
    val path = Seq((1, 2), (2, 3), (3, 4)).toDF("s", "d")
    assert(Triangles.enumerate(path, "s", "d").count() == 0)

    // bowtie: triangles 1-2-3 and 3-4-5 share node 3
    val bowtie = Seq((1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3))
      .toDF("s", "d")
    val counts = Triangles.perNodeCounts(bowtie, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 1))
  }
}
