package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)), 2),
      StructType(Seq(StructField("s", LongType), StructField("d", LongType))))
  }

  /** brute-force peel on the driver for the oracle */
  private def bruteCore(pairs: Seq[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var e = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).toSet
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val weak = deg.filter(_._2 < k).keySet
      val next = e.filter(p => !weak(p._1) && !weak(p._2))
      changed = next != e
      e = next
    }
    e
  }

  test("core matches brute-force peel on a mixed graph") {
    // a K4 clique (3-core), a triangle (2-core), and a pendant chain
    val pairs = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // K4
      (10, 11), (11, 12), (10, 12),                   // triangle
      (4, 20), (20, 21), (21, 22))                    // chain off K4
    for (k <- 2 to 3) {
      val got = KCore.core(edgesDf(pairs), "s", "d", k)
        .collect().map(r => (r.getLong(r.fieldIndex("u")),
          r.getLong(r.fieldIndex("v")))).toSet
      assert(got === bruteCore(pairs, k), s"k=$k")
    }
  }

  test("3-core of K4 + chain is exactly the K4; 4-core is empty") {
    val pairs = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (5, 6))
    val c3 = KCore.coreDegrees(edgesDf(pairs), "s", "d", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c3 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(KCore.core(edgesDf(pairs), "s", "d", 4).count() === 0L)
  }

  test("self-loops and duplicate/reversed edges are canonicalized away") {
    val pairs = Seq[(Long, Long)](
      (1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (1, 3))
    val got = KCore.core(edgesDf(pairs), "s", "d", 2)
      .collect().map(r => (r.getLong(r.fieldIndex("u")),
        r.getLong(r.fieldIndex("v")))).toSet
    assert(got === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("hitting maxRounds without convergence is loud, never partial") {
    // a 12-node path with k=2 peels 2 end-nodes per round (6 rounds to
    // empty); maxRounds=2 must throw rather than return the half-peeled
    // middle as if it were the 2-core
    val path = (1L to 11L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      KCore.core(edgesDf(path), "s", "d", 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("pinned rounds equal convergence once stable") {
    val pairs = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), (3, 4), (4, 5))
    val conv = KCore.core(edgesDf(pairs), "s", "d", 2)
      .collect().map(r => (r.getLong(r.fieldIndex("u")),
        r.getLong(r.fieldIndex("v")))).toSet
    val pinned = KCore.peelRounds(edgesDf(pairs), "s", "d", 2, 4)
      .collect().map(r => (r.getLong(r.fieldIndex("u")),
        r.getLong(r.fieldIndex("v")))).toSet
    assert(pinned === conv)
  }
}
