package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val rows = Seq(
    (1L, Seq("a", "b", "c", "d")),
    (2L, Seq("a", "b", "c", "e")),      // J(1,2) = 3/5 = 0.6
    (3L, Seq("x", "y", "z")),           // J with 1,2 = 0
    (4L, Seq("a", "b", "c", "d")),      // J(1,4) = 1.0
    (5L, Seq("b", "c", "d", "e", "f"))  // J(1,5)=3/6=0.5, J(2,5)=3/6=0.5
  ).toDF("id", "st")

  private def bruteForce(tau: Double): Set[(Long, Long)] = {
    val sets = rows.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size
      u = (sets(a) | sets(b)).size
      if i.toDouble / u >= tau
    } yield (a, b)).toSet
  }

  test("finds exactly the brute-force pairs at tau=0.5 (recall 1.0)") {
    val got = SetSimJoin.jaccardSelfJoin(rows, "id", "st", 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == bruteForce(0.5))
    assert(got == Set((1L, 2L), (1L, 4L), (1L, 5L), (2L, 5L),
      (2L, 4L), (4L, 5L)))
  }

  test("inter/union/jac arithmetic is exact") {
    val r = SetSimJoin.jaccardSelfJoin(rows, "id", "st", 0.55)
      .orderBy("a", "b").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val j12 = r(0)
    assert(j12.getLong(2) == 3 && j12.getLong(3) == 5 &&
      j12.getDouble(4) == 0.6)
  }

  test("tau=1.0 degenerates to exact-duplicate pairs (prefix length 1)") {
    val got = SetSimJoin.jaccardSelfJoin(rows, "id", "st", 1.0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 4L)))
  }

  test("input multisets are de-duplicated before comparison") {
    val dupes = Seq((1L, Seq("a", "a", "b")), (2L, Seq("a", "b", "b")))
      .toDF("id", "st")
    val r = SetSimJoin.jaccardSelfJoin(dupes, "id", "st", 0.9).collect()
    assert(r.length == 1 && r(0).getDouble(4) == 1.0)
  }
}
