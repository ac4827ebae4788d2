package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val intervals = Seq(
    (10L, 0L, 10L),    // id, start, end
    (20L, 5L, 6L),
    (30L, 100L, 130L), // spans several width-8 buckets
    (40L, 7L, 7L)      // degenerate single-point interval
  ).toDF("iid", "s", "e")

  private val points = Seq(
    (1L, 0L), (2L, 5L), (3L, 7L), (4L, 10L), (5L, 11L),
    (6L, 128L), (7L, 131L)
  ).toDF("pid", "p")

  private def run(width: Long): Set[(Long, Long)] =
    IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", width)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 40L), (4L, 10L),
    (6L, 30L))

  test("matches the naive inequality join, ends inclusive") {
    assert(run(8) == expected)
  }

  test("result is width-invariant and duplicate-free") {
    for (w <- Seq(1L, 3L, 16L, 1000L)) {
      val out = IntervalJoin.pointInInterval(
        points, "p", intervals, "s", "e", w).select("pid", "iid").collect()
      assert(out.length == expected.size, s"width $w")
      assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    }
  }

  test("negative-domain points bucket correctly (floor, not truncate)") {
    val iv = Seq((1L, -10L, -2L)).toDF("iid", "s", "e")
    val ps = Seq((1L, -5L), (2L, -1L), (3L, -10L)).toDF("pid", "p")
    val got = IntervalJoin.pointInInterval(ps, "p", iv, "s", "e", 4)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("plans as an equi-join on the bucket, never a nested-loop join") {
    val plan = IntervalJoin.pointInInterval(
      points, "p", intervals, "s", "e", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("rejects non-positive bucket width loudly") {
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", 0)
    }
  }
}
