package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Int, Int, Any)], cols: (String, String, String)) = {
    val sp = spark
    import sp.implicits._
    rows.map { case (k, t, v) => (k, t, Option(v).map(_.toString.toDouble)) }
      .toDF(cols._1, cols._2, cols._3)
  }

  test("payload and matched_time come from the SAME matched row even " +
    "when the matched row's payload is NULL (r1 ADVICE regression)") {
    // right side: user 1 has (t=10, v=5.0) then (t=20, v=NULL);
    // a left row at t=25 must match t=20 and carry NULL payload —
    // NOT fall back to t=10's 5.0
    val left = df(Seq((1, 25, 1.0)), ("user_id", "t", "x"))
    val right = df(Seq((1, 10, 5.0), (1, 20, null)), ("user_id", "t", "v"))
    val out = AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
      Seq("v" -> "matched_v")).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Any]("matched_v") == null,
      "payload must be the matched row's NULL, not an older row's value")
    assert(r.getAs[Int]("matched_time") == 20)
  }

  test("NULL timestamps never match: null-time right rows are ignored, " +
    "null-time left rows come out unmatched") {
    val sp = spark
    import sp.implicits._
    // right has a null-time row with a juicy payload; nulls-first
    // ordering used to park it at the head of every frame where
    // last(ignoreNulls) picked it up as a spurious match
    val left = Seq((1, Option(5), 1.0), (1, None: Option[Int], 2.0))
      .toDF("user_id", "t", "x")
    val right = Seq((1, None: Option[Int], 99.0), (1, Option(50), 7.0))
      .toDF("user_id", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
      Seq("v" -> "mv")).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Any]("mv") == null &&
        r.getAs[Any]("matched_time") == null,
        s"no legitimate match exists for $r (t=5 precedes t=50; " +
          "null-time rows must never pair)")
    }
  }

  test("out-of-tolerance rows are fully unmatched: matched_time is " +
    "nulled too (r1 ADVICE regression)") {
    val left = df(Seq((1, 100, 1.0)), ("user_id", "t", "x"))
    val right = df(Seq((1, 10, 5.0)), ("user_id", "t", "v"))
    val out = AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
      Seq("v" -> "matched_v"), tolerance = Some(lit(30))).collect()(0)
    assert(out.getAs[Any]("matched_v") == null)
    assert(out.getAs[Any]("matched_time") == null)
  }

  test("in-tolerance rows keep both payload and matched_time") {
    val left = df(Seq((1, 30, 1.0)), ("user_id", "t", "x"))
    val right = df(Seq((1, 10, 5.0)), ("user_id", "t", "v"))
    val out = AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
      Seq("v" -> "matched_v"), tolerance = Some(lit(30))).collect()(0)
    assert(out.getAs[Double]("matched_v") == 5.0)
    assert(out.getAs[Int]("matched_time") == 10)
  }

  test("ties among right rows at equal (key, time) resolve " +
    "deterministically to the greatest payload") {
    val left = df(Seq((1, 20, 1.0)), ("user_id", "t", "x"))
    val right = df(Seq((1, 10, 3.0), (1, 10, 7.0)), ("user_id", "t", "v"))
    val runs = (1 to 3).map { _ =>
      AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
        Seq("v" -> "matched_v")).collect()(0).getAs[Double]("matched_v")
    }
    assert(runs.toSet == Set(7.0))
  }

  test("left rows with no earlier right row are unmatched") {
    val left = df(Seq((1, 5, 1.0)), ("user_id", "t", "x"))
    val right = df(Seq((1, 10, 5.0)), ("user_id", "t", "v"))
    val out = AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
      Seq("v" -> "matched_v")).collect()(0)
    assert(out.getAs[Any]("matched_v") == null)
    assert(out.getAs[Any]("matched_time") == null)
  }

  test("match at equal timestamps is inclusive (ts >= right ts)") {
    val left = df(Seq((1, 10, 1.0)), ("user_id", "t", "x"))
    val right = df(Seq((1, 10, 5.0)), ("user_id", "t", "v"))
    val out = AsofJoin.backward(left, right, Seq("user_id"), "t", "t",
      Seq("v" -> "matched_v")).collect()(0)
    assert(out.getAs[Double]("matched_v") == 5.0)
  }
}
