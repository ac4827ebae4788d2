package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HoltSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def reference(ys: Seq[Double], a: Double, b: Double)
      : (Long, Double, Double) = {
    var l = ys.head; var t = 0.0
    ys.tail.foreach { y =>
      val ln = a * y + (1 - a) * (l + t)
      t = b * (ln - l) + (1 - b) * t
      l = ln
    }
    (ys.length.toLong, l, t)
  }

  test("matches the sequential recurrence exactly per key") {
    val rows = Seq(
      (1L, 1, 10.0), (1L, 2, 12.0), (1L, 3, 15.0), (1L, 4, 13.0),
      (2L, 1, 5.0), (2L, 2, 5.0),
      (3L, 1, 7.5))
    val df = rows.toDF("k", "t", "y")
    val got = Holt.linear(df, "k", Seq(col("t")), col("y"), 0.5, 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val series = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    series.foreach { case (k, ys) =>
      assert(got(k) == reference(ys, 0.5, 0.25), s"key $k")
    }
  }

  test("order columns drive the scan, not input order") {
    val shuffled = Seq((1L, 3, 3.0), (1L, 1, 1.0), (1L, 2, 2.0))
      .toDF("k", "t", "y")
    val got = Holt.linear(shuffled, "k", Seq(col("t")), col("y"), 0.5, 0.25)
      .collect().head
    assert((got.getLong(1), got.getDouble(2), got.getDouble(3)) ==
      reference(Seq(1.0, 2.0, 3.0), 0.5, 0.25))
  }

  test("single-point series: level = y, trend = 0") {
    val df = Seq((9L, 1, 42.0)).toDF("k", "t", "y")
    val r = Holt.linear(df, "k", Seq(col("t")), col("y"), 0.5, 0.25)
      .collect().head
    assert(r.getLong(1) == 1L && r.getDouble(2) == 42.0 &&
      r.getDouble(3) == 0.0)
  }

  test("many keys across few partitions stay contiguous and exact") {
    val rows = for { k <- 0L until 40L; t <- 1 to 5 }
      yield (k, t, (k * 31 + t * 7 % 13).toDouble)
    val df = rows.toDF("k", "t", "y").repartition(3)
    val got = Holt.linear(df, "k", Seq(col("t")), col("y"), 0.5, 0.25)
    assert(got.count() == 40)
    val one = got.filter(col("k") === 17L).collect().head
    val ys = rows.filter(_._1 == 17L).sortBy(_._2).map(_._3)
    assert((one.getLong(1), one.getDouble(2), one.getDouble(3)) ==
      reference(ys, 0.5, 0.25))
  }

  test("parameter guards") {
    val df = Seq((1L, 1, 1.0)).toDF("k", "t", "y")
    intercept[IllegalArgumentException] {
      Holt.linear(df, "k", Seq(col("t")), col("y"), 0.0, 0.25)
    }
    intercept[IllegalArgumentException] {
      Holt.linear(df, "k", Seq(col("t")), col("y"), 0.5, 1.5)
    }
  }

  private def macdRef(ys: Seq[Double], aF: Double, aS: Double,
      aG: Double): (Long, Double, Double, Double) = {
    var ef = ys.head; var es = ys.head; var sg = 0.0
    ys.tail.foreach { y =>
      ef = aF * y + (1 - aF) * ef
      es = aS * y + (1 - aS) * es
      sg = aG * (ef - es) + (1 - aG) * sg
    }
    (ys.length.toLong, ef, es, sg)
  }

  test("macd matches the sequential triple-EMA recurrence exactly") {
    val rows = Seq(
      (1L, 1, 10.0), (1L, 2, 14.0), (1L, 3, 9.0), (1L, 4, 17.0),
      (1L, 5, 11.0),
      (2L, 1, 3.0), (2L, 2, 4.0),
      (3L, 1, 6.25))
    val df = rows.toDF("k", "t", "y")
    val got = Holt.macd(df, "k", Seq(col("t")), col("y"),
        aFast = 0.25, aSlow = 0.125, aSig = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      val (n, ef, es, sg) = macdRef(ys, 0.25, 0.125, 0.5)
      val (gn, gef, ges, gmacd, gsig) = got(k)
      assert(gn == n && gef == ef && ges == es) // bit-exact, no epsilon
      assert(gmacd == ef - es && gsig == sg)
    }
  }

  test("macd single-observation series: macd 0, signal 0") {
    val df = Seq((9L, 1, 42.0)).toDF("k", "t", "y")
    val r = Holt.macd(df, "k", Seq(col("t")), col("y"), 0.5, 0.25, 0.5)
      .collect().head
    assert(r.getLong(1) == 1L && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0)
  }

  test("macd guards: fast must smooth less than slow") {
    val df = Seq((1L, 1, 1.0)).toDF("k", "t", "y")
    intercept[IllegalArgumentException] {
      Holt.macd(df, "k", Seq(col("t")), col("y"), 0.125, 0.25, 0.5)
    }
  }

  test("sesGrid picks the replayed argmin SSE; ties to smaller alpha") {
    val rows = Seq(
      (1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 5.0), (1L, 4, 30.0),
      (2L, 1, 7.0), (2L, 2, 7.0), (2L, 3, 7.0), // constant: all SSE 0
      (3L, 1, 4.0))                              // single obs: SSE 0
    val df = rows.toDF("k", "t", "y")
    val grid = Seq(0.25, 0.5, 0.75)
    val got = Holt.sesGrid(df, "k", Seq(col("t")), col("y"), grid)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def ref(ys: Seq[Double]): (Double, Double) = {
      val scored = grid.map { a =>
        var l = ys.head; var s = 0.0
        ys.tail.foreach { y =>
          val e = y - l; s += e * e; l = a * y + (1 - a) * l
        }
        (a, s)
      }
      scored.minBy(_._2) // stable minBy keeps the first (smaller a)
    }
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val (a, s) = ref(rs.sortBy(_._2).map(_._3))
      val (n, ga, gs) = got(k)
      assert(n == rs.size && ga == a && gs == s, s"key $k")
    }
    assert(got(2L)._2 == 0.25 && got(2L)._3 == 0.0) // tie → smallest α
  }

  test("damped matches the sequential phi-recurrence exactly") {
    val rows = Seq((1L, 1, 10.0), (1L, 2, 16.0), (1L, 3, 7.0),
      (1L, 4, 21.0), (2L, 1, 5.0))
    val df = rows.toDF("k", "t", "y")
    val (a, b, phi) = (0.5, 0.25, 0.5)
    val got = Holt.damped(df, "k", Seq(col("t")), col("y"), a, b, phi)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      var l = ys.head; var tr = 0.0
      ys.tail.foreach { y =>
        val ln = a * y + (1 - a) * (l + phi * tr)
        tr = b * (ln - l) + (1 - b) * (phi * tr)
        l = ln
      }
      assert(got(k) == ((ys.size.toLong, l, tr, l + phi * tr)), s"k=$k")
    }
  }

  test("sesGrid guards: sorted distinct grid in (0,1]") {
    val df = Seq((1L, 1, 1.0)).toDF("k", "t", "y")
    intercept[IllegalArgumentException] {
      Holt.sesGrid(df, "k", Seq(col("t")), col("y"), Seq(0.5, 0.25))
    }
    intercept[IllegalArgumentException] {
      Holt.sesGrid(df, "k", Seq(col("t")), col("y"), Seq(0.25, 1.5))
    }
  }
}
