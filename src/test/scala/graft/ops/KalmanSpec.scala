package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KalmanSpec extends SparkSpec {

  test("scalar Kalman matches the hand-evaluated recurrence and " +
    "handles single-observation series") {
    val sp = spark
    import sp.implicits._
    // series 1: y = 10, 12, 11 (q=0.25, r=1.0, init x=10, p=1)
    // step2: pp=1.25, k=1.25/2.25, x=10+k*2, p=(1-k)*1.25
    // step3: pp=p+0.25, k=pp/(pp+1), x+=k*(11-x), p=(1-k)*pp
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 12.0), (1L, 3L, 11.0),
      (2L, 1L, 5.0)).toDF("k", "seq", "y")
    val out = Kalman.scalar(df, "k", Seq(col("seq")), col("y"),
      q = 0.25, r = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // replicate in plain scala (the same op order)
    var x = 10.0; var p = 1.0; var k = 0.0
    for (y <- Seq(12.0, 11.0)) {
      val pp = p + 0.25
      k = pp / (pp + 1.0)
      x = x + k * (y - x)
      p = (1.0 - k) * pp
    }
    val (n1, x1, p1, k1) = out(1L)
    assert(n1 == 3L)
    assert(x1 == x && p1 == p && k1 == k,
      s"got ($x1,$p1,$k1) want ($x,$p,$k)")
    // single observation: state = y, variance = r, gain 0
    assert(out(2L) == ((1L, 5.0, 1.0, 0.0)))
  }

  test("gain converges toward the steady-state value on a long series") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 200).map(i => (1L, i.toLong, 7.0)).toDF("k", "seq", "y")
    val r = Kalman.scalar(df, "k", Seq(col("seq")), col("y"),
      q = 0.25, r = 1.0).collect()(0)
    // steady state: p* solves p = (1-k)(p+q), k = (p+q)/(p+q+r)
    // → p* = (−q + sqrt(q² + 4qr))/2, k* = (p*+q)/(p*+q+r)
    val pStar = (-0.25 + math.sqrt(0.25 * 0.25 + 4 * 0.25 * 1.0)) / 2
    val kStar = (pStar + 0.25) / (pStar + 0.25 + 1.0)
    assert(math.abs(r.getDouble(4) - kStar) < 1e-9,
      s"gain ${r.getDouble(4)} vs steady $kStar")
    assert(math.abs(r.getDouble(2) - 7.0) < 1e-9) // constant series
  }
}
