package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GbrtSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def sse(df: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.Column): Double =
    df.agg(sum(pow(col("y") - p, 2))).head.getDouble(0)

  test("round 2 corrects what round 1 cannot express (additive signal)") {
    // y = 100·[fx ≥ 5] + 10·[fz ≥ 5]: one stump captures the big step,
    // the residual stump must find the small one on the OTHER feature
    val rows = for { x <- 0 to 9; z <- 0 to 9 }
      yield (x.toDouble, z.toDouble,
        (if (x >= 5) 100L else 0L) + (if (z >= 5) 10L else 0L))
    val df = rows.toDF("fx", "fz", "y")
    val m = Gbrt.fitTwo(df, Seq("fx", "fz"), col("y"))
    assert(m.r1.feature == "fx" && m.r2.feature == "fz",
      s"expected fx then fz, got ${m.r1.feature} then ${m.r2.feature}")
    val e = sse(df, m.prediction)
    assert(e < 1e-12, s"additive two-stump signal should fit exactly: $e")
  }

  test("boosting never increases training SSE") {
    val rows = for { x <- 0L until 60L }
      yield (x.toDouble, (x % 7).toDouble, (x * 13 % 101))
    val df = rows.toDF("fx", "fz", "y")
    val m = Gbrt.fitTwo(df, Seq("fx", "fz"), col("y"))
    val e1 = sse(df, when(col(m.r1.feature) <= m.r1.threshold,
      m.r1.leftValue).otherwise(m.r1.rightValue))
    val e2 = sse(df, m.prediction)
    assert(e2 <= e1 + 1e-6, s"round 2 SSE $e2 > round 1 SSE $e1")
  }

  test("leaf values are the exact conditional means") {
    val df = Seq((1.0, 10L), (2.0, 20L), (3.0, 100L), (4.0, 110L))
      .toDF("fx", "y")
    val m = Gbrt.fitTwo(df, Seq("fx"), col("y"))
    assert(m.r1.threshold == 2.0)
    assert(m.r1.leftValue == 15.0 && m.r1.rightValue == 105.0)
  }
}
