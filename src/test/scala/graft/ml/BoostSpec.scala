package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoostSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  // XOR-ish corner data: no single axis-aligned stump separates it,
  // but two boosted stumps reduce the error
  private def corners = {
    val rows = for {
      x <- 0 to 9; z <- 0 to 9
      // label 1 iff x high OR z high, with noise-free structure the
      // first stump gets partially right and the second corrects
      y = if (x >= 7 || z >= 7) 1 else 0
    } yield (x.toDouble, z.toDouble, y)
    rows.toDF("fx", "fz", "y")
  }

  test("two boosted rounds fit and the ensemble beats round 1 alone") {
    val df = corners
    val m = Boost.fitTwo(df, Seq("fx", "fz"), col("y"))
    assert(m.r1.alpha > 0 && m.r2.alpha > 0)
    // the two rounds pick complementary splits on this data
    assert(m.r1.feature != m.r2.feature ||
      m.r1.threshold != m.r2.threshold)
    val stumpAcc = df.agg(avg((m.h(m.r1) === col("y")).cast("double")))
      .head.getDouble(0)
    val boostAcc = df.agg(avg((m.prediction === col("y")).cast("double")))
      .head.getDouble(0)
    assert(boostAcc >= stumpAcc,
      s"ensemble $boostAcc should not lose to stump $stumpAcc")
  }

  test("degenerate round-1 error fails loudly") {
    // perfectly separable: stump error 0 → boosting undefined
    val sep = (0 to 9).map(i => (i.toDouble, if (i >= 5) 1 else 0))
      .toDF("fx", "y")
    val e = intercept[IllegalArgumentException] {
      Boost.fitTwo(sep, Seq("fx"), col("y"))
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("weighted round re-weights: round-1 mistakes dominate round 2") {
    val df = corners
    val m = Boost.fitTwo(df, Seq("fx", "fz"), col("y"))
    // rows misclassified by stump 1 must be classified BETTER by
    // stump 2 than by stump 1 (that is what the upweighting buys)
    val mis1 = df.filter(m.h(m.r1) =!= col("y"))
    val fixed = mis1.agg(avg((m.h(m.r2) === col("y")).cast("double")))
      .head.getDouble(0)
    assert(fixed > 0.5, s"stump 2 fixes only $fixed of round-1 misses")
  }
}
