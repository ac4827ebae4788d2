package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StumpSpec extends SparkSpec {

  test("finds the exact best split on a constructed dataset") {
    val s = spark
    import s.implicits._
    // y = 1 iff x1 >= 5 (perfect split at x1 <= 4); x2 is noise
    val df = (0 until 100).map { i =>
      (i % 10, i % 3, if (i % 10 >= 5) 1 else 0)
    }.toDF("x1", "x2", "y")
    val m = Stump.fit(df, Seq("x1", "x2"), col("y"))
    assert(m.feature === "x1")
    assert(m.threshold === 4.0)
    assert(m.nLeft === 50 && m.posLeft === 0)
    assert(m.nRight === 50 && m.posRight === 50)
    assert(m.predLeft === 0 && m.predRight === 1)
  }

  test("transform is a pure projection matching the fitted split") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map { i =>
      (i % 10, if (i % 10 >= 5) 1 else 0)
    }.toDF("x1", "y")
    val m = Stump.fit(df, Seq("x1"), col("y"))
    val scored = Stump.transform(df, m)
    val acc = scored.filter(col("prediction") === col("y")).count()
    assert(acc === 100L)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "predict must not shuffle")
  }

  test("result independent of partitioning") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map { i =>
      (i % 20, (i * 7) % 5, if ((i % 20) * 2 + (i * 7) % 5 > 20) 1 else 0)
    }.toDF("a", "b", "y")
    val m1 = Stump.fit(df.repartition(2), Seq("a", "b"), col("y"))
    val m2 = Stump.fit(df.repartition(13), Seq("a", "b"), col("y"))
    assert(m1 === m2)
  }

  test("over-cardinality feature fails loudly") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => (i.toDouble / 7, i % 2))
      .toDF("cont", "y")
    val e = intercept[Exception] {
      Stump.fit(df, Seq("cont"), col("y"), maxBins = 64)
    }
    assert(e.getMessage.contains("distinct values") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("distinct values"))
  }
}
