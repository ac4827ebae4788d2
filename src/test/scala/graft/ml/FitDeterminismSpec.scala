package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cross-engine-oracle story for the iterative fits rests on one
  * claim: every model parameter is a deterministic function of exact
  * integer aggregates, never of an order-dependent double reduction.
  * This suite tests the claim directly — the SAME data under different
  * physical partitionings must produce BIT-IDENTICAL models. */
class FitDeterminismSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def data = (for { i <- 0 until 400 } yield
    ((i % 23).toDouble, (i % 7).toDouble,
      (i * 31 % 97).toLong, if (i * 13 % 5 < 2) 1 else 0))
    .toDF("fx", "fz", "yc", "yb")

  test("Gbrt fits the identical model under any partitioning") {
    val a = Gbrt.fitTwo(data.repartition(1), Seq("fx", "fz"), col("yc"))
    val b = Gbrt.fitTwo(data.repartition(7), Seq("fx", "fz"), col("yc"))
    assert(a == b)
  }

  test("Boost fits the identical model under any partitioning") {
    val a = Boost.fitTwo(data.repartition(1), Seq("fx", "fz"), col("yb"))
    val b = Boost.fitTwo(data.repartition(5), Seq("fx", "fz"), col("yb"))
    assert(a == b)
  }

  test("Stump split is identical under any partitioning") {
    val a = Stump.fit(data.repartition(1), Seq("fx", "fz"), col("yb"))
    val b = Stump.fit(data.repartition(8), Seq("fx", "fz"), col("yb"))
    assert(a == b)
  }
}
