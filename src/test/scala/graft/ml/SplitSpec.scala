package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitSpec extends SparkSpec {

  lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("splits are disjoint and exhaustive") {
    val splits = Splits.trainTestSplits(orders, Seq("o_orderkey"),
      Seq(0.7, 0.2, 0.1))
    val counts = splits.map(_.count())
    assert(counts.sum == orders.count())
    // disjoint: same key never lands in two splits
    val k01 = splits(0).select("o_orderkey")
      .intersect(splits(1).select("o_orderkey")).count()
    val k02 = splits(0).select("o_orderkey")
      .intersect(splits(2).select("o_orderkey")).count()
    assert(k01 == 0 && k02 == 0)
  }

  test("split proportions are approximately the requested fractions") {
    val splits = Splits.trainTestSplits(orders, Seq("o_orderkey"),
      Seq(0.7, 0.2, 0.1))
    val n = orders.count().toDouble
    val fracs = splits.map(_.count() / n)
    assert(math.abs(fracs(0) - 0.7) < 0.1)
    assert(math.abs(fracs(1) - 0.2) < 0.08)
    assert(math.abs(fracs(2) - 0.1) < 0.06)
  }

  test("assignment is deterministic across runs and partitionings") {
    def assignment(parts: Int): Map[Long, Int] =
      Splits.withSplitColumn(orders.repartition(parts),
          Seq("o_orderkey"), Seq(0.5, 0.5))
        .select("o_orderkey", "split_idx").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assignment(2) == assignment(7))
  }

  test("portable and fast buckets are both stable under seed; " +
    "different seeds give different assignments") {
    val a = Splits.withSplitColumn(orders, Seq("o_orderkey"),
      Seq(0.5, 0.5), seed = 1).select("o_orderkey", "split_idx")
    val b = Splits.withSplitColumn(orders, Seq("o_orderkey"),
      Seq(0.5, 0.5), seed = 2).select("o_orderkey", "split_idx")
    val moved = a.except(b).count()
    assert(moved > 0, "a new seed must reshuffle some rows")
  }

  test("property: bucket is a pure function of (key, seed) — " +
    "stable across partitionings, in range, for many random cases") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(12345)
    (1 to 10).foreach { _ =>
      val keys = List.fill(20)(rng.nextLong(1000000L))
      val seed = rng.nextLong(100L)
      val df = keys.toDF("k")
      val once = df.select(col("k"),
        Splits.bucketFast(Seq(col("k")), 100, seed).as("b"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val twice = df.repartition(3).select(col("k"),
        Splits.bucketFast(Seq(col("k")), 100, seed).as("b"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(once == twice)
      assert(once.values.forall(b => b >= 0 && b < 100))
    }
  }

  test("pipeline fit/transform is deterministic and params are exposed") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pipe = Pipeline(Seq(
      StandardScaler("l_quantity", "qs"),
      LinearRegression("qs", "l_extendedprice", "pred")))
    val f1 = pipe.fit(li)
    val f2 = pipe.fit(li)
    assert(f1.params == f2.params)
    assert(f1.params.keySet ==
      Set("scale(l_quantity)", "linreg(l_extendedprice~qs)"))
    val n = f1.transform(li).filter(col("pred").isNotNull).count()
    assert(n == li.count())
  }
}
