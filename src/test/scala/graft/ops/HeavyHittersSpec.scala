package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  // skewed corpus: key "hot_i" (i<5) appears ~2000x, 5000 cold keys ~1x
  private lazy val skewed = {
    val hot = spark.range(10000)
      .select(concat(lit("hot_"), (col("id") % 5)).as("k"))
    val cold = spark.range(5000)
      .select(concat(lit("cold_"), col("id")).as("k"))
    hot.unionAll(cold).repartition(8)
  }

  test("matches exact groupBy threshold on skewed data") {
    val got = HeavyHitters.heavyHitters(skewed, col("k"), k = 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = skewed.count()
    val want = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / 100)
      .orderBy(col("cnt").desc, col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.size === 5) // exactly the 5 hot keys
  }

  test("result is independent of partitioning") {
    val a = HeavyHitters.heavyHitters(skewed.repartition(2), col("k"), 50)
      .collect().toSeq
    val b = HeavyHitters.heavyHitters(skewed.repartition(16), col("k"), 50)
      .collect().toSeq
    assert(a === b)
  }

  test("candidate relation is bounded by capacity") {
    val cands = HeavyHitters.candidates(skewed, col("k"), capacity = 32)
    assert(cands.count() <= 32)
    // and still contains every true heavy hitter above n/32
    val keys = cands.collect().map(_.getString(0)).toSet
    (0 until 5).foreach(i => assert(keys.contains(s"hot_$i")))
  }

  test("k > capacity is rejected loudly") {
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(skewed, col("k"), k = 300, capacity = 256)
    }
  }
}
