package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals the direct aggregation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), Seq(
        Skew.sum2(col("l_quantity"), "s"),
        Skew.count2("n"),
        Skew.min2(col("l_extendedprice"), "mn"),
        Skew.max2(col("l_extendedprice"), "mx")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n, mn, mx)) =>
      val (ds, dn, dmn, dmx) = direct(k)
      assert(n == dn && mn == dmn && mx == dmx)
      assert(math.abs(s - ds) / math.max(1.0, math.abs(ds)) < 1e-9)
    }
  }

  test("salting splits a hot key into multiple partial groups — even " +
    "when the hot key's rows are EXACT DUPLICATES") {
    val sp = spark
    import sp.implicits._
    // fully-duplicate rows (replayed events): a content-hash salt sends
    // them all to ONE bucket, defeating the mitigation (review-caught).
    // Count the partial-aggregate groups the final stage consumes.
    val hot = (1 to 10000).map(_ => ("hot", 1)).toDF("k", "v")
    val partials = Skew.saltedAgg(hot, Seq("k"),
      Seq(Skew.count2("n")), saltBuckets = 32)
    // correctness: final result unchanged
    assert(partials.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap == Map("hot" -> 10000L))
    // mitigation: the duplicates must spread across many salt buckets
    val salted = hot.repartition(8).withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(32L)))
    assert(salted.select("__salt").distinct().count() > 16,
      "duplicate rows must not collapse onto one salt bucket")
  }
}
