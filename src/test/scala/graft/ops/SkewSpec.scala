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

  test("salting splits a hot key into multiple partial groups") {
    val sp = spark
    import sp.implicits._
    // one key, many distinct rows → partials must use several salts
    val hot = (1 to 10000).map(i => ("hot", i)).toDF("k", "v")
    val salted = hot.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(32L)))
    assert(salted.select("__salt").distinct().count() > 16)
  }
}
