package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: pruning geometry (tight per-partition min/max on
  * EVERY clustered dim, where a plain sort is tight on the leading dim
  * only), equi-depth behavior under skew, and row-set preservation. */
class ZOrderSpec extends SparkSpec {

  test("z-order gives prunable ranges on BOTH dims; a leading-column " +
    "sort does not") {
    val sp = spark
    // 128x128 grid (bucket-aligned with bits=7), 4 rows per cell
    val df = sp.range(65536).select(
      (col("id") % 128).as("x"),
      ((col("id") / 128) % 128).as("y"),
      col("id").as("v"))
    val zed = ZOrder.cluster(df, Seq("x", "y"), bits = 7, partitions = 16)
      .persist()
    val xsorted = df.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x").persist()
    def touched(d: org.apache.spark.sql.DataFrame, c: String,
        lo: Double, hi: Double): Int =
      ZOrder.partitionRanges(d, c).count { case (mn, mx) =>
        mx >= lo && mn <= hi }
    try {
      // the trade the curve buys: the x-sort prunes perfectly on x and
      // not at all on y; the z-order prunes on BOTH dims (neither
      // perfectly — thin slabs intersect several curve blocks, and the
      // sampled range boundaries are not exactly quad-aligned, so the
      // bound is conservative)
      assert(touched(xsorted, "y", 8, 15) == 16)
      assert(touched(xsorted, "x", 8, 15) <= 3)
      assert(touched(zed, "y", 8, 15) <= 12)
      assert(touched(zed, "x", 8, 15) <= 12)
      assert(touched(zed, "y", 8, 15) + touched(zed, "x", 8, 15) <= 20,
        "combined two-dim pruning must beat the 16+3 of a plain sort")
      // layout only: identical row multiset
      val (n0, s0) = { val r = df.agg(count(lit(1)), sum("v")).collect()(0)
        (r.getLong(0), r.getLong(1)) }
      val (n1, s1) = { val r = zed.agg(count(lit(1)), sum("v")).collect()(0)
        (r.getLong(0), r.getLong(1)) }
      assert(n0 == n1 && s0 == s1)
    } finally { zed.unpersist(); xsorted.unpersist() }
  }

  test("equi-depth buckets keep resolution inside a skewed dense " +
    "region, where uniform-width buckets would collapse it") {
    val sp = spark
    // 90% of rows in x ∈ [0,9], 10% spread over [10, 10009]: uniform
    // width over [0,10009] would put the whole dense region in ONE
    // bucket (no x-resolution where the data lives); equi-depth gives
    // each dense value its own bucket span, so a narrow predicate
    // INSIDE the dense region still prunes partitions.
    val dense = sp.range(36000).select((col("id") % 10).as("x"),
      (col("id") % 100).as("y"))
    val tail = sp.range(4000).select((col("id") % 10000 + 10).as("x"),
      (col("id") % 100).as("y"))
    val df = dense.union(tail)
    val zed = ZOrder.cluster(df, Seq("x", "y"), bits = 6, partitions = 16)
      .persist()
    try {
      val counts = zed.withColumn("p", spark_partition_id())
        .groupBy("p").count().collect().map(_.getLong(1))
      assert(counts.length == 16, "no empty/collapsed partitions")
      assert(counts.max <= 3 * counts.min,
        s"range partitions stay count-balanced: ${counts.mkString(",")}")
      // the defining equi-depth property, deterministic on fixed data:
      // most cut points land INSIDE the dense region (uniform-width
      // buckets over [0,10009] would put zero there)
      val cuts = ZOrder.boundaries(df, Seq("x"), 6, 0.01)(0)
      assert(cuts.count(_ <= 9.0) >= cuts.length / 2,
        s"equi-depth cuts must concentrate in the dense region: " +
          cuts.mkString(","))
      // pruning sanity (loose — range-boundary sampling wobbles):
      // a narrow dense-region predicate must prune SOMETHING
      val touched = ZOrder.partitionRanges(zed, "x").count {
        case (mn, mx) => mx >= 2 && mn <= 3 }
      assert(touched < 16,
        s"narrow dense-region predicate must prune, touched $touched/16")
    } finally zed.unpersist()
  }

  test("guards: empty column list and bit overflow fail loudly") {
    val df = spark.range(10).toDF("x")
    intercept[IllegalArgumentException](ZOrder.cluster(df, Seq.empty))
    intercept[IllegalArgumentException](
      ZOrder.cluster(df, Seq.fill(9)("x"), bits = 8))
  }
}
