package graft.ops

import graft.SparkSpec

class SizingSpec extends SparkSpec {

  test("footprint sums real parquet files, skipping _SUCCESS-style") {
    val (bytes, n) = Sizing.footprint(spark,
      Seq(s"$sfDir/lineitem.parquet", s"$sfDir/orders.parquet"))
    assert(bytes > 0 && n >= 2)
    val (b2, _) = Sizing.footprint(spark, Seq(s"$sfDir/lineitem.parquet"))
    assert(b2 < bytes)
  }

  test("advice scales shuffle partitions with input size, floors at " +
    "parallelism, ceilings at the cap") {
    val small = Sizing.advise(spark, Seq(s"$sfDir/lineitem.parquet"))
    assert(small.shufflePartitions ===
      spark.sparkContext.defaultParallelism)
    assert(small.broadcastSafe) // sf0.001 lineitem is tiny
    // degenerate one-byte target: wants a partition per byte, capped
    val wanted = Sizing.advise(spark, Seq(s"$sfDir/lineitem.parquet"),
      targetPartitionBytes = 1, shufflePartitionCeiling = 1000)
    assert(wanted.shufflePartitions === 1000)
    assert(wanted.notes.exists(_.contains("shuffle partitions")))
  }

  test("missing paths are a zero footprint, not an error") {
    val a = Sizing.advise(spark, Seq("/does/not/exist"))
    assert(a.inputBytes === 0L && a.nFiles === 0)
    assert(a.scanPartitions === 1)
  }
}
