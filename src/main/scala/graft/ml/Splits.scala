package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/test splitting (ref ml/split_lib.py:68-252):
  * each row's split is a pure function of its unique key + seed —
  * `hash(key, seed) % buckets` bucketed into fractions — NOT
  * `randomSplit`. Properties (tested): disjoint, exhaustive, stable
  * across runs/partitionings/engines, and any row's assignment is
  * reproducible from its key alone.
  *
  * Scale: a split is one codegen'd projection + filter on the scan —
  * no shuffle, no sampling pass, trivially pushes down.
  */
object Splits {

  /** Fast bucket: xxhash64-based (engine-native; use in production). */
  def bucketFast(keys: Seq[Column], numBuckets: Int, seed: Long): Column =
    pmod(xxhash64(lit(seed) +: keys: _*), lit(numBuckets.toLong)).cast("int")

  /** Portable bucket: md5-based, reproducible in ANY engine with md5 +
    * hex→int (the cross-engine contract the oracle checks). */
  def bucketMd5(keys: Seq[Column], numBuckets: Int, seed: Long): Column = {
    val keyStr = concat_ws("|", (lit(seed.toString) +: keys.map(_.cast("string"))): _*)
    pmod(conv(substring(md5(keyStr.cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(numBuckets.toLong)).cast("int")
  }

  /** Add `split_idx` ∈ [0, testSizes.length): bucket ranges sized by
    * the cumulative fractions (calc_split_column, split_lib.py:154). */
  def withSplitColumn(
      df: DataFrame,
      keys: Seq[String],
      testSizes: Seq[Double],
      numBuckets: Int = 10000,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(math.abs(testSizes.sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${testSizes.sum}")
    val bucket =
      if (portable) bucketMd5(keys.map(col), numBuckets, seed)
      else bucketFast(keys.map(col), numBuckets, seed)
    val cuts = testSizes.scanLeft(0.0)(_ + _).map(f =>
      math.round(f * numBuckets))
    val splitIdx = cuts.sliding(2).zipWithIndex.foldLeft(
      lit(-1)) { case (acc, (Seq(lo, hi), i)) =>
      when(bucket >= lo && bucket < hi, lit(i)).otherwise(acc)
    }
    df.withColumn("split_idx", splitIdx)
  }

  /** N disjoint frames per the fractions (train_test_splits,
    * split_lib.py:222). */
  def trainTestSplits(
      df: DataFrame,
      keys: Seq[String],
      testSizes: Seq[Double],
      numBuckets: Int = 10000,
      seed: Long = 42L): Seq[DataFrame] = {
    val tagged = withSplitColumn(df, keys, testSizes, numBuckets, seed)
    testSizes.indices.map(i =>
      tagged.filter(col("split_idx") === i).drop("split_idx"))
  }
}
