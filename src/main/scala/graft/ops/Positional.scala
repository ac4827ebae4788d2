package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering (and positional join, vendor
  * relations.py:216 `positional`): a `Window.orderBy` with no partition
  * is a single-partition global sort — a driver-killer on a fact table
  * (flagged in round 1). This is the distributed two-pass formulation:
  *
  *   1. range-repartition by the sort keys (sampled range exchange) and
  *      sort within partitions — the standard distributed total sort;
  *   2. count rows per partition, collect the (tiny, = #partitions)
  *      counts, prefix-sum to offsets;
  *   3. per-partition local index + broadcast offset = global 1-based
  *      row number.
  *
  * Cost: one range exchange + one pass; no single-reducer stage. The
  * collected state is one long per partition.
  */
object Positional {

  /** Append `rowNumCol` = global 1-based position under `sortCols`
    * ordering (must be a total order for determinism). */
  def withRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      rowNumCol: String = "rn"): DataFrame = {
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // zipWithIndex IS the two-pass shape (per-partition count job +
    // offset-adjusted numbering pass) maintained by Spark core — the
    // hand-rolled count/scanLeft/number version said the same thing in
    // 12 lines (review simplification).
    val schema = sorted.schema.add(rowNumCol,
      org.apache.spark.sql.types.LongType)
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1))
      }, schema)
  }

  /** Positional join: pair the i-th row of `a` (under `aSort`) with the
    * i-th row of `b` (under `bSort`); inner on the common prefix. */
  def positionalJoin(
      a: DataFrame, aSort: Seq[Column],
      b: DataFrame, bSort: Seq[Column]): DataFrame = {
    val an = withRowNumber(a, aSort, "__pos")
    val bn = withRowNumber(b, bSort, "__pos_b")
    an.join(bn, col("__pos") === col("__pos_b"))
      .drop("__pos_b")
      .withColumnRenamed("__pos", "pos")
  }
}
