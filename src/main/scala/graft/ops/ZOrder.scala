package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write-time clustering — the data-layout lever
  * for 100 TB scans (Delta OPTIMIZE ZORDER BY / Iceberg sort orders do
  * the same): rows sorted along an interleaved-bit curve over several
  * columns give parquet row-group min/max statistics that are
  * simultaneously tight on EVERY clustered column, so a predicate on
  * any of them prunes most files — where a plain sort is tight on the
  * leading column only.
  *
  * Design for scale and skew:
  *  - each cluster column is rank-bucketed into `2^bits` EQUI-DEPTH
  *    buckets via `approxQuantile` boundaries (one driver-side array of
  *    ≤ 2^bits doubles per column — never the data); equi-depth keeps
  *    the curve balanced under skew where uniform `width_bucket` would
  *    collapse most rows into one cell;
  *  - the Morton code interleaves bucket bits in one scalar UDF doing
  *    a binary search per column (log2(2^bits) compares/row/column) —
  *    partition-local, no shuffle of its own;
  *  - `repartitionByRange(zcode)` + `sortWithinPartitions(zcode)` lays
  *    rows out along the curve: ONE range exchange, the same cost any
  *    global sort pays, amortized over every future scan of the data.
  *
  * The transform only reorders rows — the row SET is untouched, which
  * is what the oracle-checked round-trip query asserts.
  */
object ZOrder {

  /** Equi-depth bucket boundaries (ascending, deduplicated) for each
    * column; ≤ 2^bits − 1 cut points per column. Package-visible so
    * the spec can assert cut-point placement under skew. */
  private[ops] def boundaries(df: DataFrame, cols: Seq[String], bits: Int,
      relErr: Double): Array[Array[Double]] = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    // single pass for ALL columns (the per-column overload re-scans
    // the input once per column)
    df.stat.approxQuantile(cols.toArray, probs, relErr)
      .map(_.distinct.sorted)
  }

  /** Morton code column: rank-bucket each value against its literal
    * boundary array (binary search), then interleave the bucket bits
    * round-robin across columns. NULLs bucket to 0 (curve origin). */
  private def mortonCode(cols: Seq[Column], bnds: Array[Array[Double]],
      bits: Int): Column = {
    val code = udf { vals: Seq[java.lang.Double] =>
      var z = 0L
      val nc = vals.length
      var j = 0
      while (j < nc) {
        val v = vals(j)
        val b = bnds(j)
        val bucket =
          if (v == null) 0
          else {
            // first index with boundary > v == count of boundaries <= v
            var lo = 0; var hi = b.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (b(mid) <= v.doubleValue) lo = mid + 1 else hi = mid
            }
            lo
          }
        var bit = 0
        while (bit < bits) {
          if (((bucket >> bit) & 1) == 1)
            z |= 1L << (bit.toLong * nc + j)
          bit += 1
        }
        j += 1
      }
      z
    }
    code(array(cols.map(_.cast("double")): _*))
  }

  /** Reorder `df` along the Z-curve over `cols` into `partitions`
    * range partitions (→ output files). Purely a layout change: same
    * rows, same schema (the internal code column is dropped). */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 8,
      partitions: Int = 0, quantileRelErr: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits*cols must fit a Long, got $bits x ${cols.length}")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val bnds = boundaries(df, cols, bits, quantileRelErr)
    val zc = "__graft_zcode"
    df.withColumn(zc, mortonCode(cols.map(col), bnds, bits))
      .repartitionByRange(p, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Z-ordered parquet write: cluster then write (one file per range
    * partition unless the writer splits on size). */
  def writeParquet(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, partitions: Int = 0): Unit =
    cluster(df, cols, bits, partitions).write.mode("overwrite").parquet(path)

  /** Per-partition (min, max) of `valueCol` after a layout — the
    * pruning-quality probe the spec uses: a partition can be skipped
    * for a range predicate iff its (min, max) misses the range, which
    * is exactly parquet row-group min/max pruning at file level. */
  def partitionRanges(df: DataFrame, valueCol: String): Array[(Double, Double)] =
    df.select(col(valueCol).cast("double"))
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(min(valueCol).as("mn"), max(valueCol).as("mx"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
}
