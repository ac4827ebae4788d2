package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering (and positional join, vendor
  * relations.py:216 `positional`): a `Window.orderBy` with no partition
  * is a single-partition global sort — a driver-killer on a fact table
  * (flagged in round 1).
  *
  * This is the distributed two-phase formulation, fully columnar (the
  * r3 `rdd.zipWithIndex` version was shuffle-optimal but left Tungsten,
  * paying full Row serde both ways). The key design point: the range
  * bucket of a row is a DETERMINISTIC FUNCTION OF ITS DATA — explicit
  * quantile boundaries sampled once on the driver and baked into the
  * plan as literals — never the physical partition id. (A first cut
  * used `spark_partition_id()` over `repartitionByRange` and counted
  * rows per partition in a second branch; Catalyst column-pruned that
  * branch into its own range exchange with its own nondeterministic
  * boundary sample, so the two branches could silently disagree.
  * Literal boundaries make every consumer see the same bucketing by
  * construction.)
  *
  *   1. sketch the first sort column with one pruned bottom-k-by-hash
  *      pass and take evenly-spaced boundaries — the deterministic
  *      version of what RangePartitioner samples inside the exchange;
  *   2. bucket = #boundaries ≤ key (an O(#buckets) codegen'd array
  *      scan per row); per-bucket counts → exclusive prefix sum →
  *      tiny broadcast offsets table;
  *   3. local index = `row_number()` over a window PARTITIONED by
  *      bucket (hash exchange + per-bucket sort — no global stage);
  *      global row number = bucket offset + local index.
  *
  * Cost: one boundary-sketch pass (pruned to the first sort column),
  * one hash exchange for the per-bucket window, one tiny
  * broadcast. No single-reducer stage, no RDD serde; everything but
  * the window sort is whole-stage codegen. Ties on the first column
  * land in one bucket (strict boundary compare), so the within-bucket
  * sort by the FULL key keeps the order total.
  *
  * Contract: the first sort column must be ASCENDING (boundary order
  * and window order must agree); any orderable type works (numeric,
  * string, date, timestamp).
  */
object Positional {

  /** Append `rowNumCol` = global 1-based position under `sortCols`
    * ordering (must be a total order for determinism; first column
    * ascending). `buckets` defaults to the session's shuffle
    * parallelism — size it so no bucket exceeds ~2B rows (the
    * `row_number` range). */
  def withRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      rowNumCol: String = "rn",
      buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nBuckets = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val first = sortCols.head
    val bounds = rangeBounds(df, first, nBuckets)

    // phase 2+3: bucket by literal boundaries; number within buckets.
    // Temp columns are freshened against the input so a pre-existing
    // user column named __b/__loc/__off is never overwritten-then-
    // dropped (the temp names must not collide with data columns).
    val bCol = fresh("__b", df.columns)
    val locCol = fresh("__loc", df.columns :+ bCol)
    val offCol = fresh("__off", df.columns :+ bCol :+ locCol)
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit): _*), b => b <= first))
    val bucketed = df.withColumn(bCol, bucketCol)
    val offsets = bucketed
      .groupBy(bCol).agg(count(lit(1)).as("__cnt"))
      .withColumn(offCol,
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(bCol)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(bCol), col(offCol))
    bucketed
      .withColumn(locCol,
        row_number().over(Window.partitionBy(bCol).orderBy(sortCols: _*)))
      .join(broadcast(offsets), bCol)
      .withColumn(rowNumCol, col(offCol) + col(locCol).cast("long"))
      .drop(bCol, locCol, offCol)
  }

  /** Phase 1: deterministic range boundaries for `first` in ONE pruned
    * pass — a bottom-k-by-hash sketch (TakeOrderedAndProject:
    * distributed top-k, no count job, no fraction to pre-compute).
    * Duplicate values hash identically, so the sketch samples
    * ~distinct values; heavy-duplicate keys collapse into one bucket
    * via the strict boundary compare either way. Shared by
    * withRowNumber and withCumSum. */
  private def rangeBounds(
      df: DataFrame, first: Column, nBuckets: Int): Seq[Any] = {
    val k = nBuckets * 128
    val sample: Array[Any] = df
      .select(first.as("__k"))
      .where(col("__k").isNotNull)
      .orderBy(xxhash64(col("__k")))
      .limit(k)
      .collect().map(_.get(0))
    if (sample.isEmpty) Nil
    else {
      val s = sample.sortWith((a, b) =>
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
      (1 until nBuckets)
        .map(i => s(((i.toLong * s.length) / nBuckets).toInt))
        .distinct
    }
  }

  /** Append `cumCol` = EXCLUSIVE running total of `weight` under
    * `sortCols` ordering (the first row of the order gets 0) — the
    * cumulative-sum sibling of [[withRowNumber]], same two-phase
    * distributed shape: per-bucket window sums plus a tiny broadcast
    * prefix-sum of bucket totals, so there is never a single-partition
    * `Window.orderBy` over the data. Use wherever a global cumulative
    * count/sum is needed at data scale (e.g. the ROC rank-sum's
    * cumulative count over distinct scores, which is corpus-sized for
    * continuous score columns). `sortCols` must be a total order for
    * determinism; first column ascending. */
  def withCumSum(
      df: DataFrame,
      sortCols: Seq[Column],
      weight: Column,
      cumCol: String = "cum",
      buckets: Int = 0): DataFrame =
    withCumSums(df, sortCols, Seq(weight -> cumCol), buckets)

  /** Multi-weight [[withCumSum]]: all running totals share ONE bucket
    * exchange, one per-bucket window pass, and one broadcast offsets
    * table — use when several cumulative counts are needed over the
    * same order (e.g. the PR curve's cumulative n and n_positive). */
  def withCumSums(
      df: DataFrame,
      sortCols: Seq[Column],
      weights: Seq[(Column, String)],
      buckets: Int = 0): DataFrame = {
    require(weights.nonEmpty, "withCumSums needs at least one weight")
    val spark = df.sparkSession
    val nBuckets = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val first = sortCols.head
    val bounds = rangeBounds(df, first, nBuckets)
    val bCol = fresh("__b", df.columns)
    val taken = scala.collection.mutable.ArrayBuffer(df.columns: _*)
    taken += bCol
    val locCols = weights.map { case (_, c) =>
      val n = fresh(s"__loc_$c", taken.toSeq); taken += n; n
    }
    val offCols = weights.map { case (_, c) =>
      val n = fresh(s"__off_$c", taken.toSeq); taken += n; n
    }
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit): _*), b => b <= first))
    val bucketed = df.withColumn(bCol, bucketCol)
    // bucket totals → exclusive prefix sums: ≤ nBuckets rows, so the
    // unpartitioned window here is over a broadcast-sized relation.
    val offWin = Window.orderBy(bCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = bucketed.groupBy(bCol)
      .agg(sum(weights.head._1).as(s"__w0"),
        weights.tail.zipWithIndex
          .map { case ((w, _), i) => sum(w).as(s"__w${i + 1}") }: _*)
    val offsets = offCols.zipWithIndex.foldLeft(totals) {
      case (d, (oc, i)) => d.withColumn(oc,
        coalesce(sum(col(s"__w$i")).over(offWin), lit(0L)))
    }.select(col(bCol) +: offCols.map(col): _*)
    val win = Window.partitionBy(bCol).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localized = weights.zip(locCols).foldLeft(bucketed) {
      case (d, ((w, _), lc)) =>
        d.withColumn(lc, coalesce(sum(w).over(win), lit(0L)))
    }
    val joined = localized.join(broadcast(offsets), bCol)
    weights.zip(locCols).zip(offCols).foldLeft(joined) {
      case (d, (((_, cumCol), lc), oc)) =>
        d.withColumn(cumCol, col(oc) + col(lc))
    }.drop(bCol +: (locCols ++ offCols): _*)
  }

  /** `base`, suffixed with underscores until it collides with nothing
    * in `taken`. */
  private def fresh(base: String, taken: Seq[String]): String = {
    var n = base
    while (taken.contains(n)) n += "_"
    n
  }

  /** Positional join: pair the i-th row of `a` (under `aSort`) with the
    * i-th row of `b` (under `bSort`); inner on the common prefix. */
  def positionalJoin(
      a: DataFrame, aSort: Seq[Column],
      b: DataFrame, bSort: Seq[Column]): DataFrame = {
    val taken = a.columns.toSeq ++ b.columns
    val posA = fresh("__pos", taken)
    val posB = fresh("__pos_b", taken :+ posA)
    val an = withRowNumber(a, aSort, posA)
    val bn = withRowNumber(b, bSort, posB)
    an.join(bn, col(posA) === col(posB))
      .drop(posB)
      .withColumnRenamed(posA, "pos")
  }
}
