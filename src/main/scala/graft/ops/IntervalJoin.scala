package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark plans `pts JOIN iv ON s <= p AND p <= e` as a
  * BroadcastNestedLoopJoin — O(n·m) probes and a broadcast of one whole
  * side, the classic range-join scale killer. This operator turns it
  * into an EQUI-join by bucketizing the domain:
  *
  *  - every interval [s, e] is exploded onto the fixed-width buckets it
  *    overlaps (`sequence(floor(s/W), floor(e/W))` — cost (e-s)/W + 1
  *    rows per interval, choose W near the typical interval length);
  *  - every point lands in exactly ONE bucket (floor(p/W)), so each
  *    qualifying (point, interval) pair meets in exactly one bucket and
  *    the join needs NO post-dedup;
  *  - the bucket equi-join shuffles by bucket id (AQE-replannable,
  *    skew-salvageable) and the exact `s <= p <= e` predicate filters
  *    inside the join — never a cross product, never a full broadcast.
  *
  * This is the batch complement of the streaming interval join
  * (streaming/StreamOps.scala) and the time-domain sibling of the
  * cell-bucketed spatial join (ops/Geometry.scala).
  */
object IntervalJoin {

  /** Inner-join `points` to every interval of `intervals` containing
    * them: startCol <= ptCol <= endCol (inclusive ends, LONG domain —
    * callers map timestamps/dates to epoch units first). Output carries
    * all columns of both inputs; column names must not collide. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // exact floor-division on LONGs: x - pmod(x, w) is an exact multiple
    // of w, its double quotient is within 0.5 of the true bucket id, and
    // round() lands it exactly — plain floor(x/w) mis-buckets near-
    // boundary values at large epoch magnitudes (double truncation) and
    // x div w truncates toward zero on negatives
    def bucketOf(x: org.apache.spark.sql.Column) =
      round((x - pmod(x, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pts = points
      .withColumn("__bucket", bucketOf(col(ptCol)))
    pts.join(iv, Seq("__bucket"))
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Numeric BAND join: every (left, right) pair with
    * |left.lCol − right.rCol| <= delta (LONG domain — map money to
    * cents, timestamps to epoch units first). Plans as the bucketized
    * equi-join above (each left value becomes the interval
    * [v−delta, v+delta]), so Spark never falls back to the
    * BroadcastNestedLoopJoin a raw `abs(a−b) <= delta` condition
    * produces. Tolerance-matching workhorse: price reconciliation,
    * timestamp alignment windows, measurement-error joins. */
  def bandJoin(left: DataFrame, lCol: String,
               right: DataFrame, rCol: String,
               delta: Long, bucketWidth: Long = 0): DataFrame = {
    require(delta >= 0, s"delta must be >= 0, got $delta")
    val w = if (bucketWidth > 0) bucketWidth else math.max(1L, delta)
    val iv = left.withColumn("__band_lo", col(lCol) - delta)
      .withColumn("__band_hi", col(lCol) + delta)
    pointInInterval(right, rCol, iv, "__band_lo", "__band_hi", w)
      .drop("__band_lo", "__band_hi")
  }
}
