package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (nearest-key ≤ match), the reference's
  * `asof_join` (xorq vendor/ibis/expr/types/relations.py:3034-3077:
  * `on` time key, `predicates` equi-keys, optional `tolerance`).
  *
  * Vanilla Spark has no ASOF JOIN; the naive range-join + pick-latest
  * explodes to O(|L|·|R|) pairs per key before deduplication. This
  * implementation is the scalable union–sort–backfill formulation:
  *
  *   1. union left (tagged 1) and right (tagged 0) rows with aligned
  *      schemas (right payload nulled on left rows and vice versa);
  *   2. one shuffle: window partitioned by the equi-keys, ordered by
  *      (time, tag) — right rows sort before left rows at equal time,
  *      making the match inclusive like DuckDB's `ON l.ts >= r.ts`;
  *   3. `last(right_col, ignoreNulls)` over unbounded-preceding frame
  *      back-fills each left row with the latest right row at-or-before
  *      its timestamp;
  *   4. keep left rows; apply the tolerance filter post-hoc.
  *
  * Cost: ONE shuffle of |L|+|R| rows keyed by the equi-keys + a
  * partition-local sort — the same plan shape Spark uses for a
  * sort-merge join, so it scales to 100 TB the same way (no broadcast,
  * no cartesian blow-up; skewed keys behave like any skewed sort-merge
  * join and can be salted upstream).
  */
object AsofJoin {

  /** @param left       probe side (each row gets ≤1 match)
    * @param right      reference side
    * @param on         equi-join key names (must exist on both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightCols  right payload columns to carry (renamed as given:
    *                   (rightName, outName))
    * @param tolerance  optional max left.ts − right.ts as a Column of
    *                   interval/long-compatible type; matches farther back
    *                   are nulled out
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[(String, String)],
      tolerance: Option[Column] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val t = "__asof_t"
    val tag = "__asof_tag"
    val matchedT = "__asof_matched_t"

    val lNorm = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .select(on.map(col) ++ Seq(col(t), col(tag)) ++
        leftCols.filterNot(on.contains).map(col) ++
        rightCols.map { case (_, out) => lit(null).as(out) }: _*)

    // a right row with no timestamp can never be "at-or-before"
    // anything — drop it, or nulls-first ordering would park it at the
    // head of every frame where last(ignoreNulls) happily picks it up
    // as a spurious match (review-caught). A left row with NULL time
    // stays and comes out unmatched: it sorts before every real right
    // row, so its backfill frame is empty.
    val rNorm = right
      .filter(col(rightTime).isNotNull)
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .select(on.map(col) ++ Seq(col(t), col(tag)) ++
        leftCols.filterNot(on.contains).map(n => lit(null).as(n)) ++
        rightCols.map { case (in, out) => col(in).as(out) }: _*)

    // Tie-break: among right rows at equal (key, t) the window order is
    // made total by the payload struct, so `last` deterministically picks
    // the greatest payload (reference/DuckDB pick arbitrarily; we pin it).
    val payloadStruct = struct(rightCols.map { case (_, out) => col(out) }: _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(t), col(tag), payloadStruct)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Backfill ONE struct of (matched time, payload) so time and payload
    // always come from the SAME matched right row — per-column backfill
    // would skip a NULL payload value and mix rows (ADVICE r1).
    val m = "__asof_match"
    val matchStruct = struct(col(t).as(matchedT) +:
      rightCols.map { case (_, out) => col(out) }: _*)
    val backfilled = lNorm.unionByName(rNorm)
      .withColumn(m,
        last(when(col(tag) === 0, matchStruct), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)

    // Out-of-tolerance ⇒ the row is simply unmatched: null the WHOLE
    // match (matched_time included), like the reference's asof tolerance.
    val matched = tolerance match {
      case Some(tol) =>
        backfilled.withColumn(m,
          when(col(m).isNotNull &&
            col(t) - col(m).getField(matchedT) <= tol, col(m)))
      case None => backfilled
    }

    matched.select(leftCols.map(col) ++
      rightCols.map { case (_, out) => col(m).getField(out).as(out) } :+
      col(m).getField(matchedT).as("matched_time"): _*)
  }
}
