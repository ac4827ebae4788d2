package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — materialized-view refresh for
  * append-only feeds: instead of recomputing `SELECT keys, aggs FROM t`
  * over 100 TB when a new partition lands, fold ONLY the delta into the
  * persisted aggregate state. This is the incremental layer every
  * production pipeline builds on top of a cache (the graft cache tier
  * stores the state frame; this op keeps it current), and the algebraic
  * core of streaming aggregation re-expressed for batch artifacts.
  *
  * Measures are kept in MERGEABLE partial form — count, sum, min, max
  * (avg is derived as sum/count at read time, never stored): for these,
  * state ⊕ aggregate(delta) grouped by key is exactly aggregate(full),
  * associatively and commutatively, so refresh order and batching don't
  * matter. APPEND-ONLY by contract: min/max are not retractable —
  * deletions require recompute (loudly out of scope, like every
  * non-invertible-measure incremental system).
  *
  * Scale shape: the delta aggregation touches only delta rows; the merge
  * is a groupBy over state ∪ delta-partials — state is group-count
  * sized, not corpus sized, and the merge shuffle moves only it.
  */
object IncrementalAgg {

  /** Column names produced for measure `m`: m_count / m_sum / m_min /
    * m_max per measure column. */
  private def partialAggs(measures: Seq[String]): Seq[Column] =
    measures.flatMap { m =>
      Seq(count(col(m)).as(s"${m}_count"),
        sum(col(m)).as(s"${m}_sum"),
        min(col(m)).as(s"${m}_min"),
        max(col(m)).as(s"${m}_max"))
    }

  /** Aggregate a raw frame into partial state (also used to bootstrap
    * the very first state from the initial load). */
  def aggregate(df: DataFrame, keys: Seq[String],
                measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty,
      "need at least one key and one measure")
    df.groupBy(keys.map(col): _*)
      .agg(partialAggs(measures).head, partialAggs(measures).tail: _*)
  }

  /** Fold an append-only delta into existing state: aggregate the delta,
    * union with state, merge mergeable partials per key. Counts, min,
    * max, and integer-lattice sums are bit-identical to
    * `aggregate(full)`; free-double sums agree up to summation-order
    * noise (round at read time, or feed decimals — same contract as any
    * distributed sum). */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
              measures: Seq[String]): DataFrame = {
    val deltaAgg = aggregate(delta, keys, measures)
    state.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(
        measures.flatMap { m =>
          Seq(sum(col(s"${m}_count")).as(s"${m}_count"),
            sum(col(s"${m}_sum")).as(s"${m}_sum"),
            min(col(s"${m}_min")).as(s"${m}_min"),
            max(col(s"${m}_max")).as(s"${m}_max"))
        }.head,
        measures.flatMap { m =>
          Seq(sum(col(s"${m}_count")).as(s"${m}_count"),
            sum(col(s"${m}_sum")).as(s"${m}_sum"),
            min(col(s"${m}_min")).as(s"${m}_min"),
            max(col(s"${m}_max")).as(s"${m}_max"))
        }.tail: _*)
  }

  /** Read-time view of the state with derived measures (avg = sum/count)
    * — what a consumer queries instead of the raw partials. */
  def view(state: DataFrame, measures: Seq[String]): DataFrame =
    measures.foldLeft(state) { (df, m) =>
      df.withColumn(s"${m}_avg",
        col(s"${m}_sum").cast("double") / col(s"${m}_count"))
    }
}
