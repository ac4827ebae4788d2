package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured-Streaming operators over the same column algebra as the
  * batch engine (SURVEY §2.9 / §7 step 9 — the Spark value-add the
  * reference lacks: its "streams" are one-shot Arrow batch readers with
  * replay, ADR-0013; real watermarks/windows/state don't exist there).
  *
  * Each transform below works identically on a batch frame and a
  * `readStream` frame — callers choose the source; the transform is the
  * same declarative plan, which is exactly Structured Streaming's
  * contract. Scale notes: windowed aggregations shuffle by (window,
  * keys) with watermark-bounded state; dedup state is bounded by the
  * watermark horizon; mapGroupsWithState keeps one state row per key.
  */
object StreamOps {

  /** Event-time tumbling-window aggregation with a watermark bounding
    * state (and tolerated lateness). */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      windowLen: String,
      keys: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup on a key SUBSET (the streaming face of the
    * LLM exact-dedup operator): duplicates of the same keys are dropped
    * regardless of event time, with state bounded by the watermark via
    * `dropDuplicatesWithinWatermark` — the r2 formulation appended
    * `tsCol` to the keys, which silently deduped on (keys, event-time)
    * instead of the keys alone (ADVICE r2). */
  def dedup(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Per-key running counter via mapGroupsWithState — the minimal
    * custom-state shape (KeyValueGroupedDataset, SURVEY §2.9); used as
    * the pattern for sessionization/custom accumulators. */
  def runningCountsTyped(
      df: DataFrame,
      keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"))
      .as[String]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Long)] {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          (key, next)
      }
      .toDF("key", "n")
  }
}
