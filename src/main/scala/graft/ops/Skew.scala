package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation (SURVEY §4 / the 100 TB checklist):
  * when one group key carries a disproportionate share of rows, a plain
  * `groupBy(key)` sends the whole hot key to one reducer. Salting
  * splits each key into `saltBuckets` sub-groups for a PARTIAL
  * aggregate, then combines partials in a cheap FINAL aggregate over
  * `saltBuckets` rows per key.
  *
  * The salt is a per-row counter mod `saltBuckets` — NOT a hash of the
  * row content: a content hash sends fully-duplicate rows (replayed
  * events, the classic hot-key shape) to ONE salt bucket, defeating the
  * mitigation exactly when it matters (review-caught). The final
  * aggregate is salt-independent, so the output is identical either
  * way. Joins don't need this utility — AQE's skew-join splitting
  * handles them (`spark.sql.adaptive.skewJoin`).
  */
object Skew {

  /** decomposed aggregate: partial expr (over raw rows, aliased `name`)
    * + final expr (over partials, referencing `name`). */
  final case class TwoPhase(name: String, partial: Column, fin: Column)

  def sum2(c: Column, name: String): TwoPhase =
    TwoPhase(name, sum(c).as(name), sum(col(name)).as(name))
  def count2(name: String): TwoPhase =
    TwoPhase(name, count(lit(1)).as(name), sum(col(name)).as(name))
  def min2(c: Column, name: String): TwoPhase =
    TwoPhase(name, min(c).as(name), min(col(name)).as(name))
  def max2(c: Column, name: String): TwoPhase =
    TwoPhase(name, max(c).as(name), max(col(name)).as(name))

  /** groupBy(keys).agg(...) computed skew-safely via salted partials. */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[TwoPhase],
      saltBuckets: Int = 32): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    require(saltBuckets >= 1, s"saltBuckets=$saltBuckets must be >= 1")
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.fin, aggs.tail.map(_.fin): _*)
  }
}
