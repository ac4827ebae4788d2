package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a BOUNDED mergeable aggregate — the scale-correct
  * form of "top N per key". The textbook window formulation
  * (`row_number() OVER (PARTITION BY key ORDER BY v DESC) <= k`)
  * shuffles and sorts EVERY row of every group; this aggregator keeps
  * at most k candidates per (partition, key) on the map side, so the
  * exchange moves O(k · keys · partitions) rows instead of the corpus,
  * and no per-group sort ever exceeds 2k elements. Same result —
  * top-k is a mergeable summary (merge = concat + re-truncate), so
  * partial aggregation is lossless.
  *
  * Determinism: ordering is (value DESC, tiebreak ASC); callers supply
  * a UNIQUE tiebreak string (id), making the result total-ordered and
  * engine-stable — the oracle can be the window formulation.
  */
object TopK {

  /** Public so streaming (StreamOps.windowedTopK) and custom pipelines
    * can plug the same bounded aggregate into their own groupBys. */
  final class TopKAggregate(k: Int) extends Aggregator[
      (Double, String),
      scala.collection.mutable.ArrayBuffer[(Double, String)],
      Seq[(Double, String)]] {
    type Buf = scala.collection.mutable.ArrayBuffer[(Double, String)]
    private val ord = Ordering.by[(Double, String), (Double, String)](
      t => (-t._1, t._2))
    private def shrink(b: Buf): Buf = {
      if (b.length > k) {
        val kept = b.sorted(ord).take(k)
        b.clear(); b ++= kept
      }
      b
    }
    def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    def reduce(b: Buf, a: (Double, String)): Buf = {
      b += a
      // amortize: only sort-truncate at 2k, so reduce is O(1) amortized
      if (b.length >= 2 * k) shrink(b) else b
    }
    def merge(a: Buf, b: Buf): Buf = shrink(a ++= b)
    def finish(b: Buf): Seq[(Double, String)] = b.sorted(ord).take(k).toSeq
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[(Double, String)]] =
      ExpressionEncoder[Seq[(Double, String)]]()
  }

  /** Top `k` rows per `key` by (`value` DESC, `tiebreak` ASC), exploded
    * back to rows with a 1-based `rank`. Output columns: key, rank,
    * value, tiebreak. `tiebreak` must be unique per row for a total
    * order. */
  def perKey(df: DataFrame, key: Column, value: Column, tiebreak: Column,
             k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, s"bad k $k")
    val agg = udaf(new TopKAggregate(k))
    df.select(key.as("key"), value.cast("double").as("v"),
        tiebreak.cast("string").as("t"))
      .na.drop(Seq("v", "t"))
      .groupBy("key")
      .agg(agg(col("v"), col("t")).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("pos", "row")))
      .select(col("key"), (col("pos") + 1).as("rank"),
        col("row._1").as("value"), col("row._2").as("tiebreak"))
  }
}
