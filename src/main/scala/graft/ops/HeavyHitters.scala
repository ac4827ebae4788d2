package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters via a mergeable Misra–Gries sketch + exact recount.
  *
  * The exact top-k-by-frequency over a corpus-scale key column normally
  * needs a full `groupBy(key)` shuffle of EVERY distinct key. The
  * Misra–Gries summary (Misra & Gries 1982; mergeability per Agarwal et
  * al. 2013, "Mergeable Summaries", PODS) bounds the state at `capacity`
  * counters per partition and merges associatively, so the first pass is
  * a constant-size partial aggregate with NO key shuffle — the guarantee:
  * every item with true frequency > n/capacity survives the sketch
  * (counter underestimates by at most n/capacity, never to/below zero
  * for a true heavy hitter).
  *
  * Because the sketch's counts are approximate, the operator then does
  * an EXACT recount of just the O(capacity) candidate keys (a broadcast
  * semi join + groupBy over a relation bounded by `capacity`, not by the
  * corpus's distinct-key count) and filters by the true threshold
  * n/k. Result: EXACT heavy-hitter counts, with the corpus-sized shuffle
  * replaced by [constant-size sketch pass] + [candidate-only recount] —
  * the two-phase shape every production top-k system uses at 100 TB.
  *
  * Determinism: the sketch's surviving-candidate SET can depend on
  * partition order for items near the error bound, but every true heavy
  * hitter (freq > n/capacity) is ALWAYS in the candidate set, and the
  * exact recount + threshold filter makes the final result independent
  * of which borderline candidates the sketch happened to keep — so the
  * operator's output is deterministic even though the sketch is not.
  */
object HeavyHitters {

  /** Misra–Gries: at most `capacity` counters; reduce decrements all
    * counters when full (amortized via min-subtraction); merge sums
    * counterwise then subtracts the (capacity+1)-th largest count. */
  private final class MgAgg(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < capacity => b.updated(key, 1L)
        case None =>
          // classic MG overflow step: decrement every counter by 1 and
          // drop zeros; the arriving key is NOT inserted. Each such step
          // retires capacity+1 units of mass (capacity counters + the
          // uncounted arrival), which is exactly what bounds the
          // undercount at n/(capacity+1).
          b.iterator.filter(_._2 > 1)
            .map { case (k, c) => k -> (c - 1) }.toMap
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (sum.size <= capacity) sum
      else {
        val t = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)
          .apply(capacity) // (capacity+1)-th largest
        sum.iterator.filter(_._2 > t)
          .map { case (k, c) => k -> (c - t) }.toMap
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Lazy candidate relation (≤ `capacity` rows, one column `key`) —
    * a superset of every item with frequency > n/capacity. */
  def candidates(df: DataFrame, key: Column,
                 capacity: Int = 256): DataFrame = {
    require(capacity >= 2, s"capacity must be >= 2, got $capacity")
    df.select(key.cast("string").as("__hh_key"))
      .na.drop()
      .select(udaf(new MgAgg(capacity)).apply(col("__hh_key")).as("m"))
      .select(explode(map_keys(col("m"))).as("key"))
  }

  /** EXACT counts of all keys with frequency strictly greater than
    * total/k, computed with a bounded-state sketch pass plus a
    * candidate-only recount. Requires k <= capacity (otherwise the
    * sketch guarantee does not cover the threshold). Output columns:
    * key, cnt — ordered by (cnt DESC, key). */
  def heavyHitters(df: DataFrame, key: Column, k: Int,
                   capacity: Int = 256): DataFrame = {
    require(k >= 2 && k <= capacity,
      s"need 2 <= k <= capacity, got k=$k capacity=$capacity")
    val keyed = df.select(key.cast("string").as("key")).na.drop()
    val cand = candidates(df, key, capacity)
    val exact = keyed.join(broadcast(cand), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val total = keyed.agg(count(lit(1)).as("total"))
    exact.crossJoin(broadcast(total))
      .filter(col("cnt") > col("total").cast("double") / k)
      .select(col("key"), col("cnt"))
      .orderBy(col("cnt").desc, col("key"))
  }
}
