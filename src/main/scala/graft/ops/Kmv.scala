package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002 — the
  * k-minimum-values estimator behind Theta sketches) as a BOUNDED
  * mergeable aggregate: the sketch of a group is the set of its k
  * SMALLEST DISTINCT portable 32-bit hashes, the estimate is
  * (k−1)·2³²/h₍ₖ₎ at capacity (the tracked size, exact on the hash
  * lattice, below it). Bottom-k is a pure function of the input
  * MULTISET — insertion order, duplication, partitioning, and batch
  * boundaries are all invisible — so (a) map-side partial aggregation
  * is lossless with at most k longs of state per (partition, group),
  * (b) the exchange moves O(k·groups·partitions) rows instead of the
  * corpus, and (c) sketches MERGE downstream by unioning sets and
  * re-taking the bottom k: the bottom-k of a union is the bottom-k of
  * the per-part bottom-ks. This is the mergeable-summary contract the
  * reference ships aggregation state through (update/merge/evaluate,
  * ref python/xorq/expr/pyaggregator.py:25-79), and the shape that
  * makes the sketch shippable from 1000 executors — contrast the
  * textbook window formulation (`row_number() OVER (ORDER BY h)`),
  * which funnels every distinct hash of the corpus through ONE task.
  * `StreamOps.kmvState` folds the identical `insert`, so batch and
  * streaming sketches are bit-identical on the same multiset.
  */
object Kmv {

  /** Dedup-aware sorted insert — the single fold both the batch
    * aggregator and the streaming state share. `mins` is sorted
    * ascending with at most `m` DISTINCT values; inserting a value
    * already evicted is a no-op by construction (eviction implies m
    * tracked values all smaller, so `h >= mins.last` screens it), so
    * the fold over a multiset equals the fold over its distinct set. */
  def insert(mins: List[Long], h: Long, m: Int): List[Long] = {
    // fast path first: once the sketch is full, almost every corpus
    // row lands at-or-above the current kth minimum and is rejected
    // with one list walk (h == last is also caught here — same result
    // as the membership test); only candidate minima pay `contains`
    if ((mins.size >= m && h >= mins.last) || mins.contains(h)) mins
    else {
      val grown = (h :: mins).sorted
      if (grown.size > m) grown.take(m) else grown
    }
  }

  /** Union of sketches, re-taking the bottom `m` — the merge half of
    * the mergeable-summary contract. */
  def merge(sets: Seq[Seq[Long]], m: Int): Seq[Long] =
    sets.flatten.distinct.sorted.take(m)

  /** Distinct-count estimate from a sketch: exact tracked size under
    * capacity (on the hash lattice), (m−1)·2³²/h₍ₘ₎ at capacity. */
  def estimate(mins: Seq[Long], m: Int): Long =
    if (mins.size < m) mins.size.toLong
    else math.round((m - 1) * 4294967296.0 / mins.last + 1e-9)

  /** The engine-portable 32-bit hash lattice: first 8 hex chars of
    * md5 of the value's string form, as an unsigned long — identical
    * in Spark and DuckDB, so oracles can reproduce the sketch. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** The sketch's θ — the EXCLUSIVE hash bound below which the sketch
    * knows its set's hashes EXACTLY (the Theta-sketch view of KMV,
    * Dasgupta et al. 2016 "Theta sketch framework"): at capacity the
    * kth minimum; under capacity the whole 2³² lattice (every hash of
    * the set is tracked). Every sketch entry < θ is a uniform sample
    * of the set's hash population at rate θ/2³². */
  def theta(mins: Seq[Long], m: Int): Long =
    if (mins.size < m) 4294967296L else mins.last

  /** Theta-style SET-OPERATION estimates from two bottom-m sketches:
    * clip both to the common θ = min(θ_A, θ_B); below θ each sketch
    * holds its set's hashes exactly, so |A∩B|, |A\B|, |B\A|, |A∪B|
    * restricted to [0,θ) are EXACT set operations on ≤m-element sets,
    * and each scales up by 2³²/θ. Returns (inter, aOnly, bOnly,
    * union) estimates — the same rounding rule as [[estimate]]. Both
    * batch `agg_kmv_setops` and the streaming spec fold THIS function
    * over sketches, so the two paths agree by construction. */
  def setOpEstimates(a: Seq[Long], b: Seq[Long],
      m: Int): (Long, Long, Long, Long) = {
    val th = math.min(theta(a, m), theta(b, m))
    val sa = a.filter(_ < th).toSet
    val sb = b.filter(_ < th).toSet
    def est(c: Int): Long =
      if (th == 4294967296L) c.toLong
      else math.round(c * 4294967296.0 / th + 1e-9)
    (est(sa.intersect(sb).size), est(sa.diff(sb).size),
      est(sb.diff(sa).size), est(sa.union(sb).size))
  }

  /** Bottom-k aggregator over pre-hashed longs. Buffer is the sorted
    * distinct bottom-k list (≤ k longs); reduce/merge both terminate
    * in the `insert` fold, so partial aggregation is exact. */
  final class BottomKAgg(k: Int)
      extends Aggregator[Long, List[Long], Seq[Long]] {
    require(k >= 2 && k <= 100000, s"bad k $k")
    def zero: List[Long] = Nil
    def reduce(b: List[Long], h: Long): List[Long] = insert(b, h, k)
    def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)((acc, h) => insert(acc, h, k))
    def finish(b: List[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[List[Long]] =
      ExpressionEncoder[List[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }
}
