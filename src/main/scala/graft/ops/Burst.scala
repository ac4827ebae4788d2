package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-state burst detection (Kleinberg 2002, "Bursty and hierarchical
  * structure in streams" — the automaton behind trending-topic
  * detection), in its ONLINE/FILTERED form: a forward min-cost pass
  * over each series where state 0 expects the base rate and state 1
  * the elevated rate, entering a burst pays a transition toll, and
  * each step's state is the argmin of the two running path costs
  * (ties to the base state). This is the decision rule a streaming
  * monitor can actually apply (full Viterbi needs the future); with
  * all four emission weights and the toll supplied as pre-scaled
  * INTEGER constants (micro-nats: round(-ln(q)*1e6) computed OFFLINE,
  * never an engine libm call), the whole pass is exact BIGINT
  * arithmetic — bit-identical on any engine, SQL-replicable as a
  * bounded recursive CTE.
  *
  * Costs: state s on a day with k target events out of n total pays
  * k*aS + (n-k)*bS; entering state 1 from state 0 additionally pays
  * `trans`. Recurrence (c0, c1 are running path costs):
  *   c0' = min(c0, c1) + k*a0 + (n-k)*b0
  *   c1' = min(c1, c0 + trans) + k*a1 + (n-k)*b1
  * Runs as the Holt-device secondary-sort scan: hash-repartition by
  * key, sort within partitions, one O(1)-state pass — the 100 TB
  * shape for per-series recurrences.
  */
object Burst {

  /** Forward two-state scan; output per key:
    * (key, n_days, n_burst, n_intervals, first_burst, cost) where
    * n_burst counts burst-labeled steps, n_intervals counts 0→1
    * entries (a series that starts bursting counts one), first_burst
    * is the 1-based step index of the first burst label (0 = never),
    * and cost is the final min path cost. */
  def twoState(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      kCol: Column,
      nCol: Column,
      a0: Long, b0: Long, a1: Long, b1: Long,
      trans: Long): DataFrame = {
    require(a0 > a1 && b0 < b1,
      "state 1 must be the elevated-rate state: a0 > a1 and b0 < b1")
    require(trans > 0, s"transition toll must be positive, got $trans")
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n_days", LongType, nullable = false),
      StructField("n_burst", LongType, nullable = false),
      StructField("n_intervals", LongType, nullable = false),
      StructField("first_burst", LongType, nullable = false),
      StructField("cost", LongType, nullable = false)))
    val prepared = df
      .select(Seq(col(key).as("__k"), kCol.cast("long").as("__e"),
        nCol.cast("long").as("__n")) ++ order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__e"), col("__n"))
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var nd = 0L
        private var c0 = 0L
        private var c1 = 0L
        private var prev = 0L
        private var nb = 0L
        private var ni = 0L
        private var fb = 0L
        private var pending: Row = null

        private def emit(): Row =
          Row(cur, nd, nb, ni, fb, math.min(c0, c1))

        override def hasNext: Boolean = pending != null || advance()

        private def step(k: Long, n: Long, first: Boolean): Unit = {
          val e0 = k * a0 + (n - k) * b0
          val e1 = k * a1 + (n - k) * b1
          val nc0 = if (first) e0 else math.min(c0, c1) + e0
          val nc1 = if (first) trans + e1
            else math.min(c1, c0 + trans) + e1
          val st = if (nc1 < nc0) 1L else 0L
          if (st == 1L && (first || prev == 0L)) ni += 1
          if (st == 1L) { nb += 1; if (fb == 0L) fb = nd }
          c0 = nc0; c1 = nc1; prev = st
        }

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; nd = 1L
              nb = 0L; ni = 0L; fb = 0L; prev = 0L
              step(r.getLong(1), r.getLong(2), first = true)
              if (done != null) { pending = done; return true }
            } else {
              nd += 1
              step(r.getLong(1), r.getLong(2), first = false)
            }
          }
          if (has) { pending = emit(); has = false; return true }
          false
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r2 = pending; pending = null; r2
        }
      }
    }(Encoders.row(out))
  }
}
