package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar Kalman filter per series (random-walk state, noisy
  * observation — the classic online denoiser for sensor/metric
  * streams):
  *   predict: x̂⁻ = x̂,  P⁻ = P + Q
  *   update:  K = P⁻/(P⁻+R),  x̂ += K·(y − x̂⁻),  P = (1−K)·P⁻
  * Like Holt's smoothing the recurrence is inherently sequential per
  * series, so it runs as the same secondary-sort streaming scan
  * (ops/Holt.scala): hash-repartition by the series key, sort WITHIN
  * partitions by (key, order), one pass with O(1) state per live
  * series — no collect_list, no global sort, no driver state. The
  * 100 TB shape for per-key recurrences outside window-frame reach.
  *
  * Engine-replicable by construction: init x̂₁ = y₁, P₁ = R; each step
  * evaluates pp = P + Q; K = pp/(pp + R); x̂ += K·(y − x̂);
  * P = (1−K)·pp in EXACTLY that operation order, which a recursive
  * CTE replays operation-for-operation (the Holt oracle pattern —
  * division is correctly-rounded IEEE on both engines, so identical
  * operand bits give identical quotients; dyadic Q/R keep the
  * additions exact too).
  */
object Kalman {

  /** Final (n, state, p_var, gain) per key after scanning each series
    * in `order`. Output columns (key, n, state, p_var, gain); gain is
    * the LAST update's K (0.0 for a one-observation series). */
  def scalar(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      value: Column,
      q: Double,
      r: Double): DataFrame = {
    require(q >= 0, s"process noise q must be >= 0, got $q")
    require(r > 0, s"observation noise r must be > 0, got $r")
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("state", DoubleType, nullable = false),
      StructField("p_var", DoubleType, nullable = false),
      StructField("gain", DoubleType, nullable = false)))
    val prepared = df
      .select(Seq(col(key).as("__k"), value.cast("double").as("__y")) ++
        order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__y"))
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private var x = 0.0
        private var p = 0.0
        private var k = 0.0
        private var pending: Row = null

        private def emit(): Row = Row(cur, n, x, p, k)

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val row = it.next()
            val kk = row.get(0)
            val y = row.getDouble(1)
            if (!has || kk != cur) {
              val done = if (has) emit() else null
              cur = kk; has = true; n = 1L; x = y; p = r; k = 0.0
              if (done != null) { pending = done; return true }
            } else {
              val pp = p + q
              k = pp / (pp + r)
              x = x + k * (y - x)
              p = (1.0 - k) * pp
              n += 1
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
