package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Holt's linear-trend (double exponential) smoothing per series — the
  * trend-aware successor of the EWMA feature (WindowQueries.win_ewma).
  * The recurrence
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  * is inherently sequential per series, so it runs as the classic
  * secondary-sort streaming scan: hash-repartition by the series key,
  * sort WITHIN partitions by (key, order), then one pass over each
  * partition's iterator with O(1) state per live series — no
  * collect_list (per-key state never materializes a whole series), no
  * global sort, no driver involvement. This is the 100 TB shape for
  * any per-key recurrence Spark's window frames cannot express.
  *
  * A pinned run is SQL-replicable with a recursive CTE joining step
  * rn → rn+1 (the iterative-oracle pattern). Dyadic-rational α/β
  * (0.5, 0.25, …) keep 1−α / 1−β exact in binary, so both engines
  * evaluate bit-identical recurrences.
  */
object Holt {

  /** Final (level, trend) state per key after scanning each series in
    * `order`; output columns (key, n, level, trend). Init: l₁ = y₁,
    * b₁ = 0. Output key column keeps the input name and type (long
    * keys supported; others via the generic row get). */
  def linear(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      value: Column,
      alpha: Double,
      beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false)))
    val prepared = df
      .select(Seq(col(key).as("__k"), value.cast("double").as("__y")) ++
        order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__y"))
    val oneMinusAlpha = 1 - alpha // exact for dyadic-rational alpha
    val oneMinusBeta = 1 - beta
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private var l = 0.0
        private var b = 0.0
        private var pending: Row = null

        private def emit(): Row = Row(cur, n, l, b)

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val y = r.getDouble(1)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; n = 1L; l = y; b = 0.0
              if (done != null) { pending = done; return true }
            } else {
              val lNew = alpha * y + oneMinusAlpha * (l + b)
              b = beta * (lNew - l) + oneMinusBeta * b
              l = lNew
              n += 1
            }
          }
          if (has) { pending = emit(); has = false; return true }
          false
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }(Encoders.row(out))
  }

  /** Holt–Winters ADDITIVE seasonal (triple exponential) smoothing per
    * series — the season-aware tier above [[linear]]:
    *   l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m}
    * Same secondary-sort streaming scan; per-series state adds an
    * m-slot circular seasonal buffer (still O(m) constant, never the
    * series). Deterministic init (l₁ = y₁, b₁ = 0, seasonals all 0 —
    * the first season then LEARNS the offsets through γ) and dyadic
    * α/β/γ keep both engines bit-identical; the oracle replays the
    * recurrence as a recursive CTE carrying the seasonal buffer as a
    * LIST column (slice + append per step).
    * Output: (key, n, level, trend, seasonal) where seasonal is the
    * NEXT season slot s_{t+1−m} — the value the t+1 forecast adds. */
  def winters(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      value: Column,
      alpha: Double,
      beta: Double,
      gamma: Double,
      m: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma in [0,1], got $gamma")
    require(m >= 2, s"season length m must be >= 2, got $m")
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false),
      StructField("seasonal", DoubleType, nullable = false)))
    val prepared = df
      .select(Seq(col(key).as("__k"), value.cast("double").as("__y")) ++
        order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__y"))
    val oneMinusAlpha = 1 - alpha
    val oneMinusBeta = 1 - beta
    val oneMinusGamma = 1 - gamma
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private var l = 0.0
        private var b = 0.0
        private var season: Array[Double] = null
        private var idx = 0 // slot holding s_{t-m} for the NEXT step
        private var pending: Row = null

        private def emit(): Row = Row(cur, n, l, b, season(idx))

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val y = r.getDouble(1)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; n = 1L; l = y; b = 0.0
              season = new Array[Double](m); idx = 0
              if (done != null) { pending = done; return true }
            } else {
              val sOld = season(idx)
              val lNew = alpha * (y - sOld) + oneMinusAlpha * (l + b)
              b = beta * (lNew - l) + oneMinusBeta * b
              season(idx) = gamma * (y - lNew) + oneMinusGamma * sOld
              l = lNew
              idx = (idx + 1) % m
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

  /** Croston's method (Croston 1972, "Forecasting and stock control
    * for intermittent demands", Oper. Res. Q. 23) — the standard
    * forecast state for INTERMITTENT demand, where most periods have
    * no demand at all and plain SES (or [[linear]]) systematically
    * lags: two coupled SES recurrences over the NONZERO demands only,
    *   z_t = α·y_t + (1−α)·z_{t−1}   (demand-size level)
    *   x_t = α·q_t + (1−α)·x_{t−1}   (inter-demand-interval level)
    * where q_t = periods since the previous demand; the per-period
    * demand-rate forecast is z/x. Init: z₁ = y₁, x₁ = 1 (the first
    * demand carries no interval evidence). Input rows are the
    * (key, period, y) DEMAND events (zero periods simply absent —
    * exactly how an intermittent series is stored); same
    * secondary-sort O(1)-state scan as [[linear]], ordered by the
    * integer period column. Dyadic α keeps both engines
    * bit-identical; a pinned run replays as a recursive CTE.
    * Output: (key, n, size_level, interval_level). */
  def croston(
      df: DataFrame,
      key: String,
      period: Column,
      value: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("size_level", DoubleType, nullable = false),
      StructField("interval_level", DoubleType, nullable = false)))
    val prepared = df
      .select(col(key).as("__k"), period.cast("long").as("__p"),
        value.cast("double").as("__y"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__p"))
    val oneMinusAlpha = 1 - alpha
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private var z = 0.0
        private var x = 0.0
        private var prevP = 0L
        private var pending: Row = null

        private def emit(): Row = Row(cur, n, z, x)

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val p = r.getLong(1)
            val y = r.getDouble(2)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; n = 1L; z = y; x = 1.0; prevP = p
              if (done != null) { pending = done; return true }
            } else {
              val q = (p - prevP).toDouble
              z = alpha * y + oneMinusAlpha * z
              x = alpha * q + oneMinusAlpha * x
              prevP = p
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

  /** MACD (Appel's moving-average convergence/divergence) per series —
    * the triple-EMA momentum state every quant feature store carries:
    *   emaF_t = aF·y_t + (1−aF)·emaF_{t−1}    (init emaF₁ = y₁)
    *   emaS_t = aS·y_t + (1−aS)·emaS_{t−1}    (init emaS₁ = y₁)
    *   macd_t = emaF_t − emaS_t
    *   sig_t  = aSig·macd_t + (1−aSig)·sig_{t−1}  (init sig₁ = 0)
    * Same secondary-sort O(1)-state scan as [[linear]] (repartition by
    * key + sortWithinPartitions + one iterator pass — the 100 TB shape
    * for per-key recurrences). Dyadic-rational smoothing factors keep
    * 1−a exact in binary so a pinned run is bit-identical to the
    * recursive-CTE oracle. Output per key: (key, n, ema_fast,
    * ema_slow, macd, signal) at the final observation; the histogram
    * macd − signal derives in the caller. */
  def macd(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      value: Column,
      aFast: Double,
      aSlow: Double,
      aSig: Double): DataFrame = {
    require(aFast > aSlow, s"fast EMA must smooth less: $aFast <= $aSlow")
    Seq("aFast" -> aFast, "aSlow" -> aSlow, "aSig" -> aSig).foreach {
      case (nm, a) => require(a > 0 && a <= 1, s"$nm in (0,1], got $a")
    }
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("ema_fast", DoubleType, nullable = false),
      StructField("ema_slow", DoubleType, nullable = false),
      StructField("macd", DoubleType, nullable = false),
      StructField("signal", DoubleType, nullable = false)))
    val prepared = df
      .select(Seq(col(key).as("__k"), value.cast("double").as("__y")) ++
        order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__y"))
    val omF = 1 - aFast; val omS = 1 - aSlow; val omG = 1 - aSig
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private var ef = 0.0
        private var es = 0.0
        private var sg = 0.0
        private var pending: Row = null

        private def emit(): Row = Row(cur, n, ef, es, ef - es, sg)

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val y = r.getDouble(1)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; n = 1L; ef = y; es = y; sg = 0.0
              if (done != null) { pending = done; return true }
            } else {
              ef = aFast * y + omF * ef
              es = aSlow * y + omS * es
              sg = aSig * (ef - es) + omG * sg
              n += 1
            }
          }
          if (has) { pending = emit(); has = false; return true }
          false
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r3 = pending; pending = null; r3
        }
      }
    }(Encoders.row(out))
  }

  /** DAMPED-trend Holt smoothing (Gardner & McKenzie 1985 — the
    * default long-horizon forecaster in the M-competitions; the
    * damping factor phi < 1 flattens the trend extrapolation that
    * plain Holt over-shoots):
    *   l_t = a*y_t + (1-a)*(l_{t-1} + phi*b_{t-1})
    *   b_t = b*(l_t - l_{t-1}) + (1-b)*phi*b_{t-1}
    * Same secondary-sort O(1)-state scan as [[linear]]; dyadic
    * a/b/phi keep both engines bit-identical. Output: (key, n, level,
    * trend, forecast) where forecast = l + phi*b (the 1-step-ahead
    * damped extrapolation). */
  def damped(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      value: Column,
      alpha: Double,
      beta: Double,
      phi: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    require(phi > 0 && phi <= 1, s"phi in (0,1], got $phi")
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false),
      StructField("forecast", DoubleType, nullable = false)))
    val prepared = df
      .select(Seq(col(key).as("__k"), value.cast("double").as("__y")) ++
        order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__y"))
    val omA = 1 - alpha; val omB = 1 - beta
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private var l = 0.0
        private var b = 0.0
        private var pending: Row = null

        private def emit(): Row = Row(cur, n, l, b, l + phi * b)

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val y = r.getDouble(1)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; n = 1L; l = y; b = 0.0
              if (done != null) { pending = done; return true }
            } else {
              val lNew = alpha * y + omA * (l + phi * b)
              b = beta * (lNew - l) + omB * (phi * b)
              l = lNew
              n += 1
            }
          }
          if (has) { pending = emit(); has = false; return true }
          false
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r5 = pending; pending = null; r5
        }
      }
    }(Encoders.row(out))
  }

  /** Simple-exponential-smoothing MODEL SELECTION per series: run the
    * SES recurrence l = a*y + (1-a)*l simultaneously for every alpha
    * in a pinned dyadic grid, accumulating the one-step-ahead SSE
    * (e_t = y_t - l_{t-1}, from the second observation), and pick the
    * argmin (ties to the smaller alpha). The hyperparameter sweep a
    * forecasting pipeline runs per key — in ONE secondary-sort pass
    * with O(|grid|) state, not |grid| passes. Dyadic alphas keep both
    * engines' recurrences bit-identical, each SSE is the same
    * sequential fold of identical doubles on both engines, and the
    * argmin compares those identical doubles — so a recursive-CTE
    * oracle carrying one (level, sse) pair per alpha replays the
    * selection exactly. Output: (key, n, best_alpha, sse_best). */
  def sesGrid(
      df: DataFrame,
      key: String,
      order: Seq[Column],
      value: Column,
      alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas == alphas.sorted &&
      alphas.distinct == alphas,
      s"alphas must be a sorted distinct grid, got $alphas")
    alphas.foreach(a => require(a > 0 && a <= 1, s"alpha in (0,1]: $a"))
    val keyType = df.schema(key).dataType
    val out = StructType(Seq(
      StructField(key, keyType),
      StructField("n", LongType, nullable = false),
      StructField("best_alpha", DoubleType, nullable = false),
      StructField("sse_best", DoubleType, nullable = false)))
    val as = alphas.toArray
    val prepared = df
      .select(Seq(col(key).as("__k"), value.cast("double").as("__y")) ++
        order: _*)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
      .select(col("__k"), col("__y"))
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private val g = as.length
        private var cur: Any = null
        private var has = false
        private var n = 0L
        private val lvl = new Array[Double](g)
        private val sse = new Array[Double](g)
        private var pending: Row = null

        private def emit(): Row = {
          var best = 0
          var i = 1
          while (i < g) { // strict <: ties keep the smaller alpha
            if (sse(i) < sse(best)) best = i
            i += 1
          }
          Row(cur, n, as(best), sse(best))
        }

        override def hasNext: Boolean = pending != null || advance()

        private def advance(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val y = r.getDouble(1)
            if (!has || k != cur) {
              val done = if (has) emit() else null
              cur = k; has = true; n = 1L
              var i = 0
              while (i < g) { lvl(i) = y; sse(i) = 0.0; i += 1 }
              if (done != null) { pending = done; return true }
            } else {
              var i = 0
              while (i < g) {
                val e = y - lvl(i)
                sse(i) += e * e
                lvl(i) = as(i) * y + (1 - as(i)) * lvl(i)
                i += 1
              }
              n += 1
            }
          }
          if (has) { pending = emit(); has = false; return true }
          false
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r4 = pending; pending = null; r4
        }
      }
    }(Encoders.row(out))
  }
}
