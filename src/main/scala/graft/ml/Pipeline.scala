package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deferred sklearn-style pipeline (ref expr/ml/pipeline_lib.py:
  * Step :109, FittedStep :360, Pipeline :684, FittedPipeline :977):
  * `fit` runs an AGGREGATION over the training frame producing a small
  * model row (the reference's fit-as-UDAF); `transform` applies the
  * model as scalar column expressions with the model values closed
  * over (the reference's predict-as-scalar-UDF with computed kwargs).
  *
  * Scale: fit is one map-side-combined aggregate per step — a single
  * small row to the driver; transform is a pure projection. No
  * iterative driver loops, nothing collected but the model itself.
  */
trait Step {
  def name: String
  /** One aggregation over df → fitted step. */
  def fit(df: DataFrame): FittedStep
}

trait FittedStep {
  def name: String
  /** Model parameters, serializable. */
  def params: Map[String, Double]
  /** Pure column-expression application of the model. */
  def transform(df: DataFrame): DataFrame
}

/** z-score scaling of `in` → `out` (sklearn StandardScaler analog,
  * including its zero-variance convention: sigma 0/NaN → 1, so a
  * constant column passes through centered instead of dissolving into
  * NULLs via a divide-by-zero). */
final case class StandardScaler(in: String, out: String) extends Step {
  def name = s"scale($in)"
  def fit(df: DataFrame): FittedStep = {
    val r = df.agg(count(col(in)).as("n"), avg(col(in)).as("mu"),
      stddev_samp(col(in)).as("sigma")).collect()(0)
    require(r.getLong(0) > 0,
      s"$name: cannot fit on an empty or all-null column")
    val sigmaRaw = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
    val sigma =
      if (sigmaRaw == 0.0 || sigmaRaw.isNaN) 1.0 else sigmaRaw
    FittedScaler(name, in, out, r.getDouble(1), sigma)
  }
}

final case class FittedScaler(name: String, in: String, out: String,
    mu: Double, sigma: Double) extends FittedStep {
  def params: Map[String, Double] = Map("mu" -> mu, "sigma" -> sigma)
  def transform(df: DataFrame): DataFrame =
    df.withColumn(out, (col(in) - mu) / sigma)
}

/** Closed-form simple linear regression y ~ a·x + b, fit with the
  * exact SQL aggregates (regr_slope/regr_intercept), predict as a
  * projection (fit_lib.py's deferred_fit_predict for the linear
  * case — no pickled model, the params ARE the artifact). */
final case class LinearRegression(x: String, y: String, out: String)
    extends Step {
  def name = s"linreg($y~$x)"
  def fit(df: DataFrame): FittedStep = {
    // backquoted: every other step goes through col() and survives
    // spaces/hyphens in names; raw splicing parse-failed (review)
    val r = df.agg(
      expr(s"regr_slope(`$y`, `$x`)").as("slope"),
      expr(s"regr_intercept(`$y`, `$x`)").as("intercept")).collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"$name: regression undefined — constant `$x` or no non-null " +
        "(y, x) pairs in the training frame")
    FittedLinReg(name, x, out, r.getDouble(0), r.getDouble(1))
  }
}

final case class FittedLinReg(name: String, x: String, out: String,
    slope: Double, intercept: Double) extends FittedStep {
  def params: Map[String, Double] =
    Map("slope" -> slope, "intercept" -> intercept)
  def transform(df: DataFrame): DataFrame =
    df.withColumn(out, lit(intercept) + lit(slope) * col(x))
}

/** Arbitrary-estimator step for the eager pipeline (the deferred twin
  * is [[graft.rel.EstimatorSpec]]): fit runs the whole-group
  * [[EstimatorFitAgg]] aggregation and keeps the model BYTES; transform
  * is the predict projection with the bytes closed over (the
  * reference's predict-as-scalar-UDF with the pickled model as a
  * computed kwarg, expr/udf.py:79-336). */
final case class EstimatorStep(est: Estimator, features: Seq[String],
    label: String, out: String) extends Step {
  def name = s"est(${est.name}:$label~${features.mkString("+")})"
  def fit(df: DataFrame): FittedStep = {
    val bytes = df
      .agg(EstimatorOps.fitColumn(est, features, label).as("m"))
      .collect()(0).getAs[Array[Byte]](0)
    FittedEstimator(name, est, features, out, bytes)
  }
}

final case class FittedEstimator(name: String, est: Estimator,
    features: Seq[String], out: String, model: Array[Byte])
    extends FittedStep {
  /** Opaque-model step: no scalar params (the bytes are the artifact). */
  def params: Map[String, Double] = Map.empty
  def transform(df: DataFrame): DataFrame =
    df.withColumn(out, EstimatorOps.predictColumn(est,
      lit(java.util.Base64.getEncoder.encodeToString(model)), features))
}

/** Ordered steps; fit feeds each step the output of the previous
  * fitted prefix (exactly Pipeline.fit semantics). */
final case class Pipeline(steps: Seq[Step]) {
  def fit(df: DataFrame): FittedPipeline = {
    var cur = df
    val fitted = steps.map { s =>
      val fs = s.fit(cur)
      cur = fs.transform(cur)
      fs
    }
    FittedPipeline(fitted)
  }
}

final case class FittedPipeline(steps: Seq[FittedStep]) {
  def transform(df: DataFrame): DataFrame =
    steps.foldLeft(df)((d, s) => s.transform(d))
  def params: Map[String, Map[String, Double]] =
    steps.map(s => s.name -> s.params).toMap
}

/** Deferred regression/classification metrics as plain aggregates
  * (ref expr/ml/metrics.py:513 — metric-as-UDAF; here metric-as-
  * aggregate-expression, exact and distributed). */
object Metrics {
  def mse(df: DataFrame, y: String, pred: String): DataFrame =
    df.agg(avg(pow(col(y) - col(pred), 2)).as("mse"))

  def mae(df: DataFrame, y: String, pred: String): DataFrame =
    df.agg(avg(abs(col(y) - col(pred))).as("mae"))

  /** The tp/fp/fn/tn cell aggregate — single source of truth for every
    * counts-derived metric below. Coalesced so an EMPTY cohort yields
    * a zero matrix, not a row of NULLs. */
  private def confusionCell(y: String, pred: String)(
      yv: Int, pv: Int): Column =
    coalesce(sum(when(col(y) === yv && col(pred) === pv, 1L)
      .otherwise(0L)), lit(0L))

  /** Binary cross-entropy aggregate with sklearn's 1e-15 probability
    * clipping so a hard 0/1 score cannot produce ±inf. NULL on an
    * empty cohort (the mean of nothing is genuinely undefined). */
  private def logLossExpr(y: String, prob: String): Column = {
    val eps = 1e-15
    val p = least(greatest(col(prob).cast("double"), lit(eps)),
      lit(1.0 - eps))
    avg(-(col(y).cast("double") * log(p) +
      (lit(1.0) - col(y).cast("double")) * log(lit(1.0) - p)))
  }

  /** Binary confusion counts (tp/fp/fn/tn) in one aggregate pass —
    * the exact-integer face of [[classification]] (ref metrics.py
    * confusion outputs). Empty input → all zeros. */
  def confusion(df: DataFrame, y: String, pred: String): DataFrame = {
    val n = confusionCell(y, pred) _
    df.agg(n(1, 1).as("tp"), n(0, 1).as("fp"),
      n(1, 0).as("fn"), n(0, 0).as("tn"))
  }

  /** Binary log loss in one aggregate pass (ref metrics.py log_loss).
    * `prob` is P(y=1). */
  def logLoss(df: DataFrame, y: String, prob: String): DataFrame =
    df.agg(logLossExpr(y, prob).as("log_loss"))

  /** Confusion counts AND log loss in ONE aggregate pass over the
    * cohort — for callers that want both without scanning twice. */
  def confusionWithLogLoss(df: DataFrame, y: String, pred: String,
      prob: String): DataFrame = {
    val n = confusionCell(y, pred) _
    df.agg(n(1, 1).as("tp"), n(0, 1).as("fp"),
      n(1, 0).as("fn"), n(0, 0).as("tn"),
      logLossExpr(y, prob).as("log_loss"))
  }

  /** Binary-classification counts-derived metrics in ONE aggregate pass
    * (ref metrics.py:513-669): accuracy, precision, recall, f1 over an
    * integer 0/1 label and 0/1 prediction. Degenerate denominators
    * (no predicted / no actual positives) yield NULL, not a crash. */
  def classification(df: DataFrame, y: String, pred: String): DataFrame = {
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / den)
    confusion(df, y, pred).select(
      ratio(col("tp") + col("tn"),
        col("tp") + col("tn") + col("fp") + col("fn")).as("accuracy"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"))
      .withColumn("f1",
        when(col("precision").isNull || col("recall").isNull ||
          col("precision") + col("recall") === 0.0,
          lit(null).cast("double"))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }

  /** ROC AUC via the rank-sum (Mann–Whitney) identity with midranks —
    * exactly the trapezoid-over-the-curve value with ties handled (the
    * reference's deferred_roc_auc builds the curve; the identity needs
    * no curve materialization). Shape: groupBy(score) collapses the
    * input to DISTINCT scores (one map-side-combined shuffle); the
    * cumulative count over score order is then the distributed
    * bucket-offset prefix sum (ops/Positional.withCumSum) — per-bucket
    * windows plus a broadcast of ≤32 bucket totals — so a
    * CONTINUOUS-score corpus (distinct-score relation ≈ corpus-sized)
    * never lands on a single-partition global window. */
  def rocAuc(df: DataFrame, y: String, score: String): DataFrame = {
    val g = df.groupBy(col(score).as("__sc"))
      .agg(count(lit(1)).as("__n"), sum(col(y)).as("__np"))
    val ranked = graft.ops.Positional.withCumSum(
      g, Seq(col("__sc")), col("__n"), "__cum")
    ranked.agg(
      sum(col("__np") * (col("__cum") + (col("__n") + 1) / lit(2.0)))
        .as("__rpos"),
      sum(col("__np")).as("__p"), sum(col("__n")).as("__tot"))
      .select(
        when(col("__p") === 0 || col("__tot") === col("__p"),
          lit(null).cast("double"))
          .otherwise((col("__rpos") - col("__p") * (col("__p") + 1) / 2.0)
            / (col("__p") * (col("__tot") - col("__p")))).as("auc"))
  }

  /** Average precision — the area under the precision–recall curve by
    * the step interpolation sklearn's `average_precision_score` uses:
    * AP = Σ_thresholds (R_t − R_prev) · P_t over DESCENDING score
    * thresholds. Same distributed shape as [[rocAuc]]: collapse to
    * distinct scores (one map-side-combined shuffle), then ONE
    * bucket-offset pass (Positional.withCumSums, both cumulative
    * counts share the exchange) turns each distinct score s into
    * tp(s) = P − cumPos(<s) and n_pred(s) = N − cum(<s) — no global
    * window anywhere, so a continuous-score corpus stays distributed.
    * NULL when the input has no positives. */
  def averagePrecision(df: DataFrame, y: String, score: String): DataFrame = {
    val g = df.groupBy(col(score).as("__sc"))
      .agg(count(lit(1)).as("__n"), sum(col(y)).as("__np"))
    val c = graft.ops.Positional.withCumSums(
      g, Seq(col("__sc")),
      Seq(col("__n") -> "__cn", col("__np") -> "__cp"))
    val tot = g.agg(sum(col("__n")).as("__tot"), sum(col("__np")).as("__p"))
    c.crossJoin(broadcast(tot))
      .select(col("__np"), col("__p"),
        (col("__p") - col("__cp")).as("__tp"),
        (col("__tot") - col("__cn")).as("__npred"))
      .agg(sum(
        when(col("__p") === 0, lit(null).cast("double"))
          .otherwise((col("__np").cast("double") / col("__p")) *
            (col("__tp").cast("double") / col("__npred"))))
        .as("ap"))
  }

  /** mse + mae + r2 in one pass (single aggregate). */
  def regression(df: DataFrame, y: String, pred: String): DataFrame = {
    val stats = df.agg(
      avg(pow(col(y) - col(pred), 2)).as("mse"),
      avg(abs(col(y) - col(pred))).as("mae"),
      sum(pow(col(y) - col(pred), 2)).as("ssr"),
      var_pop(col(y)).as("vy"),
      var_pop(col(y) - col(pred)).as("vres"),
      max(abs(col(y) - col(pred))).as("max_err"),
      count(lit(1)).as("n"))
    stats.select(col("mse"), col("mae"),
      (lit(1.0) - col("ssr") / (col("vy") * col("n"))).as("r2"),
      sqrt(col("mse")).as("rmse"),
      // sklearn explained_variance_score: 1 − Var(y−ŷ)/Var(y)
      (lit(1.0) - col("vres") / col("vy")).as("explained_variance"),
      col("max_err"))
  }
}

/** K-fold cross-validation on deterministic hash folds (ref
  * expr/ml/cross_validation.py): fold i tests on bucket==i, trains on
  * the rest. Returns (fold, mse) rows. */
object CrossVal {
  def crossValMse(
      df: DataFrame,
      keys: Seq[String],
      pipeline: Pipeline,
      y: String,
      pred: String,
      k: Int,
      seed: Long = 42L,
      portable: Boolean = false): Seq[(Int, Double)] = {
    // persisted: every fold runs one fit-collect per step plus the
    // scoring aggregate — without this the full input lineage (scan +
    // fold hashing) re-executes ~3k times (review-caught)
    val tagged = df.withColumn("__fold",
      if (portable) Splits.bucketMd5(keys.map(col), k, seed)
      else Splits.bucketFast(keys.map(col), k, seed))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until k).map { i =>
        val train = tagged.filter(col("__fold") =!= i)
        val test = tagged.filter(col("__fold") === i)
        val fitted = pipeline.fit(train)
        val scored = fitted.transform(test)
        val m = Metrics.mse(scored, y, pred).collect()(0).getDouble(0)
        (i, m)
      }
    } finally tagged.unpersist(false)
  }
}
