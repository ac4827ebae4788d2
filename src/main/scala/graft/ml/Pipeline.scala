package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
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

  /** mse + mae + r2 in one pass (single aggregate). */
  def regression(df: DataFrame, y: String, pred: String): DataFrame = {
    val stats = df.agg(
      avg(pow(col(y) - col(pred), 2)).as("mse"),
      avg(abs(col(y) - col(pred))).as("mae"),
      sum(pow(col(y) - col(pred), 2)).as("ssr"),
      var_pop(col(y)).as("vy"),
      count(lit(1)).as("n"))
    stats.select(col("mse"), col("mae"),
      (lit(1.0) - col("ssr") / (col("vy") * col("n"))).as("r2"))
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
