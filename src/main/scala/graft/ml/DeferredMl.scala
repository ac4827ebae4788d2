package graft.ml

import graft.rel.{EstimatorSpec, LinRegSpec, MinMaxSpec, ScaleSpec, StepSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lowers the algebra-level ML nodes ([[graft.rel.FitRel]] /
  * [[graft.rel.TransformRel]]) to pure DataFrame graphs — the deferred
  * counterpart of [[Pipeline]] (ref pipeline_lib.py:109-977, where the
  * pipeline is itself IR inside a build artifact).
  *
  * Everything stays INSIDE the Spark plan: each step's fit is a 1-row
  * aggregate that is broadcast-cross-joined into the frame so the next
  * step (and the final transform) read the params as columns — no
  * collect(), no driver round-trip, no side effect at lowering. The
  * model surfaces as a long `(step, param, value, blob)` table —
  * numeric params in `value`, serialized estimator models as base64 in
  * `blob` — so fitted models cache/build/exchange like any relation.
  *
  * Scale: a K-step fit is K map-side-combined aggregates over the
  * (progressively transformed) training frame plus K one-row broadcast
  * joins — the same pass structure as the eager [[Pipeline]], with the
  * driver removed from the data path. An [[EstimatorSpec]]'s aggregate
  * buffers its whole group (the black-box-fit contract, see
  * [[Estimator]]); the closed-form steps stay streaming.
  */
object DeferredMl {

  /** Stable step identity used in the model table and as the param
    * column prefix. */
  def stepName(s: StepSpec, i: Int): String = s match {
    case ScaleSpec(in, out) => s"$i:scale($in->$out)"
    case MinMaxSpec(in, out) => s"$i:minmax($in->$out)"
    case LinRegSpec(x, y, out) => s"$i:linreg($y~$x->$out)"
    case EstimatorSpec(e, fs, y, out) =>
      s"$i:est($e:$y~${fs.mkString("+")}->$out)"
  }

  private def paramNames(s: StepSpec): Seq[String] = s match {
    case _: ScaleSpec => Seq("mu", "sigma")
    case _: MinMaxSpec => Seq("min", "max")
    case _: LinRegSpec => Seq("slope", "intercept")
    case _: EstimatorSpec => Seq("model")
  }

  private def pcol(i: Int, p: String): String = s"__p${i}_$p"

  private def resolve(name: String,
      catalog: graft.udf.FunctionCatalog): Estimator =
    catalog.estimators.getOrElse(name, Estimators.builtin(name).getOrElse(
      throw new IllegalArgumentException(
        s"estimator '$name' not in the function catalog " +
          s"(registered: ${catalog.estimators.keys.toSeq.sorted.mkString(", ")}" +
          s"; builtin: ${Estimators.builtinNames.mkString(", ")})")))

  /** 1-row wide aggregate of step `i`'s params over `df`. */
  private def fitAgg(df: DataFrame, s: StepSpec, i: Int,
      catalog: graft.udf.FunctionCatalog): DataFrame =
    s match {
      case ScaleSpec(in, _) => df.agg(
        avg(col(in)).as(pcol(i, "mu")),
        stddev_samp(col(in)).as(pcol(i, "sigma")))
      case MinMaxSpec(in, _) => df.agg(
        min(col(in)).cast("double").as(pcol(i, "min")),
        max(col(in)).cast("double").as(pcol(i, "max")))
      // backquoted like Pipeline.LinearRegression: raw splicing
      // parse-fails on names with spaces/hyphens (ADVICE r3)
      case LinRegSpec(x, y, _) => df.agg(
        expr(s"regr_slope(`$y`, `$x`)").as(pcol(i, "slope")),
        expr(s"regr_intercept(`$y`, `$x`)").as(pcol(i, "intercept")))
      case EstimatorSpec(e, fs, y, _) => df.agg(
        base64(EstimatorOps.fitColumn(resolve(e, catalog), fs, y))
          .as(pcol(i, "model")))
    }

  /** Add step `i`'s output column, reading params from the broadcast
    * param columns already joined into `df`. Degenerate denominators
    * follow the sklearn conventions [[Pipeline]] uses: zero/NaN sigma
    * and zero min-max range scale by 1, so constant columns center
    * instead of dissolving into NULLs. */
  private def applyStep(df: DataFrame, s: StepSpec, i: Int,
      catalog: graft.udf.FunctionCatalog): DataFrame =
    s match {
      case ScaleSpec(in, out) =>
        val sig = col(pcol(i, "sigma"))
        val safe = when(sig.isNull || sig === 0.0 || isnan(sig), lit(1.0))
          .otherwise(sig)
        df.withColumn(out, (col(in) - col(pcol(i, "mu"))) / safe)
      case MinMaxSpec(in, out) =>
        val range = col(pcol(i, "max")) - col(pcol(i, "min"))
        val safe = when(range.isNull || range === 0.0, lit(1.0))
          .otherwise(range)
        df.withColumn(out, (col(in) - col(pcol(i, "min"))) / safe)
      case LinRegSpec(x, _, out) =>
        df.withColumn(out,
          col(pcol(i, "intercept")) + col(pcol(i, "slope")) * col(x))
      case EstimatorSpec(e, fs, _, out) =>
        df.withColumn(out, EstimatorOps.predictColumn(
          resolve(e, catalog), col(pcol(i, "model")), fs))
    }

  /** Lower a fit: the lazy long model table (step, param, value, blob). */
  def fit(train: DataFrame, steps: Seq[StepSpec],
      catalog: graft.udf.FunctionCatalog =
        graft.udf.FunctionCatalog.empty): DataFrame = {
    var cur = train
    val parts = steps.zipWithIndex.map { case (s, i) =>
      val wide = fitAgg(cur, s, i, catalog)
      cur = applyStep(cur.crossJoin(broadcast(wide)), s, i, catalog)
        .drop(paramNames(s).map(pcol(i, _)): _*)
      s match {
        case _: EstimatorSpec =>
          wide.select(lit(stepName(s, i)).as("step"),
            lit("model").as("param"),
            lit(null).cast("double").as("value"),
            col(pcol(i, "model")).as("blob"))
        case _ =>
          wide.select(lit(stepName(s, i)).as("step"),
            explode(map(paramNames(s).flatMap(p =>
              Seq(lit(p), col(pcol(i, p)))): _*)).as(Seq("param", "value")))
            .withColumn("blob", lit(null).cast("string"))
      }
    }
    parts.reduce(_ unionByName _)
  }

  /** Lower a transform: pivot the long model back to one wide row
    * (statically, from the specs), broadcast it in, apply each step. */
  def transform(input: DataFrame, model: DataFrame,
      steps: Seq[StepSpec],
      catalog: graft.udf.FunctionCatalog =
        graft.udf.FunctionCatalog.empty): DataFrame = {
    val aggCols = steps.zipWithIndex.flatMap { case (s, i) =>
      val cell: String => org.apache.spark.sql.Column = s match {
        case _: EstimatorSpec => _ => col("blob")
        case _ => _ => col("value")
      }
      paramNames(s).map(p =>
        max(when(col("step") === stepName(s, i) && col("param") === p,
          cell(p))).as(pcol(i, p)))
    }
    val wide = model.agg(aggCols.head, aggCols.tail: _*)
    val applied = steps.zipWithIndex.foldLeft(
      input.crossJoin(broadcast(wide))) { case (d, (s, i)) =>
      applyStep(d, s, i, catalog)
    }
    steps.zipWithIndex.foldLeft(applied) { case (d, (s, i)) =>
      d.drop(paramNames(s).map(pcol(i, _)): _*)
    }
  }
}

/** Builtin estimators resolvable WITHOUT catalog registration, so a
  * deserialized plan naming one runs anywhere (user estimators still
  * come through the FunctionCatalog, like UDXFs). */
object Estimators {
  private val logRegName = """logreg_gd\((\d+),([0-9.eE+-]+)\)""".r
  private val ridgeName = """ridge\(([0-9.eE+-]+)\)""".r
  private val kmeansName = """kmeans\((\d+),(\d+)\)""".r
  private val gbc2Name = """gbc2\(([0-9.eE+-]+)\)""".r
  private val rfName = """rf\((\d+),(-?\d+)\)""".r
  private val rf2Name = """rf2\((\d+),(\d+),(-?\d+)\)""".r
  def builtin(name: String): Option[Estimator] = name match {
    case rfName(t, s) => Some(BaggedStumps(t.toInt, s.toLong))
    case rf2Name(t, m, s) =>
      Some(RandomForestStumps(t.toInt, m.toInt, s.toLong))
    case GaussianNB.name => Some(GaussianNB)
    case MultinomialNB.name => Some(MultinomialNB)
    case logRegName(it, lr) =>
      Some(LogisticRegressionGD(it.toInt, lr.toDouble))
    case ridgeName(a) => Some(RidgeRegression(a.toDouble))
    case kmeansName(kk, it) => Some(KMeansEstimator(kk.toInt, it.toInt))
    case gbc2Name(lr) => Some(GradientBoostedClassifier2(lr.toDouble))
    case CartClassifier2.name => Some(CartClassifier2)
    case _ => None
  }
  val builtinNames: Seq[String] =
    Seq(GaussianNB.name, MultinomialNB.name, "logreg_gd(I,LR)",
      "ridge(ALPHA)", "kmeans(K,I)", "gbc2(LR)", CartClassifier2.name,
      "rf(TREES,SEED)", "rf2(TREES,MTRY,SEED)")
}
