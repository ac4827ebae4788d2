package graft.ml

import graft.rel.{LinRegSpec, MinMaxSpec, ScaleSpec, StepSpec}
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
  * model surfaces as a long `(step, param, value)` table, so fitted
  * models cache/build/exchange like any other relation.
  *
  * Scale: a K-step fit is K map-side-combined aggregates over the
  * (progressively transformed) training frame plus K one-row broadcast
  * joins — the same pass structure as the eager [[Pipeline]], with the
  * driver removed from the data path.
  */
object DeferredMl {

  /** Stable step identity used in the model table and as the param
    * column prefix. */
  def stepName(s: StepSpec, i: Int): String = s match {
    case ScaleSpec(in, out) => s"$i:scale($in->$out)"
    case MinMaxSpec(in, out) => s"$i:minmax($in->$out)"
    case LinRegSpec(x, y, out) => s"$i:linreg($y~$x->$out)"
  }

  private def paramNames(s: StepSpec): Seq[String] = s match {
    case _: ScaleSpec => Seq("mu", "sigma")
    case _: MinMaxSpec => Seq("min", "max")
    case _: LinRegSpec => Seq("slope", "intercept")
  }

  private def pcol(i: Int, p: String): String = s"__p${i}_$p"

  /** 1-row wide aggregate of step `i`'s params over `df`. */
  private def fitAgg(df: DataFrame, s: StepSpec, i: Int): DataFrame =
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
    }

  /** Add step `i`'s output column, reading params from the broadcast
    * param columns already joined into `df`. Degenerate denominators
    * follow the sklearn conventions [[Pipeline]] uses: zero/NaN sigma
    * and zero min-max range scale by 1, so constant columns center
    * instead of dissolving into NULLs. */
  private def applyStep(df: DataFrame, s: StepSpec, i: Int): DataFrame =
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
    }

  /** Lower a fit: the lazy long model table (step, param, value). */
  def fit(train: DataFrame, steps: Seq[StepSpec]): DataFrame = {
    var cur = train
    val parts = steps.zipWithIndex.map { case (s, i) =>
      val wide = fitAgg(cur, s, i)
      cur = applyStep(cur.crossJoin(broadcast(wide)), s, i)
        .drop(paramNames(s).map(pcol(i, _)): _*)
      wide.select(lit(stepName(s, i)).as("step"),
        explode(map(paramNames(s).flatMap(p =>
          Seq(lit(p), col(pcol(i, p)))): _*)).as(Seq("param", "value")))
    }
    parts.reduce(_ unionByName _)
  }

  /** Lower a transform: pivot the long model back to one wide row
    * (statically, from the specs), broadcast it in, apply each step. */
  def transform(input: DataFrame, model: DataFrame,
      steps: Seq[StepSpec]): DataFrame = {
    val aggCols = steps.zipWithIndex.flatMap { case (s, i) =>
      paramNames(s).map(p =>
        max(when(col("step") === stepName(s, i) && col("param") === p,
          col("value"))).as(pcol(i, p)))
    }
    val wide = model.agg(aggCols.head, aggCols.tail: _*)
    val applied = steps.zipWithIndex.foldLeft(
      input.crossJoin(broadcast(wide))) { case (d, (s, i)) =>
      applyStep(d, s, i)
    }
    steps.zipWithIndex.foldLeft(applied) { case (d, (s, i)) =>
      d.drop(paramNames(s).map(pcol(i, _)): _*)
    }
  }
}
