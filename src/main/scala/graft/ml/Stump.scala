package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision stump (depth-1 CART) with a fully DISTRIBUTED exact split
  * search — the opposite end of the estimator spectrum from the
  * collected-group black-box fit in [[Estimator]]: here the training
  * frame is never materialized anywhere. This is the building block
  * shape distributed tree learners (SparkML trees, XGBoost hist mode)
  * use: per-feature histogram aggregation, then a split scan over the
  * MODEL-sized histogram relation.
  *
  * Search: for each feature, one groupBy(feature value) aggregation
  * produces (count, positives) per distinct value; a running-total
  * window ordered by value turns that into left/right split stats for
  * every candidate threshold; the best split maximizes
  * sum-of-squared-class-masses (equivalently minimizes weighted Gini).
  * The windows run over per-feature histograms BOUNDED by `maxBins`
  * distinct values (loudly enforced), so the single-partition scan is
  * over a model-sized relation — the corpus itself is only touched by
  * the initial hash aggregations. Continuous features must be binned by
  * the caller first (the standard maxBins quantization every production
  * tree learner applies).
  *
  * Engine-stable argmax: the split score is quantized to integer
  * micro-units from INTEGER class counts, and ties break on
  * (feature name, threshold) — so the fitted model is deterministic and
  * cross-engine identical, which is what lets `ml_stump_fit` be
  * hash-checked against a windowed SQL oracle.
  */
object Stump {

  final case class StumpModel(
      feature: String, threshold: Double,
      nLeft: Long, posLeft: Long, nRight: Long, posRight: Long,
      scoreU: Long) {
    def predLeft: Int = if (2 * posLeft > nLeft) 1 else 0
    def predRight: Int = if (2 * posRight > nRight) 1 else 0
  }

  /** The candidate-split relation: one row per (feature, threshold)
    * with left/right counts and the quantized score. Lazy; size is
    * bounded by features.size × maxBins. */
  def splits(df: DataFrame, features: Seq[String], label: Column,
             maxBins: Int = 256): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val perFeature = features.map { f =>
      val hist = df.select(col(f).cast("double").as("v"),
          label.cast("int").as("y"))
        .na.drop()
        .groupBy("v").agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      hist.select(lit(f).as("feature"), col("v"), col("cnt"), col("pos"))
    }
    val u = perFeature.reduce(_ unionByName _)
    // histogram-cardinality guard: the window below is per-feature
    // single-partition, safe only because the relation is model-sized
    val wOrd = Window.partitionBy("feature").orderBy("v")
    val wAll = Window.partitionBy("feature")
    val c = u
      .withColumn("nbins", count(lit(1)).over(wAll))
      .withColumn("nl", sum(col("cnt")).over(wOrd))
      .withColumn("pl", sum(col("pos")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("p", sum(col("pos")).over(wAll))
    // assert_true returns NULL on success and raises otherwise, so the
    // .where is a no-op filter that still forces the cardinality check
    val checked = c.where(assert_true(col("nbins") <= maxBins,
      concat(lit("Stump: feature "), col("feature"),
        lit(s" exceeds $maxBins distinct values — bin continuous " +
          "features (e.g. round/width_bucket) before fit"))).isNull)
    // double-FIRST multiplication: counts can square past Long range at
    // corpus scale, and doing the same double math on both engines keeps
    // the quantized score bit-identical
    def sq(c: Column): Column = c.cast("double") * c.cast("double")
    checked.filter(col("nl") < col("n"))
      .withColumn("nr", col("n") - col("nl"))
      .withColumn("pr", col("p") - col("pl"))
      .select(
        col("feature"), col("v").as("threshold"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("nr").as("n_right"), col("pr").as("pos_right"),
        round(((sq(col("pl")) + sq(col("nl") - col("pl"))) / col("nl") +
            (sq(col("pr")) + sq(col("nr") - col("pr"))) / col("nr")) *
            lit(1e6) / col("n") + lit(1e-9))
          .cast("long").as("score_u"))
  }

  /** Fit: best split by (score DESC, feature, threshold). One model row
    * collected; everything before it is distributed aggregation. */
  def fit(df: DataFrame, features: Seq[String], label: Column,
          maxBins: Int = 256): StumpModel = {
    val best = splits(df, features, label, maxBins)
      .orderBy(col("score_u").desc, col("feature"), col("threshold"))
      .limit(1).collect()
    require(best.nonEmpty,
      "Stump.fit: no candidate split (empty input or single value)")
    val r = best.head
    StumpModel(r.getAs[String]("feature"), r.getAs[Double]("threshold"),
      r.getAs[Long]("n_left"), r.getAs[Long]("pos_left"),
      r.getAs[Long]("n_right"), r.getAs[Long]("pos_right"),
      r.getAs[Long]("score_u"))
  }

  /** Apply: pure per-row projection (whole-stage codegen). */
  def transform(df: DataFrame, m: StumpModel,
                predCol: String = "prediction"): DataFrame =
    df.withColumn(predCol,
      when(col(m.feature).cast("double") <= m.threshold,
        lit(m.predLeft)).otherwise(lit(m.predRight)))
}
