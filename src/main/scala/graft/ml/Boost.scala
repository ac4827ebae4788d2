package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-round AdaBoost over distributed decision stumps (Freund &
  * Schapire 1997) — boosting on the same histogram-aggregation fit
  * shape as [[Stump]]: the training frame is never collected; each
  * round is per-feature hash aggregations plus a model-sized split
  * scan.
  *
  * The key determinism device: after round 1 every row's boost weight
  * takes exactly ONE of two values (e^α for misclassified, e^{−α} for
  * correct), so round-2 weighted histograms aggregate INTEGER counts
  * split by round-1 correctness and apply the two weight constants in
  * a closed-form expression — weighted sums are a deterministic
  * function of exact integers, never an order-dependent double
  * reduction. That is what lets the full boosted fit be hash-checked
  * against a windowed SQL oracle (the Stump score-quantization idea
  * carried through the weighted round).
  */
object Boost {

  final case class Round(feature: String, threshold: Double,
      predLeft: Int, predRight: Int, alpha: Double)
  final case class Model(r1: Round, r2: Round) {
    def h(r: Round): Column =
      when(col(r.feature) <= r.threshold, lit(r.predLeft))
        .otherwise(lit(r.predRight))
    /** Ensemble margin sign: α₁(2h₁−1) + α₂(2h₂−1) ≥ 0 → class 1. */
    def prediction: Column =
      when(lit(r1.alpha) * (h(r1) * 2 - 1) +
        lit(r2.alpha) * (h(r2) * 2 - 1) >= 0, 1).otherwise(0)
  }

  /** Fit two boosted stumps on integer-binned features (the Stump
    * maxBins contract applies). `label` must be 0/1. */
  def fitTwo(df: DataFrame, features: Seq[String], label: Column,
      maxBins: Int = 256): Model = {
    val lab = df.select(
      features.map(f => col(f).cast("double").as(f)) :+
        label.cast("int").as("y"): _*).persist()
    try {
      val m1 = Stump.fit(lab, features, col("y"), maxBins)
      val h1 = when(col(m1.feature) <= m1.threshold, lit(m1.predLeft))
        .otherwise(lit(m1.predRight))
      val tagged = lab.withColumn("ok", (h1 === col("y")).cast("int"))
        .persist()
      try {
        val st = tagged.agg(count(lit(1)).as("n"),
          sum(lit(1) - col("ok")).as("mis")).collect().head
        val n = st.getLong(0)
        val mis = st.getLong(1)
        require(mis > 0 && 2 * mis < n,
          s"AdaBoost round-1 error $mis/$n is degenerate (0 or >= 1/2)")
        val eps1 = mis.toDouble / n
        val alpha1 = 0.5 * math.log((1 - eps1) / eps1)
        val wMis = math.exp(alpha1)
        val wOk = math.exp(-alpha1)

        // weighted split search: per-feature histograms of the four
        // INTEGER masses (ok/mis × count/positive), cumulated by
        // threshold, weights applied as a closed-form expression
        val perFeature = features.map { f =>
          tagged.groupBy(col(f).as("v")).agg(
              sum(col("ok")).as("co"),
              sum(lit(1) - col("ok")).as("cm"),
              sum(col("y") * col("ok")).as("po"),
              sum(col("y") * (lit(1) - col("ok"))).as("pm"))
            .select(lit(f).as("feature"), col("v"),
              col("co"), col("cm"), col("po"), col("pm"))
        }
        val u = perFeature.reduce(_ unionByName _)
        val wOrd = Window.partitionBy("feature").orderBy("v")
        val wAll = Window.partitionBy("feature")
        val cum = u
          .withColumn("col_", sum(col("co")).over(wOrd))
          .withColumn("cml", sum(col("cm")).over(wOrd))
          .withColumn("pol", sum(col("po")).over(wOrd))
          .withColumn("pml", sum(col("pm")).over(wOrd))
          .withColumn("cot", sum(col("co")).over(wAll))
          .withColumn("cmt", sum(col("cm")).over(wAll))
          .withColumn("pot", sum(col("po")).over(wAll))
          .withColumn("pmt", sum(col("pm")).over(wAll))
        val wM = lit(wMis)
        val wO = lit(wOk)
        def wsum(m: Column, o: Column): Column =
          m.cast("double") * wM + o.cast("double") * wO
        val weighted = cum
          .filter(col("cml") + col("col_") < col("cmt") + col("cot"))
          .withColumn("wl", wsum(col("cml"), col("col_")))
          .withColumn("wpl", wsum(col("pml"), col("pol")))
          .withColumn("wn", wsum(col("cmt"), col("cot")))
          .withColumn("wp", wsum(col("pmt"), col("pot")))
          .withColumn("wr", col("wn") - col("wl"))
          .withColumn("wpr", col("wp") - col("wpl"))
        def sq(x: Column): Column = x * x
        val scored = weighted.withColumn("score_u",
          round(((sq(col("wpl")) + sq(col("wl") - col("wpl"))) / col("wl")
            + (sq(col("wpr")) + sq(col("wr") - col("wpr"))) / col("wr"))
            * lit(1e6) / col("wn") + lit(1e-9)).cast("long"))
        val best = scored
          .orderBy(col("score_u").desc, col("feature"), col("v"))
          .limit(1).collect().head
        val f2 = best.getAs[String]("feature")
        val thr2 = best.getAs[Double]("v")
        val predL2 = if (2 * best.getAs[Double]("wpl") >
          best.getAs[Double]("wl")) 1 else 0
        val predR2 = if (2 * best.getAs[Double]("wpr") >
          best.getAs[Double]("wr")) 1 else 0

        // round-2 weighted error, again from integer counts × weights
        val h2 = when(col(f2) <= thr2, lit(predL2)).otherwise(lit(predR2))
        val e2 = tagged.agg(
          sum(when(h2 =!= col("y") && col("ok") === 0, 1)
            .otherwise(0)).as("m2m"),
          sum(when(h2 =!= col("y") && col("ok") === 1, 1)
            .otherwise(0)).as("m2o")).collect().head
        val eps2 = (e2.getLong(0) * wMis + e2.getLong(1) * wOk) /
          (mis * wMis + (n - mis) * wOk)
        require(eps2 > 0 && eps2 < 0.5,
          s"AdaBoost round-2 weighted error $eps2 is degenerate")
        val alpha2 = 0.5 * math.log((1 - eps2) / eps2)
        Model(
          Round(m1.feature, m1.threshold, m1.predLeft, m1.predRight,
            alpha1),
          Round(f2, thr2, predL2, predR2, alpha2))
      } finally tagged.unpersist()
    } finally lab.unpersist()
  }
}
