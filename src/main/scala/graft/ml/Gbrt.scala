package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-round gradient-boosted regression over variance-reduction
  * stumps (Friedman 2001, squared loss, learning rate 1) — the
  * regression sibling of [[Boost]] on the same distributed histogram
  * shape: per-feature hash aggregations plus a model-sized split scan,
  * never a collected training frame.
  *
  * Determinism device (the Stump/Boost idea carried to regression):
  * the label is an INTEGER lattice (e.g. cents), so round-1 histogram
  * sums are exact longs; round-2 residual sums are recovered in closed
  * form from integer aggregates — Σr over a cell = Σy − cntL·mL −
  * (cnt−cntL)·mR, where cntL counts the cell's rows on split-1's left
  * — so no order-dependent double reduction ever feeds a split score,
  * and both engines rank candidates on bit-identical doubles.
  */
object Gbrt {

  final case class Split(feature: String, threshold: Double,
      leftValue: Double, rightValue: Double)
  final case class Model(r1: Split, r2: Split) {
    private def pred(s: Split): Column =
      when(col(s.feature) <= s.threshold, lit(s.leftValue))
        .otherwise(lit(s.rightValue))
    def prediction: Column = pred(r1) + pred(r2)
  }

  /** Fit on integer-lattice labels (`label` must cast exactly to
    * long). Features follow the Stump maxBins contract. */
  def fitTwo(df: DataFrame, features: Seq[String], label: Column)
      : Model = {
    val lab = df.select(
      features.map(f => col(f).cast("double").as(f)) :+
        label.cast("long").as("y"): _*).persist()
    try {
      // round 1: variance-reduction stump from exact integer sums
      def hist1(f: String) = lab
        .groupBy(col(f).as("v"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("sy"))
        .select(lit(f).as("feature"), col("v"), col("cnt"), col("sy"))
      val u1 = features.map(hist1).reduce(_ unionByName _)
      val o = Window.partitionBy("feature").orderBy("v")
      val a = Window.partitionBy("feature")
      def sq(x: Column) = x * x
      val c1 = u1
        .withColumn("nl", sum(col("cnt")).over(o))
        .withColumn("sl", sum(col("sy")).over(o))
        .withColumn("n", sum(col("cnt")).over(a))
        .withColumn("s", sum(col("sy")).over(a))
        .filter(col("nl") < col("n"))
        .withColumn("score",
          sq(col("sl").cast("double")) / col("nl") +
            sq((col("s") - col("sl")).cast("double")) /
              (col("n") - col("nl")))
      val b1 = c1.orderBy(col("score").desc, col("feature"), col("v"))
        .limit(1).collect().head
      val f1 = b1.getAs[String]("feature")
      val t1 = b1.getAs[Double]("v")
      val nl1 = b1.getAs[Long]("nl"); val sl1 = b1.getAs[Long]("sl")
      val n1 = b1.getAs[Long]("n"); val s1 = b1.getAs[Long]("s")
      val mL = sl1.toDouble / nl1
      val mR = (s1 - sl1).toDouble / (n1 - nl1)

      // round 2: residual stump; Σr per cell recovered from (cnt, Σy,
      // cntL) integer aggregates — exact, order-independent
      val isL = (col(f1) <= t1).cast("long")
      def hist2(f: String) = lab
        .groupBy(col(f).as("v"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("sy"),
          sum(isL).as("cl"))
        .select(lit(f).as("feature"), col("v"), col("cnt"), col("sy"),
          col("cl"))
      val u2 = features.map(hist2).reduce(_ unionByName _)
      val c2 = u2
        .withColumn("nl", sum(col("cnt")).over(o))
        .withColumn("syl", sum(col("sy")).over(o))
        .withColumn("cll", sum(col("cl")).over(o))
        .withColumn("n", sum(col("cnt")).over(a))
        .withColumn("sy_t", sum(col("sy")).over(a))
        .withColumn("cl_t", sum(col("cl")).over(a))
        .filter(col("nl") < col("n"))
        .withColumn("srl", col("syl").cast("double") -
          col("cll") * lit(mL) - (col("nl") - col("cll")) * lit(mR))
        .withColumn("srt", col("sy_t").cast("double") -
          col("cl_t") * lit(mL) - (col("n") - col("cl_t")) * lit(mR))
        .withColumn("score",
          sq(col("srl")) / col("nl") +
            sq(col("srt") - col("srl")) / (col("n") - col("nl")))
      val b2 = c2.orderBy(col("score").desc, col("feature"), col("v"))
        .limit(1).collect().head
      val f2 = b2.getAs[String]("feature")
      val t2 = b2.getAs[Double]("v")
      val lv = b2.getAs[Double]("srl") / b2.getAs[Long]("nl")
      val rv = (b2.getAs[Double]("srt") - b2.getAs[Double]("srl")) /
        (b2.getAs[Long]("n") - b2.getAs[Long]("nl"))
      Model(Split(f1, t1, mL, mR), Split(f2, t2, lv, rv))
    } finally lab.unpersist()
  }
}
