package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Alternating Least Squares matrix factorization
  * (Koren/Bell/Volinsky 2009; reference ML surface: arbitrary-estimator
  * contract, ml/Estimator.scala) for the rank-2 case, where each
  * per-entity normal-equation solve ((FᵀF + λI)⁻¹ Fᵀr) is a CLOSED-FORM
  * 2×2 inverse — so one ALS half-step is exactly one ratings⋈factors
  * equi-join plus one keyed aggregation of the five Gram terms
  * (Σq₁², Σq₁q₂, Σq₂², Σq₁r, Σq₂r) and a pure projection. No matrix
  * library, no driver-side factors, no per-entity collect: both factor
  * tables live as DataFrames keyed by entity, and a round is two
  * half-steps (users given items, items given users) with a
  * `localCheckpoint` lineage cut each. Pinned iteration counts unroll
  * as chained CTEs for the SQL oracle (the logreg/PageRank pattern).
  *
  * Item factors initialize deterministically from the item id
  * (q = (1, ((id % 7) − 3)/10)) so both engines start identically.
  */
object Als {

  /** Conservative per-row bytes of a rank-2 factor row (key + two
    * doubles + row overhead) for the broadcast-fit estimate below. */
  private val FactorRowBytes = 40L

  /** Broadcast-hint `factors` when its MATERIALIZED row count (cheap —
    * the caller localCheckpoints every factor relation, so counting is
    * an in-memory pass, no recompute) says the built hash relation fits
    * the session broadcast threshold (guide §3.1: the checkpointed
    * LogicalRDD leaf has no size statistics, so the planner was picking
    * SortMergeJoin and shuffling the RATINGS side once per half-step —
    * 3 Exchange → 1 with the hint, measured 0.38 → 0.30 s warm per
    * half-step at sf0.1/32c). Scale-adaptive, not local-tuned: at
    * 100 TB the entity count crosses the threshold and the join stays
    * sort-merge, which is the correct strategy there. */
  private def maybeBroadcast(factors: DataFrame, rows: Long): DataFrame = {
    val thresh = factors.sparkSession.sessionState.conf
      .autoBroadcastJoinThreshold
    if (thresh > 0 && rows * FactorRowBytes <= thresh) broadcast(factors)
    else factors
  }

  /** Fit rank-2 factors on `ratings` (columns u, i, r). Returns
    * (userFactors (u, p1, p2), itemFactors (i, q1, q2)). */
  def fit(ratings: DataFrame, lambda: Double, iters: Int)
      : (DataFrame, DataFrame) = {
    require(iters >= 1, s"als needs at least one iteration, got $iters")
    require(lambda >= 0, s"lambda must be non-negative, got $lambda")
    val r = ratings.select(col("u"), col("i"), col("r").cast("double"))
      .persist()
    var items = r.select(col("i")).distinct()
      .select(col("i"), lit(1.0).as("q1"),
        (((col("i") % 7) - 3) / lit(10.0)).cast("double").as("q2"))
      .localCheckpoint()
    // entity counts are iteration-invariant (every item/user with a
    // rating keeps a factor row), so count each side ONCE — on the
    // already-materialized checkpoint — and reuse the decision
    val itemsN = items.count()
    var users: DataFrame = null
    var usersN = -1L
    (1 to iters).foreach { _ =>
      users = halfStep(r, maybeBroadcast(items, itemsN), solveFor = "u",
        given = "i", f1 = "q1", f2 = "q2", out1 = "p1", out2 = "p2", lambda)
      if (usersN < 0) usersN = users.count()
      items = halfStep(r, maybeBroadcast(users, usersN), solveFor = "i",
        given = "u", f1 = "p1", f2 = "p2", out1 = "q1", out2 = "q2", lambda)
    }
    r.unpersist()
    (maybeBroadcast(users, usersN), maybeBroadcast(items, itemsN))
  }

  /** Training predictions (u, i, r, pred) from fitted factors. The
    * factor sides arrive broadcast-hinted from fit when they fit the
    * threshold, so the ratings side is not shuffled here either. */
  def predict(ratings: DataFrame, users: DataFrame, items: DataFrame)
      : DataFrame =
    ratings.join(users, Seq("u")).join(items, Seq("i"))
      .select(col("u"), col("i"), col("r"),
        (col("p1") * col("q1") + col("p2") * col("q2")).as("pred"))

  private def halfStep(
      ratings: DataFrame, factors: DataFrame,
      solveFor: String, given: String,
      f1: String, f2: String, out1: String, out2: String,
      lambda: Double): DataFrame = {
    val g = ratings.join(factors, Seq(given))
      .groupBy(solveFor)
      .agg(sum(col(f1) * col(f1)).as("a11"),
        sum(col(f1) * col(f2)).as("a12"),
        sum(col(f2) * col(f2)).as("a22"),
        sum(col(f1) * col("r")).as("b1"),
        sum(col(f2) * col("r")).as("b2"))
    val l = lit(lambda)
    val det: Column = (col("a11") + l) * (col("a22") + l) -
      col("a12") * col("a12")
    g.select(col(solveFor),
        (((col("a22") + l) * col("b1") - col("a12") * col("b2")) / det)
          .as(out1),
        (((col("a11") + l) * col("b2") - col("a12") * col("b1")) / det)
          .as(out2))
      .localCheckpoint()
  }
}
