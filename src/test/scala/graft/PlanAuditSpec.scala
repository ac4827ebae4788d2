package graft

/** Plan-shape audit over the bench headliners: none of them may plan a
  * CartesianProduct — the non-broadcast cross-product shuffle that
  * marks an unbucketized range/theta join or a missing equi-condition
  * (the r1-era failure mode the bucketized interval/band joins exist to
  * prevent). BroadcastNestedLoopJoin over 1-row scalar aggregates is
  * the documented acceptable pattern and is NOT flagged here.
  */
class PlanAuditSpec extends SparkSpec {

  test("no bench headliner plans a CartesianProduct") {
    val offenders = SparkEntry.benchQueries.flatMap { d =>
      val df = d.fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(d.name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("no query in the FULL registry plans a CartesianProduct " +
    "(registry-wide sweep at smoke scale)") {
    // building a df can run side-effect jobs (source writes, cache
    // counts) — acceptable at sf0.001; the assertion is on the final
    // physical plan of every registered query
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        spark.catalog.clearCache()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("ml_pr_curve plans no single-partition window over the score " +
    "relation (Positional cumsum path, r7 ask #5)") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = SparkEntry.queries("ml_pr_curve")(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: logical.Window => w
    }
    assert(windows.nonEmpty, "expected the bucketed cumsum windows")
    windows.foreach { w =>
      val ordersScore = w.orderSpec.exists(_.child.references
        .exists(_.name == "score"))
      if (ordersScore)
        assert(w.partitionSpec.nonEmpty,
          s"window over score must be bucket-partitioned:\n$w")
    }
  }
}
