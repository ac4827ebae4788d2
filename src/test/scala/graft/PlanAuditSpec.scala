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
}
