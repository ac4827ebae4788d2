package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("state + delta refresh equals full recompute (integer measures)") {
    val cut = "2024-06-01"
    val base = lineitem.filter(col("l_shipdate") < lit(cut))
    val delta = lineitem.filter(col("l_shipdate") >= lit(cut))
    val keys = Seq("l_returnflag", "l_linestatus")
    val ms = Seq("l_quantity")
    val state = IncrementalAgg.aggregate(base, keys, ms)
    val refreshed = IncrementalAgg.refresh(state, delta, keys, ms)
    val full = IncrementalAgg.aggregate(lineitem, keys, ms)
    assert(refreshed.exceptAll(full).isEmpty &&
      full.exceptAll(refreshed).isEmpty)
    assert(refreshed.count() === full.count())
  }

  test("multi-batch refresh is order-insensitive") {
    val keys = Seq("l_returnflag")
    val ms = Seq("l_quantity", "l_partkey")
    val parts = Seq(
      lineitem.filter(col("l_orderkey") % 3 === 0),
      lineitem.filter(col("l_orderkey") % 3 === 1),
      lineitem.filter(col("l_orderkey") % 3 === 2))
    def fold(order: Seq[Int]) = {
      val s0 = IncrementalAgg.aggregate(parts(order.head), keys, ms)
      order.tail.foldLeft(s0)((s, i) =>
        IncrementalAgg.refresh(s, parts(i), keys, ms))
    }
    val a = fold(Seq(0, 1, 2)).orderBy("l_returnflag").collect().toSeq
    val b = fold(Seq(2, 0, 1)).orderBy("l_returnflag").collect().toSeq
    assert(a === b)
  }

  test("new keys arriving only in the delta appear in the state") {
    val s = spark
    import s.implicits._
    val base = Seq(("a", 1L), ("a", 2L)).toDF("k", "v")
    val delta = Seq(("b", 10L), ("a", 3L)).toDF("k", "v")
    val state = IncrementalAgg.aggregate(base, Seq("k"), Seq("v"))
    val out = IncrementalAgg.view(
      IncrementalAgg.refresh(state, delta, Seq("k"), Seq("v")), Seq("v"))
      .orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    val aRow = out(0)
    assert(aRow.getAs[Long]("v_count") === 3L)
    assert(aRow.getAs[Long]("v_sum") === 6L)
    assert(aRow.getAs[Long]("v_min") === 1L)
    assert(aRow.getAs[Long]("v_max") === 3L)
    assert(aRow.getAs[Double]("v_avg") === 2.0)
  }

  test("merge shuffle is state-sized: delta aggregation precedes union") {
    val keys = Seq("l_returnflag")
    val state = IncrementalAgg.aggregate(
      lineitem.filter(col("l_orderkey") % 2 === 0), keys, Seq("l_quantity"))
    val refreshed = IncrementalAgg.refresh(state,
      lineitem.filter(col("l_orderkey") % 2 === 1), keys, Seq("l_quantity"))
    // two-phase: the plan aggregates the delta before the final merge —
    // the union's inputs are both aggregate outputs (partial state),
    // so every HashAggregate keyed by the group sits below/around the
    // union and none consumes raw corpus rows post-union
    val plan = refreshed.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), plan.take(300))
    assert(plan.split("HashAggregate").length >= 3, plan.take(300))
  }
}
