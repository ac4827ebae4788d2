package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: pre-bucketing both sides of a recurring
  * join on the join key removes the per-query shuffle entirely — the
  * SURVEY §2/§4 "co-located joins via bucketing" design point, asserted
  * on the physical plan. */
class BucketingSpec extends SparkSpec {

  test("a join of two tables bucketed on the join key plans with NO " +
    "shuffle exchange") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_bucketed_").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    // disable auto-broadcast so a shuffle would otherwise be required
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      // the JOIN subtree must read bucket-aligned with no exchange (a
      // later groupBy on another key shuffles legitimately)
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n$physical")
      assert(joined.groupBy("o_orderstatus")
        .agg(sum(col("l_quantity")).as("q")).count() == 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
