package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  private def uniq = concat(col("l_orderkey"), lit("_"),
    col("l_linenumber"))

  test("equals the window formulation exactly") {
    val got = TopK.perKey(lineitem, col("l_returnflag"),
        col("l_extendedprice"), uniq, k = 7)
      .orderBy("key", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getString(3))).toSeq
    val want = lineitem
      .select(col("l_returnflag").as("key"),
        col("l_extendedprice").as("value"), uniq.as("tiebreak"))
      .withColumn("rank", row_number().over(Window.partitionBy("key")
        .orderBy(col("value").desc, col("tiebreak"))))
      .filter(col("rank") <= 7)
      .select("key", "rank", "value", "tiebreak")
      .orderBy("key", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getString(3))).toSeq
    assert(got === want)
  }

  test("partition-count independent") {
    val s = spark
    import s.implicits._
    val df = (0 until 5000)
      .map(i => (s"k${i % 7}", (i * 37 % 101).toDouble, s"id$i"))
      .toDF("k", "v", "id")
    val a = TopK.perKey(df.repartition(3), col("k"), col("v"), col("id"), 5)
      .orderBy("key", "rank").collect().toSeq
    val b = TopK.perKey(df.repartition(17), col("k"), col("v"), col("id"), 5)
      .orderBy("key", "rank").collect().toSeq
    assert(a === b)
  }

  test("groups smaller than k return all rows, ranked") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 3.0, "x"), ("a", 1.0, "y"), ("b", 9.0, "z"))
      .toDF("k", "v", "id")
    val out = TopK.perKey(df, col("k"), col("v"), col("id"), 10)
      .orderBy("key", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(3)))
    assert(out.toSeq === Seq(("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")))
  }

  test("partial aggregation bounds the exchange (plan has two agg phases)") {
    val out = TopK.perKey(lineitem, col("l_returnflag"),
      col("l_extendedprice"), uniq, 5)
    val plan = out.queryExecution.executedPlan.toString
    // ObjectHashAggregate partial + final around one exchange — i.e. the
    // map side already truncated to k before the shuffle
    assert(plan.split("ObjectHashAggregate").length >= 3, plan.take(500))
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }
}
