package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PositionalSpec extends SparkSpec {

  lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("distributed row numbers equal the single-partition window " +
    "row_number under the same total order") {
    val sortKeys = Seq(col("l_orderkey"), col("l_linenumber"))
    val dist = Positional.withRowNumber(li, sortKeys)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val window = li.select(col("l_orderkey"), col("l_linenumber"),
        row_number().over(
          Window.orderBy(col("l_orderkey"), col("l_linenumber")))
          .cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(dist == window)
  }

  test("row numbers stay correct when the input is pre-shuffled") {
    val shuffled = li.repartition(13)
    val rns = Positional.withRowNumber(shuffled,
      Seq(col("l_orderkey"), col("l_linenumber"))).select("rn")
      .collect().map(_.getLong(0)).sorted
    assert(rns.head == 1L && rns.last == li.count())
    assert(rns.length == rns.distinct.length)
  }

  test("numbering runs as a bucket-partitioned window — columnar, " +
    "no RDD serde, no global single-partition sort of the data") {
    val plan = Positional.withRowNumber(li,
      Seq(col("l_orderkey"), col("l_linenumber")))
    plan.collect() // force execution so AQE finalizes the plan
    // AdaptiveSparkPlan.toString prints Final AND Initial sections —
    // assert on the final one only
    val physical = plan.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(physical.contains("Exchange hashpartitioning(__b"),
      s"local indexing must be a bucket-partitioned window:\n$physical")
    assert(!physical.contains("ExistingRDD") &&
      !physical.contains("DeserializeToObject"),
      "row numbering must not drop to the RDD layer")
    // the only SinglePartition exchange allowed is the tiny offsets
    // prefix-sum (input = per-bucket counts), never the data itself
    val single = physical.split("\n")
      .filter(_.contains("Exchange SinglePartition"))
    assert(single.length <= 1, s"unexpected global exchanges:\n$physical")
  }

  test("row numbers stay correct under heavy first-key ties and a " +
    "tiny bucket count") {
    val sp = spark
    import sp.implicits._
    // 10k rows, only 3 distinct first keys — boundary dedup collapses
    // buckets; ties must land in ONE bucket and stay totally ordered
    // by the second key
    val df = (0 until 10000).map(i => (i % 3, i)).toDF("k", "i")
    val got = Positional.withRowNumber(df, Seq(col("k"), col("i")),
        buckets = 4)
      .orderBy("rn").collect()
    assert(got.length == 10000)
    val rns = got.map(_.getAs[Long]("rn"))
    assert(rns.head == 1L && rns.last == 10000L &&
      rns.distinct.length == 10000)
    // rn order == (k, i) lexicographic order
    val keys = got.map(r => (r.getInt(0), r.getInt(1)))
    assert(keys.sameElements(keys.sortBy(identity)))
  }

  test("pre-existing __b/__loc/__off columns survive row numbering") {
    val sp = spark
    import sp.implicits._
    val df = Seq((3, "a"), (1, "b"), (2, "c"))
      .toDF("k", "__b")
      .withColumn("__loc", col("k") * 10)
      .withColumn("__off", col("k") * 100)
    val got = Positional.withRowNumber(df, Seq(col("k"))).orderBy("rn")
      .collect()
    assert(got.map(_.getAs[String]("__b")).toSeq == Seq("b", "c", "a"),
      "user __b column must not be clobbered by the temp bucket column")
    assert(got.map(_.getAs[Int]("__loc")).toSeq == Seq(10, 20, 30))
    assert(got.map(_.getAs[Int]("__off")).toSeq == Seq(100, 200, 300))
  }

  test("positional join pairs i-th rows of two orderings") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val out = Positional.positionalJoin(
      nation.select("n_name", "n_nationkey"), Seq(col("n_nationkey")),
      region.select("r_name", "r_regionkey"), Seq(col("r_regionkey")))
    assert(out.count() == region.count()) // inner on shorter side
    val first = out.orderBy("pos").collect()(0)
    assert(first.getAs[Long]("pos") == 1L)
  }
}
