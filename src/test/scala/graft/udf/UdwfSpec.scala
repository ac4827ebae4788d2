package graft.udf

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The spill-aware UDWF harness: ordering is Spark's external
  * (disk-spilling) sort, the harness buffers one group at a time. */
class UdwfSpec extends SparkSpec {

  private val rank = Udwf(
    partitionBy = Seq("k"), orderBy = Seq("v"),
    outName = "rnk", outType = LongType,
    evaluate = rows => rows.indices.map(i => (i + 1).toLong))

  test("skewed key: evaluator output matches the native window on a " +
    "partition holding 99% of all rows") {
    val sp = spark
    import sp.implicits._
    // key 0 dominates: the exact shape where a whole-partition
    // in-heap sort dies first at scale
    val df = (0 until 50000)
      .map(i => (if (i % 100 == 0) i % 7 + 1 else 0, i.toLong * 37 % 9973))
      .toDF("k", "v")

    val got = rank(df)
      .select(col("k"), col("v"), col("rnk"))
      .orderBy("k", "v", "rnk").collect()
    val exp = df.withColumn("rnk",
        row_number().over(Window.partitionBy("k").orderBy("v"))
          .cast("long"))
      .select(col("k"), col("v"), col("rnk"))
      .orderBy("k", "v", "rnk").collect()
    assert(got.length == exp.length)
    assert(got.toSeq == exp.toSeq)
  }

  test("the plan sorts via Spark's external sorter (spillable), not an " +
    "object-hash group materialization") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1, 10L), (1, 5L), (2, 3L)).toDF("k", "v")
    val physical = rank(df).queryExecution.executedPlan.toString
    assert(physical.contains("Sort"),
      "ordering must run in Spark's spillable sort")
    assert(!physical.contains("MapGroups"),
      "groupByKey/flatMapGroups (whole-group object agg) must be gone")
  }

  test("empty partitionBy is a GLOBAL window: one evaluation over all " +
    "rows even when the input has many partitions") {
    val sp = spark
    import sp.implicits._
    val globalRank = Udwf(
      partitionBy = Nil, orderBy = Seq("v"),
      outName = "rnk", outType = LongType,
      evaluate = rows => rows.indices.map(i => (i + 1).toLong))
    // 8 input partitions: an argless repartition() would round-robin
    // and rank per-partition instead of globally
    val df = sp.range(0, 1000, 1, 8).selectExpr("id * 37 % 9973 AS v")
    val got = globalRank(df).agg(max("rnk"), count(lit(1))).collect()(0)
    assert(got.getLong(0) == 1000L,
      s"global rank must reach n=1000, got ${got.getLong(0)}")
    assert(got.getLong(1) == 1000L)
  }

  test("array-typed partition keys group by CONTENT, not reference") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Array[Byte](1, 2), 10L), (Array[Byte](1, 2), 5L),
      (Array[Byte](3, 4), 7L))
      .toDF("k", "v")
    val byBinary = Udwf(Seq("k"), Seq("v"), "rnk", LongType,
      rows => rows.indices.map(i => (i + 1).toLong))
    val out = byBinary(df).groupBy("k").agg(max("rnk")).collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    assert(out == Map(Seq[Byte](1, 2) -> 2L, Seq[Byte](3, 4) -> 1L),
      "equal binary keys must form one group")
  }

  test("a double partition key containing 0.0 and -0.0 stays ONE group " +
    "(Spark groups them together; boxed comparison must not split)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L),
      (Double.NaN, 4L), (1.5, 5L)).toDF("k", "v")
    val byDouble = Udwf(Seq("k"), Seq("v"), "rnk", LongType,
      rows => rows.indices.map(i => (i + 1).toLong))
    val out = byDouble(df).groupBy("k").agg(max("rnk")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1))
    // three logical groups: {0.0, -0.0}, {NaN, NaN}, {1.5}
    assert(out.length == 3, s"expected 3 groups, got ${out.toSeq}")
    assert(out.collect { case (k, n) if k == 0.0 => n }.toSeq == Seq(2L))
    assert(out.collect { case (k, n) if k.isNaN => n }.toSeq == Seq(2L))
  }

  test("EvaluateAllWithRank peer ranges reproduce SQL rank() and " +
    "dense_rank() under orderBy ties") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1, "b"), (1, "a"), (1, "a"), (1, "c"), (1, "b"),
      (2, "z"), (2, "z")).toDF("k", "v")
    val sqlRank = Udwf(Seq("k"), Seq("v"), "rnk", LongType,
      UdwfMode.EvaluateAllWithRank((_, ranges) =>
        ranges.flatMap { case (s, e) => Seq.fill(e - s)((s + 1).toLong) }))
    val denseRank = Udwf(Seq("k"), Seq("v"), "drnk", LongType,
      UdwfMode.EvaluateAllWithRank((_, ranges) =>
        ranges.zipWithIndex.flatMap { case ((s, e), i) =>
          Seq.fill(e - s)((i + 1).toLong) }))
    val got = denseRank(sqlRank(df))
      .orderBy("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = df.withColumn("rnk",
        org.apache.spark.sql.functions.rank()
          .over(Window.partitionBy("k").orderBy("v")).cast("long"))
      .withColumn("drnk",
        dense_rank().over(Window.partitionBy("k").orderBy("v")).cast("long"))
      .orderBy("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("EvaluateFrame slices match a native ROWS frame window") {
    val sp = spark
    import sp.implicits._
    val df = (0 until 200).map(i => (i % 5, i.toLong, (i * 37 % 100).toDouble))
      .toDF("k", "o", "x")
    val mavg = Udwf(Seq("k"), Seq("o"), "mavg",
      org.apache.spark.sql.types.DoubleType,
      UdwfMode.EvaluateFrame(Some(-2), Some(1), frame =>
        frame.map(_.getAs[Double]("x")).sum / frame.length))
    val got = mavg(df).orderBy("k", "o").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    val exp = df.withColumn("mavg",
        avg("x").over(Window.partitionBy("k").orderBy("o")
          .rowsBetween(-2, 1)))
      .orderBy("k", "o").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && math.abs(g._3 - e._3) < 1e-9,
        s"$g != $e")
    }
  }

  test("EvaluateFrame with an empty frame slice gets an empty Seq, " +
    "not a crash") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1, 1L), (1, 2L)).toDF("k", "o")
    // frame entirely behind the partition start for row 0
    val f = Udwf(Seq("k"), Seq("o"), "n",
      LongType,
      UdwfMode.EvaluateFrame(Some(-5), Some(-3), frame => frame.length.toLong))
    val out = f(df).orderBy("o").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(0L, 0L))
  }

  test("groups with equal keys across null order values stay intact") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1, Option(2L)), (1, None), (1, Option(1L)), (2, None))
      .toDF("k", "v")
    val out = rank(df).groupBy("k").agg(max("rnk")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 3L, 2 -> 1L))
  }
}
