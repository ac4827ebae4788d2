package graft.functions

import graft.SparkSpec
import graft.ops.VectorSim
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("native codegen cosine equals the HOF formulation bit-for-bit " +
    "on real embeddings") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = emb.limit(50).select(col("vec_id").as("a_id"),
        col("embedding").as("a"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("b_id"),
        col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    val both = pairs.select(
      VectorSim.cosine(col("a"), col("b")).as("hof"),
      expr("graft_cosine(a, b)").as("native")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"hof=${r.getDouble(0)} native=${r.getDouble(1)}")
    }
  }

  test("native cosine is NULL for ragged lengths and zero-norm vectors " +
    "— matching the HOF path (no NaN ranking poison)") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |   array(CAST(1.0 AS FLOAT))),
        |  (array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |   array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))
        |AS t(a, b)""".stripMargin)
    val rows = df.select(expr("graft_cosine(a, b)").as("native"),
      VectorSim.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0),
        s"native must be NULL for degenerate inputs, got ${r.get(0)}")
      assert(r.isNullAt(1), "HOF reference must agree (NULL)")
    }
  }

  test("native cosine rejects non-float-array inputs at analysis") {
    GraftFunctions.register(spark)
    val bad = spark.range(1).selectExpr("array(1, 2) AS a", "array(3, 4) AS b")
    intercept[Exception] { bad.selectExpr("graft_cosine(a, b)").collect() }
  }

  test("native cosine stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // codegen'd stages print with a "*(n)" prefix in the plan string
    val plan = emb.selectExpr("graft_cosine(embedding, embedding) AS c")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("micro-benchmark: native is not slower than the interpreted HOF") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(broadcast(emb.limit(20)
        .select(col("vec_id").as("b_id"), col("embedding").as("b"))))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths
    pairs.select(sum(expr("graft_cosine(a, b)"))).collect()
    pairs.select(sum(VectorSim.cosine(col("a"), col("b")))).collect()
    val native = time(pairs.select(sum(expr("graft_cosine(a, b)"))).collect())
    val hof = time(
      pairs.select(sum(VectorSim.cosine(col("a"), col("b")))).collect())
    info(f"native=$native%.3fs hof=$hof%.3fs speedup=${hof / native}%.1fx")
    assert(native <= hof * 1.5, f"native $native%.3f vs hof $hof%.3f")
  }
}
