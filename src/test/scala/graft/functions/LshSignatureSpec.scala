package graft.functions

import graft.SparkSpec
import graft.ops.VectorSim
import org.apache.spark.sql.functions._

class LshSignatureSpec extends SparkSpec {

  test("native codegen LSH bucket equals the HOF formulation " +
    "bit-for-bit on real embeddings, across planes and tables") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("vec")).limit(200)
    for (planes <- Seq(4, 6, 16); table <- Seq(0, 3)) {
      val both = emb.select(
        VectorSim.lshBucket(col("vec"), planes, table).as("hof"),
        VectorSim.lshBucket(col("vec"), planes, table, native = true)
          .as("nat")).collect()
      assert(both.nonEmpty)
      both.foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"planes=$planes table=$table: hof=${r.getInt(0)} " +
          s"nat=${r.getInt(1)}"))
    }
  }

  test("edge semantics match the HOF WHEN/OTHERWISE chain: null " +
    "element / empty array / null array → 0; NaN dot SETS bits " +
    "(Spark NaN ordering)") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0)),
      (3L, Seq.empty[java.lang.Double]),
      (4L, Seq[java.lang.Double](Double.NaN, 1.0)),
      (5L, null)
    ).toDF("id", "vec")
    val byId = rows.select(col("id"),
        VectorSim.lshBucket(col("vec"), 4, 0).as("hof"),
        VectorSim.lshBucket(col("vec"), 4, 0, native = true).as("nat"))
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) null else Int.box(r.getInt(1))),
        (if (r.isNullAt(2)) null else Int.box(r.getInt(2))))).toMap
    byId.foreach { case (id, (h, n)) =>
      assert(h == n, s"id=$id: hof=$h native=$n")
    }
    assert(byId(2L)._2 == Int.box(0))  // null element → bucket 0
    // empty array → 0: the HOF's sequence(0,-1) null-pads → null sum
    assert(byId(3L)._2 == Int.box(0))
    // null array → 0, like the HOF chain's OTHERWISE(0)
    assert(byId(5L)._2 == Int.box(0))
  }

  test("the native bucket stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").as("vec"))
    // exchange-free projection: no AQE wrapper hiding the codegen spans
    val plan = emb.select(
        VectorSim.lshBucket(col("vec"), 8, 0, native = true).as("b"))
      .filter(col("b") >= 0)
      .queryExecution.executedPlan.toString
    // whole-stage codegen prints as "*(n)" stage prefixes
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ArrayAggregate"),
      "native path must not fall back to interpreted HOFs")
  }
}
