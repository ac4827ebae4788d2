package graft.functions

import graft.SparkSpec
import graft.ops.VectorSim
import org.apache.spark.sql.functions._

class PqEncodeSpec extends SparkSpec {

  private def books(m: Int, ksub: Int, dsub: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, ksub, dsub) { (s, c, d) =>
      math.sin(s * 31 + c * 7 + d * 3 + 1).abs * (if (c % 2 == 0) 1 else -1)
    }

  test("native PQ encode equals the HOF formulation bit-for-bit on " +
    "real embeddings, across subspace shapes") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("vec")).limit(200)
    for ((m, ksub) <- Seq((4, 8), (8, 16), (16, 4))) {
      val bk = books(m, ksub, 64 / m)
      val both = emb.select(
        VectorSim.pqEncodeHof(col("vec"), bk).as("hof"),
        VectorSim.pqEncode(col("vec"), bk, native = true).as("nat"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1),
          s"m=$m ksub=$ksub: hof=${r.getSeq[Int](0)} nat=${r.getSeq[Int](1)}")
      }
    }
  }

  test("native PQ LUT equals the HOF formulation bit-for-bit on real " +
    "embeddings") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").as("vec")).limit(200)
    val bk = books(8, 16, 8)
    val both = emb.select(
      VectorSim.pqLutHof(col("vec"), bk).as("hof"),
      VectorSim.pqLut(col("vec"), bk, native = true).as("nat"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val h = r.getSeq[scala.collection.Seq[Double]](0)
      val n = r.getSeq[scala.collection.Seq[Double]](1)
      assert(h.size == n.size)
      h.zip(n).zipWithIndex.foreach { case ((hs, ns), s) =>
        hs.zip(ns).zipWithIndex.foreach { case ((hd, nd), c) =>
          assert(java.lang.Double.doubleToLongBits(hd) ==
            java.lang.Double.doubleToLongBits(nd),
            s"s=$s c=$c: hof=$hd nat=$nd")
        }
      }
    }
  }

  test("edge semantics match the HOF chain: null array / null element " +
    "/ empty / ragged / NaN / zero vector") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val bk = books(2, 4, 2) // expects dim 4
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)), // clean
      (2L, Seq[java.lang.Double](1.0, null, 3.0, 4.0)), // null element
      (3L, Seq.empty[java.lang.Double]), // empty
      (4L, Seq[java.lang.Double](1.0, 2.0, 3.0)), // ragged: subspace 1 short
      (5L, Seq[java.lang.Double](Double.NaN, 1.0, 2.0, 3.0)), // NaN
      (6L, Seq[java.lang.Double](0.0, 0.0, 0.0, 0.0)), // zero norm
      (7L, null) // null array
    ).toDF("id", "vec")
    val got = rows.select(col("id"),
        VectorSim.pqEncodeHof(col("vec"), bk).as("hof"),
        VectorSim.pqEncode(col("vec"), bk, native = true).as("nat"),
        VectorSim.pqLutHof(col("vec"), bk).as("lhof"),
        VectorSim.pqLut(col("vec"), bk, native = true).as("lnat"))
      .collect().map(r => r.getLong(0) -> r).toMap
    got.foreach { case (id, r) =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id=$id encode: hof=${r.getSeq[Int](1)} nat=${r.getSeq[Int](2)}")
      val lh = r.getSeq[scala.collection.Seq[Double]](3).map(_.map(
        java.lang.Double.doubleToLongBits))
      val ln = r.getSeq[scala.collection.Seq[Double]](4).map(_.map(
        java.lang.Double.doubleToLongBits))
      assert(lh == ln, s"id=$id lut mismatch")
    }
    // null array / null element / empty → all-zero codes (the
    // coalesce-to-MaxValue tie broken by centroid id)
    assert(got(7L).getSeq[Int](2) == Seq(0, 0))
    assert(got(2L).getSeq[Int](2) == Seq(0, 0))
    assert(got(3L).getSeq[Int](2) == Seq(0, 0))
    // ragged: subspace 0 fully inside → a real code may be nonzero;
    // subspace 1 (elements 2..3, only one present) → code 0
    assert(got(4L).getSeq[Int](2)(1) == 0)
  }

  test("the native encode stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val bk = books(8, 16, 8)
    val plan = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(VectorSim.pqEncode(col("embedding"), bk, native = true)
        .as("codes"))
      .filter(size(col("codes")) > 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ArrayAggregate"),
      "native path must not fall back to interpreted HOFs")
  }
}
