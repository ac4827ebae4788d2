package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def dim() = Seq(
    // key, attr, valid_from, valid_to (null = current)
    (1L, "a", "2026-01-01", null.asInstanceOf[String]),
    (1L, "old", "2025-06-01", "2026-01-01"), // history row
    (2L, "b", "2026-01-01", null.asInstanceOf[String]),
    (3L, "c", "2026-01-01", null.asInstanceOf[String])
  ).toDF("k", "v", "vf", "vt")
    .select(col("k"), col("v"), to_date(col("vf")).as("valid_from"),
      to_date(col("vt")).as("valid_to"))

  private def runMerge(upd: Seq[(Long, String)]) =
    Scd2.merge(dim(), upd.toDF("k", "v"), Seq("k"), Seq("v"),
        to_date(lit("2026-02-01")))
      .select(col("k"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(Long, String, String, String)].collect().toSet

  test("changed attr closes the old version and inserts a new current") {
    val out = runMerge(Seq(1L -> "a2"))
    assert(out.contains((1L, "a", "2026-01-01", "2026-02-01")))
    assert(out.contains((1L, "a2", "2026-02-01", null)))
    // untouched: history row, keys 2 and 3 still current
    assert(out.contains((1L, "old", "2025-06-01", "2026-01-01")))
    assert(out.contains((2L, "b", "2026-01-01", null)))
    assert(out.contains((3L, "c", "2026-01-01", null)))
    assert(out.size == 5)
  }

  test("identical attrs are a no-op (idempotent re-merge)") {
    val out = runMerge(Seq(2L -> "b"))
    assert(out == runMerge(Seq.empty))
  }

  test("unknown key inserts a new current row") {
    val out = runMerge(Seq(9L -> "z"))
    assert(out.contains((9L, "z", "2026-02-01", null)))
    assert(out.size == 5)
  }
}
