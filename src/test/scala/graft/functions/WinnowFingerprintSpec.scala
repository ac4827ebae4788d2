package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WinnowFingerprintSpec extends SparkSpec {

  test("native winnowing equals the explode + window-frame formulation " +
    "on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(col("text")) >= 11)
      .select(col("doc_id"), substring(lower(col("text")), 1, 160).as("tx"))
    // reference: the explode + rolling-window-min + distinct-agg shape
    val grams = docs
      .select(col("doc_id"), (length(col("tx")) - 7).as("n"), posexplode(
        transform(sequence(lit(1), length(col("tx")) - 7),
          i => md5(col("tx").substr(i, lit(8)).cast("binary")))))
      .toDF("doc_id", "n", "pos", "h")
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, 3)
    val ref = grams.withColumn("fp", min(col("h")).over(w))
      .filter(col("pos") <= col("n") - 4)
      .groupBy("doc_id")
      .agg(countDistinct(col("fp")).as("n_fp"), min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    val got = docs.select(col("doc_id"),
        call_function("graft_winnow", col("tx"), lit(8), lit(4)).as("fps"))
      .select(col("doc_id"), size(col("fps")).cast("long").as("n"),
        array_min(col("fps")).as("mn"), array_max(col("fps")).as("mx"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, v) =>
      assert(v == ref(id), s"doc $id: native=$v ref=${ref(id)}")
    }
  }

  test("supplementary-plane text grams by code point, matching " +
    "md5(substr(...)) (advisor r5)") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    // emoji are 2 UTF-16 code units but 1 code point; Spark substr
    // counts code points — parity must hold on such text
    val txt = "a😀b😁cdefg😂hij"
    val docs = Seq((1L, txt)).toDF("id", "tx")
    val ref = docs
      .select(col("id"), (length(col("tx")) - 3).as("n"), posexplode(
        transform(sequence(lit(1), length(col("tx")) - 3),
          i => md5(col("tx").substr(i, lit(4)).cast("binary")))))
      .toDF("id", "n", "pos", "h")
    val w = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, 2)
    val expect = ref.withColumn("fp", min(col("h")).over(w))
      .filter(col("pos") <= col("n") - 3 + 1)
      .select("fp").distinct().as[String].collect().toSet
    val got = docs.select(
        explode(call_function("graft_winnow", col("tx"), lit(4), lit(3))))
      .as[String].collect().toSet
    assert(got == expect, s"native=$got ref=$expect")
  }

  test("edge cases: exactly one window, too-short text, null") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, "abcdefghijk"), // 11 chars → 4 grams → 1 window
      (2L, "abcdefghij"),               // 10 chars → 3 grams → none
      (3L, null)).toDF("id", "tx")
    val got = rows.select(col("id"),
        call_function("graft_winnow", col("tx"), lit(8), lit(4)).as("f"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(got(1L).length == 1)
    assert(got(2L) != null && got(2L).isEmpty)
    assert(got(3L) == null)
  }
}
