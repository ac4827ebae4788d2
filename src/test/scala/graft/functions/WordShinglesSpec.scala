package graft.functions

import graft.SparkSpec
import graft.ops.TextDedup
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {

  /** reference: the SQL pipeline the kernel replaces — regexp token
    * array, size filter, lambda shingler, array_distinct, explode */
  private def refRows(docs: org.apache.spark.sql.DataFrame, n: Int,
      minTokens: Int) =
    docs
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      .filter(size(col("ts")) >= minTokens)
      .select(col("doc_id"),
        explode(TextDedup.wordShingles(col("ts"), n)).as("tok"))

  private def nativeRows(docs: org.apache.spark.sql.DataFrame, n: Int,
      minTokens: Int) =
    docs.select(col("doc_id"),
      explode(call_function("graft_word_shingles",
        col("text"), lit(n), lit(minTokens))).as("tok"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("native shingle rows equal the regexp + lambda formulation on " +
    "real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ref = asSet(refRows(docs, 3, 3))
    val got = asSet(nativeRows(docs, 3, 3))
    assert(ref.nonEmpty)
    assert(got == ref)
  }

  test("edge cases: short docs, punctuation-only, unicode bytes, " +
    "repeated shingles, uppercase excluded") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "one two"),                       // < minTokens -> dropped
      (2L, "a b c a b c a b c"),             // repeats dedup to 3+fallbacks
      (3L, "..!!  ??"),                      // zero tokens
      (4L, "héllo wörld foo bar baz"),       // multibyte splits runs
      (5L, "Mixed CASE tokens here ok"),     // uppercase breaks runs
      (6L, ""),                              // empty text
      (7L, "x y z")                          // exactly minTokens
    ).toDF("doc_id", "text")
    val ref = asSet(refRows(docs, 3, 3))
    val got = asSet(nativeRows(docs, 3, 3))
    assert(got == ref)
    // the whole-run fallback (minTokens < n) also matches
    val ref2 = asSet(refRows(docs, 3, 2))
    val got2 = asSet(nativeRows(docs, 3, 2))
    assert(got2 == ref2)
  }

  test("graft_sorted_inter equals size(array_intersect) on sorted " +
    "distinct long arrays") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val bad = df.select(
        call_function("graft_sorted_inter", col("a"), col("b"))
          .as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("got") =!= col("ref"))
      .count()
    assert(bad == 0L)
  }
}
