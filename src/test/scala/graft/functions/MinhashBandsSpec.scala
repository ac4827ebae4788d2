package graft.functions

import graft.SparkSpec
import graft.ops.TextDedup
import org.apache.spark.sql.functions._

class MinhashBandsSpec extends SparkSpec {

  test("native band keys equal the aggregate formulation bit-for-bit " +
    "on real documents (incl. short-doc fallback shingles)") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (shingleN, k, bands) = (3, 32, 16)
    val ref = TextDedup.minhashSignatures(docs, "doc_id", "text",
        shingleN, k)
      .select(col("id"),
        explode(TextDedup.lshBandKeyArray(bands, k / bands)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val got = docs.select(col("doc_id").as("id"),
        explode(call_function("graft_minhash_bands",
          lower(trim(col("text"))), lit(shingleN), lit(k), lit(bands)))
          .as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got.size == ref.size && got.size > 0)
    got.foreach { case (key, v) =>
      assert(v == ref(key), s"(id, band)=$key: native=$v ref=${ref(key)}")
    }
    // a doc with fewer tokens than shingleN exercises the whole-run
    // fallback on both paths
    val sp = spark
    import sp.implicits._
    val short = Seq((1L, "only two")).toDF("doc_id", "text")
    val a = TextDedup.minhashSignatures(short, "doc_id", "text", 3, 8)
      .select(col("id"),
        explode(TextDedup.lshBandKeyArray(4, 2)).as("bk"))
      .select(col("bk.key")).collect().map(_.getLong(0)).toSeq
    val b = short.select(
        explode(call_function("graft_minhash_bands",
          lower(trim(col("text"))), lit(3), lit(8), lit(4))).as("bk"))
      .select(col("bk.key")).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("native pair finding matches the aggregate path end to end") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def pairs(native: Boolean) =
      TextDedup.minhashDedupPairs(docs, "doc_id", "text",
          shingleN = 3, k = 32, bands = 16, threshold = 0.9,
          native = native)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(native = true) == pairs(native = false))
  }
}
