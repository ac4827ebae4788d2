package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String): String =
    NormalizeText.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("lowercase, accent strip, and whitespace collapse compose") {
    assert(norm("  Héllo\t\tWÖRLD  ") == "hello world")
    assert(norm("Ça va très bien") == "ca va tres bien")
    assert(norm("a\nb\r\nc") == "a b c")
    assert(norm("") == "")
    assert(norm("   \t  ") == "")
  }

  test("composed and decomposed input normalize identically") {
    val composed = "caf\u00e9"        // precomposed e-acute
    val decomposed = "cafe\u0301"     // e + combining acute
    assert(composed != decomposed, "fixtures must differ as raw strings")
    assert(norm(composed) == "cafe")
    assert(norm(decomposed) == "cafe")
  }

  test("marks strip; non-decomposable letters and emoji pass through") {
    assert(norm("naïve résumé") == "naive resume")
    // ø has no canonical decomposition — preserved (utf8proc parity)
    assert(norm("SMØRREBRØD") == "smørrebrød")
    assert(norm("ok 😀  done") == "ok 😀 done")
  }

  test("SQL registration, codegen path, and NULL propagation") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "  TWO   Words "), (2L, null: String))
      .toDF("id", "tx")
      .select(col("id"), call_function("graft_normalize", col("tx")).as("n"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) == "two words")
    assert(rows(2L) == null)
  }
}
