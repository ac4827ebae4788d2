package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("redact replaces every PII class and leaves prose intact") {
    val row = Seq(
      "mail a.b+c@site.co call 555-123-4567 host 10.0.0.1 " +
        "ssn 321-54-9876 card 4111-1111-1111-1234 price 12.50 ok"
    ).toDF("t")
    val out = row.select(Pii.redact(col("t")).as("r")).head().getString(0)
    assert(out ==
      "mail <EMAIL> call <PHONE> host <IP> ssn <SSN> card <CC> " +
        "price 12.50 ok")
  }

  test("rule order: email digits are not half-eaten by digit rules") {
    val out = Seq("u123-45-6789@x.io").toDF("t")
      .select(Pii.redact(col("t")).as("r")).head().getString(0)
    assert(out == "<EMAIL>")
  }

  test("scan counts per class, totals, and quarantines dense rows") {
    val df = Seq(
      (1L, "a@b.co and c@d.co plus 555-123-4567"),
      (2L, "clean text only")
    ).toDF("id", "t")
    val s = Pii.scan(df, "t", maxHits = 2).orderBy("id").collect()
    assert(s(0).getAs[Int]("email_n") == 2)
    assert(s(0).getAs[Int]("phone_n") == 1)
    assert(s(0).getAs[Int]("pii_total") == 3)
    assert(s(0).getAs[Boolean]("quarantine"))
    assert(s(1).getAs[Int]("pii_total") == 0)
    assert(!s(1).getAs[Boolean]("quarantine"))
  }

  test("ipv4 boundaries: plain dotted quads match, 'v1.2.3.4' does not " +
    "start inside the leading word char") {
    val out = Seq("at 10.0.0.1 tag v1.2.3.4x end").toDF("t")
      .select(Pii.redact(col("t")).as("r")).head().getString(0)
    assert(out == "at <IP> tag v1.2.3.4x end")
  }
}
