package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical golden values (cross-checked against DuckDB)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("empty-string conventions match DuckDB (both empty -> 0)") {
    assert(jw("", "") === 0.0)
    assert(jw("", "x") === 0.0)
    assert(jw("x", "") === 0.0)
  }

  test("winkler boost applies only above 0.7 and caps prefix at 4") {
    // identical 8-char prefix strings differing at the end: boost uses
    // at most 4 prefix chars
    val base = jw("abcdefgh", "abcdefxy")
    assert(base > 0.7)
    // low-similarity pair gets NO boost despite shared first char
    val lo = jw("aqwert", "azxcvb")
    assert(lo <= 0.7 + 1e-12)
  }

  test("SQL function registration, null handling, and codegen") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT graft_jaro_winkler('martha', 'marhta') a,
        |       graft_jaro_winkler(CAST(NULL AS STRING), 'x') b""".stripMargin)
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(r.isNullAt(1))
    // stays inside whole-stage codegen in a projection over a table
    val names = spark.read.parquet(s"$sfDir/part.parquet")
      .select(expr("graft_jaro_winkler(p_name, 'red widget')").as("s"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val plan = names.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_jaro_winkler"), plan.take(400))
    assert(names.filter(col("s") === 1.0).count() > 0)
  }

  test("symmetry and bounds on real part names") {
    GraftFunctions.register(spark)
    val p = spark.read.parquet(s"$sfDir/part.parquet").limit(50)
      .select(col("p_name").as("a"))
    val pairs = p.crossJoin(p.select(col("a").as("b")))
      .select(expr("graft_jaro_winkler(a, b)").as("ab"),
        expr("graft_jaro_winkler(b, a)").as("ba"))
    assert(pairs.filter(col("ab") =!= col("ba")).count() === 0L)
    assert(pairs.filter(col("ab") < 0 || col("ab") > 1).count() === 0L)
  }
}
