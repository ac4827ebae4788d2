package graft.serve

import graft.SparkSpec
import graft.rel._
import graft.udf.Udxf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RegistrySpec extends SparkSpec {

  test("a served unbound plan executes against caller-bound inputs") {
    val reg = new Registry(spark)
    val plan = Aggregate(
      Filter(
        UnboundTable("events_in", Seq("value" -> "DOUBLE")),
        RBin(">", RCol("value"), RLit("0", "int"))),
      keys = Seq("event_type" -> RCol("event_type")),
      aggs = Seq("n" -> RAgg("count", Nil)))
    val hash = reg.servePlan("positive_counts", plan)
    assert(hash == RelHash.buildHash(plan))

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val out = reg.call("positive_counts", Map("events_in" -> events))
    assert(out.columns.toSeq == Seq("event_type", "n"))
    assert(out.count() > 0)

    // the same endpoint serves a DIFFERENT caller input unchanged
    val half = events.limit(100)
    assert(reg.call("positive_counts", Map("events_in" -> half))
      .agg(sum(col("n"))).collect()(0).getLong(0) <= 100)
  }

  test("missing binding and unknown endpoint fail fast") {
    val reg = new Registry(spark)
    reg.servePlan("p", UnboundTable("t", Nil))
    intercept[IllegalArgumentException](reg.call("p", Map.empty))
    intercept[IllegalArgumentException](reg.call("nope", Map.empty))
  }

  test("a served udxf validates its schema contract at call time") {
    val reg = new Registry(spark)
    reg.serveUdxf(Udxf(
      name = "double_it",
      schemaIn = StructType(Seq(StructField("x", LongType))),
      schemaOut = StructType(Seq(StructField("y", LongType))),
      process = _.map(r => Row(r.getLong(0) * 2))))

    val ok = reg.exchange("double_it", spark.range(5).toDF("x"))
    assert(ok.agg(sum(col("y"))).collect()(0).getLong(0) == 20)

    val bad = spark.range(5).selectExpr("CAST(id AS STRING) AS x")
    val err = intercept[IllegalArgumentException](
      reg.exchange("double_it", bad))
    assert(err.getMessage.contains("contract"))
    assert(reg.served == Seq("double_it"))
  }
}
