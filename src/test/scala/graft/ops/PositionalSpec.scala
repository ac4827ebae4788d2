package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PositionalSpec extends SparkSpec {

  lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("distributed row numbers equal the single-partition window " +
    "row_number under the same total order") {
    val sortKeys = Seq(col("l_orderkey"), col("l_linenumber"))
    val dist = Positional.withRowNumber(li, sortKeys)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val window = li.select(col("l_orderkey"), col("l_linenumber"),
        row_number().over(
          Window.orderBy(col("l_orderkey"), col("l_linenumber")))
          .cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(dist == window)
  }

  test("row numbers stay correct when the input is pre-shuffled") {
    val shuffled = li.repartition(13)
    val rns = Positional.withRowNumber(shuffled,
      Seq(col("l_orderkey"), col("l_linenumber"))).select("rn")
      .collect().map(_.getLong(0)).sorted
    assert(rns.head == 1L && rns.last == li.count())
    assert(rns.length == rns.distinct.length)
  }

  test("positional join pairs i-th rows of two orderings") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val out = Positional.positionalJoin(
      nation.select("n_name", "n_nationkey"), Seq(col("n_nationkey")),
      region.select("r_name", "r_regionkey"), Seq(col("r_regionkey")))
    assert(out.count() == region.count()) // inner on shorter side
    val first = out.orderBy("pos").collect()(0)
    assert(first.getAs[Long]("pos") == 1L)
  }
}
