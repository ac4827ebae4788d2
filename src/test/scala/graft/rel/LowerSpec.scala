package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LowerSpec extends SparkSpec {

  def li: Rel = ScanParquet(s"$sfDir/lineitem.parquet")
  def lower = new Lower(spark)

  test("project + filter + aggregate + sort lowers to the DataFrame result") {
    val rel = Sort(
      Aggregate(
        Filter(li, RBin("<=", RCol("l_quantity"), RLit("25", "int"))),
        keys = Seq("rf" -> RCol("l_returnflag")),
        aggs = Seq(
          "qty" -> RCall("round", Seq(RAgg("sum", Seq(RCol("l_quantity"))),
            RLit("2", "int"))),
          "n" -> RAgg("count", Nil))),
      Seq(SortKey(RCol("rf"), asc = true, nullsFirst = true)))

    val got = lower(rel).collect()
    val exp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") <= 25)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"),
        count(lit(1)).as("n"))
      .orderBy("rf").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("join lowers with condition and how") {
    val ord = ScanParquet(s"$sfDir/orders.parquet")
    val rel = Limit(Sort(
      Project(
        Join(li, ord, "inner",
          Seq(RBin("=", RCol("l_orderkey"), RCol("o_orderkey")))),
        Seq("k" -> RCol("l_orderkey"), "p" -> RCol("o_totalprice"))),
      Seq(SortKey(RCol("k"), true, true), SortKey(RCol("p"), true, true))),
      10)
    assert(lower(rel).collect().length == 10)
  }

  test("unbound tables resolve from bindings and validate schema") {
    val rel = Aggregate(
      UnboundTable("t", Seq("l_orderkey" -> "BIGINT")),
      keys = Nil, aggs = Seq("n" -> RAgg("count", Nil)))
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = new Lower(spark, Map("t" -> df)).lower(rel).collect()(0).getLong(0)
    assert(n == df.count())

    val bad = UnboundTable("t", Seq("l_orderkey" -> "STRING"))
    val err = intercept[IllegalArgumentException] {
      new Lower(spark, Map("t" -> df)).lower(bad)
    }
    assert(err.getMessage.contains("declared"))

    val missing = UnboundTable("nope", Nil)
    intercept[IllegalArgumentException](lower.lower(missing))
  }

  test("window projection lowers with frame") {
    val rel = WindowProject(
      Project(li, Seq("k" -> RCol("l_orderkey"), "q" -> RCol("l_quantity"))),
      keep = Seq("k", "q"),
      wins = Seq(WinExpr("rn", RCall("row_number", Nil),
        Seq(RCol("k")), Seq(SortKey(RCol("q"), false, false)), None)))
    val df = lower(rel)
    assert(df.columns.toSeq == Seq("k", "q", "rn"))
    assert(df.filter(col("rn") === 1).count() > 0)
  }

  test("params bind before lowering; defaults apply; unbound fails") {
    val rel = Filter(li,
      RBin(">", RCol("l_quantity"), RParam("cut", "int", Some("45"))))
    val n45 = lower(Params.bind(rel, Map.empty)).count()
    val n10 = lower(Params.bind(rel, Map("cut" -> "10"))).count()
    assert(n10 > n45)

    val noDefault = Filter(li,
      RBin(">", RCol("l_quantity"), RParam("cut", "int", None)))
    intercept[IllegalArgumentException] {
      lower(Params.bind(noDefault, Map.empty))
    }
  }

  test("sql view lowers over registered deps") {
    val rel = SqlView(
      "SELECT l_returnflag, count(*) AS n FROM li_view GROUP BY 1",
      Seq("li_view" -> li))
    assert(lower(rel).count() == 3)
  }

  test("set ops, distinct-on, limit/offset lower correctly") {
    val proj = Project(li, Seq("k" -> RCol("l_orderkey")))
    val union = SetOp("union_all", proj, proj)
    assert(lower(union).count() == 2 * lower(proj).count())
    val dedup = Distinct(union, on = Seq("k"),
      orderBy = Seq(SortKey(RCol("k"), true, true)))
    assert(lower(dedup).count() == lower(Distinct(proj)).count())
    val lim = Limit(Sort(Distinct(proj),
      Seq(SortKey(RCol("k"), true, true))), 10, 5)
    assert(lower(lim).count() == 10)
  }

  test("sample, fill/drop null, and unnest lower correctly") {
    val sampled = lower(Sample(li, 0.1, 42L)).count()
    val total = lower(li).count()
    assert(sampled > 0 && sampled < total)
    assert(sampled == lower(Sample(li, 0.1, 42L)).count(),
      "seeded sample must be deterministic")

    val sp = spark
    import sp.implicits._
    val withNulls = Seq((1, Option("a")), (2, None), (3, Option("c")))
      .toDF("k", "v")
    withNulls.createOrReplaceTempView("nulls_in")
    val filled = new Lower(spark).lower(
      FillNull(SqlView("SELECT * FROM nulls_in", Nil),
        Seq("v" -> "missing")))
    assert(filled.filter(col("v") === "missing").count() == 1)
    val dropped = new Lower(spark).lower(
      DropNull(SqlView("SELECT * FROM nulls_in", Nil), "any", Seq("v")))
    assert(dropped.count() == 2)

    val arrs = Seq((1, Seq("x", "y")), (2, Seq.empty[String]))
      .toDF("k", "arr")
    arrs.createOrReplaceTempView("arrs_in")
    val exploded = new Lower(spark).lower(
      Unnest(SqlView("SELECT * FROM arrs_in", Nil), "arr",
        keepEmpty = true))
    assert(exploded.count() == 3) // x, y, and the empty row kept as null
  }

  test("RAgg distinct dispatches on fn; filter composes; bad combos throw") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def one(agg: RExpr): Any =
      lower(Aggregate(li, Nil, Seq("v" -> agg))).collect()(0).get(0)

    // sum DISTINCT must be a distinct SUM, not a distinct count
    val sumD = one(RAgg("sum", Seq(RCol("l_quantity")), distinct = true))
    val expSumD = df.agg(sum_distinct(col("l_quantity"))).collect()(0).get(0)
    assert(sumD == expSumD)
    assert(sumD != df.agg(count_distinct(col("l_quantity")))
      .collect()(0).get(0))

    // count DISTINCT unchanged
    assert(one(RAgg("count", Seq(RCol("l_returnflag")), distinct = true)) ==
      df.agg(count_distinct(col("l_returnflag"))).collect()(0).get(0))

    // filter + distinct compose (DISTINCT over the filtered values)
    val f = RBin("=", RCol("l_returnflag"), RLit("A", "string"))
    val got = one(RAgg("sum", Seq(RCol("l_quantity")), distinct = true,
      filter = Some(f)))
    val exp = df.filter(col("l_returnflag") === "A")
      .agg(sum_distinct(col("l_quantity"))).collect()(0).get(0)
    assert(got == exp)

    // unsupported distinct fn fails loudly instead of changing semantics
    val err = intercept[IllegalArgumentException] {
      one(RAgg("avg", Seq(RCol("l_quantity")), distinct = true))
    }
    assert(err.getMessage.contains("DISTINCT"))
  }

  test("ReadDelta round-trips and lowers to the delta data source") {
    val rel = ReadDelta("/tmp/some_delta_table")
    assert(RelJson.parse(RelJson.write(rel)) == rel)
    assert(RelHash.buildHash(rel) != RelHash.buildHash(
      ScanParquet("/tmp/some_delta_table")),
      "format is part of the content identity")
    // this container ships no delta-spark jar: lowering must surface
    // the data-source resolution error, never silently misread
    val err = intercept[Exception] { lower.lower(rel) }
    assert(err.getMessage.toLowerCase.contains("delta"))
  }

  test("ReadAvro round-trips, hashes by format, and lowers to a live " +
    "avro read (Spark 4 bundles the format)") {
    val rel = ReadAvro("/tmp/some_avro_dir")
    assert(RelJson.parse(RelJson.write(rel)) == rel)
    assert(RelHash.buildHash(rel) != RelHash.buildHash(
      ScanParquet("/tmp/some_avro_dir")),
      "format is part of the content identity")
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_avro_").toString
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
      .write.mode("overwrite")
      .format("org.apache.spark.sql.avro.AvroFileFormat").save(dir)
    val got = lower.lower(ReadAvro(dir)).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("ReadXml round-trips (incl. rowTag), hashes by format, and " +
    "lowers to a live xml read (Spark 4 native XML)") {
    val rel = ReadXml("/tmp/some_xml_dir", "rec")
    assert(RelJson.parse(RelJson.write(rel)) == rel)
    assert(RelHash.buildHash(rel) != RelHash.buildHash(
      ReadXml("/tmp/some_xml_dir", "other")),
      "rowTag is part of the content identity")
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_xml_").toString + "/out"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.option("rowTag", "rec").format("xml").save(dir)
    val got = lower.lower(ReadXml(dir, "rec")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("distinct-on keep=last picks the opposite row from keep=first") {
    val proj = Project(li, Seq("k" -> RCol("l_orderkey"),
      "ln" -> RCol("l_linenumber")))
    val ord = Seq(SortKey(RCol("ln"), asc = true, nullsFirst = true))
    val first = lower(Distinct(proj, Seq("k"), ord, keepFirst = true))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val last = lower(Distinct(proj, Seq("k"), ord, keepFirst = false))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first.keySet == last.keySet)
    assert(first.forall { case (k, ln) => ln <= last(k) })
    assert(first.exists { case (k, ln) => ln < last(k) },
      "multi-line orders must differ between first and last")
  }
}
