package graft.rel

import org.scalatest.funsuite.AnyFunSuite

class RelJsonSpec extends AnyFunSuite {

  /** A plan exercising every node and expression type. */
  def fullPlan: Rel = {
    val li = AsofJoinRel(
      ScanParquet("/data/lineitem.parquet"),
      ReadCsv("/data/quotes.csv", header = false, inferSchema = true, "\t"),
      on = Seq("sym"), leftTime = "t", rightTime = "qt",
      rightCols = Seq("px" -> "quote_px"),
      toleranceSql = Some("INTERVAL 5 MINUTES"))
    val ord = Join(
      UnboundTable("orders",
        Seq("o_orderkey" -> "BIGINT", "o_totalprice" -> "DOUBLE")),
      InMemory(Seq("k" -> "INT", "v" -> "STRING"),
        Seq(Seq("1", "a"), Seq("2", "b"))),
      "left", Seq(RBin("=", RCol("o_orderkey"), RCol("k"))))
    val joined = Join(li, ord, "inner",
      Seq(RBin("=", RCol("l_orderkey"), RCol("o_orderkey"))))
    val filtered = Filter(joined,
      RBin(">", RCol("o_totalprice"), RLit("100.5", "double")))
    val proj = Project(filtered, Seq(
      "k" -> RCol("l_orderkey"),
      "v" -> RCall("round", Seq(
        RBin("*", RCol("o_totalprice"),
          RParam("factor", "double", Some("1.5"))),
        RLit("2", "int"))),
      "c" -> RCast(RCol("l_quantity"), "bigint"),
      "r" -> RRaw("l_extendedprice * (1 - l_discount)")))
    val agg = Aggregate(proj,
      keys = Seq("k" -> RCol("k")),
      aggs = Seq(
        "s" -> RAgg("sum", Seq(RCol("v"))),
        "n" -> RAgg("count", Nil),
        "nf" -> RAgg("count", Nil,
          filter = Some(RBin(">", RCol("v"), RLit("0", "int")))),
        "nd" -> RAgg("count", Seq(RCol("c")), distinct = true)))
    val win = WindowProject(agg, keep = Seq("k", "s"), wins = Seq(
      WinExpr("rk", RCall("row_number", Nil), Seq(RCol("k")),
        Seq(SortKey(RCol("s"), asc = false, nullsFirst = false)),
        None),
      WinExpr("mv", RAgg("sum", Seq(RCol("s"))), Nil,
        Seq(SortKey(RCol("k"), asc = true, nullsFirst = true)),
        Some(Frame("rows", Long.MinValue, 0)))))
    val extras = Sort(
      Limit(
        Distinct(
          SetOp("union_all", win, win),
          on = Seq("k"), orderBy = Seq(SortKey(RCol("s"), true, true)),
          keepFirst = false),
        100, 5),
      Seq(SortKey(RCol("k"), asc = true, nullsFirst = false)))
    val decorated =
      Tee(
        Tag(
          Cache(
            Exchange(
              Sample(
                FillNull(
                  DropNull(
                    Unnest(extras, "arr", keepEmpty = true),
                    "any", Seq("k")),
                  Seq("s" -> "0")),
                0.5, 42L),
              "warehouse"),
            "default", "mtime"),
          "stage", "dev", hashing = true),
        "/tmp/tee.parquet")
    SqlView("SELECT * FROM t", Seq("t" -> decorated))
  }

  test("write/parse round-trip is identity") {
    val p = fullPlan
    val json = RelJson.write(p)
    val parsed = RelJson.parse(json)
    assert(parsed == p)
    assert(RelJson.write(parsed) == json)
  }

  test("canonical JSON of a small plan is byte-stable") {
    val p = Filter(ScanParquet("/d/t.parquet"),
      RBin(">", RCol("x"), RLit("1", "int")))
    assert(RelJson.write(p) ==
      """{"t":"filter","input":{"t":"scan_parquet","path":"/d/t.parquet"},""" +
      """"pred":{"e":"bin","op":">","left":{"e":"col","name":"x"},""" +
      """"right":{"e":"lit","value":"1","dtype":"int"}}}""")
  }

  test("strings with quotes/newlines survive the round-trip") {
    val p = SqlView("SELECT \"a\",\n'b\\c' FROM t\tx",
      Seq("t" -> ScanParquet("/d/weird \"name\".parquet")))
    assert(RelJson.parse(RelJson.write(p)) == p)
  }

  test("InMemory null cells serialize (a runnable plan must hash)") {
    val p = InMemory(Seq("a" -> "INT", "b" -> "STRING"),
      Seq(Seq("1", null), Seq(null, "x")))
    assert(RelJson.parse(RelJson.write(p)) == p)
    assert(RelHash.buildHash(p).length == 64)
  }

  test("parseAny handles the full standard escape set (external " +
    "serve envelopes)") {
    val m = RelJson.parseAny("""{"s":"a\b\f\n\tA","n":3,"x":null}""")
      .asInstanceOf[Map[String, Any]]
    assert(m("s") == "a\b\f\n\tA")
    assert(m("n") == 3L && m("x") == null)
  }
}
