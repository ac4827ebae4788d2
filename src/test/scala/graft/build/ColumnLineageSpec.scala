package graft.build

import graft.rel._
import org.scalatest.funsuite.AnyFunSuite

class ColumnLineageSpec extends AnyFunSuite {
  import ColumnLineage.Origin

  private val li = ScanParquet("/data/lineitem.parquet")
  private val ord = ScanParquet("/data/orders.parquet")

  test("projection maps outputs to the exact columns each expr reads") {
    val plan = Project(li, Seq(
      "key" -> RCol("l_orderkey"),
      "rev" -> RBin("*", RCol("l_extendedprice"),
        RBin("-", RLit("1", "double"), RCol("l_discount"))),
      "one" -> RLit("1", "int")))
    val o = ColumnLineage.origins(plan)
    assert(o("key") === Set(Origin("/data/lineitem.parquet", "l_orderkey")))
    assert(o("rev") === Set(
      Origin("/data/lineitem.parquet", "l_extendedprice"),
      Origin("/data/lineitem.parquet", "l_discount")))
    assert(o("one") === Set.empty)
  }

  test("joins attribute columns through both sides; aggregate + filter " +
    "pass through correctly") {
    val plan = Aggregate(
      Filter(
        Join(
          Project(li, Seq("ok" -> RCol("l_orderkey"),
            "qty" -> RCol("l_quantity"))),
          Project(ord, Seq("ok2" -> RCol("o_orderkey"),
            "prio" -> RCol("o_orderpriority"))),
          "inner", Seq(RBin("=", RCol("ok"), RCol("ok2")))),
        RBin(">", RCol("qty"), RLit("5", "double"))),
      keys = Seq("prio" -> RCol("prio")),
      aggs = Seq("total" -> RAgg("sum", Seq(RCol("qty")))))
    val o = ColumnLineage.origins(plan)
    assert(o("prio") ===
      Set(Origin("/data/orders.parquet", "o_orderpriority")))
    assert(o("total") === Set(Origin("/data/lineitem.parquet", "l_quantity")))
  }

  test("RRaw taints conservatively from everything visible") {
    val plan = Project(
      Project(li, Seq("a" -> RCol("l_quantity"), "b" -> RCol("l_discount"))),
      Seq("x" -> RRaw("a + b + 1")))
    val o = ColumnLineage.origins(plan)
    assert(o("x") === Set(
      Origin("/data/lineitem.parquet", "l_quantity"),
      Origin("/data/lineitem.parquet", "l_discount")))
  }

  test("unknown leaf schema yields wildcard origins, never silence") {
    val o = ColumnLineage.origins(li)
    assert(o === Map("*" -> Set(Origin("/data/lineitem.parquet", "*"))))
  }

  test("taintedBy finds impacted outputs incl. via wildcards") {
    val plan = Project(li, Seq(
      "clean" -> RCol("l_orderkey"),
      "pii" -> RCall("upper", Seq(RCol("email")))))
    assert(ColumnLineage.taintedBy(plan, "/data/lineitem.parquet",
      "email") === Set("pii"))
    // SqlView body is opaque: everything taints
    val view = SqlView("SELECT 1 AS z FROM t", Seq("t" -> plan))
    assert(ColumnLineage.taintedBy(view, "/data/lineitem.parquet",
      "email").nonEmpty)
  }

  test("window/udxf/fit nodes over-approximate, never drop") {
    val win = WindowProject(li, keep = Seq("l_orderkey"),
      wins = Seq(WinExpr("rk", RCall("row_number", Nil),
        Seq(RCol("l_returnflag")),
        Seq(SortKey(RCol("l_quantity"), asc = true, nullsFirst = true)),
        None)))
    val ow = ColumnLineage.origins(win)
    assert(ow("rk") === Set(
      Origin("/data/lineitem.parquet", "l_returnflag"),
      Origin("/data/lineitem.parquet", "l_quantity")))
    val fit = FitRel(Project(li, Seq("f" -> RCol("l_quantity"))),
      Seq(ScaleSpec("f", "fs")))
    val of = ColumnLineage.origins(fit)
    assert(of.keySet === Set("step", "param", "value"))
    assert(of("value") === Set(Origin("/data/lineitem.parquet",
      "l_quantity")))
  }

  test("lineage of a SAVED artifact (the Cli `columns` path): " +
    "serialize -> Build.save -> load -> origins") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_collineage_").toString
    val plan = Project(li, Seq("k" -> RCol("l_orderkey"),
      "q2" -> RBin("*", RCol("l_quantity"), RLit("2", "double"))))
    val art = Build.save(plan, dir)
    val loaded = Build.load(dir, art.hash)
    val o = ColumnLineage.origins(loaded)
    assert(o("q2") === Set(Origin("/data/lineitem.parquet", "l_quantity")))
    assert(o("k") === Set(Origin("/data/lineitem.parquet", "l_orderkey")))
  }
}
