package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-family registries under
  * [[graft.queries]]; each entry mirrors one operator row of SURVEY §2 and
  * carries (where SQL-expressible) a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** Every declared operator query, grouped by SURVEY §2 family. */
  val all: Seq[QueryDef] =
    _root_.graft.queries.RelationalQueries.defs ++
    _root_.graft.queries.AggQueries.defs ++
    _root_.graft.queries.JoinQueries.defs ++
    _root_.graft.queries.WindowQueries.defs ++
    _root_.graft.queries.FunctionQueries.defs ++
    _root_.graft.queries.LlmQueries.defs ++
    _root_.graft.queries.AlgebraQueries.defs ++
    _root_.graft.queries.UdfQueries.defs ++
    _root_.graft.queries.MlQueries.defs ++
    _root_.graft.queries.SourceQueries.defs ++
    _root_.graft.queries.CoverageQueries.defs ++
    _root_.graft.queries.GeoQueries.defs ++
    _root_.graft.queries.PipelineQueries.defs ++
    _root_.graft.queries.CurationQueries.defs ++
    _root_.graft.queries.GovernanceQueries.defs ++
    _root_.graft.queries.FeatureQueries.defs ++
    _root_.graft.queries.StatQueries.defs ++
    _root_.graft.queries.GraphQueries.defs

  // A duplicate name would silently SHADOW the earlier QueryDef when
  // `all` folds into the Map below — the replacement runs under the
  // original's coverage claim and nothing fails (an r9 near-miss:
  // a second stat_bootstrap_ci overrode the Poisson-bootstrap original
  // and still passed its own oracle). Fail construction loudly instead.
  locally {
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names in the registry: ${dups.mkString(", ")}")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 shape (customer ⋈ orders ⋈ lineitem revenue ranking) built
    * through the ENGINE'S OWN fluent algebra API — the plan is
    * serializable/hashable and executes via cache resolution + lowering,
    * i.e. the library's primary user path. */
  def entry(spark: SparkSession): DataFrame = {
    import _root_.graft.api._, _root_.graft.api.dsl._
    val dir = "/root/testdata/sf0.001"
    val g = new GraftSession(spark)
    g.readParquet(s"$dir/lineitem.parquet")
      .join(g.readParquet(s"$dir/orders.parquet"), "inner",
        c("l_orderkey") === c("o_orderkey"))
      .join(g.readParquet(s"$dir/customer.parquet"), "inner",
        c("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey" -> c("l_orderkey"),
        "o_orderdate" -> c("o_orderdate"))(
        "revenue" -> fn("round",
          agg("sum", raw("l_extendedprice * (1 - l_discount)")), i(2)))
      .orderBy(desc(c("revenue")), asc(c("l_orderkey")))
      .limit(20)
      .execute()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Headline queries for Bench (sf0.1). */
  def benchQueries: Seq[QueryDef] = all.filter(_.bench)
}
