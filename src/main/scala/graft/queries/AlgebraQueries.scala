package graft.queries

import graft.QueryDef
import graft.cache.{CacheManager, ParquetDirStorage}
import graft.rel._

/** End-to-end proof of the deferred algebra (SURVEY §7 steps 1+3+4+5):
  * each query here is BUILT AS A [[graft.rel.Rel]] PLAN — serializable,
  * hashable case classes — then lowered to a DataFrame; two of them
  * additionally route through JSON serialization, the expression-keyed
  * cache, and the exchange barrier before executing. The DuckDB oracle
  * checks the final rows, so the whole algebra→lowering→Catalyst path
  * is under the driver's correctness gate.
  */
object AlgebraQueries {

  /** Revenue-by-nation plan, pure algebra (no DataFrame code). */
  private def revenuePlan(dir: String): Rel =
    Sort(
      Aggregate(
        Join(
          Join(
            Filter(ScanParquet(s"$dir/lineitem.parquet"),
              RBin("<=", RCol("l_shipdate"),
                RCast(RLit("1998-09-02", "string"), "timestamp_ntz"))),
            ScanParquet(s"$dir/supplier.parquet"), "inner",
            Seq(RBin("=", RCol("l_suppkey"), RCol("s_suppkey")))),
          ScanParquet(s"$dir/nation.parquet"), "inner",
          Seq(RBin("=", RCol("s_nationkey"), RCol("n_nationkey")))),
        keys = Seq("n_name" -> RCol("n_name")),
        aggs = Seq(
          "revenue" -> RCast(RAgg("sum", Seq(RCast(
            RRaw("l_extendedprice * (1 - l_discount)"),
            "decimal(18,4)"))), "double"),
          "n" -> RAgg("count", Nil))),
      Seq(SortKey(RCol("n_name"), asc = true, nullsFirst = true)))

  private val revenueOracle =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY n_name ORDER BY n_name"""

  val defs: Seq[QueryDef] = Seq(

    // Plan built as serializable case classes, lowered, executed.
    q("alg_revenue", revenueOracle) { c =>
      new Lower(c.spark).lower(revenuePlan(c.dir))
    },

    // Same plan routed through canonical JSON and BACK (build → save →
    // load → run, the `xorq build`/`run` lifecycle of SURVEY §3.2).
    q("alg_serialize_roundtrip", revenueOracle) { c =>
      val json = RelJson.write(revenuePlan(c.dir))
      val reloaded = RelJson.parse(json)
      require(RelHash.buildHash(reloaded) ==
        RelHash.buildHash(revenuePlan(c.dir)), "hash drift after roundtrip")
      new Lower(c.spark).lower(reloaded)
    },

    // Scalar parameter bound at execution (bind_params).
    q("alg_param",
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders WHERE o_totalprice > 150000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { c =>
      val plan = Sort(
        Aggregate(
          Filter(ScanParquet(s"${c.dir}/orders.parquet"),
            RBin(">", RCol("o_totalprice"),
              RParam("min_price", "double", Some("100000")))),
          keys = Seq("o_orderpriority" -> RCol("o_orderpriority")),
          aggs = Seq(
            "n" -> RAgg("count", Nil),
            "total" -> RCast(RAgg("sum",
              Seq(RCast(RCol("o_totalprice"), "decimal(18,4)"))), "double"))),
        Seq(SortKey(RCol("o_orderpriority"), true, true)))
      new Lower(c.spark).lower(Params.bind(plan, Map("min_price" -> "150000")))
    },

    // Expression-keyed cache: the aggregate sub-plan is cached under its
    // content hash on first run and read back as a parquet artifact on
    // every later run — the result must be identical either way.
    q("alg_cached",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_query_cache"
      val mgr = new CacheManager(c.spark,
        Map("default" -> new ParquetDirStorage(c.spark, root)))
      val plan = Sort(
        Cache(
          Aggregate(ScanParquet(s"${c.dir}/lineitem.parquet"),
            keys = Seq("l_returnflag" -> RCol("l_returnflag"),
              "l_linestatus" -> RCol("l_linestatus")),
            aggs = Seq("n" -> RAgg("count", Nil))),
          "default", "mtime"),
        Seq(SortKey(RCol("l_returnflag"), true, true),
          SortKey(RCol("l_linestatus"), true, true)))
      mgr.execute(plan)
    },

    // As-of join as an ALGEBRA NODE (serializable/hashable/cacheable),
    // routed through a JSON round-trip before lowering to the
    // union–sort–backfill operator.
    q("alg_asof",
      """SELECT c.event_id, c.user_id,
        |       round(s.value + 1e-9, 2) AS signup_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON c.user_id = s.user_id AND c.ts >= s.ts
        |ORDER BY c.event_id""") { c =>
      // events binds as an UnboundTable (it needs the ns-timestamp fix
      // from Tables, applied by the binding — the serialized plan stays
      // source-agnostic, exactly the unbound-expr contract)
      val ev = UnboundTable("events_in",
        Seq("event_id" -> "BIGINT", "user_id" -> "BIGINT"))
      val plan = Sort(
        Project(
          AsofJoinRel(
            Project(Filter(ev, RBin("=", RCol("event_type"),
              RLit("click", "string"))),
              Seq("event_id" -> RCol("event_id"),
                "user_id" -> RCol("user_id"), "ts" -> RCol("ts"))),
            Filter(ev, RBin("=", RCol("event_type"),
              RLit("signup", "string"))),
            on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
            rightCols = Seq("value" -> "sv")),
          Seq("event_id" -> RCol("event_id"), "user_id" -> RCol("user_id"),
            "signup_value" -> RCall("round", Seq(
              RBin("+", RCol("sv"), RLit("1e-9", "double")),
              RLit("2", "int"))))),
        Seq(SortKey(RCol("event_id"), true, true)))
      new Lower(c.spark, Map("events_in" -> c.events))
        .lower(RelJson.parse(RelJson.write(plan)))
    },

    // Window functions as algebra nodes (WindowProject + frames).
    q("alg_window",
      """SELECT o_custkey, o_orderkey,
        |       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |                                     ORDER BY o_orderkey
        |                                     ROWS UNBOUNDED PRECEDING) + 1e-9, 2) AS running
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""") { c =>
      val plan = Sort(
        Project(
          WindowProject(
            Filter(ScanParquet(s"${c.dir}/orders.parquet"),
              RBin("<", RCol("o_custkey"), RLit("200", "int"))),
            keep = Seq("o_custkey", "o_orderkey"),
            wins = Seq(
              WinExpr("rk", RCall("rank", Nil),
                Seq(RCol("o_custkey")),
                Seq(SortKey(RCol("o_totalprice"), asc = false,
                  nullsFirst = false),
                  SortKey(RCol("o_orderkey"), asc = true,
                    nullsFirst = true)),
                None),
              WinExpr("running_raw", RAgg("sum", Seq(RCol("o_totalprice"))),
                Seq(RCol("o_custkey")),
                Seq(SortKey(RCol("o_orderkey"), asc = true,
                  nullsFirst = true)),
                Some(Frame("rows", Long.MinValue, 0))))),
          Seq("o_custkey" -> RCol("o_custkey"),
            "o_orderkey" -> RCol("o_orderkey"),
            "rk" -> RCol("rk"),
            "running" -> RCall("round", Seq(
              RBin("+", RCol("running_raw"), RLit("1e-9", "double")),
              RLit("2", "int"))))),
        Seq(SortKey(RCol("o_custkey"), true, true),
          SortKey(RCol("o_orderkey"), true, true)))
      new Lower(c.spark).lower(RelJson.parse(RelJson.write(plan)))
    },

    // InMemoryTable leaf: a literal dimension joined against a scan —
    // the literal rows are part of the serialized, hashed plan.
    q("alg_inmemory",
      """SELECT r.rname, count(*) AS n
        |FROM nation n
        |JOIN (VALUES (0, 'AFRICA_X'), (1, 'AMERICA_X'), (2, 'ASIA_X'),
        |             (3, 'EUROPE_X'), (4, 'MIDEAST_X')) r(rk, rname)
        |  ON n.n_regionkey = r.rk
        |GROUP BY r.rname ORDER BY r.rname""") { c =>
      val dim = InMemory(
        columns = Seq("rk" -> "INT", "rname" -> "STRING"),
        rows = Seq(
          Seq("0", "AFRICA_X"), Seq("1", "AMERICA_X"), Seq("2", "ASIA_X"),
          Seq("3", "EUROPE_X"), Seq("4", "MIDEAST_X")))
      val plan = Sort(
        Aggregate(
          Join(ScanParquet(s"${c.dir}/nation.parquet"), dim, "inner",
            Seq(RBin("=", RCol("n_regionkey"), RCol("rk")))),
          keys = Seq("rname" -> RCol("rname")),
          aggs = Seq("n" -> RAgg("count", Nil))),
        Seq(SortKey(RCol("rname"), true, true)))
      new Lower(c.spark).lower(RelJson.parse(RelJson.write(plan)))
    },

    // Exchange barrier (into_backend analogue): the subtree result is
    // durably materialized under the target's exchange root; downstream
    // sees a fresh scan of the artifact (execute()-time effect).
    q("alg_exchange",
      """SELECT l_returnflag, count(*) AS n,
        |       round(sum(l_quantity) + 1e-9, 2) AS qty
        |FROM lineitem WHERE l_discount > 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      val plan = Sort(
        Aggregate(
          Exchange(
            Filter(ScanParquet(s"${c.dir}/lineitem.parquet"),
              RBin(">", RCol("l_discount"), RLit("0.05", "double"))),
            "warehouse"),
          keys = Seq("l_returnflag" -> RCol("l_returnflag")),
          aggs = Seq(
            "n" -> RAgg("count", Nil),
            "qty" -> RCall("round", Seq(
              RBin("+", RAgg("sum", Seq(RCol("l_quantity"))),
                RLit("1e-9", "double")),
              RLit("2", "int"))))),
        Seq(SortKey(RCol("l_returnflag"), true, true)))
      new graft.api.GraftSession(c.spark).execute(plan)
    },

    // UDXF as an algebra node (the r2 parity gap: UDFs lived outside the
    // algebra, so their plans couldn't hash/build). The plan — carrying
    // the function NAME + full schema contract — round-trips through a
    // build artifact (save → load, hash-verified) and executes with no
    // access to the code that authored it, the implementation being
    // resolved from the builtin function catalog (ref expr/udf.py
    // serialization + flight exchangers by name).
    q("alg_udxf_built",
      """SELECT doc_id,
        |       length(text) AS n_chars,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       lower(substr(text, 1, 8)) AS head
        |FROM documents ORDER BY doc_id""") { c =>
      val u = graft.udf.Builtins.docStats
      val plan = Sort(
        UdxfRel(
          Project(ScanParquet(s"${c.dir}/documents.parquet"),
            Seq("doc_id" -> RCol("doc_id"), "text" -> RCol("text"))),
          u.name,
          graft.udf.FunctionCatalog.ddl(u.schemaIn.fields.toSeq),
          graft.udf.FunctionCatalog.ddl(u.schemaOut.fields.toSeq)),
        Seq(SortKey(RCol("doc_id"), true, true)))
      val buildsDir = java.nio.file.Files
        .createTempDirectory("graft_q_builds_").toString
      val art = graft.build.Build.save(plan, buildsDir)
      val loaded = graft.build.Build.load(buildsDir, art.hash)
      new graft.api.GraftSession(c.spark,
        functions = graft.udf.Builtins.catalog).execute(loaded)
    },

    // Deferred ML in the algebra: FitRel lowers to a LAZY model table
    // (no collect — fit aggregates broadcast-join into the plan) and
    // TransformRel applies it; the whole fit+predict pipeline is a
    // serializable plan (round-tripped through JSON here) that hashes,
    // caches, and builds like any relation (ref pipeline_lib.py:109-977,
    // where the pipeline is IR inside the build artifact).
    q("alg_fit_transform",
      """WITH s AS (SELECT avg(l_quantity) mu, stddev_samp(l_quantity) sigma FROM lineitem),
        |t AS (SELECT l_orderkey, l_linenumber, (l_quantity - mu) / sigma AS qs,
        |             l_extendedprice FROM lineitem, s),
        |m AS (SELECT regr_slope(l_extendedprice, qs) a,
        |             regr_intercept(l_extendedprice, qs) b FROM t)
        |SELECT l_orderkey, l_linenumber, round(b + a * qs + 1e-9, 2) AS pred
        |FROM t, m WHERE l_orderkey < 300 ORDER BY l_orderkey, l_linenumber""") { c =>
      val li = ScanParquet(s"${c.dir}/lineitem.parquet")
      val steps = Seq(ScaleSpec("l_quantity", "qs"),
        LinRegSpec("qs", "l_extendedprice", "pred"))
      val plan = Sort(
        Project(
          Filter(TransformRel(li, FitRel(li, steps), steps),
            RBin("<", RCol("l_orderkey"), RLit("300", "int"))),
          Seq("l_orderkey" -> RCol("l_orderkey"),
            "l_linenumber" -> RCol("l_linenumber"),
            "pred" -> RCall("round", Seq(
              RBin("+", RCol("pred"), RLit("1e-9", "double")),
              RLit("2", "int"))))),
        Seq(SortKey(RCol("l_orderkey"), true, true),
          SortKey(RCol("l_linenumber"), true, true)))
      new graft.api.GraftSession(c.spark)
        .execute(RelJson.parse(RelJson.write(plan)))
    }
  )
}
