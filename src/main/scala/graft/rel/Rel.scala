package graft.rel

/** The deferred, serializable relational algebra — the layer Catalyst
  * does NOT provide and the heart of the reference's identity: compose →
  * serialize → hash → cache/exchange/rerun (xorq's Ibis-IR + YAML-build
  * stack, vendor/ibis/expr/operations/relations.py:41-88 and
  * ibis_yaml/compiler.py:283/:397/:994).
  *
  * Design stance (SURVEY §7): a THIN algebra of immutable case classes
  * that lowers to `DataFrame` transformations ([[Lower]]) — Catalyst is
  * the only optimizer/executor. Nodes carry no Spark objects, so every
  * plan is serializable to canonical JSON ([[RelJson]]) with a stable
  * content hash ([[RelHash]]); caching ([[graft.cache.CacheManager]]),
  * build artifacts and exchange barriers key off those hashes.
  *
  * Scalar expressions ([[RExpr]]) name Spark functions directly
  * (`call_function` resolves them at lowering) — we deliberately do NOT
  * re-type ~150 scalar ops the way Ibis does; Spark's analyzer is the
  * type checker, and [[RRaw]] is the SQL escape hatch.
  */
sealed trait Rel extends Product with Serializable {
  def children: Seq[Rel]

  /** Bottom-up structural rewrite. */
  def transformUp(f: PartialFunction[Rel, Rel]): Rel = {
    val next = this.mapChildren(_.transformUp(f))
    f.applyOrElse(next, identity[Rel])
  }

  def mapChildren(f: Rel => Rel): Rel = this match {
    case r: ScanParquet => r
    case r: ScanArrow => r
    case r: ReadDelta => r
    case r: ReadAvro => r
    case r: ReadXml => r
    case r: ReadJdbc => r
    case r: ReadCsv => r
    case r: UnboundTable => r
    case r: InMemory => r
    case r: SqlView => r.copy(deps = r.deps.map { case (n, d) => (n, f(d)) })
    case r: PinnedRead => r
    case r: AsofJoinRel => r.copy(left = f(r.left), right = f(r.right))
    case r: Project => r.copy(input = f(r.input))
    case r: Filter => r.copy(input = f(r.input))
    case r: Join => r.copy(left = f(r.left), right = f(r.right))
    case r: Aggregate => r.copy(input = f(r.input))
    case r: WindowProject => r.copy(input = f(r.input))
    case r: Sort => r.copy(input = f(r.input))
    case r: Limit => r.copy(input = f(r.input))
    case r: Distinct => r.copy(input = f(r.input))
    case r: SetOp => r.copy(left = f(r.left), right = f(r.right))
    case r: Sample => r.copy(input = f(r.input))
    case r: FillNull => r.copy(input = f(r.input))
    case r: DropNull => r.copy(input = f(r.input))
    case r: Unnest => r.copy(input = f(r.input))
    case r: Cache => r.copy(input = f(r.input))
    case r: Exchange => r.copy(input = f(r.input))
    case r: Tag => r.copy(input = f(r.input))
    case r: Tee => r.copy(input = f(r.input))
    case r: Publish => r.copy(input = f(r.input), audit = f(r.audit))
    case r: UdxfRel => r.copy(input = f(r.input))
    case r: UdwfRel => r.copy(input = f(r.input))
    case r: FitRel => r.copy(train = f(r.train))
    case r: TransformRel => r.copy(input = f(r.input), model = f(r.model))
  }
}

// ---------------------------------------------------------------- leaves

/** Deferred parquet read (the reference's `Read`,
  * expr/relations.py:826-845: method+path captured, resolved at the
  * execution boundary; participates in the content hash). */
final case class ScanParquet(path: String) extends Rel {
  def children: Seq[Rel] = Nil
}

/** Deferred Arrow IPC directory read (the interchange data plane,
  * ref expr/api.py:590-678 to_pyarrow_batches): a directory of
  * `part-*.arrow` stream files written by [[graft.interop.ArrowIpc]].
  * Serializable, fingerprintable leaf like [[ScanParquet]]. */
final case class ScanArrow(path: String) extends Rel {
  def children: Seq[Rel] = Nil
}

/** Deferred Delta Lake read (ref backend.py:688 read_delta): resolves
  * via the `delta` data source, which must be on the session's
  * classpath (delta-spark). Serializable leaf — participates in
  * content hashes exactly like [[ScanParquet]]. */
final case class ReadDelta(path: String) extends Rel {
  def children: Seq[Rel] = Nil
}

/** Deferred Avro read (ref Read dispatch, expr/api.py — the row-major
  * interchange format next to the columnar pair parquet/ORC; Spark 4
  * bundles `AvroFileFormat` in spark-sql, so no extra classpath is
  * needed). Serializable, fingerprintable leaf like [[ScanParquet]]. */
final case class ReadAvro(path: String) extends Rel {
  def children: Seq[Rel] = Nil
}

/** Deferred XML read (Spark 4 ships native XML, registered under the
  * `xml` short name; `rowTag` names the repeating record element).
  * Serializable, fingerprintable leaf like [[ScanParquet]]. */
final case class ReadXml(path: String, rowTag: String = "row")
    extends Rel {
  def children: Seq[Rel] = Nil
}

/** Deferred JDBC read (ref backends connector surface, e.g.
  * postgres/backend.py): url + table captured in the plan; optional
  * numeric partition spec turns the scan into `numPartitions` parallel
  * range-bounded queries — the only JDBC shape that scales (a single
  * unpartitioned JDBC scan is one connection on one executor).
  * `props` carries connection properties; credentials belong in
  * session/environment config, NOT in the serialized (hashed, built,
  * shipped) plan. */
final case class ReadJdbc(
    url: String,
    table: String,
    props: Seq[(String, String)] = Nil,
    partitionColumn: Option[String] = None,
    lowerBound: Long = 0L,
    upperBound: Long = 0L,
    numPartitions: Int = 1) extends Rel {
  // enforced, not just documented: a password in `props` would be
  // serialized into plan JSON, baked into build hashes, persisted to
  // artifacts, and served over GET /plan/<name> (review-caught).
  // Secrets flow through GRAFT_JDBC_USER / GRAFT_JDBC_PASSWORD env
  // vars, applied at lowering and never part of the plan.
  require(!props.exists(kv =>
    Set("password", "secret", "token").contains(kv._1.toLowerCase)),
    "ReadJdbc: credentials must not be embedded in the plan; " +
      "set GRAFT_JDBC_USER / GRAFT_JDBC_PASSWORD in the session " +
      "environment instead")
  // the URL itself is the other leak path (ADVICE r3): both the
  // query-param form (…?user=x&password=y) and the authority form
  // (jdbc:…://user:pass@host/db) would serialize into plan JSON,
  // build hashes, artifacts, and GET /plan/<name>.
  require(!ReadJdbc.urlCredQuery.matcher(url).find() &&
    !ReadJdbc.urlCredAuthority.matcher(url).find(),
    "ReadJdbc: the JDBC URL embeds credentials (password=/secret=/" +
      "token= query param or user:pass@host authority); strip them " +
      "from the URL and use GRAFT_JDBC_USER / GRAFT_JDBC_PASSWORD")
  def children: Seq[Rel] = Nil
}

object ReadJdbc {
  private[rel] val urlCredQuery = java.util.regex.Pattern.compile(
    "(?i)[?&;](password|passwd|pwd|secret|token)=")
  private[rel] val urlCredAuthority = java.util.regex.Pattern.compile(
    "//[^/@\\s]+:[^/@\\s]+@")
}

/** Deferred CSV read with explicit options (defer_utils.py:147). */
final case class ReadCsv(
    path: String,
    header: Boolean = true,
    inferSchema: Boolean = true,
    delimiter: String = ",") extends Rel {
  def children: Seq[Rel] = Nil
}

/** Serializable placeholder bound from a runtime catalog at lowering
  * (ops.UnboundTable, vendor relations.py:404-411). `schema` is the
  * declared (name, dataType DDL) list — validated against the bound
  * table at lowering. */
final case class UnboundTable(
    name: String,
    schema: Seq[(String, String)]) extends Rel {
  def children: Seq[Rel] = Nil
}

/** Raw SQL over named dependency relations (SQLStringView,
  * vendor relations.py:459). */
final case class SqlView(sql: String, deps: Seq[(String, Rel)]) extends Rel {
  def children: Seq[Rel] = deps.map(_._2)
}

/** Literal in-memory relation (ops.InMemoryTable, vendor
  * relations.py:421-436): cells are canonical strings cast to the
  * declared DDL types at lowering, so the table is fully serializable
  * and participates in content hashes. */
final case class InMemory(
    columns: Seq[(String, String)],
    rows: Seq[Seq[String]]) extends Rel {
  def children: Seq[Rel] = Nil
}

/** As-of join as a first-class algebra node (asof_join, vendor
  * types/relations.py:3034-3077) lowering to the one-shuffle
  * union–sort–backfill operator [[graft.ops.AsofJoin]]; being in the
  * algebra makes the op serializable, hashable, and cacheable like any
  * other relation. `toleranceSql` is an interval/numeric SQL expr. */
final case class AsofJoinRel(
    left: Rel,
    right: Rel,
    on: Seq[String],
    leftTime: String,
    rightTime: String,
    rightCols: Seq[(String, String)],
    toleranceSql: Option[String] = None) extends Rel {
  def children: Seq[Rel] = Seq(left, right)
}

/** A cache artifact frozen into a direct read (pin_cache,
  * expr/relations.py:149-405): carries the original subtree's cache
  * hash so unpinning is invertible and audit is possible. */
final case class PinnedRead(artifactPath: String, originalHash: String)
    extends Rel {
  def children: Seq[Rel] = Nil
}

// ------------------------------------------------------------- operators

final case class Project(input: Rel, exprs: Seq[(String, RExpr)]) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

final case class Filter(input: Rel, predicate: RExpr) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** how ∈ inner|left|right|full|cross|left_semi|left_anti (vendor
  * relations.py:202-216; any/asof/positional joins are API rewrites). */
final case class Join(left: Rel, right: Rel, how: String, on: Seq[RExpr])
    extends Rel {
  def children: Seq[Rel] = Seq(left, right)
}

final case class Aggregate(
    input: Rel,
    keys: Seq[(String, RExpr)],
    aggs: Seq[(String, RExpr)]) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Windowed projection: each output column is `fn OVER (partition/order/
  * frame)` (vendor window.py:30-120). frame: None | rows | range with
  * Long bounds (MinValue/MaxValue = unbounded). */
final case class WindowProject(
    input: Rel,
    keep: Seq[String],
    wins: Seq[WinExpr]) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

final case class WinExpr(
    name: String,
    fn: RExpr,
    partitionBy: Seq[RExpr],
    orderBy: Seq[SortKey],
    frame: Option[Frame])

final case class Frame(kind: String, start: Long, end: Long) // rows|range

final case class SortKey(expr: RExpr, asc: Boolean, nullsFirst: Boolean)

final case class Sort(input: Rel, keys: Seq[SortKey]) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

final case class Limit(input: Rel, n: Long, offset: Long = 0) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Distinct with optional subset + keep=first/last (vendor
  * relations.py:504, API types/relations.py:1010). */
final case class Distinct(
    input: Rel,
    on: Seq[String] = Nil,
    orderBy: Seq[SortKey] = Nil,
    keepFirst: Boolean = true) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** kind ∈ union_all|union|intersect|except (relations.py:333-383). */
final case class SetOp(kind: String, left: Rel, right: Rel) extends Rel {
  def children: Seq[Rel] = Seq(left, right)
}

/** Deterministic-by-seed sampling (relations.py:495). */
final case class Sample(input: Rel, fraction: Double, seed: Long)
    extends Rel {
  def children: Seq[Rel] = Seq(input)
}

final case class FillNull(input: Rel, replacements: Seq[(String, String)])
    extends Rel {
  def children: Seq[Rel] = Seq(input)
}

final case class DropNull(input: Rel, how: String, subset: Seq[String])
    extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Explode an array column to rows (TableUnnest, relations.py:509). */
final case class Unnest(input: Rel, column: String, keepEmpty: Boolean)
    extends Rel {
  def children: Seq[Rel] = Seq(input)
}

// ------------------------------------------- xorq-specific differentiators

/** Expression-keyed cache point (CachedNode, expr/relations.py:144-146):
  * resolved by [[graft.cache.CacheManager]] — key = cache hash of
  * `input` (+ strategy source token), hit → artifact read, miss →
  * compute + store. `storage`/`strategy` are symbolic names bound at
  * execution. */
final case class Cache(input: Rel, storage: String, strategy: String)
    extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Materialization barrier between catalogs (RemoteTable/into_backend,
  * expr/relations.py:416-431): the subtree is computed, written to the
  * exchange location, and re-read — downstream operators see a fresh
  * scan in the target catalog. */
final case class Exchange(input: Rel, target: String) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Metadata pass-through (Tag/HashingTag, expr/relations.py:79-99):
  * stripped before execution; `hashing=false` tags are ALSO stripped
  * from the cache hash (ADR-0015 two-hash split). */
final case class Tag(input: Rel, key: String, value: String,
    hashing: Boolean = false) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Write-through (TeeNode, expr/relations.py:102-137): the input is
  * written to `sinkPath` (parquet) when executed AND flows on
  * unchanged. Never part of the cache hash. */
final case class Tee(input: Rel, sinkPath: String) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Write-audit-publish barrier (wap.py:36-214): when executed, the
  * input is STAGED under `sink`, the `audit` plan runs against the
  * staged files (they are bound as [[graft.ops.Wap.StagedBinding]];
  * any row it returns is a violation), and only a clean audit
  * atomically promotes the staged data to the live version — a failed
  * audit throws and leaves the previously-published version untouched.
  * Downstream reads the freshly-published version. Like [[Tee]], the
  * node is an execute-time effect, stripped from the cache hash. */
final case class Publish(input: Rel, sink: String, audit: Rel)
    extends Rel {
  def children: Seq[Rel] = Seq(input, audit)
}

// --------------------------------------------- UDF / ML algebra nodes
//
// The reference serializes UDF and ML nodes into build artifacts
// (expr/udf.py:55-1089; ibis_yaml/translate.py; pipeline_lib.py:109-977)
// so plans containing them hash, cache, and `build`/`run`. Here the
// same property holds: UDXF/UDWF nodes carry the function NAME plus its
// full schema contract (the implementation is resolved from a
// FunctionCatalog at lowering, like UnboundTable from bindings), and ML
// fit/transform nodes carry declarative step SPECS — the fitted model
// is itself a RELATION (a lazy (step, param, value) table), so the
// cache/build/exchange machinery applies to models for free.

/** Table-in/table-out function by registered name (flight_udxf,
  * expr/relations.py:661-823). The declared (name, DDL) schema contract
  * is part of the serialized plan and is validated against the
  * registered implementation at lowering — a renamed or re-typed
  * implementation fails fast instead of silently diverging from the
  * hashed artifact. */
final case class UdxfRel(
    input: Rel,
    fn: String,
    schemaIn: Seq[(String, String)],
    schemaOut: Seq[(String, String)]) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Window function by registered name (the DataFusion WindowEvaluator
  * contract, internal.py:78-107): partition/order/output AND the
  * evaluation mode (`evaluate_all` | `evaluate` | `evaluate_all_with_
  * rank`, expr/udf.py:839-1089) are declared in the plan and validated
  * against the registered [[graft.udf.Udwf]] at lowering — a
  * re-registered function with a different window shape or mode must
  * not silently run under the old hash. */
final case class UdwfRel(
    input: Rel,
    fn: String,
    partitionBy: Seq[String],
    orderBy: Seq[String],
    outName: String,
    outType: String,
    mode: String = "evaluate_all",
    params: Seq[(String, String)] = Nil) extends Rel {
  def children: Seq[Rel] = Seq(input)
}

/** Declarative ML step specs (Step, pipeline_lib.py:109): pure data, so
  * fit/transform plans serialize and hash. Lowered by
  * [[graft.ml.DeferredMl]]. */
sealed trait StepSpec extends Product with Serializable
/** z-score scale `in` → `out` (params mu, sigma). */
final case class ScaleSpec(in: String, out: String) extends StepSpec
/** min-max scale `in` → `out` into [0, 1] (params min, max). */
final case class MinMaxSpec(in: String, out: String) extends StepSpec
/** closed-form linear regression `y ~ x` → `out` (params slope,
  * intercept). */
final case class LinRegSpec(x: String, y: String, out: String)
    extends StepSpec
/** arbitrary registered estimator `label ~ features` → `out` (the
  * reference's any-sklearn-model deferred fit, fit_lib.py:28): fit is
  * a whole-group aggregation producing serialized model BYTES in the
  * model relation (param "model", base64 blob cell); transform
  * broadcasts the bytes into a scalar predict UDF. The estimator NAME
  * is in the (hashed, built) plan; the implementation resolves from
  * the [[graft.udf.FunctionCatalog]] at lowering, like UDXFs. */
final case class EstimatorSpec(estimator: String, features: Seq[String],
    label: String, out: String) extends StepSpec

/** Deferred pipeline fit (Pipeline.fit, pipeline_lib.py:684): lowers to
  * a LAZY model table `(step string, param string, value double)` — fit
  * aggregations stay inside the Spark plan (1-row broadcast joins feed
  * each step's params to the next step's fit), nothing is collected at
  * lowering, and the model participates in caching/builds like any
  * relation. */
final case class FitRel(train: Rel, steps: Seq[StepSpec]) extends Rel {
  def children: Seq[Rel] = Seq(train)
}

/** Apply a fitted model relation to `input` (FittedPipeline.transform,
  * pipeline_lib.py:977): the model child is usually a [[FitRel]], a
  * [[Cache]] over one, or a [[PinnedRead]]/[[ScanParquet]] of a saved
  * model table. */
final case class TransformRel(input: Rel, model: Rel,
    steps: Seq[StepSpec]) extends Rel {
  def children: Seq[Rel] = Seq(input, model)
}

// ------------------------------------------------------------ expressions

/** Scalar/aggregate expression sub-language. Function calls are by
  * Spark function name (lowered via `call_function`); `RRaw` embeds
  * SQL text for anything else. Params (NamedScalarParameter,
  * expr/operations.py:35-82) are substituted before lowering. */
sealed trait RExpr extends Product with Serializable

final case class RCol(name: String) extends RExpr
/** value is the canonical string encoding; dtype is a Spark DDL type. */
final case class RLit(value: String, dtype: String) extends RExpr
final case class RCall(fn: String, args: Seq[RExpr]) extends RExpr
final case class RBin(op: String, left: RExpr, right: RExpr) extends RExpr
final case class RCast(arg: RExpr, dtype: String) extends RExpr
/** Aggregate call with optional FILTER (Filterable, reductions.py:27). */
final case class RAgg(fn: String, args: Seq[RExpr],
    distinct: Boolean = false, filter: Option[RExpr] = None) extends RExpr
/** Named scalar parameter; bound via [[Params.bind]]. */
final case class RParam(name: String, dtype: String,
    default: Option[String] = None) extends RExpr
/** SQL escape hatch. */
final case class RRaw(sql: String) extends RExpr
