package graft.build

import graft.rel._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Build lineage + replay verification — the reference's catalog
  * tooling beyond alias→hash (catalog/replay.py re-executes a
  * cataloged expr and checks it still produces the recorded result;
  * content_store.py keeps everything content-addressed).
  *
  * [[Lineage.of]] walks a plan and reports everything its execution
  * depends on: file-backed sources (with size/mtime fingerprints taken
  * NOW, so later drift is detectable), unbound table names, referenced
  * UDXF/UDWF/estimator names, cache points, and effect sinks. The
  * report is JSON beside the build artifact (`lineage.json`).
  *
  * [[Replay.record]] executes a build and stores an order-insensitive
  * result fingerprint (`result.json`: row count + xor-folded xxhash64
  * over all columns — computed DISTRIBUTED, nothing collected).
  * [[Replay.verify]] re-executes and compares, reporting `ok`,
  * `drift` (sources changed since lineage capture — the expected
  * explanation for a mismatch), or `mismatch` (same sources, different
  * result: nondeterminism or environment change). That is the
  * reproducibility contract `xorq run` implies, made checkable.
  */
object Lineage {

  final case class Source(kind: String, path: String,
      length: Long, mtime: Long)

  final case class Report(
      buildHash: String,
      sources: Seq[Source],
      unbound: Seq[String],
      functions: Seq[String],
      caches: Seq[String],
      sinks: Seq[String]) {

    def toJson: String = {
      def q(s: String) = RelJson.escape(s)
      def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
      val srcs = sources.map(s =>
        s"""{"kind":${q(s.kind)},"path":${q(s.path)},""" +
          s""""length":${s.length},"mtime":${s.mtime}}""")
        .mkString("[", ",", "]")
      s"""{"build_hash":${q(buildHash)},"sources":$srcs,""" +
        s""""unbound":${arr(unbound)},"functions":${arr(functions)},""" +
        s""""caches":${arr(caches)},"sinks":${arr(sinks)}}"""
    }
  }

  /** Walk `rel` and capture its dependency surface; file fingerprints
    * are taken from the live filesystem (absent files get length/mtime
    * -1 rather than failing — lineage of a plan whose inputs moved is
    * still useful). */
  def of(rel: Rel, spark: SparkSession): Report = {
    val sources = Seq.newBuilder[Source]
    val unbound = Seq.newBuilder[String]
    val functions = Seq.newBuilder[String]
    val caches = Seq.newBuilder[String]
    val sinks = Seq.newBuilder[String]
    val conf = spark.sessionState.newHadoopConf()

    def fingerprint(kind: String, path: String): Unit = {
      val p = new Path(path)
      val (len, mtime) =
        try {
          val fs = FileSystem.get(p.toUri, conf)
          if (fs.exists(p)) {
            val st = fs.getFileStatus(p)
            if (st.isDirectory) {
              // directory source (parquet/arrow dir): fold child files
              val parts = fs.listStatus(p).filter(_.isFile)
              (parts.map(_.getLen).sum, parts.map(_.getModificationTime)
                .foldLeft(0L)(math.max))
            } else (st.getLen, st.getModificationTime)
          } else (-1L, -1L)
        } catch { case scala.util.control.NonFatal(_) => (-1L, -1L) }
      sources += Source(kind, path, len, mtime)
    }

    def walk(r: Rel): Unit = {
      r match {
        case ScanParquet(p) => fingerprint("parquet", p)
        case ScanArrow(p) => fingerprint("arrow", p)
        case ReadCsv(p, _, _, _) => fingerprint("csv", p)
        case ReadDelta(p) => fingerprint("delta", p)
        case ReadAvro(p) => fingerprint("avro", p)
        case ReadXml(p, _) => fingerprint("xml", p)
        case PinnedRead(p, k) => fingerprint("pinned", p); caches += k
        case ReadJdbc(url, table, _, _, _, _, _) =>
          sources += Source("jdbc", s"$url#$table", -1L, -1L)
        case UnboundTable(n, _) => unbound += n
        case InMemory(_, _) => ()
        case SqlView(_, _) => ()
        case UdxfRel(_, fn, _, _) => functions += s"udxf:$fn"
        case u: UdwfRel => functions += s"udwf:${u.fn}"
        case FitRel(_, steps) => steps.foreach {
          case EstimatorSpec(est, _, _, _) => functions += s"estimator:$est"
          case _ => ()
        }
        case TransformRel(_, _, steps) => steps.foreach {
          case EstimatorSpec(est, _, _, _) => functions += s"estimator:$est"
          case _ => ()
        }
        case Cache(in, storage, strategy) =>
          caches += s"$storage/$strategy/${RelHash.cacheHash(in)}"
        case Tee(_, sink) => sinks += s"tee:$sink"
        case Publish(_, sink, _) => sinks += s"publish:$sink"
        case Exchange(_, target) => sinks += s"exchange:$target"
        case _ => ()
      }
      r.children.foreach(walk)
    }
    walk(rel)
    Report(RelHash.buildHash(rel),
      sources.result().distinct, unbound.result().distinct,
      functions.result().distinct, caches.result().distinct,
      sinks.result().distinct)
  }

  /** Capture lineage for a saved build and write `lineage.json` beside
    * its plan. Returns the report. */
  def capture(buildsDir: String, hash: String,
      spark: SparkSession): Report = {
    val rel = Build.load(buildsDir, hash)
    val report = of(rel, spark)
    Files.writeString(Paths.get(buildsDir, hash, "lineage.json"),
      report.toJson)
    report
  }

  /** True if any file-backed source recorded in `lineage.json` has a
    * different (length, mtime) now. */
  def drifted(buildsDir: String, hash: String,
      spark: SparkSession): Boolean = {
    val p = Paths.get(buildsDir, hash, "lineage.json")
    if (!Files.exists(p)) false
    else {
      val rec = RelJson.parseAny(Files.readString(p))
        .asInstanceOf[Map[String, Any]]
      val now = of(Build.load(buildsDir, hash), spark)
        .sources.map(s => s.path -> (s.length, s.mtime)).toMap
      rec("sources").asInstanceOf[List[Any]].exists { x =>
        val m = x.asInstanceOf[Map[String, Any]]
        val path = m("path").asInstanceOf[String]
        def n(k: String) = m(k) match {
          case l: Long => l
          case i: Int => i.toLong
          case d: Double => d.toLong
        }
        now.get(path).forall(_ != ((n("length"), n("mtime"))))
      }
    }
  }
}

/** Execute-and-fingerprint reproducibility checks over saved builds. */
object Replay {

  final case class Fingerprint(rows: Long, checksum: Long) {
    def toJson: String = s"""{"rows":$rows,"checksum":$checksum}"""
  }

  sealed trait Outcome
  case object Ok extends Outcome
  /** Result changed AND lineage shows a source changed — expected. */
  case object Drift extends Outcome
  /** Result changed with NO recorded source change — nondeterminism. */
  case object Mismatch extends Outcome

  /** Order-insensitive distributed fingerprint: xor-fold of per-row
    * xxhash64 over every column (the Bench checksum shape — forces
    * full materialization, collects two longs). */
  def fingerprint(df: DataFrame): Fingerprint = {
    val r = df
      .select(xxhash64(df.columns.map(col).toSeq: _*).as("__h"))
      .agg(count(lit(1)), coalesce(bit_xor(col("__h")), lit(0L)))
      .collect()(0)
    Fingerprint(r.getLong(0), r.getLong(1))
  }

  private def execute(buildsDir: String, hash: String,
      spark: SparkSession): DataFrame =
    new graft.api.GraftSession(spark,
      functions = graft.udf.Builtins.catalog)
      .execute(Build.load(buildsDir, hash))

  /** Execute build `hash`, record its result fingerprint and lineage
    * beside the artifact. */
  def record(buildsDir: String, hash: String,
      spark: SparkSession): Fingerprint = {
    val fp = fingerprint(execute(buildsDir, hash, spark))
    Files.writeString(Paths.get(buildsDir, hash, "result.json"), fp.toJson)
    Lineage.capture(buildsDir, hash, spark)
    fp
  }

  /** Re-execute and compare against the recorded fingerprint. */
  def verify(buildsDir: String, hash: String,
      spark: SparkSession): Outcome = {
    val p = Paths.get(buildsDir, hash, "result.json")
    require(Files.exists(p), s"no recorded result for $hash; run record")
    val rec = RelJson.parseAny(Files.readString(p))
      .asInstanceOf[Map[String, Any]]
    def n(k: String) = rec(k) match {
      case l: Long => l
      case i: Int => i.toLong
      case d: Double => d.toLong
    }
    val now = fingerprint(execute(buildsDir, hash, spark))
    if (now.rows == n("rows") && now.checksum == n("checksum")) Ok
    else if (Lineage.drifted(buildsDir, hash, spark)) Drift
    else Mismatch
  }
}
