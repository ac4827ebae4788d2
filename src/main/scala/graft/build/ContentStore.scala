package graft.build

import graft.cache.CacheManager
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Orphan-artifact sweep over cache / exchange roots — the disposal
  * half of the reference's content store (catalog/content_store.py
  * keeps artifacts content-addressed; anything no longer addressed is
  * garbage). An artifact directory under a swept root is LIVE when
  *
  *  1. some catalog alias resolves to a build whose plan still
  *     references the artifact's key through a Cache / Exchange /
  *     PinnedRead node (under either keying strategy), or
  *  2. the artifact's own `_graft_plan.json` sidecar re-keys to the
  *     directory's name — i.e. re-executing the recorded input plan
  *     TODAY would hit this artifact. A sidecar whose recomputed key
  *     differs names a stale artifact (its sources drifted): orphan.
  *
  * Everything else — including bare directories with no sidecar — is
  * an orphan. `sweep(delete = false)` reports without touching disk;
  * `delete = true` removes recursively via the Hadoop FileSystem (so
  * HDFS/S3 roots behave like local disk). The live set errs on the
  * side of keeping: a key that matches under EITHER snapshot or mtime
  * keying is kept, and unreadable sidecars keep their artifact.
  */
object ContentStore {

  final case class Sweep(kept: Seq[String], orphans: Seq[String],
      removed: Boolean) {
    def toJson: String = {
      def arr(xs: Seq[String]) =
        xs.map(graft.rel.RelJson.escape).mkString("[", ",", "]")
      s"""{"kept":${arr(kept)},"orphans":${arr(orphans)},""" +
        s""""removed":$removed}"""
    }
  }

  /** Keys referenced by every build any catalog alias points at.
    * Builds that fail to load (deleted by hand) contribute nothing —
    * the sweep must not die on a half-broken catalog. */
  def catalogKeys(catalog: Catalog, buildsDir: String,
      manager: CacheManager): Set[String] =
    catalog.aliases.values.toSet.flatMap { (h: String) =>
      try manager.referencedKeys(Build.load(buildsDir, h))
      catch { case scala.util.control.NonFatal(_) => Set.empty[String] }
    }

  /** Inspect (and optionally delete) orphan artifact directories under
    * `roots`. Returns kept/orphan paths; with `delete = true` the
    * orphans are removed before returning. */
  def sweep(spark: SparkSession, catalog: Catalog, buildsDir: String,
      manager: CacheManager, roots: Seq[String],
      delete: Boolean = false): Sweep = {
    val live = catalogKeys(catalog, buildsDir, manager)
    val conf = spark.sessionState.newHadoopConf()
    val kept = Seq.newBuilder[String]
    val orphans = Seq.newBuilder[String]
    roots.foreach { root =>
      val rp = new Path(root)
      val fs = FileSystem.get(rp.toUri, conf)
      if (fs.exists(rp)) {
        fs.listStatus(rp).filter(_.isDirectory).foreach { st =>
          val dir = st.getPath
          val key = dir.getName
          val isLive =
            live.contains(key) || {
              // sidecar liveness: does the recorded input still key
              // onto this directory? An unreadable sidecar keeps the
              // artifact (sweep must fail safe)
              try manager.sidecarPlan(dir.toString)
                .exists(in => manager.possibleKeys(in).contains(key))
              catch { case scala.util.control.NonFatal(_) => true }
            }
          if (isLive) kept += dir.toString
          else {
            orphans += dir.toString
            if (delete) fs.delete(dir, true)
          }
        }
      }
    }
    Sweep(kept.result().sorted, orphans.result().sorted, delete)
  }
}
