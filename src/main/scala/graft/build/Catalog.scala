package graft.build

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Named catalog over build artifacts (the reference's git-native
  * catalog, python/xorq/catalog: alias → expr-hash entries): a plain
  * line-oriented `catalog.tsv` under the builds dir mapping
  * `name<TAB>hash`, newest entry wins. File-based so it versions in
  * git exactly like the reference's. */
final class Catalog(buildsDir: String) {

  private val file = Paths.get(buildsDir, "catalog.tsv")

  private def entries: Seq[(String, String)] =
    if (!Files.exists(file)) Nil
    else Files.readAllLines(file).asScala.toSeq
      .filter(_.contains('\t'))
      .map { l => val Array(n, h) = l.split('\t'); (n, h) }

  /** Point `name` at a build hash (appends; latest wins). */
  def register(name: String, hash: String): Unit = {
    require(!name.contains('\t') && !name.contains('\n'), "bad alias")
    require(Files.exists(Paths.get(buildsDir, hash, "plan.json")),
      s"no build $hash to register")
    Files.createDirectories(file.getParent)
    Files.writeString(file,
      (entries :+ (name, hash)).map { case (n, h) => s"$n\t$h" }
        .mkString("", "\n", "\n"))
  }

  def resolve(name: String): Option[String] =
    entries.filter(_._1 == name).lastOption.map(_._2)

  def aliases: Map[String, String] =
    entries.groupBy(_._1).view.mapValues(_.last._2).toMap

  /** The raw (name, hash) entry list, oldest first — the merge unit. */
  def entryList: Seq[(String, String)] = entries

  /** Replace the whole entry list (merge result write-back). */
  def writeEntries(all: Seq[(String, String)]): Unit = {
    Files.createDirectories(file.getParent)
    Files.writeString(file,
      all.map { case (n, h) => s"$n\t$h" }.mkString("", "\n", "\n"))
  }

  /** Three-way merge THIS catalog (ours) with `theirs` against the
    * common ancestor `base`, writing the merged entry list here —
    * the collaboration half of the reference's git-native catalog
    * (catalog/catalog.py:201 `_three_way_list_merge` + the alias-
    * divergence conflict surface of `Catalog.pull`). Throws
    * [[CatalogMergeConflict]] (writing NOTHING) when both sides
    * repointed the same alias to different builds. */
  def merge(theirs: Seq[(String, String)],
      base: Seq[(String, String)]): Seq[(String, String)] = {
    val merged = Catalog.threeWayMerge(base, entryList, theirs)
    writeEntries(merged)
    merged
  }
}

/** Both sides repointed an alias to different builds — unresolvable
  * without a human choice, exactly the reference's diverging-alias
  * merge conflict. `conflicts` = (alias, ours hash, theirs hash). */
final case class CatalogMergeConflict(
    conflicts: Seq[(String, String, String)])
  extends RuntimeException(
    "catalog merge conflict on " + conflicts.map { case (a, o, t) =>
      s"'$a' (ours $o vs theirs $t)" }.mkString(", ") +
      "; repoint the alias on one side and merge again")

object Catalog {

  /** The reference's `_three_way_list_merge` over (alias, hash)
    * entries — ordered lists treated as sets, ours-first: an entry in
    * `base` dropped by either side is a removal; entries added by
    * either side survive; duplicates collapse — plus the RESOLUTION
    * rule the symlink layer gives the reference: when both sides
    * repointed the same alias, agreeing targets collapse, diverging
    * targets throw [[CatalogMergeConflict]]; when one side repointed
    * and the other didn't, the repointing side's target must win
    * latest-wins resolution in the merged list, so a pinning entry is
    * appended when plain concatenation order would resolve wrongly. */
  def threeWayMerge(
      base: Seq[(String, String)],
      ours: Seq[(String, String)],
      theirs: Seq[(String, String)]): Seq[(String, String)] = {
    val baseSet = base.toSet
    val oursSet = ours.toSet
    val theirsSet = theirs.toSet
    val out = Seq.newBuilder[(String, String)]
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    (ours ++ theirs).foreach { e =>
      if (!seen(e)) {
        seen += e
        // in base and dropped by at least one side -> removal wins
        if (!(baseSet(e) && (!oursSet(e) || !theirsSet(e)))) out += e
      }
    }
    val merged = out.result()

    def resolveIn(es: Seq[(String, String)], a: String): Option[String] =
      es.filter(_._1 == a).lastOption.map(_._2)
    val allAliases =
      (base ++ ours ++ theirs).map(_._1).distinct
    val conflicts = Seq.newBuilder[(String, String, String)]
    val pins = Seq.newBuilder[(String, String)]
    allAliases.foreach { a =>
      val b = resolveIn(base, a)
      val o = resolveIn(ours, a)
      val t = resolveIn(theirs, a)
      val winner: Option[String] = (o, t) match {
        case (Some(x), Some(y)) if x == y => Some(x)
        case (Some(x), Some(y)) => // both present, different
          if (t == b) Some(x)        // only ours repointed
          else if (o == b) Some(y)   // only theirs repointed
          else { conflicts += ((a, x, y)); None }
        case (Some(x), None) =>
          // theirs deleted the alias: deletion wins if ours didn't
          // also repoint it (modify/delete divergence = conflict)
          if (o == b) None
          else if (b.isEmpty) Some(x) // ours ADDED it, theirs never had it
          else { conflicts += ((a, x, "<deleted>")); None }
        case (None, Some(y)) =>
          if (t == b) None
          else if (b.isEmpty) Some(y)
          else { conflicts += ((a, "<deleted>", y)); None }
        case (None, None) => None    // dropped everywhere
      }
      winner.foreach { w =>
        if (!resolveIn(merged, a).contains(w)) pins += ((a, w))
      }
    }
    val cs = conflicts.result()
    if (cs.nonEmpty) throw CatalogMergeConflict(cs)
    merged ++ pins.result()
  }
}

/** Git-remote-style sync of a catalog and its referenced build
  * artifacts through a BARE file remote — a builds-dir-shaped
  * directory addressed as a plain path or `file://` URL. This is the
  * transport half of the reference's git-native catalog
  * (python/xorq/catalog: git remotes + annex/s3 artifact transport),
  * re-expressed for shared storage: artifacts are content-hash-keyed
  * and IMMUTABLE, so transfer is copy-if-absent (idempotent, safe
  * under concurrent pushers); the alias TSV is the only mutable state
  * and moves through [[Catalog.threeWayMerge]] with a per-remote
  * tracking snapshot (the "remote-tracking ref") under
  * `<local>/.sync/`.
  *
  *  - [[pull]]: copy referenced artifacts the local store lacks,
  *    three-way-merge the remote entry list into the local catalog
  *    (base = the last-seen remote state), record the new base.
  *    Diverging aliases throw [[CatalogMergeConflict]] before
  *    anything is written locally.
  *  - [[push]]: FAST-FORWARD ONLY — if the remote gained entries the
  *    local catalog has not absorbed, push refuses with "pull first"
  *    (the git contract; prevents silently clobbering a concurrent
  *    publisher). Otherwise copy missing artifacts up and overwrite
  *    the remote TSV with the local entry list.
  */
object CatalogSync {

  private def dirOf(remote: String): java.nio.file.Path =
    Paths.get(
      if (remote.startsWith("file://"))
        java.net.URI.create(remote).getPath
      else remote)

  private def readTsv(f: java.nio.file.Path): Seq[(String, String)] =
    if (!Files.exists(f)) Nil
    else Files.readAllLines(f).asScala.toSeq
      .filter(_.contains('\t'))
      .map { l => val Array(n, h) = l.split('\t'); (n, h) }

  private def writeTsv(
      f: java.nio.file.Path, es: Seq[(String, String)]): Unit = {
    Files.createDirectories(f.getParent)
    Files.writeString(f,
      es.map { case (n, h) => s"$n\t$h" }.mkString("", "\n", "\n"))
  }

  /** Last-seen remote entry list, keyed by the remote's absolute
    * path — one tracking snapshot per distinct remote. */
  private def trackingFile(
      localDir: String, remote: String): java.nio.file.Path = {
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(dirOf(remote).toAbsolutePath.normalize.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    Paths.get(localDir, ".sync", s"$id.tsv")
  }

  /** Copy build dir `hash` from `src` to `dst` if absent there.
    * Content-hash keying makes this idempotent; a partial copy is
    * repaired by re-copying files individually. */
  private def copyArtifact(src: java.nio.file.Path,
      dst: java.nio.file.Path, hash: String): Unit = {
    val from = src.resolve(hash)
    val to = dst.resolve(hash)
    if (Files.exists(from.resolve("plan.json")) &&
        !Files.exists(to.resolve("plan.json"))) {
      Files.createDirectories(to)
      val s = Files.list(from)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).foreach {
        p => Files.copy(p, to.resolve(p.getFileName.toString),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally s.close()
    }
  }

  /** Merge the remote catalog into `localDir` (three-way against the
    * last-seen remote state) and fetch referenced artifacts the local
    * store lacks. Returns the merged entry list. */
  def pull(localDir: String, remote: String): Seq[(String, String)] = {
    val rdir = dirOf(remote)
    require(Files.exists(rdir), s"no remote at $remote")
    val theirs = readTsv(rdir.resolve("catalog.tsv"))
    val local = new Catalog(localDir)
    val base = readTsv(trackingFile(localDir, remote))
    val merged = Catalog.threeWayMerge(base, local.entryList, theirs)
    // artifacts first, TSV second: a crash mid-pull leaves extra
    // immutable artifacts (harmless), never an alias with no build
    merged.map(_._2).distinct
      .foreach(copyArtifact(rdir, Paths.get(localDir), _))
    local.writeEntries(merged)
    writeTsv(trackingFile(localDir, remote), theirs)
    merged
  }

  /** Publish the local catalog + referenced artifacts to the remote.
    * Fast-forward only: refuses when the remote holds entries neither
    * in the last-sync base nor already absorbed locally. */
  def push(localDir: String, remote: String): Seq[(String, String)] = {
    val rdir = dirOf(remote)
    Files.createDirectories(rdir)
    val theirs = readTsv(rdir.resolve("catalog.tsv"))
    val entries = new Catalog(localDir).entryList
    val baseSet = readTsv(trackingFile(localDir, remote)).toSet
    val entrySet = entries.toSet
    if (!(theirs.toSet == baseSet || theirs.forall(entrySet))) {
      val foreign = theirs.filterNot(e => baseSet(e) || entrySet(e))
      throw new IllegalStateException(
        s"push to $remote is not fast-forward: the remote has " +
          s"${foreign.size} entries unseen locally (e.g. " +
          s"${foreign.head._1} -> ${foreign.head._2}); pull first")
    }
    entries.map(_._2).distinct
      .foreach(copyArtifact(Paths.get(localDir), rdir, _))
    writeTsv(rdir.resolve("catalog.tsv"), entries)
    writeTsv(trackingFile(localDir, remote), entries)
    entries
  }
}
