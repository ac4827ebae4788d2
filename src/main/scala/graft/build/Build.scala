package graft.build

import graft.rel._
import java.nio.file.{Files, Paths}

/** Content-hashed build artifacts — the `xorq build` / `xorq run`
  * lifecycle (ref ibis_yaml/compiler.py: build_expr :994, ExprDumper
  * :571, ArtifactStore.get_expr_hash :283): a plan is serialized to its
  * canonical JSON under `builds/<build-hash>/` together with its hashes
  * and metadata, and can be re-loaded and re-executed elsewhere without
  * the code that built it.
  *
  * Layout:  <dir>/<hash>/plan.json      canonical serialized plan
  *          <dir>/<hash>/metadata.json  build hash, cache hash, engine
  */
object Build {

  final case class Artifact(hash: String, path: String, rel: Rel)

  /** Serialize `rel` into `buildsDir/<buildHash>/`; idempotent (same
    * plan → same dir). Returns the artifact descriptor. */
  def save(rel: Rel, buildsDir: String): Artifact = {
    val hash = RelHash.buildHash(rel)
    val dir = Paths.get(buildsDir, hash)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("plan.json"), RelJson.write(rel))
    Files.writeString(dir.resolve("metadata.json"),
      s"""{"build_hash":"$hash","cache_hash":"${RelHash.cacheHash(rel)}",""" +
        s""""engine":"spark","format":"graft-rel-json-v1"}""")
    Artifact(hash, dir.toString, rel)
  }

  /** Load a build by hash; verifies the stored plan still matches its
    * directory hash (tamper/corruption check — the reference verifies
    * roundtrip idempotence the same way, ibis_yaml round-trip tests). */
  def load(buildsDir: String, hash: String): Rel = {
    val planPath = Paths.get(buildsDir, hash, "plan.json")
    require(Files.exists(planPath), s"no build $hash under $buildsDir")
    val rel = RelJson.parse(Files.readString(planPath))
    val rehash = RelHash.buildHash(rel)
    require(rehash == hash,
      s"build $hash fails verification: plan rehashes to $rehash")
    rel
  }

  /** List available build hashes. */
  def list(buildsDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(buildsDir)
    if (!Files.exists(d)) Nil
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(p => Files.exists(p.resolve("plan.json")))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }
}
