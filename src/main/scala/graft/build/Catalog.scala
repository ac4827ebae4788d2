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
}
