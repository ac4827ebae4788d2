package graft.udf

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Library-shipped named functions, available in every default catalog
  * (the analogue of the reference's packaged exchangers,
  * flight/exchanger.py:119-392): build artifacts that reference these
  * names run anywhere the library runs — including `Cli run`, which has
  * no access to the code that authored the plan. */
object Builtins {

  /** Deterministic per-row text statistics as a table→table exchange
    * function: (doc_id, text) → (doc_id, n_chars, n_tokens, head).
    * Imperative partition-local logic — the UDXF contract — though the
    * semantics are SQL-mirrorable, which is what makes it oracle-able. */
  val docStats: Udxf = Udxf(
    name = "doc_stats",
    schemaIn = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
    schemaOut = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_chars", IntegerType),
      StructField("n_tokens", IntegerType),
      StructField("head", StringType))),
    process = it => it.map { r =>
      val id = r.getLong(0)
      val t = if (r.isNullAt(1)) "" else r.getString(1)
      val toks = t.trim.split("\\s+").count(_.nonEmpty)
      Row(id, t.length, toks, t.take(8).toLowerCase)
    })

  val catalog: FunctionCatalog = FunctionCatalog(
    udxfs = Map(docStats.name -> docStats))
}
