package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction for LLM training-data pipelines.
  *
  * The reference engine ships no PII pass; real corpus prep (C4, Dolma,
  * FineWeb) runs one before anything else, so this is a first-class
  * pipeline operator here. Design for 100 TB:
  *
  *  - Every rule is a single `regexp_replace` / `regexp_count` COLUMN
  *    expression — per-row, whole-stage-codegen'd, zero shuffles. A
  *    redaction pass over a petabyte corpus is a pure map stage that
  *    scales linearly with executors.
  *  - Rules are applied in declaration order by folding
  *    `regexp_replace`; order matters (emails are redacted before the
  *    digit-run rules so an address's digits can't be half-eaten by the
  *    phone pattern).
  *  - Patterns are deliberately RE2-safe (no backreferences, no
  *    lookaround) so the exact same regex runs on Spark (java.util.regex)
  *    and any RE2-family engine a user cross-checks against.
  */
object Pii {

  /** One redaction rule: class name, detection regex, replacement tag. */
  final case class Rule(name: String, pattern: String, tag: String)

  /** Default rule set, applied in order. Email first (its local part may
    * contain digit runs the later rules would otherwise split). */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("ccn",   "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b",               "<CC>"),
    Rule("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b",                      "<SSN>"),
    Rule("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b",                      "<PHONE>"),
    Rule("ipv4",  "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  )

  /** Redacted text: fold `regexp_replace` over the rules in order. */
  def redact(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text)((t, r) => regexp_replace(t, r.pattern, r.tag))

  /** Per-class match count on the ORIGINAL text (counts are taken before
    * any redaction so overlapping rule order can't hide a hit). */
  def count(text: Column, rule: Rule): Column =
    size(regexp_extract_all(text, lit(rule.pattern), lit(0)))

  /** Scan a corpus: returns the input plus `<name>_n` count columns, a
    * `pii_total`, the redacted text, and a `quarantine` flag for rows
    * whose PII density crosses `maxHits` (pipelines typically drop rather
    * than scrub such rows — a form-letter page that is 50% emails is
    * boilerplate, not prose). */
  def scan(df: DataFrame, textCol: String,
           rules: Seq[Rule] = defaultRules,
           maxHits: Int = 8): DataFrame = {
    val t = col(textCol)
    val counted = rules.foldLeft(df)((d, r) =>
      d.withColumn(s"${r.name}_n", size(regexp_extract_all(t, lit(r.pattern), lit(0)))))
    counted
      .withColumn("pii_total",
        rules.map(r => col(s"${r.name}_n")).reduce(_ + _))
      .withColumn("text_redacted", redact(t, rules))
      .withColumn("quarantine", col("pii_total") > maxHits)
  }
}
