package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning, as ONE native
  * codegen expression: lowercase → NFC canonical compose → accent
  * strip (NFD decompose, drop combining marks \p{Mn}) → whitespace
  * collapse to single spaces → trim. The standard pre-tokenization
  * cleanup a training-data pipeline runs before dedup/fingerprinting,
  * matching the composition
  * `trim(regexp_replace(strip_accents(nfc_normalize(lower(x))),
  * '\s+', ' '))` of engines that ship those primitives (DuckDB/
  * utf8proc semantics on the canonical-decomposable range: composed
  * and decomposed inputs normalize identically, é and e+◌́ both → e).
  *
  * Per-row pure map — no shuffle, partition-local, NULL in → NULL
  * out. Reference analogue: the cleaning stage of its pipeline
  * examples (the reference ships no normalization operator; this is
  * pipeline value-add like the rest of the LLM tier).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    NormalizeText.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object NormalizeText {

  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")
  // \s (ASCII) — matches RE2's \s class used by the SQL oracles
  private val Spaces = java.util.regex.Pattern.compile("[ \\t\\n\\x0B\\f\\r]+")

  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val composed = Normalizer.normalize(lowered, Normalizer.Form.NFC)
    val stripped = Marks.matcher(
      Normalizer.normalize(composed, Normalizer.Form.NFD)).replaceAll("")
    val collapsed = Spaces.matcher(stripped).replaceAll(" ").trim
    UTF8String.fromString(collapsed)
  }
}
