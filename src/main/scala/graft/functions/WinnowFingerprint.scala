package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints as ONE native expression: md5 each
  * character `gram`-gram, take the minimum hash of every rolling
  * `win`-window, and return the DISTINCT minima in first-appearance
  * order (Schleimer/Wilkerson/Aiken winnowing, the scheme
  * `text_fingerprint` checks).
  *
  * The explode + window-frame formulation computes the same thing but
  * pays a posexplode to ~(len−gram) rows per document and a
  * partition-sort exchange for the rolling min; this expression is a
  * per-row loop — no explode, no shuffle, the whole query becomes scan
  * → project → orderBy. Hash values are IDENTICAL to Spark's
  * `md5(substr(tx, i, gram) CAST AS BINARY)`: same UTF-8 gram bytes,
  * same lowercase-hex rendering, so the DuckDB oracle is unchanged. */
case class WinnowFingerprint(child: Expression, gram: Int, win: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if gram >= 1 && win >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects a string column and positive gram/window, " +
        s"got $other gram=$gram win=$win")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprint.compute(v.asInstanceOf[UTF8String], gram, win)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprint.compute($c, $gram, $win)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprint = copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowFingerprint {

  private val Hex = "0123456789abcdef".toCharArray

  /** Static kernel shared by eval and generated code. Returns the
    * distinct rolling-window md5 minima (first-appearance order) of
    * the input's character grams; empty array when the text is too
    * short for one full window. */
  def compute(s: UTF8String, gram: Int, win: Int): ArrayData = {
    val str = s.toString
    // gram boundaries by UNICODE CODE POINT, not UTF-16 code unit:
    // Spark's substr counts code points, so supplementary-plane text
    // (emoji, rare CJK) must gram the same way or the documented
    // md5(substr(...)) parity breaks (advisor r5)
    val cpCount = str.codePointCount(0, str.length)
    val n = cpCount - gram + 1
    if (n < win) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](cpCount + 1)
    var ci = 0
    var u = 0
    while (ci < cpCount) {
      off(ci) = u
      u = str.offsetByCodePoints(u, 1)
      ci += 1
    }
    off(cpCount) = str.length
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      val bytes = md.digest(
        str.substring(off(i), off(i + gram))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val out = new Array[Char](32)
      var k = 0
      while (k < 16) {
        out(2 * k) = Hex((bytes(k) >> 4) & 0xf)
        out(2 * k + 1) = Hex(bytes(k) & 0xf)
        k += 1
      }
      hashes(i) = new String(out)
      md.reset()
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j <= n - win) {
      var m = hashes(j)
      var k = 1
      while (k < win) {
        if (hashes(j + k).compareTo(m) < 0) m = hashes(j + k)
        k += 1
      }
      seen.add(m)
      j += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(arr)
  }
}
