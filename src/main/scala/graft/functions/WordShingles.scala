package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over `[a-z]+` tokens as ONE native
  * expression — the codegen kernel behind the SetSimJoin element
  * universe (`explode(graft_word_shingles(text, n, minTokens))`).
  *
  * Exact parity with the SQL pipeline it replaces
  * (`regexp_extract_all(text, '[a-z]+', 0)` → `size(ts) >= minTokens`
  * filter → distinct n-gram join-with-space rows — WordShinglesSpec
  * pins it):
  *  - tokens are maximal runs of the bytes 'a'..'z'. Java regex
  *    `[a-z]+` matches exactly those runs, and no UTF-8 continuation
  *    byte falls in that range, so a byte scan over the raw UTF8String
  *    is equivalent — no String materialization, no regex engine;
  *  - fewer than `minTokens` tokens → empty array (the caller-side
  *    size filter), else fewer than `n` → the whole token run as one
  *    shingle (the wordShingles short-doc fallback);
  *  - shingles are de-duplicated on their BYTES (never on a hash), so
  *    the array equals `array_distinct` of the lambda formulation.
  *
  * Why it exists: the array-lambda shingler is interpreted (~9 s of
  * sf0.1 runtime on its own) and even the window-lead reformulation
  * pays a posexplode of every token plus a corpus shuffle for the
  * per-doc ordering; this kernel is one codegen'd pass per document
  * with zero shuffles before the element rows exist. */
case class WordShingles(child: Expression, n: Int, minTokens: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && minTokens >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles expects a string column with positive n, " +
        s"got $other n=$n minTokens=$minTokens")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n, minTokens)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.compute($c, $n, $minTokens)")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)

  override def prettyName: String = "graft_word_shingles"
}

object WordShingles {

  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String, n: Int, minTokens: Int): ArrayData = {
    val numBytes = s.numBytes
    val bytes = new Array[Byte](numBytes)
    s.writeToMemory(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    // token spans = maximal runs of 'a'..'z' bytes
    var nTok = 0
    var offs = new Array[Int](16)
    var lens = new Array[Int](16)
    var p = 0
    while (p < numBytes) {
      val b = bytes(p)
      if (b >= 'a' && b <= 'z') {
        val start = p
        p += 1
        while (p < numBytes && bytes(p) >= 'a' && bytes(p) <= 'z') p += 1
        if (nTok == offs.length) {
          offs = java.util.Arrays.copyOf(offs, nTok * 2)
          lens = java.util.Arrays.copyOf(lens, nTok * 2)
        }
        offs(nTok) = start; lens(nTok) = p - start; nTok += 1
      } else p += 1
    }
    if (nTok < minTokens) return new GenericArrayData(new Array[Any](0))

    val nSh = if (nTok < n) 1 else nTok - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nSh) {
      val end = if (nTok < n) nTok else i + n
      var len = 0
      var t = i
      while (t < end) {
        val tl = lens(t)
        if (len + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf,
            math.max(buf.length * 2, len + tl + 1))
        if (t > i) { buf(len) = ' '; len += 1 }
        System.arraycopy(bytes, offs(t), buf, len, tl)
        len += tl
        t += 1
      }
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
