package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash-LSH band keys as ONE native expression: word shingles →
  * k min-hashes → banded keys, per row, in a fused loop.
  *
  * The aggregate formulation pays posexplode to ~(tokens) rows per
  * document, a window pass for the shingle leads, a 32-column min
  * aggregate, and a band projection. This expression computes the
  * identical (band, key) structs straight from the cleaned text —
  * feed it to `explode(...)` so the Generate evaluates it exactly
  * once per row (materializing a signature column and re-deriving
  * bands from it would get CollapseProject-inlined k times).
  *
  * Exact parity with the aggregate path (MinhashBandsSpec proves it):
  *  - tokens: Java regex split on `\\s+` with limit −1 — precisely
  *    Spark's `split`; pass `lower(trim(text))` as the child so the
  *    cleaning matches too;
  *  - shingles: all n-grams joined with " "; fewer than n tokens →
  *    the whole token run as ONE shingle (the shingleRows fallback);
  *  - h_s = min over shingles of Spark's xxhash64(lit(s), shingle) =
  *    hashBytes(utf8, hashInt(s, 42));
  *  - band key b = xxhash64(lit(b), h_{b·r} … h_{b·r+r−1}) =
  *    hashLong chain seeded with hashInt(b, 42). */
case class MinhashBands(child: Expression, shingleN: Int, k: Int,
    bands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("band", IntegerType, nullable = false),
      StructField("key", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if shingleN >= 1 && bands >= 1 && k >= bands &&
      k % bands == 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands expects a string column with k a positive " +
        s"multiple of bands, got $other shingleN=$shingleN k=$k " +
        s"bands=$bands")
  }

  override def nullSafeEval(v: Any): Any =
    MinhashBands.compute(v.asInstanceOf[UTF8String], shingleN, k, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashBands.compute($c, $shingleN, $k, $bands)")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashBands = copy(child = newChild)

  override def prettyName: String = "graft_minhash_bands"
}

object MinhashBands {

  /** Java regex `\s` without UNICODE_CHARACTER_CLASS matches exactly
    * the six ASCII whitespace bytes — and no UTF-8 continuation byte
    * can collide with them — so tokenizing on these bytes over the raw
    * UTF8String is bit-equivalent to `toString.split("\\s+", -1)`. */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  /** Static kernel shared by eval and generated code.
    *
    * r15: runs entirely on the UTF8String's bytes — token boundaries
    * from one whitespace scan (offset/length pairs into the original
    * buffer), each shingle assembled into ONE reused byte buffer and
    * hashed from there. The original materialized a Java String for
    * the document, a String[] from the regex split, and a String +
    * UTF8String per shingle — allocation/copy work that dominated the
    * kernel (hash keys are unchanged bit-for-bit: same bytes, same
    * seeds; MinhashBandsSpec pins parity with the aggregate path). */
  def compute(s: UTF8String, shingleN: Int, k: Int, bands: Int)
      : ArrayData = {
    val n = s.numBytes
    val bytes = new Array[Byte](n)
    s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    // token spans, replicating split("\s+", -1): a leading whitespace
    // run yields an empty first token; a trailing run an empty last
    var nTok = 0
    var offs = new Array[Int](16)
    var lens = new Array[Int](16)
    def push(off: Int, len: Int): Unit = {
      if (nTok == offs.length) {
        offs = java.util.Arrays.copyOf(offs, nTok * 2)
        lens = java.util.Arrays.copyOf(lens, nTok * 2)
      }
      offs(nTok) = off; lens(nTok) = len; nTok += 1
    }
    var p = 0
    var start = 0
    while (p < n) {
      if (isWs(bytes(p))) {
        push(start, p - start)
        p += 1
        while (p < n && isWs(bytes(p))) p += 1
        start = p
      } else p += 1
    }
    push(start, n - start) // the final token ("" after a trailing run)

    val nSh = if (nTok < shingleN) 1 else nTok - shingleN + 1
    // per-slot chain seeds: Spark's xxhash64(lit(s), shingle) hashes
    // the int literal against the default seed 42 first
    val seeds = new Array[Long](k)
    var sIdx = 0
    while (sIdx < k) { seeds(sIdx) = XXH64.hashInt(sIdx, 42L); sIdx += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nSh) {
      val end = if (nTok < shingleN) nTok else i + shingleN
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
      sIdx = 0
      while (sIdx < k) {
        val h = XXH64.hashUnsafeBytes(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len,
          seeds(sIdx))
        if (h < mins(sIdx)) mins(sIdx) = h
        sIdx += 1
      }
      i += 1
    }
    val rowsPerBand = k / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var key = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < rowsPerBand) {
        key = XXH64.hashLong(mins(b * rowsPerBand + r), key)
        r += 1
      }
      out(b) = new GenericInternalRow(Array[Any](b, key))
      b += 1
    }
    new GenericArrayData(out)
  }
}
