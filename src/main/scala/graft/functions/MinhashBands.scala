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

  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String, shingleN: Int, k: Int, bands: Int)
      : ArrayData = {
    val toks = s.toString.split("\\s+", -1)
    val nSh = if (toks.length < shingleN) 1 else toks.length - shingleN + 1
    // per-slot chain seeds: Spark's xxhash64(lit(s), shingle) hashes
    // the int literal against the default seed 42 first
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      val end = if (toks.length < shingleN) toks.length else i + shingleN
      var t = i
      while (t < end) {
        if (t > i) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      val u = UTF8String.fromString(sb.toString)
      var sIdx = 0
      while (sIdx < k) {
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes, XXH64.hashInt(sIdx, 42L))
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
