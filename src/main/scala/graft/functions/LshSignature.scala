package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the random-hyperplane LSH bucket id
  * — the hot inner loop of ANN search and corpus-scale embedding
  * dedup (VectorSim.lshBucket). The HOF formulation evaluates an
  * interpreted `aggregate(zip_with(...))` with an `xxhash64` call per
  * (element × plane) — dim×planes hash expressions per row, each
  * through closure dispatch. This expression generates ONE fused Java
  * loop via `doGenCode` and rides whole-stage codegen.
  *
  * Bit-identical to the HOF formulation (LshSignatureSpec proves it):
  *  - plane component (p, j) = (pmod(xxhash64(lit((t<<16)|p), j),
  *    2000000) - 1000000) / 1e6, where the literal hashes through
  *    XXH64.hashInt(seed 42) and the long index chains hashLong —
  *    exactly Spark's xxhash64 semantics for (int-literal, long);
  *  - dot accumulates left-to-right per plane;
  *  - bit p = 1<<p when d >= 0 — under SPARK's comparison semantics,
  *    where NaN sorts greater than every value, so a NaN dot SETS the
  *    bit (Java's `NaN >= 0` is false; the explicit isNaN term keeps
  *    the two formulations identical);
  *  - a NULL element anywhere → every per-plane WHEN falls through →
  *    bucket 0 (matching when(null >= 0, ...).otherwise(0));
  *  - a NULL array → bucket 0 too, for the same reason: the HOF
  *    chain's OTHERWISE(0) swallows the null, so the expression is
  *    never null;
  *  - an EMPTY array → bucket 0: the HOF's sequence(0, size-1)
  *    becomes the DESCENDING [0, -1], zip_with null-pads against the
  *    empty vector, and the null sum falls through every WHEN.
  */
case class LshSignature(child: Expression, planes: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if planes >= 1 && planes <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects array<float|double> and 1..30 planes, " +
        s"got $other with planes=$planes")
  }

  /** Per-plane chain seed: Spark's xxhash64 hashes the int literal
    * (t<<16)|p against the default seed 42 first. */
  private lazy val seeds: Array[Long] =
    Array.tabulate(planes)(p => XXH64.hashInt((table << 16) | p, 42L))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return 0
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return 0; i += 1 }
    var bits = 0
    var p = 0
    while (p < planes) {
      var d = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        val h = XXH64.hashLong(j.toLong, seeds(p))
        val m = ((h % 2000000L) + 2000000L) % 2000000L
        d += x * ((m.toDouble - 1000000.0) / 1000000.0)
        j += 1
      }
      if (d >= 0 || java.lang.Double.isNaN(d)) bits |= (1 << p)
      p += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val seedsRef = ctx.addReferenceObj("lshSeeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    val a = childGen.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val h = ctx.freshName("h")
    val m = ctx.freshName("m")
    val hasNull = ctx.freshName("hasNull")
    val getter = if (isFloat) s"(double) $a.getFloat($j)"
      else s"$a.getDouble($j)"
    ev.copy(code = code"""
       |${childGen.code}
       |int ${ev.value} = 0;
       |if (!${childGen.isNull}) {
       |  int $n = $a.numElements();
       |  boolean $hasNull = $n == 0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    if ($a.isNullAt($i)) { $hasNull = true; break; }
       |  }
       |  if (!$hasNull) {
       |    for (int $p = 0; $p < $planes; $p++) {
       |      double $d = 0.0;
       |      for (int $j = 0; $j < $n; $j++) {
       |        long $h = $xxh.hashLong((long) $j, $seedsRef[$p]);
       |        long $m = (($h % 2000000L) + 2000000L) % 2000000L;
       |        $d += ($getter) * (((double) $m - 1000000.0) / 1000000.0);
       |      }
       |      if ($d >= 0 || Double.isNaN($d)) ${ev.value} |= (1 << $p);
       |    }
       |  }
       |}
     """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshSignature = copy(child = newChild)

  override def prettyName: String = "graft_lsh_bucket"
}
