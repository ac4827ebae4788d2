package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Registry-side conversion: the codebooks arrive as a FOLDABLE nested
  * array literal (`typedLit(m × ksub × dsub)`) in the second argument
  * of `graft_pq_encode` / `graft_pq_lut`; the builder evaluates it
  * once at plan time into the flat JVM array the kernel runs on. */
private[functions] object PqBooks {
  def fromExpr(e: Expression): Array[Array[Array[Double]]] = {
    require(e.foldable, "pq codebooks must be a literal")
    val outer = e.eval(null).asInstanceOf[ArrayData]
    require(outer != null && outer.numElements() > 0, "empty pq codebooks")
    val midT = ArrayType(ArrayType(DoubleType))
    val innT = ArrayType(DoubleType)
    outer.toObjectArray(midT).map { o =>
      o.asInstanceOf[ArrayData].toObjectArray(innT).map { oo =>
        oo.asInstanceOf[ArrayData].toDoubleArray()
      }
    }
  }
}

/** Shared kernel for the native product-quantization expressions: the
  * per-row (normalize → per-subspace squared-L2-to-every-centroid)
  * loop that the HOF formulation in VectorSim.pqEncode/pqLut evaluates
  * through interpreted lambda dispatch. The HOF form re-evaluates the
  * whole `unit(vec)` normalization once per (subspace × centroid) —
  * m·ksub re-aggregations of the full vector per row, measured 75 ms
  * PER ROW at m=16/ksub=16/dim=64 (37 s for a 500-row encode). The
  * native kernel normalizes once and runs one fused loop: 0.3 s for
  * the same encode, and it rides whole-stage codegen.
  *
  * Bit-identical to the HOF formulation (PqEncodeSpec proves it):
  *  - elements cast to double; norm = sqrt of the LEFT-TO-RIGHT sum of
  *    squares; norm == 0 → vector passes through unnormalized (the
  *    unit() contract); otherwise x/norm per element — then every
  *    distance accumulates (x−y)² left-to-right from 0.0;
  *  - a NULL array, an EMPTY array, or ANY null element → every
  *    subspace distance is null in the HOF chain (a null element
  *    poisons the norm, so the whole normalized vector nulls) →
  *    coalesce(…, MaxValue) ties every centroid → code 0 per subspace
  *    (and MaxValue per LUT cell);
  *  - a subspace whose [s·dsub, (s+1)·dsub) window is not FULLY inside
  *    the vector (ragged input): zip_with pads the short slice with
  *    null → null distance → MaxValue, code 0;
  *  - NaN distances order by java.lang.Double.compare (NaN greater
  *    than everything, equal to itself) — exactly Spark's double
  *    ordering in the HOF's array_sort; ties break on centroid id.
  */
private[functions] object PqKernel {

  /** books flattened row-major: [s][c][d] → s·ksub·dsub + c·dsub + d. */
  def flatten(books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length; val ksub = books(0).length
    val dsub = books(0)(0).length
    val out = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      require(books(s).length == ksub, "ragged codebook (ksub)")
      var c = 0
      while (c < ksub) {
        require(books(s)(c).length == dsub, "ragged codebook (dsub)")
        System.arraycopy(books(s)(c), 0, out, (s * ksub + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    out
  }

  /** The normalized vector, or null when the HOF chain would null it
    * (null array / null element). Empty arrays return empty. */
  def unitOrNull(a: ArrayData, isFloat: Boolean): Array[Double] = {
    if (a == null) return null
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < n) { ss += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) { // norm==0 (incl. empty) → pass through, unit()'s contract
      i = 0
      while (i < n) { v(i) /= nrm; i += 1 }
    }
    v
  }

  /** Squared L2 of u[s·dsub ..] vs centroid c of subspace s, or
    * MaxValue when the window is not fully inside u (the HOF's
    * null-padded zip_with → coalesce path). */
  def dist(u: Array[Double], flat: Array[Double], s: Int, c: Int,
           dsub: Int, ksub: Int): Double = {
    val off = s * dsub
    if (u == null || off + dsub > u.length) return Double.MaxValue
    val boff = (s * ksub + c) * dsub
    var d = 0.0
    var j = 0
    while (j < dsub) {
      val t = u(off + j) - flat(boff + j)
      d += t * t
      j += 1
    }
    d
  }

  /** Argmin centroid for subspace s under Spark's double ordering
    * (java.lang.Double.compare: NaN last, ties → smaller c). */
  def argmin(u: Array[Double], flat: Array[Double], s: Int,
             dsub: Int, ksub: Int): Int = {
    var best = 0
    var bestD = dist(u, flat, s, 0, dsub, ksub)
    var c = 1
    while (c < ksub) {
      val d = dist(u, flat, s, c, dsub, ksub)
      if (java.lang.Double.compare(d, bestD) < 0) { best = c; bestD = d }
      c += 1
    }
    best
  }
}

/** Native PQ encoder: array<int> of the m nearest-centroid codes.
  * Construct from Scala via [[graft.ops.VectorSim.pqEncode]] with
  * `native = true` — the codebooks ride the expression as a reference
  * object, not a Column, so there is no SQL-registry form. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val ksub = books(0).length
  private val dsub = books(0)(0).length
  @transient private lazy val flat = PqKernel.flatten(books)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float|double>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input).asInstanceOf[ArrayData]
    val u = PqKernel.unitOrNull(a, isFloat)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      codes(s) = PqKernel.argmin(u, flat, s, dsub, ksub)
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    val kernel = PqKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val u = ctx.freshName("u")
    val codes = ctx.freshName("codes")
    val s = ctx.freshName("s")
    val gad = classOf[GenericArrayData].getName
    ev.copy(code = code"""
       |${childGen.code}
       |double[] $u = $kernel.unitOrNull(
       |  ${childGen.isNull} ? null : ${childGen.value}, $isFloat);
       |int[] $codes = new int[$m];
       |for (int $s = 0; $s < $m; $s++) {
       |  $codes[$s] = $kernel.argmin($u, $flatRef, $s, $dsub, $ksub);
       |}
       |$gad ${ev.value} = new $gad($codes);
     """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

/** Native ADC lookup table: array<array<double>> of the m × ksub
  * squared L2 distances from the row's subvectors to every centroid —
  * the query-side half of PQ search. Same normalization/edge contract
  * as [[PqEncode]]. */
case class PqLut(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val ksub = books(0).length
  private val dsub = books(0)(0).length
  @transient private lazy val flat = PqKernel.flatten(books)

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)
  override def nullable: Boolean = false

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut expects array<float|double>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input).asInstanceOf[ArrayData]
    val u = PqKernel.unitOrNull(a, isFloat)
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val ds = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        ds(c) = PqKernel.dist(u, flat, s, c, dsub, ksub)
        c += 1
      }
      rows(s) = new GenericArrayData(ds)
      s += 1
    }
    new GenericArrayData(rows)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    val kernel = PqKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val u = ctx.freshName("u")
    val rows = ctx.freshName("rows")
    val ds = ctx.freshName("ds")
    val s = ctx.freshName("s")
    val c = ctx.freshName("c")
    val gad = classOf[GenericArrayData].getName
    ev.copy(code = code"""
       |${childGen.code}
       |double[] $u = $kernel.unitOrNull(
       |  ${childGen.isNull} ? null : ${childGen.value}, $isFloat);
       |Object[] $rows = new Object[$m];
       |for (int $s = 0; $s < $m; $s++) {
       |  double[] $ds = new double[$ksub];
       |  for (int $c = 0; $c < $ksub; $c++) {
       |    $ds[$c] = $kernel.dist($u, $flatRef, $s, $c, $dsub, $ksub);
       |  }
       |  $rows[$s] = new $gad($ds);
       |}
       |$gad ${ev.value} = new $gad($rows);
     """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_lut"
}
