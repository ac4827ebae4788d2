package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity of two FLOAT
  * arrays — the hot inner loop of similarity search (SURVEY §7 "custom
  * Catalyst inventory: optional/perf"). A lambda-based formulation
  * (zip_with + aggregate) is interpreted per row; this one generates a
  * single fused Java loop via `doGenCode`, so it rides whole-stage
  * codegen with no per-element closure dispatch. Accumulation order
  * (left-to-right dot and norms) matches the HOF formulation, so
  * results are bit-identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_cosine expects array<float> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
  }

  // NULL for ragged lengths and zero-norm vectors — matching the HOF
  // formulation exactly (zip_with null-pads a length mismatch → NULL;
  // Spark's non-ANSI Divide yields NULL on a zero divisor). The
  // previous truncate-to-min + Java division silently scored mismatched
  // vectors and produced NaN for zero vectors, which sorts ABOVE every
  // real cosine in a DESC ranking (review-caught).
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot /
         |      (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Runtime registration of graft-native expressions (the session-
  * extensions path works too via spark.sql.extensions; runtime
  * registration keeps plain sessions working). Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_cosine(a, b)")
        CosineSimilarity(exprs.head, exprs(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshSignature].getName, "graft_lsh_bucket"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_lsh_bucket(vec, planes, table)")
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            s"graft_lsh_bucket: $what must be an integer literal")
        }
        LshSignature(exprs.head, litInt(exprs(1), "planes"),
          litInt(exprs(2), "table"))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_winnow(text, gram, window)")
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            s"graft_winnow: $what must be an integer literal")
        }
        WinnowFingerprint(exprs.head, litInt(exprs(1), "gram"),
          litInt(exprs(2), "window"))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName,
        "graft_minhash_bands"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          "graft_minhash_bands(text, shingleN, k, bands)")
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            s"graft_minhash_bands: $what must be an integer literal")
        }
        MinhashBands(exprs.head, litInt(exprs(1), "shingleN"),
          litInt(exprs(2), "k"), litInt(exprs(3), "bands"))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName,
        "graft_word_shingles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "graft_word_shingles(text, n, minTokens)")
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            s"graft_word_shingles: $what must be an integer literal")
        }
        WordShingles(exprs.head, litInt(exprs(1), "n"),
          litInt(exprs(2), "minTokens"))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sorted_inter"),
      new ExpressionInfo(classOf[SortedInterCount].getName,
        "graft_sorted_inter"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_sorted_inter(a, b)")
        SortedInterCount(exprs.head, exprs(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_normalize(text)")
        NormalizeText(exprs.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_jaro_winkler(a, b)")
        JaroWinkler(exprs.head, exprs(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_pq_encode(vec, books)")
        PqEncode(exprs.head, PqBooks.fromExpr(exprs(1)))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_pq_lut"),
      new ExpressionInfo(classOf[PqLut].getName, "graft_pq_lut"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_pq_lut(vec, books)")
        PqLut(exprs.head, PqBooks.fromExpr(exprs(1)))
      })
  }
}
