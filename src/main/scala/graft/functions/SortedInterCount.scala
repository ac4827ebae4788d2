package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection CARDINALITY of two ASC-SORTED distinct long arrays —
  * the hashed-verify hot loop of [[graft.ops.SetSimJoin]]. Equals
  * `size(array_intersect(a, b))` on such inputs, but as one two-pointer
  * merge with zero per-row allocation; `array_intersect` builds an
  * OpenHashSet and an output array per evaluation, which at ~1M
  * candidate pairs × ~10²-element hash sets dominated the verify
  * stage. Caller contract (SetSimJoin builds both sides as
  * `sort_array(collect_set(...))`): ascending, no duplicates — the
  * merge is correct for any sorted multiset-free input. */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_inter expects two array<bigint> columns, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedInterCount.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedInterCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_inter"
}

object SortedInterCount {

  /** Static kernel shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    c
  }
}
