package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Custom Catalyst optimizer rule: LENGTH-BASED PRUNING for string
  * similarity threshold filters — the (c) tier of the extension
  * ladder (custom `Rule[LogicalPlan]` via `SparkSessionExtensions` /
  * `spark.experimental.extraOptimizations`), used where composing
  * existing operators cannot help: the optimizer itself has to see
  * through the black-box expression. Two prunings, both provably
  * implied by the original predicate (results bit-identical):
  * Jaro-Winkler length-ratio (below) and Levenshtein length-difference
  * (`lev ≤ k ⟹ |len(a)−len(b)| ≤ k`).
  *
  * Soundness: for strings with lengths s = min(|a|,|b|), t = max:
  *   jaro(a,b) ≤ (m/|a| + m/|b| + 1)/3 with m ≤ s  ⇒  jaro ≤ (2 + s/t)/3
  *   jw = jaro + p·0.1·(1−jaro) ≤ 0.6·jaro + 0.4   (p ≤ 4)
  * so `jw ≥ c` implies `jaro ≥ (c − 0.4)/0.6`, which implies
  *   s/t ≥ 3·(c − 0.4)/0.6 − 2 = 5c − 4.
  * The rule conjoins the cheap guard `least(len)·1.0 ≥ (5c−4)·greatest
  * (len)` IN FRONT of the original comparison; codegen's && short-
  * circuits, so the O(|a|·window) kernel never runs on pairs the bound
  * already excludes. The guard is implied by the original predicate —
  * results are bit-identical, only work is saved. For c ≤ 0.8 the bound
  * is vacuous and the rule leaves the filter alone.
  *
  * Idempotent by construction (the optimizer runs rules to fixpoint):
  * a conjunct is only added if no semantically-equal guard is already
  * present.
  */
object JaroWinklerLengthPruning extends Rule[LogicalPlan] {

  private def lengthGuard(jw: JaroWinkler, c: Double): Expression = {
    val la = Cast(Length(jw.left), DoubleType)
    val lb = Cast(Length(jw.right), DoubleType)
    GreaterThanOrEqual(Least(Seq(la, lb)),
      Multiply(Literal(5 * c - 4), Greatest(Seq(la, lb))))
  }

  /** Levenshtein guard: lev(a,b) ≥ |len(a) − len(b)| always, so
    * `lev ≤ k` implies `abs(len(a) − len(b)) ≤ k` — sound for every k. */
  private def levGuard(lv: Levenshtein, k: Int): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lv.left), Length(lv.right))),
      Literal(k))

  /** The guard for `e` when it is a prunable threshold comparison:
    * jw >=/> c (c above the vacuity bound) or levenshtein <=/< k. */
  private def guardOf(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(jw: JaroWinkler, Literal(c: Double, DoubleType))
        if c > 0.8 => Some(lengthGuard(jw, c))
    case GreaterThan(jw: JaroWinkler, Literal(c: Double, DoubleType))
        if c > 0.8 => Some(lengthGuard(jw, c))
    case LessThanOrEqual(Literal(c: Double, DoubleType), jw: JaroWinkler)
        if c > 0.8 => Some(lengthGuard(jw, c))
    case LessThan(Literal(c: Double, DoubleType), jw: JaroWinkler)
        if c > 0.8 => Some(lengthGuard(jw, c))
    case LessThanOrEqual(lv: Levenshtein,
        Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
      Some(levGuard(lv, k))
    case LessThan(lv: Levenshtein,
        Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
      Some(levGuard(lv, k - 1))
    case GreaterThanOrEqual(
        Literal(k: Int, org.apache.spark.sql.types.IntegerType),
        lv: Levenshtein) => Some(levGuard(lv, k))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** `cond` with guards prepended, or None if nothing to add. */
  private def guarded(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val guards = conjuncts.flatMap(guardOf)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None
    else Some((guards ++ conjuncts).reduceLeft(And))
  }

  // the predicate may live in a Filter OR have been pushed into a Join
  // condition by PushPredicateThroughJoin — guard both homes
  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      guarded(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      guarded(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}

/** Runtime registration (plain sessions): adds the rule once to
  * `spark.experimental.extraOptimizations`. */
object GraftRules {
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(JaroWinklerLengthPruning))
      spark.experimental.extraOptimizations =
        cur :+ JaroWinklerLengthPruning
  }
}

/** `spark.sql.extensions`-style injection for cluster deployments:
  * `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => JaroWinklerLengthPruning)
}
