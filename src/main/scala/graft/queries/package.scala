package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {

  /** Per-query context: session + scale-factor dir, with table shortcuts. */
  final class Ctx(val spark: SparkSession, val dir: String) {
    def t(n: String): DataFrame = Tables(spark, dir, n)
    def lineitem: DataFrame   = t("lineitem")
    def orders: DataFrame     = t("orders")
    def customer: DataFrame   = t("customer")
    def supplier: DataFrame   = t("supplier")
    def part: DataFrame       = t("part")
    def nation: DataFrame     = t("nation")
    def region: DataFrame     = t("region")
    def events: DataFrame     = t("events")
    def documents: DataFrame  = t("documents")
    def embeddings: DataFrame = t("embeddings")
    /** True on the sf0.001 gate tier, where runs are golden-pinned
      * (determinism-only) rather than oracle-compared — expensive
      * algorithm knobs (training iterations, sketch widths, codebook
      * sizes) may shrink here per the r13 verdict #3 budget rule
      * ("the golden pins whatever the query declares"); oracle scales
      * (sf0.01+) always run the full configuration. */
    def smoke: Boolean = dir.contains("sf0.001")
  }

  def q(name: String, oracle: String, bench: Boolean = false)(
      body: Ctx => DataFrame): QueryDef =
    QueryDef(name, (s, d) => body(new Ctx(s, d)),
      Option(oracle).filter(_.nonEmpty).map(_.stripMargin.trim), bench)

  /** Rows-only-checked query (semantics not expressible in ANSI SQL). */
  def qNoOracle(name: String, bench: Boolean = false)(
      body: Ctx => DataFrame): QueryDef =
    QueryDef(name, (s, d) => body(new Ctx(s, d)), None, bench)

  /** Round doubles so Spark-vs-DuckDB FP noise can never flip the driver's
    * hash compare. Two failure modes are guarded:
    *  - summation-order noise (≤1e-12 relative) → coarse grain;
    *  - exact rounding TIES (value on a .xx5 lattice point): Spark rounds
    *    the shortest-decimal-string HALF_UP while DuckDB rounds the binary
    *    value, so ties can split. A +1e-9 nudge (≫ both engines' FP error,
    *    ≪ the data lattice) pushes every tie to the upper cell on BOTH
    *    engines. The SQL oracles apply the same `x + 1e-9` nudge.
    */
  private def nudge(c: Column): Column = c + lit(1e-9)
  def r2(c: Column): Column = round(nudge(c), 2)
  def r4(c: Column): Column = round(nudge(c), 4)
  def r6(c: Column): Column = round(nudge(c), 6)

  /** Exact money sum: cast the decimal-lattice double to DECIMAL per row
    * (scale must be ≥ the value lattice so the cast never rounds), sum
    * decimals (exact, order-independent), then cast the total back to
    * DOUBLE (correctly-rounded, identical on both engines). Oracle side:
    * `CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(${18 + scale - 4},$scale)")).cast("double")
}
