package graft.serve

import graft.rel._
import graft.udf.Udxf
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** In-process serve registry — the single-JVM analogue of the
  * reference's Arrow-Flight serving surface (`flight_serve` of an
  * unbound expr, expr/relations.py:434-577, and named `flight_udxf`
  * exchangers, flight/exchanger.py:119-392):
  *
  *  - a SERVED PLAN is an unbound [[Rel]] (its [[UnboundTable]] leaves
  *    name the inputs); `call` binds caller-supplied frames to those
  *    names and executes — exactly FlightExpr's "ship the expression,
  *    stream the input through" contract, minus the network hop;
  *  - a served [[Udxf]] is a named table→table function with schema
  *    contracts enforced at call time.
  *
  * In a real deployment the transport would be Spark Connect (the
  * Spark-native analogue of Flight); the registry's contract — named,
  * schema-checked, expression-keyed endpoints — is transport-agnostic.
  */
final class Registry(spark: SparkSession) {

  private val plans = TrieMap.empty[String, Rel]
  private val udxfs = TrieMap.empty[String, Udxf]

  /** Serve an unbound plan under `name`; returns its build hash (the
    * endpoint identity, like the reference's expr-hash commands). */
  def servePlan(name: String, rel: Rel): String = {
    plans(name) = rel
    RelHash.buildHash(rel)
  }

  def serveUdxf(u: Udxf): Unit = udxfs(u.name) = u

  /** Execute a served plan with the caller's input tables bound to its
    * UnboundTable leaves (missing bindings fail fast in lowering).
    * Runs through the FULL execute() path — cache resolution, tee
    * write-through, exchange materialization (a bare lower() would
    * silently skip those effects; review-caught) — with the served
    * UDXFs doubling as the function catalog, so served plans may
    * contain [[graft.rel.UdxfRel]] nodes referencing them. */
  def call(name: String, inputs: Map[String, DataFrame]): DataFrame = {
    val rel = plans.getOrElse(name,
      throw new IllegalArgumentException(s"no served plan '$name'"))
    new graft.api.GraftSession(spark, bindings = inputs,
      functions = graft.udf.FunctionCatalog(udxfs = udxfs.toMap))
      .execute(rel)
  }

  /** Execute a served exchange function (schema-validated). */
  def exchange(name: String, input: DataFrame): DataFrame = {
    val u = udxfs.getOrElse(name,
      throw new IllegalArgumentException(s"no served udxf '$name'"))
    u(input)
  }

  def served: Seq[String] = (plans.keySet ++ udxfs.keySet).toSeq.sorted

  /** The served plan under `name`, if any. */
  def plan(name: String): Option[Rel] = plans.get(name)
}
