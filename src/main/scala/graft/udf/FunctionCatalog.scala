package graft.udf

import org.apache.spark.sql.types.StructField

/** Named UDXF/UDWF implementations resolvable at lowering — the
  * runtime half of the algebra's [[graft.rel.UdxfRel]]/
  * [[graft.rel.UdwfRel]] nodes, exactly as `bindings` is the runtime
  * half of UnboundTable (the reference resolves served UDF names the
  * same way, flight/exchanger.py:119-392). The serialized plan carries
  * the name + full schema contract; the catalog carries the code. */
final case class FunctionCatalog(
    udxfs: Map[String, Udxf] = Map.empty,
    udwfs: Map[String, Udwf] = Map.empty,
    estimators: Map[String, graft.ml.Estimator] = Map.empty) {
  def withUdxf(u: Udxf): FunctionCatalog = copy(udxfs = udxfs + (u.name -> u))
  def withUdwf(name: String, u: Udwf): FunctionCatalog =
    copy(udwfs = udwfs + (name -> u))
  def withEstimator(e: graft.ml.Estimator): FunctionCatalog =
    copy(estimators = estimators + (e.name -> e))
}

object FunctionCatalog {
  val empty: FunctionCatalog = FunctionCatalog()

  /** (name, DDL) pairs of a struct — the serialized schema-contract
    * form used by the algebra nodes. */
  def ddl(fields: Seq[StructField]): Seq[(String, String)] =
    fields.map(f => f.name -> f.dataType.sql)
}
