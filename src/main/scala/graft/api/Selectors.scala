package graft.api

import org.apache.spark.sql.types._

/** Column selectors — the reference's ergonomic sugar for picking
  * columns by property instead of by name (vendor/ibis/selectors.py:
  * numeric/of_type/startswith/endswith/contains/matches/cols/where,
  * composable with `& | ~`). A [[Selector]] is a schema predicate; it
  * expands against a table's analyzed schema in declaration order, so
  * `table.selectCols(...)`/`dropCols(...)`/`across(...)` stay plain
  * [[graft.rel.Project]] nodes — serializable, hashable, cacheable
  * like every other algebra plan.
  */
final case class Selector(test: StructField => Boolean) {
  def &&(other: Selector): Selector =
    Selector(f => test(f) && other.test(f))
  def ||(other: Selector): Selector =
    Selector(f => test(f) || other.test(f))
  def unary_! : Selector = Selector(f => !test(f))
  /** Matching column names, in schema order. */
  def expand(schema: StructType): Seq[String] =
    schema.fields.filter(test).map(_.name).toSeq
}

object Selectors {

  /** Arbitrary predicate over the column's (name, type, nullable). */
  def where(f: StructField => Boolean): Selector = Selector(f)

  def all: Selector = Selector(_ => true)
  def none: Selector = Selector(_ => false)

  /** Any numeric column (integral, floating, decimal). */
  def numeric: Selector = Selector(_.dataType.isInstanceOf[NumericType])
  def string: Selector = Selector(_.dataType == StringType)
  def boolean: Selector = Selector(_.dataType == BooleanType)
  /** Date / timestamp (with or without timezone) columns. */
  def temporal: Selector = Selector(f => f.dataType match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  })

  /** Columns of exactly the given type, named as in DDL
    * (`"double"`, `"array<float>"`, `"decimal(12,2)"`, ...). */
  def ofType(ddl: String): Selector = {
    val dt = DataType.fromDDL(ddl)
    Selector(_.dataType == dt)
  }

  def startsWith(prefixes: String*): Selector =
    Selector(f => prefixes.exists(f.name.startsWith))
  def endsWith(suffixes: String*): Selector =
    Selector(f => suffixes.exists(f.name.endsWith))
  def contains(substrings: String*): Selector =
    Selector(f => substrings.exists(f.name.contains))
  def matches(regex: String): Selector = {
    val p = java.util.regex.Pattern.compile(regex)
    Selector(f => p.matcher(f.name).find())
  }

  /** Exactly these columns (missing names simply don't match —
    * combine with [[cols]]`.expand` emptiness checks if presence must
    * be enforced). */
  def cols(names: String*): Selector = {
    val set = names.toSet
    Selector(f => set.contains(f.name))
  }
}
