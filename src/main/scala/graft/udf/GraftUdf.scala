package graft.udf

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The UDF family (SURVEY §2.7), Spark-native:
  *
  *  - scalar UDFs — `functions.udf` (JVM lambdas, already batched by
  *    Tungsten; the arrow-batch machinery the reference needs for
  *    Python, expr/udf.py:55-127, is unnecessary in-JVM);
  *  - UDAFs — [[Aggregator]]: its zero/reduce/merge/finish contract IS
  *    the reference PyAggregator's state/update/merge/evaluate
  *    (expr/pyaggregator.py:25-79), with distributed partial
  *    aggregation for free;
  *  - computed-kwarg UDFs — [[computedKwarg]]: a sub-plan's result is
  *    evaluated once and closed over (broadcast by the closure) before
  *    the per-row function runs — the deferred-ML enabler
  *    (make_pandas_expr_udf, expr/udf.py:79-336);
  *  - UDXFs — [[Udxf]]: named table-in/table-out functions with an
  *    explicit schema contract, run partition-local via mapPartitions
  *    (flight_udxf, expr/relations.py:661-823 — in-process instead of
  *    an Arrow Flight hop);
  *  - UDWFs — [[Udwf]]: a window-evaluator harness (partition rows
  *    arrive ordered; the evaluator emits one value per row) mirroring
  *    the DataFusion WindowEvaluator contract (internal.py:78-107).
  *
  * Scale notes: scalar UDFs and Aggregators ride the normal codegen'd
  * pipelines (the lambda itself is a black box — prefer builtins when
  * one exists). UDXF/UDWF are partition-local `mapPartitions`/
  * `flatMapGroups`: no driver collect, no extra shuffle beyond the
  * required groupBy for UDWF. The computed-kwarg evaluation collects
  * exactly ONE small row to the driver (the sub-plan must aggregate).
  */
object GraftUdf {

  /** Evaluate `subplan` (must yield exactly one row) and pass its row
    * to `mk`, which builds the per-row function with the computed
    * values closed over. */
  def computedKwarg[T](subplan: DataFrame)(mk: Row => T): T = {
    val rows = subplan.collect()
    require(rows.length == 1,
      s"computed-kwarg sub-plan must yield exactly 1 row, got ${rows.length}")
    mk(rows(0))
  }
}

/** Table-in/table-out function with a declared schema contract,
  * validated fail-fast against the actual input (the reference
  * validates via Flight schema negotiation, flight/exchanger.py). */
final case class Udxf(
    name: String,
    schemaIn: StructType,
    schemaOut: StructType,
    process: Iterator[Row] => Iterator[Row]) {

  def apply(df: DataFrame): DataFrame = {
    val actual = df.schema
    schemaIn.fields.foreach { f =>
      val g = actual.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"udxf $name: input missing column '${f.name}'"))
      require(g.dataType == f.dataType,
        s"udxf $name: column '${f.name}' is ${g.dataType}, " +
          s"contract wants ${f.dataType}")
    }
    val projected = df.select(schemaIn.fieldNames.map(col).toSeq: _*)
    projected.mapPartitions(process)(Encoders.row(schemaOut))
  }
}

/** Evaluation modes of the window-evaluator contract (the reference's
  * WindowEvaluator exposes the same three: `evaluate_all`, `evaluate`
  * with a frame range, `evaluate_all_with_rank` — expr/udf.py:839-1089,
  * internal.py:78-107). `kind` is the stable name serialized into
  * [[graft.rel.UdwfRel]] plans and validated at lowering. */
sealed trait UdwfMode {
  def kind: String
  /** Produce one output value per row of the (sorted) group.
    * `orderKeyOf` extracts the normalized orderBy key (for peer-group
    * detection in the rank mode). */
  def run(group: IndexedSeq[Row], orderKeyOf: Row => Seq[Any]): Seq[Any]
}

object UdwfMode {

  /** Whole-group evaluator: sees every row of the window partition in
    * order, returns one value per row. */
  final case class EvaluateAll(f: Seq[Row] => Seq[Any]) extends UdwfMode {
    val kind = "evaluate_all"
    def run(g: IndexedSeq[Row], orderKeyOf: Row => Seq[Any]): Seq[Any] = f(g)
  }

  /** Per-row ROWS-frame evaluator: for row i the function sees the
    * slice [i+lo, i+hi] of the sorted group (None = unbounded), i.e.
    * `ROWS BETWEEN lo PRECEDING AND hi FOLLOWING`, and returns that
    * row's value — the reference's `evaluate(values, eval_range)`. */
  final case class EvaluateFrame(
      lo: Option[Int], hi: Option[Int], f: Seq[Row] => Any) extends UdwfMode {
    val kind = "evaluate"
    def run(g: IndexedSeq[Row], orderKeyOf: Row => Seq[Any]): Seq[Any] =
      g.indices.map { i =>
        val s = lo.fold(0)(d => math.max(0, i + d))
        val e = hi.fold(g.length - 1)(d => math.min(g.length - 1, i + d))
        if (s > e) f(Vector.empty) else f(g.slice(s, e + 1))
      }
  }

  /** Rank-aware whole-group evaluator: the function sees the group size
    * and the peer-group ranges `[start, end)` induced by orderBy-key
    * equality (ties), returns one value per row — the reference's
    * `evaluate_all_with_rank(num_rows, ranks_in_partition)`. */
  final case class EvaluateAllWithRank(
      f: (Int, Seq[(Int, Int)]) => Seq[Any]) extends UdwfMode {
    val kind = "evaluate_all_with_rank"
    def run(g: IndexedSeq[Row], orderKeyOf: Row => Seq[Any]): Seq[Any] = {
      val ranges = Vector.newBuilder[(Int, Int)]
      var s = 0
      while (s < g.length) {
        val key = orderKeyOf(g(s))
        var e = s + 1
        while (e < g.length && orderKeyOf(g(e)) == key) e += 1
        ranges += ((s, e))
        s = e
      }
      f(g.length, ranges.result())
    }
  }
}

/** User-defined window function harness: rows of each partition arrive
  * sorted by `orderBy` at the [[UdwfMode]] evaluator, which produces
  * one output value per input row. Output = input columns + `outName`.
  *
  * Spill-aware (r2 fix): the ordering is done by Spark's own
  * UnsafeExternalSorter (`repartition(keys).sortWithinPartitions`),
  * which spills to disk on skewed partitions where the previous
  * `groupByKey.flatMapGroups + in-heap toVector.sorted` would OOM.
  * The `mapPartitions` pass then detects group boundaries in the
  * sorted stream and buffers exactly ONE group at a time — the
  * irreducible footprint of the evaluate-all contract (the reference's
  * WindowEvaluator has the same whole-partition contract). */
final case class Udwf(
    partitionBy: Seq[String],
    orderBy: Seq[String],
    outName: String,
    outType: org.apache.spark.sql.types.DataType,
    mode: UdwfMode,
    /** Declared configuration of the evaluator (the reference's
      * "params on self", expr/udf.py:839): the VALUES the closure was
      * built with, serialized into [[graft.rel.UdwfRel]] so a
      * re-registration with different tuning cannot run under a plan
      * hashed for the old one. */
    params: Seq[(String, String)] = Nil) {

  def apply(df: DataFrame): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(outName, outType)
    val rowEnc = Encoders.row(outSchema)
    val pIdx = partitionBy.map(inSchema.fieldIndex)
    // array-typed keys compare by reference under Seq[Any].== — box
    // them into Seqs so group detection matches Spark's own hash/sort
    // semantics (review-caught: a binary partition key would split
    // every group into single rows)
    def norm(v: Any): Any = v match {
      case a: Array[Byte] => a.toSeq
      case a: Array[_] => a.toSeq.map(norm)
      case s: scala.collection.Seq[_] => s.map(norm)
      case r: Row => r.toSeq.map(norm)
      // compare floating keys by canonical BITS, not boxed equality:
      // Spark's repartition/sort put 0.0 with -0.0 and NaN with NaN in
      // one group, while boxed comparison can split them (ADVICE r3).
      // doubleToLongBits canonicalizes every NaN; zeros are unified
      // first. The normalized key is only ever used for equality.
      case d: java.lang.Double =>
        java.lang.Double.doubleToLongBits(
          if (d.doubleValue() == 0.0) 0.0 else d.doubleValue())
      case f: java.lang.Float =>
        java.lang.Float.floatToIntBits(
          if (f.floatValue() == 0.0f) 0.0f else f.floatValue())
      case other => other
    }
    def keyOf(r: Row): Seq[Any] = pIdx.map(i => norm(r.get(i)))
    val oIdx = orderBy.map(inSchema.fieldIndex)
    def orderKeyOf(r: Row): Seq[Any] = oIdx.map(i => norm(r.get(i)))

    // an empty partitionBy is a GLOBAL window: it must be one partition
    // (argless repartition() is round-robin REBALANCE — the evaluator
    // would run once per physical partition; review-caught). Same
    // single-reducer cost as Spark's own unpartitioned window.
    val prepared =
      if (partitionBy.isEmpty)
        df.repartition(1).sortWithinPartitions(orderBy.map(col): _*)
      else
        df.repartition(partitionBy.map(col): _*)
          .sortWithinPartitions((partitionBy ++ orderBy).map(col): _*)
    prepared
      .mapPartitions { rows =>
        // normalize each row's partition key exactly once (r3 nit: the
        // head-probe loop re-normalized the same head on every probe)
        val buf = rows.map(r => (keyOf(r), r)).buffered
        new Iterator[Row] {
          private var out: Iterator[Row] = Iterator.empty
          def hasNext: Boolean = out.hasNext || buf.hasNext
          def next(): Row = {
            if (!out.hasNext) {
              val group = Vector.newBuilder[Row]
              val key = buf.head._1
              while (buf.hasNext && buf.head._1 == key)
                group += buf.next()._2
              val g = group.result()
              val outs = mode.run(g, orderKeyOf)
              require(outs.length == g.length,
                s"udwf $outName: evaluator returned ${outs.length} " +
                  s"values for ${g.length} rows")
              out = g.iterator.zip(outs.iterator)
                .map { case (r, v) => Row.fromSeq(r.toSeq :+ v) }
            }
            out.next()
          }
        }
      }(rowEnc)
  }
}

object Udwf {
  /** Back-compat constructor: a bare evaluator is the whole-group
    * `evaluate_all` mode. */
  def apply(
      partitionBy: Seq[String],
      orderBy: Seq[String],
      outName: String,
      outType: org.apache.spark.sql.types.DataType,
      evaluate: Seq[Row] => Seq[Any]): Udwf =
    Udwf(partitionBy, orderBy, outName, outType,
      UdwfMode.EvaluateAll(evaluate))
}

/** Weighted mean as a typed [[Aggregator]] — the update/merge/evaluate
  * contract of the reference's PyAggregator (pyaggregator.py:25-79):
  * zero=initial state, reduce=update, merge=combine partials (runs
  * map-side), finish=evaluate. */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  def zero: (Double, Double) = (0.0, 0.0)
  def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  def finish(r: (Double, Double)): Double =
    if (r._2 == 0) Double.NaN else r._1 / r._2
  def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
