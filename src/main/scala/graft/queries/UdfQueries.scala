package graft.queries

import graft.QueryDef
import graft.udf.{GraftUdf, Udwf, Udxf, WeightedMean}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.7 UDF family under the correctness gate: every variant has
  * a DuckDB oracle expressing the same semantics in plain SQL, so the
  * custom-function machinery itself is what is being verified.
  */
object UdfQueries {

  val defs: Seq[QueryDef] = Seq(

    // Scalar UDF (ref expr/udf.py:55-127): JVM lambda over two columns.
    // Oracle mirrors the arithmetic. (Real engine guidance: use builtins
    // — this exists for genuinely custom logic.)
    q("udf_scalar",
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 1e-9, 2) AS charged
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber""") { c =>
      val charged = udf((price: Double, disc: Double, tax: Double) =>
        BigDecimal(price * (1 - disc) * (1 + tax) + 1e-9)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      c.lineitem.filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          charged(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .as("charged"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // UDAF as a typed Aggregator (ref expr/pyaggregator.py:25-79
    // update/merge/evaluate ≡ reduce/merge/finish): weighted mean of
    // price by quantity. Partial aggregation runs map-side like any
    // builtin aggregate.
    q("udf_agg",
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity) + 1e-9, 2) AS wavg
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", bench = true) { c =>
      val wavg = udaf(WeightedMean)
      c.lineitem.groupBy("l_returnflag")
        .agg(r2(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg"))
        .orderBy("l_returnflag")
    },

    // Computed-kwarg UDF (ref expr/udf.py:79-336): the (mean, stddev)
    // of o_totalprice are computed by a SUB-PLAN first, then closed
    // over by the scalar function — the deferred-ML pattern (model
    // trained once, broadcast into a predict UDF).
    q("udf_computed_kwargs",
      """SELECT o_orderkey,
        |       round((o_totalprice - (SELECT avg(o_totalprice) FROM orders))
        |             / (SELECT stddev_samp(o_totalprice) FROM orders) + 1e-9, 4) AS z
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""") { c =>
      val stats = c.orders.agg(
        avg(col("o_totalprice")).as("mu"),
        stddev_samp(col("o_totalprice")).as("sigma"))
      val zUdf = GraftUdf.computedKwarg(stats) { row =>
        val (mu, sigma) = (row.getDouble(0), row.getDouble(1))
        udf((x: Double) =>
          BigDecimal((x - mu) / sigma + 1e-9)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      c.orders.filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), zUdf(col("o_totalprice")).as("z"))
        .orderBy("o_orderkey")
    },

    // UDXF: named table-in/table-out function with a schema contract,
    // partition-local (ref expr/relations.py:661-823 flight_udxf — the
    // in-process Spark analogue of the Arrow Flight exchange).
    q("udf_udxf",
      """SELECT doc_id,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       upper(substr(text, 1, 12)) AS head
        |FROM documents ORDER BY doc_id""") { c =>
      val tokenize = Udxf(
        name = "tokenize_head",
        schemaIn = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType))),
        schemaOut = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_tokens", IntegerType),
          StructField("head", StringType))),
        process = _.map { r =>
          val text = r.getString(1)
          Row(r.getLong(0),
            text.trim.split("\\s+").length,
            text.take(12).toUpperCase)
        })
      tokenize(c.documents.select("doc_id", "text")).orderBy("doc_id")
    },

    // UDWF: custom window evaluator (ref expr/udf.py:839-1089
    // pyarrow_udwf; WindowEvaluator contract internal.py:78-107) —
    // running sum per user in event-time order, computed by OUR
    // evaluator harness, checked against SQL's native window frame.
    q("udf_udwf",
      """SELECT event_id, user_id,
        |       round(sum(value) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id
        |                              ROWS UNBOUNDED PRECEDING) + 1e-9, 2) AS running
        |FROM events WHERE user_id < 40
        |ORDER BY event_id""") { c =>
      val runningSum = Udwf(
        partitionBy = Seq("user_id"),
        orderBy = Seq("ts", "event_id"),
        outName = "running",
        outType = DoubleType,
        evaluate = rows => {
          var acc = 0.0
          rows.map { r =>
            acc += r.getDouble(r.fieldIndex("value"))
            BigDecimal(acc + 1e-9)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        })
      runningSum(c.events.filter(col("user_id") < 40)
          .select("event_id", "user_id", "ts", "value"))
        .select("event_id", "user_id", "running")
        .orderBy("event_id")
    },

    // UDWF rank mode (ref expr/udf.py evaluate_all_with_rank): the
    // evaluator sees peer-group ranges induced by orderBy-key ties and
    // reproduces SQL rank() — checked against the native window.
    q("udf_udwf_rank",
      """SELECT event_id, user_id,
        |       rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk
        |FROM events WHERE user_id < 40
        |ORDER BY event_id""") { c =>
      import graft.udf.UdwfMode
      val rankEval = Udwf(
        partitionBy = Seq("user_id"),
        orderBy = Seq("event_type"),
        outName = "rnk",
        outType = LongType,
        mode = UdwfMode.EvaluateAllWithRank((_, ranges) =>
          ranges.flatMap { case (s, e) => Seq.fill(e - s)((s + 1).toLong) }))
      rankEval(c.events.filter(col("user_id") < 40)
          .select("event_id", "user_id", "event_type"))
        .select("event_id", "user_id", "rnk")
        .orderBy("event_id")
    },

    // UDWF frame mode (ref expr/udf.py evaluate with eval_range): the
    // evaluator is called per row with the ROWS-frame slice [i-2, i] —
    // a moving average checked against the native frame window.
    q("udf_udwf_frame",
      """SELECT event_id, user_id,
        |       round(avg(value) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id
        |                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 2) AS mavg
        |FROM events WHERE user_id < 40
        |ORDER BY event_id""") { c =>
      import graft.udf.UdwfMode
      val movingAvg = Udwf(
        partitionBy = Seq("user_id"),
        orderBy = Seq("ts", "event_id"),
        outName = "mavg",
        outType = DoubleType,
        mode = UdwfMode.EvaluateFrame(Some(-2), Some(0), frame => {
          val vs = frame.map(r => r.getDouble(r.fieldIndex("value")))
          BigDecimal(vs.sum / vs.length + 1e-9)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        }))
      movingAvg(c.events.filter(col("user_id") < 40)
          .select("event_id", "user_id", "ts", "value"))
        .select("event_id", "user_id", "mavg")
        .orderBy("event_id")
    }
  )
}
