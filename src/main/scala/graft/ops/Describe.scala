package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full `describe` over numeric columns (ref types/relations.py:2717:
  * count/mean/std/min/quantiles/max per column), long format — one row
  * per metric, one column per described column.
  *
  * ONE aggregate pass computes every (metric × column) cell (the
  * 8-metric wide row is then unpivoted with 1-row selects, which is
  * free); exact `percentile` is used for the quartiles. At scale this
  * is a single map-side-combined aggregation over the table — the same
  * cost as any global agg — though exact percentiles buffer per-group
  * values; swap `percentile` for `approx_percentile` when the column
  * cardinality is unbounded. */
object Describe {

  val metrics: Seq[String] =
    Seq("count", "max", "mean", "min", "p25", "p50", "p75", "std")

  private def metricAgg(m: String, c: String) = m match {
    case "count" => count(col(c)).cast("double")
    case "max" => max(col(c)).cast("double")
    case "mean" => avg(col(c))
    case "min" => min(col(c)).cast("double")
    case "p25" => expr(s"percentile(`$c`, 0.25)")
    case "p50" => expr(s"percentile(`$c`, 0.50)")
    case "p75" => expr(s"percentile(`$c`, 0.75)")
    case "std" => stddev_samp(col(c))
  }

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = for (m <- metrics; c <- cols)
      yield metricAgg(m, c).as(s"${c}__$m")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    metrics.map { m =>
      wide.select(lit(m).as("metric") +:
        cols.map(c => col(s"${c}__$m").as(c)): _*)
    }.reduce(_ unionByName _)
  }
}
