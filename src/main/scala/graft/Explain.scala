package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `explain(formatted)` of every bench headliner to EXPLAIN.md —
  * the design-for-100TB audit trail: check that filters reach the scan
  * (PushedFilters), projections prune (ReadSchema), dimension joins
  * broadcast, and operator pipelines stay inside WholeStageCodegen.
  * Regenerate with: sbt "runMain graft.Explain /root/testdata/sf0.01".
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/root/repo/EXPLAIN.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# EXPLAIN — bench headliner physical plans\n\n")
    sb.append(s"Generated from `$sfDir` (regenerate: " +
      "`sbt \"runMain graft.Explain\"`). Audit checklist per plan: " +
      "filters pushed to the scan (`PushedFilters`), column pruning " +
      "(`ReadSchema`), broadcast joins for dim tables, " +
      "`WholeStageCodegen` spans over the hot path.\n")
    SparkEntry.benchQueries.foreach { d =>
      sb.append(s"\n## ${d.name}\n\n```\n")
      val plan = d.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(plan)
      sb.append("```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
