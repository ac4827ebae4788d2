package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query runner for local debugging: writes one
  * SparkEntry query's result to parquet (same session config as
  * [[Verify]]) so it can be diffed against the DuckDB oracle. */
object DebugScratch {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outPath) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outPath)
    println(s"DEBUG_WROTE $outPath")
    spark.stop()
  }
}
