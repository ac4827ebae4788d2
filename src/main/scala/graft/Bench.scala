package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline (bench-flagged) queries against
  * `SPARK_GRAFT_SF_DIR` and prints exactly one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing = full action (plan + execute + count); a trivial warmup action
  * first so JVM/session startup isn't attributed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table footer + run one tiny job
    Tables.names.foreach(n => Tables(spark, sfDir, n).schema)
    spark.range(1000).count()

    val results = SparkEntry.benchQueries.map { d =>
      val t0 = System.nanoTime()
      try { d.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      d.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
