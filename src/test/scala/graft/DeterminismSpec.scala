package graft

/** Shuffle-order determinism audit (r7 verdict ask #2): the driver's
  * correctness harness hashes query output bit-exactly, so any result
  * that depends on FP summation ORDER (which varies with the shuffle
  * partition count) is a latent hash-red — the builder's local run can
  * pass while the driver's 32-core run fails. This spec re-runs the
  * formerly hash-red trio (text_lm_ppl, llm_dsir_select,
  * ts_cusum_changepoint — fixed in r8 by pinned-order summation /
  * per-row integer quantization) plus three other FP-heavy queries at
  * `spark.sql.shuffle.partitions` ∈ {1, 7, 32} and asserts the collected
  * output is IDENTICAL (Row.toString carries the full shortest-decimal
  * repr of every double, so a single-ulp drift fails the test).
  *
  * Runs on sf0.01 (the driver's verify scale) so partition counts
  * actually differ; reverting the r8 fix makes this spec fail.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "text_lm_ppl", "llm_dsir_select", "ts_cusum_changepoint",
    "ts_holt", "graph_pagerank", "stat_spearman",
    "events_anomaly_z", "ml_metrics_pr_cont", "graph_ppr")

  private val verifySf = "/root/testdata/sf0.01"

  for (name <- names)
    test(s"$name output is invariant to shuffle partition count") {
      val fn = SparkEntry.queries(name)
      val runs = Seq("1", "7", "32").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try fn(spark, verifySf).collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val Seq(a, b, c) = runs
      val diffAB = a.zip(b).collectFirst { case (x, y) if x != y => (x, y) }
      val diffAC = a.zip(c).collectFirst { case (x, y) if x != y => (x, y) }
      assert(a.size == b.size && a.size == c.size,
        s"$name row count varies with partition count")
      assert(diffAB.isEmpty && diffAC.isEmpty,
        s"$name output varies with partition count: " +
          s"1-vs-7 ${diffAB.getOrElse("")} 1-vs-32 ${diffAC.getOrElse("")}")
    }
}
