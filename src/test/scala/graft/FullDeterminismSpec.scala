package graft

/** FULL-REGISTRY shuffle-order determinism audit (r8 verdict ask #4):
  * DeterminismSpec guards nine hand-picked FP-heavy queries at sf0.01;
  * this spec makes the r8 failure class (output depending on FP
  * summation ORDER, which varies with the shuffle partition count —
  * the text_lm_ppl/llm_dsir_select/ts_cusum_changepoint saga)
  * impossible to regress ANYWHERE in the registry: every query in
  * `SparkEntry.queries` runs at `spark.sql.shuffle.partitions` ∈
  * {1, 32} on the smoke-scale data and must collect bit-identical
  * output (Row.toString carries the full shortest-decimal repr of
  * every double, so a single-ulp drift fails).
  *
  * sf0.001 keeps the 283×2 sweep cheap; the targeted sf0.01 spec
  * stays as the deeper probe of the known-risky nine. Caches are
  * cleared between queries (the r3 cache-residue lesson — a persist
  * left by query N would make query N+1's partitions=1 run read
  * 32-partition cached data and mask the very divergence under test).
  */
class FullDeterminismSpec extends SparkSpec {

  private val smokeSf = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is partition-count invariant at sf0.001") {
      val runs = Seq("1", "32").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try fn(spark, smokeSf).collect().map(_.toString).sorted.toSeq
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          spark.catalog.clearCache()
        }
      }
      val Seq(a, b) = runs
      assert(a.size == b.size,
        s"$name row count varies with partition count: ${a.size} vs ${b.size}")
      val diff = a.zip(b).collectFirst { case (x, y) if x != y => (x, y) }
      assert(diff.isEmpty,
        s"$name output varies with partition count (1 vs 32): $diff")
    }
}
