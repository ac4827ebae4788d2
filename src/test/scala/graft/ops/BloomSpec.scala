package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("bloom semi join is row-identical to the plain semi join") {
    val build = orders.filter(col("o_orderpriority") === "1-URGENT")
    val got = Bloom.semiJoin(lineitem, col("l_orderkey"),
        build, col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    val want = lineitem.join(build,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() === want.count())
  }

  test("no false negatives ever; false positives bounded on disjoint keys") {
    // build keys 0..999, probe keys 100000..109999 — fully disjoint, so
    // every bloom pass is a false positive.
    val build = spark.range(1000).toDF("k")
    val probe = spark.range(100000, 110000).toDF("p")
    val bits = Bloom.buildBits(build, col("k"))
    val passed = probe.filter(Bloom.mightContain(col("p"), bits)).count()
    // m=2^17 bits / 1000 keys, k=4 → theoretical fp ~ (1-e^(-4000/131072))^4
    // ≈ 8e-7; 10k probes should essentially never pass. Allow tiny slack.
    assert(passed <= 5, s"false-positive count $passed out of 10000")
    // overlapping keys must ALL pass (no false negatives):
    val overlap = spark.range(500, 1500).toDF("p")
    val mustPass = overlap.filter(col("p") < 1000)
      .filter(Bloom.mightContain(col("p"), bits)).count()
    assert(mustPass === 500L)
  }

  test("merge across partitions equals single-partition build") {
    val keys = spark.range(0, 5000).toDF("k")
    val many = Bloom.buildBits(keys.repartition(8), col("k"))
    val one = Bloom.buildBits(keys.coalesce(1), col("k"))
    assert(java.util.Arrays.equals(many, one))
  }

  test("pre-filter prunes before the exchange (plan shape)") {
    val build = orders.filter(col("o_orderpriority") === "1-URGENT")
    val bits = Bloom.buildBits(build, col("o_orderkey"))
    val filtered = lineitem.filter(
      Bloom.mightContain(col("l_orderkey"), bits))
    // the membership predicate is a plain Filter over the scan — no
    // join, no exchange introduced by the bloom check itself
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    assert(filtered.count() > 0)
  }
}
