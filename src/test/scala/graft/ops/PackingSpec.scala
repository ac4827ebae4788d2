package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("packSequences matches a sequential brute-force layout") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(7)
    val docs = (1 to 500).map(i => (i.toLong, 1 + rng.nextInt(900)))
    val df = docs.toDF("id", "n")

    val got = Packing.packSequences(df, col("id"), col("n"), 256, buckets = 5)
      .orderBy("id")
      .select("id", "tok_start", "seq_id", "seq_offset", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect()

    var cum = 0L
    val want = docs.map { case (id, n) =>
      val start = cum; cum += n
      val seq = start / 256
      (id, start, seq, start - seq * 256, start + n > (seq + 1) * 256)
    }
    assert(got.toSeq == want)
  }

  test("exact window fills do not spill") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 256), (2L, 256), (3L, 1)).toDF("id", "n")
    val rows = Packing.packSequences(df, col("id"), col("n"), 256)
      .orderBy("id")
      .select("seq_id", "seq_offset", "spans_boundary")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.toSeq == Seq((0L, 0L, false), (1L, 0L, false), (2L, 0L, false)))
  }

  test("the data window is bucket-partitioned, not global") {
    val sp = spark; import sp.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7 + 1)).toDF("id", "n")
    val packed = Packing.packSequences(df, col("id"), col("n"), 64)
    packed.collect() // force execution so AQE finalizes the plan
    val physical = packed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(physical.contains("Exchange hashpartitioning(__b"),
      s"prefix sum must run as a bucket-partitioned window:\n$physical")
    // the only SinglePartition exchange allowed is the tiny per-bucket
    // offsets prefix sum (≤ nBuckets rows), never the data itself
    val single = physical.split("\n")
      .filter(_.contains("Exchange SinglePartition"))
    assert(single.length <= 1, s"unexpected global exchanges:\n$physical")
  }

  test("reserved column clash and bad seqLen fail loud") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 2)).toDF("id", "seq_id")
    intercept[IllegalArgumentException] {
      Packing.packSequences(df, col("id"), col("seq_id"), 16)
    }
    intercept[IllegalArgumentException] {
      Packing.packSequences(Seq((1L, 2)).toDF("id", "n"), col("id"), col("n"), 0)
    }
  }
}
