package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy sequence packing ("concat-and-chunk") for LLM pre-training
  * batch prep: documents are laid out in a deterministic order as one
  * token stream, which is then cut into fixed-length training windows of
  * `seqLen` tokens. Each document is tagged with its starting token
  * offset, the window it starts in, its offset inside that window, and
  * whether it spills across a window boundary — everything a downstream
  * tokenize-and-pack loader needs to materialize examples without ever
  * re-scanning the corpus order.
  *
  * This is the packing strategy GPT-style pipelines use (concatenate
  * docs with an EOS separator, chunk into block_size windows); the
  * `spansBoundary` flag also supports the stricter "no cross-document
  * attention" variants that drop or re-pack boundary-crossing docs.
  *
  * Scale: the only hard part is the global running token total, which is
  * delegated to [[Positional.withCumSum]] — deterministic range buckets,
  * one per-bucket window pass, and a broadcast bucket-offset table. No
  * global sort, no single-partition Window, no driver-side iteration, so
  * the layout survives a corpus where the token stream is trillions of
  * tokens across thousands of executors.
  *
  * Reference analogue: xorq ships the relational substrate (window
  * aggregates over sorted frames) but no packing operator; this is part
  * of the training-data tier the builder brief asks for beyond the
  * reference's own surface.
  */
object Packing {

  /** Tag each row with its position in the packed token stream.
    *
    * @param df       input; one row per document
    * @param orderCol total order of the stream (must be unique — ties
    *                 would make the layout nondeterministic)
    * @param tokens   per-document token count (any integral expression)
    * @param seqLen   training window length in tokens (e.g. 2048)
    * @param buckets  range buckets for the distributed prefix sum
    *                 (0 = spark.sql.shuffle.partitions)
    * @return df plus `tok_start` (exclusive prefix sum of tokens),
    *         `seq_id` (window the document starts in), `seq_offset`
    *         (offset inside that window), `spans_boundary` (document
    *         crosses into the next window)
    */
  def packSequences(
      df: DataFrame,
      orderCol: Column,
      tokens: Column,
      seqLen: Int,
      buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive, got $seqLen")
    val reserved = Seq("tok_start", "seq_id", "seq_offset", "spans_boundary")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"packSequences: input already has column(s) ${clash.mkString(", ")}")
    val w = "__pack_w"
    val withCum = Positional.withCumSum(
      df.withColumn(w, tokens.cast("long")),
      Seq(orderCol), col(w), "tok_start", buckets)
    // tok_start >= 0, so `div` is floor division; all arithmetic stays in
    // LongType (a double floor() would lose precision past 2^53 tokens).
    withCum
      .withColumn("seq_id", expr(s"tok_start div ${seqLen}L"))
      .withColumn("seq_offset", col("tok_start") - col("seq_id") * seqLen)
      .withColumn("spans_boundary",
        col("tok_start") + col(w) > (col("seq_id") + 1) * seqLen)
      .drop(w)
  }
}
