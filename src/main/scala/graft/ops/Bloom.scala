package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filtering for semi joins — the 100 TB join
  * pattern Spark itself uses for runtime row-group filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), re-expressed as a
  * library operator so ANY graft semi/anti join can opt in explicitly.
  *
  * Why it matters at scale: a semi join whose build side is too big to
  * broadcast shuffles the ENTIRE probe side on the join key. A Bloom
  * filter of the build keys is a few KB–MB regardless of build row count
  * (16 KiB here for 2^17 bits), broadcasts for free, and drops most
  * non-matching probe rows BEFORE the exchange — the shuffle then moves
  * only (matches + false positives). The exact semi join still runs after
  * the pre-filter, so the result is IDENTICAL to the plain semi join
  * (Bloom filters have no false negatives); the filter only cuts shuffle
  * volume.
  *
  * Design for engine-stability and codegen:
  *  - Both sides derive the SAME two 64-bit hashes with Spark's own
  *    `xxhash64` (seeded by an extra literal column for independence), so
  *    build and probe agree bit-for-bit by construction — no Scala-side
  *    hash reimplementation to drift.
  *  - Double hashing (Kirsch–Mitzenmacher 2006): probe i checks bit
  *    `(h + i*g) mod m` with g forced odd so the step is coprime to the
  *    power-of-two m and walks all residues.
  *  - The k probe-bit checks are k STATIC column expressions (k is a
  *    plan-time constant), not a higher-order function — the whole probe
  *    filter stays inside whole-stage codegen.
  *  - The bit array is built by a typed [[Aggregator]] (zero = all-clear
  *    words, reduce = set k bits, merge = bitwise OR — Bloom union is
  *    exact), collected once (m/64 longs) and baked into the plan as ONE
  *    array literal.
  *
  * Ref capability: xorq exposes semi/anti joins through Ibis
  * (vendor relations.py join kinds); the runtime-filter variant is the
  * scale path this engine adds on top.
  */
object Bloom {

  /** Builds the m-bit filter from pre-hashed (h, g) pairs. */
  private final class BitsAgg(words: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    private val mBits = words.toLong * 64
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], hg: (Long, Long)): Array[Long] = {
      val (h, g) = hg // both already reduced mod mBits by hashCols
      var i = 0
      while (i < k) {
        val p = (h + i.toLong * g) % mBits
        b((p >>> 6).toInt) |= (1L << (p & 63))
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** h = xxhash64(key) mod m; g = xxhash64(key, 1) mod m, forced odd
    * (m is a power of two, so |1 keeps g coprime to m). Reducing both
    * hashes mod m up front keeps `h + i*g` far below Long.Max — ANSI
    * mode would throw on the raw 64-bit double-hashing sum. */
  private def hashCols(key: Column, mBits: Long): (Column, Column) =
    (pmod(xxhash64(key), lit(mBits)),
      pmod(xxhash64(key, lit(1)), lit(mBits)).bitwiseOR(lit(1L)))

  /** The filter of `build`'s `buildKey` values: Array[Long] of
    * `mBits/64` words. One aggregation job; the result is the only
    * thing collected (mBits/8 bytes, independent of build row count). */
  def buildBits(build: DataFrame, buildKey: Column,
                mBits: Int = 1 << 17, k: Int = 4): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    import build.sparkSession.implicits._
    val (h, g) = hashCols(buildKey, mBits.toLong)
    val hg = build.select(h.as("h"), g.as("g")).na.drop()
      .as[(Long, Long)]
    hg.select(udaf(new BitsAgg(mBits / 64, k)).apply(col("h"), col("g")))
      .as[Array[Long]].head()
  }

  /** The probe-side membership predicate for `key` against `bits` —
    * k codegen-friendly static bit checks, true iff every probed bit is
    * set (i.e. key is possibly in the build set). NULL keys yield NULL
    * (filtered out, matching semi-join semantics). */
  def mightContain(key: Column, bits: Array[Long], k: Int = 4): Column = {
    val mBits = bits.length.toLong * 64
    val bitsLit = typedLit(bits.toSeq)
    val (h, g) = hashCols(key, mBits)
    (0 until k).map { i =>
      val p = pmod(h + lit(i.toLong) * g, lit(mBits))
      element_at(bitsLit, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Exact LEFT SEMI join of `probe` on `probeKey` ∈ `build.buildKey`,
    * with the probe side pre-filtered through the build side's Bloom
    * filter before the join's exchange. Result is row-identical to
    * `probe.join(build, probeKey === buildKey, "left_semi")`. */
  def semiJoin(probe: DataFrame, probeKey: Column,
               build: DataFrame, buildKey: Column,
               mBits: Int = 1 << 17, k: Int = 4): DataFrame = {
    val bits = buildBits(build, buildKey, mBits, k)
    probe.filter(mightContain(probeKey, bits, k))
      .join(build.select(buildKey.as("__bloom_bk")).distinct(),
        probeKey === col("__bloom_bk"), "left_semi")
  }
}
