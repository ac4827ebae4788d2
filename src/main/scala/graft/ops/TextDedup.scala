package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text dedup primitives for LLM-data pipelines: shingling, MinHash
  * signatures, banded LSH candidate generation, SimHash.
  *
  * Design for 100 TB (the reference's pipelines run dedup as a batch op;
  * see e.g. xorq's UDXF exchange model, expr/relations.py:661-823 — here
  * re-expressed as pure Spark column algebra):
  *
  *  - Shingling + MinHash + banding are PER-ROW array expressions
  *    (transform/aggregate lambdas) — no explode until the band key
  *    emission, so a doc costs O(shingles × k) hash calls inside
  *    whole-stage codegen and the only shuffle is the band-key groupBy.
  *  - Candidate generation is `groupBy(band, key)` on 64-bit keys —
  *    never an all-pairs crossJoin. At 1000 executors this is one
  *    shuffle of (bands × docs) narrow rows.
  *  - Verification (exact Jaccard) joins shingle SETS back only for the
  *    candidate pairs (bucket-mates), which for realistic thresholds is
  *    ~0.1 % of the cross product.
  */
object TextDedup {

  /** Rebalance a corpus that arrived in (much) fewer partitions than
    * the cluster has cores — the guide §2.5 "input skew" case: a small
    * corpus is one single-row-group parquet file, so the scan is ONE
    * task and every per-row expression pipeline above it (shingling,
    * MinHash kernels) runs on one core until the first exchange.
    * Conditional, so it is a no-op at scale (a 100 TB corpus arrives
    * in far more splits than cores and must NOT pay a payload
    * shuffle); locally it spreads the expensive projection across the
    * cluster for one narrow exchange of the raw rows. Keyed by the
    * doc id (unique → even spread, deterministic under retries). */
  def rebalanceScan(df: DataFrame, key: String): DataFrame =
    // keyed repartition WITHOUT a pinned count, deliberately: AQE may
    // coalesce this exchange when the byte stream is tiny, which an
    // r16 A/B measured as the right call — pinning it to the session
    // shuffle parallelism spread even cheap kernels 32-way and the
    // cascading per-task overhead cost more than the spread saved
    // (containment 2.9 → 3.4 s). Where the kernel dominates (the
    // minhash banding persist), the cached plan keeps the full width
    // anyway (canChangeCachedPlanOutputPartitioning=false).
    if (smallScan(df)) df.repartition(col(key)) else df

  /** The rebalance trigger as a predicate (shared by [[rebalanceScan]]
    * and the small-regime exchange-alignment gates in
    * [[minhashDedupPairs]]): partition COUNT is not the signal — Spark
    * byte-range-splits even a tiny file into defaultParallelism splits,
    * but a single-row-group parquet file yields every row in ONE of
    * them. Plan statistics (known for file scans, no job) give the
    * honest trigger: when the whole input is under ~16 MB/core the
    * repartition shuffle is trivial by construction and buys
    * full-cluster parallelism for the expensive projection above it; a
    * 100 TB corpus never fires. */
  def smallScan(df: DataFrame): Boolean = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(cores) * (16L << 20)
  }

  /** Distinct word n-gram shingles over an ALREADY-MATERIALIZED token
    * array column. IMPORTANT: pass an attribute (a `withColumn` output),
    * not a raw `split(...)` expression — higher-order functions are
    * interpreted, and an inlined sub-expression would be re-evaluated
    * per lambda reference (observed 100× slowdowns). */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", toks))))

  /** Distinct character n-gram shingles over a MATERIALIZED (already
    * length-capped, lower-cased) text column — see [[wordShingles]]. */
  def charShingles(t: Column, n: Int): Column =
    array_distinct(
      when(length(t) >= n,
        transform(sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n))))
        .otherwise(array(t)))

  /** MinHash signatures + shingle sets, computed the aggregate way:
    * explode shingles to rows, then sig[s] = min(xxhash64(s, shingle))
    * as k plain `min` aggregate columns `h0..h{k-1}` plus
    * `collect_set` of the shingles (for later exact verification).
    *
    * This shape stays inside whole-stage codegen and gets map-side
    * partial aggregation — ONE shuffle of ~1 partial row per doc per
    * partition. (A pure array-lambda formulation is interpreted and,
    * worse, Catalyst's CollapseProject inlines each stage into its
    * consumers, re-evaluating the shingling O(k·bands) times per row.)
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      k: Int): DataFrame = {
    val shRows = shingleRows(docs, idCol, textCol, shingleN)
    shRows.groupBy("id").agg(
      min(xxhash64(lit(0), col("shingle"))).as("h0"),
      (1 until k).map(s =>
        min(xxhash64(lit(s), col("shingle"))).as(s"h$s")): _*)
  }

  /** (id, shingle) rows — shared by signature and set building.
    *
    * Formulated as posexplode(tokens) + window `lead`s so everything is
    * whole-stage-codegen'd and the text is split exactly once per doc
    * (an array-lambda shingler is interpreted and re-evaluates the
    * split per lambda reference — measured ~240 splits/doc). The window
    * shuffle partitions by doc id, which the downstream groupBy(id)
    * aggregations then reuse — one exchange total.
    *
    * Docs with fewer than `shingleN` tokens emit their whole token run
    * as one shingle (same fallback as [[wordShingles]]; `concat_ws`
    * skips the null leads, so the pos-0 row IS that shingle) — without
    * it, short docs had zero shingles and silently vanished from dedup
    * (ADVICE r2). The fallback is free: keeping every pos-0 row covers
    * exactly the short docs (a long doc's pos-0 row is a full shingle
    * anyway), with no extra window pass. */
  def shingleRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokRows = docs
      .select(col(idCol).as("id"),
        posexplode(split(lower(trim(col(textCol))), "\\s+")))
      .toDF("id", "pos", "tok")
    val w = Window.partitionBy("id").orderBy("pos")
    val leads = col("tok") +:
      (1 until shingleN).map(j => lead(col("tok"), j).over(w))
    tokRows
      .select(col("id"), leads.last.isNotNull.as("full"),
        col("pos"),
        concat_ws(" ", leads: _*).as("shingle"))
      .filter(col("full") || col("pos") === 0)
      .select("id", "shingle")
  }

  /** Distinct word n-gram shingles as FLAT (id, tok) ROWS from an
    * already-materialized token-array column — the codegen-friendly
    * twin of [[wordShingles]] for row-oriented consumers
    * ([[SetSimJoin]]'s element universe). The array-lambda shingler is
    * INTERPRETED (transform + per-element element_at/concat_ws) and
    * measured ~9 s at sf0.1 where this posexplode + window-lead
    * formulation runs in ~1 s (r15 probe): tokens explode once through
    * a single Generate, the `lead` window builds each n-gram inside
    * whole-stage codegen, and the per-doc distinct is an aggregate
    * that RIDES the window's (id) partitioning — one exchange total.
    * Row set is exactly explode(array_distinct(wordShingles(ts, n)))
    * including the short-doc whole-run fallback (the pos-0 row).
    */
  def wordShingleRows(
      docs: DataFrame,
      idCol: String,
      toksCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokRows = docs
      .select(col(idCol).as("id"), posexplode(col(toksCol)))
      .toDF("id", "pos", "tok")
    val w = Window.partitionBy("id").orderBy("pos")
    val leads = col("tok") +:
      (1 until n).map(j => lead(col("tok"), j).over(w))
    tokRows
      .select(col("id"), leads.last.isNotNull.as("full"),
        col("pos"), concat_ws(" ", leads: _*).as("shingle"))
      .filter(col("full") || col("pos") === 0)
      .select(col("id"), col("shingle").as("tok"))
      .distinct() // per-(id, tok): reuses the window's id partitioning
  }

  /** Distinct shingle SETS as arrays, one row per doc. Used only for
    * exact verification — call on the (small) candidate subset, not
    * the full corpus: collect_set is an object aggregate and must not
    * sit on the 100 TB path. */
  def shingleSets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int): DataFrame =
    shingleRows(docs, idCol, textCol, shingleN)
      .groupBy("id").agg(collect_set(col("shingle")).as("sh"))

  /** LSH band keys over the `h0..h{k-1}` signature columns of
    * [[minhashSignatures]]: one xxhash64 per band over its
    * `rowsPerBand` plain columns — pure codegen'd projection. Output:
    * array<struct<band:int, key:long>> to explode + groupBy(band, key)
    * (s-curve: P(bucket) = 1-(1-s^r)^b). */
  def lshBandKeyArray(bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(lit(b) +:
          (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(i => col(s"h$i")): _*).as("key"))
    }: _*)

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** `bits`-bit SimHash per doc, aggregate-style: explode tokens, one
    * signed bit-count `sum` aggregate per bit, then assemble the long
    * in a plain projection. Codegen'd; one map-side-combined shuffle.
    * Output: (id, sim). */
  def simhashAgg(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      bits: Int): DataFrame = {
    val tokRows = docs
      .select(col(idCol).as("id"), explode(tokens).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val sums = tokRows.groupBy("id").agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as("b0"),
      (1 until bits).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1)
          .otherwise(-1)).as(s"b$b")): _*)
    sums.select(col("id"),
      (0 until bits).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("sim"))
  }

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Candidate near-dup pairs (idA < idB) from banded LSH over word
    * shingles, verified with exact Jaccard ≥ `threshold`.
    *
    * @return columns: a_id, b_id, wjac (word-shingle Jaccard)
    */
  def minhashDedupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 32,
      bands: Int = 16,
      threshold: Double = 0.8,
      native: Boolean = false): DataFrame = {
    // bands > k would make every band key a constant (all docs become
    // bucket-mates → the O(n^2) cross product this operator exists to
    // avoid); a non-multiple silently weakens the s-curve by dropping
    // trailing hashes (review-caught)
    require(bands >= 1 && k >= bands && k % bands == 0,
      s"k=$k must be a positive multiple of bands=$bands")
    val rowsPerBand = k / bands
    // rebalanced: the fused minhash kernel is the pipeline's dominant
    // per-row cost and otherwise runs inside the (often single-task)
    // scan partition — see [[rebalanceScan]]
    val src = if (native) rebalanceScan(docs, idCol) else docs
    // small-corpus regime (same stats trigger as rebalanceScan): gates
    // the exchange-alignment tricks below that trade the distinct's
    // map-side partial dedup for a rideable partitioning — a good trade
    // only when the candidate stream is trivially small (r16)
    val smallCorpus = smallScan(docs)
    // narrow (id + band/key) and consumed by BOTH sides of the bucket
    // self-join — persist so the signature work runs once.
    // Big-corpus regime: persist PRE-PARTITIONED by the join key
    // (band, key) — the cached relation then satisfies BOTH sides of
    // the self-join, so the join's two per-side exchanges collapse
    // into the one exchange paid at the persist (guide §2.4 "two
    // operations keyed the same way share one exchange"; strictly
    // fewer bytes: the same stream moves once, not twice). In the
    // small regime the planner already BROADCASTS one side of the
    // self-join (stats propagate through the persist marker —
    // plans/r16/dedup_minhash_lsh_before.txt, node 26), so a
    // pre-partition there would be a dead exchange and is skipped.
    // native: ONE fused expression from cleaned text to (band, key)
    // structs, fed straight into explode so the Generate evaluates it
    // once per row — no posexplode of tokens, no window pass, no
    // 32-column aggregate (bit-identical keys; MinhashBandsSpec).
    val exploded0 = (if (native)
      src.select(col(idCol).as("id"),
        explode(call_function("graft_minhash_bands",
          lower(trim(col(textCol))), lit(shingleN), lit(k), lit(bands)))
          .as("bk"))
        .select(col("id"), col("bk.band"), col("bk.key"))
    else
      minhashSignatures(docs, idCol, textCol, shingleN, k)
        .select(col("id"),
          explode(lshBandKeyArray(bands, rowsPerBand)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.key")))
    val exploded = (if (smallCorpus) exploded0
      else exploded0.repartition(col("band"), col("key")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket-mate pairs: self-join restricted to the same (band, key);
    // distinct because a pair can share several bands (its map-side
    // partial dedup shrinks the stream before the exchange — kept at
    // every scale; the verify joins below are BroadcastHashJoin via
    // propagated stats, so no downstream partitioning is needed from
    // this exchange). Persisted — consumed three times below and tiny
    // by construction.
    val cands = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact-verification sets ONLY for candidate docs (semi-join first):
    // collect_set never touches the full corpus
    // distinctly-named join column: an alias of "id" would be ambiguous
    // whenever the caller's idCol is itself "id" (review-caught)
    // The union feeds a left_semi BROADCAST build, which dedups keys in
    // the hash relation anyway — in the small regime the distinct is a
    // dead exchange and is skipped; at scale it is kept so the driver
    // collects |ids| rows, not 2·|pairs| (r16).
    val candIds0 = cands.select(col("a_id").as("__cand_id"))
      .union(cands.select(col("b_id")))
    val candIds = if (smallCorpus) candIds0 else candIds0.distinct()
    // candidates are rare by construction → broadcast the semi-join so
    // the corpus is filtered scan-side with no shuffle
    // persisted: the verify join consumes `sets` TWICE (sa and sb
    // sides) and without the marker the whole shingleSets pipeline
    // (semi-join + posexplode + window + collect_set) re-ran once per
    // side (r15 probe) — the relation is candidate-doc-sized, so the
    // cache is bounded by construction
    val sets = shingleSets(
      docs.join(broadcast(candIds), col(idCol) === col("__cand_id"),
        "left_semi"),
      idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verified = cands
      .join(sets.as("sa"), col("a_id") === col("sa.id"))
      .join(sets.as("sb"), col("b_id") === col("sb.id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("sa.sh"), col("sb.sh")).as("wjac"))
      .filter(col("wjac") >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (small, verified) result while sig/cands are
    // still cached, then RELEASE the intermediates — in a long-lived
    // session (Registry, notebooks) they would otherwise accumulate
    // for the session lifetime (r2 finding). The returned frame stays
    // persisted: it is the product; callers may unpersist when done.
    verified.count()
    exploded.unpersist(false)
    cands.unpersist(false)
    sets.unpersist(false)
    verified
  }

  /** BIPARTITE MinHash-LSH near-dup pairs between two corpora — the
    * fuzzy train-vs-eval decontamination shape (GPT-3 App. C /
    * Dolma-style): exact n-gram matching (llm_decontaminate) misses
    * lightly-edited eval leakage, so real scrubs also run a MinHash
    * pass ACROSS the split. Same scale shape as [[minhashDedupPairs]]
    * (band keys per side, one (band, key) equi-join — never a cross
    * product; exact Jaccard verify for candidate pairs only), but the
    * two sides are different frames, so candidate generation is a
    * plain two-table equi-join: the small side's bands shuffle once,
    * and at 100 TB the eval side is tiny — AQE broadcasts it.
    *
    * @return columns: a_id (left), b_id (right), wjac */
  def minhashCrossPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 32,
      bands: Int = 16,
      threshold: Double = 0.8,
      native: Boolean = false): DataFrame = {
    require(bands >= 1 && k >= bands && k % bands == 0,
      s"k=$k must be a positive multiple of bands=$bands")
    val rowsPerBand = k / bands
    def bandKeys(df0: DataFrame): DataFrame = {
      // same scan-rebalance as minhashDedupPairs: the fused kernel must
      // not run inside a single-task scan partition
      val df = if (native) rebalanceScan(df0, idCol) else df0
      if (native)
        df.select(col(idCol).as("id"),
          explode(call_function("graft_minhash_bands",
            lower(trim(col(textCol))), lit(shingleN), lit(k), lit(bands)))
            .as("bk"))
          .select(col("id"), col("bk.band"), col("bk.key"))
      else
        minhashSignatures(df, idCol, textCol, shingleN, k)
          .select(col("id"),
            explode(lshBandKeyArray(bands, rowsPerBand)).as("bk"))
          .select(col("id"), col("bk.band"), col("bk.key"))
    }
    // the band keys are deterministic functions of text, so identical
    // hash families apply to both sides — bucket-mates across frames
    // are exactly the cross-corpus LSH candidates
    val lb = bandKeys(left)
    val rb = bandKeys(right)
    // no id-inequality here: this is a BIPARTITE join of two
    // independent frames, so self-pair exclusion does not apply — a
    // left id that numerically coincides with a right id (normal when
    // train/eval carry separate id spaces) is still a true
    // cross-corpus candidate
    val cands = lb.as("a")
      .join(rb.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aIds = cands.select(col("a_id").as("__cand_id")).distinct()
    val bIds = cands.select(col("b_id").as("__cand_id")).distinct()
    val setsA = shingleSets(
      left.join(broadcast(aIds), col(idCol) === col("__cand_id"),
        "left_semi"), idCol, textCol, shingleN)
    val setsB = shingleSets(
      right.join(broadcast(bIds), col(idCol) === col("__cand_id"),
        "left_semi"), idCol, textCol, shingleN)
    val verified = cands
      .join(setsA.as("sa"), col("a_id") === col("sa.id"))
      .join(setsB.as("sb"), col("b_id") === col("sb.id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("sa.sh"), col("sb.sh")).as("wjac"))
      .filter(col("wjac") >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verified.count()
    cands.unpersist(false)
    verified
  }

  /** ENGINE-PORTABLE k=8 minhash signature (m0..m7 per id): each hash
    * is an 8-hex window of one of two md5 digests per element
    * (`md5(g || "#0")`, `md5(g || "#1")`), so a SQL oracle can replay
    * the exact signatures with
    * `('0x' || substr(md5(g || '#d'), 1+8·(j%4), 8))::BIGINT`. Use for
    * hash-checkable LSH experiments (dedup_lsh_eval, incremental
    * dedup); the production-speed path is the native xxhash minhash in
    * [[minhashDedupPairs]]. Input: one row per (id, gram). */
  def portableMinhash8(df: DataFrame, idCol: String,
      gramCol: String): DataFrame = {
    def mhCol(j: Int) = {
      val d = j / 4; val pos = 1 + 8 * (j % 4)
      min(conv(substring(md5(concat(col(gramCol), lit("#" + d))),
        pos, 8), 16, 10).cast("long")).as(s"m$j")
    }
    df.groupBy(idCol).agg(mhCol(0), (1 to 7).map(mhCol): _*)
  }
}
