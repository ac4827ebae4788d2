package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the PPJoin
  * family: Xiao et al. 2008, "Efficient Similarity Joins for Near
  * Duplicate Detection", WWW — the candidate-prefix construction only;
  * positional/suffix refinements are left to the verify step).
  *
  * Complements the probabilistic MinHash-LSH path (ops/TextDedup.scala):
  * LSH gives tunable recall at fixed cost; this gives recall = 1.0
  * (every pair with Jaccard ≥ τ is found, provably) at a cost governed
  * by the prefix-filter bound — the right tool when a pipeline must
  * GUARANTEE no duplicate survives (e.g. eval-set leakage scrubbing).
  *
  * Scale shape (100 TB):
  *  - Token ordering is by ASCENDING global frequency (rarest first),
  *    the ordering that minimizes candidate fan-out; frequencies come
  *    from one corpus aggregation, joined back by token equi-join.
  *  - A set of size s contributes only its first s - ceil(τ·s) + 1
  *    tokens to the candidate join: any pair with J ≥ τ shares ≥
  *    ceil(τ·s) elements, which cannot all hide in the (shorter)
  *    suffix — so candidates on prefix-token equality are complete.
  *  - The candidate join is a plain equi-join on the token (AQE
  *    re-plannable, skew-salvageable); a length filter
  *    τ·sA ≤ sB prunes before dedup. Full sets are joined back ONLY
  *    for surviving candidate pairs; the corpus never cross-products.
  */
object SetSimJoin {

  /** Deferred result + cache lifecycle. `df` is the verified-pairs
    * frame with persist MARKERS on the shared intermediates — nothing
    * executes until the caller's first action (the operator stays
    * deferred like the rest of the library; r5 verdict #5). Call
    * `release()` once the result has been consumed (or re-derived into
    * something persisted of its own): it unpersists the intermediates
    * so a long-lived session does not accumulate executor storage. */
  final case class SimPairs(df: DataFrame, release: () => Unit)

  /** All pairs (a < b) with exact Jaccard(setA, setB) ≥ tau.
    * Input: one row per id with an array column (de-duplicated
    * internally). Output: a, b, inter, union, jac — jac computed from
    * the same integer triple on any engine, so it is bit-reproducible.
    *
    * Construction is DEFERRED — no Spark job runs until the caller
    * acts on the result (spec-asserted). The caller owns the cache
    * lifecycle via the returned handle. */
  def jaccardSelfJoin(df: DataFrame, idCol: String, setCol: String,
                      tau: Double): SimPairs = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    // consumed FOUR times below (frequency agg, prefix build, both
    // verify sides) — persist so the caller's tokenize/shingle pipeline
    // runs once, not once per consumer (was the whole-query hot spot:
    // 4x regexp_extract_all over the corpus)
    val sets = df
      .select(col(idCol).as("id"), array_distinct(col(setCol)).as("st"))
      .filter(size(col("st")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // global token frequencies — ONE corpus-wide aggregation
    val freq = sets.select(explode(col("st")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))

    // per-set canonical order: rarest token first (ties by token text);
    // prefix = first s - ceil(tau*s) + 1 tokens in that order.
    // Persisted: both sides of the candidate self-join read it, and the
    // explode + freq-join + window pass is the second-biggest stage.
    val w = Window.partitionBy("id").orderBy(col("f"), col("tok"))
    val prefix = sets
      .select(col("id"), size(col("st")).as("s"), explode(col("st")).as("tok"))
      .join(freq, "tok")
      .withColumn("p", row_number().over(w))
      .filter(col("p") <= col("s") - ceil(lit(tau) * col("s")) + 1)
      .select(col("id"), col("s"), col("p"), col("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // candidate pairs: prefix-token equi-join, ordered ids, length
    // filter (J >= tau forces tau*sA <= sB <= sA/tau), then the PPJoin
    // POSITIONAL filter applied PER MATCH ROW, before the distinct:
    // for a pair with overlap O ≥ α = ceil(τ/(1+τ)·(sA+sB)), its
    // globally-first shared prefix token (one GLOBAL (f, tok) order ⇒
    // it minimizes both positions at once, and no shared token can
    // precede it in either set — an earlier shared token would sit in
    // both prefixes and be an earlier shared prefix token itself) has
    // the exact bound O ≤ 1 + min(sA−i, sB−j), so that row always
    // survives its own-row filter and the pair is never lost (recall
    // 1.0, Xiao et al. 2008 Lemma 2); rows of invalid pairs are pruned
    // before they widen the distinct. Keeping the filter per-row keeps
    // the dedup shuffle at two narrow columns — a grouped min/min
    // formulation triples the shuffle width of the heaviest exchange
    // for no extra pruning.
    val a = prefix.select(col("id").as("a"), col("s").as("sa"),
      col("p").as("pa"), col("tok"))
    val b = prefix.select(col("id").as("b"), col("s").as("sb"),
      col("p").as("pb"), col("tok"))
    val cand = a.join(b, "tok")
      .filter(col("a") < col("b"))
      .filter(col("sb") * tau <= col("sa") && col("sa") * tau <= col("sb"))
      .filter(lit(1) + least(col("sa") - col("pa"), col("sb") - col("pb")) >=
        ceil(lit(tau) / (1 + tau) * (col("sa") + col("sb"))))
      .select("a", "b").distinct()

    // exact verification — sets joined back for candidates only
    val sa = sets.select(col("id").as("a"), col("st").as("sta"))
    val sb = sets.select(col("id").as("b"), col("st").as("stb"))
    val verified = cand.join(sa, "a").join(sb, "b")
      .withColumn("inter", size(array_intersect(col("sta"), col("stb"))).cast("long"))
      .withColumn("union",
        (size(col("sta")) + size(col("stb"))).cast("long") - col("inter"))
      .withColumn("jac", col("inter").cast("double") / col("union"))
      .filter(col("jac") >= tau)
      .select("a", "b", "inter", "union", "jac")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // No action here: construction must not execute the job (it would
    // double-charge any caller composing lazily). The verified frame
    // keeps its own persist marker; the handle releases the shared
    // intermediates once the caller has materialized it.
    SimPairs(verified, () => {
      sets.unpersist(false)
      prefix.unpersist(false)
    })
  }
}
