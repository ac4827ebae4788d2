package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-ladder proof for the dedup/ANN tier (r12 verdict ask #6):
  * the 100 TB claims for `dedup_minhash_lsh`, `dedup_jaccard_prefix`
  * and `sim_ann_ivfpq` are plan-shape-verified everywhere else; this
  * spec MEASURES them up the ladder — recall floors must hold and
  * wall time must grow sub-quadratically from the sf0.1 corpus to a
  * 10x synthetic "sf1".
  *
  * OPT-IN, excluded from the gate: run with
  *   sbt -Dgraft.scale.ladder=1 "testOnly graft.ops.ScaleLadderSpec"
  * (each test `assume`s the flag and reports canceled otherwise — the
  * sf1 legs are minutes-long and belong in SCALE.md regeneration, not
  * the 15-minute gate). Committed results: SCALE.md.
  *
  * The sf1 corpus is DERIVED, not read: /root/testdata ships no sf1,
  * so the spec unions 10 key-offset copies of the sf0.1 tables with
  * per-copy content made deliberately DISSIMILAR (every [a-z]+ token
  * prefixed with a copy tag; embeddings circularly shifted), so the
  * near-dup structure of each copy mirrors the base corpus exactly
  * and NO cross-copy pairs exist — output size scales 10x (linearly),
  * which is precisely the regime where a quadratic candidate stage
  * would be exposed: with disjoint copies, all-pairs work grows 100x
  * while the honest bucketed/prefix-filtered work grows ~10x. Recall
  * ground truths are computed per scale (exact PPJoin pairs on the
  * minhash shingle definition; brute-force kNN for ANN), never
  * assumed from the construction.
  *
  * The sub-quadratic bound is wall-clock t(10x)/t(1x) < 30 on a
  * single timed run per scale (10-15x is the linear-with-log-factors
  * expectation, 100x the quadratic signature; 30 leaves room for
  * constant-factor effects like the fixed kmeans/codebook fits
  * without ever admitting a quadratic).
  */
class ScaleLadderSpec extends SparkSpec {

  private def optIn(): Unit = {
    // hoisted so the assume macro's cancel message prints this flag,
    // not the whole system-properties map
    val optedIn = sys.props.contains("graft.scale.ladder")
    assume(optedIn,
      "scale ladder is opt-in: -Dgraft.scale.ladder=1 (see SCALE.md)")
  }

  private val sf01 = "/root/testdata/sf0.1"
  private val Copies = 10
  private val IdOffset = 10000000L

  /** tag for copy i — letters only, so both tokenizers ([a-z]+ and
    * whitespace) see per-copy-disjoint token spaces */
  private def tag(i: Int): String = "q" + ('a' + i - 1).toChar + "z"

  private def docsAt(copies: Int): DataFrame = {
    val base = Tables.documents(spark, sf01)
    (0 until copies).map { i =>
      if (i == 0) base.select(col("doc_id"), col("text"))
      else base.select((col("doc_id") + lit(i * IdOffset)).as("doc_id"),
        regexp_replace(col("text"), "([a-z]+)", tag(i) + "$1").as("text"))
    }.reduce(_ unionByName _)
  }

  private def vecsAt(copies: Int): DataFrame = {
    val base = Tables.embeddings(spark, sf01)
    (0 until copies).map { i =>
      if (i == 0) base.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"))
      else base.select((col("vec_id") + lit(i * IdOffset)).as("n_id"),
        expr(s"concat(slice(embedding, ${i + 1}, ${64 - i}), " +
          s"slice(embedding, 1, $i))").as("n_vec"))
    }.reduce(_ unionByName _)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a).cast("long"), col(b).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_minhash_lsh: recall vs exact pairs holds at 1x and 10x, " +
    "wall time grows sub-quadratically") {
    optIn()
    graft.functions.GraftFunctions.register(spark)
    def leg(copies: Int): (Double, Int, Double) = {
      val docs = docsAt(copies)
      // ground truth: exact Jaccard >= 0.8 via the PPJoin prefix
      // filter on the SAME word-3-shingle definition minhash verifies
      // with — a different mechanism than banded LSH, so the recall
      // measurement is not circular
      val sets = TextDedup.shingleSets(docs, "doc_id", "text", 3)
      val ex = SetSimJoin.jaccardSelfJoin(sets, "id", "sh", 0.8)
      val exact = pairSet(ex.df, "a", "b")
      ex.release()
      val (mh, secs) = timed {
        val p = TextDedup.minhashDedupPairs(docs, "doc_id", "text",
          shingleN = 3, k = 32, bands = 16, threshold = 0.8,
          native = true)
        pairSet(p, "a_id", "b_id")
      }
      spark.catalog.clearCache()
      assert(exact.nonEmpty, "ground truth is empty — fixture broken")
      val recall = (mh & exact).size.toDouble / exact.size
      (recall, exact.size, secs)
    }
    val (r1, n1, t1) = leg(1)
    val (r10, n10, t10) = leg(Copies)
    val line = f"[scale] dedup_minhash_lsh 1x: pairs=$n1 recall=$r1%.4f " +
      f"t=$t1%.1fs | 10x: pairs=$n10 recall=$r10%.4f t=$t10%.1fs " +
      f"ratio=${t10 / t1}%.1fx"
    info(line); println(line)
    assert(r1 >= 0.95, f"1x recall $r1%.4f below 0.95")
    assert(r10 >= 0.95, f"10x recall $r10%.4f below 0.95")
    assert(n10 >= Copies * n1, "per-copy pair structure lost")
    assert(t10 / t1 < 30,
      f"t(10x)/t(1x) = ${t10 / t1}%.1f — quadratic-regime growth")
  }

  test("dedup_jaccard_prefix: PPJoin stays EXACT at 10x (recall 1.0 " +
    "by set equality) and wall time grows sub-quadratically") {
    optIn()
    def toks(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      .filter(size(col("ts")) >= 3)
      .withColumn("st", TextDedup.wordShingles(col("ts"), 3))
    def leg(copies: Int): (Set[(Long, Long)], Double) = {
      val (s, secs) = timed {
        val p = SetSimJoin.jaccardSelfJoin(toks(docsAt(copies)),
          "doc_id", "st", 0.3)
        val out = pairSet(p.df, "a", "b")
        p.release()
        out
      }
      spark.catalog.clearCache()
      (s, secs)
    }
    val (p1, t1) = leg(1)
    val (p10, t10) = leg(Copies)
    val line = f"[scale] dedup_jaccard_prefix 1x: pairs=${p1.size} " +
      f"t=$t1%.1fs | 10x: pairs=${p10.size} t=$t10%.1fs " +
      f"ratio=${t10 / t1}%.1fx"
    info(line); println(line)
    assert(p1.nonEmpty)
    // exactness up the ladder: copy 0 of the 10x run reproduces the
    // 1x pair set verbatim, every copy contributes it shifted, and
    // nothing crosses copies (disjoint token spaces)
    assert(p10.filter(p => p._1 < IdOffset && p._2 < IdOffset) == p1,
      "10x copy-0 slice differs from the 1x pair set — exactness lost")
    assert(p10.size == Copies * p1.size,
      s"${p10.size} pairs at 10x != $Copies x ${p1.size} — cross-copy " +
        "leakage or lost pairs")
    assert(t10 / t1 < 30,
      f"t(10x)/t(1x) = ${t10 / t1}%.1f — quadratic-regime growth")
  }

  test("sim_ann_ivfpq: recall@10 up the ladder — fixed rerank decays " +
    "gracefully, fraction-held rerank restores the floor, wall time " +
    "grows sub-quadratically") {
    optIn()
    graft.functions.GraftFunctions.register(spark)
    val k = 10
    val nQueries = 50
    // one fit per scale (centroids + codebooks), then one ANN pass per
    // rerank setting — the rerank dial costs only the rescore join
    def leg(copies: Int, cells: Int, nprobe: Int,
        reranks: Seq[Int]): (Seq[Double], Double) = {
      val corpus = vecsAt(copies)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val queries = corpus.filter(col("n_id") < nQueries)
        .select(col("n_id").as("q_id"), col("n_vec").as("q_vec"))
      val exact = VectorSim.topKBruteForce(queries, corpus, k,
          native = true)
        .select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
      val (recalls, secs) = timed {
        val cents = VectorSim.kmeansCentroids(corpus, col("n_vec"),
          k = cells, iters = 5)
        val books = VectorSim.pqCodebooks(corpus, col("n_vec"),
          m = 16, ksub = 16, iters = 1)
        reranks.map { rr =>
          // rr = 0 drives the operator's fraction-of-pool DEFAULT
          // (r13 verdict #4 — the ladder's own finding, now the shape
          // a dial-less deployment gets)
          val pq = VectorSim.topKAnnIvfPq(queries, corpus, k, cents,
            books, nprobe = nprobe, rerank = rr, native = true)
          val got = pq.df.select("q_id", "n_id").collect()
            .groupBy(_.getLong(0)).map { case (q, rs) =>
              q -> rs.map(_.getLong(1)).toSet }
          pq.release()
          val hits = exact.map { case (q, ex) =>
            (ex & got.getOrElse(q, Set.empty)).size }.sum
          hits.toDouble / exact.map(_._2.size).sum
        }
      }
      corpus.unpersist()
      spark.catalog.clearCache()
      (recalls, secs)
    }
    // cells scale with sqrt(n) (the IVF design rule), nprobe keeps the
    // 0.75 cells-ratio of the unclustered-regime AnnRecallSpec setting
    val (Seq(r1), t1) = leg(1, cells = 16, nprobe = 12,
      reranks = Seq(256))
    // 10x, two rerank settings: 256 FIXED (the r12-measured graceful
    // decay — the constant went from 17% to 1.7% of the ADC pool, and
    // on unclustered random vectors, PQ's hardest regime, recall@10
    // fell 0.90 -> 0.74) and 0 = the operator's fraction-of-pool
    // DEFAULT (r13 verdict #4: the same 17% of nprobe·n/cells the 1x
    // leg ran, now what a dial-less caller gets — rescore cost stays
    // k-bounded per query and linear in the pool, never quadratic in
    // the corpus. Clustered real corpora need far less — cells track
    // the data). The default leg must pass the 1x FLOOR: rerank decay
    // is no longer reachable without explicitly pinning an absolute.
    val (Seq(r10fixed, r10frac), t10) = leg(Copies, cells = 50,
      nprobe = 38, reranks = Seq(256, 0))
    val line = f"[scale] sim_ann_ivfpq 1x(rerank=256): recall@10=$r1%.3f " +
      f"t=$t1%.1fs | 10x: fixed-rerank=$r10fixed%.3f " +
      f"default-frac-rerank=$r10frac%.3f t=$t10%.1fs ratio=${t10 / t1}%.1fx"
    info(line); println(line)
    assert(r1 >= 0.9, f"1x recall $r1%.3f below 0.9")
    assert(r10fixed >= 0.65,
      f"10x fixed-rerank recall $r10fixed%.3f collapsed below 0.65 — " +
        "worse than the documented graceful decay")
    assert(r10frac >= 0.9,
      f"10x DEFAULT-rerank recall $r10frac%.3f below the 1x floor 0.9 " +
        "— the fraction default must not decay with corpus growth")
    assert(t10 / t1 < 30,
      f"t(10x)/t(1x) = ${t10 / t1}%.1f — quadratic-regime growth")
  }
}
