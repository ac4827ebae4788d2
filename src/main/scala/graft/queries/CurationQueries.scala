package graft.queries

import graft.ops.{Bloom, HeavyHitters, Positional}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 data-curation additions: RAG document chunking, ranked-retrieval
  * NDCG, distributed ECDF score calibration, and blocked fuzzy record
  * linkage (entity resolution).
  *
  * These extend the training-data-pipeline tier beyond the reference's own
  * operator set (the builder brief's "operations a large-scale
  * training-data pipeline would need"): chunking is the retrieval/indexing
  * prep step, NDCG the retrieval-quality metric, ECDF the score-calibration
  * pass quality classifiers need, and fuzzy linkage the entity-resolution
  * dedup that exact/MinHash dedup cannot express.
  */
object CurationQueries {

  val defs: Seq[graft.QueryDef] = Seq(

    // Overlapping token-window chunking — the RAG/pretraining prep step
    // that splits every document into fixed-size windows (W=64 tokens,
    // stride S=48, so consecutive chunks overlap by 16) with stable
    // (doc_id, chunk_idx) identity. Pure per-row explode: tokenize once,
    // compute the chunk count arithmetically, explode a sequence and
    // slice — no shuffle at all until the output ORDER BY; at 100 TB
    // this is a linear scan inside whole-stage codegen whose output is
    // ~W/S × corpus size. Chunk count = 1 + ceil(max(n-W,0)/S) so a
    // document shorter than one window still yields exactly one chunk.
    q("text_chunk_rag",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |c AS (SELECT doc_id, ts, len(ts) n,
        |             1 + (greatest(len(ts) - 64, 0) + 47) // 48 AS nch
        |      FROM tok WHERE len(ts) > 0),
        |ch AS (SELECT doc_id,
        |              unnest(generate_series(0, nch - 1)) AS chunk_idx,
        |              ts, n
        |       FROM c)
        |SELECT doc_id, chunk_idx,
        |       len(list_slice(ts, chunk_idx * 48 + 1,
        |                      least(chunk_idx * 48 + 64, n))) AS n_tok,
        |       array_to_string(list_slice(ts, chunk_idx * 48 + 1,
        |                       least(chunk_idx * 48 + 64, n)), ' ')
        |         AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_idx""") { c =>
      val tok = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
        .withColumn("n", size(col("ts")))
        .filter(col("n") > 0)
        .withColumn("nch",
          expr("1 + (greatest(n - 64, 0) + 47) div 48"))
      tok
        .select(col("doc_id"), col("ts"), col("n"),
          explode(sequence(lit(0), col("nch") - 1)).as("chunk_idx"))
        .withColumn("chunk",
          slice(col("ts"), col("chunk_idx") * 48 + 1,
            least(lit(64), col("n") - col("chunk_idx") * 48)))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("n_tok"),
          array_join(col("chunk"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // NDCG@10 per language stratum — the ranked-retrieval quality metric
    // (Järvelin & Kekäläinen 2002) over a deterministic ranking: per
    // lang, candidates are the top-10 docs by (n_chars DESC, doc_id),
    // graded relevance rel = doc_id % 4. Gains are integer-exact
    // ((1<<rel)-1); each DCG term is quantized to integer micro-units
    // before summation (the text_lm_ppl pattern) so the per-group sum is
    // order-independent and bit-identical across engines; NDCG is the
    // ratio of the two integer sums. Scale shape: the only windows are
    // PARTITIONED by the query key (lang) and bounded to the candidate
    // list — per-query work is O(k), never corpus-wide.
    q("rank_ndcg",
      """WITH cand AS (
        |  SELECT lang, doc_id, doc_id % 4 AS rel,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id) AS p
        |  FROM documents),
        |top AS (SELECT * FROM cand WHERE p <= 10),
        |ideal AS (SELECT lang, doc_id, rel, p,
        |                 row_number() OVER (PARTITION BY lang
        |                                    ORDER BY rel DESC, doc_id) AS q
        |          FROM top),
        |s AS (SELECT lang, count(*) AS n_cand,
        |             sum(CAST(round(((1 << rel) - 1) / log2(p + 1) * 1e6
        |                            + 1e-9) AS BIGINT)) AS dcg_u,
        |             sum(CAST(round(((1 << rel) - 1) / log2(q + 1) * 1e6
        |                            + 1e-9) AS BIGINT)) AS idcg_u
        |      FROM ideal GROUP BY lang)
        |SELECT lang, n_cand,
        |       round(dcg_u / idcg_u + 1e-9, 6) AS ndcg
        |FROM s ORDER BY lang""") { c =>
      val cand = c.documents
        .select(col("lang"), col("doc_id"),
          (col("doc_id") % 4).as("rel"), col("n_chars"))
        .withColumn("p", row_number().over(
          Window.partitionBy("lang")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("p") <= 10)
      val ideal = cand.withColumn("q", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("rel").desc, col("doc_id"))))
      def termU(pos: String) =
        sum(round((expr("shiftleft(1, rel)") - 1).cast("double") /
          log2(col(pos) + 1) * lit(1e6) + lit(1e-9)).cast("long"))
      ideal.groupBy("lang")
        .agg(count(lit(1)).as("n_cand"),
          termU("p").as("dcg_u"), termU("q").as("idcg_u"))
        .select(col("lang"), col("n_cand"),
          r6(col("dcg_u") / col("idcg_u")).as("ndcg"))
        .orderBy("lang")
    },

    // MAP@10 per language stratum — the binary-relevance companion of
    // rank_ndcg on the same deterministic ranking (top-10 by n_chars
    // DESC, doc_id; relevant = grade ≥ 2). Every precision@p is an
    // exact integer ratio cumrel/p; each relevant hit's term is
    // quantized to micro-units before the per-query sum (the NDCG
    // pattern), AP = integer sum / (R·1e6), and the corpus MAP is the
    // mean of the per-query rounded APs. Windows are partitioned by
    // the query key and bounded to the candidate list — O(k) per
    // query.
    q("rank_map_at_k",
      """WITH cand AS (
        |  SELECT lang, doc_id,
        |         CASE WHEN doc_id % 4 >= 2 THEN 1 ELSE 0 END AS rel,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id) AS p
        |  FROM documents),
        |top AS (SELECT lang, rel, p,
        |               sum(rel) OVER (PARTITION BY lang ORDER BY p) cr
        |        FROM cand WHERE p <= 10),
        |s AS (SELECT lang,
        |        sum(rel)::BIGINT r_total,
        |        sum(CASE WHEN rel = 1 THEN
        |              CAST(round(cr * 1e6 / p + 1e-9) AS BIGINT)
        |            ELSE 0 END) ap_u
        |      FROM top GROUP BY lang),
        |ap AS (SELECT lang, r_total,
        |         round(ap_u::DOUBLE / (r_total * 1e6) + 1e-9, 6) AS ap
        |       FROM s WHERE r_total > 0)
        |SELECT lang, r_total, ap,
        |       round(avg(ap) OVER () + 1e-9, 4) AS map
        |FROM ap ORDER BY lang""") { c =>
      val cand = c.documents
        .select(col("lang"), col("doc_id"),
          (col("doc_id") % 4 >= 2).cast("int").as("rel"), col("n_chars"))
        .withColumn("p", row_number().over(
          Window.partitionBy("lang")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("p") <= 10)
      val top = cand.withColumn("cr",
        sum(col("rel")).over(Window.partitionBy("lang").orderBy("p")))
      val s = top.groupBy("lang")
        .agg(sum(col("rel")).as("r_total"),
          sum(when(col("rel") === 1,
            round(col("cr") * lit(1e6) / col("p") + lit(1e-9))
              .cast("long")).otherwise(0L)).as("ap_u"))
      val ap = s.filter(col("r_total") > 0)
        .select(col("lang"), col("r_total"),
          r6(col("ap_u").cast("double") / (col("r_total") * lit(1e6)))
            .as("ap"))
      ap.withColumn("map", r4(avg(col("ap")).over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))))
        .orderBy("lang")
    },

    // Distributed ECDF score calibration — normalize a raw score column
    // to its within-group empirical CDF (the calibration pass a quality
    // classifier's scores get before thresholding, per CCNet/FineWeb
    // practice). Deliberately NOT a `Window.partitionBy(event_type)`
    // rank: one event type = one window partition = one task at corpus
    // scale (the same trap the r5 verdict flagged in rocAuc). Instead
    // the global row number comes from Positional's two-phase
    // literal-boundary bucket + broadcast-offset formulation over sort
    // key (event_type, value, event_id); the per-type start offset and
    // count are a 5-row broadcast join. ECDF = (rank-1)/(n-1) under
    // row_number semantics (total order, event_id tiebreak), decile is
    // exact integer arithmetic — both engine-stable by construction.
    q("calib_ecdf",
      """WITH r AS (
        |  SELECT event_id, event_type,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_id, event_type,
        |       round(CAST(rk - 1 AS DOUBLE) / (n - 1) + 1e-9, 6) AS ecdf,
        |       (rk - 1) * 10 // n + 1 AS decile
        |FROM r ORDER BY event_id""", bench = true) { c =>
      val ev = c.events.select(col("event_id"), col("event_type"),
        col("value"))
      val rn = Positional.withRowNumber(ev,
        Seq(col("event_type"), col("value"), col("event_id")), "grn")
      val stats = rn.groupBy("event_type")
        .agg(min(col("grn")).as("st"), count(lit(1)).as("n"))
      rn.join(broadcast(stats), Seq("event_type"))
        .withColumn("rk", col("grn") - col("st") + 1)
        .select(col("event_id"), col("event_type"),
          r6((col("rk") - 1).cast("double") / (col("n") - 1)).as("ecdf"),
          expr("(rk - 1) * 10 div n + 1").as("decile"))
        .orderBy("event_id")
    },

    // Blocked fuzzy record linkage (entity resolution) — match a dirty
    // feed of mutated part names back to the master part table. Variants
    // are planted deterministically (identity / last-char drop /
    // first-char doubling / appended char, all edit distance ≤ 1), then
    // linkage runs the standard scale shape: MULTI-PASS BLOCKING (two
    // equi-join passes on left(name,3) and right(name,3) — an edit that
    // destroys one blocking key survives the other), candidate dedup,
    // exact Levenshtein verification (≤ 2) on candidates only, and a
    // per-record best-match window (min distance, then min master key).
    // Never an all-pairs comparison: cost is bounded by block sizes,
    // and the verify window partitions on rec_id. Levenshtein is
    // integer-exact on both engines, so the result is hash-stable.
    q("dedup_fuzzy_link",
      """WITH dirty AS (
        |  SELECT p_partkey AS rec_id,
        |         CASE p_partkey % 4
        |           WHEN 0 THEN p_name
        |           WHEN 1 THEN substring(p_name, 1, length(p_name) - 1)
        |           WHEN 2 THEN substring(p_name, 1, 1) || p_name
        |           ELSE p_name || 'x' END AS d_name
        |  FROM part),
        |master AS (SELECT p_partkey AS m_id, p_name AS m_name FROM part),
        |cand AS (
        |  SELECT DISTINCT rec_id, d_name, m_id, m_name FROM (
        |    SELECT d.rec_id, d.d_name, m.m_id, m.m_name
        |    FROM dirty d JOIN master m ON left(d.d_name, 3) = left(m.m_name, 3)
        |    UNION ALL
        |    SELECT d.rec_id, d.d_name, m.m_id, m.m_name
        |    FROM dirty d JOIN master m ON right(d.d_name, 3) = right(m.m_name, 3))),
        |v AS (SELECT rec_id, d_name, m_id, m_name,
        |             levenshtein(d_name, m_name) AS lev
        |      FROM cand WHERE levenshtein(d_name, m_name) <= 2),
        |best AS (SELECT *, row_number() OVER (PARTITION BY rec_id
        |                                      ORDER BY lev, m_id) AS rn
        |         FROM v)
        |SELECT rec_id, d_name, m_id, m_name, lev
        |FROM best WHERE rn = 1 ORDER BY rec_id""") { c =>
      val dirty = c.part.select(col("p_partkey").as("rec_id"),
        expr("""CASE p_partkey % 4
                  WHEN 0 THEN p_name
                  WHEN 1 THEN substring(p_name, 1, length(p_name) - 1)
                  WHEN 2 THEN concat(substring(p_name, 1, 1), p_name)
                  ELSE concat(p_name, 'x') END""").as("d_name"))
      // DICTIONARY-level comparison (the production ER shape): scoring
      // depends only on the NAME pair and the (score, m_id) tiebreak is
      // equivalent to ranking each master name by its min m_id, so the
      // quadratic-per-block compare runs over distinct names — corpus
      // row counts only touch the cheap map-back join. 50s → ~2s at
      // sf0.1, and at 100 TB the compare stays dictionary-sized.
      val dnames = dirty.select("d_name").distinct()
      val mdict = c.part.groupBy(col("p_name").as("m_name"))
        .agg(min(col("p_partkey")).as("m_id"))
      val cand = dnames.join(mdict,
          expr("left(d_name, 3) = left(m_name, 3)"))
        .unionByName(dnames.join(mdict,
          expr("right(d_name, 3) = right(m_name, 3)")))
        .select("d_name", "m_id", "m_name").distinct()
      val best = cand
        .withColumn("lev", levenshtein(col("d_name"), col("m_name")))
        .filter(col("lev") <= 2)
        .withColumn("rn", row_number().over(
          Window.partitionBy("d_name").orderBy(col("lev"), col("m_id"))))
        .filter(col("rn") === 1)
      dirty.join(broadcast(best), Seq("d_name"))
        .select("rec_id", "d_name", "m_id", "m_name", "lev")
        .orderBy("rec_id")
    },

    // Bloom-pre-filtered semi join (ops/Bloom.scala) — the runtime-filter
    // join pattern for the case where the build side is too big to
    // broadcast: its 16 KiB Bloom sketch broadcasts instead and drops
    // non-matching probe rows BEFORE the join exchange, so the shuffle
    // moves only matches + a bounded false-positive residue. The exact
    // semi join still runs after the pre-filter, so the result (and the
    // oracle) is the PLAIN semi join — the Bloom stage only cuts volume,
    // never changes rows. Build/probe hash with Spark's own xxhash64 so
    // both sides agree bit-for-bit by construction.
    q("join_bloom_semi",
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |         AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      val build = c.orders.filter(col("o_orderpriority") === "1-URGENT")
      Bloom.semiJoin(c.lineitem, col("l_orderkey"),
          build, col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    },

    // Heavy hitters over a skewed key (ops/HeavyHitters.scala) — exact
    // counts of keys with frequency > n/40, found WITHOUT a corpus-wide
    // groupBy(key) shuffle: a constant-state mergeable Misra–Gries
    // sketch pass yields ≤256 candidates, then only those keys are
    // exactly recounted (broadcast semi join). The key is synthesized
    // skewed (7 hot line-number keys over ~1/3 of lineitem, 2000 cold
    // part keys over the rest) so the threshold separates cleanly; the
    // oracle is the plain exact GROUP BY + HAVING, which the operator
    // must equal exactly — the sketch only locates candidates, it never
    // contributes counts.
    q("agg_heavy_hitters",
      """WITH keyed AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0
        |              THEN 'hot_' || l_linenumber::VARCHAR
        |              ELSE 'cold_' || l_partkey::VARCHAR END AS key
        |  FROM lineitem),
        |n AS (SELECT count(*) AS total FROM keyed)
        |SELECT key, count(*)::BIGINT AS cnt
        |FROM keyed, n
        |GROUP BY key, n.total
        |HAVING count(*) > n.total / 40.0
        |ORDER BY cnt DESC, key""", bench = true) { c =>
      val keyed = c.lineitem.select(
        expr("""CASE WHEN l_orderkey % 3 = 0
                THEN concat('hot_', cast(l_linenumber AS STRING))
                ELSE concat('cold_', cast(l_partkey AS STRING)) END""")
          .as("key"))
      HeavyHitters.heavyHitters(keyed, col("key"), k = 40)
    },

    // Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    // Language Models in Machine Translation" — the score Google built
    // BECAUSE Kneser-Ney doesn't distribute cheaply). The model is
    // trained on the even-doc_id half of the corpus and scores ALL
    // documents, so the backoff chain genuinely fires on unseen
    // trigrams/bigrams: S(w3|w1w2) = c123/c12, else 0.4·c23/c2, else
    // 0.4²·(c3+1)/(N+V) (add-one unigram floor so unseen words score
    // finitely). Like text_lm_ppl, the model IS a set of DataFrames
    // (distributed count aggregations, no driver state), scoring is
    // per-doc trigram counts LEFT-JOINed to the model tiers (plain
    // equi-joins AQE can broadcast or shuffle), and each NLL term is
    // quantized to integer micro-nats before the per-doc sum so the
    // result is order-independent and engine-identical.
    q("text_lm_backoff",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |mtok AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
        |mtg AS (SELECT unnest([{'w1': ts[i], 'w2': ts[i+1], 'w3': ts[i+2]}
        |                       for i in generate_series(1, len(ts) - 2)],
        |                      recursive := true)
        |        FROM mtok WHERE len(ts) >= 3),
        |mtri AS (SELECT w1, w2, w3, count(*) c123 FROM mtg GROUP BY 1, 2, 3),
        |mbg AS (SELECT unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                       for i in generate_series(1, len(ts) - 1)],
        |                      recursive := true)
        |        FROM mtok WHERE len(ts) >= 2),
        |mbi AS (SELECT w1, w2, count(*) cb FROM mbg GROUP BY 1, 2),
        |muni AS (SELECT w, count(*) cu
        |         FROM (SELECT unnest(ts) w FROM mtok) GROUP BY 1),
        |sc0 AS (SELECT sum(cu)::BIGINT AS nn, count(*)::BIGINT AS v
        |        FROM muni),
        |dtg AS (SELECT doc_id,
        |               unnest([{'w1': ts[i], 'w2': ts[i+1], 'w3': ts[i+2]}
        |                       for i in generate_series(1, len(ts) - 2)],
        |                      recursive := true)
        |        FROM tok WHERE len(ts) >= 3),
        |dtri AS (SELECT doc_id, w1, w2, w3, count(*) cnt
        |         FROM dtg GROUP BY 1, 2, 3, 4),
        |j AS (SELECT d.doc_id, d.cnt,
        |             CASE WHEN t.c123 IS NOT NULL THEN t.c123 / b12.cb
        |                  WHEN b23.cb IS NOT NULL
        |                    THEN 0.4 * b23.cb / u2.cu
        |                  ELSE 0.16 * (coalesce(u3.cu, 0) + 1)
        |                       / (sc0.nn + sc0.v) END AS s
        |      FROM dtri d
        |      LEFT JOIN mtri t ON d.w1 = t.w1 AND d.w2 = t.w2
        |                       AND d.w3 = t.w3
        |      LEFT JOIN mbi b12 ON d.w1 = b12.w1 AND d.w2 = b12.w2
        |      LEFT JOIN mbi b23 ON d.w2 = b23.w1 AND d.w3 = b23.w2
        |      LEFT JOIN muni u2 ON d.w2 = u2.w
        |      LEFT JOIN muni u3 ON d.w3 = u3.w
        |      CROSS JOIN sc0),
        |agg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_tri,
        |               sum(CAST(round(cnt * -ln(s) * 1e6 + 1e-9)
        |                        AS BIGINT)) AS snll_u
        |        FROM j GROUP BY 1)
        |SELECT doc_id, n_tri,
        |       round(exp(snll_u / 1e6 / n_tri) + 1e-9, 4) AS bs_ppl
        |FROM agg ORDER BY doc_id""", bench = true) { c =>
      // NOTE (r15): an attempted single-pass restructure (one
      // posexplode + window `lead`s feeding all four model tiers from
      // a persisted flat token relation) measured SLOWER cold (2.04 s
      // vs 1.68 s at sf0.1) and is structurally worse at scale: it
      // trades four shuffle-free, pushdown-friendly scans for one
      // corpus-wide window shuffle plus a corpus-sized token cache.
      // The per-tier gram builder below is a per-row codegen-adjacent
      // struct transform (no string concat), not the pathological
      // wordShingles case — kept as is.
      val tok = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val mtok = tok.filter(col("doc_id") % 2 === 0)
      def grams(df: org.apache.spark.sql.DataFrame, n: Int) =
        df.filter(size(col("ts")) >= n)
          .select(col("doc_id"), explode(expr(
            s"transform(sequence(0, size(ts) - $n), i -> struct(" +
              (0 until n).map(j => s"ts[i + $j] AS w${j + 1}")
                .mkString(", ") + "))")).as("g"))
          .select(col("doc_id") +: (1 to n).map(j => col(s"g.w$j")): _*)
      val mtri = grams(mtok, 3).groupBy("w1", "w2", "w3")
        .agg(count(lit(1)).as("c123"))
      val mbi = grams(mtok, 2).groupBy("w1", "w2")
        .agg(count(lit(1)).as("cb"))
      val muni = mtok.select(explode(col("ts")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu"))
      val sc0 = muni.agg(sum(col("cu")).as("nn"),
        count(lit(1)).as("v"))
      val dtri = grams(tok, 3).groupBy("doc_id", "w1", "w2", "w3")
        .agg(count(lit(1)).as("cnt"))
      val j = dtri
        .join(mtri, Seq("w1", "w2", "w3"), "left")
        .join(mbi.select(col("w1"), col("w2"), col("cb").as("c12")),
          Seq("w1", "w2"), "left")
        .join(mbi.select(col("w1").as("w2"), col("w2").as("w3"),
          col("cb").as("c23")), Seq("w2", "w3"), "left")
        .join(muni.select(col("w").as("w2"), col("cu").as("cu2")),
          Seq("w2"), "left")
        .join(muni.select(col("w").as("w3"), col("cu").as("cu3")),
          Seq("w3"), "left")
        .crossJoin(broadcast(sc0))
        .withColumn("s",
          when(col("c123").isNotNull,
            col("c123").cast("double") / col("c12"))
          .when(col("c23").isNotNull,
            lit(0.4) * col("c23") / col("cu2"))
          .otherwise(lit(0.16) * (coalesce(col("cu3"), lit(0L)) + 1) /
            (col("nn") + col("v"))))
      j.groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_tri"),
          sum(round(col("cnt").cast("double") * -log(col("s")) *
            lit(1e6) + lit(1e-9)).cast("long")).as("snll_u"))
        .select(col("doc_id"), col("n_tri"),
          r4(exp(col("snll_u") / lit(1e6) / col("n_tri"))).as("bs_ppl"))
        .orderBy("doc_id")
    },

    // k-core decomposition (ops/KCore.scala) — 3 pinned peel rounds of
    // the 3-core over the high-quantity co-purchase graph (same edge
    // construction as graph_triangles). Each round is one degree
    // aggregation + two anti joins; the oracle unrolls the rounds as
    // chained CTEs (the PageRank/logreg pattern). Output: surviving
    // nodes with within-core degrees.
    q("graph_kcore",
      """WITH e0 AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) u,
        |                   greatest(a.l_partkey, b.l_partkey) v
        |            FROM lineitem a JOIN lineitem b
        |              ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_partkey < b.l_partkey
        |              AND a.l_quantity > 40 AND b.l_quantity > 40),
        |d1 AS (SELECT node, count(*) deg
        |       FROM (SELECT unnest([u, v]) node FROM e0) GROUP BY 1),
        |w1 AS (SELECT node FROM d1 WHERE deg < 3),
        |e1 AS (SELECT u, v FROM e0
        |       WHERE u NOT IN (SELECT node FROM w1)
        |         AND v NOT IN (SELECT node FROM w1)),
        |d2 AS (SELECT node, count(*) deg
        |       FROM (SELECT unnest([u, v]) node FROM e1) GROUP BY 1),
        |w2 AS (SELECT node FROM d2 WHERE deg < 3),
        |e2 AS (SELECT u, v FROM e1
        |       WHERE u NOT IN (SELECT node FROM w2)
        |         AND v NOT IN (SELECT node FROM w2)),
        |d3 AS (SELECT node, count(*) deg
        |       FROM (SELECT unnest([u, v]) node FROM e2) GROUP BY 1),
        |w3 AS (SELECT node FROM d3 WHERE deg < 3),
        |e3 AS (SELECT u, v FROM e2
        |       WHERE u NOT IN (SELECT node FROM w3)
        |         AND v NOT IN (SELECT node FROM w3))
        |SELECT node, count(*)::BIGINT AS deg
        |FROM (SELECT unnest([u, v]) node FROM e3)
        |GROUP BY node ORDER BY node""", bench = true) { c =>
      val hi = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = hi.as("a")
        .join(hi.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      val core = graft.ops.KCore.peelRounds(edges, "src", "dst",
        k = 3, rounds = 3)
      core.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .orderBy("node")
    },

    // Distributed decision-stump fit (ml/Stump.scala) — EXACT depth-1
    // CART split search over (l_quantity, l_discount) predicting
    // l_returnflag='R', done entirely as histogram aggregations + a
    // model-sized window scan (the SparkML/XGBoost-hist shape; the
    // training frame is never collected, unlike the black-box
    // Estimator fit-buffer path). The oracle recomputes the full
    // candidate-split relation with windowed running totals and picks
    // the same (score DESC, feature, threshold) argmax; the score is
    // micro-unit-quantized from integer class counts so the argmax is
    // engine-stable.
    q("ml_stump_fit",
      """WITH lab AS (SELECT l_quantity, l_discount,
        |                    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |             FROM lineitem),
        |u AS (
        |  SELECT 'l_quantity' AS feature, l_quantity::DOUBLE AS v,
        |         count(*) cnt, sum(y) pos
        |  FROM lab GROUP BY 2
        |  UNION ALL
        |  SELECT 'l_discount', l_discount::DOUBLE, count(*), sum(y)
        |  FROM lab GROUP BY 2),
        |c AS (SELECT feature, v,
        |             sum(cnt) OVER (PARTITION BY feature ORDER BY v) nl,
        |             sum(pos) OVER (PARTITION BY feature ORDER BY v) pl,
        |             sum(cnt) OVER (PARTITION BY feature) n,
        |             sum(pos) OVER (PARTITION BY feature) p
        |      FROM u),
        |s AS (SELECT feature, v, nl, pl, n, n - nl AS nr, p - pl AS pr
        |      FROM c WHERE nl < n),
        |g AS (SELECT feature, v, nl, pl, nr, pr, n,
        |             CAST(round(((pl::DOUBLE * pl::DOUBLE
        |                          + (nl - pl)::DOUBLE * (nl - pl)::DOUBLE) / nl
        |                       + (pr::DOUBLE * pr::DOUBLE
        |                          + (nr - pr)::DOUBLE * (nr - pr)::DOUBLE) / nr)
        |                        * 1e6 / n + 1e-9) AS BIGINT) score_u
        |      FROM s),
        |best AS (SELECT *, row_number() OVER (ORDER BY score_u DESC,
        |                                      feature, v) rn
        |         FROM g)
        |SELECT feature, v AS threshold, nl::BIGINT AS n_left,
        |       pl::BIGINT AS pos_left, nr::BIGINT AS n_right,
        |       pr::BIGINT AS pos_right, score_u
        |FROM best WHERE rn = 1""") { c =>
      val m = graft.ml.Stump.fit(c.lineitem,
        Seq("l_quantity", "l_discount"),
        (col("l_returnflag") === "R").cast("int"))
      val s = c.spark
      import s.implicits._
      Seq((m.feature, m.threshold, m.nLeft, m.posLeft, m.nRight,
        m.posRight, m.scoreU)).toDF("feature", "threshold", "n_left",
        "pos_left", "n_right", "pos_right", "score_u")
    },

    // Jaro-Winkler fuzzy linkage (functions/JaroWinkler.scala) — the
    // dedup_fuzzy_link scenario re-scored with the native codegen
    // graft_jaro_winkler expression instead of Levenshtein, checked
    // against DuckDB's jaro_winkler_similarity (same canonical
    // definition, incl. the both-empty→0 convention). Similarities are
    // ROUNDED to 6dp BEFORE the >=0.9 threshold and the best-match
    // ranking so a last-ulp divergence can never flip membership or
    // order; ties break on m_id. Same multi-pass blocking scale shape
    // as dedup_fuzzy_link — JW runs on candidates only.
    q("dedup_fuzzy_jw",
      """WITH dirty AS (
        |  SELECT p_partkey AS rec_id,
        |         CASE p_partkey % 4
        |           WHEN 0 THEN p_name
        |           WHEN 1 THEN substring(p_name, 1, length(p_name) - 1)
        |           WHEN 2 THEN substring(p_name, 1, 1) || p_name
        |           ELSE p_name || 'x' END AS d_name
        |  FROM part),
        |master AS (SELECT p_partkey AS m_id, p_name AS m_name FROM part),
        |cand AS (
        |  SELECT DISTINCT rec_id, d_name, m_id, m_name FROM (
        |    SELECT d.rec_id, d.d_name, m.m_id, m.m_name
        |    FROM dirty d JOIN master m ON left(d.d_name, 3) = left(m.m_name, 3)
        |    UNION ALL
        |    SELECT d.rec_id, d.d_name, m.m_id, m.m_name
        |    FROM dirty d JOIN master m ON right(d.d_name, 3) = right(m.m_name, 3))),
        |v AS (SELECT rec_id, d_name, m_id, m_name,
        |             round(jaro_winkler_similarity(d_name, m_name) + 1e-9, 6)
        |               AS jw
        |      FROM cand),
        |best AS (SELECT *, row_number() OVER (PARTITION BY rec_id
        |                                      ORDER BY jw DESC, m_id) AS rn
        |         FROM v WHERE jw >= 0.9)
        |SELECT rec_id, d_name, m_id, m_name, jw
        |FROM best WHERE rn = 1 ORDER BY rec_id""", bench = true) { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val dirty = c.part.select(col("p_partkey").as("rec_id"),
        expr("""CASE p_partkey % 4
                  WHEN 0 THEN p_name
                  WHEN 1 THEN substring(p_name, 1, length(p_name) - 1)
                  WHEN 2 THEN concat(substring(p_name, 1, 1), p_name)
                  ELSE concat(p_name, 'x') END""").as("d_name"))
      // dictionary-level compare + map-back, as in dedup_fuzzy_link:
      // JW runs on distinct name pairs only
      val dnames = dirty.select("d_name").distinct()
      val mdict = c.part.groupBy(col("p_name").as("m_name"))
        .agg(min(col("p_partkey")).as("m_id"))
      val cand = dnames.join(mdict,
          expr("left(d_name, 3) = left(m_name, 3)"))
        .unionByName(dnames.join(mdict,
          expr("right(d_name, 3) = right(m_name, 3)")))
        .select("d_name", "m_id", "m_name").distinct()
      val best = cand.withColumn("jw",
          r6(expr("graft_jaro_winkler(d_name, m_name)")))
        .filter(col("jw") >= 0.9)
        .withColumn("rn", row_number().over(
          Window.partitionBy("d_name")
            .orderBy(col("jw").desc, col("m_id"))))
        .filter(col("rn") === 1)
      dirty.join(broadcast(best), Seq("d_name"))
        .select("rec_id", "d_name", "m_id", "m_name", "jw")
        .orderBy("rec_id")
    },

    // Global paragraph-level dedup with KEEP-FIRST semantics — the
    // C4/RefinedWeb removal pass (as opposed to text_dup_spans, which
    // only MEASURES duplication): documents are segmented into 4-token
    // blocks ("paragraphs" at this corpus's scale), every block that
    // already appeared earlier in the corpus (by doc_id, then position)
    // is dropped, and the surviving blocks are reassembled in order.
    // Scale shape: one explode, ONE window partitioned by the block
    // CONTENT key (hash-distributed by content, never a global sort),
    // and a per-doc sort_array(collect_list) rebuild. First-occurrence
    // order is total (doc_id, par_idx), so the result is deterministic
    // and engine-identical.
    q("dedup_paragraph_first",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |par AS (SELECT doc_id, i // 4 AS par_idx,
        |               array_to_string(list_slice(ts, i + 1,
        |                 least(i + 4, len(ts))), ' ') AS par_text
        |        FROM (SELECT doc_id, ts,
        |                     unnest([x * 4 for x in
        |                       generate_series(0, (len(ts) - 1) // 4)]) i
        |              FROM tok WHERE len(ts) > 0)),
        |rk AS (SELECT doc_id, par_idx, par_text,
        |              row_number() OVER (PARTITION BY par_text
        |                                 ORDER BY doc_id, par_idx) rn
        |       FROM par),
        |keep AS (SELECT * FROM rk WHERE rn = 1)
        |SELECT p.doc_id,
        |       (SELECT count(*) FROM par q
        |        WHERE q.doc_id = p.doc_id)::BIGINT AS n_pars,
        |       count(*)::BIGINT AS n_kept,
        |       string_agg(p.par_text, ' ' ORDER BY p.par_idx)
        |         AS cleaned_text
        |FROM keep p GROUP BY p.doc_id ORDER BY p.doc_id""") { c =>
      val tok = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
        .filter(size(col("ts")) > 0)
      val par = tok.select(col("doc_id"),
          explode(expr("transform(sequence(0, (size(ts) - 1) div 4), " +
            "x -> struct(x AS par_idx, " +
            "array_join(slice(ts, x * 4 + 1, 4), ' ') AS par_text))"))
            .as("p"))
        .select(col("doc_id"), col("p.par_idx"), col("p.par_text"))
      val rk = par.withColumn("rn", row_number().over(
        Window.partitionBy("par_text").orderBy("doc_id", "par_idx")))
      val totals = par.groupBy("doc_id")
        .agg(count(lit(1)).as("n_pars"))
      rk.filter(col("rn") === 1)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(par_idx, par_text)))," +
              " s -> s.par_text)"), " ").as("cleaned_text"))
        .join(totals, Seq("doc_id"))
        .select(col("doc_id"), col("n_pars"), col("n_kept"),
          col("cleaned_text"))
        .orderBy("doc_id")
    },

    // CORPUS-level bigram conditional entropy rate H(w₂|w₁) — the
    // information-density signal at the LANGUAGE-MODEL level (Shannon
    // 1951's next-token uncertainty; text_entropy's per-doc unigram
    // H cannot see it): a templated corpus has near-zero conditional
    // entropy long before its unigram entropy drops, which is exactly
    // the repetition a pretraining mix curator prices. Both rates
    // derive from ONE bigram count table: H(w₂|w₁) =
    // −Σ c_xy·log₂(c_xy/c_x·)/N and the unigram marginal entropy from
    // c_x· — each per-TYPE term micro-unit-quantized before the sum
    // (the text_entropy device: order-independent, engine-identical),
    // every aggregate a plain hash aggregation.
    q("text_entropy_rate",
      """WITH tok AS (SELECT regexp_extract_all(lower(text), '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT unnest([ts[i] || ' ' || ts[i+1]
        |                      for i in generate_series(1, len(ts)-1)]) b
        |       FROM tok WHERE len(ts) >= 2),
        |cxy AS (SELECT b, count(*)::BIGINT c FROM bg GROUP BY 1),
        |cx AS (SELECT split_part(b, ' ', 1) w1, sum(c)::BIGINT cx
        |       FROM cxy GROUP BY 1),
        |t AS (SELECT cxy.c, cx.cx FROM cxy
        |      JOIN cx ON split_part(cxy.b, ' ', 1) = cx.w1),
        |agg AS (SELECT sum(c)::BIGINT n, count(*)::BIGINT n_types,
        |          sum(CAST(round(c * log2(c * 1.0 / cx) * 1e6 + 1e-9)
        |                   AS BIGINT)) su
        |        FROM t),
        |u AS (SELECT sum(cx)::BIGINT n1,
        |        sum(CAST(round(cx * log2(cx) * 1e6 + 1e-9)
        |                 AS BIGINT)) su1
        |      FROM cx)
        |SELECT agg.n AS n_bigrams, agg.n_types,
        |  round(-agg.su / 1e6 / agg.n + 1e-9, 6) AS cond_entropy_bits,
        |  round(log2(u.n1) - u.su1 / 1e6 / u.n1 + 1e-9, 6)
        |    AS unigram_entropy_bits
        |FROM agg, u""") { c =>
      val tok = c.documents
        .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
          .as("ts"))
        .filter(size(col("ts")) >= 2)
      val bg = tok.select(explode(expr(
        "transform(sequence(1, size(ts) - 1)," +
          " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
        .as("b"))
      val cxy = bg.groupBy("b").agg(count(lit(1)).as("c"))
      val cx = cxy.groupBy(expr("split_part(b, ' ', 1)").as("w1"))
        .agg(sum(col("c")).as("cx"))
      val t = cxy.join(cx, expr("split_part(b, ' ', 1)") === col("w1"))
      val agg = t.agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_types"),
        sum(round(col("c").cast("double") *
          log2(col("c") * lit(1.0) / col("cx")) * lit(1e6) + lit(1e-9))
          .cast("long")).as("su"))
      val u = cx.agg(sum(col("cx")).as("n1"),
        sum(round(col("cx").cast("double") * log2(col("cx")) * lit(1e6) +
          lit(1e-9)).cast("long")).as("su1"))
      agg.crossJoin(broadcast(u))
        .select(col("n").as("n_bigrams"), col("n_types"),
          r6(-col("su") / 1e6 / col("n")).as("cond_entropy_bits"),
          r6(log2(col("n1")) - col("su1") / 1e6 / col("n1"))
            .as("unigram_entropy_bits"))
    },

    // Shannon-entropy quality signals — the information-density filter
    // family (Gopher/CCNet gate on compression ratio; character/word
    // entropy is its deterministic, engine-portable form: low char
    // entropy = repeated-character junk, low word entropy = boilerplate
    // repetition). H = log2(n) − (Σ c·log2 c)/n from integer counts;
    // the Σ c·log2 c terms are micro-unit-quantized so per-doc sums are
    // order-independent and engine-identical. Shape: two explode +
    // two-phase hash aggregations — linear corpus scans, no windows.
    q("text_entropy",
      """WITH ch AS (SELECT doc_id, c, count(*) cnt
        |            FROM (SELECT doc_id, unnest(string_split(text, '')) c
        |                  FROM documents)
        |            WHERE c <> '' GROUP BY 1, 2),
        |cagg AS (SELECT doc_id, sum(cnt)::BIGINT n,
        |                sum(CAST(round(cnt * log2(cnt) * 1e6 + 1e-9)
        |                         AS BIGINT)) su
        |         FROM ch GROUP BY 1),
        |wd AS (SELECT doc_id, w, count(*) cnt
        |       FROM (SELECT doc_id, unnest(regexp_extract_all(text,
        |                    '[a-z]+')) w FROM documents)
        |       GROUP BY 1, 2),
        |wagg AS (SELECT doc_id, sum(cnt)::BIGINT n,
        |                sum(CAST(round(cnt * log2(cnt) * 1e6 + 1e-9)
        |                         AS BIGINT)) su
        |        FROM wd GROUP BY 1)
        |SELECT c.doc_id, c.n AS n_chars_t,
        |       round(log2(c.n) - c.su / 1e6 / c.n + 1e-9, 6)
        |         AS char_entropy,
        |       w.n AS n_words,
        |       round(log2(w.n) - w.su / 1e6 / w.n + 1e-9, 6)
        |         AS word_entropy
        |FROM cagg c JOIN wagg w ON c.doc_id = w.doc_id
        |ORDER BY c.doc_id""") { c =>
      def entropyAgg(df: org.apache.spark.sql.DataFrame, unit: String) =
        df.groupBy("doc_id", unit)
          .agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(sum(col("cnt")).as("n"),
            sum(round(col("cnt").cast("double") * log2(col("cnt")) *
              lit(1e6) + lit(1e-9)).cast("long")).as("su"))
      val ch = entropyAgg(c.documents
        .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
        .filter(col("c") =!= ""), "c")
      val wd = entropyAgg(c.documents
        .select(col("doc_id"), explode(
          expr("regexp_extract_all(text, '[a-z]+', 0)")).as("w")), "w")
      ch.select(col("doc_id"), col("n").as("n_chars_t"),
          r6(log2(col("n")) - col("su") / lit(1e6) / col("n"))
            .as("char_entropy"))
        .join(wd.select(col("doc_id"), col("n").as("n_words"),
          r6(log2(col("n")) - col("su") / lit(1e6) / col("n"))
            .as("word_entropy")), Seq("doc_id"))
        .orderBy("doc_id")
    },

    // Simpson's diversity index per language (Simpson 1949 —
    // D = Σ nᵢ(nᵢ−1)/(N(N−1)), the probability two tokens drawn
    // without replacement coincide; 1−D and 1/D are the ecology-
    // standard diversity readouts a corpus-mix monitor tracks beside
    // text_entropy's Shannon view: Simpson weights DOMINANT types,
    // entropy the whole tail). Token-type counts from one grouped
    // aggregation; nᵢ(nᵢ−1) products carry through DECIMAL(38,0)/
    // HUGEINT (type counts are SF-linear, so the product is SF² —
    // the width-audit class); one division family at the end.
    q("text_simpson_diversity",
      """WITH w AS (SELECT lang, unnest(regexp_extract_all(text,
        |             '[a-z]+')) tok FROM documents),
        |tc AS (SELECT lang, tok, count(*)::BIGINT c FROM w
        |       GROUP BY 1, 2),
        |a AS (SELECT lang, sum(c)::BIGINT n, count(*)::BIGINT nt,
        |        sum(c::HUGEINT * (c - 1))::DOUBLE pp FROM tc
        |      GROUP BY 1)
        |SELECT lang, n AS n_tokens, nt AS n_types,
        |  round(pp / (n::DOUBLE * (n - 1)) + 1e-9, 6) AS simpson_d,
        |  round(1 - pp / (n::DOUBLE * (n - 1)) + 1e-9, 6) AS diversity,
        |  round(n::DOUBLE * (n - 1) / pp + 1e-9, 4) AS inv_simpson
        |FROM a ORDER BY lang""") { c =>
      val w = c.documents.select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("tok"))
      val tc = w.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val a = tc.groupBy("lang").agg(sum(col("c")).as("n"),
        count(lit(1)).as("types"),
        sum(col("c").cast("decimal(38,0)") * (col("c") - 1))
          .cast("double").as("pp"))
      val d = col("pp") / (col("n").cast("double") * (col("n") - 1))
      a.select(col("lang"), col("n").as("n_tokens"),
          col("types").as("n_types"),
          r6(d).as("simpson_d"), r6(lit(1) - d).as("diversity"),
          r4(col("n").cast("double") * (col("n") - 1) / col("pp"))
            .as("inv_simpson"))
        .orderBy("lang")
    },

    // Johnson-Lindenstrauss random projection (VectorSim.randomProjectJl,
    // Achlioptas 2003 sign variant): 64-dim embeddings down to k=16 with
    // a DETERMINISTIC md5-derived ±1 matrix — no RNG state, no broadcast
    // matrix, identical on any cluster size or engine, which is what
    // makes it oracle-able. Shuffle-free per-row map; the ANN/dedup
    // preprocessing that makes downstream distance work 4x cheaper.
    q("sim_jl_project",
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (SELECT vec_id, j,
        |        list_sum(list_transform(generate_series(1, len(embedding)),
        |          i -> embedding[i] *
        |            (CASE WHEN (('0x' || substr(md5(i::VARCHAR || '_' ||
        |                j::VARCHAR), 1, 4))::BIGINT % 2) = 0
        |             THEN 1.0 ELSE -1.0 END))) / sqrt(16) AS pv
        |      FROM e, unnest([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) t(j))
        |SELECT vec_id, j, round(pv + 1e-9, 6) AS pv
        |FROM p ORDER BY vec_id, j""") { c =>
      graft.ops.VectorSim.randomProjectJl(c.embeddings,
          col("vec_id"), col("embedding"), outDim = 16)
        .select(col("id").as("vec_id"), col("j"), r6(col("pv")).as("pv"))
        .orderBy("vec_id", "j")
    },

    // Per-node clustering coefficient — triangles/(deg·(deg−1)/2), the
    // local-density companion to graph_triangles (same degree-ordered
    // compact-forward enumeration, same co-purchase graph): one extra
    // degree aggregation + an integer-exact join; the coefficient is a
    // small rational rounded identically on both engines.
    q("graph_clustering_coeff",
      """WITH e AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) u,
        |                  greatest(a.l_partkey, b.l_partkey) v
        |           FROM lineitem a JOIN lineitem b
        |             ON a.l_orderkey = b.l_orderkey
        |           WHERE a.l_partkey < b.l_partkey
        |             AND a.l_quantity > 40 AND b.l_quantity > 40),
        |t AS (SELECT e1.u a, e1.v b, e2.v c
        |      FROM e e1 JOIN e e2 ON e1.v = e2.u
        |      JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v),
        |tn AS (SELECT node, count(*) tri_n
        |       FROM (SELECT unnest([a, b, c]) node FROM t) GROUP BY 1),
        |d AS (SELECT node, count(*) deg
        |      FROM (SELECT unnest([u, v]) node FROM e) GROUP BY 1)
        |SELECT d.node, d.deg::BIGINT AS deg,
        |       coalesce(tn.tri_n, 0)::BIGINT AS tri_n,
        |       round(coalesce(tn.tri_n, 0) * 2.0
        |             / (d.deg * (d.deg - 1)) + 1e-9, 6) AS coeff
        |FROM d LEFT JOIN tn ON d.node = tn.node
        |WHERE d.deg >= 2 ORDER BY d.node""") { c =>
      val hi = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = hi.as("a")
        .join(hi.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      val tri = graft.ops.Triangles.perNodeCounts(edges, "src", "dst")
      val canon = edges.select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val deg = canon.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      deg.join(tri, Seq("node"), "left")
        .filter(col("deg") >= 2)
        .select(col("node"), col("deg"),
          coalesce(col("tri_n"), lit(0L)).as("tri_n"),
          r6(coalesce(col("tri_n"), lit(0L)) * lit(2.0) /
            (col("deg") * (col("deg") - 1))).as("coeff"))
        .orderBy("node")
    },

    // Grouped top-k via the bounded mergeable aggregate (ops/TopK.scala)
    // — map-side partials keep at most k candidates per (partition,
    // key), so the exchange moves O(k·keys·partitions) rows instead of
    // the corpus and no sort exceeds 2k elements. The ORACLE is the
    // textbook window formulation the aggregate replaces — same rows,
    // radically different plan at 100 TB.
    q("agg_topk_heap",
      """WITH r AS (SELECT l_returnflag AS key, l_extendedprice AS value,
        |                  l_orderkey::VARCHAR || '_' ||
        |                    l_linenumber::VARCHAR AS tiebreak,
        |                  row_number() OVER (PARTITION BY l_returnflag
        |                    ORDER BY l_extendedprice DESC,
        |                      l_orderkey::VARCHAR || '_' ||
        |                      l_linenumber::VARCHAR) AS rank
        |           FROM lineitem)
        |SELECT key, rank, round(value + 1e-9, 2) AS value, tiebreak
        |FROM r WHERE rank <= 7 ORDER BY key, rank""",
      bench = true) { c =>
      graft.ops.TopK.perKey(c.lineitem, col("l_returnflag"),
          col("l_extendedprice"),
          concat(col("l_orderkey"), lit("_"), col("l_linenumber")), k = 7)
        .select(col("key"), col("rank"), r2(col("value")).as("value"),
          col("tiebreak"))
        .orderBy("key", "rank")
    },

    // URL canonicalization + domain filtering — the C4/RefinedWeb URL
    // hygiene step: source URLs (planted deterministically from doc_id,
    // since the synthetic corpus carries none) are normalized (host
    // lowercased, www. stripped, tracking params dropped keeping only
    // the id param, fragment dropped), reduced to a registered domain,
    // and flagged against a domain blocklist; per-domain occupancy
    // comes out of one hash aggregation. Pure regexp per row — the
    // identical expressions run on both engines.
    q("text_url_canonical",
      """WITH d AS (SELECT doc_id,
        |    'https://www.Site' || (doc_id % 23)::VARCHAR ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '.example.com' ELSE '.test.org'
        |     END) || '/p/' || doc_id::VARCHAR ||
        |    '?utm_source=feed&id=' || (doc_id % 7)::VARCHAR ||
        |    '&utm_campaign=x#sec' || (doc_id % 3)::VARCHAR AS url
        |  FROM documents),
        |c AS (SELECT doc_id, url,
        |   regexp_replace(lower(regexp_extract(url,
        |     '^https?://([^/?#]+)', 1)), '^www\.', '') AS host,
        |   regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
        |   regexp_extract(url, '[?&](id=[0-9]+)', 1) AS keep_q
        |  FROM d),
        |n AS (SELECT doc_id,
        |   host || path || (CASE WHEN keep_q <> '' THEN '?' || keep_q
        |                    ELSE '' END) AS canonical,
        |   regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM c)
        |SELECT domain, count(*)::BIGINT AS n_urls,
        |       count(DISTINCT canonical)::BIGINT AS n_canonical,
        |       max(domain IN ('example.com')) AS blocklisted
        |FROM n GROUP BY domain ORDER BY domain""") { c =>
      val d = c.documents.select(col("doc_id"), concat(
        lit("https://www.Site"), (col("doc_id") % 23).cast("string"),
        when(col("doc_id") % 2 === 0, lit(".example.com"))
          .otherwise(lit(".test.org")),
        lit("/p/"), col("doc_id").cast("string"),
        lit("?utm_source=feed&id="), (col("doc_id") % 7).cast("string"),
        lit("&utm_campaign=x#sec"), (col("doc_id") % 3).cast("string"))
        .as("url"))
      val cd = d.select(col("doc_id"),
        regexp_replace(lower(regexp_extract(col("url"),
          "^https?://([^/?#]+)", 1)), "^www\\.", "").as("host"),
        regexp_extract(col("url"), "^https?://[^/?#]+([^?#]*)", 1)
          .as("path"),
        regexp_extract(col("url"), "[?&](id=[0-9]+)", 1).as("keep_q"))
      val n = cd.select(col("doc_id"),
        concat(col("host"), col("path"),
          when(col("keep_q") =!= "", concat(lit("?"), col("keep_q")))
            .otherwise(lit(""))).as("canonical"),
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1).as("domain"))
      n.groupBy("domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canonical")).as("n_canonical"),
          max(col("domain").isin("example.com")).as("blocklisted"))
        .orderBy("domain")
    },

    // Full entity-resolution pipeline: block → match → CLUSTER — the
    // step after dedup_fuzzy_link: matched name pairs become edges and
    // transitive closure (ops/Components star-contraction) assigns every
    // record an entity id. The clustering runs on the NAME DICTIONARY
    // graph (each distinct name keyed by its min record id — tiny),
    // records inherit their name's entity via one broadcast map-back;
    // the corpus never enters the iterative part.
    q("er_entities",
      """WITH RECURSIVE nd AS (SELECT p_name, min(p_partkey) nid
        |                      FROM part GROUP BY 1),
        |np AS (SELECT a.nid an, b.nid bn
        |       FROM nd a JOIN nd b ON a.nid < b.nid
        |       WHERE (left(a.p_name, 3) = left(b.p_name, 3)
        |              OR right(a.p_name, 3) = right(b.p_name, 3))
        |         AND levenshtein(a.p_name, b.p_name) <= 2),
        |e AS (SELECT an a, bn b FROM np UNION ALL SELECT bn, an FROM np),
        |walk(id, comp) AS (
        |  SELECT nid, nid FROM nd
        |  UNION
        |  SELECT e.b, w.comp FROM walk w JOIN e ON e.a = w.id),
        |lab AS (SELECT id, min(comp) entity FROM walk GROUP BY 1)
        |SELECT p.p_partkey, nd.nid AS name_id, lab.entity AS entity_id
        |FROM part p JOIN nd ON p.p_name = nd.p_name
        |JOIN lab ON nd.nid = lab.id
        |ORDER BY p.p_partkey""") { c =>
      val nd = c.part.groupBy("p_name")
        .agg(min(col("p_partkey")).as("nid"))
      val a = nd.select(col("p_name").as("na"), col("nid").as("an"))
      val b = nd.select(col("p_name").as("nb"), col("nid").as("bn"))
      val np = a.join(b, col("an") < col("bn") &&
          (expr("left(na, 3) = left(nb, 3)") ||
            expr("right(na, 3) = right(nb, 3)")) &&
          levenshtein(col("na"), col("nb")) <= 2)
        .select(col("an"), col("bn"))
      val labels = graft.ops.Components.connectedComponents(np, "an", "bn")
      c.part.select(col("p_partkey"), col("p_name"))
        .join(broadcast(nd), Seq("p_name"))
        .join(broadcast(labels), col("nid") === col("id"), "left")
        .select(col("p_partkey"), col("nid").as("name_id"),
          coalesce(col("component"), col("nid")).as("entity_id"))
        .orderBy("p_partkey")
    },

    // First/last-touch attribution — each purchase credits the earliest
    // and latest view by the same user inside the preceding 24 h. The
    // view↔purchase pairing is a user-keyed equi-join with a time-range
    // predicate (the asof/interval family shape — user key partitions
    // the work; never a cross join); credits aggregate per purchase in
    // exact integer epoch seconds.
    q("win_attribution",
      """WITH p AS (SELECT event_id pid, user_id,
        |             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) pts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id,
        |             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) vts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.pid, p.user_id, count(*)::BIGINT AS n_touches,
        |       min(v.vts)::BIGINT AS first_touch,
        |       max(v.vts)::BIGINT AS last_touch
        |FROM p JOIN v ON p.user_id = v.user_id
        |              AND v.vts <= p.pts AND v.vts >= p.pts - 86400
        |GROUP BY 1, 2 ORDER BY p.pid""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          expr("unix_timestamp(ts)").as("pts"))
      val v = c.events.filter(col("event_type") === "view")
        .select(col("user_id"), expr("unix_timestamp(ts)").as("vts"))
      p.join(v, Seq("user_id"))
        .filter(col("vts") <= col("pts") &&
          col("vts") >= col("pts") - 86400)
        .groupBy("pid", "user_id")
        .agg(count(lit(1)).as("n_touches"),
          min(col("vts")).as("first_touch"),
          max(col("vts")).as("last_touch"))
        .orderBy("pid")
    },

    // URL-level dedup keeping the BEST page per canonical URL
    // (RefinedWeb's URL dedup: crawls re-fetch the same page; keep the
    // longest capture, tie-break lowest doc id). Canonical keys are the
    // text_url_canonical normalization with a colliding path space
    // (doc_id % 40) so the dedup genuinely fires; winner selection is a
    // canonical-key-partitioned first-row window (hash-distributed by
    // key, the dedup_paragraph_first shape).
    q("llm_dedup_url",
      """WITH d AS (SELECT doc_id, n_chars,
        |    lower('Site' || (doc_id % 5)::VARCHAR ||
        |      (CASE WHEN doc_id % 2 = 0 THEN '.example.com'
        |       ELSE '.test.org' END)) || '/p/' || (doc_id % 40)::VARCHAR
        |      AS canonical
        |  FROM documents),
        |r AS (SELECT doc_id, n_chars, canonical,
        |             row_number() OVER (PARTITION BY canonical
        |               ORDER BY n_chars DESC, doc_id) rn,
        |             count(*) OVER (PARTITION BY canonical) dups
        |      FROM d)
        |SELECT canonical, doc_id AS kept_doc, n_chars,
        |       dups::BIGINT AS n_captures
        |FROM r WHERE rn = 1 ORDER BY canonical""") { c =>
      val d = c.documents.select(col("doc_id"), col("n_chars"),
        concat(lower(concat(lit("Site"),
            (col("doc_id") % 5).cast("string"),
            when(col("doc_id") % 2 === 0, lit(".example.com"))
              .otherwise(lit(".test.org")))),
          lit("/p/"), (col("doc_id") % 40).cast("string")).as("canonical"))
      d.withColumn("rn", row_number().over(
          Window.partitionBy("canonical")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("n_captures", count(lit(1)).over(
          Window.partitionBy("canonical")))
        .filter(col("rn") === 1)
        .select(col("canonical"), col("doc_id").as("kept_doc"),
          col("n_chars"), col("n_captures"))
        .orderBy("canonical")
    },

    // RFM segmentation (recency / frequency / monetary quintile scores)
    // — the classic customer-analytics rollup: per-user purchase
    // recency/frequency/monetary in one aggregation, quintile CUTPOINTS
    // from one multi-percentile pass baked in as micro-rounded broadcast
    // literals (no user-dimension-sized ranking window), per-user
    // scores as bucket arithmetic, segment occupancy as the output.
    q("events_rfm",
      """WITH u AS (SELECT user_id,
        |             max(CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
        |                 AS BIGINT)) AS last_ts,
        |             count(*) freq,
        |             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) mon
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |cut AS (SELECT
        |  list_transform(quantile_cont(last_ts * 1.0, [0.2,0.4,0.6,0.8]),
        |                 c -> round(c * 1e2 + 1e-9)) rc,
        |  list_transform(quantile_cont(freq * 1.0, [0.2,0.4,0.6,0.8]),
        |                 c -> round(c * 1e2 + 1e-9)) fc,
        |  list_transform(quantile_cont(mon, [0.2,0.4,0.6,0.8]),
        |                 c -> round(c * 1e2 + 1e-9)) mc
        |  FROM u),
        |s AS (SELECT
        |  1 + len(list_filter(cut.rc, c -> round(u.last_ts * 1e2 + 1e-9) > c))
        |    AS r_score,
        |  1 + len(list_filter(cut.fc, c -> round(u.freq * 1e2 + 1e-9) > c))
        |    AS f_score,
        |  1 + len(list_filter(cut.mc, c -> round(u.mon * 1e2 + 1e-9) > c))
        |    AS m_score
        |  FROM u CROSS JOIN cut)
        |SELECT r_score, f_score, m_score, count(*)::BIGINT AS n_users
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""") { c =>
      val u = c.events.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(max(expr("unix_timestamp(ts)")).as("last_ts"),
          count(lit(1)).as("freq"),
          dsum(col("value")).as("mon"))
      def cuts(cc: org.apache.spark.sql.Column) =
        transform(percentile(cc, typedlit(Seq(0.2, 0.4, 0.6, 0.8))),
          x => round(x * lit(1e2) + lit(1e-9)))
      val cut = u.agg(cuts(col("last_ts") * lit(1.0)).as("rc"),
        cuts(col("freq") * lit(1.0)).as("fc"),
        cuts(col("mon")).as("mc"))
      def score(v: org.apache.spark.sql.Column,
                cs: org.apache.spark.sql.Column) =
        lit(1) + size(filter(cs,
          cc => round(v * lit(1e2) + lit(1e-9)) > cc))
      u.crossJoin(broadcast(cut))
        .select(score(col("last_ts") * lit(1.0), col("rc")).as("r_score"),
          score(col("freq") * lit(1.0), col("fc")).as("f_score"),
          score(col("mon"), col("mc")).as("m_score"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    },

    // Count-Min sketch (Cormode & Muthukrishnan 2005) — the
    // fixed-memory frequency summary beside the Misra-Gries heavy
    // hitters: d=4 hash rows × w=256 buckets, every cell a plain
    // count that MERGES by cell-wise sum — the mergeable-sketch
    // contract. Because the query already pays one corpus-wide
    // groupBy(key) for the exact probes, the sketch ingests those
    // KEYED PARTIALS (sum of per-key counts ≡ count of rows, by
    // distributivity) instead of the raw stream — md5/explode/conv run
    // over the distinct keys only, ~30× fewer rows here (was the
    // heaviest stage of the query, 3.7 s warm → 0.7 s). A true
    // streaming build (keys too hot to pre-aggregate) would explode
    // the raw rows — same cells either way. Estimates for the top-10
    // exact keys take min over the 4 probed cells; the one-sided
    // never-underestimate guarantee is hash-checked alongside the
    // estimates. md5-derived bucket hashing keeps both engines
    // bit-identical.
    q("agg_countmin",
      """WITH exact AS (SELECT l_partkey, count(*) c FROM lineitem
        |               GROUP BY 1),
        |cells AS (SELECT g.j,
        |            ('0x' || substr(md5(l_partkey::VARCHAR), 1 + 8 * g.j,
        |                            8))::BIGINT % 256 b,
        |            sum(c) cnt
        |          FROM exact, generate_series(0, 3) g(j) GROUP BY 1, 2),
        |probes AS (SELECT l_partkey, c, md5(l_partkey::VARCHAR) dg
        |           FROM exact ORDER BY c DESC, l_partkey LIMIT 10),
        |est AS (SELECT p.l_partkey, p.c, min(cells.cnt) est
        |        FROM probes p, generate_series(0, 3) g(j)
        |        JOIN cells ON cells.j = g.j
        |          AND cells.b =
        |            ('0x' || substr(p.dg, 1 + 8 * g.j, 8))::BIGINT % 256
        |        GROUP BY 1, 2)
        |SELECT l_partkey, c::BIGINT AS exact_n, est::BIGINT AS cms_est,
        |       est >= c AS no_underestimate
        |FROM est ORDER BY exact_n DESC, l_partkey""",
      bench = true) { c =>
      // one md5 per DISTINCT key: the 32-hex digest yields the four
      // row-hashes as disjoint 8-hex windows
      def bucket(dg: org.apache.spark.sql.Column,
          j: org.apache.spark.sql.Column) =
        conv(dg.substr(lit(1) + lit(8) * j, lit(8)), 16, 10)
          .cast("long") % 256
      val exact = c.lineitem.groupBy("l_partkey")
        .agg(count(lit(1)).as("c"))
      val cells = exact
        .select(md5(col("l_partkey").cast("string")).as("dg"), col("c"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .select(col("j"), bucket(col("dg"), col("j")).as("b"), col("c"))
        .groupBy("j", "b").agg(sum(col("c")).as("cnt"))
      val probes = exact
        .orderBy(col("c").desc, col("l_partkey")).limit(10)
        .withColumn("dg", md5(col("l_partkey").cast("string")))
      probes
        .select(col("l_partkey"), col("c"), col("dg"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("b", bucket(col("dg"), col("j")))
        .join(broadcast(cells), Seq("j", "b"))
        .groupBy("l_partkey", "c").agg(min(col("cnt")).as("est"))
        .select(col("l_partkey"), col("c").as("exact_n"),
          col("est").as("cms_est"),
          (col("est") >= col("c")).as("no_underestimate"))
        .orderBy(col("exact_n").desc, col("l_partkey"))
    },

    // Price-volume bridge (Laspeyres decomposition) — the BI "why did
    // revenue move" waterfall: per segment, the period-over-period
    // revenue delta splits EXACTLY into a volume effect at old unit
    // prices plus a price/mix effect on new volume,
    // ΔR = (q₂−q₁)·u₁ + q₂·(u₂−u₁). Revenue terms are exact DECIMAL
    // sums (each l_extendedprice·(1−l_discount) is a true 4-decimal
    // rational, so the per-row decimal cast is lossless) — the
    // decomposition identity holds to the cent.
    q("bi_mix_shift",
      """WITH p AS (SELECT l_returnflag seg,
        |             CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
        |                  THEN 1 ELSE 2 END per,
        |             l_quantity q,
        |             l_extendedprice * (1 - l_discount) rev
        |           FROM lineitem),
        |a AS (SELECT seg,
        |        CAST(sum(CASE WHEN per = 1 THEN CAST(q AS DECIMAL(18,4))
        |                 ELSE 0 END) AS DOUBLE) q1,
        |        CAST(sum(CASE WHEN per = 2 THEN CAST(q AS DECIMAL(18,4))
        |                 ELSE 0 END) AS DOUBLE) q2,
        |        CAST(sum(CASE WHEN per = 1
        |                 THEN CAST(rev AS DECIMAL(18,4))
        |                 ELSE 0 END) AS DOUBLE) r1,
        |        CAST(sum(CASE WHEN per = 2
        |                 THEN CAST(rev AS DECIMAL(18,4))
        |                 ELSE 0 END) AS DOUBLE) r2
        |      FROM p GROUP BY 1)
        |SELECT seg, round(r1 + 1e-9, 2) AS rev_p1,
        |       round(r2 + 1e-9, 2) AS rev_p2,
        |       round((q2 - q1) * (r1 / q1) + 1e-9, 2) AS volume_effect,
        |       round(q2 * (r2 / q2 - r1 / q1) + 1e-9, 2)
        |         AS price_mix_effect,
        |       round(r2 - r1 + 1e-9, 2) AS total_delta
        |FROM a ORDER BY seg""") { c =>
      val dec = "decimal(18,4)"
      def csum(cond: org.apache.spark.sql.Column,
          x: org.apache.spark.sql.Column) =
        sum(when(cond, x.cast(dec)).otherwise(lit(0).cast(dec)))
          .cast("double")
      val p = c.lineitem.select(col("l_returnflag").as("seg"),
        when(col("l_shipdate") < lit("1998-07-01").cast("timestamp"), 1)
          .otherwise(2).as("per"),
        col("l_quantity").as("q"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev"))
      val a = p.groupBy("seg").agg(
        csum(col("per") === 1, col("q")).as("q1"),
        csum(col("per") === 2, col("q")).as("q2"),
        csum(col("per") === 1, col("rev")).as("r1"),
        csum(col("per") === 2, col("rev")).as("r2"))
      a.select(col("seg"), r2(col("r1")).as("rev_p1"),
          r2(col("r2")).as("rev_p2"),
          r2((col("q2") - col("q1")) * (col("r1") / col("q1")))
            .as("volume_effect"),
          r2(col("q2") * (col("r2") / col("q2") - col("r1") / col("q1")))
            .as("price_mix_effect"),
          r2(col("r2") - col("r1")).as("total_delta"))
        .orderBy("seg")
    },

    // Position-based (U-shaped 40/20/40) multi-touch attribution —
    // the industry-default credit curve between win_attribution's
    // first- and last-touch extremes: 40% to the first and last
    // pre-conversion touches, the middle 20% split evenly. One
    // user-keyed join to the first conversion instant + one per-user
    // window; credits are exact rationals summed per channel.
    q("win_attribution_position",
      """WITH conv AS (SELECT user_id,
        |        min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
        |          FILTER (event_type = 'purchase') cts
        |      FROM events GROUP BY 1),
        |path AS (SELECT e.user_id, e.event_type,
        |              row_number() OVER (PARTITION BY e.user_id
        |                ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
        |                         AS BIGINT), event_id) pos,
        |              count(*) OVER (PARTITION BY e.user_id) k
        |         FROM events e JOIN conv ON e.user_id = conv.user_id
        |         WHERE conv.cts IS NOT NULL
        |           AND CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
        |               AS BIGINT) < conv.cts),
        |cr AS (SELECT event_type,
        |         CASE WHEN k = 1 THEN 1.0
        |              WHEN k = 2 THEN 0.5
        |              WHEN pos = 1 THEN 0.4
        |              WHEN pos = k THEN 0.4
        |              ELSE 0.2 / (k - 2) END credit
        |       FROM path)
        |SELECT event_type, round(sum(credit) + 1e-9, 4) AS credit,
        |       count(*)::BIGINT AS touches
        |FROM cr GROUP BY 1 ORDER BY event_type""") { c =>
      import org.apache.spark.sql.expressions.Window
      val sec = unix_timestamp(col("ts"))
      val conv = c.events.groupBy("user_id")
        .agg(min(when(col("event_type") === "purchase", sec)).as("cts"))
        .filter(col("cts").isNotNull)
      val w = Window.partitionBy("user_id").orderBy(sec, col("event_id"))
      val path = c.events.join(broadcast(conv), Seq("user_id"))
        .filter(sec < col("cts"))
        .withColumn("pos", row_number().over(w))
        .withColumn("k", count(lit(1)).over(
          Window.partitionBy("user_id")))
      val credit = when(col("k") === 1, lit(1.0))
        .when(col("k") === 2, lit(0.5))
        .when(col("pos") === 1, lit(0.4))
        .when(col("pos") === col("k"), lit(0.4))
        .otherwise(lit(0.2) / (col("k") - 2))
      path.select(col("event_type"), credit.as("credit"))
        .groupBy("event_type")
        .agg(r4(sum(col("credit"))).as("credit"),
          count(lit(1)).as("touches"))
        .orderBy("event_type")
    },

    // Multi-pass blocking-quality audit (Christen 2012's REDUCTION
    // RATIO and PAIRS COMPLETENESS for record-linkage blocking): the
    // dedup_fuzzy_jw dirty/master scenario under two blocking passes —
    // name PREFIX (first 4 chars) and name SUFFIX (last 4) — plus
    // their union, the standard multi-pass scheme. Ground truth is
    // known by construction (each dirty record's true master is its
    // own partkey): the %4 mutations break prefix for 1-in-4 and
    // suffix for 2-in-4, so per-pass completeness is 0.75 / 0.50 and
    // the union recovers 1.0 — the audit SHOWS why multi-pass wins.
    // 100 TB shape: candidate counts come from PER-KEY COUNT PRODUCTS
    // (Σ cd(k)·cm(k), union by inclusion–exclusion on the composite
    // key) — no candidate pair is ever materialized — and completeness
    // from the O(N) diagonal join. All exact integers, one division
    // pair per output row.
    q("er_blocking_quality",
      """WITH dirty AS (
        |  SELECT p_partkey AS rec_id,
        |         CASE p_partkey % 4
        |           WHEN 0 THEN p_name
        |           WHEN 1 THEN substring(p_name, 1, length(p_name) - 1)
        |           WHEN 2 THEN substring(p_name, 1, 1) || p_name
        |           ELSE p_name || 'x' END AS d_name
        |  FROM part),
        |dk AS (SELECT rec_id, substring(d_name, 1, 4) k1,
        |         substring(d_name, length(d_name) - 3, 4) k2
        |       FROM dirty),
        |mk AS (SELECT p_partkey m_id, substring(p_name, 1, 4) k1,
        |         substring(p_name, length(p_name) - 3, 4) k2
        |       FROM part),
        |c1 AS (SELECT sum(d.c::HUGEINT * m.c)::BIGINT n FROM
        |  (SELECT k1, count(*) c FROM dk GROUP BY 1) d JOIN
        |  (SELECT k1, count(*) c FROM mk GROUP BY 1) m ON d.k1 = m.k1),
        |c2 AS (SELECT sum(d.c::HUGEINT * m.c)::BIGINT n FROM
        |  (SELECT k2, count(*) c FROM dk GROUP BY 1) d JOIN
        |  (SELECT k2, count(*) c FROM mk GROUP BY 1) m ON d.k2 = m.k2),
        |cb AS (SELECT sum(d.c::HUGEINT * m.c)::BIGINT n FROM
        |  (SELECT k1, k2, count(*) c FROM dk GROUP BY 1, 2) d JOIN
        |  (SELECT k1, k2, count(*) c FROM mk GROUP BY 1, 2) m
        |    ON d.k1 = m.k1 AND d.k2 = m.k2),
        |diag AS (SELECT
        |    count(*) FILTER (d.k1 = m.k1)::BIGINT f1,
        |    count(*) FILTER (d.k2 = m.k2)::BIGINT f2,
        |    count(*) FILTER (d.k1 = m.k1 OR d.k2 = m.k2)::BIGINT fu,
        |    count(*)::BIGINT nd
        |  FROM dk d JOIN mk m ON d.rec_id = m.m_id),
        |rows_ AS (
        |  SELECT 'prefix4' pass, c1.n n_cand, diag.f1 tf, diag.nd
        |  FROM c1, diag
        |  UNION ALL
        |  SELECT 'suffix4', c2.n, diag.f2, diag.nd FROM c2, diag
        |  UNION ALL
        |  SELECT 'union', c1.n + c2.n - cb.n, diag.fu, diag.nd
        |  FROM c1, c2, cb, diag)
        |SELECT pass, n_cand, tf AS true_found,
        |       round(1 - n_cand::DOUBLE / (nd::DOUBLE * nd) + 1e-9, 6)
        |         AS reduction_ratio,
        |       round(tf::DOUBLE / nd + 1e-9, 6) AS pairs_completeness
        |FROM rows_ ORDER BY pass""") { c =>
      val dirty = c.part.select(col("p_partkey").as("rec_id"),
        when(col("p_partkey") % 4 === 0, col("p_name"))
          .when(col("p_partkey") % 4 === 1,
            expr("substring(p_name, 1, length(p_name) - 1)"))
          .when(col("p_partkey") % 4 === 2,
            concat(expr("substring(p_name, 1, 1)"), col("p_name")))
          .otherwise(concat(col("p_name"), lit("x"))).as("d_name"))
      val dk = dirty.select(col("rec_id"),
        expr("substring(d_name, 1, 4)").as("k1"),
        expr("substring(d_name, length(d_name) - 3, 4)").as("k2"))
      val mk = c.part.select(col("p_partkey").as("m_id"),
        expr("substring(p_name, 1, 4)").as("k1"),
        expr("substring(p_name, length(p_name) - 3, 4)").as("k2"))
      def countProd(keys: Seq[String]) = {
        val d = dk.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cd"))
        val m = mk.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cm"))
        d.join(m, keys)
          .agg(sum(col("cd").cast("decimal(38,0)") * col("cm"))
            .cast("long").as("n"))
      }
      val c1 = countProd(Seq("k1"))
      val c2 = countProd(Seq("k2"))
      val cb = countProd(Seq("k1", "k2"))
      val diag = dk.join(mk, col("rec_id") === col("m_id"))
        .agg(
          sum(when(dk("k1") === mk("k1"), 1L).otherwise(0L)).as("f1"),
          sum(when(dk("k2") === mk("k2"), 1L).otherwise(0L)).as("f2"),
          sum(when(dk("k1") === mk("k1") || dk("k2") === mk("k2"), 1L)
            .otherwise(0L)).as("fu"),
          count(lit(1)).as("nd"))
      val base = broadcast(diag)
      val r1 = c1.crossJoin(base).select(lit("prefix4").as("pass"),
        col("n").as("n_cand"), col("f1").as("tf"), col("nd"))
      val r2 = c2.crossJoin(base).select(lit("suffix4").as("pass"),
        col("n").as("n_cand"), col("f2").as("tf"), col("nd"))
      val r3 = c1.select(col("n").as("n1"))
        .crossJoin(c2.select(col("n").as("n2")))
        .crossJoin(cb.select(col("n").as("nb")))
        .crossJoin(base)
        .select(lit("union").as("pass"),
          (col("n1") + col("n2") - col("nb")).as("n_cand"),
          col("fu").as("tf"), col("nd"))
      r1.union(r2).union(r3)
        .select(col("pass"), col("n_cand"), col("tf").as("true_found"),
          r6(lit(1) - col("n_cand").cast("double") /
            (col("nd").cast("double") * col("nd")))
            .as("reduction_ratio"),
          r6(col("tf").cast("double") / col("nd"))
            .as("pairs_completeness"))
        .orderBy("pass")
    },

    // Encoding-repair / mojibake scan (the ftfy class: UTF-8 bytes
    // decoded as Latin-1/cp1252) — the one high-frequency pretraining
    // scrub the curation tier lacked (r11 verdict ask #5). Detected
    // artifact classes, counted BEFORE repair:
    //   (a) U+00C3 ('Ã') followed by a [U+0080,U+00FF] char — the
    //       2-byte UTF-8-as-Latin-1 digraph (é→"Ã©", è→"Ã¨", ñ→"Ã±");
    //   (b) U+00E2 U+20AC ("â€") + one char — the 3-byte digraph of
    //       the curly-punctuation family ('’'→"â€™", '“'→"â€œ");
    //   (c) U+FFFD replacement chars (an earlier lossy decode);
    //   (d) bare C1 controls U+0080–U+009F (cp1252 bytes with no
    //       mapping — e.g. the third byte of '”').
    // Repair = the pinned ftfy-core digraph mapping (3-char sequences
    // before 2-char so prefixes can't shadow) + strip of (c)/(d);
    // everything is per-row expression work over one scan (the
    // gov_luhn_scan shape — embarrassingly parallel at 100 TB, no
    // shuffle before the final ORDER BY). Synthetic plants make the
    // contract checkable: every 6th doc gets " cafÃ© itâ€™s" (both
    // digraph classes), every 11th a replacement char + C1 control —
    // and the repaired_sample column shows the mapped text. Unicode is
    // composed with chr() in the oracle so no raw control byte rides
    // the SQL-JSON dump.
    // Soundex phonetic blocking (the NARA/American Soundex algorithm,
    // exact: h/w-transparent same-code merge, vowel separators, first
    // letter retained) — the third blocking key beside dedup_fuzzy's
    // edit-distance and er_blocking_quality's prefix/suffix passes:
    // phonetic codes catch the sound-alike misspellings
    // (widget→widgit) that n-gram blocks miss at distance. The whole
    // code is per-row expression work: translate() maps letters to
    // digits (h/w→9, vowels→0), 9s drop FIRST (so same codes separated
    // by h/w become adjacent and merge — the Ashcraft→A261 rule),
    // per-digit runs collapse via backreference-free regex chains
    // (DuckDB's RE2 has no backrefs), the first letter's own code
    // drops unless the initial is h/w, zeros strip, rpad to 3. Every
    // 7th part's noun is vowel-mutated (translate e→i) and must land
    // in the SAME block — the phonetic-recall contract. Output per
    // block: sizes plus cross-word pair count (the ER candidate pairs
    // this key generates), all integer arithmetic.
    q("er_soundex_block",
      """WITH pn AS (SELECT p_partkey,
        |    CASE WHEN p_partkey % 7 = 0
        |         THEN translate(split_part(p_name, ' ', 2), 'e', 'i')
        |         ELSE split_part(p_name, ' ', 2) END w
        |  FROM part),
        |s1 AS (SELECT p_partkey, w,
        |    translate(w, 'abcdefghijklmnopqrstuvwxyz',
        |              '01230129022455012623019202') m FROM pn),
        |s2 AS (SELECT p_partkey, w, m, replace(m, '9', '') d9 FROM s1),
        |s3 AS (SELECT p_partkey, w, m,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(d9,
        |      '00+', '0', 'g'), '11+', '1', 'g'), '22+', '2', 'g'),
        |      '33+', '3', 'g'), '44+', '4', 'g'), '55+', '5', 'g'),
        |      '66+', '6', 'g') cc FROM s2),
        |s4 AS (SELECT p_partkey, w,
        |    upper(substr(w, 1, 1)) ||
        |    rpad(substr(replace(
        |      CASE WHEN substr(m, 1, 1) = '9' THEN cc
        |           ELSE substr(cc, 2) END, '0', ''), 1, 3), 3, '0') code
        |  FROM s3),
        |g AS (SELECT code, w, count(*)::BIGINT cw FROM s4 GROUP BY 1, 2),
        |b AS (SELECT code, sum(cw)::BIGINT n_parts,
        |        count(*)::BIGINT n_words,
        |        sum(cw * (cw - 1) // 2)::BIGINT same_pairs,
        |        min(w) first_word, max(w) last_word
        |      FROM g GROUP BY 1)
        |SELECT code, n_parts, n_words,
        |       (n_parts * (n_parts - 1) // 2 - same_pairs)::BIGINT
        |         AS cross_word_pairs,
        |       first_word, last_word
        |FROM b ORDER BY code""") { c =>
      val noun = expr("split_part(p_name, ' ', 2)")
      val pn = c.part.select(col("p_partkey"),
        when(col("p_partkey") % 7 === 0, translate(noun, "e", "i"))
          .otherwise(noun).as("w"))
      val s1 = pn.withColumn("m",
        translate(col("w"), "abcdefghijklmnopqrstuvwxyz",
          "01230129022455012623019202"))
      val s2 = s1.withColumn("d9", expr("replace(m, '9', '')"))
      val cc = Seq("0", "1", "2", "3", "4", "5", "6")
        .foldLeft(col("d9")) { (cx, d) =>
          regexp_replace(cx, d + d + "+", d)
        }
      val s4 = s2.withColumn("cc", cc)
        .select(col("p_partkey"), col("w"),
          concat(upper(col("w").substr(1, 1)),
            rpad(expr("substr(replace(CASE WHEN substr(m, 1, 1) = '9' " +
              "THEN cc ELSE substr(cc, 2) END, '0', ''), 1, 3)"),
              3, "0")).as("code"))
      val g = s4.groupBy("code", "w").agg(count(lit(1)).as("cw"))
      g.groupBy("code")
        .agg(sum(col("cw")).as("n_parts"),
          count(lit(1)).as("n_words"),
          sum(expr("cw * (cw - 1) div 2")).as("same_pairs"),
          min(col("w")).as("first_word"),
          max(col("w")).as("last_word"))
        .select(col("code"), col("n_parts"), col("n_words"),
          (expr("n_parts * (n_parts - 1) div 2") - col("same_pairs"))
            .as("cross_word_pairs"),
          col("first_word"), col("last_word"))
        .orderBy("code")
    },

    // Lexical-richness profile from the frequency-of-frequencies table
    // — the corpus-characterization stats a pretraining data card
    // reports beside Zipf/Heaps (both already in the registry): hapax
    // ratio V1/V (proportion of once-only words — high = diverse or
    // noisy), Sichel's S = V2/V, and Yule's K = 1e4·(Σf²·V_f − N)/N²
    // (Yule 1944 — repeat-rate characteristic, length-invariant, the
    // classic authorship/contamination signal: boilerplate-heavy
    // corpora push K up). The whole statistic is INTEGER-exact from
    // two hash aggregations (word counts → frequency spectrum) until
    // the final three divisions — the 100 TB shape: corpus scan →
    // shuffle on word → shuffle on f (≤ a few thousand distinct
    // frequencies), no windows, no collects.
    q("text_hapax_yule",
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '[a-z]+')) word
        |           FROM documents),
        |f AS (SELECT word, count(*)::BIGINT fr FROM w GROUP BY 1),
        |ff AS (SELECT fr, count(*)::BIGINT vf FROM f GROUP BY 1),
        |t AS (SELECT sum(fr * vf)::BIGINT n, sum(vf)::BIGINT v,
        |             sum(fr * fr * vf)::BIGINT s2,
        |             sum(CASE WHEN fr = 1 THEN vf ELSE 0 END)::BIGINT v1,
        |             sum(CASE WHEN fr = 2 THEN vf ELSE 0 END)::BIGINT v2
        |      FROM ff)
        |SELECT n AS n_tokens, v AS vocab, v1 AS hapax, v2 AS dis,
        |       round(v1::DOUBLE / v + 1e-9, 6) AS hapax_ratio,
        |       round(10000.0 * (s2 - n) / (n::DOUBLE * n) + 1e-9, 6)
        |         AS yule_k,
        |       round(v2::DOUBLE / v + 1e-9, 6) AS sichel_s
        |FROM t""") { c =>
      val w = c.documents.select(
        explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("word"))
      val f = w.groupBy("word").agg(count(lit(1)).as("fr"))
      val ff = f.groupBy("fr").agg(count(lit(1)).as("vf"))
      ff.agg(
          sum(col("fr") * col("vf")).as("n"),
          sum(col("vf")).as("v"),
          sum(col("fr") * col("fr") * col("vf")).as("s2"),
          sum(when(col("fr") === 1, col("vf")).otherwise(0L)).as("v1"),
          sum(when(col("fr") === 2, col("vf")).otherwise(0L)).as("v2"))
        .select(col("n").as("n_tokens"), col("v").as("vocab"),
          col("v1").as("hapax"), col("v2").as("dis"),
          r6(col("v1").cast("double") / col("v")).as("hapax_ratio"),
          r6(lit(10000.0) * (col("s2") - col("n")) /
            (col("n").cast("double") * col("n"))).as("yule_k"),
          r6(col("v2").cast("double") / col("v")).as("sichel_s"))
    },

    // Code-vs-prose detection — the pretraining-mix router every
    // corpus pipeline runs before language-specific scrubs (code wants
    // different dedup/quality treatment than prose): per document,
    // count code keywords (word-boundary regex), code punctuation
    // ([;{}()=<>]), and generic non-prose symbols, then an INTEGER
    // score (2·keywords + punct + symbols) with the code call at
    // score >= 8 — integer arithmetic end to end, so no FP boundary
    // can flip the flag between engines. The synthetic documents are
    // pure lowercase prose, so plants make the contract checkable:
    // every 13th doc gets a python-ish snippet (keywords + braces),
    // every 17th a light symbol sprinkle that must stay BELOW the
    // call threshold. Pure per-row expression work over one scan.
    q("text_code_detect",
      """WITH t AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 13 = 0
        |      THEN ' def calc(x): return {x * 2}; import os; class F:'
        |      ELSE '' END
        |         || CASE WHEN doc_id % 17 = 0
        |      THEN ' a = b; (c)' ELSE '' END t2
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |    len(regexp_extract_all(t2,
        |      '\b(def|return|import|class|function|var|const)\b'))::BIGINT
        |      n_kw,
        |    len(regexp_extract_all(t2, '[;{}()=<>]'))::BIGINT n_punct,
        |    len(regexp_extract_all(t2, '[*:#\[\]]'))::BIGINT n_sym
        |  FROM t)
        |SELECT doc_id, n_kw, n_punct, n_sym,
        |       (2 * n_kw + n_punct + n_sym)::BIGINT AS score,
        |       (2 * n_kw + n_punct + n_sym) >= 8 AS is_code
        |FROM sc WHERE 2 * n_kw + n_punct + n_sym > 0
        |ORDER BY doc_id""") { c =>
      val t2 = concat(col("text"),
        when(col("doc_id") % 13 === 0,
          lit(" def calc(x): return {x * 2}; import os; class F:"))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit(" a = b; (c)"))
          .otherwise(lit("")))
      val sc = c.documents.select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          size(expr("regexp_extract_all(t2, " +
            "'\\\\b(def|return|import|class|function|var|const)\\\\b', 0)"))
            .cast("long").as("n_kw"),
          size(expr("regexp_extract_all(t2, '[;{}()=<>]', 0)"))
            .cast("long").as("n_punct"),
          size(expr("regexp_extract_all(t2, '[*:#\\\\[\\\\]]', 0)"))
            .cast("long").as("n_sym"))
      sc.select(col("doc_id"), col("n_kw"), col("n_punct"), col("n_sym"),
          (lit(2) * col("n_kw") + col("n_punct") + col("n_sym"))
            .as("score"),
          (lit(2) * col("n_kw") + col("n_punct") + col("n_sym") >= 8)
            .as("is_code"))
        .filter(col("score") > 0)
        .orderBy("doc_id")
    },

    q("text_mojibake_repair",
      """WITH t AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 6 = 0
        |                 THEN ' caf' || chr(195) || chr(169) || ' it' ||
        |                      chr(226) || chr(8364) || chr(8482) || 's'
        |                 ELSE '' END
        |         || CASE WHEN doc_id % 11 = 0
        |                 THEN ' x' || chr(65533) || chr(147) || 'q'
        |                 ELSE '' END t2
        |  FROM documents),
        |a AS (SELECT doc_id, t2,
        |    len(regexp_extract_all(t2,
        |      chr(195) || '[' || chr(128) || '-' || chr(255) || ']|' ||
        |      chr(226) || chr(8364) || '.|' || chr(65533) || '|[' ||
        |      chr(128) || '-' || chr(159) || ']'))::BIGINT n_artifacts
        |  FROM t),
        |r AS (SELECT doc_id, n_artifacts,
        |    regexp_replace(
        |      replace(replace(replace(replace(replace(t2,
        |        chr(226)||chr(8364)||chr(8482), chr(8217)),
        |        chr(226)||chr(8364)||chr(339), chr(8220)),
        |        chr(195)||chr(169), chr(233)),
        |        chr(195)||chr(168), chr(232)),
        |        chr(195)||chr(177), chr(241)),
        |      chr(65533) || '|[' || chr(128) || '-' || chr(159) || ']',
        |      '', 'g') rep
        |  FROM a WHERE n_artifacts > 0)
        |SELECT doc_id, n_artifacts,
        |       substr(rep, greatest(1, length(rep) - 23)) AS repaired_sample
        |FROM r ORDER BY doc_id""") { c =>
      // every non-ASCII char is spelled as a Scala unicode escape here
      // (chr() on the SQL side): raw mojibake/control bytes in source
      // would be invisible and editor/tool-hostile. Key: 00c3 = the
      // 2-byte lead char, 00e2 20ac = the 3-byte lead pair, fffd =
      // replacement char, 0080-009f = the C1 block; repairs land on
      // e9 / e8 / f1 / 2019 / 201c.
      val t2 = concat(col("text"),
        when(col("doc_id") % 6 === 0,
          lit(" caf\u00c3\u00a9 it\u00e2\u20ac\u2122s")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit(" x\ufffd\u0093q")).otherwise(lit("")))
      val repaired = regexp_replace(
        replace(replace(replace(replace(replace(col("t2"),
          lit("\u00e2\u20ac\u2122"), lit("\u2019")),
          lit("\u00e2\u20ac\u0153"), lit("\u201c")),
          lit("\u00c3\u00a9"), lit("\u00e9")),
          lit("\u00c3\u00a8"), lit("\u00e8")),
          lit("\u00c3\u00b1"), lit("\u00f1")),
        lit("\ufffd|[\u0080-\u009f]"), lit(""))
      val moji =
        "\u00c3[\u0080-\u00ff]|\u00e2\u20ac.|\ufffd|[\u0080-\u009f]"
      c.documents.select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(t2, '$moji', 0)"))
            .cast("long").as("n_artifacts"),
          repaired.as("rep"))
        .filter(col("n_artifacts") > 0)
        .select(col("doc_id"), col("n_artifacts"),
          expr("substring(rep, greatest(1, length(rep) - 23))")
            .as("repaired_sample"))
        .orderBy("doc_id")
    },

    // Mean reciprocal rank @10 per language stratum — the
    // first-hit companion of rank_ndcg (graded gains) and
    // rank_map_at_k (all-hit precision) on the same deterministic
    // ranking (top-10 by n_chars DESC, doc_id): MRR is THE metric for
    // known-item retrieval (RAG lookup, dedup candidate ranking) where
    // only the first relevant hit matters. Relevance uses a different
    // pinned predicate (doc_id % 3 = 1) than MAP's so the two queries
    // exercise independent label sets. The reciprocal is quantized to
    // the 1e-6 grid via INTEGER division (1e6 // first_pos) before any
    // averaging, so every per-query RR is an exact lattice double and
    // the corpus MRR differs between engines only below the r4 nudge.
    // No-hit queries contribute RR = 0 (first_pos coalesced to 0 so
    // the output schema stays non-nullable). Windows are partitioned
    // by the query key and bounded to the candidate list — O(k) per
    // query, same shape as MAP.
    q("rank_mrr",
      """WITH cand AS (
        |  SELECT lang, doc_id,
        |         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS rel,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id) AS p
        |  FROM documents),
        |s AS (SELECT lang, sum(rel)::BIGINT n_rel,
        |        coalesce(min(CASE WHEN rel = 1 THEN p END), 0)::BIGINT
        |          first_pos
        |      FROM cand WHERE p <= 10 GROUP BY lang),
        |rr AS (SELECT lang, n_rel, first_pos,
        |         CASE WHEN first_pos = 0 THEN 0.0
        |              ELSE round((1000000 // first_pos) / 1e6
        |                         + 1e-9, 6) END AS rr
        |       FROM s)
        |SELECT lang, n_rel, first_pos, rr,
        |       round(avg(rr) OVER () + 1e-9, 4) AS mrr
        |FROM rr ORDER BY lang""") { c =>
      val cand = c.documents
        .select(col("lang"), col("doc_id"),
          (col("doc_id") % 3 === 1).cast("int").as("rel"),
          col("n_chars"))
        .withColumn("p", row_number().over(
          Window.partitionBy("lang")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("p") <= 10)
      val s = cand.groupBy("lang")
        .agg(sum(col("rel")).as("n_rel"),
          coalesce(min(when(col("rel") === 1, col("p"))), lit(0))
            .cast("long").as("first_pos"))
      val rr = s.select(col("lang"), col("n_rel"), col("first_pos"),
        when(col("first_pos") === 0, lit(0.0))
          .otherwise(r6(expr("1000000 div first_pos") / lit(1e6)))
          .as("rr"))
      rr.withColumn("mrr", r4(avg(col("rr")).over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))))
        .orderBy("lang")
    },

    // Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    // 1969 — the model behind Splink/dedupe.io) over blocked part
    // pairs: each pair gets a 3-field agreement vector and the
    // log-likelihood-ratio score sum_f ln(m_f/u_f) (agree) or
    // ln((1-m_f)/(1-u_f)) (disagree), then the classic
    // match / possible / nonmatch decision bands. The output is the
    // AGREEMENT-PATTERN TABLE (8 rows) — pair counts and the constant
    // score per pattern — the artifact an ER pipeline thresholds on.
    // Determinism: the six ln weights are PINNED 17-digit literals on
    // both engines (m = .9/.8/.7, u = .05/.2/.4 — never an engine
    // libm call), each pair's score is the same 3-term left-fold of
    // exact constants, and every agreement predicate compares exact
    // integers/strings (leading p_name color word, cent-quantized
    // retail price within $100, leading p_type grade word). Scale
    // shape: candidate pairs come from a (brand, size-last-digit)
    // BLOCKED equi-self-join — the standard ER blocking stance, never
    // corpus x corpus — and everything after is one hash aggregation
    // to <= 8 rows.
    q("er_fellegi_sunter",
      """WITH c0 AS (SELECT p_partkey k, p_brand br, p_size % 10 sz,
        |    split_part(p_name, ' ', 1) nm,
        |    CAST(round(p_retailprice * 100 + 1e-9) AS BIGINT) pr,
        |    split_part(p_type, ' ', 1) ty
        |  FROM part),
        |p AS (SELECT
        |        CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END g1,
        |        CASE WHEN abs(a.pr - b.pr) <= 10000
        |             THEN 1 ELSE 0 END g2,
        |        CASE WHEN a.ty = b.ty THEN 1 ELSE 0 END g3
        |      FROM c0 a JOIN c0 b ON a.br = b.br AND a.sz = b.sz
        |                         AND a.k < b.k),
        |s AS (SELECT g1, g2, g3, count(*)::BIGINT n_pairs,
        |        (CASE WHEN g1 = 1 THEN 2.8903717578961645
        |              ELSE -2.2512917986064953 END
        |       + CASE WHEN g2 = 1 THEN 1.3862943611198906
        |              ELSE -1.3862943611198908 END
        |       + CASE WHEN g3 = 1 THEN 0.5596157879354225
        |              ELSE -0.6931471805599451 END) sc
        |      FROM p GROUP BY 1, 2, 3)
        |SELECT g1, g2, g3, n_pairs, round(sc + 1e-9, 6) AS score,
        |  CASE WHEN round(sc + 1e-9, 6) >= 2.0 THEN 'match'
        |       WHEN round(sc + 1e-9, 6) >= 0.0 THEN 'possible'
        |       ELSE 'nonmatch' END AS cls
        |FROM s ORDER BY g1 DESC, g2 DESC, g3 DESC""") { c =>
      val c0 = c.part.select(col("p_partkey").as("k"),
        col("p_brand").as("br"), (col("p_size") % 10).as("sz"),
        substring_index(col("p_name"), " ", 1).as("nm"),
        round(col("p_retailprice") * 100 + lit(1e-9)).cast("long")
          .as("pr"),
        substring_index(col("p_type"), " ", 1).as("ty"))
      val p = c0.as("a")
        .join(c0.as("b"),
          col("a.br") === col("b.br") && col("a.sz") === col("b.sz") &&
            col("a.k") < col("b.k"))
        .select(
          (col("a.nm") === col("b.nm")).cast("int").as("g1"),
          (abs(col("a.pr") - col("b.pr")) <= 10000).cast("int").as("g2"),
          (col("a.ty") === col("b.ty")).cast("int").as("g3"))
      val s = p.groupBy("g1", "g2", "g3")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("sc",
          when(col("g1") === 1, lit(2.8903717578961645))
            .otherwise(lit(-2.2512917986064953)) +
          when(col("g2") === 1, lit(1.3862943611198906))
            .otherwise(lit(-1.3862943611198908)) +
          when(col("g3") === 1, lit(0.5596157879354225))
            .otherwise(lit(-0.6931471805599451)))
      s.select(col("g1"), col("g2"), col("g3"), col("n_pairs"),
          r6(col("sc")).as("score"),
          when(r6(col("sc")) >= 2.0, lit("match"))
            .when(r6(col("sc")) >= 0.0, lit("possible"))
            .otherwise(lit("nonmatch")).as("cls"))
        .orderBy(col("g1").desc, col("g2").desc, col("g3").desc)
    },

    // Golden-record SURVIVORSHIP — the step AFTER er_entities'
    // transitive clustering that an MDM / entity-resolution pipeline
    // actually ships: per multi-member entity, merge the member
    // records into one golden row under pinned, deterministic rules
    // (longest name wins, ties to the lowest record id; most frequent
    // brand, ties lexicographic; max price; min size — the standard
    // recency/frequency/extremum survivorship vocabulary). Same
    // name-record universe and blocked levenshtein match graph as
    // er_entities (records = distinct part names keyed by their
    // lowest p_partkey, attributes from that representative part);
    // clusters from the shared Components fixpoint. Everything
    // downstream is exact integers/strings through entity-partitioned
    // windows — no FP anywhere. Scale: the match graph is the
    // er_entities blocked self-join; survivorship is two hash
    // aggregations + two entity-keyed window argmaxes.
    q("er_survivorship",
      """WITH RECURSIVE nd AS (SELECT p_name, min(p_partkey) nid
        |                      FROM part GROUP BY 1),
        |np AS (SELECT a.nid an, b.nid bn
        |       FROM nd a JOIN nd b ON a.nid < b.nid
        |       WHERE (left(a.p_name, 3) = left(b.p_name, 3)
        |              OR right(a.p_name, 3) = right(b.p_name, 3))
        |         AND levenshtein(a.p_name, b.p_name) <= 2),
        |e AS (SELECT an a, bn b FROM np UNION ALL SELECT bn, an FROM np),
        |walk(id, comp) AS (
        |  SELECT nid, nid FROM nd
        |  UNION
        |  SELECT e.b, w.comp FROM walk w JOIN e ON e.a = w.id),
        |lab AS (SELECT id, min(comp) entity FROM walk GROUP BY 1),
        |rec AS (SELECT lab.entity, nd.nid, nd.p_name,
        |          p.p_brand br,
        |          CAST(round(p.p_retailprice * 100 + 1e-9) AS BIGINT) pr,
        |          p.p_size sz
        |        FROM nd JOIN lab ON nd.nid = lab.id
        |        JOIN part p ON p.p_partkey = nd.nid),
        |big AS (SELECT entity FROM rec GROUP BY 1 HAVING count(*) >= 2),
        |nm AS (SELECT entity, p_name,
        |         row_number() OVER (PARTITION BY entity
        |           ORDER BY length(p_name) DESC, nid) rn
        |       FROM rec),
        |bc AS (SELECT entity, br, count(*) c FROM rec GROUP BY 1, 2),
        |bw AS (SELECT entity, br,
        |         row_number() OVER (PARTITION BY entity
        |           ORDER BY c DESC, br) rn
        |       FROM bc),
        |ag AS (SELECT entity, count(*)::BIGINT n_members,
        |         max(pr)::BIGINT max_price_cents,
        |         min(sz)::INT min_size
        |       FROM rec GROUP BY 1)
        |SELECT ag.entity AS entity_id, ag.n_members,
        |  nm.p_name AS golden_name, bw.br AS golden_brand,
        |  ag.max_price_cents, ag.min_size
        |FROM ag JOIN big ON ag.entity = big.entity
        |JOIN nm ON nm.entity = ag.entity AND nm.rn = 1
        |JOIN bw ON bw.entity = ag.entity AND bw.rn = 1
        |ORDER BY entity_id""") { c =>
      val nd = c.part.groupBy("p_name")
        .agg(min(col("p_partkey")).as("nid"))
      val a = nd.select(col("p_name").as("na"), col("nid").as("an"))
      val b = nd.select(col("p_name").as("nb"), col("nid").as("bn"))
      val np = a.join(b, col("an") < col("bn") &&
          (expr("left(na, 3) = left(nb, 3)") ||
            expr("right(na, 3) = right(nb, 3)")) &&
          levenshtein(col("na"), col("nb")) <= 2)
        .select(col("an"), col("bn"))
      val labels = graft.ops.Components.connectedComponents(np, "an", "bn")
      val rec = nd
        .join(broadcast(labels), col("nid") === col("id"), "left")
        .select(coalesce(col("component"), col("nid")).as("entity"),
          col("nid"), col("p_name"))
        .join(c.part.select(col("p_partkey"), col("p_brand").as("br"),
            round(col("p_retailprice") * 100 + lit(1e-9)).cast("long")
              .as("pr"),
            col("p_size").as("sz")),
          col("nid") === col("p_partkey"))
      val big = rec.groupBy("entity").agg(count(lit(1)).as("n_members"),
          max(col("pr")).as("max_price_cents"),
          min(col("sz")).cast("int").as("min_size"))
        .filter(col("n_members") >= 2)
      val wNm = Window.partitionBy("entity")
        .orderBy(length(col("p_name")).desc, col("nid"))
      val nm = rec.withColumn("rn", row_number().over(wNm))
        .filter(col("rn") === 1)
        .select(col("entity"), col("p_name").as("golden_name"))
      val bc = rec.groupBy("entity", "br").agg(count(lit(1)).as("c"))
      val wBr = Window.partitionBy("entity")
        .orderBy(col("c").desc, col("br"))
      val bw = bc.withColumn("rn", row_number().over(wBr))
        .filter(col("rn") === 1)
        .select(col("entity"), col("br").as("golden_brand"))
      big.join(nm, Seq("entity")).join(bw, Seq("entity"))
        .select(col("entity").as("entity_id"), col("n_members"),
          col("golden_name"), col("golden_brand"),
          col("max_price_cents"), col("min_size"))
        .orderBy("entity_id")
    },

    // Kendall's coefficient of concordance W (Kendall & Babington
    // Smith 1939) across m = 3 deterministic part rankings (by retail
    // price, by size, by name; ties broken by key) — the multi-judge
    // agreement statistic rank_rrf/rank_borda fuse without measuring:
    // W = S / (m^2 (n^3 - n) / 12), reported with the mean pairwise
    // Spearman rho = (mW - 1)/(m - 1). EXACT arithmetic throughout:
    // with dev = 2(R_i) - 3(n+1) (twice the centered rank sum, always
    // an integer), S4 = Sum dev^2 = 4S is a BIGINT and
    // W = S4 / (3 (n^3 - n)) is the single final division. Global
    // ranks use Positional.withRowNumber (range-bucketed two-phase
    // numbering — never a single-partition window over the corpus);
    // the three rank relations join back on the key.
    q("rank_kendall_w",
      """WITH b AS (SELECT p_partkey k,
        |    CAST(round(p_retailprice * 100 + 1e-9) AS BIGINT) pr,
        |    p_size sz, p_name nm FROM part),
        |r AS (SELECT k,
        |    row_number() OVER (ORDER BY pr, k)::BIGINT r1,
        |    row_number() OVER (ORDER BY sz, k)::BIGINT r2,
        |    row_number() OVER (ORDER BY nm, k)::BIGINT r3 FROM b),
        |t AS (SELECT count(*)::BIGINT n FROM b),
        |s AS (SELECT sum((2 * (r1 + r2 + r3) - 3 * (n + 1))
        |               * (2 * (r1 + r2 + r3) - 3 * (n + 1)))::BIGINT s4,
        |        max(n)::BIGINT n
        |      FROM r, t)
        |SELECT n AS n_items, s4,
        |  round(s4 * 1.0 / (3 * (n * n * n - n)) + 1e-9, 6)
        |    AS kendall_w,
        |  round((3.0 * (s4 * 1.0 / (3 * (n * n * n - n))) - 1.0) / 2
        |        + 1e-9, 6) AS rho_mean
        |FROM s""") { c =>
      import graft.ops.Positional
      val base = c.part.select(col("p_partkey").as("k"),
        round(col("p_retailprice") * 100 + lit(1e-9)).cast("long")
          .as("pr"),
        col("p_size").as("sz"), col("p_name").as("nm"))
      def ranked(by: org.apache.spark.sql.Column, name: String) =
        Positional.withRowNumber(base, Seq(by, col("k")), name)
          .select(col("k"), col(name).cast("long").as(name))
      val j = ranked(col("pr"), "r1")
        .join(ranked(col("sz"), "r2"), Seq("k"))
        .join(ranked(col("nm"), "r3"), Seq("k"))
      val nn = base.count()
      val dev = lit(2) * (col("r1") + col("r2") + col("r3")) -
        lit(3L * (nn + 1))
      val s = j.select(dev.as("dev"))
        .agg(sum(col("dev") * col("dev")).as("s4"))
      val den = 3L * (nn * nn * nn - nn)
      val wExpr = col("s4") * 1.0 / den
      s.select(lit(nn).as("n_items"), col("s4"),
        r6(wExpr).as("kendall_w"),
        r6((lit(3.0) * wExpr - 1.0) / 2).as("rho_mean"))
    },

    // Rank-biased overlap (Webber, Moffat & Zobel 2010 — the standard
    // top-weighted similarity between two INDEFINITE rankings; unlike
    // Kendall/Spearman it neither needs conjoint domains nor weighs
    // rank 1 equally with rank 1000, which is why search and
    // recommendation evals report it): parts ranked by total shipped
    // quantity vs by total revenue, truncated at depth 20, p = 1/2 so
    // every geometric weight is an exact dyadic double. Per depth d,
    // the prefix overlap |A_d ∩ B_d| is an exact integer from the
    // joined rank pairs; the 20 weighted agreement terms fold in
    // PINNED depth order. Scale: two corpus aggregations, two
    // top-20-bounded sorts — the depth grid is a 20-row literal.
    q("rank_rbo",
      """WITH qa AS (SELECT l_partkey pk,
        |    sum(CAST(l_quantity AS BIGINT))::BIGINT q
        |  FROM lineitem GROUP BY 1),
        |ra AS (SELECT pk, row_number() OVER (ORDER BY q DESC, pk) r
        |       FROM qa),
        |qb AS (SELECT l_partkey pk,
        |    sum(CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT v
        |  FROM lineitem GROUP BY 1),
        |rb AS (SELECT pk, row_number() OVER (ORDER BY v DESC, pk) r
        |       FROM qb),
        |j AS (SELECT ra.pk, ra.r ra2, rb.r rb2
        |      FROM ra JOIN rb ON ra.pk = rb.pk
        |      WHERE ra.r <= 20 AND rb.r <= 20),
        |ds AS (SELECT unnest(generate_series(1, 20)) d),
        |ov AS (SELECT ds.d,
        |         coalesce(sum(CASE WHEN j.ra2 <= ds.d AND j.rb2 <= ds.d
        |                           THEN 1 ELSE 0 END), 0)::BIGINT ov
        |       FROM ds LEFT JOIN j ON TRUE GROUP BY 1),
        |f AS (SELECT
        |    list_reduce(list(0.5 * pow(0.5, d - 1) * (ov * 1.0 / d)
        |                     ORDER BY d), (a, x) -> a + x) rbo,
        |    max(CASE WHEN d = 5 THEN ov END)::BIGINT ov5,
        |    max(CASE WHEN d = 10 THEN ov END)::BIGINT ov10,
        |    max(CASE WHEN d = 20 THEN ov END)::BIGINT ov20
        |  FROM ov)
        |SELECT 20 AS depth, ov5, ov10, ov20,
        |  round(rbo + 1e-9, 6) AS rbo FROM f""") { c =>
      import org.apache.spark.sql.expressions.Window
      val sp = c.spark
      import sp.implicits._
      def top20(agg: org.apache.spark.sql.DataFrame,
          m: String): org.apache.spark.sql.DataFrame =
        agg.orderBy(col(m).desc, col("pk")).limit(20)
          .withColumn("r", row_number().over(
            Window.orderBy(col(m).desc, col("pk"))))
          .select(col("pk"), col("r"))
      val ra = top20(c.lineitem.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("q")), "q")
      val rb = top20(c.lineitem.groupBy(col("l_partkey").as("pk"))
        .agg(sum(round(col("l_extendedprice") * 100 + lit(1e-9))
          .cast("long")).as("v")), "v")
      val j = ra.as("a").join(rb.as("b"), col("a.pk") === col("b.pk"))
        .select(col("a.r").as("ra2"), col("b.r").as("rb2"))
      val ds = (1 to 20).toDF("d")
      val ov = broadcast(ds).join(j, lit(true), "left")
        .groupBy("d")
        .agg(coalesce(sum(when(col("ra2") <= col("d") &&
            col("rb2") <= col("d"), 1L).otherwise(0L)), lit(0L))
          .as("ov"))
      val f = ov.agg(
        aggregate(array_sort(collect_list(struct(col("d"),
            (lit(0.5) * pow(lit(0.5), col("d") - 1) *
              (col("ov") * lit(1.0) / col("d"))).as("tm")))),
          lit(0.0), (a, x) => a + x.getField("tm")).as("rbo"),
        max(when(col("d") === 5, col("ov"))).as("ov5"),
        max(when(col("d") === 10, col("ov"))).as("ov10"),
        max(when(col("d") === 20, col("ov"))).as("ov20"))
      f.select(lit(20).as("depth"), col("ov5"), col("ov10"),
        col("ov20"), r6(col("rbo")).as("rbo"))
    },

    // DPO/RLHF preference-pair construction — the alignment-data prep
    // step after quality scoring: within each prompt group (docs
    // bucketed by doc_id % 50 — the synthetic stand-in for N responses
    // to one prompt), the HIGHEST-quality member becomes `chosen` and
    // the lowest `rejected` (ties broken by doc_id, both engines), and
    // degenerate groups (single member, or all-equal quality where
    // chosen = rejected) are dropped. Quality is the alpha-ratio score
    // ROUNDED ONCE per row (the dedup_cluster_keep_best device), so
    // the per-group argmax/argmin ranks on an identical 1e-6 lattice
    // in both engines. One corpus projection + two windows over the
    // prompt-group relation.
    q("llm_dpo_pairs",
      """WITH q AS (SELECT doc_id, doc_id % 50 pid,
        |    round(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
        |          / length(text) + 1e-9, 6) qual
        |  FROM documents),
        |r AS (SELECT doc_id, pid, qual,
        |        row_number() OVER (PARTITION BY pid
        |          ORDER BY qual DESC, doc_id) rb,
        |        row_number() OVER (PARTITION BY pid
        |          ORDER BY qual ASC, doc_id) rw,
        |        count(*) OVER (PARTITION BY pid) np
        |      FROM q),
        |ch AS (SELECT pid, doc_id cid, qual cq FROM r
        |       WHERE rb = 1 AND np >= 2),
        |rj AS (SELECT pid, doc_id rid, qual rq FROM r
        |       WHERE rw = 1 AND np >= 2)
        |SELECT pid AS prompt_id, cid AS chosen_id, cq AS chosen_q,
        |  rid AS rejected_id, rq AS rejected_q,
        |  round(cq - rq + 1e-9, 6) AS margin
        |FROM ch JOIN rj USING (pid)
        |WHERE cid <> rid ORDER BY prompt_id""") { c =>
      val q = c.documents.select(col("doc_id"),
        (col("doc_id") % 50).as("pid"),
        r6(length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast("double") / length(col("text"))).as("qual"))
      val wb = Window.partitionBy("pid")
        .orderBy(col("qual").desc, col("doc_id"))
      val ww = Window.partitionBy("pid")
        .orderBy(col("qual").asc, col("doc_id"))
      val r = q.select(col("doc_id"), col("pid"), col("qual"),
        row_number().over(wb).as("rb"), row_number().over(ww).as("rw"),
        count(lit(1)).over(Window.partitionBy("pid")).as("np"))
      val ch = r.filter(col("rb") === 1 && col("np") >= 2)
        .select(col("pid"), col("doc_id").as("cid"),
          col("qual").as("cq"))
      val rj = r.filter(col("rw") === 1 && col("np") >= 2)
        .select(col("pid"), col("doc_id").as("rid"),
          col("qual").as("rq"))
      ch.join(rj, Seq("pid"))
        .filter(col("cid") =!= col("rid"))
        .select(col("pid").as("prompt_id"), col("cid").as("chosen_id"),
          col("cq").as("chosen_q"), col("rid").as("rejected_id"),
          col("rq").as("rejected_q"),
          r6(col("cq") - col("rq")).as("margin"))
        .orderBy("prompt_id")
    },

    // Truncated PAIRWISE Katz link-prediction index (Katz 1953;
    // Liben-Nowell & Kleinberg 2003 §3) on the co-purchase graph —
    // the walk-counting link predictor beside graph_link_prediction's
    // neighbor-overlap Adamic-Adar (and distinct from graph_katz,
    // which is the per-NODE centrality on the nation graph):
    // for non-adjacent candidate pairs, score = β²·walks₂ + β³·walks₃
    // with β = 0.1, so katz = (10·w₂ + w₃)/1000 is EXACT integer
    // arithmetic with one division at render. Scale shape: walk
    // enumeration is Σ deg², so hub nodes (deg > 64) are excluded
    // from INTERMEDIATE positions (the standard hub-suppression
    // prefilter — hubs cost quadratically and carry no signal);
    // candidates (walks₂ ≥ 2) stream through plain equi-joins and the
    // existing-edge screen is a left-anti join. Same quantity>40
    // co-purchase edge fixture as graph_triangles/clustering_coeff.
    q("graph_katz_link",
      """WITH e AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) u,
        |                  greatest(a.l_partkey, b.l_partkey) v
        |           FROM lineitem a JOIN lineitem b
        |             ON a.l_orderkey = b.l_orderkey
        |           WHERE a.l_partkey < b.l_partkey
        |             AND a.l_quantity > 40 AND b.l_quantity > 40),
        |adj AS (SELECT u a, v b FROM e UNION ALL SELECT v, u FROM e),
        |d AS (SELECT a node, count(*)::BIGINT deg FROM adj GROUP BY 1),
        |mid AS (SELECT adj.a w, adj.b x FROM adj
        |        JOIN d ON adj.a = d.node WHERE d.deg <= 64),
        |cadj AS (SELECT adj.a, adj.b FROM adj
        |         JOIN d da ON adj.a = da.node
        |         JOIN d db ON adj.b = db.node
        |         WHERE da.deg <= 64 AND db.deg <= 64),
        |w2 AS (SELECT m1.x x, m2.x z, count(*)::BIGINT p2
        |       FROM mid m1 JOIN mid m2
        |         ON m1.w = m2.w AND m1.x < m2.x
        |       GROUP BY 1, 2),
        |w3 AS (SELECT m1.x x, m3.x z, count(*)::BIGINT p3
        |       FROM mid m1 JOIN cadj cb ON m1.w = cb.a
        |       JOIN mid m3 ON cb.b = m3.w
        |       WHERE m1.x < m3.x
        |       GROUP BY 1, 2),
        |cand AS (SELECT w2.x, w2.z, w2.p2, coalesce(w3.p3, 0) p3
        |         FROM w2 LEFT JOIN w3 ON w2.x = w3.x AND w2.z = w3.z
        |         LEFT JOIN e ON e.u = w2.x AND e.v = w2.z
        |         WHERE e.u IS NULL AND w2.p2 >= 2)
        |SELECT x AS u, z AS v, p2 AS walks2, p3 AS walks3,
        |  round((10 * p2 + p3) / 1000.0 + 1e-9, 6) AS katz
        |FROM cand ORDER BY u, v""") { c =>
      val hi = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = hi.as("a")
        .join(hi.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
        .localCheckpoint()
      val adj = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
        .localCheckpoint()
      val d = adj.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("deg"))
      val mid = adj.join(d.filter(col("deg") <= 64),
          adj("a") === col("node"))
        .select(col("a").as("w"), col("b").as("x"))
        .localCheckpoint()
      val cadj = adj
        .join(d.filter(col("deg") <= 64).select(col("node").as("na")),
          adj("a") === col("na"))
        .join(d.filter(col("deg") <= 64).select(col("node").as("nb")),
          adj("b") === col("nb"))
        .select(col("a"), col("b"))
      val w2 = mid.as("m1").join(mid.as("m2"),
          col("m1.w") === col("m2.w") && col("m1.x") < col("m2.x"))
        .groupBy(col("m1.x").as("x"), col("m2.x").as("z"))
        .agg(count(lit(1)).as("p2"))
      val w3 = mid.as("m1")
        .join(cadj.as("cb"), col("m1.w") === col("cb.a"))
        .join(mid.as("m3"), col("cb.b") === col("m3.w"))
        .filter(col("m1.x") < col("m3.x"))
        .groupBy(col("m1.x").as("x3"), col("m3.x").as("z3"))
        .agg(count(lit(1)).as("p3"))
      val cand = w2.filter(col("p2") >= 2)
        .join(w3, col("x") === col("x3") && col("z") === col("z3"),
          "left")
        .select(col("x"), col("z"), col("p2"),
          coalesce(col("p3"), lit(0L)).as("p3"))
        .join(e, col("x") === col("u") && col("z") === col("v"),
          "left_anti")
      cand.select(col("x").as("u"), col("z").as("v"),
          col("p2").as("walks2"), col("p3").as("walks3"),
          r6((lit(10) * col("p2") + col("p3")) / 1000.0).as("katz"))
        .orderBy("u", "v")
    },
  )
}
