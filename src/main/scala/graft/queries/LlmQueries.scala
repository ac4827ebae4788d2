package graft.queries

import graft.QueryDef
import graft.ops.{Jpeg, Multimodal, TextDedup, VectorSim}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (the driver ships these tables for exactly this): text statistics and
  * quality filters, language-ID heuristic, token counting, document
  * fingerprinting, exact + MinHash-LSH + SimHash dedup, brute-force and
  * LSH-ANN similarity search, and multimodal binary-column plumbing.
  *
  * Scale notes: every dedup/similarity query here avoids the all-pairs
  * cross product — candidates come from `groupBy(band, key)` (MinHash
  * LSH) or hyperplane buckets (ANN); brute force appears only as the
  * sf0.01 correctness oracle and on the broadcast-sized query side of
  * top-k. Text metrics are per-row codegen expressions on the scan.
  */
object LlmQueries {

  val defs: Seq[QueryDef] = Seq(

    // Text statistics + quality scoring: length, token counts, character
    // class ratios, composite keep/drop — the standard pre-train corpus
    // filters, all row-local expressions.
    q("text_stats",
      """SELECT doc_id,
        |       length(text) AS len_chars,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       round(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
        |             / length(text) + 1e-9, 4) AS alpha_ratio,
        |       round(length(regexp_replace(text, '[^aeiou]', '', 'g'))::DOUBLE
        |             / length(text) + 1e-9, 4) AS vowel_ratio,
        |       round(length(regexp_replace(text, '[^\s]', '', 'g'))::DOUBLE
        |             / length(text) + 1e-9, 4) AS space_ratio,
        |       round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE
        |             / len(string_split_regex(trim(text), '\s+')) + 1e-9, 4) AS avg_tok_len,
        |       len(string_split_regex(trim(text), '\s+')) BETWEEN 5 AND 500
        |         AND length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
        |             / length(text) > 0.5 AS keep
        |FROM documents ORDER BY doc_id""") { c =>
      val nTok = size(split(trim(col("text")), "\\s+"))
      val alphaRatio = length(regexp_replace(col("text"), "[^a-z]", ""))
        .cast("double") / length(col("text"))
      c.documents.select(col("doc_id"),
          length(col("text")).as("len_chars"),
          nTok.as("n_tokens"),
          r4(alphaRatio).as("alpha_ratio"),
          r4(length(regexp_replace(col("text"), "[^aeiou]", ""))
            .cast("double") / length(col("text"))).as("vowel_ratio"),
          r4(length(regexp_replace(col("text"), "[^\\s]", ""))
            .cast("double") / length(col("text"))).as("space_ratio"),
          r4(length(regexp_replace(col("text"), "\\s", ""))
            .cast("double") / nTok).as("avg_tok_len"),
          (nTok.between(5, 500) && alphaRatio > 0.5).as("keep"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace words vs a BPE-ish regex tokenizer
    // (letter runs | digit runs | single punctuation).
    q("text_tokens",
      """SELECT doc_id,
        |       len(string_split_regex(trim(text), '\s+')) AS n_words,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish,
        |       round(length(text)::DOUBLE
        |             / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) + 1e-9, 4) AS chars_per_tok
        |FROM documents ORDER BY doc_id""") { c =>
      val nBpe = regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
      c.documents.select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_words"),
          nBpe.as("n_bpeish"),
          r4(length(col("text")).cast("double") / nBpe).as("chars_per_tok"))
        .orderBy("doc_id")
    },

    // Tokenizer fertility per language — tokens-per-word and
    // chars-per-token of the BPE-ish tokenization (length() counts
    // characters, matching the oracle; byte fertility would need
    // octet_length on both sides), THE readout for
    // judging whether a tokenizer under-serves a language (high
    // fertility = more compute per word of that language). One
    // groupBy over integer per-doc counts; the ratios are single
    // divisions of exact integer sums, rounded once.
    q("llm_tokenizer_fertility",
      """WITH d AS (SELECT lang,
        |                  len(string_split_regex(trim(text), '\s+')) w,
        |                  len(regexp_extract_all(text,
        |                      '[a-z]+|[0-9]+|[^a-z0-9\s]')) t,
        |                  length(text) ch
        |           FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       sum(w)::BIGINT AS n_words, sum(t)::BIGINT AS n_tokens,
        |       round(sum(t)::DOUBLE / sum(w) + 1e-9, 4) AS fertility,
        |       round(sum(ch)::DOUBLE / sum(t) + 1e-9, 4)
        |         AS chars_per_token
        |FROM d GROUP BY lang ORDER BY lang""") { c =>
      val d = c.documents.select(col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("w"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .cast("long").as("t"),
        length(col("text")).cast("long").as("ch"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
          sum(col("t")).as("n_tokens"),
          r4(sum(col("t")).cast("double") / sum(col("w")))
            .as("fertility"),
          r4(sum(col("ch")).cast("double") / sum(col("t")))
            .as("chars_per_token"))
        .orderBy("lang")
    },

    // Language-ID heuristic: function-word profile scores + argmax with
    // fixed tie-break (en > es > de > fr > und). On this synthetic corpus
    // every language shares one vocabulary, so the *contract under test*
    // is the deterministic scoring pipeline, mirrored in the oracle.
    q("text_lang_id",
      """SELECT doc_id, lang,
        |       len(list_filter(string_split_regex(lower(text), '\s+'),
        |                       t -> t IN ('the', 'a', 'of', 'and'))) AS s_en,
        |       len(list_filter(string_split_regex(lower(text), '\s+'),
        |                       t -> t IN ('el', 'la', 'de', 'y'))) AS s_es,
        |       len(list_filter(string_split_regex(lower(text), '\s+'),
        |                       t -> t IN ('der', 'die', 'das', 'und'))) AS s_de,
        |       len(list_filter(string_split_regex(lower(text), '\s+'),
        |                       t -> t IN ('le', 'les', 'et', 'une'))) AS s_fr,
        |       CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |            WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
        |            WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
        |            WHEN s_de >= s_fr THEN 'de'
        |            ELSE 'fr' END AS pred
        |FROM documents ORDER BY doc_id""") { c =>
      val toks = split(lower(col("text")), "\\s+")
      def score(words: String*) =
        size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
      val sEn = score("the", "a", "of", "and")
      val sEs = score("el", "la", "de", "y")
      val sDe = score("der", "die", "das", "und")
      val sFr = score("le", "les", "et", "une")
      c.documents.select(col("doc_id"), col("lang"),
          sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"), sFr.as("s_fr"))
        .withColumn("pred",
          when(greatest(col("s_en"), col("s_es"), col("s_de"),
            col("s_fr")) === 0, "und")
            .when(col("s_en") >= greatest(col("s_es"), col("s_de"),
              col("s_fr")), "en")
            .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .orderBy("doc_id")
    },

    // Mixed-language / code-switching detection — the SENTENCE-level
    // refinement of text_lang_id that corpus curation actually needs
    // (CCNet and fastText-based pipelines drop or split documents
    // whose sentences disagree on language; a doc-level vote hides
    // them). Same four pinned stopword votes and tie ladder as
    // text_lang_id, applied per sentence ENTIRELY inside array HOFs:
    // sentences = regex split on [.!?]+, per-sentence pred via
    // transform(+inner filter), switch count via index lambdas over
    // the pred array — zero explodes, zero joins, zero windows; one
    // projection pass over the corpus, embarrassingly parallel at any
    // scale. Output: per-doc sentence count, undetermined count,
    // distinct determined languages, adjacent determined-language
    // switches, and the is_mixed flag curation thresholds on.
    q("text_mixed_language",
      """WITH s AS (SELECT doc_id, lang,
        |    list_filter(string_split_regex(text, '[.!?]+'),
        |                x -> length(trim(x)) > 0) sents
        |  FROM documents),
        |v AS (SELECT doc_id, lang, len(sents)::BIGINT n_sent,
        |    list_transform(sents, x -> [
        |      len(list_filter(string_split_regex(lower(x), '\s+'),
        |          w -> w IN ('the', 'a', 'of', 'and'))),
        |      len(list_filter(string_split_regex(lower(x), '\s+'),
        |          w -> w IN ('el', 'la', 'de', 'y'))),
        |      len(list_filter(string_split_regex(lower(x), '\s+'),
        |          w -> w IN ('der', 'die', 'das', 'und'))),
        |      len(list_filter(string_split_regex(lower(x), '\s+'),
        |          w -> w IN ('le', 'les', 'et', 'une')))]) votes
        |  FROM s),
        |pr AS (SELECT doc_id, lang, n_sent,
        |    list_transform(votes, t -> CASE
        |      WHEN greatest(t[1], t[2], t[3], t[4]) = 0 THEN 'und'
        |      WHEN t[1] >= greatest(t[2], t[3], t[4]) THEN 'en'
        |      WHEN t[2] >= greatest(t[3], t[4]) THEN 'es'
        |      WHEN t[3] >= t[4] THEN 'de' ELSE 'fr' END) preds
        |  FROM v)
        |SELECT doc_id, lang, n_sent,
        |  len(list_filter(preds, p -> p = 'und'))::BIGINT AS n_und,
        |  len(list_distinct(list_filter(preds, p -> p <> 'und')))::BIGINT
        |    AS n_langs,
        |  len(list_filter(range(2, len(preds) + 1), i ->
        |    preds[i] <> 'und' AND preds[i-1] <> 'und'
        |    AND preds[i] <> preds[i-1]))::BIGINT AS n_switches,
        |  CASE WHEN len(list_distinct(list_filter(preds,
        |         p -> p <> 'und'))) >= 2 THEN 1 ELSE 0 END AS is_mixed
        |FROM pr ORDER BY doc_id""") { c =>
      val sents = filter(split(col("text"), "[.!?]+"),
        x => length(trim(x)) > 0)
      def vote(x: org.apache.spark.sql.Column, words: String*) =
        size(filter(split(lower(x), "\\s+"),
          t => t.isin(words.map(w => w: Any): _*)))
      def predOf(x: org.apache.spark.sql.Column) = {
        val se = vote(x, "the", "a", "of", "and")
        val ss = vote(x, "el", "la", "de", "y")
        val sd = vote(x, "der", "die", "das", "und")
        val sf = vote(x, "le", "les", "et", "une")
        when(greatest(se, ss, sd, sf) === 0, "und")
          .when(se >= greatest(ss, sd, sf), "en")
          .when(ss >= greatest(sd, sf), "es")
          .when(sd >= sf, "de").otherwise("fr")
      }
      val pr = c.documents.select(col("doc_id"), col("lang"),
        size(sents).cast("long").as("n_sent"),
        transform(sents, x => predOf(x)).as("preds"))
      val det = filter(col("preds"), p => p =!= "und")
      pr.select(col("doc_id"), col("lang"), col("n_sent"),
          size(filter(col("preds"), p => p === "und")).cast("long")
            .as("n_und"),
          size(array_distinct(det)).cast("long").as("n_langs"),
          when(size(col("preds")) < 2, lit(0L)).otherwise(
            size(filter(sequence(lit(2), size(col("preds"))), i =>
              element_at(col("preds"), i) =!= "und" &&
                element_at(col("preds"), i - 1) =!= "und" &&
                element_at(col("preds"), i) =!=
                  element_at(col("preds"), i - 1)))
              .cast("long")).as("n_switches"),
          (size(array_distinct(det)) >= 2).cast("int").as("is_mixed"))
        .orderBy("doc_id")
    },

    // Burrows' Delta stylometric distance (Burrows 2002; Evert et al.
    // 2017 for the z-score formulation) between language strata — the
    // standard authorship / register-drift measure a corpus audit runs
    // on function-word profiles: per stratum, rate-per-1000-tokens of
    // the 16 pinned marker words; z-score each word across strata;
    // Delta(a,b) = mean_w |z_w(a) - z_w(b)|. Determinism: occurrence
    // and token counts are exact BIGINTs, each rate is ONE division of
    // exact integers, and every cross-stratum reduction (mean, Sum r^2,
    // the per-pair |dz| sum) runs through the pinned-order sorted fold
    // (text_lm_ppl device); words with zero variance are excluded by a
    // filter on the EXACT variance numerator BEFORE sqrt (k*Srr - Sr^2
    // > 0 — also keeps DuckDB's sqrt off negative FP dust). Scale
    // shape: one corpus explode filtered to 16 marker words into a
    // (lang, word) hash aggregate; everything after is model-sized
    // (k languages x 16 words).
    q("text_burrows_delta",
      """WITH docs AS (SELECT lang,
        |    string_split_regex(lower(text), '\s+') toks FROM documents),
        |tot AS (SELECT lang, sum(len(toks))::BIGINT t
        |        FROM docs GROUP BY 1),
        |occ AS (SELECT lang, w, count(*)::BIGINT o
        |        FROM (SELECT lang, unnest(toks) w FROM docs)
        |        WHERE w IN ('the', 'a', 'of', 'and', 'el', 'la', 'de',
        |          'y', 'der', 'die', 'das', 'und', 'le', 'les', 'et',
        |          'une')
        |        GROUP BY 1, 2),
        |wl AS (SELECT unnest(['the', 'a', 'of', 'and', 'el', 'la',
        |          'de', 'y', 'der', 'die', 'das', 'und', 'le', 'les',
        |          'et', 'une']) w),
        |grid AS (SELECT tot.lang, wl.w,
        |           coalesce(occ.o, 0) * 1000.0 / tot.t r
        |         FROM tot CROSS JOIN wl
        |         LEFT JOIN occ ON occ.lang = tot.lang AND occ.w = wl.w),
        |st AS (SELECT w, count(*)::BIGINT k,
        |         list_reduce(list(r ORDER BY lang), (a, x) -> a + x) sr,
        |         list_reduce(list(r * r ORDER BY lang),
        |           (a, x) -> a + x) srr
        |       FROM grid GROUP BY 1),
        |st2 AS (SELECT w, k, sr / k m, k * srr - sr * sr vnum FROM st),
        |z AS (SELECT g.lang, g.w,
        |        (g.r - s.m) / sqrt(s.vnum / (s.k * s.k)) z
        |      FROM grid g JOIN st2 s ON g.w = s.w WHERE s.vnum > 0),
        |p AS (SELECT a.lang la, b.lang lb, a.w, abs(a.z - b.z) dz
        |      FROM z a JOIN z b ON a.w = b.w AND a.lang < b.lang)
        |SELECT la AS lang_a, lb AS lang_b, count(*)::BIGINT AS n_words,
        |  round(list_reduce(list(dz ORDER BY w), (a, x) -> a + x)
        |        / count(*) + 1e-9, 6) AS delta
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
      val markers = Seq("the", "a", "of", "and", "el", "la", "de", "y",
        "der", "die", "das", "und", "le", "les", "et", "une")
      val docs = c.documents.select(col("lang"),
        split(lower(col("text")), "\\s+").as("toks"))
      val tot = docs.groupBy("lang")
        .agg(sum(size(col("toks"))).cast("long").as("t"))
      val occ = docs.select(col("lang"), explode(col("toks")).as("w"))
        .filter(col("w").isin(markers.map(x => x: Any): _*))
        .groupBy("lang", "w").agg(count(lit(1)).as("o"))
      val grid = tot
        .withColumn("w", explode(typedLit(markers)))
        .join(occ, Seq("lang", "w"), "left")
        .select(col("lang"), col("w"),
          (coalesce(col("o"), lit(0L)) * 1000.0 / col("t")).as("r"))
      def foldBy(key: String, term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col(key),
            term.as("tm")))),
          lit(0.0), (acc, x) => acc + x.getField("tm"))
      val st = grid.groupBy("w").agg(count(lit(1)).as("k"),
          foldBy("lang", col("r")).as("sr"),
          foldBy("lang", col("r") * col("r")).as("srr"))
        .select(col("w"), col("k"), (col("sr") / col("k")).as("m"),
          (col("k") * col("srr") - col("sr") * col("sr")).as("vnum"))
      val z = grid.join(broadcast(st), Seq("w"))
        .filter(col("vnum") > 0)
        .select(col("lang"), col("w"),
          ((col("r") - col("m")) /
            sqrt(col("vnum") / (col("k") * col("k")))).as("z"))
      val p = z.as("a")
        .join(z.as("b"),
          col("a.w") === col("b.w") && col("a.lang") < col("b.lang"))
        .select(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
          col("a.w").as("w"), abs(col("a.z") - col("b.z")).as("dz"))
      p.groupBy("lang_a", "lang_b")
        .agg(count(lit(1)).as("n_words"),
          r6(foldBy("w", col("dz")) / count(lit(1))).as("delta"))
        .orderBy("lang_a", "lang_b")
    },

    // Stratified corpus sampling with EXACT Hamilton (largest-
    // remainder) apportionment — the quota step of every
    // cluster/language-balanced pretraining mix (D4 / SemDeDup-style
    // diversity sampling): allocate a K=100-doc budget across language
    // strata as base_i = floor(n_i*K/N) plus one extra for the largest
    // remainders (ties to lang order), then draw each stratum's quota
    // DETERMINISTICALLY (longest docs first, doc_id ties). Every
    // quantity is an exact integer — floor quotas, modular remainders,
    // rank cutoffs, sampled character sums — so the sample is
    // bit-reproducible, the property a training-mix manifest needs.
    // Scale shape: one corpus aggregation to k strata, k-row window
    // arithmetic, one lang-partitioned corpus window for the draw.
    q("llm_stratified_quota",
      """WITH st AS (SELECT lang, count(*)::BIGINT n_docs
        |            FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs)::BIGINT nt FROM st),
        |q0 AS (SELECT lang, n_docs, (n_docs * 100) // nt base,
        |         (n_docs * 100) % nt rem FROM st, t),
        |lo AS (SELECT 100 - sum(base)::BIGINT left_over FROM q0),
        |rk AS (SELECT lang, n_docs, base, rem,
        |         row_number() OVER (ORDER BY rem DESC, lang) rr
        |       FROM q0),
        |qf AS (SELECT lang, n_docs, base, rem,
        |         base + CASE WHEN rr <= (SELECT left_over FROM lo)
        |                     THEN 1 ELSE 0 END quota
        |       FROM rk),
        |samp AS (SELECT lang, doc_id, n_chars,
        |           row_number() OVER (PARTITION BY lang
        |             ORDER BY n_chars DESC, doc_id) rn
        |         FROM documents),
        |sel AS (SELECT s.lang, s.doc_id, s.n_chars
        |        FROM samp s JOIN qf ON s.lang = qf.lang
        |                           AND s.rn <= qf.quota),
        |ag AS (SELECT lang, count(*)::BIGINT n_sampled,
        |         min(doc_id)::BIGINT first_doc,
        |         sum(n_chars)::BIGINT sample_chars
        |       FROM sel GROUP BY 1)
        |SELECT qf.lang, qf.n_docs, qf.base::BIGINT AS quota_base,
        |  qf.rem::BIGINT AS remainder, qf.quota::BIGINT AS quota,
        |  coalesce(ag.n_sampled, 0)::BIGINT AS n_sampled,
        |  coalesce(ag.first_doc, 0)::BIGINT AS first_doc,
        |  coalesce(ag.sample_chars, 0)::BIGINT AS sample_chars
        |FROM qf LEFT JOIN ag ON qf.lang = ag.lang
        |ORDER BY qf.lang""") { c =>
      val st = c.documents.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
      val t = st.agg(sum(col("n_docs")).as("nt"))
      val q0 = st.crossJoin(broadcast(t))
        .select(col("lang"), col("n_docs"),
          expr("(n_docs * 100) div nt").as("base"),
          expr("(n_docs * 100) % nt").as("rem"))
      val lo = q0.agg((lit(100) - sum(col("base"))).as("left_over"))
      val qf = q0
        .withColumn("rr", row_number().over(
          Window.orderBy(col("rem").desc, col("lang"))).cast("long"))
        .crossJoin(broadcast(lo))
        .select(col("lang"), col("n_docs"), col("base"), col("rem"),
          (col("base") + when(col("rr") <= col("left_over"), 1L)
            .otherwise(0L)).as("quota"))
      val samp = c.documents
        .withColumn("rn", row_number().over(Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
        .select(col("lang"), col("doc_id"), col("n_chars"), col("rn"))
      val sel = samp.join(broadcast(qf.select(col("lang"),
          col("quota"))), Seq("lang"))
        .filter(col("rn") <= col("quota"))
      val ag = sel.groupBy("lang").agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_doc"),
        sum(col("n_chars")).as("sample_chars"))
      qf.join(ag, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"),
          col("base").as("quota_base"), col("rem").as("remainder"),
          col("quota"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("first_doc"), lit(0L)).as("first_doc"),
          coalesce(col("sample_chars"), lit(0L)).as("sample_chars"))
        .orderBy("lang")
    },

    // Repetition quality filters (Gopher / Rae et al. §A1.1 family):
    // duplicate-word occupancy and the most-frequent bi/trigram's
    // share of all n-gram slots — the standard "natural text vs
    // boilerplate/spam" pre-train screens. Shape: one explode per
    // n-gram family into a two-phase hash aggregate (count per
    // (doc, gram), then per-doc max/total) — partition-local expand,
    // standard shuffle-by-doc_id aggregation; no window, no collect.
    q("text_repetition",
      """WITH t AS (SELECT doc_id,
        |             string_split_regex(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |u AS (SELECT doc_id, unnest(ws) g FROM t),
        |uc AS (SELECT doc_id, g, count(*) c FROM u GROUP BY 1, 2),
        |uni AS (SELECT doc_id,
        |          sum(CASE WHEN c > 1 THEN c ELSE 0 END) dup_occ,
        |          sum(c) n_words FROM uc GROUP BY 1),
        |b AS (SELECT doc_id, len(ws) - 1 AS n_bi,
        |        unnest([ws[i] || ' ' || ws[i+1]
        |                for i in generate_series(1, len(ws) - 1)]) g FROM t),
        |bc AS (SELECT doc_id, n_bi, g, count(*) c FROM b GROUP BY 1, 2, 3),
        |bi AS (SELECT doc_id, n_bi, max(c) mx FROM bc GROUP BY 1, 2),
        |tr AS (SELECT doc_id, len(ws) - 2 AS n_tri,
        |        unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                for i in generate_series(1, len(ws) - 2)]) g FROM t),
        |tc AS (SELECT doc_id, n_tri, g, count(*) c FROM tr GROUP BY 1, 2, 3),
        |tri AS (SELECT doc_id, n_tri, max(c) mx FROM tc GROUP BY 1, 2)
        |SELECT uni.doc_id, n_words::BIGINT AS n_words,
        |       round(dup_occ::DOUBLE / n_words + 1e-9, 6) AS dup_word_frac,
        |       round(bi.mx::DOUBLE / bi.n_bi + 1e-9, 6) AS top_bigram_frac,
        |       round(tri.mx::DOUBLE / tri.n_tri + 1e-9, 6) AS top_trigram_frac
        |FROM uni
        |JOIN bi ON uni.doc_id = bi.doc_id
        |JOIN tri ON uni.doc_id = tri.doc_id
        |ORDER BY uni.doc_id""") { c =>
      // materialize the token array once (HOFs re-evaluate inlined
      // sub-expressions per lambda reference — see TextDedup note)
      val toks = c.documents
        .withColumn("ws", split(lower(trim(col("text"))), "\\s+"))
      def grams(n: Int) = transform(
        sequence(lit(0), size(col("ws")) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(col("ws"), i + j + 1)): _*))
      val uni = toks.select(col("doc_id"), explode(col("ws")).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(sum(when(col("count") > 1, col("count")).otherwise(lit(0L)))
            .as("dup_occ"),
          sum(col("count")).as("n_words"))
      def top(n: Int, name: String) = toks
        .withColumn("gs", grams(n))
        .select(col("doc_id"), size(col("gs")).as(s"n_$name"),
          explode(col("gs")).as("g"))
        .groupBy(col("doc_id"), col(s"n_$name"), col("g")).count()
        .groupBy("doc_id", s"n_$name")
        .agg(max(col("count")).as(s"max_$name"))
      uni.join(top(2, "bi"), "doc_id").join(top(3, "tri"), "doc_id")
        .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
          r6(col("dup_occ").cast("double") / col("n_words"))
            .as("dup_word_frac"),
          r6(col("max_bi").cast("double") / col("n_bi"))
            .as("top_bigram_frac"),
          r6(col("max_tri").cast("double") / col("n_tri"))
            .as("top_trigram_frac"))
        .orderBy("doc_id")
    },

    // Bigram language-model perplexity scoring (the CCNet/Gopher-style
    // "LM quality filter"): train an add-one-smoothed bigram model
    // over the corpus as DISTRIBUTED count aggregations (no driver
    // state, no collect — the model IS a DataFrame), then score each
    // document's mean negative log likelihood by equi-joining its
    // per-doc bigram counts back to the model. Scale shape: shuffles
    // are plain groupBys on (w1,w2)/(w1)/doc_id plus two equi-joins
    // AQE can re-plan (model side broadcast-able when small, shuffled
    // when the vocab is corpus-scale); the vocabulary size scalar is
    // the only broadcast. Determinism (r7 verdict prescription): a raw
    // FP sum of per-bigram NLL terms is shuffle-order-dependent, and
    // per-term integer rounding (the r5-r7 "micro-nats" device) puts
    // every term's ulp noise on a .5 boundary — one flipped term kills
    // the hash. Instead the per-doc summation ORDER is pinned on both
    // engines: collect the (w1, w2, nll) terms, sort by the unique
    // (w1, w2) key, and left-fold the doubles in that order (Spark
    // `aggregate(array_sort(collect_list(...)))` vs DuckDB
    // `list_reduce(list(... ORDER BY w1, w2))`). Cross-engine drift is
    // then only ln()'s ≤1-ulp spread (~1e-15/term), and rounding
    // happens ONCE per output row at 4 dp — boundary-collision moves
    // from per-term to per-row and from 1e-9 grain to 5e-5. The score
    // column is ln-perplexity (mean NLL in nats — the standard CCNet
    // filter statistic); ppl is derived by exp() of the ALREADY
    // ROUNDED ln_ppl so both engines exponentiate identical inputs.
    q("text_lm_ppl",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT doc_id, unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                for i in generate_series(1, len(ts) - 1)], recursive := true)
        |       FROM tok WHERE len(ts) >= 2),
        |bgc AS (SELECT w1, w2, count(*) c FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) cw FROM bg GROUP BY 1),
        |voc AS (SELECT count(DISTINCT w) v
        |        FROM (SELECT unnest(ts) w FROM tok)),
        |db AS (SELECT doc_id, w1, w2, count(*) cnt FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT d.doc_id, sum(d.cnt)::BIGINT nb,
        |              list_reduce(
        |                list(d.cnt * -ln((bgc.c + 1.0) / (ctx.cw + voc.v))
        |                     ORDER BY d.w1, d.w2),
        |                (a, x) -> a + x) snll
        |       FROM db d
        |       JOIN bgc ON d.w1 = bgc.w1 AND d.w2 = bgc.w2
        |       JOIN ctx ON d.w1 = ctx.w1
        |       CROSS JOIN voc
        |       GROUP BY 1)
        |SELECT doc_id, nb AS n_bigrams,
        |       round(snll / nb + 1e-9, 4) AS ln_ppl,
        |       round(exp(round(snll / nb + 1e-9, 4)) + 1e-9, 2) AS ppl
        |FROM sc ORDER BY doc_id""") { c =>
      val toks = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val bg = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val ctx = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
      val voc = toks.select(explode(col("ts")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      val db = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cnt"))
      val nll = col("cnt").cast("double") *
        -log((col("c") + 1.0) / (col("cw") + col("v")))
      val lnPpl = r4(col("snll") / col("n_bigrams"))
      db.join(bgc, Seq("w1", "w2"))
        .join(ctx, Seq("w1"))
        .crossJoin(broadcast(voc))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_bigrams"),
          aggregate(
            array_sort(collect_list(struct(col("w1"), col("w2"),
              nll.as("nll")))),
            lit(0.0), (a, x) => a + x.getField("nll")).as("snll"))
        .select(col("doc_id"), col("n_bigrams"),
          lnPpl.as("ln_ppl"), r2(exp(lnPpl)).as("ppl"))
        .orderBy("doc_id")
    },

    // CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): per
    // LANGUAGE, split the corpus into equal head/middle/tail thirds by
    // LM perplexity — the curation step CCNet/RedPajama run to keep
    // "head" (fluent) text and down-weight the tail. Buckets come from
    // ntile(3) over a DETERMINISTIC total order (ln_ppl rounded to the
    // established bit-reproducible grain, doc_id tiebreak), so both
    // engines assign identical thirds — no FP threshold can flip a
    // boundary doc. Per-language window partitions; the ppl model is
    // the same pinned-order bigram fold as text_lm_ppl.
    q("llm_ccnet_buckets",
      """WITH tok AS (SELECT doc_id, lang, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT doc_id, unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                for i in generate_series(1, len(ts) - 1)], recursive := true)
        |       FROM tok WHERE len(ts) >= 2),
        |bgc AS (SELECT w1, w2, count(*) c FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) cw FROM bg GROUP BY 1),
        |voc AS (SELECT count(DISTINCT w) v
        |        FROM (SELECT unnest(ts) w FROM tok)),
        |db AS (SELECT doc_id, w1, w2, count(*) cnt FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT d.doc_id, sum(d.cnt)::BIGINT nb,
        |              list_reduce(
        |                list(d.cnt * -ln((bgc.c + 1.0) / (ctx.cw + voc.v))
        |                     ORDER BY d.w1, d.w2),
        |                (a, x) -> a + x) snll
        |       FROM db d
        |       JOIN bgc ON d.w1 = bgc.w1 AND d.w2 = bgc.w2
        |       JOIN ctx ON d.w1 = ctx.w1
        |       CROSS JOIN voc
        |       GROUP BY 1),
        |r AS (SELECT t.doc_id, t.lang,
        |        round(sc.snll / sc.nb + 1e-9, 4) AS ln_ppl
        |      FROM sc JOIN tok t ON sc.doc_id = t.doc_id),
        |b AS (SELECT doc_id, lang, ln_ppl,
        |        ntile(3) OVER (PARTITION BY lang
        |                       ORDER BY ln_ppl, doc_id) nt
        |      FROM r)
        |SELECT doc_id, lang, ln_ppl,
        |       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |               ELSE 'tail' END AS bucket
        |FROM b ORDER BY doc_id""") { c =>
      val toks = c.documents.select(col("doc_id"), col("lang"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val bg = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val ctx = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
      val voc = toks.select(explode(col("ts")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      val db = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cnt"))
      val nll = col("cnt").cast("double") *
        -log((col("c") + 1.0) / (col("cw") + col("v")))
      val ppl = db.join(bgc, Seq("w1", "w2"))
        .join(ctx, Seq("w1"))
        .crossJoin(broadcast(voc))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("nb"),
          aggregate(
            array_sort(collect_list(struct(col("w1"), col("w2"),
              nll.as("nll")))),
            lit(0.0), (a, x) => a + x.getField("nll")).as("snll"))
        .select(col("doc_id"), r4(col("snll") / col("nb")).as("ln_ppl"))
      val w = Window.partitionBy("lang").orderBy("ln_ppl", "doc_id")
      toks.select("doc_id", "lang").join(ppl, "doc_id")
        .withColumn("nt", ntile(3).over(w))
        .select(col("doc_id"), col("lang"), col("ln_ppl"),
          when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    },

    // TF-IDF top terms per document — the classic distinctive-term
    // extraction. tf/df are integer counts; tfidf is ROUNDED BEFORE
    // ranking so the (tfidf DESC, term ASC) order is identical on
    // both engines even when mathematically-equal scores arrive via
    // different ln() last-ulp paths. Shape: explode → two hash
    // aggregations → equi-join to the df model → per-doc top-3 window
    // over doc_id partitions (never a global sort).
    q("text_tfidf_top",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |tf AS (SELECT doc_id, w AS term, count(*) tf
        |       FROM (SELECT doc_id, unnest(ts) w FROM tok) GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) nd FROM tf),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |              round(tf.tf * ln(nd.nd::DOUBLE / dfq.df) + 1e-9, 4) tfidf
        |       FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY tfidf DESC, term) rnk FROM sc)
        |SELECT doc_id, rnk, term, tfidf, tf, df
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""") { c =>
      val toks = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val tf = toks.select(col("doc_id"), explode(col("ts")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nd = tf.agg(countDistinct(col("doc_id")).as("nd"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      tf.join(dfq, "term")
        .crossJoin(broadcast(nd))
        .withColumn("tfidf",
          r4(col("tf").cast("double") *
            log(col("nd").cast("double") / col("df"))))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"),
          col("tf"), col("df"))
        .orderBy("doc_id", "rnk")
    },

    // Benchmark decontamination (the GPT-3/Llama pre-train step):
    // flag corpus documents sharing any word 4-gram with a held-out
    // eval set (here the deterministic doc_id%50 subset). Scale shape:
    // the benchmark gram set is tiny relative to the corpus, so the
    // collision join is a broadcast-able equi-join on the gram string;
    // the corpus side is explode → join → groupBy(doc) — no all-pairs
    // doc×doc comparison ever happens.
    q("llm_decontaminate",
      """WITH t AS (SELECT doc_id,
        |             string_split_regex(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |g AS (SELECT doc_id, unnest([list_aggregate(ws[i:i+3], 'string_agg', ' ')
        |        for i in generate_series(1, len(ws) - 3)]) gram
        |      FROM t WHERE len(ws) >= 4),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |hits AS (SELECT g.doc_id, count(DISTINCT g.gram) n_hit_grams
        |         FROM g JOIN bench USING (gram)
        |         WHERE g.doc_id % 50 != 0 GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(h.n_hit_grams, 0)::BIGINT AS n_hit_grams,
        |       h.n_hit_grams IS NOT NULL AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""") { c =>
      val toks = c.documents
        .withColumn("ws", split(lower(trim(col("text"))), "\\s+"))
      val grams = toks.filter(size(col("ws")) >= 4)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("ws")) - 4),
          i => concat_ws(" ",
            (0 until 4).map(j => element_at(col("ws"), i + j + 1)): _*)))
          .as("gram"))
      val bench = grams.filter(col("doc_id") % 50 === 0)
        .select("gram").distinct()
      val hits = grams.filter(col("doc_id") % 50 =!= 0)
        .join(bench, "gram")
        .groupBy("doc_id")
        .agg(countDistinct(col("gram")).as("n_hit_grams"))
      c.documents.filter(col("doc_id") % 50 =!= 0).select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
          col("n_hit_grams").isNotNull.as("contaminated"))
        .orderBy("doc_id")
    },

    // Composite Gopher quality GATE (Rae et al. 2021 App. A1.1) — the
    // canonical named document filter applied as ONE keep/drop
    // decision with a first-fail reason, the form a curation pipeline
    // actually consumes (the per-signal profiles live in text_stats /
    // text_repetition). Document-level rules only — the line-level
    // bullet/ellipsis rules are degenerate on this single-line corpus.
    // Every ratio is rounded BEFORE its threshold compare on both
    // engines (the boolean-from-FP rule), so no borderline doc can
    // flip per engine. Pure per-row map — zero shuffles, whole-stage
    // codegen at 100 TB. The RULE STRUCTURE is Gopher's; the absolute
    // constants are calibration parameters every deployment retunes —
    // here set to the synthetic corpus (min length 30; "stopwords" =
    // the corpus's own function words) so the gate actually
    // discriminates instead of dropping all 500 docs on English
    // constants this vocabulary cannot satisfy.
    q("llm_gopher_gate",
      """WITH d AS (SELECT doc_id, lower(trim(text)) t FROM documents),
        |w AS (SELECT doc_id, t, string_split_regex(t, '\s+') ws FROM d),
        |m AS (SELECT doc_id,
        |        len(ws)::BIGINT n_words,
        |        round(length(regexp_replace(t, '\s', '', 'g'))::DOUBLE
        |              / len(ws) + 1e-9, 4) mean_wlen,
        |        round((length(t) - length(replace(t, '#', ''))
        |               + len(regexp_extract_all(t, '\.\.\.')))::DOUBLE
        |              / len(ws) + 1e-9, 4) sym_ratio,
        |        round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))::DOUBLE
        |              / len(ws) + 1e-9, 4) alpha_word_ratio,
        |        len(list_intersect(list_distinct(ws),
        |            ['join','hash','row','batch','scan','column','filter','table']))::BIGINT n_stop
        |      FROM w)
        |SELECT doc_id, n_words, mean_wlen, sym_ratio, alpha_word_ratio,
        |       n_stop,
        |       CASE WHEN n_words < 30 OR n_words > 100000 THEN 'word_count'
        |            WHEN mean_wlen < 3 OR mean_wlen > 10 THEN 'mean_word_len'
        |            WHEN sym_ratio >= 0.1 THEN 'symbol_ratio'
        |            WHEN alpha_word_ratio <= 0.8 THEN 'alpha_words'
        |            WHEN n_stop < 2 THEN 'stopwords'
        |            ELSE 'ok' END AS gate,
        |       (n_words BETWEEN 30 AND 100000) AND mean_wlen BETWEEN 3 AND 10
        |         AND sym_ratio < 0.1 AND alpha_word_ratio > 0.8
        |         AND n_stop >= 2 AS keep
        |FROM m ORDER BY doc_id""") { c =>
      val t = lower(trim(col("text")))
      val d = c.documents.select(col("doc_id"), t.as("t"),
        split(t, "\\s+").as("ws"))
      val nWords = size(col("ws")).cast("long")
      val m = d.select(col("doc_id"),
        nWords.as("n_words"),
        r4(length(regexp_replace(col("t"), "\\s", ""))
          .cast("double") / nWords).as("mean_wlen"),
        r4((length(col("t")) -
            length(regexp_replace(col("t"), "#", "")) +
            regexp_count(col("t"), lit("\\.\\.\\."))).cast("double") /
          nWords).as("sym_ratio"),
        r4(size(filter(col("ws"), x => x.rlike("[a-z]")))
          .cast("double") / nWords).as("alpha_word_ratio"),
        size(array_intersect(array_distinct(col("ws")),
          array(Seq("join", "hash", "row", "batch", "scan", "column",
            "filter", "table").map(lit): _*))).cast("long").as("n_stop"))
      m.select(col("doc_id"), col("n_words"), col("mean_wlen"),
          col("sym_ratio"), col("alpha_word_ratio"), col("n_stop"),
          when(col("n_words") < 30 || col("n_words") > 100000,
            "word_count")
            .when(col("mean_wlen") < 3 || col("mean_wlen") > 10,
              "mean_word_len")
            .when(col("sym_ratio") >= 0.1, "symbol_ratio")
            .when(col("alpha_word_ratio") <= 0.8, "alpha_words")
            .when(col("n_stop") < 2, "stopwords")
            .otherwise("ok").as("gate"),
          (col("n_words").between(30, 100000) &&
            col("mean_wlen").between(3, 10) &&
            col("sym_ratio") < 0.1 && col("alpha_word_ratio") > 0.8 &&
            col("n_stop") >= 2).as("keep"))
        .orderBy("doc_id")
    },

    // Inverted-index build (the Lucene-shape search artifact the BM25/
    // RRF retrievers would serve from): per term, document frequency,
    // total term frequency, and the sorted posting list — reported for
    // the top-25 terms by (df, term). Postings serialize as a sorted
    // comma-joined string (the agg_collect convention — the driver's
    // hash compare cannot hash array cells). Scale shape: explode →
    // one (term, doc) aggregation → one term aggregation; the posting
    // LIST is only materialized for the 25 reported terms (semi-join
    // on the top-k term set), never for the whole vocabulary.
    q("text_inverted_index",
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) w
        |  FROM documents),
        |td AS (SELECT w, doc_id, count(*)::BIGINT tf
        |       FROM tok GROUP BY 1, 2),
        |t AS (SELECT w, count(*)::BIGINT df, sum(tf)::BIGINT ctf
        |      FROM td GROUP BY 1),
        |top AS (SELECT w, df, ctf, row_number() OVER (
        |          ORDER BY df DESC, w) rn
        |        FROM t),
        |sel AS (SELECT * FROM top WHERE rn <= 25)
        |SELECT sel.rn, sel.w AS term, sel.df, sel.ctf,
        |       array_to_string(list_sort(list(td.doc_id)), ',')
        |         AS postings
        |FROM sel JOIN td ON sel.w = td.w
        |GROUP BY 1, 2, 3, 4 ORDER BY rn""") { c =>
      val tok = c.documents.select(col("doc_id"), explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      val td = tok.groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
      val t = td.groupBy("w")
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"))
      // top-25 via TakeOrdered; the 25-row rank window is model-sized
      val sel = t.orderBy(col("df").desc, col("w")).limit(25)
        .withColumn("rn", row_number().over(Window.partitionBy()
          .orderBy(col("df").desc, col("w"))))
      sel.join(td, Seq("w"))
        .groupBy("rn", "w", "df", "ctf")
        .agg(array_join(array_sort(collect_list(col("doc_id"))), ",")
          .as("postings"))
        .select(col("rn"), col("w").as("term"), col("df"), col("ctf"),
          col("postings"))
        .orderBy("rn")
    },

    // PPMI co-occurrence association (Church & Hanks 1990; the
    // count-based precursor of word embeddings — Levy & Goldberg 2014
    // showed SGNS factorizes exactly this matrix): token pairs
    // co-occurring within a ±2 window over the whole corpus,
    // PPMI = max(0, ln(c_xy·D/(c_x·c_y))), computed per PAIR from
    // exact integer counts (the fe_mutual_info stance — the ln sees a
    // ratio of exact integers, rounded once) and reported for the
    // top-20 pairs by (count, pair). Scale shape: windowed pairs via
    // a bounded self-join on (doc, position±k) — two narrow exploded
    // streams, an equi-join on doc + a ≤2k position band, then hash
    // aggregations; no corpus-side cross product.
    q("text_ppmi",
      """WITH tok AS (SELECT doc_id, ts FROM (
        |    SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') ts
        |    FROM documents) WHERE len(ts) >= 2),
        |w AS (SELECT doc_id, unnest(ts) tok,
        |             unnest(generate_series(1, len(ts))) pos FROM tok),
        |pairs AS (SELECT a.tok wa, b.tok wb, count(*)::BIGINT cab
        |          FROM w a JOIN w b ON a.doc_id = b.doc_id
        |            AND b.pos > a.pos AND b.pos <= a.pos + 2
        |          GROUP BY 1, 2),
        |tot AS (SELECT sum(cab)::BIGINT d FROM pairs),
        |ca AS (SELECT wa, sum(cab)::BIGINT cx FROM pairs GROUP BY 1),
        |cb AS (SELECT wb, sum(cab)::BIGINT cy FROM pairs GROUP BY 1),
        |sc AS (SELECT p.wa, p.wb, p.cab,
        |         round(greatest(0.0,
        |           ln(p.cab::DOUBLE * t.d / (ca.cx::DOUBLE * cb.cy)))
        |           + 1e-9, 6) ppmi
        |       FROM pairs p JOIN ca USING (wa) JOIN cb USING (wb)
        |       CROSS JOIN tot t),
        |rk AS (SELECT *, row_number() OVER (
        |         ORDER BY cab DESC, wa, wb) rn FROM sc)
        |SELECT rn, wa, wb, cab, ppmi FROM rk WHERE rn <= 20
        |ORDER BY rn""") { c =>
      val tok = c.documents
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ts"))
        .filter(size(col("ts")) >= 2)
      val w = tok.select(col("doc_id"),
        posexplode(col("ts")).as(Seq("pos0", "tok")))
        .select(col("doc_id"), col("tok"), (col("pos0") + 1).as("pos"))
      val pairs = w.as("a").join(w.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.pos") > col("a.pos") &&
            col("b.pos") <= col("a.pos") + 2)
        .groupBy(col("a.tok").as("wa"), col("b.tok").as("wb"))
        .agg(count(lit(1)).as("cab"))
      val tot = pairs.agg(sum(col("cab")).as("d"))
      val ca = pairs.groupBy("wa").agg(sum(col("cab")).as("cx"))
      val cb = pairs.groupBy("wb").agg(sum(col("cab")).as("cy"))
      val sc = pairs.join(ca, Seq("wa")).join(cb, Seq("wb"))
        .crossJoin(broadcast(tot))
        .select(col("wa"), col("wb"), col("cab"),
          r6(greatest(lit(0.0),
            log(col("cab").cast("double") * col("d") /
              (col("cx").cast("double") * col("cy"))))).as("ppmi"))
      // top-20 of the corpus-wide pair list: TakeOrdered, not a window
      sc.orderBy(col("cab").desc, col("wa"), col("wb")).limit(20)
        .withColumn("rn", row_number().over(Window.partitionBy()
          .orderBy(col("cab").desc, col("wa"), col("wb"))))
        .select(col("rn"), col("wa"), col("wb"), col("cab"), col("ppmi"))
        .orderBy("rn")
    },

    // RAKE keyword extraction (Rose et al. 2010 — the classic
    // unsupervised keyphrase extractor): candidate phrases are the
    // maximal word runs between stopwords/punctuation; each word
    // scores deg/freq (deg = Σ phrase-length over its occurrences,
    // freq = occurrence count — both per-doc integers); a phrase
    // scores the sum of its words' scores. Word scores quantize to
    // integer micro-units BEFORE the phrase sum (the NDCG pattern),
    // so ranking is exact; top-3 phrases per doc by (score, phrase).
    // Stopwords = the corpus's own function words (the gopher-gate
    // stance). Two Generates + two hash aggregations per doc — no
    // shuffle beyond the doc grouping.
    q("text_rake",
      """WITH d AS (SELECT doc_id,
        |    regexp_replace(lower(text),
        |      '\b(join|hash|row|batch|scan|column|filter|table)\b',
        |      '#', 'g') t
        |  FROM documents WHERE doc_id < 40),
        |ph AS (SELECT doc_id, trim(p) phrase
        |       FROM (SELECT doc_id, unnest(string_split_regex(t,
        |               '[^a-z ]+')) p FROM d)
        |       WHERE trim(p) <> ''),
        |pw AS (SELECT doc_id, phrase,
        |         list_filter(string_split_regex(trim(phrase), ' +'),
        |                     w -> w <> '') ws
        |       FROM ph),
        |wo AS (SELECT doc_id, phrase, len(ws) plen, unnest(ws) w
        |       FROM pw),
        |ws AS (SELECT doc_id, w, count(*)::BIGINT freq,
        |         sum(plen)::BIGINT deg FROM wo GROUP BY 1, 2),
        |psc AS (SELECT wo.doc_id, wo.phrase,
        |          sum(CAST(round(ws.deg * 1e6 / ws.freq + 1e-9) AS BIGINT))
        |            su
        |        FROM wo JOIN ws ON wo.doc_id = ws.doc_id AND wo.w = ws.w
        |        GROUP BY 1, 2),
        |rk AS (SELECT doc_id, phrase, su,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY su DESC, phrase) rn
        |       FROM psc)
        |SELECT doc_id, rn, phrase, round(su / 1e6 + 1e-9, 4) AS score
        |FROM rk WHERE rn <= 3 ORDER BY doc_id, rn""") { c =>
      val d = c.documents.filter(col("doc_id") < 40)
        .select(col("doc_id"), regexp_replace(lower(col("text")),
          "\\b(join|hash|row|batch|scan|column|filter|table)\\b", "#")
          .as("t"))
      val ph = d.select(col("doc_id"),
          explode(split(col("t"), "[^a-z ]+")).as("p"))
        .select(col("doc_id"), trim(col("p")).as("phrase"))
        .filter(col("phrase") =!= "")
      val pw = ph.select(col("doc_id"), col("phrase"),
        filter(split(trim(col("phrase")), " +"), w => w =!= "").as("ws"))
      val wo = pw.select(col("doc_id"), col("phrase"),
          size(col("ws")).as("plen"), explode(col("ws")).as("w"))
      val wscore = wo.groupBy("doc_id", "w")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      val psc = wo.join(wscore, Seq("doc_id", "w"))
        .groupBy("doc_id", "phrase")
        .agg(sum(round(col("deg") * lit(1e6) / col("freq") + lit(1e-9))
          .cast("long")).as("su"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("su").desc, col("phrase"))
      psc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("phrase"),
          r4(col("su") / lit(1e6)).as("score"))
        .orderBy("doc_id", "rn")
    },

    // FUZZY decontamination — the MinHash cross-corpus pass real
    // scrubs run NEXT TO exact n-gram matching (llm_decontaminate):
    // lightly-edited eval leakage defeats exact 4-grams but not
    // word-shingle Jaccard at 0.8. Train (doc_id%10!=0) vs eval
    // (doc_id%10==0) through the BIPARTITE LSH join
    // (ops/TextDedup.minhashCrossPairs — band-key equi-join across
    // the split, exact verify for candidates only; at 100 TB the eval
    // side is broadcast-sized). The oracle is brute-force cross-pairs
    // Jaccard (sf0.01-gate tractable only).
    q("llm_decontaminate_fuzzy",
      """WITH d AS (SELECT doc_id, lower(trim(text)) t FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(t, '\s+') toks FROM d),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) ws
        |       FROM tok),
        |p AS (SELECT a.doc_id train_id, b.doc_id eval_id,
        |        len(list_intersect(a.ws, b.ws))::DOUBLE
        |          / len(list_distinct(a.ws || b.ws)) jac
        |      FROM sh a JOIN sh b
        |        ON a.doc_id % 10 != 0 AND b.doc_id % 10 = 0)
        |SELECT train_id, eval_id, round(jac + 1e-9, 6) AS jac
        |FROM p WHERE jac >= 0.8 ORDER BY train_id, eval_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val train = c.documents.filter(col("doc_id") % 10 =!= 0)
      val evals = c.documents.filter(col("doc_id") % 10 === 0)
      graft.ops.TextDedup.minhashCrossPairs(train, evals, "doc_id",
          "text", shingleN = 3, k = 32, bands = 16, threshold = 0.8,
          native = true)
        .select(col("a_id").as("train_id"), col("b_id").as("eval_id"),
          r6(col("wjac")).as("jac"))
        .orderBy("train_id", "eval_id")
    },

    // Deterministic stratified corpus mixing: per-language quotas
    // (40% of each stratum, ceiling) picked by md5(doc_id) rank — the
    // training-mix sampler. Hash-ordered row_number inside each
    // stratum partition; no global sort, no RNG, identical sample on
    // any cluster size or engine.
    q("llm_corpus_mix",
      """WITH r AS (SELECT doc_id, lang,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY md5(doc_id::VARCHAR), doc_id) rk,
        |             count(*) OVER (PARTITION BY lang) cnt
        |           FROM documents)
        |SELECT doc_id, lang, rk
        |FROM r WHERE rk <= ceil(0.4 * cnt) ORDER BY doc_id""") { c =>
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val wc = Window.partitionBy("lang")
      c.documents.select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rk") <= ceil(lit(0.4) * col("cnt")))
        .select("doc_id", "lang", "rk")
        .orderBy("doc_id")
    },

    // Greedy sequence packing (concat-and-chunk): lay the corpus out as
    // one token stream in doc_id order and cut fixed 2048-token training
    // windows; each doc gets its stream offset, window id, in-window
    // offset, and a crosses-the-boundary flag. The oracle's global
    // window sum is exactly what the Spark side must NOT do at scale —
    // Packing delegates to Positional's bucketed distributed prefix sum
    // (range buckets + per-bucket window + broadcast offsets).
    q("llm_pack_sequences",
      """WITH t AS (SELECT doc_id,
        |             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
        |      FROM t)
        |SELECT doc_id, n_tokens, tok_start,
        |       tok_start // 2048 AS seq_id,
        |       tok_start % 2048 AS seq_offset,
        |       tok_start + n_tokens > (tok_start // 2048 + 1) * 2048 AS spans_boundary
        |FROM c ORDER BY doc_id""") { c =>
      val toks = size(split(trim(col("text")), "\\s+")).cast("long")
      graft.ops.Packing.packSequences(
          c.documents.select(col("doc_id"), toks.as("n_tokens")),
          col("doc_id"), col("n_tokens"), 2048)
        .orderBy("doc_id")
    },

    // DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    // score every document by the log-likelihood ratio of its hashed
    // word-bigram features under a TARGET distribution (here lang='en'
    // docs) vs the RAW corpus distribution, then keep importance-
    // positive docs. The feature space is 256 hash buckets (md5-prefix,
    // identical arithmetic on both engines); both n-gram models are
    // 256-row aggregates that BROADCAST to the per-doc scoring join —
    // at 100 TB the corpus is touched twice (model fit, scoring), both
    // passes embarrassingly parallel. Determinism: same convention as
    // text_lm_ppl (r7 verdict) — the per-doc sum of ln-ratio terms is
    // left-folded in bucket order on BOTH engines (bucket id is unique
    // per doc), rounded ONCE per output row; `selected` compares the
    // already-rounded avg_logratio so the boolean can never flip on
    // sub-grain FP noise.
    q("llm_dsir_select",
      """WITH tok AS (SELECT doc_id, lang,
        |               regexp_extract_all(text, '[a-z]+') ts FROM documents),
        |g AS (SELECT doc_id, lang,
        |        unnest([ts[i] || ' ' || ts[i+1]
        |                for i in generate_series(1, len(ts) - 1)]) g
        |      FROM tok WHERE len(ts) >= 2),
        |gb AS (SELECT doc_id, lang,
        |         ('0x' || substr(md5(g), 1, 4))::BIGINT % 256 AS b FROM g),
        |tgt AS (SELECT b, count(*) ct FROM gb WHERE lang = 'en' GROUP BY b),
        |raw AS (SELECT b, count(*) cr FROM gb GROUP BY b),
        |nt AS (SELECT sum(ct)::BIGINT n FROM tgt),
        |nr AS (SELECT sum(cr)::BIGINT n FROM raw),
        |docb AS (SELECT doc_id, b, count(*) cnt FROM gb GROUP BY 1, 2),
        |sc AS (SELECT d.doc_id, sum(d.cnt)::BIGINT n_grams,
        |         list_reduce(
        |           list(d.cnt * ln(((coalesce(t.ct, 0) + 1.0) / (nt.n + 256))
        |                           / ((r.cr + 1.0) / (nr.n + 256)))
        |                ORDER BY d.b),
        |           (a, x) -> a + x) llr
        |       FROM docb d JOIN raw r USING (b) LEFT JOIN tgt t USING (b)
        |       CROSS JOIN nt CROSS JOIN nr GROUP BY 1)
        |SELECT doc_id, n_grams, round(llr + 1e-9, 4) AS llr,
        |       round(llr / n_grams + 1e-9, 4) AS avg_logratio,
        |       (round(llr / n_grams + 1e-9, 4) > 0) AS selected
        |FROM sc ORDER BY doc_id""") { c =>
      val toks = c.documents.select(col("doc_id"), col("lang"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val grams = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> concat(ts[i], ' ', ts[i + 1]))")).as("g"))
      val gb = grams.withColumn("b",
        conv(substring(md5(col("g")), 1, 4), 16, 10).cast("long") % 256)
      val tgt = gb.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val raw = gb.groupBy("b").agg(count(lit(1)).as("cr"))
      val nt = tgt.agg(sum(col("ct")).as("nt"))
      val nr = raw.agg(sum(col("cr")).as("nr"))
      val docb = gb.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      val score = col("cnt").cast("double") *
        log(((coalesce(col("ct"), lit(0L)) + 1.0) /
          (col("nt") + 256)) / ((col("cr") + 1.0) / (col("nr") + 256)))
      val avgLr = r4(col("w") / col("n_grams"))
      docb.join(broadcast(raw), Seq("b"))
        .join(broadcast(tgt), Seq("b"), "left")
        .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_grams"),
          aggregate(array_sort(collect_list(struct(col("b"),
              score.as("lr")))),
            lit(0.0), (a, x) => a + x.getField("lr")).as("w"))
        .select(col("doc_id"), col("n_grams"), r4(col("w")).as("llr"),
          avgLr.as("avg_logratio"), (avgLr > 0).as("selected"))
        .orderBy("doc_id")
    },

    // Weighted sampling without replacement (Efraimidis & Spirakis
    // 2006): each doc draws a deterministic hash-uniform u and keys on
    // ln(u)/w (order-equivalent to u^(1/w)); the global top-k by key IS
    // an exact weighted sample. Keys are rounded to integer micro-units
    // with a doc_id tiebreak so both engines rank identically, and the
    // top-k runs as Spark's TakeOrdered — per-partition heaps merged on
    // the driver, the textbook distributed-reservoir shape (no global
    // sort, no single-partition window).
    q("llm_weighted_sample",
      """WITH c AS (SELECT doc_id, n_chars::DOUBLE w,
        |             (('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
        |              + 1.0) / 281474976710657.0 AS u
        |           FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, CAST(w AS BIGINT) n_chars,
        |        CAST(round(ln(u) / w * 1e6 + 1e-9) AS BIGINT) key_micro
        |      FROM c)
        |SELECT doc_id, n_chars, key_micro
        |FROM k ORDER BY key_micro DESC, doc_id LIMIT 50""") { c =>
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 12),
        16, 10).cast("double") + 1.0) / 281474976710657.0
      c.documents.filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          round(log(u) / col("n_chars").cast("double") * lit(1e6) +
            lit(1e-9)).cast("long").as("key_micro"))
        .orderBy(col("key_micro").desc, col("doc_id"))
        .limit(50)
    },

    // BPE tokenizer-vocabulary induction (Sennrich et al.), 3 pinned
    // merge rounds — the distributed shape real BPE trainers use: the
    // corpus collapses to a WORD-FREQUENCY table once (the only
    // corpus-sized aggregation), then each round is (adjacent-pair count
    // weighted by freq → global argmax → merge) over that table. The
    // argmax is a 1-row aggregate collect (a scalar, like a vocab
    // size); the merge applies the pair via sentinel-delimited string
    // replace — left-to-right non-overlapping `replace` on " a b " is
    // EXACTLY greedy BPE merging, identically on both engines. The
    // oracle unrolls the 3 rounds as chained CTEs (s0→m1→s1→m2→s2→m3).
    q("text_bpe_merges",
      """WITH w AS (SELECT wd, count(*) freq FROM
        |             (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) wd
        |              FROM documents)
        |           WHERE length(wd) > 0 GROUP BY 1),
        |s0 AS (SELECT freq, ' ' || list_aggregate(
        |         [wd[i] for i in generate_series(1, length(wd))],
        |         'string_agg', ' ') || ' ' s FROM w),
        |p1 AS (SELECT a, b, sum(freq)::BIGINT cnt FROM (
        |         SELECT freq, unnest([{'a': ts[i], 'b': ts[i+1]}
        |             for i in generate_series(1, len(ts)-1)], recursive := true)
        |         FROM (SELECT freq, string_split(trim(s), ' ') ts FROM s0))
        |       GROUP BY 1, 2),
        |m1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
        |s1 AS (SELECT freq, replace(s, ' ' || m1.a || ' ' || m1.b || ' ',
        |                            ' ' || m1.a || m1.b || ' ') s FROM s0, m1),
        |p2 AS (SELECT a, b, sum(freq)::BIGINT cnt FROM (
        |         SELECT freq, unnest([{'a': ts[i], 'b': ts[i+1]}
        |             for i in generate_series(1, len(ts)-1)], recursive := true)
        |         FROM (SELECT freq, string_split(trim(s), ' ') ts FROM s1))
        |       GROUP BY 1, 2),
        |m2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
        |s2 AS (SELECT freq, replace(s, ' ' || m2.a || ' ' || m2.b || ' ',
        |                            ' ' || m2.a || m2.b || ' ') s FROM s1, m2),
        |p3 AS (SELECT a, b, sum(freq)::BIGINT cnt FROM (
        |         SELECT freq, unnest([{'a': ts[i], 'b': ts[i+1]}
        |             for i in generate_series(1, len(ts)-1)], recursive := true)
        |         FROM (SELECT freq, string_split(trim(s), ' ') ts FROM s2))
        |       GROUP BY 1, 2),
        |m3 AS (SELECT a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1)
        |SELECT 1 AS merge_step, a AS pair_a, b AS pair_b, a || b AS merged, cnt FROM m1
        |UNION ALL SELECT 2, a, b, a || b, cnt FROM m2
        |UNION ALL SELECT 3, a, b, a || b, cnt FROM m3
        |ORDER BY merge_step""") { c =>
      val words = c.documents
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("wd"))
        .filter(length(col("wd")) > 0)
        .groupBy("wd").agg(count(lit(1)).as("freq"))
        .withColumn("s", concat(lit(" "), concat_ws(" ",
          expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))")),
          lit(" ")))
        .select("freq", "s")
      var cur = words
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      (1 to 3).foreach { step =>
        val toks = cur.withColumn("ts", split(trim(col("s")), " "))
        val top = toks.filter(size(col("ts")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(0, size(ts) - 2), " +
              "i -> struct(ts[i] AS a, ts[i + 1] AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()(0)
        val (a, b, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
        merges += ((step, a, b, a + b, cnt))
        cur = cur.withColumn("s", call_function("replace", col("s"),
          concat(lit(" "), lit(a), lit(" "), lit(b), lit(" ")),
          concat(lit(" "), lit(a), lit(b), lit(" "))))
      }
      c.spark.createDataFrame(merges.result())
        .toDF("merge_step", "pair_a", "pair_b", "merged", "cnt")
        .orderBy("merge_step")
    },

    // BPE ENCODE: apply the induced vocabulary to the corpus — the
    // other half of the tokenizer (text_bpe_merges trains it, this
    // tokenizes with it). Each merge is applied corpus-wide in rank
    // order as a replace-all over the space-padded char string (the
    // same application rule the induction itself uses between rounds,
    // so train and encode agree). The 3 merges are a driver-side
    // constant (bounded 1-row collects); the corpus side is one
    // explode + per-row replace chain + re-aggregate — embarrassingly
    // parallel, merges ship as literals in the plan, and the shape is
    // unchanged with a production-sized 32k-merge vocabulary (the
    // replace chain becomes a per-row loop expression; still no
    // shuffle beyond the final per-doc sum).
    q("text_bpe_apply",
      """WITH w AS (SELECT wd, count(*) freq FROM
        |             (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) wd
        |              FROM documents)
        |           WHERE length(wd) > 0 GROUP BY 1),
        |s0 AS (SELECT freq, ' ' || list_aggregate(
        |         [wd[i] for i in generate_series(1, length(wd))],
        |         'string_agg', ' ') || ' ' s FROM w),
        |p1 AS (SELECT a, b, sum(freq)::BIGINT cnt FROM (
        |         SELECT freq, unnest([{'a': ts[i], 'b': ts[i+1]}
        |             for i in generate_series(1, len(ts)-1)], recursive := true)
        |         FROM (SELECT freq, string_split(trim(s), ' ') ts FROM s0))
        |       GROUP BY 1, 2),
        |m1 AS (SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
        |s1 AS (SELECT freq, replace(s, ' ' || m1.a || ' ' || m1.b || ' ',
        |                            ' ' || m1.a || m1.b || ' ') s FROM s0, m1),
        |p2 AS (SELECT a, b, sum(freq)::BIGINT cnt FROM (
        |         SELECT freq, unnest([{'a': ts[i], 'b': ts[i+1]}
        |             for i in generate_series(1, len(ts)-1)], recursive := true)
        |         FROM (SELECT freq, string_split(trim(s), ' ') ts FROM s1))
        |       GROUP BY 1, 2),
        |m2 AS (SELECT a, b FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
        |s2 AS (SELECT freq, replace(s, ' ' || m2.a || ' ' || m2.b || ' ',
        |                            ' ' || m2.a || m2.b || ' ') s FROM s1, m2),
        |p3 AS (SELECT a, b, sum(freq)::BIGINT cnt FROM (
        |         SELECT freq, unnest([{'a': ts[i], 'b': ts[i+1]}
        |             for i in generate_series(1, len(ts)-1)], recursive := true)
        |         FROM (SELECT freq, string_split(trim(s), ' ') ts FROM s2))
        |       GROUP BY 1, 2),
        |m3 AS (SELECT a, b FROM p3 ORDER BY cnt DESC, a, b LIMIT 1),
        |dw AS (SELECT doc_id,
        |         unnest(string_split_regex(lower(trim(text)), '\s+')) wd
        |       FROM documents),
        |ws AS (SELECT doc_id, length(wd)::BIGINT n_chars,
        |         ' ' || list_aggregate(
        |           [wd[i] for i in generate_series(1, length(wd))],
        |           'string_agg', ' ') || ' ' s
        |       FROM dw WHERE length(wd) > 0),
        |ap AS (SELECT doc_id, n_chars,
        |         replace(replace(replace(s,
        |           ' ' || m1.a || ' ' || m1.b || ' ', ' ' || m1.a || m1.b || ' '),
        |           ' ' || m2.a || ' ' || m2.b || ' ', ' ' || m2.a || m2.b || ' '),
        |           ' ' || m3.a || ' ' || m3.b || ' ', ' ' || m3.a || m3.b || ' ') s2
        |       FROM ws, m1, m2, m3)
        |SELECT doc_id, count(*)::BIGINT AS n_words,
        |       sum(n_chars)::BIGINT AS n_chars,
        |       sum(len(string_split(trim(s2), ' ')))::BIGINT AS n_bpe,
        |       round(sum(n_chars)::DOUBLE
        |             / sum(len(string_split(trim(s2), ' '))) + 1e-9, 4)
        |         AS chars_per_tok
        |FROM ap GROUP BY doc_id ORDER BY doc_id""") { c =>
      // ---- train: identical induction to text_bpe_merges ----
      val words = c.documents
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("wd"))
        .filter(length(col("wd")) > 0)
        .groupBy("wd").agg(count(lit(1)).as("freq"))
        .withColumn("s", concat(lit(" "), concat_ws(" ",
          expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))")),
          lit(" ")))
        .select("freq", "s")
      var cur = words
      val merges = Seq.newBuilder[(String, String)]
      (1 to 3).foreach { _ =>
        val toks = cur.withColumn("ts", split(trim(col("s")), " "))
        val top = toks.filter(size(col("ts")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(0, size(ts) - 2), " +
              "i -> struct(ts[i] AS a, ts[i + 1] AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()(0)
        val (a, b) = (top.getString(0), top.getString(1))
        merges += ((a, b))
        cur = cur.withColumn("s", call_function("replace", col("s"),
          concat(lit(" "), lit(a), lit(" "), lit(b), lit(" ")),
          concat(lit(" "), lit(a), lit(b), lit(" "))))
      }
      // ---- encode: rank-order replace chain over per-word strings ----
      val dw = c.documents
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("wd"))
        .filter(length(col("wd")) > 0)
        .withColumn("n_chars", length(col("wd")).cast("long"))
        .withColumn("s", concat(lit(" "), concat_ws(" ",
          expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))")),
          lit(" ")))
      val applied = merges.result().foldLeft(dw) { case (d, (a, b)) =>
        d.withColumn("s", call_function("replace", col("s"),
          lit(s" $a $b "), lit(s" $a$b ")))
      }
      val perWordToks = size(split(trim(col("s")), " ")).cast("long")
      applied.groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_chars")).as("n_chars"),
          sum(perWordToks).as("n_bpe"),
          r4(sum(col("n_chars")).cast("double") / sum(perWordToks))
            .as("chars_per_tok"))
        .orderBy("doc_id")
    },

    // Document fingerprinting: winnowing-style rolling scheme — char
    // 8-gram md5 hashes, min per 4-window, distinct fingerprints.
    // md5 (not xxhash) so the oracle can mirror the exact values.
    q("text_fingerprint",
      """WITH t AS (SELECT doc_id, substr(lower(text), 1, 160) tx
        |           FROM documents WHERE length(text) >= 11),
        |h AS (SELECT doc_id,
        |        [md5(substr(tx, i, 8)) for i in generate_series(1, length(tx) - 7)] hs
        |      FROM t),
        |w AS (SELECT doc_id,
        |        list_distinct([list_aggregate(hs[j:j+3], 'min')
        |                       for j in generate_series(1, len(hs) - 3)]) fps
        |      FROM h)
        |SELECT doc_id, len(fps) AS n_fp,
        |       list_aggregate(fps, 'min') AS min_fp,
        |       list_aggregate(fps, 'max') AS max_fp
        |FROM w ORDER BY doc_id""", bench = true) { c =>
      // ONE native expression per row (functions/WinnowFingerprint):
      // md5 grams + rolling-window minima + distinct, as a fused loop.
      // The previous posexplode + window-frame shape paid ~150 exploded
      // rows per doc through a partition-sort exchange; this is scan →
      // project → orderBy with no shuffle before the sort. Hash values
      // are identical (same UTF-8 gram bytes, same lowercase hex), so
      // the oracle is untouched.
      graft.functions.GraftFunctions.register(c.spark)
      c.documents.filter(length(col("text")) >= 11)
        .select(col("doc_id"),
          call_function("graft_winnow",
            substring(lower(col("text")), 1, 160), lit(8), lit(4))
            .as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("min_fp"),
          array_max(col("fps")).as("max_fp"))
        .orderBy("doc_id")
    },

    // Exact dedup: hash-groupBy on full text, keep the smallest doc_id
    // per identical text. One shuffle on the text hash at scale.
    q("dedup_exact",
      """SELECT min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keeper""") { c =>
      c.documents.groupBy("text")
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"))
        .select("keeper", "n_copies")
        .orderBy("keeper")
    },

    // MinHash-LSH near-dup detection: banded LSH candidates (never
    // all-pairs), verified with exact word-shingle Jaccard; char-4-gram
    // Jaccard added per pair. Oracle = brute-force pairs at sf0.01.
    q("dedup_minhash_lsh",
      """WITH d AS (SELECT doc_id, lower(trim(text)) t FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(t, '\s+') toks,
        |               substr(t, 1, 200) tc FROM d),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) ws,
        |         list_distinct([substr(tc, i, 4)
        |                        for i in generate_series(1, length(tc) - 3)]) cs
        |       FROM tok),
        |pairs AS (SELECT a.doc_id a_id, b.doc_id b_id,
        |            len(list_intersect(a.ws, b.ws))::DOUBLE
        |              / len(list_distinct(a.ws || b.ws)) wj,
        |            len(list_intersect(a.cs, b.cs))::DOUBLE
        |              / len(list_distinct(a.cs || b.cs)) cj
        |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, round(wj + 1e-9, 4) AS wjac,
        |       round(cj + 1e-9, 4) AS cjac
        |FROM pairs WHERE wj >= 0.8 ORDER BY a_id, b_id""",
      bench = true) { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val pairs = TextDedup.minhashDedupPairs(c.documents, "doc_id", "text",
        shingleN = 3, k = 32, bands = 16, threshold = 0.8, native = true)
      val csets = c.documents
        .select(col("doc_id").as("id"),
          substring(lower(trim(col("text"))), 1, 200).as("tc"))
        .select(col("id"), TextDedup.charShingles(col("tc"), 4).as("cs"))
      pairs
        .join(csets.as("ca"), col("a_id") === col("ca.id"))
        .join(csets.as("cb"), col("b_id") === col("cb.id"))
        .select(col("a_id"), col("b_id"), r4(col("wjac")).as("wjac"),
          r4(TextDedup.jaccard(col("ca.cs"), col("cb.cs"))).as("cjac"))
        .orderBy("a_id", "b_id")
    },

    // LSH banding EVAL — the empirical s-curve (Leskovec MMDS §3.4):
    // measure the banded-minhash candidate stage's RECALL against the
    // exact Jaccard-≥0.5 pair set, bucketed by true similarity. Uses a
    // PORTABLE minhash (k=8 as disjoint 8-hex windows of two md5
    // digests per shingle — the engine-portable hash device) so the
    // oracle replays the identical signatures; bands=4×rows=2 puts the
    // s-curve threshold at (1/4)^(1/2)=0.5, and the per-bucket recall
    // table shows exactly how the curve ramps. Exact pairs ride the
    // PPJoin prefix filter (never all-pairs); candidates are banded
    // bucket equi-joins. The eval itself is the operator: every dedup
    // deployment needs this table before trusting a banding choice.
    q("dedup_lsh_eval",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |s AS (SELECT doc_id, list_distinct([array_to_string(ts[i:i+2], ' ')
        |        for i in generate_series(1, len(ts)-2)]) st
        |      FROM tok WHERE len(ts) >= 3),
        |ex AS (SELECT a.doc_id a, b.doc_id b,
        |         len(list_intersect(a.st, b.st))::BIGINT i,
        |         len(a.st)::BIGINT sa, len(b.st)::BIGINT sb
        |       FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |exq AS (SELECT a, b,
        |          round(i::DOUBLE / (sa + sb - i) + 1e-9, 6) jac
        |        FROM ex WHERE i::DOUBLE / (sa + sb - i) >= 0.5),
        |g AS (SELECT doc_id, unnest(st) g FROM s),
        |mh AS (SELECT doc_id,
        |    min(('0x' || substr(md5(g || '#0'), 1, 8))::BIGINT) m0,
        |    min(('0x' || substr(md5(g || '#0'), 9, 8))::BIGINT) m1,
        |    min(('0x' || substr(md5(g || '#0'), 17, 8))::BIGINT) m2,
        |    min(('0x' || substr(md5(g || '#0'), 25, 8))::BIGINT) m3,
        |    min(('0x' || substr(md5(g || '#1'), 1, 8))::BIGINT) m4,
        |    min(('0x' || substr(md5(g || '#1'), 9, 8))::BIGINT) m5,
        |    min(('0x' || substr(md5(g || '#1'), 17, 8))::BIGINT) m6,
        |    min(('0x' || substr(md5(g || '#1'), 25, 8))::BIGINT) m7
        |  FROM g GROUP BY 1),
        |bd AS (SELECT doc_id, 0 bi, m0 k1, m1 k2 FROM mh
        |  UNION ALL SELECT doc_id, 1, m2, m3 FROM mh
        |  UNION ALL SELECT doc_id, 2, m4, m5 FROM mh
        |  UNION ALL SELECT doc_id, 3, m6, m7 FROM mh),
        |cand AS (SELECT DISTINCT x.doc_id a, y.doc_id b
        |         FROM bd x JOIN bd y ON x.bi = y.bi AND x.k1 = y.k1
        |           AND x.k2 = y.k2 AND x.doc_id < y.doc_id),
        |tot AS (SELECT count(*)::BIGINT n_cand FROM cand),
        |cm AS (SELECT a, b, 1 hm FROM cand),
        |hit AS (SELECT exq.a, exq.b, exq.jac, coalesce(hm, 0) h
        |        FROM exq LEFT JOIN cm USING (a, b)),
        |bk AS (SELECT CAST(floor(jac * 10 + 1e-6) AS BIGINT) bucket,
        |         count(*)::BIGINT n_exact, sum(h)::BIGINT n_hit
        |       FROM hit GROUP BY 1),
        |ht AS (SELECT sum(n_hit)::BIGINT th FROM bk)
        |SELECT bk.bucket, bk.n_exact, bk.n_hit,
        |  round(bk.n_hit * 1.0 / bk.n_exact + 1e-9, 4) AS recall,
        |  tot.n_cand,
        |  round(ht.th * 1.0 / tot.n_cand + 1e-9, 4) AS precision_vs_05
        |FROM bk, tot, ht ORDER BY bucket""") { c =>
      // native shingle rows feed BOTH legs (exact pairs + portable
      // minhash) — same element set as the lambda/array formulation
      // (WordShinglesSpec), one codegen pass instead of the
      // interpreted HOF (r15)
      graft.functions.GraftFunctions.register(c.spark)
      val rows = c.documents
        .select(col("doc_id").as("id"),
          explode(call_function("graft_word_shingles",
            col("text"), lit(3), lit(3))).as("tok"))
      // eager checkpointed variant (plan-leaf result; intermediates
      // released inside the operator) — the exact pair set is consumed
      // twice below (bucket table + the LEFT join), and the lazy
      // variant would re-inline its whole pipeline at both sites
      val exq = graft.ops.SetSimJoin.jaccardSelfJoinRowsCheckpointed(
          rows, 0.5)
        .select(col("a"), col("b"), r6(col("jac")).as("jac"))
      val g = rows.select(col("id").as("doc_id"),
        col("tok").as("g")).persist()
      val mh = graft.ops.TextDedup.portableMinhash8(g, "doc_id", "g")
        .persist()
      val bd = (0 until 4).map { bi =>
        mh.select(col("doc_id"), lit(bi).as("bi"),
          col(s"m${2 * bi}").as("k1"), col(s"m${2 * bi + 1}").as("k2"))
      }.reduce(_ union _)
      val cand = bd.as("x").join(bd.as("y"),
          col("x.bi") === col("y.bi") && col("x.k1") === col("y.k1") &&
            col("x.k2") === col("y.k2") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
        .persist()
      val tot = cand.agg(count(lit(1)).as("n_cand"))
      val hit = exq.join(cand.withColumn("h", lit(1)), Seq("a", "b"),
          "left")
        .select(col("jac"), coalesce(col("h"), lit(0)).as("h"))
      val bk = hit
        .groupBy(floor(col("jac") * 10 + lit(1e-6)).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n_exact"), sum(col("h")).as("n_hit"))
      val ht = bk.agg(sum(col("n_hit")).as("th"))
      val out = bk.crossJoin(broadcast(tot)).crossJoin(broadcast(ht))
        .select(col("bucket"), col("n_exact"), col("n_hit"),
          r4(col("n_hit") * lit(1.0) / col("n_exact")).as("recall"),
          col("n_cand"),
          r4(col("th") * lit(1.0) / col("n_cand")).as("precision_vs_05"))
        .orderBy("bucket")
      out
    },

    // INCREMENTAL dedup — new shard vs indexed corpus (the production
    // ingest shape: every arriving shard is checked against the
    // standing index, never old×old again): odd doc_ids arrive, even
    // doc_ids are the corpus. Banded portable-minhash candidates are
    // generated NEW×OLD only, verified with exact word-3-shingle
    // Jaccard on candidates, and each new doc reports its best
    // standing match (ties to the smallest old id via a max(struct)
    // reduce) with the ≥0.8 drop decision. The oracle replays the
    // identical md5 signatures and banding. Scale: the new shard is
    // small; the old side touches only its banded buckets.
    q("dedup_incremental",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |s AS (SELECT doc_id, list_distinct([array_to_string(ts[i:i+2], ' ')
        |        for i in generate_series(1, len(ts)-2)]) st
        |      FROM tok WHERE len(ts) >= 3),
        |g AS (SELECT doc_id, unnest(st) g FROM s),
        |mh AS (SELECT doc_id,
        |    min(('0x' || substr(md5(g || '#0'), 1, 8))::BIGINT) m0,
        |    min(('0x' || substr(md5(g || '#0'), 9, 8))::BIGINT) m1,
        |    min(('0x' || substr(md5(g || '#0'), 17, 8))::BIGINT) m2,
        |    min(('0x' || substr(md5(g || '#0'), 25, 8))::BIGINT) m3,
        |    min(('0x' || substr(md5(g || '#1'), 1, 8))::BIGINT) m4,
        |    min(('0x' || substr(md5(g || '#1'), 9, 8))::BIGINT) m5,
        |    min(('0x' || substr(md5(g || '#1'), 17, 8))::BIGINT) m6,
        |    min(('0x' || substr(md5(g || '#1'), 25, 8))::BIGINT) m7
        |  FROM g GROUP BY 1),
        |bd AS (SELECT doc_id, 0 bi, m0 k1, m1 k2 FROM mh
        |  UNION ALL SELECT doc_id, 1, m2, m3 FROM mh
        |  UNION ALL SELECT doc_id, 2, m4, m5 FROM mh
        |  UNION ALL SELECT doc_id, 3, m6, m7 FROM mh),
        |cand AS (SELECT DISTINCT x.doc_id new_id, y.doc_id old_id
        |         FROM bd x JOIN bd y ON x.bi = y.bi AND x.k1 = y.k1
        |           AND x.k2 = y.k2
        |         WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0),
        |vf AS (SELECT c.new_id, c.old_id,
        |         round(len(list_intersect(a.st, b.st))::DOUBLE
        |           / len(list_distinct(a.st || b.st)) + 1e-9, 6) jac
        |       FROM cand c JOIN s a ON c.new_id = a.doc_id
        |         JOIN s b ON c.old_id = b.doc_id),
        |fm AS (SELECT new_id, old_id best_old_id, jac,
        |         row_number() OVER (PARTITION BY new_id
        |           ORDER BY jac DESC, old_id) rk
        |       FROM vf WHERE jac >= 0.5)
        |SELECT new_id, best_old_id, jac, (jac >= 0.8) AS drop_dup
        |FROM fm WHERE rk = 1 ORDER BY new_id""") { c =>
      val toks = c.documents
        .select(col("doc_id"),
          expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
        .filter(size(col("ts")) >= 3)
        .withColumn("st", graft.ops.TextDedup.wordShingles(col("ts"), 3))
        .select(col("doc_id"), col("st"))
        .persist()
      val g = toks.select(col("doc_id"), explode(col("st")).as("g"))
      val mh = graft.ops.TextDedup.portableMinhash8(g, "doc_id", "g")
        .persist()
      val bd = (0 until 4).map { bi =>
        mh.select(col("doc_id"), lit(bi).as("bi"),
          col(s"m${2 * bi}").as("k1"), col(s"m${2 * bi + 1}").as("k2"))
      }.reduce(_ union _)
      val cand = bd.as("x").join(bd.as("y"),
          col("x.bi") === col("y.bi") && col("x.k1") === col("y.k1") &&
            col("x.k2") === col("y.k2") &&
            col("x.doc_id") % 2 === 1 && col("y.doc_id") % 2 === 0)
        .select(col("x.doc_id").as("new_id"),
          col("y.doc_id").as("old_id"))
        .distinct()
      val vf = cand
        .join(toks.select(col("doc_id").as("new_id"),
          col("st").as("sa")), Seq("new_id"))
        .join(toks.select(col("doc_id").as("old_id"),
          col("st").as("sb")), Seq("old_id"))
        .select(col("new_id"), col("old_id"),
          r6(graft.ops.TextDedup.jaccard(col("sa"), col("sb")))
            .as("jac"))
      val fm = vf.filter(col("jac") >= 0.5)
        .groupBy("new_id")
        .agg(max(struct(col("jac"), (-col("old_id")).as("nid")))
          .as("bm"))
      fm.select(col("new_id"), (-col("bm.nid")).as("best_old_id"),
          col("bm.jac").as("jac"),
          (col("bm.jac") >= 0.8).as("drop_dup"))
        .orderBy("new_id")
    },

    // Language-ID EVAL — confusion matrix + per-class precision/recall
    // of the text_lang_id stopword heuristic against the corpus's
    // labeled `lang` column (the eval table every classifier ships
    // with; 'zh' has no Latin stopwords so it lands in 'und' — the
    // matrix SHOWS that honestly): one corpus pass scoring 4 stopword
    // families, one (label, pred) aggregate, exact integer counts and
    // integer-ratio metrics.
    q("text_langid_eval",
      """WITH p AS (SELECT lang,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the', 'a', 'of', 'and'))) AS s_en,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('el', 'la', 'de', 'y'))) AS s_es,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('der', 'die', 'das', 'und'))) AS s_de,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('le', 'les', 'et', 'une'))) AS s_fr
        |  FROM documents),
        |pr AS (SELECT lang,
        |    CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |         WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
        |         WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
        |         WHEN s_de >= s_fr THEN 'de'
        |         ELSE 'fr' END AS pred
        |  FROM p),
        |cm AS (SELECT lang, pred, count(*)::BIGINT n FROM pr
        |       GROUP BY 1, 2),
        |rt AS (SELECT lang, sum(n)::BIGINT lt FROM cm GROUP BY 1),
        |ct AS (SELECT pred, sum(n)::BIGINT pt FROM cm GROUP BY 1)
        |SELECT cm.lang, cm.pred, cm.n,
        |  round(cm.n * 1.0 / rt.lt + 1e-9, 4) AS recall_share,
        |  round(cm.n * 1.0 / ct.pt + 1e-9, 4) AS precision_share
        |FROM cm JOIN rt USING (lang) JOIN ct USING (pred)
        |ORDER BY lang, pred""") { c =>
      val toks = split(lower(col("text")), "\\s+")
      def score(words: String*) =
        size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
      val p = c.documents.select(col("lang"),
        score("the", "a", "of", "and").as("s_en"),
        score("el", "la", "de", "y").as("s_es"),
        score("der", "die", "das", "und").as("s_de"),
        score("le", "les", "et", "une").as("s_fr"))
      val pr = p.select(col("lang"),
        when(greatest(col("s_en"), col("s_es"), col("s_de"),
          col("s_fr")) === 0, "und")
          .when(col("s_en") >= greatest(col("s_es"), col("s_de"),
            col("s_fr")), "en")
          .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr").as("pred"))
      val cm = pr.groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      val rt = cm.groupBy("lang").agg(sum(col("n")).as("lt"))
      val ct = cm.groupBy("pred").agg(sum(col("n")).as("pt"))
      cm.join(broadcast(rt), Seq("lang"))
        .join(broadcast(ct), Seq("pred"))
        .select(col("lang"), col("pred"), col("n"),
          r4(col("n") * lit(1.0) / col("lt")).as("recall_share"),
          r4(col("n") * lit(1.0) / col("pt")).as("precision_share"))
        .orderBy("lang", "pred")
    },

    // SimHash near-dup check: for every verified near-dup pair (word
    // Jaccard ≥ 0.9 via LSH), the 32-bit SimHashes must be within a
    // small Hamming distance — the dedup property SimHash is used for.
    q("dedup_simhash",
      """WITH d AS (SELECT doc_id, lower(trim(text)) t FROM documents),
        |sh AS (SELECT doc_id, string_split_regex(t, '\s+') toks FROM d),
        |g AS (SELECT doc_id,
        |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                       for i in generate_series(1, len(toks) - 2)]) ws
        |      FROM sh),
        |pairs AS (SELECT a.doc_id a_id, b.doc_id b_id,
        |            len(list_intersect(a.ws, b.ws))::DOUBLE
        |              / len(list_distinct(a.ws || b.ws)) wj
        |          FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, TRUE AS hamming_close
        |FROM pairs WHERE wj >= 0.9 ORDER BY a_id, b_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      // smoke tier halves the signature (16 hashes / 8 bands): per-band
      // match prob at j=0.9 is 0.81, miss over 8 bands ≈ 1.7e-6 —
      // recall still effectively 1 on the pinned corpus (golden-checked)
      val (kH, nB) = if (c.smoke) (16, 8) else (32, 16)
      val pairs = TextDedup.minhashDedupPairs(c.documents, "doc_id", "text",
        shingleN = 3, k = kH, bands = nB, threshold = 0.9, native = true)
      val sims = TextDedup.simhashAgg(c.documents, "doc_id",
        split(lower(trim(col("text"))), "\\s+"), 32)
      pairs
        .join(sims.as("sa"), col("a_id") === col("sa.id"))
        .join(sims.as("sb"), col("b_id") === col("sb.id"))
        .select(col("a_id"), col("b_id"),
          (TextDedup.hamming(col("sa.sim"), col("sb.sim")) <= 10)
            .as("hamming_close"))
        .orderBy("a_id", "b_id")
    },

    // Similarity search baseline: exact cosine top-3 for 10 query
    // vectors by brute force (broadcast queries × corpus — the oracle
    // path; the scale path is sim_ann_lsh below).
    q("sim_topk",
      """WITH q AS (SELECT vec_id q_id, embedding::DOUBLE[] q_vec
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id n_id, embedding::DOUBLE[] n_vec FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(q_vec, n_vec) cos
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id, cos,
        |        row_number() OVER (PARTITION BY q_id
        |            ORDER BY round(cos + 1e-9, 6) DESC, n_id) rnk
        |      FROM s)
        |SELECT q_id, rnk, n_id, round(cos + 1e-9, 6) AS cos
        |FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""",
      bench = true) { c =>
      val queries = c.embeddings.filter(col("vec_id") < 10).limit(10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = c.embeddings
        .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      graft.functions.GraftFunctions.register(c.spark)
      VectorSim.topKBruteForce(queries, corpus, 3, native = true)
        .select(col("q_id"), col("rank").as("rnk"), col("n_id"),
          r6(col("cos")).as("cos"))
        .orderBy("q_id", "rnk")
    },

    // ANN via multi-table random-hyperplane LSH + multiprobe: recall vs
    // the exact top-3 is the checked contract (the bucket join is the
    // 100 TB shape; the embeddings here are unclustered random vectors,
    // the hardest case for LSH). 4 independent tables × Hamming-2
    // probes measure 0.97 recall at this corpus — the checked bound is
    // 0.8 (r2's 0.5 was a loose contract).
    q("sim_ann_lsh",
      """SELECT 20 AS n_q, TRUE AS recall_ok""") { c =>
      val queries = c.embeddings.filter(col("vec_id") < 20).limit(20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = c.embeddings
        .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      graft.functions.GraftFunctions.register(c.spark)
      val bf = VectorSim.topKBruteForce(queries, corpus, 3, native = true)
        .select(col("q_id"), col("n_id"))
      val ann = VectorSim.topKAnn(queries, corpus, 3, planes = 6,
          probeHamming = 2, native = true, tables = 4)
        .select(col("q_id").as("aq"), col("n_id").as("an"))
      val hits = bf.join(ann,
        col("q_id") === col("aq") && col("n_id") === col("an"), "left_semi")
      bf.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(lit(20).as("n_q"),
          (col("n_hit").cast("double") / col("n_bf") >= 0.8).as("recall_ok"))
    },

    // ANN via IVF (k-means inverted-file) cells — the data-ADAPTIVE
    // coarse quantizer next to the data-oblivious hyperplanes of
    // sim_ann_lsh. The quantizer is a tiny k×dim model trained once
    // (deterministic init, Lloyd rounds as distributed aggregations)
    // and baked into the plan as ONE 2-D literal; candidates stream
    // through a plain cell equi-join. Same checked contract as LSH:
    // recall ≥ 0.8 vs the exact top-3 (measured 0.90 at k=8/nprobe=5
    // on these unclustered random vectors — IVF's hardest case; on a
    // clustered real corpus the cells track the data and selectivity
    // improves where LSH's cannot).
    q("sim_ann_ivf",
      """SELECT 20 AS n_q, TRUE AS recall_ok""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val queries = c.embeddings.filter(col("vec_id") < 20).limit(20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = c.embeddings
        .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      // smoke tier: 3 Lloyd rounds (gate budget, r13 verdict #3) —
      // the recall contract below stays the checked output either way
      val cents = VectorSim.kmeansCentroids(corpus, col("n_vec"),
        k = 8, iters = if (c.smoke) 3 else 5, native = true)
      val bf = VectorSim.topKBruteForce(queries, corpus, 3, native = true)
        .select(col("q_id"), col("n_id"))
      val ann = VectorSim.topKAnnIvf(queries, corpus, 3, cents,
          nprobe = 5, native = true)
        .select(col("q_id").as("aq"), col("n_id").as("an"))
      val hits = bf.join(ann,
        col("q_id") === col("aq") && col("n_id") === col("an"), "left_semi")
      bf.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(lit(20).as("n_q"),
          (col("n_hit").cast("double") / col("n_bf") >= 0.8).as("recall_ok"))
    },

    // Greedy k-center coreset (Gonzalez 1985 farthest-first) — the
    // diversity-sampling face of the ANN/dedup family: pick k
    // maximally-spread exemplars for a diverse training subset.
    // Deterministic seed (min id) + per-round argmax on 1e-6-rounded
    // min-distance with id tiebreak, so the pick sequence is identical
    // on both engines; the oracle unrolls the three selection rounds
    // as chained CTEs. k−1 distributed scans, argmax via TakeOrdered —
    // the corpus is never collected (ops/VectorSim.kCenterSelect).
    q("sim_kcenter_coreset",
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s1 AS (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 1),
        |d1 AS (SELECT c.vec_id, c.v,
        |         round(1 - list_cosine_similarity(c.v, (SELECT v FROM s1))
        |               + 1e-9, 6) AS m1
        |       FROM c WHERE c.vec_id != (SELECT vec_id FROM s1)),
        |s2 AS (SELECT vec_id, v, m1 FROM d1 ORDER BY m1 DESC, vec_id LIMIT 1),
        |d2 AS (SELECT d1.vec_id, d1.v,
        |         least(d1.m1,
        |           round(1 - list_cosine_similarity(d1.v, (SELECT v FROM s2))
        |                 + 1e-9, 6)) AS m2
        |       FROM d1 WHERE d1.vec_id != (SELECT vec_id FROM s2)),
        |s3 AS (SELECT vec_id, v, m2 FROM d2 ORDER BY m2 DESC, vec_id LIMIT 1),
        |d3 AS (SELECT d2.vec_id, d2.v,
        |         least(d2.m2,
        |           round(1 - list_cosine_similarity(d2.v, (SELECT v FROM s3))
        |                 + 1e-9, 6)) AS m3
        |       FROM d2 WHERE d2.vec_id != (SELECT vec_id FROM s3)),
        |s4 AS (SELECT vec_id, m3 FROM d3 ORDER BY m3 DESC, vec_id LIMIT 1)
        |SELECT 1 AS rnk, (SELECT vec_id FROM s1) AS vec_id, 0.0 AS sel_dist
        |UNION ALL SELECT 2, (SELECT vec_id FROM s2), (SELECT m1 FROM s2)
        |UNION ALL SELECT 3, (SELECT vec_id FROM s3), (SELECT m2 FROM s3)
        |UNION ALL SELECT 4, (SELECT vec_id FROM s4), (SELECT m3 FROM s4)
        |ORDER BY rnk""") { c =>
      val sel = VectorSim.kCenterSelect(c.embeddings, "vec_id",
        col("embedding"), k = 4)
      val sp = c.spark
      import sp.implicits._
      sel.toDF("rnk", "vec_id", "sel_dist").orderBy("rnk")
    },

    // Embedding-cosine near-dup: duplicate pairs by embedding
    // similarity (the semantic-dedup face of the MinHash pipeline).
    // Exact-pair contract vs the DuckDB oracle at sf0.01 (125k pairs —
    // this a<b join IS the oracle regime); dedup_embedding_lsh below is
    // the corpus-scale path — LSH-bucketed candidates, same oracle.
    q("dedup_embedding",
      """WITH p AS (SELECT a.vec_id a_id, b.vec_id b_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, round(cos + 1e-9, 6) AS cos
        |FROM p WHERE cos >= 0.4 ORDER BY a_id, b_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val a = c.embeddings.select(col("vec_id").as("a_id"),
        col("embedding").as("a_vec"))
      val b = c.embeddings.select(col("vec_id").as("b_id"),
        col("embedding").as("b_vec"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          VectorSim.cosineExpr(col("a_vec"), col("b_vec"),
            native = true).as("cos"))
        .filter(col("cos") >= 0.4)
        .select(col("a_id"), col("b_id"), r6(col("cos")).as("cos"))
        .orderBy("a_id", "b_id")
    },

    // Transitive closure of the near-dup pairs — the step that turns
    // "a duplicates b" edges into dedup CLUSTERS with one canonical
    // (minimum) doc id each; every document gets a label, isolated
    // docs label themselves. Spark side runs distributed alternating
    // star contraction (O(log n) rounds — ops/Components.scala); the
    // oracle walks the same brute-force pair set with a recursive CTE.
    q("dedup_components", bench = true, oracle =
      """WITH RECURSIVE d AS (SELECT doc_id, lower(trim(text)) t FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(t, '\s+') toks FROM d),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) ws
        |       FROM tok),
        |pairs AS (SELECT a.doc_id a_id, b.doc_id b_id
        |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |          WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
        |                  / len(list_distinct(a.ws || b.ws)) >= 0.8),
        |e AS (SELECT a_id a, b_id b FROM pairs
        |      UNION ALL SELECT b_id, a_id FROM pairs),
        |walk(id, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.b, w.comp FROM walk w JOIN e ON e.a = w.id)
        |SELECT id AS doc_id, min(comp)::BIGINT AS canon_id,
        |       (min(comp) = id) AS is_canonical
        |FROM walk GROUP BY id ORDER BY doc_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val pairs = TextDedup.minhashDedupPairs(c.documents, "doc_id", "text",
        shingleN = 3, k = 32, bands = 16, threshold = 0.8, native = true)
      val labels = graft.ops.Components.connectedComponents(
        pairs, "a_id", "b_id")
      c.documents.select(col("doc_id"))
        .join(labels, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("canon_id"))
        .withColumn("is_canonical", col("canon_id") === col("doc_id"))
        .orderBy("doc_id")
    },

    // Cluster-then-keep-best: the policy layer real dedup pipelines put
    // on top of the transitive closure — instead of keeping the minimum
    // id, each near-dup cluster keeps its HIGHEST-QUALITY member
    // (alpha-ratio score, doc_id tiebreak) and drops the rest. Pairs +
    // components are the established scale paths; the representative
    // pick is a per-cluster window — clusters are near-dup groups, so
    // partitions are tiny and the window never concentrates the corpus.
    q("dedup_cluster_keep_best",
      """WITH RECURSIVE d AS (SELECT doc_id, lower(trim(text)) t FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(t, '\s+') toks FROM d),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) ws
        |       FROM tok),
        |pairs AS (SELECT a.doc_id a_id, b.doc_id b_id
        |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |          WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
        |                  / len(list_distinct(a.ws || b.ws)) >= 0.8),
        |e AS (SELECT a_id a, b_id b FROM pairs
        |      UNION ALL SELECT b_id, a_id FROM pairs),
        |walk(id, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.b, w.comp FROM walk w JOIN e ON e.a = w.id),
        |lab AS (SELECT id AS doc_id, min(comp)::BIGINT AS canon_id
        |        FROM walk GROUP BY id),
        |qual AS (SELECT doc_id,
        |           round(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
        |                 / length(text) + 1e-9, 6) AS quality
        |         FROM documents),
        |r AS (SELECT l.doc_id, l.canon_id, q.quality,
        |        row_number() OVER (PARTITION BY l.canon_id
        |          ORDER BY q.quality DESC, l.doc_id) rnk,
        |        first_value(l.doc_id) OVER (PARTITION BY l.canon_id
        |          ORDER BY q.quality DESC, l.doc_id) best_id
        |      FROM lab l JOIN qual q USING (doc_id))
        |SELECT doc_id, canon_id, quality, best_id, (rnk = 1) AS keep
        |FROM r ORDER BY doc_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      // smoke tier halves the signature (see dedup_simhash note); the
      // j≥0.8 pairs on the pinned smoke corpus sit far from the band
      // threshold, so the component labeling is golden-stable
      val (kH, nB) = if (c.smoke) (16, 8) else (32, 16)
      val pairs = TextDedup.minhashDedupPairs(c.documents, "doc_id", "text",
        shingleN = 3, k = kH, bands = nB, threshold = 0.8, native = true)
      val labels = graft.ops.Components.connectedComponents(
        pairs, "a_id", "b_id")
      val qual = c.documents.select(col("doc_id"),
        r6(length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast("double") / length(col("text"))).as("quality"))
      val lab = qual.join(labels, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("canon_id"),
          col("quality"))
      val w = Window.partitionBy("canon_id")
        .orderBy(col("quality").desc, col("doc_id"))
      lab.withColumn("rnk", row_number().over(w))
        .withColumn("best_id", first(col("doc_id")).over(w))
        .select(col("doc_id"), col("canon_id"), col("quality"),
          col("best_id"), (col("rnk") === 1).as("keep"))
        .orderBy("doc_id")
    },

    // The SCALE PATH of dedup_embedding, under the SAME oracle: LSH
    // buckets generate candidates through a plain (t, bucket) equi-join
    // — no broadcast, no a<b cross product — and exact cosine verifies
    // only the candidates. The (4 planes × 8 tables × Hamming-2) config
    // is chosen so recall is exact even at the oracle's cos≥0.4 regime
    // (per-pair miss ~5e-7); real corpus runs at cos≥0.9 would use more
    // planes and fewer tables (see VectorSim.embeddingDedupPairs).
    q("dedup_embedding_lsh",
      """WITH p AS (SELECT a.vec_id a_id, b.vec_id b_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, round(cos + 1e-9, 6) AS cos
        |FROM p WHERE cos >= 0.4 ORDER BY a_id, b_id""",
      bench = true) { c =>
      graft.functions.GraftFunctions.register(c.spark)
      VectorSim.embeddingDedupPairs(
          c.embeddings.select(col("vec_id").as("id"),
            col("embedding").as("vec")),
          threshold = 0.4, native = true)
        .select(col("a_id"), col("b_id"), r6(col("cos")).as("cos"))
        .orderBy("a_id", "b_id")
    },

    // Unicode text normalization (native codegen expression
    // functions/NormalizeText.scala): lowercase → NFC → accent strip →
    // whitespace collapse — the pre-tokenization cleanup that runs
    // before dedup/fingerprinting. The corpus is ASCII, so the query
    // INJECTS accents and tabs deterministically on BOTH engines
    // (a→á, e→é, every space gains a tab) — the oracle then genuinely
    // exercises composition, mark stripping, and collapse, not just
    // identity. Per-row pure map: no shuffle anywhere.
    q("text_normalize",
      """WITH src AS (SELECT doc_id,
        |        replace(replace(replace(text, 'a', 'á'), 'e', 'é'),
        |                ' ', ' ' || chr(9)) s
        |      FROM documents),
        |n AS (SELECT doc_id, length(s)::BIGINT n_raw,
        |        trim(regexp_replace(strip_accents(nfc_normalize(lower(s))),
        |                            '\s+', ' ', 'g')) norm
        |      FROM src)
        |SELECT doc_id, n_raw, norm, length(norm)::BIGINT AS n_norm
        |FROM n ORDER BY doc_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      c.documents
        .select(col("doc_id"),
          expr("replace(replace(replace(text, 'a', 'á'), 'e', 'é'), " +
            "' ', concat(' ', char(9)))").as("s"))
        .select(col("doc_id"),
          length(col("s")).cast("long").as("n_raw"),
          call_function("graft_normalize", col("s")).as("norm"))
        .withColumn("n_norm", length(col("norm")).cast("long"))
        .orderBy("doc_id")
    },

    // SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): cluster by
    // nearest anchor (here: designated corpus exemplars, so both
    // engines compute the identical assignment), then keep the lowest
    // id of any within-cluster pair at cosine ≥ 0.4 — pairing happens
    // ONLY inside a cell, never across the corpus. The oracle
    // replicates anchor-argmax + within-cell pairs exactly; the Spark
    // side broadcasts the 8 anchors and equi-joins on the cell id
    // (ops/VectorSim.semanticDedup).
    q("dedup_semantic",
      """WITH anch AS (SELECT vec_id aid, embedding av FROM embeddings
        |              WHERE vec_id < 8),
        |sc AS (SELECT e.vec_id, a.aid,
        |         round(list_cosine_similarity(e.embedding::DOUBLE[],
        |                                      a.av::DOUBLE[]) + 1e-9, 6) c
        |       FROM embeddings e CROSS JOIN anch a),
        |cell AS (SELECT vec_id, aid AS cell FROM (
        |    SELECT vec_id, aid, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY c DESC, aid) rnk
        |    FROM sc) WHERE rnk = 1),
        |p AS (SELECT DISTINCT cb.vec_id b
        |      FROM cell ca JOIN cell cb
        |        ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
        |      JOIN embeddings ea ON ea.vec_id = ca.vec_id
        |      JOIN embeddings eb ON eb.vec_id = cb.vec_id
        |      WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                   eb.embedding::DOUBLE[]) >= 0.4)
        |SELECT c.vec_id, c.cell::BIGINT AS cell,
        |       c.vec_id NOT IN (SELECT b FROM p) AS kept
        |FROM cell c ORDER BY vec_id""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val anchors = c.embeddings.filter(col("vec_id") < 8).limit(8)
        .select(col("vec_id").as("aid"), col("embedding").as("avec"))
      VectorSim.semanticDedup(
          c.embeddings.select(col("vec_id").as("id"),
            col("embedding").as("vec")),
          anchors, threshold = 0.4, native = true)
        .select(col("id").as("vec_id"), col("cell").cast("long").as("cell"),
          col("kept"))
        .orderBy("vec_id")
    },

    // End-to-end corpus prep — the composed pipeline a training-data
    // run actually executes: quality filter → near-dup removal (LSH
    // pairs, keep-smallest-id policy) → per-language corpus stats.
    // Oracle replicates with brute-force pairs at sf0.01. The ::BIGINT on
    // total_tokens is load-bearing: DuckDB's sum(BIGINT) is HUGEINT, which
    // the driver's pandas bridge widens to float64 ("27165.0") while Spark
    // emits int64 — a guaranteed hash mismatch on identical values.
    q("llm_corpus_prep",
      """WITH d AS (SELECT doc_id, lang, text, lower(trim(text)) t FROM documents),
        |tok AS (SELECT doc_id, string_split_regex(t, '\s+') toks FROM d),
        |g AS (SELECT doc_id,
        |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                       for i in generate_series(1, len(toks) - 2)]) ws
        |      FROM tok),
        |dups AS (SELECT DISTINCT b.doc_id AS drop_id
        |         FROM g a JOIN g b ON a.doc_id < b.doc_id
        |         WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
        |               / len(list_distinct(a.ws || b.ws)) >= 0.9),
        |kept AS (SELECT d.* FROM d
        |         LEFT JOIN dups ON d.doc_id = dups.drop_id
        |         WHERE dups.drop_id IS NULL
        |           AND len(string_split_regex(trim(text), '\s+')) >= 10
        |           AND length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
        |               / length(text) > 0.5)
        |SELECT lang, count(*) AS n_docs,
        |       sum(len(string_split_regex(trim(text), '\s+')))::BIGINT AS total_tokens,
        |       round(avg(length(text)) + 1e-9, 2) AS avg_chars
        |FROM kept GROUP BY lang ORDER BY lang""", bench = true) { c =>
      val nTok = size(split(trim(col("text")), "\\s+"))
      val alphaRatio = length(regexp_replace(col("text"), "[^a-z]", ""))
        .cast("double") / length(col("text"))
      graft.functions.GraftFunctions.register(c.spark)
      val dropIds = TextDedup.minhashDedupPairs(c.documents, "doc_id",
          "text", shingleN = 3, k = 32, bands = 16, threshold = 0.9,
          native = true)
        .select(col("b_id").as("drop_id")).distinct()
      c.documents
        .filter(nTok >= 10 && alphaRatio > 0.5)
        .join(broadcast(dropIds), col("doc_id") === col("drop_id"),
          "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(nTok).cast("long").as("total_tokens"),
          r2(avg(length(col("text")))).as("avg_chars"))
        .orderBy("lang")
    },

    // Multimodal plumbing: opaque binary payload + typed partition-local
    // stub decode (see graft.ops.Multimodal — decode is a deterministic
    // fake; schema/encoder/partitioning are the real contract).
    q("mm_decode_stub",
      """SELECT doc_id,
        |       strlen(text) AS n_bytes,
        |       CAST(strlen(text) % 640 AS INT) AS width,
        |       CAST(strlen(text) % 480 AS INT) AS height,
        |       CAST(1 + strlen(text) % 3 AS INT) AS channels,
        |       concat(ascii(substr(text, 1, 1)), ',',
        |              ascii(substr(text, 2, 1)), ',',
        |              ascii(substr(text, 3, 1))) AS head_csv
        |FROM documents ORDER BY doc_id""") { c =>
      Multimodal.decodeStub(
          Multimodal.withBinaryPayload(c.documents, "text"), "doc_id")
        .toDF()
        .orderBy("doc_id")
    },

    // REAL pixel decode (r5): genuine 24-bit BMP files are generated
    // from doc keys — BGR channel order, bottom-up rows, 4-byte row
    // padding, the actual on-disk layout — and Multimodal.decodeBmp
    // inverts all of that to recover the logical top-down RGB pixels;
    // per-channel means go under the hash gate against an oracle that
    // regenerates the pixel value formula arithmetically. No codec:
    // uncompressed BMP is pure byte layout, which is exactly why its
    // decode can be real in this container while PNG/JPEG stay stubs.
    // Histogram equalization over REAL decoded BMPs
    // (ops/Multimodal.equalizeGray) — the contrast-normalization prep
    // step of an image-training pipeline, and the multimodal family's
    // first PIXEL-TRANSFORM (decode queries aggregate; this one maps
    // levels). Fixtures are gray 24-bit BMPs whose values concentrate
    // in [32, 96) (a low-contrast band), so the equalized span must
    // stretch to [0, 255] — the stretch IS the checkable contract.
    // The mapping round(255·(cdf−cdfmin)/(n−cdfmin)) runs as exact
    // half-up integer division on BOTH engines ((510x + den) //
    // (2·den)) — no FP in the loop; the oracle replays the fixture
    // formula through the same histogram/CDF arithmetic. Per-image
    // partition-local work, zero shuffles before the output ORDER BY.
    q("mm_hist_equalize",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h,
        |        (32 + (doc_id * 5 + p * 3) % 64)::BIGINT v FROM px),
        |hist AS (SELECT doc_id, w, h, v, count(*)::BIGINT cnt
        |         FROM g GROUP BY 1, 2, 3, 4),
        |cdf AS (SELECT doc_id, w, h, v, cnt,
        |          sum(cnt) OVER (PARTITION BY doc_id ORDER BY v) cd
        |        FROM hist),
        |st AS (SELECT doc_id, sum(cnt)::BIGINT n, min(cd)::BIGINT cmin,
        |         min(v)::BIGINT lo_b, max(v)::BIGINT hi_b,
        |         count(*)::BIGINT lev_b
        |       FROM cdf GROUP BY 1),
        |eq AS (SELECT c.doc_id, c.w, c.h, c.cnt,
        |         CASE WHEN s.n = s.cmin THEN 0
        |              ELSE (510 * (c.cd - s.cmin) + (s.n - s.cmin))
        |                   // (2 * (s.n - s.cmin)) END ev,
        |         s.n, s.lo_b, s.hi_b, s.lev_b
        |       FROM cdf c JOIN st s ON c.doc_id = s.doc_id)
        |SELECT doc_id, CAST(max(w) AS INT) AS width,
        |       CAST(max(h) AS INT) AS height, max(n) AS n_px,
        |       CAST(max(lo_b) AS INT) AS lo_before,
        |       CAST(max(hi_b) AS INT) AS hi_before,
        |       CAST(max(lev_b) AS INT) AS levels_before,
        |       min(ev)::BIGINT AS lo_after, max(ev)::BIGINT AS hi_after,
        |       CAST(count(DISTINCT ev) AS INT) AS levels_after,
        |       sum(ev * cnt)::BIGINT AS sum_after
        |FROM eq GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkGrayBmp = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (32 + (id * 5 + p * 3) % 64).toByte
            b.put(gv).put(gv).put(gv) // gray: B = G = R
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      graft.ops.Multimodal.equalizeGray(
          c.documents.select(col("doc_id"),
            mkGrayBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          col("lo_before"), col("hi_before"), col("levels_before"),
          col("lo_after"), col("hi_after"), col("levels_after"),
          col("sum_after"))
        .orderBy("doc_id")
    },

    // Otsu automatic binarization threshold (Otsu 1979) over real
    // decoded gray BMPs with a BIMODAL pixel law (a dark ink mode and a
    // bright paper mode per doc key) — the scan-cleanup step before OCR
    // in a document-imaging pipeline, beside mm_hist_equalize on the
    // same decode path. ops/Multimodal.otsuGray keeps the whole
    // between-class-variance sweep in EXACT integer arithmetic (the
    // 2^20-scaled floor-division score preserves the variance ordering;
    // ties break to the lowest level), histogram and argmax run
    // partition-local per image — no shuffle, no per-pixel rows. The
    // oracle regenerates the pixel law arithmetically and replays the
    // identical integer sweep via cumulative window + row_number.
    q("mm_otsu_threshold",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px),
        |hist AS (SELECT doc_id, w, h, v, count(*)::BIGINT cnt
        |         FROM g GROUP BY 1, 2, 3, 4),
        |st AS (SELECT doc_id, max(w) w, max(h) h, sum(cnt)::BIGINT n,
        |         sum(v * cnt)::BIGINT stot FROM hist GROUP BY 1),
        |cum AS (SELECT doc_id, v,
        |          sum(cnt) OVER (PARTITION BY doc_id ORDER BY v) n0,
        |          sum(v * cnt) OVER (PARTITION BY doc_id ORDER BY v) s0
        |        FROM hist),
        |sc AS (SELECT c.doc_id, c.v, c.n0, c.s0, s.n, s.stot, s.w, s.h,
        |         (s.n * c.s0 - s.stot * c.n0)::HUGEINT
        |           * (s.n * c.s0 - s.stot * c.n0)
        |           * 1048576 // (c.n0 * (s.n - c.n0)) sq
        |       FROM cum c JOIN st s ON c.doc_id = s.doc_id
        |       WHERE c.n0 < s.n),
        |b AS (SELECT sc.*, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY sq DESC, v) rn FROM sc)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  n::BIGINT AS n_px, CAST(v AS INT) AS threshold,
        |  n0::BIGINT AS n_bg, (n - n0)::BIGINT AS n_fg,
        |  s0::BIGINT AS sum_bg, (stot - s0)::BIGINT AS sum_fg,
        |  sq::BIGINT AS score_q
        |FROM b WHERE rn = 1 ORDER BY doc_id""") { c =>
      val mkBimodalBmp = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.otsuGray(
          c.documents.select(col("doc_id"),
            mkBimodalBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          col("threshold"), col("n_bg"), col("n_fg"),
          col("sum_bg"), col("sum_fg"), col("score_q"))
        .orderBy("doc_id")
    },

    // Run-length statistics over the SAME decoded bimodal BMPs —
    // the compressibility discriminant of document imaging (clean
    // scans are a few runs per row, dithered noise is not; the
    // row-run model beneath CCITT G3/G4 fax coding).
    // ops/Multimodal.rleGray binarizes at gray < 128 and counts
    // maximal constant segments per pixel row in exact integers,
    // partition-local per image — no shuffle, no per-pixel rows. The
    // oracle regenerates the pixel law arithmetically (ink mode
    // 40-69 < 128 ≤ paper mode 170-209, so fg ⟺ (doc_id+p)%3=0) and
    // counts run STARTS via the p-1 self-join on the generated grid:
    // row head or a foreground flip starts a run. mean_run and the
    // 2-bytes-per-run RLE ratio are single exact-integer divisions.
    q("mm_rle",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p,
        |        CASE WHEN (doc_id + p) % 3 = 0 THEN 1 ELSE 0 END fg
        |      FROM px),
        |r AS (SELECT a.doc_id, max(a.w) w, max(a.h) h,
        |        count(*)::BIGINT n_px, sum(a.fg)::BIGINT n_fg,
        |        sum(CASE WHEN a.p % a.w = 0 OR a.fg <> b.fg
        |                 THEN 1 ELSE 0 END)::BIGINT n_runs
        |      FROM g a LEFT JOIN g b
        |        ON b.doc_id = a.doc_id AND b.p = a.p - 1
        |           AND (a.p % a.w) <> 0
        |      GROUP BY 1)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  n_px, n_fg, n_runs,
        |  round(n_px * 1.0 / n_runs + 1e-9, 6) AS mean_run,
        |  round(n_runs * 2.0 / n_px + 1e-9, 6) AS rle_ratio
        |FROM r ORDER BY doc_id""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.rleGray(
          c.documents.select(col("doc_id"),
            mkBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_px"), col("n_fg"), col("n_runs"),
          r6(col("n_px") * lit(1.0) / col("n_runs")).as("mean_run"),
          r6(col("n_runs") * lit(2.0) / col("n_px")).as("rle_ratio"))
        .orderBy("doc_id")
    },

    // 3x3 box-filter / clamped-Laplacian energy over the same decoded
    // bimodal BMPs — the local-smoothness image-QA signal beside
    // mm_image_sharpness: per pixel, nsum/ncnt over the border-clamped
    // 3x3 window and lap = v·ncnt − nsum (= Σ (v − v_neighbor), self
    // term zero), all EXACT integers with no division anywhere;
    // per-image sums Σnsum, Σncnt and the edge energy Σ lap² are what
    // a text-vs-blank-vs-blur router thresholds on.
    // ops/Multimodal.boxBlurStats runs partition-local per image; the
    // oracle regenerates the gray law on an (x, y) grid and replays
    // the window with a 3x3 offset join bounded by the image borders.
    q("mm_box_blur",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px),
        |off AS (SELECT a.a dx, b.a dy
        |        FROM (SELECT unnest([-1, 0, 1]) a) a,
        |             (SELECT unnest([-1, 0, 1]) a) b),
        |nb AS (SELECT a.doc_id, a.x, a.y, a.v,
        |         sum(b.v)::BIGINT nsum, count(*)::BIGINT ncnt
        |       FROM g a, off
        |       JOIN g b ON b.doc_id = a.doc_id
        |         AND b.x = a.x + off.dx AND b.y = a.y + off.dy
        |       GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, count(*)::BIGINT AS n_px,
        |  sum(nsum)::BIGINT AS sum_nsum,
        |  sum(ncnt)::BIGINT AS sum_ncnt,
        |  sum((v * ncnt - nsum) * (v * ncnt - nsum))::BIGINT
        |    AS lap_energy
        |FROM nb GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkBmp2 = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.boxBlurStats(
          c.documents.select(col("doc_id"),
            mkBmp2(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_px"), col("sum_nsum"),
          col("sum_ncnt"), col("lap_energy"))
        .orderBy("doc_id")
    },

    // Sobel edge statistics (Sobel & Feldman 1968) over the decoded
    // bimodal BMPs — the edge-density image-QA signal beside
    // mm_box_blur's smoothness: the 3×3 Gx/Gy pair on INTERIOR pixels
    // (no border clamping ambiguity), per-pixel L1 magnitude
    // |Gx|+|Gy| — EXACT integers end to end, no division, no sqrt.
    // ops/Multimodal.sobelStats runs partition-local per image; the
    // oracle regenerates the gray law on an (x, y) grid and replays
    // the kernel as a 3×3 WEIGHTED offset join restricted to the
    // interior. Fixture dims 8..12 × 6..8 so every image has a
    // nontrivial interior.
    q("mm_sobel",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |             (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px),
        |off AS (SELECT a.a dx, b.a dy
        |        FROM (SELECT unnest([-1, 0, 1]) a) a,
        |             (SELECT unnest([-1, 0, 1]) a) b),
        |nb AS (SELECT a.doc_id, a.x, a.y,
        |         sum(off.dx * (CASE WHEN off.dy = 0 THEN 2 ELSE 1 END)
        |             * b.v)::BIGINT gx,
        |         sum(off.dy * (CASE WHEN off.dx = 0 THEN 2 ELSE 1 END)
        |             * b.v)::BIGINT gy
        |       FROM g a, off
        |       JOIN g b ON b.doc_id = a.doc_id
        |         AND b.x = a.x + off.dx AND b.y = a.y + off.dy
        |       WHERE a.x >= 1 AND a.x <= a.w - 2
        |         AND a.y >= 1 AND a.y <= a.h - 2
        |       GROUP BY 1, 2, 3)
        |SELECT doc_id, count(*)::BIGINT AS n_interior,
        |  sum(abs(gx))::BIGINT AS sum_gx_abs,
        |  sum(abs(gy))::BIGINT AS sum_gy_abs,
        |  sum((abs(gx) + abs(gy)) * (abs(gx) + abs(gy)))::BIGINT
        |    AS grad_energy,
        |  max(abs(gx) + abs(gy))::BIGINT AS max_grad
        |FROM nb GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkBmp3 = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.sobelStats(
          c.documents.select(col("doc_id"),
            mkBmp3(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_interior"), col("sum_gx_abs"),
          col("sum_gy_abs"), col("grad_energy"), col("max_grad"))
        .orderBy("doc_id")
    },

    // Histogram equalization (the classic integer CDF remap,
    // Gonzalez & Woods §3.3) over the decoded bimodal BMPs — the
    // global tone-mapping normalizer an imaging pipeline runs before
    // feature extraction: v' = (cdf(v) − cdf_min)·255 // (n −
    // cdf_min), FLOOR integer division, so every statistic is exact
    // integer arithmetic on both engines. ops/Multimodal.histEqStats
    // runs partition-local per image; the oracle replays the gray law
    // with a per-image histogram + running-CDF window (a few dozen
    // rows per image — model-sized).
    q("mm_histogram_eq",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |             (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px),
        |hist AS (SELECT doc_id, v, count(*)::BIGINT cnt
        |         FROM g GROUP BY 1, 2),
        |t AS (SELECT doc_id, sum(cnt)::BIGINT n FROM hist GROUP BY 1),
        |cdf AS (SELECT doc_id, v, cnt,
        |          sum(cnt) OVER (PARTITION BY doc_id ORDER BY v) cum
        |        FROM hist),
        |cm AS (SELECT doc_id, min(cum)::BIGINT cdfmin
        |       FROM cdf GROUP BY 1),
        |r AS (SELECT c.doc_id, c.v, c.cnt,
        |        CASE WHEN t.n = cm.cdfmin THEN 0
        |             ELSE (c.cum - cm.cdfmin) * 255 // (t.n - cm.cdfmin)
        |        END rv
        |      FROM cdf c JOIN cm USING (doc_id) JOIN t USING (doc_id))
        |SELECT r.doc_id, max(t.n)::BIGINT AS n_px,
        |  count(*)::BIGINT AS n_levels_before,
        |  count(DISTINCT rv)::BIGINT AS n_levels_after,
        |  sum(cnt * v)::BIGINT AS sum_before,
        |  sum(cnt * rv)::BIGINT AS sum_after,
        |  min(rv)::BIGINT AS min_after,
        |  max(rv)::BIGINT AS max_after
        |FROM r JOIN t USING (doc_id) GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkBmp4 = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.histEqStats(
          c.documents.select(col("doc_id"),
            mkBmp4(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_px"), col("n_levels_before"),
          col("n_levels_after"), col("sum_before"), col("sum_after"),
          col("min_after"), col("max_after"))
        .orderBy("doc_id")
    },

    // Summed-area table / integral image (Crow 1984 — the O(1)
    // box-sum primitive behind Viola-Jones features and fast box
    // filters) over the decoded BMPs: ops/Multimodal.integralStats
    // BUILDS the per-image SAT partition-locally and emits stats that
    // pin both construction and USE — the far corner (≡ the gray
    // total), the sum over all SAT cells (≡ Σ v·(w−x)·(h−y), which
    // the oracle computes as a weighted conditional sum WITHOUT
    // materializing the table), and the four quadrant box sums read
    // back through the classic 4-corner identity (the oracle computes
    // them as direct rectangle sums — equality IS the test). Exact
    // integers end to end.
    q("mm_integral_image",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |             (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px)
        |SELECT doc_id, max(w)::BIGINT AS width, max(h)::BIGINT AS height,
        |  (max(w) * max(h))::BIGINT AS n_px,
        |  sum(v)::BIGINT AS sat_corner,
        |  sum(v * (w - x) * (h - y))::BIGINT AS sat_sum,
        |  sum(CASE WHEN x < w // 2 AND y < h // 2 THEN v ELSE 0 END)
        |    ::BIGINT AS q00,
        |  sum(CASE WHEN x >= w // 2 AND y < h // 2 THEN v ELSE 0 END)
        |    ::BIGINT AS q10,
        |  sum(CASE WHEN x < w // 2 AND y >= h // 2 THEN v ELSE 0 END)
        |    ::BIGINT AS q01,
        |  sum(CASE WHEN x >= w // 2 AND y >= h // 2 THEN v ELSE 0 END)
        |    ::BIGINT AS q11
        |FROM g GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkBmp5 = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.integralStats(
          c.documents.select(col("doc_id"),
            mkBmp5(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_px"),
          col("sat_corner"), col("sat_sum"), col("q00"), col("q10"),
          col("q01"), col("q11"))
        .orderBy("doc_id")
    },

    // Ordered Bayer dithering (Bayer 1973 — the classic 4×4 index
    // matrix halftoner that turns gray into a 1-bit pattern while
    // preserving local density): pixel fires when gray exceeds the
    // tiled integer threshold 16·B[y%4][x%4] + 8. ops/Multimodal
    // .bayerStats runs partition-local per decoded BMP; the oracle
    // tiles the SAME matrix as a flat 16-literal list indexed by
    // (y%4)·4 + x%4. The position-weighted moment pins WHICH pixels
    // fired, not just the count — exact integers end to end.
    q("mm_bayer_dither",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |             (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px),
        |t AS (SELECT doc_id, w, h, x, y, v,
        |        16 * ([0, 8, 2, 10, 12, 4, 14, 6, 3, 11, 1, 9,
        |               15, 7, 13, 5][((y % 4) * 4 + (x % 4) + 1)::INT])
        |          + 8 thr
        |      FROM g)
        |SELECT doc_id, max(w)::BIGINT AS width, max(h)::BIGINT AS height,
        |  (max(w) * max(h))::BIGINT AS n_px,
        |  sum(CASE WHEN v > thr THEN 1 ELSE 0 END)::BIGINT AS n_on,
        |  sum(CASE WHEN v > thr THEN (x + 1) * (y + 3) ELSE 0 END)
        |    ::BIGINT AS moment
        |FROM t GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkBmp6 = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.bayerStats(
          c.documents.select(col("doc_id"),
            mkBmp6(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_px"),
          col("n_on"), col("moment"))
        .orderBy("doc_id")
    },

    // Binary 4-neighborhood morphology (erosion / dilation /
    // morphological gradient — Serra 1982) over binarized decoded
    // BMPs: the speckle-vs-stroke signal beside mm_blob_labeling's
    // component census (erosion kills 1-px noise; the gradient counts
    // boundary pixels). Out-of-image is BACKGROUND, so border ink
    // never survives erosion. ops/Multimodal.morphStats runs
    // partition-local per image; the oracle regenerates the ink-mask
    // law (the mm_blob_labeling fixture at the larger sobel dims) and
    // replays the neighborhood with a 4-offset LEFT join — exact
    // integer counts end to end.
    q("mm_morphology",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |             (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        (doc_id * 3 + p * 7) % 5 < 2 ink
        |      FROM px),
        |fg AS (SELECT doc_id, x, y FROM g WHERE ink),
        |off AS (SELECT * FROM (VALUES (-1, 0), (1, 0), (0, -1), (0, 1))
        |        o(dx, dy)),
        |nc AS (SELECT a.doc_id, a.x, a.y, a.ink,
        |         count(f.x)::BIGINT nn
        |       FROM g a CROSS JOIN off o
        |       LEFT JOIN fg f ON f.doc_id = a.doc_id
        |         AND f.x = a.x + o.dx AND f.y = a.y + o.dy
        |       GROUP BY 1, 2, 3, 4)
        |SELECT doc_id,
        |  sum(CASE WHEN ink THEN 1 ELSE 0 END)::BIGINT AS n_ink,
        |  sum(CASE WHEN ink AND nn = 4 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_eroded,
        |  sum(CASE WHEN ink OR nn >= 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dilated,
        |  sum(CASE WHEN ink OR nn >= 1 THEN 1 ELSE 0 END)::BIGINT
        |  - sum(CASE WHEN ink AND nn = 4 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_gradient
        |FROM nc GROUP BY 1 ORDER BY doc_id""") { c =>
      val mkBmp5 = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id * 3 + p * 7) % 5 < 2)
                        40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.morphStats(
          c.documents.select(col("doc_id"),
            mkBmp5(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_ink"), col("n_eroded"),
          col("n_dilated"), col("n_gradient"))
        .orderBy("doc_id")
    },

    // Connected-component BLOB labeling (4-connectivity) over
    // binarized decoded BMPs — the post-Otsu figure-vs-speckle signal
    // of a document-imaging pipeline (ops/Multimodal.blobsGray: a
    // partition-local flat-array union-find per image; no shuffle, no
    // per-pixel rows). The fixture's pseudo-random ink law
    // (id*3 + p*7) % 5 < 2 gives ~40% foreground with nontrivial blob
    // topology. The oracle regenerates the ink mask arithmetically and
    // labels it with the er_entities device: a bounded recursive
    // min-label propagation over the in-image 4-adjacency edges
    // (<= 40 px per image, so the fixpoint is a few rounds).
    q("mm_blob_labeling",
      """WITH RECURSIVE d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |fg AS (SELECT doc_id, w, p FROM px
        |       WHERE (doc_id * 3 + p * 7) % 5 < 2),
        |e0 AS (SELECT a.doc_id, a.p pa, b.p pb
        |       FROM fg a JOIN fg b ON a.doc_id = b.doc_id
        |        AND ((b.p = a.p + 1 AND (a.p % a.w) < a.w - 1)
        |             OR b.p = a.p + a.w)),
        |e AS (SELECT doc_id, pa, pb FROM e0
        |      UNION ALL SELECT doc_id, pb, pa FROM e0),
        |walk(doc_id, p, comp) AS (
        |  SELECT doc_id, p, p FROM fg
        |  UNION
        |  SELECT e.doc_id, e.pb, walk.comp
        |  FROM walk JOIN e ON e.doc_id = walk.doc_id AND e.pa = walk.p),
        |lab AS (SELECT doc_id, p, min(comp) comp FROM walk GROUP BY 1, 2),
        |bl AS (SELECT doc_id, comp, count(*)::BIGINT sz
        |       FROM lab GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*)::BIGINT n_blobs,
        |          sum(sz)::BIGINT n_fg, max(sz)::BIGINT max_blob
        |        FROM bl GROUP BY 1)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width,
        |  CAST(d.h AS INT) AS height,
        |  coalesce(a.n_fg, 0)::BIGINT AS n_fg,
        |  coalesce(a.n_blobs, 0)::BIGINT AS n_blobs,
        |  coalesce(a.max_blob, 0)::BIGINT AS max_blob
        |FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""") { c =>
      val mkInkBmp = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id * 3 + p * 7) % 5 < 2) 30 else 220).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.blobsGray(
          c.documents.select(col("doc_id"),
            mkInkBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_fg"), col("n_blobs"), col("max_blob"))
        .orderBy("doc_id")
    },

    // Horizontal projection-profile TEXT-LINE segmentation — the
    // classic pre-OCR layout step beside mm_blob_labeling: rows with
    // any ink form the profile, maximal runs of consecutive inked rows
    // are the lines (ops/Multimodal.projectionProfile — one
    // partition-local pass per decoded image, O(height) state). The
    // fixture writes LINE-structured ink (rows with (id+y) % 3 = 0
    // stay blank, others carry the speckle law), so line heights and
    // gaps vary per doc key. The oracle regenerates the ink mask
    // arithmetically and segments the inked rows with the
    // gaps-and-islands window device (y - row_number() run groups).
    q("mm_projection_profile",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |ink AS (SELECT doc_id, p // w y FROM px
        |        WHERE (doc_id + p // w) % 3 <> 0
        |          AND (doc_id * 3 + p * 7) % 5 < 2),
        |rw AS (SELECT doc_id, y, count(*)::BIGINT ink
        |       FROM ink GROUP BY 1, 2),
        |isl AS (SELECT doc_id, y, ink,
        |          y - row_number() OVER (PARTITION BY doc_id
        |            ORDER BY y) grp
        |        FROM rw),
        |ln AS (SELECT doc_id, grp, count(*)::BIGINT hgt
        |       FROM isl GROUP BY 1, 2),
        |la AS (SELECT doc_id, count(*)::BIGINT n_lines,
        |         max(hgt)::BIGINT max_line_height FROM ln GROUP BY 1),
        |ra AS (SELECT doc_id, count(*)::BIGINT n_inked_rows,
        |         max(ink)::BIGINT max_row_ink FROM rw GROUP BY 1)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width,
        |  CAST(d.h AS INT) AS height,
        |  coalesce(ra.n_inked_rows, 0)::BIGINT AS n_inked_rows,
        |  coalesce(la.n_lines, 0)::BIGINT AS n_lines,
        |  coalesce(la.max_line_height, 0)::BIGINT AS max_line_height,
        |  coalesce(ra.max_row_ink, 0)::BIGINT AS max_row_ink
        |FROM d LEFT JOIN la ON d.doc_id = la.doc_id
        |LEFT JOIN ra ON d.doc_id = ra.doc_id
        |ORDER BY d.doc_id""") { c =>
      val mkLineBmp = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val inked = (id + y) % 3 != 0 && (id * 3 + p * 7) % 5 < 2
            val gv = (if (inked) 30 else 220).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.projectionProfile(
          c.documents.select(col("doc_id"),
            mkLineBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_inked_rows"), col("n_lines"), col("max_line_height"),
          col("max_row_ink"))
        .orderBy("doc_id")
    },

    // Gray-level histogram ENTROPY per decoded image — the standard
    // image-complexity screen (blank scans ~0 bits, dense texture
    // approaches ln(levels)) a multimodal curation pass thresholds on
    // beside sharpness and quality. ops/Multimodal.entropyGray keeps
    // the level fold in pinned ascending order so the only FP inputs
    // are ln() of exact integer counts (the accepted engine-ln class);
    // the oracle regenerates the bimodal pixel law (the
    // mm_otsu_threshold fixture) and replays the identical
    // ln(n) - sum(cnt*ln cnt)/n fold via list_reduce.
    q("mm_image_entropy",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |g AS (SELECT doc_id, w, h,
        |        (CASE WHEN (doc_id + p) % 3 = 0
        |              THEN 40 + (doc_id * 7 + p * 5) % 30
        |              ELSE 170 + (doc_id * 3 + p * 11) % 40
        |         END)::BIGINT v
        |      FROM px),
        |hist AS (SELECT doc_id, w, h, v, count(*)::BIGINT cnt
        |         FROM g GROUP BY 1, 2, 3, 4),
        |st AS (SELECT doc_id, max(w) w, max(h) h, sum(cnt)::BIGINT n,
        |         count(*)::BIGINT lev, max(cnt)::BIGINT mx,
        |         list_reduce(list(cnt * ln(cnt) ORDER BY v),
        |           (a, x) -> a + x) acc
        |       FROM hist GROUP BY 1)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT)
        |  AS height, CAST(lev AS INT) AS n_levels,
        |  mx AS max_count, round(ln(n) - acc / n + 1e-9, 6) AS entropy
        |FROM st ORDER BY doc_id""") { c =>
      val mkBimodalBmp = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val gv = (if ((id + p) % 3 == 0) 40 + (id * 7 + p * 5) % 30
                      else 170 + (id * 3 + p * 11) % 40).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.entropyGray(
          c.documents.select(col("doc_id"),
            mkBimodalBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_levels"), col("max_count"),
          r6(col("entropy")).as("entropy"))
        .orderBy("doc_id")
    },

    // Content bounding box / AUTO-CROP per decoded image — the
    // margin-removal step before OCR or thumbnailing: the tightest
    // rectangle containing every ink pixel
    // (ops/Multimodal.cropBbox — one partition-local pass, O(1)
    // state; blank images report the -1 empty box). The fixture
    // reuses the line-structured ink law of mm_projection_profile, so
    // crops vary in both axes; the oracle recovers the box with
    // min/max over the regenerated ink coordinates.
    q("mm_crop_bbox",
      """WITH d AS (SELECT doc_id, (4 + doc_id % 5)::BIGINT w,
        |             (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |ink AS (SELECT doc_id, p % w x, p // w y FROM px
        |        WHERE (doc_id + p // w) % 3 <> 0
        |          AND (doc_id * 3 + p * 7) % 5 < 2),
        |a AS (SELECT doc_id, count(*)::BIGINT n_fg, min(x) x0,
        |        max(x) x1, min(y) y0, max(y) y1 FROM ink GROUP BY 1)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width,
        |  CAST(d.h AS INT) AS height,
        |  coalesce(a.n_fg, 0)::BIGINT AS n_fg,
        |  CAST(coalesce(a.x0, -1) AS INT) AS x0,
        |  CAST(coalesce(a.x1, -1) AS INT) AS x1,
        |  CAST(coalesce(a.y0, -1) AS INT) AS y0,
        |  CAST(coalesce(a.y1, -1) AS INT) AS y1,
        |  CAST(CASE WHEN a.n_fg IS NULL THEN 0
        |            ELSE a.x1 - a.x0 + 1 END AS INT) AS crop_w,
        |  CAST(CASE WHEN a.n_fg IS NULL THEN 0
        |            ELSE a.y1 - a.y0 + 1 END AS INT) AS crop_h
        |FROM d LEFT JOIN a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""") { c =>
      val mkLineBmp2 = udf((id: Long) => {
        val w = 4 + (id % 5).toInt; val h = 2 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y.toLong * w + x
            val inked = (id + y) % 3 != 0 && (id * 3 + p * 7) % 5 < 2
            val gv = (if (inked) 30 else 220).toByte
            b.put(gv).put(gv).put(gv)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.cropBbox(
          c.documents.select(col("doc_id"),
            mkLineBmp2(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_fg"), col("x0"), col("x1"), col("y0"), col("y1"),
          col("crop_w"), col("crop_h"))
        .orderBy("doc_id")
    },

    q("mm_decode_bmp",
      """WITH d AS (SELECT doc_id, (2 + doc_id % 3)::BIGINT w,
        |                  (1 + doc_id % 2)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h,
        |         unnest(range(0, w * h)) AS p FROM d),
        |v AS (SELECT doc_id, w, h,
        |        (doc_id * 31 + p * 3) % 256 AS r,
        |        (doc_id * 31 + p * 3 + 1) % 256 AS g,
        |        (doc_id * 31 + p * 3 + 2) % 256 AS b
        |      FROM px)
        |SELECT doc_id, 'bmp' AS format,
        |       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       round(avg(r) + 1e-9, 6) AS mean_r,
        |       round(avg(g) + 1e-9, 6) AS mean_g,
        |       round(avg(b) + 1e-9, 6) AS mean_b
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)          // file header
          .putInt(40).putInt(w).putInt(h)              // info: w, +h = bottom-up
          .putShort(1).putShort(24).putInt(0)          // planes, 24bpp, BI_RGB
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        // logical pixel (y top-down, x) channel c value:
        //   (id*31 + (y*w+x)*3 + c) % 256, stored bottom-up as BGR
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow // bottom-up
          (0 until w).foreach { x =>
            val base = id * 31 + (y.toLong * w + x) * 3
            b.put(((base + 2) % 256).toByte) // B
              .put(((base + 1) % 256).toByte) // G
              .put((base % 256).toByte)       // R
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte)) // padding
        }
        b.array()
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"), mkBmp(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r6(col("mean_r")).as("mean_r"), r6(col("mean_g")).as("mean_g"),
          r6(col("mean_b")).as("mean_b"))
        .orderBy("doc_id")
    },

    // Box-filter RESIZE over real decoded pixels (r8 — the "resize"
    // leg of the multimodal brief beside decode): genuine BMPs from
    // doc keys, factor-2 area pooling in Multimodal.resizeBox, the
    // pooled grid emitted as INTEGER block sums so the kernel is under
    // the exact-hash gate; the oracle regenerates the pixel formula
    // and pools arithmetically (x//2, y//2 blocks).
    q("mm_resize",
      """WITH d AS (SELECT doc_id, 2*(2 + doc_id % 3) w,
        |                  2*(1 + doc_id % 2) h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |v AS (SELECT doc_id, w, h, p % w AS x, p // w AS y,
        |        (doc_id * 31 + p * 3) % 256 r,
        |        (doc_id * 31 + p * 3 + 1) % 256 g,
        |        (doc_id * 31 + p * 3 + 2) % 256 b
        |      FROM px),
        |blk AS (SELECT doc_id, w, h, x // 2 cbx, y // 2 cby,
        |          sum(r) sr, sum(g) sg, sum(b) sb
        |        FROM v GROUP BY 1, 2, 3, 4, 5)
        |SELECT doc_id, 'bmp' AS format,
        |       CAST(max(w) AS INT) AS src_w, CAST(max(h) AS INT) AS src_h,
        |       CAST(max(w) // 2 AS INT) AS out_w,
        |       CAST(max(h) // 2 AS INT) AS out_h,
        |       string_agg(sr || ':' || sg || ':' || sb, ';'
        |                  ORDER BY cby, cbx) AS grid_csv
        |FROM blk GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 2 * (2 + (id % 3).toInt); val h = 2 * (1 + (id % 2).toInt)
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val base = id * 31 + (y.toLong * w + x) * 3
            b.put(((base + 2) % 256).toByte)
              .put(((base + 1) % 256).toByte)
              .put((base % 256).toByte)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.resizeBox(
          c.documents.select(col("doc_id"),
            mkBmp(col("doc_id")).as("payload")),
          "doc_id", factor = 2)
        .toDF()
        .orderBy("doc_id")
    },

    // Stride FRAME SAMPLING over a clip container (r8 — the
    // video-shaped leg of the multimodal brief): clips are "GCLP" +
    // frame count + length-prefixed BMP frames generated from doc
    // keys; Multimodal.sampleFrames decodes ONLY every 2nd frame
    // (unsampled frames are skipped by their length header — at
    // archive scale the sampler must not pay decode for dropped
    // frames). One row per sampled frame, per-channel means
    // hash-checked against the regenerated pixel formula.
    q("mm_frame_sample",
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 nf FROM documents),
        |fr AS (SELECT doc_id, unnest(range(0, nf)) f FROM d),
        |sel AS (SELECT doc_id, f FROM fr WHERE f % 2 = 0),
        |px AS (SELECT doc_id, f, unnest(range(0, 6)) p FROM sel),
        |v AS (SELECT doc_id, f,
        |        (doc_id * 31 + f * 97 + p * 3) % 256 r,
        |        (doc_id * 31 + f * 97 + p * 3 + 1) % 256 g,
        |        (doc_id * 31 + f * 97 + p * 3 + 2) % 256 b
        |      FROM px)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx, 'bmp' AS format,
        |       3 AS width, 2 AS height,
        |       round(avg(r) + 1e-9, 6) AS mean_r,
        |       round(avg(g) + 1e-9, 6) AS mean_g,
        |       round(avg(b) + 1e-9, 6) AS mean_b
        |FROM v GROUP BY doc_id, f ORDER BY doc_id, frame_idx""") { c =>
      val mkClip = udf((id: Long) => {
        val w = 3; val h = 2
        val rowSize = ((w * 3 + 3) / 4) * 4
        val frameLen = 54 + rowSize * h
        def frame(f: Int): Array[Byte] = {
          val b = java.nio.ByteBuffer.allocate(frameLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put('B'.toByte).put('M'.toByte).putInt(frameLen)
            .putShort(0).putShort(0).putInt(54)
            .putInt(40).putInt(w).putInt(h)
            .putShort(1).putShort(24).putInt(0)
            .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0)
            .putInt(0)
          (0 until h).foreach { fileRow =>
            val y = h - 1 - fileRow
            (0 until w).foreach { x =>
              val base = id * 31 + f * 97L + (y.toLong * w + x) * 3
              b.put(((base + 2) % 256).toByte)
                .put(((base + 1) % 256).toByte)
                .put((base % 256).toByte)
            }
            (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
          }
          b.array()
        }
        val nf = 3 + (id % 4).toInt
        val clip = java.nio.ByteBuffer
          .allocate(8 + nf * (4 + frameLen))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        clip.put("GCLP".getBytes("US-ASCII")).putInt(nf)
        (0 until nf).foreach(f => clip.putInt(frameLen).put(frame(f)))
        clip.array()
      })
      Multimodal.sampleFrames(
          c.documents.select(col("doc_id"),
            mkClip(col("doc_id")).as("payload")),
          "doc_id", stride = 2)
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("format"),
          col("width"), col("height"),
          r6(col("mean_r")).as("mean_r"), r6(col("mean_g")).as("mean_g"),
          r6(col("mean_b")).as("mean_b"))
        .orderBy("doc_id", "frame_idx")
    },

    // Scene-cut detection over the SAME clip container as
    // mm_frame_sample — the keyframe-selection step a video ingest
    // runs before captioning/embedding (PySceneDetect's content
    // detector reduced to its luma-delta core): decode EVERY frame
    // (stride 1), one per-doc window lag over the frame index, and a
    // cut wherever the mean-channel jump between consecutive frames
    // exceeds the threshold. The compare runs on the ROUNDED means
    // (the FP-boolean rule — both engines compare the same 6-dp
    // lattice), the window is partitioned per doc (frame count is
    // clip-bounded), and the decode stays the partition-local
    // mapPartitions scan — zero shuffles before the final per-doc
    // aggregate. Output: frames, cuts, and the first cut index
    // (keyframe) per clip.
    q("mm_scene_cuts",
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 nf FROM documents),
        |fr AS (SELECT doc_id, unnest(range(0, nf)) f FROM d),
        |px AS (SELECT doc_id, f, unnest(range(0, 6)) p FROM fr),
        |v AS (SELECT doc_id, f,
        |        round(avg((doc_id * 31 + f * 97 + p * 3) % 256)
        |              + 1e-9, 6) mr
        |      FROM px GROUP BY 1, 2),
        |dl AS (SELECT doc_id, f, mr,
        |         abs(mr - lag(mr) OVER (PARTITION BY doc_id
        |                                ORDER BY f)) dm
        |       FROM v),
        |c AS (SELECT doc_id, count(*)::BIGINT n_frames,
        |        count(*) FILTER (dm > 40.0)::BIGINT n_cuts,
        |        min(CASE WHEN dm > 40.0 THEN f END) fc
        |      FROM dl GROUP BY 1)
        |SELECT doc_id, n_frames, n_cuts,
        |       CAST(fc AS INT) AS first_cut_idx
        |FROM c ORDER BY doc_id""") { c =>
      import org.apache.spark.sql.expressions.Window
      val mkClip = udf((id: Long) => {
        val w = 3; val h = 2
        val rowSize = ((w * 3 + 3) / 4) * 4
        val frameLen = 54 + rowSize * h
        def frame(f: Int): Array[Byte] = {
          val b = java.nio.ByteBuffer.allocate(frameLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put('B'.toByte).put('M'.toByte).putInt(frameLen)
            .putShort(0).putShort(0).putInt(54)
            .putInt(40).putInt(w).putInt(h)
            .putShort(1).putShort(24).putInt(0)
            .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0)
            .putInt(0)
          (0 until h).foreach { fileRow =>
            val y = h - 1 - fileRow
            (0 until w).foreach { x =>
              val base = id * 31 + f * 97L + (y.toLong * w + x) * 3
              b.put(((base + 2) % 256).toByte)
                .put(((base + 1) % 256).toByte)
                .put((base % 256).toByte)
            }
            (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
          }
          b.array()
        }
        val nf = 3 + (id % 4).toInt
        val clip = java.nio.ByteBuffer
          .allocate(8 + nf * (4 + frameLen))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        clip.put("GCLP".getBytes("US-ASCII")).putInt(nf)
        (0 until nf).foreach(f => clip.putInt(frameLen).put(frame(f)))
        clip.array()
      })
      val frames = Multimodal.sampleFrames(
          c.documents.select(col("doc_id"),
            mkClip(col("doc_id")).as("payload")),
          "doc_id", stride = 1)
        .toDF()
        .select(col("doc_id"), col("frame_idx"),
          r6(col("mean_r")).as("mr"))
      val wd = Window.partitionBy("doc_id").orderBy("frame_idx")
      val dl = frames.select(col("doc_id"), col("frame_idx"),
        abs(col("mr") - lag(col("mr"), 1).over(wd)).as("dm"))
      dl.groupBy("doc_id").agg(
          count(lit(1)).as("n_frames"),
          sum(when(col("dm") > 40.0, 1L).otherwise(0L)).as("n_cuts"),
          min(when(col("dm") > 40.0, col("frame_idx")))
            .as("first_cut_idx"))
        .orderBy("doc_id")
    },

    // REAL sample decode (r5): genuine PCM16 WAV files (RIFF chunk
    // walk, little-endian int16 samples) generated from doc keys;
    // Multimodal.decodeWavPcm16 recovers the waveform and the query
    // reports mean / RMS / absolute peak — hash-checked against an
    // oracle that regenerates the sample formula.
    // Image-quality GATE (the LAION-style brightness/contrast/clipping
    // screen an image corpus runs at ingest): genuine BMPs from doc
    // keys — every 7th doc a flat near-black frame, the rest textured —
    // Multimodal.imageQuality decodes and accumulates EXACT integer
    // Rec.709 luma sums (×10⁴ weights, no division in the kernel), and
    // the query derives brightness/contrast plus integer-compare flags.
    // The flags screen on the ROUNDED contrast (both engines compare
    // the same 4-dp lattice value — the FP-boolean rule). Oracle
    // regenerates the pixel formula; Σlum² stays exact BIGINT on both
    // sides and is cast to DOUBLE once, identically.
    q("mm_image_quality",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |                  (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |v AS (SELECT doc_id, w, h,
        |        CASE WHEN doc_id % 7 = 0 THEN 8
        |             ELSE (doc_id * 31 + p * 3) % 256 END r,
        |        CASE WHEN doc_id % 7 = 0 THEN 8
        |             ELSE (doc_id * 31 + p * 3 + 1) % 256 END g,
        |        CASE WHEN doc_id % 7 = 0 THEN 8
        |             ELSE (doc_id * 31 + p * 3 + 2) % 256 END b
        |      FROM px),
        |l AS (SELECT doc_id, w, h,
        |        2126 * r + 7152 * g + 722 * b lum FROM v),
        |a AS (SELECT doc_id, CAST(max(w) AS INT) width,
        |        CAST(max(h) AS INT) height,
        |        count(*)::BIGINT n_px, sum(lum)::BIGINT sum_luma,
        |        sum(lum * lum)::BIGINT sq,
        |        sum(CASE WHEN lum >= 2400000 THEN 1 ELSE 0 END)::BIGINT
        |          n_bright,
        |        sum(CASE WHEN lum <= 160000 THEN 1 ELSE 0 END)::BIGINT
        |          n_dark
        |      FROM l GROUP BY 1),
        |o AS (SELECT doc_id, width, height, n_px, sum_luma, n_bright,
        |        n_dark,
        |        round(sum_luma / (n_px * 10000.0) + 1e-9, 4) brightness,
        |        round(sqrt(greatest(n_px::DOUBLE * sq::DOUBLE
        |            - sum_luma::DOUBLE * sum_luma::DOUBLE, 0.0))
        |          / (n_px * 10000.0) + 1e-9, 4) contrast
        |      FROM a)
        |SELECT doc_id, width, height, n_px, sum_luma, n_bright, n_dark,
        |       brightness, contrast,
        |       (contrast = 0.0) AS is_flat,
        |       (n_dark * 2 > n_px) AS is_dark
        |FROM o ORDER BY doc_id""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            if (id % 7 == 0)
              b.put(8.toByte).put(8.toByte).put(8.toByte)
            else {
              val base = id * 31 + (y.toLong * w + x) * 3
              b.put(((base + 2) % 256).toByte)
                .put(((base + 1) % 256).toByte)
                .put((base % 256).toByte)
            }
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      val a = Multimodal.imageQuality(
          c.documents.select(col("doc_id"),
            mkBmp(col("doc_id")).as("payload")), "doc_id")
        .toDF()
      val o = a.select(col("doc_id"), col("width"), col("height"),
        col("n_px"), col("sum_luma"), col("n_bright"), col("n_dark"),
        r4(col("sum_luma") / (col("n_px") * lit(10000.0)))
          .as("brightness"),
        r4(sqrt(greatest(
            col("n_px").cast("double") * col("sum_luma_sq").cast("double")
              - col("sum_luma").cast("double")
                * col("sum_luma").cast("double"), lit(0.0)))
          / (col("n_px") * lit(10000.0))).as("contrast"))
      o.withColumn("is_flat", col("contrast") === 0.0)
        .withColumn("is_dark", col("n_dark") * 2 > col("n_px"))
        .orderBy("doc_id")
    },

    // N-gram NOVELTY of a held-out split (the memorization screen —
    // what fraction of eval bigrams never appear in training data? low
    // novelty means the eval set leaks): deterministic doc_id%5 split,
    // distinct train bigram set, test bigrams anti-joined against it.
    // Counts are exact integers; the join is bigram-keyed (the dedup
    // shuffle shape). One explode + two hash aggregates + one
    // left-anti join.
    q("llm_ngram_novelty",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') ws
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |         for i in generate_series(1, len(ws) - 1)]) b
        |       FROM t WHERE len(ws) >= 2),
        |tr AS (SELECT DISTINCT b FROM bg WHERE doc_id % 5 <> 0),
        |te AS (SELECT b, count(*)::BIGINT c FROM bg
        |       WHERE doc_id % 5 = 0 GROUP BY 1),
        |nv AS (SELECT te.b, te.c FROM te LEFT JOIN tr ON te.b = tr.b
        |       WHERE tr.b IS NULL),
        |s AS (SELECT (SELECT sum(c) FROM te)::BIGINT test_total,
        |        (SELECT count(*) FROM te)::BIGINT test_distinct,
        |        coalesce((SELECT sum(c) FROM nv), 0)::BIGINT novel_occ,
        |        coalesce((SELECT count(*) FROM nv), 0)::BIGINT
        |          novel_distinct)
        |SELECT test_total, test_distinct, novel_occ, novel_distinct,
        |  round(novel_occ * 1.0 / test_total + 1e-9, 6)
        |    AS novelty_rate,
        |  round(novel_distinct * 1.0 / test_distinct + 1e-9, 6)
        |    AS distinct_novelty_rate
        |FROM s""") { c =>
      val t = c.documents.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("ws"))
      val bg = t.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 2), " +
            "i -> concat(ws[i], ' ', ws[i + 1]))")).as("b"))
      val tr = bg.filter(col("doc_id") % 5 =!= 0).select("b").distinct()
      val te = bg.filter(col("doc_id") % 5 === 0)
        .groupBy("b").agg(count(lit(1)).as("c"))
      val nv = te.join(tr, Seq("b"), "left_anti")
      val tot = te.agg(sum(col("c")).as("test_total"),
        count(lit(1)).as("test_distinct"))
      val nov = nv.agg(coalesce(sum(col("c")), lit(0L)).as("novel_occ"),
        count(lit(1)).as("novel_distinct"))
      tot.crossJoin(broadcast(nov))
        .select(col("test_total"), col("test_distinct"),
          col("novel_occ"), col("novel_distinct"),
          r6(col("novel_occ") * lit(1.0) / col("test_total"))
            .as("novelty_rate"),
          r6(col("novel_distinct") * lit(1.0) / col("test_distinct"))
            .as("distinct_novelty_rate"))
    },

    // Explainable FILTER REPORT (the "why was this document dropped"
    // attribution every curation pipeline owes its users — a bare keep
    // rate hides which rule does the damage): four cheap integer
    // rules (too short, repetitious top-bigram, low type/token
    // diversity, missing stopwords), each decided by INTEGER
    // cross-multiplication (no FP ratio ever compared), reported as
    // per-source rule-hit counts and keep rates. One corpus pass +
    // one bigram aggregate; the report is source-count-sized.
    q("llm_filter_report",
      """WITH t AS (SELECT doc_id, source,
        |    string_split_regex(lower(trim(text)), '\s+') ws
        |  FROM documents),
        |base AS (SELECT doc_id, source, len(ws) nw,
        |    len(list_distinct(ws)) ndw,
        |    len(list_filter(ws, w -> w IN
        |      ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) nsw
        |  FROM t),
        |bg AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |         for i in generate_series(1, len(ws) - 1)]) b
        |       FROM t WHERE len(ws) >= 2),
        |bc AS (SELECT doc_id, count(*) nb, max(c) mb FROM (
        |         SELECT doc_id, b, count(*) c FROM bg GROUP BY 1, 2)
        |       GROUP BY 1),
        |r AS (SELECT base.doc_id, base.source,
        |        CASE WHEN base.nw < 40 THEN 1 ELSE 0 END r_short,
        |        CASE WHEN coalesce(bc.mb, 0) * 10 >=
        |          coalesce(bc.nb, 1) THEN 1 ELSE 0 END r_repeat,
        |        CASE WHEN base.ndw * 10 < base.nw * 3
        |          THEN 1 ELSE 0 END r_lowdiv,
        |        CASE WHEN base.nsw * 100 < base.nw * 2
        |          THEN 1 ELSE 0 END r_nostop
        |      FROM base LEFT JOIN bc ON base.doc_id = bc.doc_id)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(r_short)::BIGINT AS n_short,
        |  sum(r_repeat)::BIGINT AS n_repeat,
        |  sum(r_lowdiv)::BIGINT AS n_lowdiv,
        |  sum(r_nostop)::BIGINT AS n_nostop,
        |  sum(CASE WHEN r_short + r_repeat + r_lowdiv + r_nostop = 0
        |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  round(sum(CASE WHEN r_short + r_repeat + r_lowdiv + r_nostop
        |        = 0 THEN 1 ELSE 0 END) * 1.0 / count(*) + 1e-9, 4)
        |    AS keep_rate
        |FROM r GROUP BY 1 ORDER BY source""") { c =>
      val t = c.documents.select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("ws"))
      val base = t.select(col("doc_id"), col("source"),
        size(col("ws")).as("nw"),
        size(array_distinct(col("ws"))).as("ndw"),
        size(filter(col("ws"), w => w.isin("the", "a", "of", "and",
          "is", "to", "in"))).as("nsw"))
      val bg = t.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 2), " +
            "i -> concat(ws[i], ' ', ws[i + 1]))")).as("b"))
      val bc = bg.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nb"), max(col("c")).as("mb"))
      val r = base.join(bc, Seq("doc_id"), "left")
        .select(col("source"),
          when(col("nw") < 40, 1L).otherwise(0L).as("r_short"),
          when(coalesce(col("mb"), lit(0L)) * 10 >=
            coalesce(col("nb"), lit(1L)), 1L).otherwise(0L)
            .as("r_repeat"),
          when(col("ndw") * 10 < col("nw") * 3, 1L).otherwise(0L)
            .as("r_lowdiv"),
          when(col("nsw") * 100 < col("nw") * 2, 1L).otherwise(0L)
            .as("r_nostop"))
      val kept = (col("r_short") + col("r_repeat") + col("r_lowdiv") +
        col("r_nostop")) === 0
      r.groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(col("r_short")).as("n_short"),
          sum(col("r_repeat")).as("n_repeat"),
          sum(col("r_lowdiv")).as("n_lowdiv"),
          sum(col("r_nostop")).as("n_nostop"),
          sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
        .select(col("source"), col("n_docs"), col("n_short"),
          col("n_repeat"), col("n_lowdiv"), col("n_nostop"),
          col("n_kept"),
          r4(col("n_kept") * lit(1.0) / col("n_docs")).as("keep_rate"))
        .orderBy("source")
    },

    // Image SHARPNESS gate (the blur/flat-fill screen beside
    // mm_image_quality's exposure screen): same generated BMPs (every
    // 7th doc a flat frame), Multimodal.imageSharpness scans the
    // integer luma grid for horizontal+vertical gradient energy,
    // distinct-luma count, and the dominant luma's share — flat frames
    // show grad 0 / distinct 1 / share 1.0, textured frames don't.
    // All-integer outputs; the oracle regenerates the pixel formula
    // and differences it arithmetically. Partition-local, zero
    // shuffle.
    q("mm_image_sharpness",
      """WITH d AS (SELECT doc_id, (8 + doc_id % 5)::BIGINT w,
        |                  (6 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) p FROM d),
        |v AS (SELECT doc_id, w, h, p % w x, p // w y,
        |        CASE WHEN doc_id % 7 = 0 THEN 8 * 10000
        |             ELSE 2126 * ((doc_id * 31 + p * 3) % 256)
        |                + 7152 * ((doc_id * 31 + p * 3 + 1) % 256)
        |                +  722 * ((doc_id * 31 + p * 3 + 2) % 256) END
        |          lum
        |      FROM px),
        |gh AS (SELECT a.doc_id, sum(abs(b.lum - a.lum))::BIGINT g
        |       FROM v a JOIN v b ON a.doc_id = b.doc_id
        |         AND b.y = a.y AND b.x = a.x + 1
        |       GROUP BY 1),
        |gv AS (SELECT a.doc_id, sum(abs(b.lum - a.lum))::BIGINT g
        |       FROM v a JOIN v b ON a.doc_id = b.doc_id
        |         AND b.x = a.x AND b.y = a.y + 1
        |       GROUP BY 1),
        |dl AS (SELECT doc_id, count(*)::BIGINT n_px,
        |         count(DISTINCT lum)::BIGINT nd FROM v GROUP BY 1),
        |dm AS (SELECT doc_id, max(c)::BIGINT dom FROM (
        |         SELECT doc_id, lum, count(*) c FROM v GROUP BY 1, 2)
        |       GROUP BY 1)
        |SELECT dl.doc_id, CAST(max(d.w) AS INT) AS width,
        |  CAST(max(d.h) AS INT) AS height, dl.n_px,
        |  max(gh.g) AS grad_h, max(gv.g) AS grad_v,
        |  dl.nd AS n_distinct_luma, max(dm.dom) AS dom_luma_count
        |FROM dl JOIN d ON dl.doc_id = d.doc_id
        |JOIN gh ON dl.doc_id = gh.doc_id
        |JOIN gv ON dl.doc_id = gv.doc_id
        |JOIN dm ON dl.doc_id = dm.doc_id
        |GROUP BY dl.doc_id, dl.n_px, dl.nd ORDER BY dl.doc_id""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            if (id % 7 == 0)
              b.put(8.toByte).put(8.toByte).put(8.toByte)
            else {
              val base = id * 31 + (y.toLong * w + x) * 3
              b.put(((base + 2) % 256).toByte)
                .put(((base + 1) % 256).toByte)
                .put((base % 256).toByte)
            }
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      Multimodal.imageSharpness(
          c.documents.select(col("doc_id"),
            mkBmp(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .orderBy("doc_id")
    },

    // Framewise audio features (the VAD-style silence/energy screen of
    // an audio ingest): genuine PCM16 WAVs from doc keys — every 5th
    // doc near-silent (|s| ≤ 3), the rest full-scale —
    // Multimodal.audioFeatures decodes and walks 8-sample frames with
    // O(1) state: integer energy Σs², strict sign-flip zero crossings,
    // silence by integer peak < 500. Every output column is an integer
    // count/sum, exact on any engine; the oracle regenerates the
    // sample formula and frames by i // 8.
    q("mm_wav_features",
      """WITH d AS (SELECT doc_id, (16 + doc_id % 16)::BIGINT n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |v AS (SELECT doc_id, n, i, i // 8 f,
        |        CASE WHEN doc_id % 5 = 0
        |             THEN ((doc_id * 13 + i * 5) % 7) - 3
        |             ELSE ((doc_id * 13 + i * 5) % 4001) - 2000 END s
        |      FROM sm),
        |w AS (SELECT doc_id, n, i, f, s,
        |        lag(s) OVER (PARTITION BY doc_id ORDER BY i) prev
        |      FROM v),
        |fr AS (SELECT doc_id, max(n) n, f,
        |         sum(s * s)::BIGINT energy,
        |         sum(CASE WHEN i % 8 <> 0 AND prev * s < 0
        |             THEN 1 ELSE 0 END)::BIGINT zc,
        |         max(abs(s)) pk
        |       FROM w GROUP BY doc_id, f)
        |SELECT doc_id, max(n) AS n_samples,
        |       count(*)::BIGINT AS n_frames,
        |       sum(zc)::BIGINT AS total_zc,
        |       sum(CASE WHEN pk < 500 THEN 1 ELSE 0 END)::BIGINT
        |         AS silent_frames,
        |       max(energy) AS max_frame_energy
        |FROM fr GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkWavPcm = udf((id: Long) => {
        val n = 16 + (id % 16).toInt
        val b = java.nio.ByteBuffer.allocate(44 + n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
          .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)
          .putInt(8000).putInt(8000 * 2)
          .putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(n * 2)
        (0 until n).foreach { i =>
          val s =
            if (id % 5 == 0) ((id * 13 + i.toLong * 5) % 7) - 3
            else ((id * 13 + i.toLong * 5) % 4001) - 2000
          b.putShort(s.toShort)
        }
        b.array()
      })
      Multimodal.audioFeatures(
          c.documents.select(col("doc_id"),
            mkWavPcm(col("doc_id")).as("payload")),
          "doc_id", frameLen = 8, silencePeak = 500)
        .toDF()
        .orderBy("doc_id")
    },

    // BINARY exact dedup (the zero-decode first pass of any media
    // pipeline — drop byte-identical files by content digest before
    // paying a single codec cycle): md5 over the raw payload, keep the
    // smallest doc_id per digest group. The oracle derives the SAME
    // equivalence classes arithmetically from the generator key
    // (texture k, brightness offset, perturbation flag ⇔ byte
    // equality). One shuffle on the digest — the dedup_exact shape on
    // binary columns.
    q("mm_exact_dedup",
      """WITH d AS (SELECT doc_id, doc_id % 40 k,
        |    (doc_id // 40) % 3 boff,
        |    CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END pert
        |  FROM documents)
        |SELECT min(doc_id) AS keeper, count(*)::BIGINT AS n_copies
        |FROM d GROUP BY k, boff, pert ORDER BY keeper""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 8; val h = 8
        val k = id % 40
        val off = ((id / 40) % 3).toInt * 4
        val pp = if (id % 97 == 0) (id % 40).toInt else -1
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y * w + x
            val bump = if (p == pp) 40 else 0
            def v(ci: Int): Int =
              ((k * 31 + p * 3 + ci) % 200).toInt + off + bump
            b.put(v(2).toByte).put(v(1).toByte).put(v(0).toByte)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      c.documents
        .select(col("doc_id"), mkBmp(col("doc_id")).as("payload"))
        .groupBy(md5(col("payload")).as("digest"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"))
        .select(col("keeper"), col("n_copies"))
        .orderBy("keeper")
    },

    // Perceptual-hash IMAGE DEDUP (pHash, Zauner 2010 — the image leg
    // of corpus dedup): genuine 8×8 BMPs where doc_id%40 picks the
    // texture, a brightness offset varies per doc (shifts only the DC
    // coefficient — same hash, by construction), and every 97th doc
    // gets a one-pixel bump (small nonzero hamming). Multimodal.phash8
    // computes the integer-DCT hash partition-locally; dedup is the
    // SCALE SHAPE: cluster by exact hash, then banded hamming-≤2
    // candidate join over the DISTINCT hashes (3 bands × 5 bits;
    // pigeonhole — ≤2 flipped bits leave a band intact, recall 1.0),
    // bit_count(xor) verify on candidates only. The oracle recomputes
    // the same integer DCT from the pixel formula with the VERBATIM
    // cosine table and checks near-neighbors by exact all-pairs over
    // the tiny distinct-hash set.
    q("mm_phash_dedup",
      """WITH ct AS (SELECT [1000, 981, 924, 831, 707, 556, 383, 195,
        |  1000, 831, 383, -195, -707, -981, -924, -556,
        |  1000, 556, -383, -981, -707, 195, 924, 831,
        |  1000, 195, -924, -556, 707, 831, -383, -981,
        |  1000, -195, -924, 556, 707, -831, -383, 981,
        |  1000, -556, -383, 981, -707, -195, 924, -831,
        |  1000, -831, 383, 195, -707, 981, -924, 556,
        |  1000, -981, 924, -831, 707, -556, 383, -195] c),
        |d AS (SELECT doc_id, doc_id % 40 k, ((doc_id // 40) % 3) * 4 boff,
        |        CASE WHEN doc_id % 97 = 0 THEN doc_id % 40 ELSE -1 END pp
        |      FROM documents),
        |px AS (SELECT doc_id, k, boff, pp, unnest(range(0, 64)) p FROM d),
        |l AS (SELECT doc_id, p % 8 x, p // 8 y,
        |        2126 * ((k * 31 + p * 3) % 200 + boff
        |                + CASE WHEN p = pp THEN 40 ELSE 0 END)
        |      + 7152 * ((k * 31 + p * 3 + 1) % 200 + boff
        |                + CASE WHEN p = pp THEN 40 ELSE 0 END)
        |      +  722 * ((k * 31 + p * 3 + 2) % 200 + boff
        |                + CASE WHEN p = pp THEN 40 ELSE 0 END) lum
        |      FROM px),
        |uv AS (SELECT unnest(range(1, 16)) uvi),
        |f AS (SELECT l.doc_id, uv.uvi,
        |        sum(l.lum * ct.c[(l.x * 8 + (uv.uvi % 4) + 1)::INT]
        |                  * ct.c[(l.y * 8 + (uv.uvi // 4) + 1)::INT])
        |          ::BIGINT co
        |      FROM l, uv, ct GROUP BY 1, 2),
        |m AS (SELECT doc_id, list_sort(list(co))[8] med FROM f
        |      GROUP BY 1),
        |h AS (SELECT f.doc_id,
        |        sum(CASE WHEN f.co > m.med
        |            THEN (1::BIGINT << (f.uvi - 1)::INT) ELSE 0 END)
        |          ::BIGINT phash
        |      FROM f JOIN m USING (doc_id) GROUP BY 1),
        |cl AS (SELECT phash, count(*)::BIGINT n_docs,
        |         min(doc_id) min_doc FROM h GROUP BY 1),
        |nr AS (SELECT a.phash, count(*)::BIGINT n_near FROM cl a
        |       JOIN cl b ON a.phash <> b.phash
        |         AND bit_count(xor(a.phash, b.phash)) <= 2
        |       GROUP BY 1)
        |SELECT cl.phash, cl.n_docs, cl.min_doc,
        |       coalesce(nr.n_near, 0)::BIGINT AS n_near
        |FROM cl LEFT JOIN nr USING (phash) ORDER BY cl.phash""") { c =>
      val mkBmp = udf((id: Long) => {
        val w = 8; val h = 8
        val k = id % 40
        val off = ((id / 40) % 3).toInt * 4
        val pp = if (id % 97 == 0) (id % 40).toInt else -1
        val rowSize = ((w * 3 + 3) / 4) * 4
        val b = java.nio.ByteBuffer.allocate(54 + rowSize * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
          .putShort(0).putShort(0).putInt(54)
          .putInt(40).putInt(w).putInt(h)
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        (0 until h).foreach { fileRow =>
          val y = h - 1 - fileRow
          (0 until w).foreach { x =>
            val p = y * w + x
            val bump = if (p == pp) 40 else 0
            def v(ci: Int): Int =
              ((k * 31 + p * 3 + ci) % 200).toInt + off + bump
            b.put(v(2).toByte).put(v(1).toByte).put(v(0).toByte)
          }
          (w * 3 until rowSize).foreach(_ => b.put(0.toByte))
        }
        b.array()
      })
      val cl = Multimodal.phash8(
          c.documents.select(col("doc_id"),
            mkBmp(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .groupBy("phash")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .persist()
      cl.count() // materialize once; two consumers + a self-join below
      // banded hamming-candidate join over DISTINCT hashes: 3 bands of
      // 5 bits, band id packed into the key's low 2 bits
      def bandKey(b: Int) =
        (shiftright(col("phash"), b * 5).bitwiseAND(lit(31L))) * 4 + b
      val bands = cl.select(col("phash"),
        explode(array(bandKey(0), bandKey(1), bandKey(2))).as("bk"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.bk") === col("y.bk") &&
            col("x.phash") < col("y.phash"))
        .select(col("x.phash").as("pa"), col("y.phash").as("pb"))
        .distinct()
      val vp = cand.filter(
        bit_count(col("pa").bitwiseXOR(col("pb"))) <= 2)
      val nn = vp.select(col("pa").as("phash"))
        .union(vp.select(col("pb").as("phash")))
        .groupBy("phash").agg(count(lit(1)).as("n_near"))
      cl.join(nn, Seq("phash"), "left")
        .na.fill(0L, Seq("n_near"))
        .select(col("phash"), col("n_docs"), col("min_doc"),
          col("n_near"))
        .orderBy("phash")
    },

    // VAD SEGMENTATION (the gaps-and-islands pass that turns framewise
    // silence flags into utterance segments — what an audio pipeline
    // feeds to ASR): Multimodal.frameFeatures explodes real PCM16
    // decode into per-frame rows (integer energy/peak, silence by
    // threshold), then contiguous ACTIVE runs group by the classic
    // frame_idx − row_number() island key. Per clip: frame count,
    // active frames, segment count, longest utterance. All integers.
    // Scale: partition-local decode, one per-doc window, one
    // aggregate.
    q("mm_audio_vad_segments",
      """WITH d AS (SELECT doc_id, (16 + doc_id % 16)::BIGINT n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |v AS (SELECT doc_id, i, i // 8 f,
        |        CASE WHEN doc_id % 5 = 0
        |             THEN ((doc_id * 13 + i * 5) % 7) - 3
        |             ELSE ((doc_id * 13 + i * 5) % 4001) - 2000 END s
        |      FROM sm),
        |fr AS (SELECT doc_id, f, max(abs(s)) < 500 silent
        |       FROM v GROUP BY doc_id, f),
        |base AS (SELECT doc_id, count(*)::BIGINT n_frames FROM fr
        |         GROUP BY 1),
        |act AS (SELECT doc_id, f,
        |          f - row_number() OVER (PARTITION BY doc_id
        |            ORDER BY f) seg
        |        FROM fr WHERE NOT silent),
        |seg AS (SELECT doc_id, seg, count(*)::BIGINT len FROM act
        |        GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(len)::BIGINT active_frames,
        |          count(*)::BIGINT n_segments, max(len)::BIGINT longest
        |        FROM seg GROUP BY 1)
        |SELECT base.doc_id, base.n_frames,
        |  coalesce(agg.active_frames, 0)::BIGINT AS active_frames,
        |  coalesce(agg.n_segments, 0)::BIGINT AS n_segments,
        |  coalesce(agg.longest, 0)::BIGINT AS longest_active
        |FROM base LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""") { c =>
      val mkWavPcm = udf((id: Long) => {
        val n = 16 + (id % 16).toInt
        val b = java.nio.ByteBuffer.allocate(44 + n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
          .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)
          .putInt(8000).putInt(8000 * 2)
          .putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(n * 2)
        (0 until n).foreach { i =>
          val s =
            if (id % 5 == 0) ((id * 13 + i.toLong * 5) % 7) - 3
            else ((id * 13 + i.toLong * 5) % 4001) - 2000
          b.putShort(s.toShort)
        }
        b.array()
      })
      val fr = Multimodal.frameFeatures(
          c.documents.select(col("doc_id"),
            mkWavPcm(col("doc_id")).as("payload")),
          "doc_id", frameLen = 8, silencePeak = 500)
        .toDF()
        .persist()
      val base = fr.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      val wAct = Window.partitionBy("doc_id").orderBy("frame_idx")
      val act = fr.filter(!col("silent"))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") - row_number().over(wAct)).as("seg"))
      val seg = act.groupBy("doc_id", "seg")
        .agg(count(lit(1)).as("len"))
      val agg = seg.groupBy("doc_id")
        .agg(sum(col("len")).as("active_frames"),
          count(lit(1)).as("n_segments"), max(col("len")).as("longest"))
      base.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("active_frames"), lit(0L)).as("active_frames"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("longest"), lit(0L)).as("longest_active"))
        .orderBy("doc_id")
    },

    q("mm_decode_wav",
      """WITH d AS (SELECT doc_id, (16 + doc_id % 16)::BIGINT n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |v AS (SELECT doc_id, n,
        |        ((doc_id * 13 + i * 5) % 4001) - 2000 AS s FROM sm)
        |SELECT doc_id, 1 AS channels, 8000 AS sample_rate,
        |       max(n) AS n_samples,
        |       round(avg(s) + 1e-9, 6) AS mean,
        |       round(sqrt(avg(s * s)) + 1e-9, 6) AS rms,
        |       CAST(max(abs(s)) AS INT) AS peak
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkWavPcm = udf((id: Long) => {
        val n = 16 + (id % 16).toInt
        val b = java.nio.ByteBuffer.allocate(44 + n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
          .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)                   // PCM, mono
          .putInt(8000).putInt(8000 * 2)
          .putShort(2).putShort(16)                  // block align, 16-bit
          .put("data".getBytes("US-ASCII")).putInt(n * 2)
        (0 until n).foreach(i =>
          b.putShort((((id * 13 + i.toLong * 5) % 4001) - 2000).toShort))
        b.array()
      })
      Multimodal.decodeSamples(
          c.documents.select(col("doc_id"),
            mkWavPcm(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .select(col("doc_id"),
          col("channels").cast("int").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_samples"),
          r6(col("mean")).as("mean"), r6(col("rms")).as("rms"),
          col("peak"))
        .orderBy("doc_id")
    },

    // REAL multimodal metadata: canonical WAV headers are generated
    // from doc keys, and Multimodal.sniff parses them back BYTE BY
    // BYTE (RIFF layout: channels@22 LE, rate@24, block-align@32,
    // data-length@40 → duration). The oracle recomputes the same
    // fields in closed form, so the binary header parser itself is
    // under the exact-hash gate — no codec involved, none needed for
    // container-level metadata.
    q("mm_media_headers",
      """SELECT doc_id, 'wav' AS format,
        |       1 + doc_id % 2 AS channels,
        |       8000 + (doc_id % 4) * 8000 AS sample_rate,
        |       (doc_id % 5) * 1000 AS duration_ms
        |FROM documents ORDER BY doc_id""") { c =>
      val mkWav = udf((id: Long) => {
        val channels = 1 + (id % 2).toInt
        val rate = 8000 + (id % 4).toInt * 8000
        val blockAlign = channels * 2
        val secs = (id % 5).toInt
        val dataLen = rate.toLong * blockAlign * secs
        val b = java.nio.ByteBuffer.allocate(44)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataLen).toInt)
          .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(channels.toShort)
          .putInt(rate).putInt(rate * blockAlign)
          .putShort(blockAlign.toShort).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
        b.array()
      })
      Multimodal.sniffHeaders(
          c.documents.select(col("doc_id"),
            mkWav(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("duration_ms"))
        .orderBy("doc_id")
    },

    // REAL PNG pixel decode (r5): genuine PNG files — CRC-correct
    // chunks, zlib-DEFLATEd scanlines (JDK Deflater), per-row filter
    // rotating through all five types by (id + y) % 5 — are generated
    // from doc keys, and Multimodal.decodePng inverts the whole stack
    // (chunk walk → Inflater → None/Sub/Up/Average/Paeth unfilter) to
    // recover the logical pixels. Per-channel means go under the hash
    // gate against an oracle regenerating the pixel formula; channel c
    // of pixel p is (id*31 + p*3 + c) % 256, i.e. flat index i ↦
    // (id*31 + i) % 256.
    q("mm_decode_png",
      """WITH d AS (SELECT doc_id, (3 + doc_id % 4)::BIGINT w,
        |                  (2 + doc_id % 3)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h,
        |         unnest(range(0, w * h)) AS p FROM d),
        |v AS (SELECT doc_id, w, h,
        |        (doc_id * 31 + p * 3) % 256 AS r,
        |        (doc_id * 31 + p * 3 + 1) % 256 AS g,
        |        (doc_id * 31 + p * 3 + 2) % 256 AS b
        |      FROM px)
        |SELECT doc_id, 'png' AS format,
        |       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       round(avg(r) + 1e-9, 6) AS mean_r,
        |       round(avg(g) + 1e-9, 6) AS mean_g,
        |       round(avg(b) + 1e-9, 6) AS mean_b
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkPng = udf((id: Long) => {
        val w = 3 + (id % 4).toInt; val h = 2 + (id % 3).toInt
        val px = Array.tabulate(w * h * 3)(i => ((id * 31 + i) % 256).toInt)
        Multimodal.encodePng(w, h, 3, px, y => ((id + y) % 5).toInt)
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"), mkPng(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r6(col("mean_r")).as("mean_r"), r6(col("mean_g")).as("mean_g"),
          r6(col("mean_b")).as("mean_b"))
        .orderBy("doc_id")
    },

    // PNG edge layouts, all decoded for REAL by the same chunk-walk +
    // inflate + unfilter path: palette (PLTE, 4-bit packed indices),
    // 16-bit grayscale (full 0-65535 sample range), and Adam7
    // INTERLACED RGB (seven sub-images, independent filters). Each doc
    // rotates through the three layouts; the oracle recomputes the
    // per-channel means closed-form. Same partition-local contract —
    // binary in, stats out, zero shuffles before the final sort.
    q("mm_decode_png_layouts",
      """WITH d AS (SELECT doc_id, doc_id % 3 AS layout,
        |             (4 + doc_id % 3)::BIGINT w,
        |             (3 + doc_id % 2)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, layout, w, h,
        |         unnest(range(0, w * h)) AS p FROM d),
        |v AS (SELECT doc_id, layout, w, h,
        |        CASE layout
        |          WHEN 0 THEN (doc_id * 7 + (((doc_id + p) % 16) * 3) * 13) % 256
        |          WHEN 1 THEN (doc_id * 2513 + p * 97) % 65536
        |          ELSE (doc_id * 31 + p * 3) % 256 END AS r,
        |        CASE layout
        |          WHEN 0 THEN (doc_id * 7 + (((doc_id + p) % 16) * 3 + 1) * 13) % 256
        |          WHEN 1 THEN (doc_id * 2513 + p * 97) % 65536
        |          ELSE (doc_id * 31 + p * 3 + 1) % 256 END AS g,
        |        CASE layout
        |          WHEN 0 THEN (doc_id * 7 + (((doc_id + p) % 16) * 3 + 2) * 13) % 256
        |          WHEN 1 THEN (doc_id * 2513 + p * 97) % 65536
        |          ELSE (doc_id * 31 + p * 3 + 2) % 256 END AS b
        |      FROM px)
        |SELECT doc_id, 'png' AS format,
        |       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       round(avg(r) + 1e-9, 6) AS mean_r,
        |       round(avg(g) + 1e-9, 6) AS mean_g,
        |       round(avg(b) + 1e-9, 6) AS mean_b
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkPng = udf((id: Long) => {
        val w = 4 + (id % 3).toInt; val h = 3 + (id % 2).toInt
        (id % 3) match {
          case 0 =>
            val pal = Array.tabulate(48)(k => ((id * 7 + k * 13) % 256).toInt)
            val idx = Array.tabulate(w * h)(p => ((id + p) % 16).toInt)
            Multimodal.encodePngPalette(w, h, 4, pal, idx,
              y => ((id + y) % 5).toInt)
          case 1 =>
            val px = Array.tabulate(w * h)(p =>
              ((id * 2513 + p * 97) % 65536).toInt)
            Multimodal.encodePng16(w, h, 1, px, y => ((id + y) % 5).toInt)
          case _ =>
            val px = Array.tabulate(w * h * 3)(i =>
              ((id * 31 + i) % 256).toInt)
            Multimodal.encodePngInterlaced(w, h, 3, px,
              y => ((id + y) % 5).toInt)
        }
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"), mkPng(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r6(col("mean_r")).as("mean_r"), r6(col("mean_g")).as("mean_g"),
          r6(col("mean_b")).as("mean_b"))
        .orderBy("doc_id")
    },

    // REAL GIF pixel decode (r5): genuine GIF89a files — 256-entry
    // global color table, LSB-packed variable-width LZW stream with
    // clear/EOI codes and sub-block framing — generated from doc keys;
    // Multimodal.decodeGif runs the LZW decoder written in this repo
    // (dictionary growth, code widening, KwKwK all handled; the spec
    // exercises them against a real compressing encoder) and maps
    // indices through the palette. Pixel p has palette index
    // (id*31 + p) % 256; palette entry i is ((i*7+3)%256, (i*5+1)%256,
    // (i*3+2)%256) — the oracle regenerates both arithmetically.
    q("mm_decode_gif",
      """WITH d AS (SELECT doc_id, (2 + doc_id % 5)::BIGINT w,
        |                  (1 + doc_id % 4)::BIGINT h FROM documents),
        |px AS (SELECT doc_id, w, h,
        |         unnest(range(0, w * h)) AS p FROM d),
        |i AS (SELECT doc_id, w, h, (doc_id * 31 + p) % 256 AS idx FROM px),
        |v AS (SELECT doc_id, w, h,
        |        (idx * 7 + 3) % 256 AS r,
        |        (idx * 5 + 1) % 256 AS g,
        |        (idx * 3 + 2) % 256 AS b
        |      FROM i)
        |SELECT doc_id, 'gif' AS format,
        |       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       round(avg(r) + 1e-9, 6) AS mean_r,
        |       round(avg(g) + 1e-9, 6) AS mean_g,
        |       round(avg(b) + 1e-9, 6) AS mean_b
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val palette = Array.tabulate(768) { k =>
        val i = k / 3
        (k % 3) match {
          case 0 => (i * 7 + 3) % 256
          case 1 => (i * 5 + 1) % 256
          case _ => (i * 3 + 2) % 256
        }
      }
      val mkGif = udf((id: Long) => {
        val w = 2 + (id % 5).toInt; val h = 1 + (id % 4).toInt
        val idx = Array.tabulate(w * h)(p => ((id * 31 + p) % 256).toInt)
        Multimodal.encodeGif(w, h, idx, palette)
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"), mkGif(col("doc_id")).as("payload")),
          "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r6(col("mean_r")).as("mean_r"), r6(col("mean_g")).as("mean_g"),
          r6(col("mean_b")).as("mean_b"))
        .orderBy("doc_id")
    },

    // REAL baseline JPEG pixel decode (r5): genuine grayscale JPEGs —
    // SOI/DQT/SOF0/DHT/SOS, huffman-coded scan with byte stuffing —
    // generated from doc keys and decoded by graft.ops.Jpeg (huffman
    // entropy decode + dequant + IDCT, tables read from the file).
    // Lossy codecs still decode deterministically: each 8×8 block is
    // CONSTANT, so all energy sits in the DC coefficient, which the
    // uniform quant-8 table preserves exactly (round(8v/8)·8 → v) —
    // the decode is bit-exact and sits under the hash gate. Block b
    // (row-major) of doc id has value (id*31 + b*17) % 256.
    q("mm_decode_jpeg",
      """WITH d AS (SELECT doc_id, (8 * (1 + doc_id % 3))::BIGINT w,
        |                  (8 * (1 + doc_id % 2))::BIGINT h FROM documents),
        |b AS (SELECT doc_id, w, h,
        |        unnest(range(0, (w // 8) * (h // 8))) AS blk FROM d),
        |v AS (SELECT doc_id, w, h,
        |        (doc_id * 31 + blk * 17) % 256 AS val FROM b)
        |SELECT doc_id, 'jpeg' AS format,
        |       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       round(avg(val) + 1e-9, 6) AS mean_gray
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkJpeg = udf((id: Long) => {
        val w = 8 * (1 + (id % 3).toInt); val h = 8 * (1 + (id % 2).toInt)
        val blocksX = w / 8
        val px = Array.tabulate(w * h) { i =>
          val blk = (i / w / 8) * blocksX + (i % w) / 8
          ((id * 31 + blk * 17) % 256).toInt
        }
        Jpeg.encodeGray(w, h, px, quant = 8)
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"),
            mkJpeg(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r6(col("mean_r")).as("mean_gray"))
        .orderBy("doc_id")
    },

    // PROGRESSIVE JPEG (SOF2), decoded for REAL through the full §G.2
    // scan machinery: DC first + refinement, spectral-selection AC band
    // scans, successive-approximation AC refinement with EOB-run
    // correction bits. Block-constant images are DC-only so the whole
    // coefficient stream survives the uniform quant table bit-exactly
    // — the oracle recomputes the means closed-form, same contract as
    // the baseline mm_decode_jpeg above.
    q("mm_decode_jpeg_progressive",
      """WITH d AS (SELECT doc_id, (8 * (1 + doc_id % 3))::BIGINT w,
        |                  (8 * (1 + doc_id % 2))::BIGINT h FROM documents),
        |b AS (SELECT doc_id, w, h,
        |        unnest(range(0, (w // 8) * (h // 8))) AS blk FROM d),
        |v AS (SELECT doc_id, w, h,
        |        (doc_id * 43 + blk * 19) % 256 AS val FROM b)
        |SELECT doc_id, 'jpeg' AS format,
        |       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       round(avg(val) + 1e-9, 6) AS mean_gray
        |FROM v GROUP BY doc_id ORDER BY doc_id""") { c =>
      val mkJpeg = udf((id: Long) => {
        val w = 8 * (1 + (id % 3).toInt); val h = 8 * (1 + (id % 2).toInt)
        val blocksX = w / 8
        val px = Array.tabulate(w * h) { i =>
          val blk = (i / w / 8) * blocksX + (i % w) / 8
          ((id * 43 + blk * 19) % 256).toInt
        }
        Jpeg.encodeProgressive(w, h, 1, px, quant = 8)
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"),
            mkJpeg(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r6(col("mean_r")).as("mean_gray"))
        .orderBy("doc_id")
    },

    // REAL baseline COLOR JPEG decode (r5): 4:2:0 YCbCr files (4 luma
    // + 2 subsampled chroma blocks per MCU, separate DC predictors)
    // generated from doc keys and decoded end to end — huffman →
    // dequant → IDCT per plane → replicated chroma upsampling →
    // BT.601 YCbCr→RGB. Constant-color images make every plane
    // DC-only, so the round trip reduces to the color transform plus
    // ONE integer rounding per plane — closed-form in the oracle
    // (floor(x+0.5) = the JVM's math.round). The near-gray offsets
    // (g−r ∈ {−2,−1,1,2}, b−r even) keep every rounded value ≥0.02
    // from a .5 boundary, far above the DCT path's ~1e-13 FP noise,
    // so decoder and oracle can never round apart.
    q("mm_decode_jpeg_color",
      """WITH d AS (SELECT doc_id,
        |        (20 + (doc_id * 31) % 216) * 1.0 AS r,
        |        CASE doc_id % 4 WHEN 0 THEN -2 WHEN 1 THEN -1
        |             WHEN 2 THEN 1 ELSE 2 END * 1.0 AS d1,
        |        ((doc_id // 4) % 3 - 1) * 2.0 AS d2 FROM documents),
        |c AS (SELECT doc_id, r, r + d1 AS g, r + d2 AS b FROM d),
        |y AS (SELECT doc_id,
        |        0.299 * r + 0.587 * g + 0.114 * b AS yy,
        |        -0.168736 * r - 0.331264 * g + 0.5 * b + 128 AS cb,
        |        0.5 * r - 0.418688 * g - 0.081312 * b + 128 AS cr FROM c),
        |q AS (SELECT doc_id, floor(yy - 128 + 0.5) + 128 AS yq,
        |        floor(cb - 128 + 0.5) + 128 AS cbq,
        |        floor(cr - 128 + 0.5) + 128 AS crq FROM y)
        |SELECT doc_id, 'jpeg' AS format,
        |       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |       round(floor(yq + 1.402 * (crq - 128) + 0.5) + 1e-9, 2) AS mean_r,
        |       round(floor(yq - 0.344136 * (cbq - 128) - 0.714136 * (crq - 128) + 0.5) + 1e-9, 2) AS mean_g,
        |       round(floor(yq + 1.772 * (cbq - 128) + 0.5) + 1e-9, 2) AS mean_b
        |FROM q ORDER BY doc_id""") { c =>
      val mkJpegC = udf((id: Long) => {
        val r = 20 + ((id * 31) % 216).toInt
        val d1 = (id % 4).toInt match {
          case 0 => -2; case 1 => -1; case 2 => 1; case _ => 2
        }
        val d2 = (((id / 4) % 3).toInt - 1) * 2
        val rgb = new Array[Int](16 * 16 * 3)
        var i = 0
        while (i < 256) {
          rgb(3 * i) = r; rgb(3 * i + 1) = r + d1; rgb(3 * i + 2) = r + d2
          i += 1
        }
        Jpeg.encodeColorRgb(16, 16, rgb, quant = 8, 2, 2)
      })
      Multimodal.decodePixels(
          c.documents.select(col("doc_id"),
            mkJpegC(col("doc_id")).as("payload")), "doc_id")
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r2(col("mean_r")).as("mean_r"), r2(col("mean_g")).as("mean_g"),
          r2(col("mean_b")).as("mean_b"))
        .orderBy("doc_id")
    },

    // Flesch reading-ease readability scoring — the classic
    // document-quality signal alongside the Gopher repetition filters
    // and entropy metrics. Sentences split on terminal punctuation
    // runs; syllables approximated as vowel-group counts (min 1 per
    // word) — the standard dictionary-free heuristic. Pure per-row
    // string work + one aggregation; no shuffle beyond the doc_id
    // grouping of the exploded words.
    q("text_readability",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |sent AS (SELECT doc_id,
        |              len(list_filter(string_split_regex(text, '[.!?]+'),
        |                  s -> len(trim(s)) > 0)) n_sent
        |         FROM d),
        |w AS (SELECT doc_id,
        |             unnest(regexp_extract_all(lower(text), '[a-z]+')) w
        |      FROM d),
        |syl AS (SELECT doc_id, w,
        |              greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)
        |                sy
        |        FROM w),
        |agg AS (SELECT doc_id, count(*) n_words, sum(sy) n_syll
        |        FROM syl GROUP BY 1)
        |SELECT a.doc_id, a.n_words::BIGINT AS n_words,
        |       s.n_sent::BIGINT AS n_sentences,
        |       a.n_syll::BIGINT AS n_syllables,
        |       round(206.835 - 1.015 * (a.n_words * 1.0 / s.n_sent)
        |             - 84.6 * (a.n_syll * 1.0 / a.n_words) + 1e-9, 4)
        |         AS flesch
        |FROM agg a JOIN sent s ON a.doc_id = s.doc_id
        |WHERE s.n_sent > 0 AND a.n_words > 0
        |ORDER BY a.doc_id""") { c =>
      val d = c.documents.filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val sent = d.select(col("doc_id"),
        size(filter(split(col("text"), "[.!?]+"),
          s => length(trim(s)) > 0)).as("n_sent"))
      val agg = d.select(col("doc_id"), explode(
          expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
        .select(col("doc_id"), greatest(
          size(expr("regexp_extract_all(w, '[aeiouy]+', 0)")), lit(1))
          .as("sy"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("sy")).as("n_syll"))
      agg.join(sent, Seq("doc_id"))
        .filter(col("n_sent") > 0 && col("n_words") > 0)
        .select(col("doc_id"), col("n_words"),
          col("n_sent").cast("long").as("n_sentences"), col("n_syll")
            .as("n_syllables"),
          r4(lit(206.835) - lit(1.015) *
              (col("n_words") * lit(1.0) / col("n_sent")) -
            lit(84.6) * (col("n_syll") * lit(1.0) / col("n_words")))
            .as("flesch"))
        .orderBy("doc_id")
    },

    // Scalar-quantized (SQ8) vector search — the memory-compression
    // tier beside the LSH/IVF recall paths: per-dimension min/max
    // (the "codebook" — one 2-D literal, the IVF-quantizer stance)
    // quantize every corpus vector to 8-bit codes, 4× smaller than
    // float32 and 8× smaller than the double pipeline; queries stay
    // full-precision and score against the RECONSTRUCTED corpus
    // (asymmetric distance, the FAISS SQ convention). Exactly
    // replicable in SQL because the quantize→reconstruct arithmetic
    // is deterministic double math on both engines. A zero-range
    // (constant) dimension would make the quantizer divide 0/0 = NaN
    // with engine-dependent propagation (r7 advisor), so it is guarded
    // explicitly: range 0 → reconstruct mn.
    q("sim_ann_sq8",
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |el AS (SELECT vec_id, g.i, v[g.i] x
        |       FROM c, generate_series(1, 64) g(i)),
        |mm AS (SELECT i, min(x) mn, max(x) mx FROM el GROUP BY 1),
        |rec AS (SELECT vec_id,
        |          list(CASE WHEN mx = mn THEN mn
        |               ELSE mn + least(floor((x - mn) * 255.0 / (mx - mn)),
        |                               255) * (mx - mn) / 255.0 END
        |               ORDER BY i) rv
        |        FROM el JOIN mm USING (i) GROUP BY 1),
        |q AS (SELECT vec_id q_id, embedding::DOUBLE[] qv
        |      FROM embeddings WHERE vec_id < 3),
        |s AS (SELECT q_id, rec.vec_id n_id,
        |             list_cosine_similarity(qv, rv) cos
        |      FROM q, rec WHERE q_id <> rec.vec_id),
        |r AS (SELECT q_id, n_id, cos,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY round(cos + 1e-9, 6) DESC, n_id) rnk FROM s)
        |SELECT q_id, rnk, n_id, round(cos + 1e-9, 6) AS cos
        |FROM r WHERE rnk <= 10 ORDER BY q_id, rnk""") { c =>
      val corpus = c.embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      // per-dim min/max: dim-sized fit collect → ONE 2-D literal
      val mmRows = corpus
        .select(posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .orderBy("i").collect()
      val mins = mmRows.map(_.getDouble(1)).toSeq
      val ranges = mmRows.map(r => r.getDouble(2) - r.getDouble(1)).toSeq
      val mmLit = typedLit(Seq(mins, ranges))
      val rec = corpus.select(col("vec_id").as("n_id"),
        zip_with(
          zip_with(
            zip_with(col("v"), mmLit.getItem(0), (x, m) => x - m),
            mmLit.getItem(1),
            (d, r) => when(r === 0.0, lit(0.0)).otherwise(
              least(floor(d * lit(255.0) / r), lit(255.0)) *
                r / lit(255.0))),
          mmLit.getItem(0), (s, m) => s + m).as("n_vec"))
      val queries = c.embeddings.filter(col("vec_id") < 3).limit(3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      // HOF cosine (not graft_cosine): the reconstructed corpus is
      // double-typed; the native expression is float32-only.
      VectorSim.topKBruteForce(queries, rec, 10)
        .select(col("q_id"), col("rank").as("rnk"), col("n_id"),
          r6(col("cos")).as("cos"))
        .orderBy("q_id", "rnk")
    },

    // Product-quantization ANN (Jégou et al. 2011; the FAISS PQ/ADC
    // convention) — the VECTOR-compression tier that completes the ANN
    // family: LSH (data-oblivious buckets), IVF (data-adaptive cells),
    // SQ8 (per-dimension scalar codes), PQ (per-subspace codebooks —
    // m codes/vector, 32x smaller than float32 at dim 64 / m 8).
    // Codebooks train in one distributed pass per Lloyd round across
    // all m subspaces (deterministic hash init through the bounded-
    // heap top-k aggregate, model-sized collects); the corpus is
    // scanned ONCE into (cell, codes); each query ADC-scores only its
    // nprobe coarse cells' rows by m lookup-table reads and exact-
    // reranks a FIXED number of survivors (equi-join back to raw
    // vectors) — the FAISS IVFPQ composition, the shape whose
    // per-query cost stays constant as the corpus grows. Same checked
    // contract as the LSH/IVF queries: recall >= 0.8 vs the exact
    // top-3 on these unclustered random vectors — PQ's hardest case;
    // AnnRecallSpec asserts the sf0.1 floor.
    q("sim_ann_pq",
      """SELECT 20 AS n_q, TRUE AS recall_ok""") { c =>
      graft.functions.GraftFunctions.register(c.spark)
      val queries = c.embeddings.filter(col("vec_id") < 20).limit(20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = c.embeddings
        .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      // smoke tier: 2 Lloyd rounds (gate budget, r13 verdict #3) — the
      // recall contract is the checked output either way, and the
      // sf0.01 oracle tier keeps the full configuration. (8 PQ
      // subspaces at smoke was tried and dropped: recall fell under
      // the 0.8 floor — the codebook width is load-bearing here.)
      val cents = VectorSim.kmeansCentroids(corpus, col("n_vec"),
        k = 8, iters = if (c.smoke) 2 else 3, native = true)
      val books = VectorSim.pqCodebooks(corpus, col("n_vec"),
        m = 16, ksub = 16, iters = 1, native = true)
      val bf = VectorSim.topKBruteForce(queries, corpus, 3, native = true)
        .select(col("q_id"), col("n_id"))
      // IVF-PQ (r9 verdict #2): the coarse cells bound each query's
      // candidate set (nprobe of 8 cells), ADC ranks within them, and
      // rerank here PINS the FIXED-96 budget regime (the explicit
      // absolute override) — flat PQ needed rerank ∝ 13% of the
      // corpus to hold the floor on these unclustered random vectors,
      // i.e. a linear scan in disguise; the composition's per-query
      // cost is independent of corpus size (ncells scales as √n).
      // NOTE the operator's DEFAULT (rerank omitted) is now the
      // fraction-of-pool sizing (r13 verdict #4, AnnRecallSpec pin);
      // this query keeps the absolute to exercise that override.
      // lifecycle lives here (the SimPairs stance): materialize the
      // reranked result while the code/LUT caches are live, release
      val pq = VectorSim.topKAnnIvfPq(queries, corpus, 3, cents, books,
        nprobe = 6, rerank = 96, native = true)
      val ann = pq.df
        .select(col("q_id").as("aq"), col("n_id").as("an"))
        .localCheckpoint()
      pq.release()
      val hits = bf.join(ann,
        col("q_id") === col("aq") && col("n_id") === col("an"), "left_semi")
      bf.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(lit(20).as("n_q"),
          (col("n_hit").cast("double") / col("n_bf") >= 0.8).as("recall_ok"))
    },

    // T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    // seq2seq pretraining sample prep: deterministic 3-token spans
    // (every 5th token triple) collapse to numbered sentinels in the
    // model input, and the target replays each sentinel followed by
    // the tokens it hid. Pure per-doc list work after tokenization —
    // one explode + two ordered aggregations, no shuffle beyond the
    // doc grouping. The fixed mask pattern stands in for the span
    // sampler (randomness is a seed-policy choice; the tensorization
    // shape is what the operator owns).
    // SFT/chat label masking — the supervised-fine-tuning sample prep
    // beside llm_span_corruption's seq2seq masking: each doc's
    // sentences become alternating user/assistant turns, the rendered
    // sample tags every turn with its role, and the LOSS MASK keeps
    // only assistant-turn tokens learnable (the standard chat-SFT
    // convention — user turns are context, not targets). Pure per-doc
    // list work: one split + one partitioned window for turn order +
    // one ordered string fold (the established array_sort(collect_list)
    // ≡ string_agg ORDER BY device); exact integer token counts.
    q("llm_sft_mask",
      """WITH d AS (SELECT doc_id, trim(text) t FROM documents
        |           WHERE doc_id < 120),
        |sp AS (SELECT doc_id, unnest(string_split(t, '.')) s,
        |              unnest(range(len(string_split(t, '.')))) i
        |       FROM d),
        |tu AS (SELECT doc_id, i, trim(s) s FROM sp
        |       WHERE length(trim(s)) > 0),
        |r AS (SELECT doc_id, s,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
        |          turn
        |      FROM tu),
        |tok AS (SELECT doc_id, turn, s,
        |          len(string_split_regex(s, '\s+'))::BIGINT ntok,
        |          CASE WHEN turn % 2 = 1 THEN 'assistant' ELSE 'user'
        |          END rl
        |        FROM r),
        |agg AS (SELECT doc_id, count(*)::BIGINT n_turns,
        |          sum(ntok)::BIGINT n_tokens,
        |          sum(CASE WHEN rl = 'assistant' THEN ntok ELSE 0
        |              END)::BIGINT n_learnable,
        |          string_agg('<|' || rl || '|>' || s, ''
        |                     ORDER BY turn) rendered
        |        FROM tok GROUP BY 1)
        |SELECT doc_id, n_turns, n_tokens, n_learnable,
        |  round(n_learnable * 1.0 / n_tokens + 1e-9, 4) AS mask_ratio,
        |  substr(rendered, 1, 80) AS rendered_prefix
        |FROM agg ORDER BY doc_id""") { c =>
      import org.apache.spark.sql.expressions.Window
      val d = c.documents.filter(col("doc_id") < 120)
        .select(col("doc_id"), trim(col("text")).as("t"))
      val sp = d.select(col("doc_id"),
        posexplode(split(col("t"), "\\.")).as(Seq("i", "s")))
      val tu = sp.select(col("doc_id"), col("i"),
          trim(col("s")).as("s"))
        .filter(length(col("s")) > 0)
      val r = tu.withColumn("turn",
        row_number().over(
          Window.partitionBy("doc_id").orderBy("i")) - 1)
      val tok = r.select(col("doc_id"), col("turn"), col("s"),
        size(split(col("s"), "\\s+")).cast("long").as("ntok"),
        when(col("turn") % 2 === 1, "assistant").otherwise("user")
          .as("role"))
      val agg = tok.groupBy("doc_id").agg(
        count(lit(1)).as("n_turns"),
        sum(col("ntok")).as("n_tokens"),
        sum(when(col("role") === "assistant", col("ntok"))
          .otherwise(0L)).as("n_learnable"),
        expr("concat_ws('', transform(array_sort(collect_list(" +
          "named_struct('t', turn, 'p', " +
          "concat('<|', role, '|>', s)))), x -> x.p))").as("rendered"))
      agg.select(col("doc_id"), col("n_turns"), col("n_tokens"),
          col("n_learnable"),
          r4(col("n_learnable") * lit(1.0) / col("n_tokens"))
            .as("mask_ratio"),
          substring(col("rendered"), 1, 80).as("rendered_prefix"))
        .orderBy("doc_id")
    },

    q("llm_span_corruption",
      """WITH d AS (SELECT doc_id,
        |             regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |           FROM documents WHERE doc_id < 30),
        |tok AS (SELECT doc_id, unnest(toks) w,
        |               unnest(range(len(toks))) pos FROM d),
        |m AS (SELECT doc_id, w, pos,
        |             (pos // 3) % 5 = 4 masked,
        |             pos // 15 s
        |      FROM tok),
        |inp AS (SELECT doc_id,
        |          string_agg(CASE WHEN masked AND pos % 15 = 12
        |                          THEN '<extra_' || s || '>'
        |                          WHEN masked THEN NULL ELSE w END,
        |                     ' ' ORDER BY pos) AS model_input
        |        FROM m GROUP BY 1),
        |tgt AS (SELECT doc_id,
        |          string_agg(CASE WHEN pos % 15 = 12
        |                          THEN '<extra_' || s || '> ' || w
        |                          ELSE w END,
        |                     ' ' ORDER BY pos) AS model_target,
        |          count(DISTINCT s) n_spans
        |        FROM m WHERE masked GROUP BY 1)
        |SELECT inp.doc_id, inp.model_input, tgt.model_target,
        |       tgt.n_spans::BIGINT AS n_spans
        |FROM inp JOIN tgt USING (doc_id) ORDER BY doc_id""") { c =>
      val m = c.documents.filter(col("doc_id") < 30)
        .select(col("doc_id"), posexplode(
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "w")))
        .withColumn("masked", expr("(pos div 3) % 5 = 4"))
        .withColumn("s", expr("pos div 15"))
      val inTok = when(col("masked") && col("pos") % 15 === 12,
          concat(lit("<extra_"), col("s"), lit(">")))
        .when(col("masked"), lit(null))
        .otherwise(col("w"))
      val inp = m.withColumn("t", inTok)
        .groupBy("doc_id")
        .agg(expr("concat_ws(' ', transform(filter(array_sort(" +
          "collect_list(named_struct('p', pos, 't', t))), " +
          "x -> x.t IS NOT NULL), x -> x.t))").as("model_input"))
      val tgtTok = when(col("pos") % 15 === 12,
          concat(lit("<extra_"), col("s"), lit("> "), col("w")))
        .otherwise(col("w"))
      val tgt = m.filter(col("masked")).withColumn("t", tgtTok)
        .groupBy("doc_id")
        .agg(expr("concat_ws(' ', transform(array_sort(" +
          "collect_list(named_struct('p', pos, 't', t))), x -> x.t))")
          .as("model_target"),
          countDistinct(col("s")).as("n_spans"))
      inp.join(tgt, Seq("doc_id")).orderBy("doc_id")
    },

    // Dataset-card generator: the per-language corpus manifest
    // (volume share, token/char profile, exact-dup contamination,
    // source diversity) a dataset release ships alongside the shards —
    // one pass over the corpus plus a content-hash dup join.
    q("llm_dataset_card",
      """WITH d AS (SELECT doc_id, lang, source, n_chars,
        |             len(string_split_regex(trim(text), '\s+')) n_tok,
        |             md5(text) th
        |           FROM documents),
        |dup AS (SELECT th, count(*) c FROM d GROUP BY 1),
        |tot AS (SELECT count(*) nt FROM d)
        |SELECT d.lang, count(*)::BIGINT AS n_docs,
        |       round(count(*) * 1.0 / tot.nt + 1e-9, 6) AS share,
        |       round(avg(d.n_tok) + 1e-9, 4) AS mean_tokens,
        |       round(median(d.n_chars) + 1e-9, 1) AS median_chars,
        |       sum(CASE WHEN dup.c > 1 THEN 1 ELSE 0 END)::BIGINT
        |         AS docs_in_dup_groups,
        |       count(DISTINCT d.source)::BIGINT AS n_sources
        |FROM d JOIN dup ON d.th = dup.th, tot
        |GROUP BY d.lang, tot.nt ORDER BY d.lang""") { c =>
      val d = c.documents.select(col("doc_id"), col("lang"),
        col("source"), col("n_chars"),
        size(split(trim(col("text")), "\\s+")).as("n_tok"),
        md5(col("text")).as("th"))
      val dup = d.groupBy("th").agg(count(lit(1)).as("c"))
      val tot = d.agg(count(lit(1)).as("nt"))
      d.join(dup, Seq("th")).crossJoin(broadcast(tot))
        .groupBy("lang", "nt")
        .agg(count(lit(1)).as("n_docs"),
          r6(count(lit(1)) * lit(1.0) / col("nt")).as("share"),
          r4(avg(col("n_tok"))).as("mean_tokens"),
          round(percentile(col("n_chars"), lit(0.5)) + lit(1e-9), 1)
            .as("median_chars"),
          sum(when(col("c") > 1, 1).otherwise(0))
            .as("docs_in_dup_groups"),
          countDistinct(col("source")).as("n_sources"))
        .drop("nt")
        .orderBy("lang")
    },

    // Dunning log-likelihood-ratio collocations (Dunning 1993 — the
    // G² bigram-association test that beats PMI on sparse counts;
    // beside text_ppmi's windowed association): per adjacent bigram,
    // the 2×2 contingency G² = 2·Σ k_ij·ln(k_ij·N/(R_i·C_j)) from
    // EXACT integer margins (k11 = bigram count, R = left-word bigram
    // occurrences, C = right-word, N = corpus bigrams; all BIGINT
    // products < 2^53, cast-exact). The 0·ln0 cells drop by CASE; the
    // 4-term sum is one fixed expression tree so no FP order exists;
    // r4 absorbs libm's last ulp. Top-20 selected by the INTEGER key
    // (k11 DESC, w1, w2) — never by the FP statistic — with a count
    // floor of 5. Scale shape: three hash aggregates over the bigram
    // stream + broadcast N; top-k is TakeOrdered, never a global sort.
    // TextRank keyphrase scoring (Mihalcea & Tarau 2004 — PageRank on
    // the word co-occurrence graph; the unsupervised keyword extractor
    // beside text_rake's degree/frequency heuristic): adjacency
    // bigrams become an UNDIRECTED weighted graph (least/greatest
    // canonical edge, integer co-occurrence weights), then 3 pinned
    // damped rounds s'(v) = (1−0.85) + 0.85·Σ w(u,v)/wd(u)·s(u) with
    // the (1.0 − 0.85) teleport-expression device and integer weight/
    // degree ratios. The r6 output grain sits orders above per-node
    // summation noise (the graph_pagerank argument). Scale: each round
    // is one edge-keyed equi-join + node aggregation.
    q("text_textrank",
      """WITH tok AS (SELECT regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |           for i in generate_series(1, len(ts) - 1)],
        |           recursive := true)
        |       FROM tok WHERE len(ts) >= 2),
        |und AS (SELECT least(w1, w2) a, greatest(w1, w2) b,
        |          count(*)::BIGINT w
        |        FROM bg WHERE w1 <> w2 GROUP BY 1, 2),
        |e AS (SELECT a src, b dst, w FROM und
        |      UNION ALL SELECT b, a, w FROM und),
        |wd AS (SELECT src, sum(w)::BIGINT wd FROM e GROUP BY 1),
        |ew AS (SELECT e.src, e.dst, e.w, wd.wd FROM e
        |       JOIN wd ON e.src = wd.src),
        |r0 AS (SELECT src node, 1.0::DOUBLE rank FROM wd),
        |c1 AS (SELECT dst node, sum(w / wd * rank) cb FROM ew
        |       JOIN r0 ON ew.src = r0.node GROUP BY 1),
        |r1 AS (SELECT r0.node, (1.0 - 0.85) + 0.85 * coalesce(c1.cb, 0)
        |         rank FROM r0 LEFT JOIN c1 ON r0.node = c1.node),
        |c2 AS (SELECT dst node, sum(w / wd * rank) cb FROM ew
        |       JOIN r1 ON ew.src = r1.node GROUP BY 1),
        |r2 AS (SELECT r1.node, (1.0 - 0.85) + 0.85 * coalesce(c2.cb, 0)
        |         rank FROM r1 LEFT JOIN c2 ON r1.node = c2.node),
        |c3 AS (SELECT dst node, sum(w / wd * rank) cb FROM ew
        |       JOIN r2 ON ew.src = r2.node GROUP BY 1),
        |r3 AS (SELECT r2.node, (1.0 - 0.85) + 0.85 * coalesce(c3.cb, 0)
        |         rank FROM r2 LEFT JOIN c3 ON r2.node = c3.node)
        |SELECT node AS word, round(rank + 1e-9, 6) AS score
        |FROM r3 ORDER BY score DESC, word LIMIT 15""") { c =>
      val toks = c.documents.select(
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val bg = toks.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("b"))
        .select(col("b.w1"), col("b.w2"))
        .filter(col("w1") =!= col("w2"))
      val und = bg
        .select(least(col("w1"), col("w2")).as("a"),
          greatest(col("w1"), col("w2")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      val e = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .union(und.select(col("b").as("src"), col("a").as("dst"),
          col("w")))
        .persist()
      val wd = e.groupBy("src").agg(sum(col("w")).as("wd"))
      val ew = e.join(wd, "src").persist()
      var ranks = wd.select(col("src").as("node"), lit(1.0).as("rank"))
      (1 to 3).foreach { _ =>
        val contrib = ew
          .join(ranks, ew("src") === ranks("node"))
          .select(col("dst"),
            (col("w") / col("wd") * col("rank")).as("c"))
          .groupBy(col("dst").as("node2"))
          .agg(sum(col("c")).as("cb"))
        ranks = ranks.join(contrib,
            ranks("node") === contrib("node2"), "left")
          .select(col("node"),
            (lit(1.0) - lit(0.85) +
              lit(0.85) * coalesce(col("cb"), lit(0.0))).as("rank"))
          .localCheckpoint()
      }
      ranks.select(col("node").as("word"), r6(col("rank")).as("score"))
        .orderBy(col("score").desc, col("word")).limit(15)
    },

    q("text_collocations",
      """WITH tok AS (SELECT regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |           for i in generate_series(1, len(ts) - 1)],
        |           recursive := true)
        |       FROM tok WHERE len(ts) >= 2),
        |bgc AS (SELECT w1, w2, count(*)::BIGINT k11 FROM bg
        |        GROUP BY 1, 2 HAVING count(*) >= 5),
        |rw AS (SELECT w1, count(*)::BIGINT rr FROM bg GROUP BY 1),
        |cw AS (SELECT w2, count(*)::BIGINT cc FROM bg GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT n FROM bg),
        |top AS (SELECT bgc.w1, bgc.w2, k11, rr, cc, n
        |        FROM bgc JOIN rw ON bgc.w1 = rw.w1
        |                 JOIN cw ON bgc.w2 = cw.w2, nn
        |        ORDER BY k11 DESC, bgc.w1, bgc.w2 LIMIT 20),
        |g AS (SELECT w1, w2, k11, rr, cc, n,
        |        k11 AS a11, (rr - k11) AS a12, (cc - k11) AS a21,
        |        (n - rr - cc + k11) AS a22
        |      FROM top)
        |SELECT w1, w2, k11, rr AS r_w1, cc AS c_w2,
        |       round(2 * (((CASE WHEN a11 = 0 THEN 0 ELSE
        |           a11 * ln(a11::DOUBLE * n / (rr::DOUBLE * cc)) END
        |         + CASE WHEN a12 = 0 THEN 0 ELSE
        |           a12 * ln(a12::DOUBLE * n / (rr::DOUBLE * (n - cc))) END)
        |         + CASE WHEN a21 = 0 THEN 0 ELSE
        |           a21 * ln(a21::DOUBLE * n / ((n - rr)::DOUBLE * cc)) END)
        |         + CASE WHEN a22 = 0 THEN 0 ELSE
        |           a22 * ln(a22::DOUBLE * n
        |                    / ((n - rr)::DOUBLE * (n - cc))) END)
        |         + 1e-9, 4) AS g2
        |FROM g ORDER BY k11 DESC, w1, w2""") { c =>
      val toks = c.documents.select(
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val bg = toks.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("b"))
        .select(col("b.w1"), col("b.w2"))
      val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
        .filter(col("k11") >= 5)
      val rw = bg.groupBy("w1").agg(count(lit(1)).as("rr"))
      val cw = bg.groupBy("w2").agg(count(lit(1)).as("cc"))
      val nn = bg.agg(count(lit(1)).as("n"))
      val top = bgc.join(rw, "w1").join(cw, "w2")
        .crossJoin(broadcast(nn))
        .orderBy(col("k11").desc, col("w1"), col("w2")).limit(20)
      def cell(k: org.apache.spark.sql.Column, row: org.apache.spark.sql.Column,
          c2: org.apache.spark.sql.Column) =
        when(k === 0, lit(0.0)).otherwise(
          k * log(k.cast("double") * col("n") /
            (row.cast("double") * c2)))
      val a11 = col("k11")
      val a12 = col("rr") - col("k11")
      val a21 = col("cc") - col("k11")
      val a22 = col("n") - col("rr") - col("cc") + col("k11")
      val g2 = lit(2) * (((cell(a11, col("rr"), col("cc"))
        + cell(a12, col("rr"), col("n") - col("cc")))
        + cell(a21, col("n") - col("rr"), col("cc")))
        + cell(a22, col("n") - col("rr"), col("n") - col("cc")))
      top.select(col("w1"), col("w2"), col("k11"),
          col("rr").as("r_w1"), col("cc").as("c_w2"), r4(g2).as("g2"))
        .orderBy(col("k11").desc, col("w1"), col("w2"))
    },

    // Out-of-vocabulary rate against a top-1000 corpus vocabulary —
    // the tokenizer-coverage diagnostic beside llm_tokenizer_fertility
    // (high OOV per language = the vocab under-serves that slice; the
    // first thing to check before training a tokenizer): vocab = top
    // 1000 terms by corpus frequency (ties broken by term), per-LANG
    // aggregate OOV share from exact integer token counts. Scale
    // shape: corpus term counts → TakeOrdered(1000) broadcast →
    // one anti-joinable membership flag → one hash aggregate.
    q("text_oov_rate",
      """WITH tok AS (SELECT doc_id, lang,
        |    unnest(regexp_extract_all(text, '[a-z]+')) w
        |  FROM documents),
        |tc AS (SELECT w, count(*)::BIGINT c FROM tok GROUP BY 1),
        |voc AS (SELECT w FROM tc ORDER BY c DESC, w LIMIT 1000),
        |fl AS (SELECT t.lang, t.doc_id,
        |         CASE WHEN v.w IS NULL THEN 1 ELSE 0 END oov
        |       FROM tok t LEFT JOIN voc v ON t.w = v.w)
        |SELECT lang, count(DISTINCT doc_id)::BIGINT n_docs,
        |       count(*)::BIGINT total_tokens,
        |       sum(oov)::BIGINT oov_tokens,
        |       round(sum(oov)::DOUBLE / count(*) + 1e-9, 6) AS oov_rate
        |FROM fl GROUP BY 1 ORDER BY lang""") { c =>
      val tok = c.documents.select(col("doc_id"), col("lang"), explode(
        expr("regexp_extract_all(text, '[a-z]+', 0)")).as("w"))
      val voc = tok.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(1000)
        .select(col("w"), lit(1).as("in_vocab"))
      val fl = tok.join(broadcast(voc), Seq("w"), "left")
        .select(col("lang"), col("doc_id"),
          when(col("in_vocab").isNull, 1L).otherwise(0L).as("oov"))
      fl.groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("total_tokens"),
          sum(col("oov")).as("oov_tokens"),
          r6(sum(col("oov")).cast("double") / count(lit(1)))
            .as("oov_rate"))
        .orderBy("lang")
    },

    // Term burstiness (Church & Gale 1995 — variance-to-mean ratio of
    // per-document term frequency; b ≫ 1 marks topical/bursty terms,
    // b ≈ 1 Poisson-like function words — the corpus statistic behind
    // DFR retrieval models and stopword screens): for the top-20 terms
    // by document frequency, b = Var(tf)/Mean(tf) over ALL docs with
    // zeros implicit (D known, only Σtf and Σtf² stored — the sparse
    // form). Exact integer sums in, one fixed double tree out. Scale
    // shape: one (term, doc) aggregation → one term aggregation →
    // TakeOrdered(20); never a per-doc dense matrix.
    q("text_burstiness",
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(text, '[a-z]+')) w
        |  FROM documents),
        |dd AS (SELECT count(DISTINCT doc_id)::BIGINT d FROM tok),
        |td AS (SELECT w, doc_id, count(*)::BIGINT tf
        |       FROM tok GROUP BY 1, 2),
        |t AS (SELECT w, count(*)::BIGINT df, sum(tf)::BIGINT s,
        |        (sum(tf::HUGEINT * tf))::DOUBLE q
        |      FROM td GROUP BY 1),
        |top AS (SELECT w, df, s, q, d FROM t, dd
        |        ORDER BY df DESC, w LIMIT 20)
        |SELECT w AS term, df, s AS total_tf,
        |       round(s::DOUBLE / d + 1e-9, 6) AS mean_tf,
        |       round(((q - s::DOUBLE * s / d) / (d - 1))
        |             / (s::DOUBLE / d) + 1e-9, 4) AS burstiness
        |FROM top ORDER BY df DESC, w""") { c =>
      val tok = c.documents.select(col("doc_id"), explode(
        expr("regexp_extract_all(text, '[a-z]+', 0)")).as("w"))
      val dd = tok.agg(countDistinct(col("doc_id")).as("d"))
      val td = tok.groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
      val t = td.groupBy("w").agg(count(lit(1)).as("df"),
        sum(col("tf")).as("s"),
        sum(col("tf").cast("decimal(38,0)") * col("tf")).cast("double")
          .as("q"))
      val top = t.crossJoin(broadcast(dd))
        .orderBy(col("df").desc, col("w")).limit(20)
      top.select(col("w").as("term"), col("df"), col("s").as("total_tf"),
          r6(col("s").cast("double") / col("d")).as("mean_tf"),
          r4(((col("q") - col("s").cast("double") * col("s") / col("d")) /
            (col("d") - 1)) / (col("s").cast("double") / col("d")))
            .as("burstiness"))
        .orderBy(col("df").desc, col("term"))
    },

    // Interpolated Kneser–Ney bigram LM perplexity (Kneser & Ney 1995;
    // Chen & Goodman 1999's benchmark winner — the smoothing tier
    // above text_lm_ppl's add-one and text_lm_backoff's stupid
    // backoff): P(w2|w1) = (c−D)/c(w1) + D·N1+(w1·)/c(w1) ·
    // N1+(·w2)/|bigram types|, discount D = 0.75 (DYADIC, so c−D is
    // exact). Every count is an exact integer; the per-doc NLL sum
    // rides the pinned-order sorted fold (the text_lm_ppl device).
    // All model-train bigrams have c ≥ 1, so the max(·,0) branch of
    // the discount never fires and is omitted. Scale shape: the same
    // shuffles as text_lm_ppl plus two type-count aggregates.
    q("text_lm_kneser_ney",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT doc_id, unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                for i in generate_series(1, len(ts) - 1)],
        |                recursive := true)
        |       FROM tok WHERE len(ts) >= 2),
        |bgc AS (SELECT w1, w2, count(*) c FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) cw FROM bg GROUP BY 1),
        |n1f AS (SELECT w1, count(*)::BIGINT nf FROM bgc GROUP BY 1),
        |n1b AS (SELECT w2, count(*)::BIGINT nb2 FROM bgc GROUP BY 1),
        |tt AS (SELECT count(*)::BIGINT t FROM bgc),
        |db AS (SELECT doc_id, w1, w2, count(*) cnt FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT d.doc_id, sum(d.cnt)::BIGINT nb,
        |              list_reduce(
        |                list(d.cnt * -ln((bgc.c - 0.75) / ctx.cw
        |                       + 0.75 * n1f.nf / ctx.cw * (n1b.nb2 / tt.t))
        |                     ORDER BY d.w1, d.w2),
        |                (a, x) -> a + x) snll
        |       FROM db d
        |       JOIN bgc ON d.w1 = bgc.w1 AND d.w2 = bgc.w2
        |       JOIN ctx ON d.w1 = ctx.w1
        |       JOIN n1f ON d.w1 = n1f.w1
        |       JOIN n1b ON d.w2 = n1b.w2
        |       CROSS JOIN tt
        |       GROUP BY 1)
        |SELECT doc_id, nb AS n_bigrams,
        |       round(snll / nb + 1e-9, 4) AS ln_ppl,
        |       round(exp(round(snll / nb + 1e-9, 4)) + 1e-9, 2) AS ppl
        |FROM sc ORDER BY doc_id""") { c =>
      val toks = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val bg = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val ctx = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
      val n1f = bgc.groupBy("w1").agg(count(lit(1)).as("nf"))
      val n1b = bgc.groupBy("w2").agg(count(lit(1)).as("nb2"))
      val tt = bgc.agg(count(lit(1)).as("t"))
      val db = bg.groupBy("doc_id", "w1", "w2")
        .agg(count(lit(1)).as("cnt"))
      val p = (col("c") - 0.75) / col("cw") +
        lit(0.75) * col("nf") / col("cw") * (col("nb2") / col("t"))
      val nll = col("cnt").cast("double") * -log(p)
      val lnPpl = r4(col("snll") / col("n_bigrams"))
      db.join(bgc, Seq("w1", "w2"))
        .join(ctx, Seq("w1"))
        .join(n1f, Seq("w1"))
        .join(n1b, Seq("w2"))
        .crossJoin(broadcast(tt))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_bigrams"),
          aggregate(
            array_sort(collect_list(struct(col("w1"), col("w2"),
              nll.as("nll")))),
            lit(0.0), (a, x) => a + x.getField("nll")).as("snll"))
        .select(col("doc_id"), col("n_bigrams"),
          lnPpl.as("ln_ppl"), r2(exp(lnPpl)).as("ppl"))
        .orderBy("doc_id")
    },

    // Jelinek–Mercer interpolated bigram LM perplexity (Jelinek &
    // Mercer 1980) — the third smoothing tier, completing the family:
    // add-one (text_lm_ppl), stupid backoff (text_lm_backoff),
    // absolute-discount Kneser–Ney (text_lm_kneser_ney), and now
    // LINEAR interpolation P(w2|w1) = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/N
    // with λ = 0.5 (DYADIC, so both mixture halves are exact rational
    // scalings). Unigram back-off mass uses TOKEN counts (not KN's
    // continuation types) — the defining difference between the two
    // interpolations. Same shuffles + pinned-order NLL fold as the
    // siblings.
    q("text_lm_jm",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |bg AS (SELECT doc_id, unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                for i in generate_series(1, len(ts) - 1)],
        |                recursive := true)
        |       FROM tok WHERE len(ts) >= 2),
        |bgc AS (SELECT w1, w2, count(*) c FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) cw FROM bg GROUP BY 1),
        |uni AS (SELECT w2, count(*)::BIGINT cu FROM bg GROUP BY 1),
        |nt AS (SELECT count(*)::BIGINT nn FROM bg),
        |db AS (SELECT doc_id, w1, w2, count(*) cnt FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT d.doc_id, sum(d.cnt)::BIGINT nb,
        |              list_reduce(
        |                list(d.cnt * -ln(0.5 * bgc.c / ctx.cw
        |                       + 0.5 * uni.cu / nt.nn)
        |                     ORDER BY d.w1, d.w2),
        |                (a, x) -> a + x) snll
        |       FROM db d
        |       JOIN bgc ON d.w1 = bgc.w1 AND d.w2 = bgc.w2
        |       JOIN ctx ON d.w1 = ctx.w1
        |       JOIN uni ON d.w2 = uni.w2
        |       CROSS JOIN nt
        |       GROUP BY 1)
        |SELECT doc_id, nb AS n_bigrams,
        |       round(snll / nb + 1e-9, 4) AS ln_ppl,
        |       round(exp(round(snll / nb + 1e-9, 4)) + 1e-9, 2) AS ppl
        |FROM sc ORDER BY doc_id""") { c =>
      val toks = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val bg = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val ctx = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
      val uni = bg.groupBy("w2").agg(count(lit(1)).as("cu"))
      val nt = bg.agg(count(lit(1)).as("nn"))
      val db = bg.groupBy("doc_id", "w1", "w2")
        .agg(count(lit(1)).as("cnt"))
      val p = lit(0.5) * col("c") / col("cw") +
        lit(0.5) * col("cu") / col("nn")
      val nll = col("cnt").cast("double") * -log(p)
      val lnPpl = r4(col("snll") / col("n_bigrams"))
      db.join(bgc, Seq("w1", "w2"))
        .join(ctx, Seq("w1"))
        .join(uni, Seq("w2"))
        .crossJoin(broadcast(nt))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_bigrams"),
          aggregate(
            array_sort(collect_list(struct(col("w1"), col("w2"),
              nll.as("nll")))),
            lit(0.0), (a, x) => a + x.getField("nll")).as("snll"))
        .select(col("doc_id"), col("n_bigrams"),
          lnPpl.as("ln_ppl"), r2(exp(lnPpl)).as("ppl"))
        .orderBy("doc_id")
    },

    // Unigram-LM tokenizer vocabulary PRUNE round (Kudo 2018 §3.2 —
    // the missing member of the tokenizer family beside BPE induction
    // (text_bpe_merges), BPE apply, and fertility): every candidate
    // piece (char 2-4-grams of the word-frequency table, count ≥ 3)
    // is scored by the likelihood LOSS of removing it, loss_x =
    // cnt_x · (ln p(x) − Σ_chars ln p(c)) — the CHAR-FALLBACK
    // alternative segmentation (Kudo's exact criterion re-segments by
    // Viterbi; the character decomposition is the standard cheap
    // surrogate and a lower bound on the alternative's likelihood).
    // The bottom 20% by loss would be pruned; the output reports the
    // 15 most-protected pieces + vocab sizes. Determinism: the ≤4
    // char-ln terms fold in pinned position order, each piece's loss
    // rounds BEFORE ranking, ties break on the piece string. One
    // corpus scan builds the word table; everything after is
    // vocab-sized (≤ 26²+26³+26⁴ by domain).
    q("llm_unigram_prune",
      """WITH wf AS (SELECT wd, count(*)::BIGINT freq FROM
        |      (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) wd
        |       FROM documents) GROUP BY 1),
        |pcs0 AS (SELECT wd, freq, l.n,
        |           unnest(generate_series(1, length(wd) - l.n + 1)) i
        |         FROM wf, (SELECT unnest([2, 3, 4]) n) l),
        |pcs AS (SELECT substr(wd, i, n) pc, sum(freq)::BIGINT cnt
        |        FROM pcs0 GROUP BY 1),
        |cand AS (SELECT pc, cnt FROM pcs WHERE cnt >= 3),
        |ch0 AS (SELECT wd, freq,
        |          unnest(generate_series(1, length(wd))) i FROM wf),
        |ch AS (SELECT substr(wd, i, 1) c1, sum(freq)::BIGINT ccnt
        |       FROM ch0 GROUP BY 1),
        |tp AS (SELECT sum(cnt)::BIGINT t FROM cand),
        |tc AS (SELECT sum(ccnt)::BIGINT t2 FROM ch),
        |pch AS (SELECT pc, i, substr(pc, i, 1) c1 FROM
        |        (SELECT pc, unnest(generate_series(1, length(pc))) i
        |         FROM cand)),
        |alt AS (SELECT pch.pc,
        |          list_reduce(list(ln(ch.ccnt * 1.0 / tc.t2)
        |            ORDER BY pch.i), (a, b) -> a + b) a
        |        FROM pch JOIN ch ON pch.c1 = ch.c1 CROSS JOIN tc
        |        GROUP BY 1),
        |loss AS (SELECT cand.pc, cand.cnt,
        |           round(cand.cnt * (ln(cand.cnt * 1.0 / tp.t) - alt.a)
        |                 + 1e-9, 4) loss
        |         FROM cand JOIN alt ON cand.pc = alt.pc CROSS JOIN tp),
        |nv AS (SELECT count(*)::BIGINT v FROM loss)
        |SELECT pc AS piece, length(pc)::BIGINT AS len, cnt, loss,
        |  nv.v AS vocab_before, (nv.v - nv.v // 5)::BIGINT AS vocab_kept
        |FROM loss, nv ORDER BY loss DESC, piece LIMIT 15""") { c =>
      val wf = c.documents.select(explode(
          expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("wd"))
        .groupBy("wd").agg(count(lit(1)).as("freq"))
      val pieces = wf
        .select(col("wd"), col("freq"),
          explode(typedLit(Seq(2, 3, 4))).as("n"))
        .filter(length(col("wd")) >= col("n"))
        .select(col("wd"), col("freq"), col("n"),
          explode(sequence(lit(1), length(col("wd")) - col("n") + 1))
            .as("i"))
        .select(col("wd").substr(col("i"), col("n")).as("pc"),
          col("freq"))
      val cand = pieces.groupBy("pc").agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= 3)
      val ch = wf
        .select(col("wd"), col("freq"),
          explode(sequence(lit(1), length(col("wd")))).as("i"))
        .select(col("wd").substr(col("i"), lit(1)).as("c1"), col("freq"))
        .groupBy("c1").agg(sum(col("freq")).as("ccnt"))
      val tp = cand.agg(sum(col("cnt")).as("t"))
      val tc = ch.agg(sum(col("ccnt")).as("t2"))
      val pch = cand
        .select(col("pc"), explode(sequence(lit(1), length(col("pc"))))
          .as("i"))
        .select(col("pc"), col("i"),
          col("pc").substr(col("i"), lit(1)).as("c1"))
      val alt = pch.join(ch, Seq("c1")).crossJoin(broadcast(tc))
        .groupBy("pc")
        .agg(aggregate(array_sort(collect_list(struct(col("i"),
            log(col("ccnt") * lit(1.0) / col("t2")).as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("a"))
      val loss = cand.join(alt, Seq("pc")).crossJoin(broadcast(tp))
        .select(col("pc"), col("cnt"),
          r4(col("cnt") * (log(col("cnt") * lit(1.0) / col("t")) -
            col("a"))).as("loss"))
      val nv = loss.agg(count(lit(1)).as("v"))
      loss.crossJoin(broadcast(nv))
        .select(col("pc").as("piece"),
          length(col("pc")).cast("long").as("len"), col("cnt"),
          col("loss"), col("v").as("vocab_before"),
          (col("v") - (col("v") / 5).cast("long")).as("vocab_kept"))
        .orderBy(col("loss").desc, col("piece")).limit(15)
    },

    // Heaps'-law vocabulary-growth fit (Heaps 1978 / Herdan): V(n) =
    // K·n^β over the doc_id-ordered corpus prefix — the curation
    // diagnostic for vocabulary saturation (β ≪ 1 ⇒ dedup-heavy or
    // templated text). Distributed shape: first occurrences via a
    // term-keyed min aggregate (never a sequential scan), cumulative
    // (tokens, new-terms) via Positional's range-bucketed cumsums, and
    // the log-log OLS runs on per-row MICRO-QUANTIZED ln values
    // (1e-6 lattice BIGINTs) so the moment sums are exact integers —
    // β and K are one fixed double tree at the end.
    q("text_heaps_fit",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') ts
        |             FROM documents),
        |td AS (SELECT doc_id, len(ts)::BIGINT ntok FROM tok
        |       WHERE len(ts) >= 1),
        |wd AS (SELECT doc_id, unnest(ts) w FROM tok),
        |fo AS (SELECT w, min(doc_id) fdoc FROM wd GROUP BY 1),
        |nt AS (SELECT fdoc doc_id, count(*)::BIGINT nnew FROM fo
        |       GROUP BY 1),
        |d AS (SELECT td.doc_id, td.ntok, COALESCE(nt.nnew, 0)::BIGINT nnew
        |      FROM td LEFT JOIN nt ON td.doc_id = nt.doc_id),
        |cum AS (SELECT doc_id,
        |          (sum(ntok) OVER (ORDER BY doc_id))::BIGINT nn,
        |          (sum(nnew) OVER (ORDER BY doc_id))::BIGINT vv
        |        FROM d),
        |pts AS (SELECT CAST(round(ln(nn) * 1000000 + 1e-3) AS BIGINT) x,
        |               CAST(round(ln(vv) * 1000000 + 1e-3) AS BIGINT) y,
        |               nn, vv FROM cum),
        |mo AS (SELECT count(*)::BIGINT kd, sum(x)::BIGINT sx,
        |         sum(y)::BIGINT sy,
        |         (sum(x::HUGEINT * y))::DOUBLE sxy,
        |         (sum(x::HUGEINT * x))::DOUBLE sxx,
        |         max(nn)::BIGINT tt, max(vv)::BIGINT vb FROM pts),
        |f AS (SELECT kd, tt, vb, sx, sy,
        |        (kd * sxy - sx::DOUBLE * sy)
        |          / (kd * sxx - sx::DOUBLE * sx) beta
        |      FROM mo)
        |SELECT kd AS n_docs, tt AS total_tokens, vb AS vocab,
        |       round(beta + 1e-9, 6) AS beta,
        |       round(exp((sy - beta * sx) / kd / 1000000.0) + 1e-9, 4)
        |         AS k_coef
        |FROM f""") { c =>
      val toks = c.documents.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+', 0)").as("ts"))
      val td = toks.filter(size(col("ts")) >= 1)
        .select(col("doc_id"), size(col("ts")).cast("long").as("ntok"))
      val wd = toks.select(col("doc_id"), explode(col("ts")).as("w"))
      val nt = wd.groupBy("w").agg(min(col("doc_id")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("nnew"))
      val d = td.join(nt, Seq("doc_id"), "left")
        .na.fill(0L, Seq("nnew"))
      val cum = graft.ops.Positional.withCumSums(d, Seq(col("doc_id")),
          Seq(col("ntok") -> "n_lt", col("nnew") -> "v_lt"))
        .select((col("n_lt") + col("ntok")).as("nn"),
          (col("v_lt") + col("nnew")).as("vv"))
      val pts = cum.select(
        round(log(col("nn")) * 1000000 + lit(1e-3)).cast("long").as("x"),
        round(log(col("vv")) * 1000000 + lit(1e-3)).cast("long").as("y"),
        col("nn"), col("vv"))
      val mo = pts.agg(count(lit(1)).as("kd"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).cast("double")
          .as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).cast("double")
          .as("sxx"),
        max(col("nn")).as("tt"), max(col("vv")).as("vb"))
      val beta = (col("kd") * col("sxy") -
        col("sx").cast("double") * col("sy")) /
        (col("kd") * col("sxx") - col("sx").cast("double") * col("sx"))
      mo.select(col("kd").as("n_docs"), col("tt").as("total_tokens"),
        col("vb").as("vocab"), r6(beta).as("beta"),
        r4(exp((col("sy") - beta * col("sx")) / col("kd") / 1000000.0))
          .as("k_coef"))
    },

    // Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein
    // 1998 — the retrieval re-ranker that trades relevance against
    // redundancy, standard in RAG context selection): greedy k=4 over
    // a top-12 relevance pool, score = λ·rel − (1−λ)·max cosine to the
    // already-selected set, λ = 0.75 (dyadic). Determinism: every
    // cosine is rounded to the 1e-6 lattice BEFORE any max/compare
    // (the sim_topk contract), argmax ties break on vec_id, and the
    // greedy steps are explicit — Spark iterates 4 model-sized joins
    // over a localCheckpoint'd 12-row pool; the oracle unrolls the
    // same 4 steps as CTEs. Scale shape: ONE corpus scan scores
    // relevance (broadcast 1-row query vector); everything after runs
    // on the 12-row pool, so corpus size only touches the scan.
    q("sim_mmr",
      """WITH q AS (SELECT embedding::DOUBLE[] qv FROM embeddings
        |           WHERE vec_id = 0),
        |c0 AS (SELECT vec_id id, embedding::DOUBLE[] v,
        |         round(list_cosine_similarity(embedding::DOUBLE[], qv)
        |               + 1e-9, 6) rel
        |       FROM embeddings, q WHERE vec_id > 0),
        |cand AS (SELECT * FROM c0 ORDER BY rel DESC, id LIMIT 12),
        |s1 AS (SELECT id, v, rel, rel score, 1 step FROM cand
        |       ORDER BY rel DESC, id LIMIT 1),
        |m2 AS (SELECT c.id, c.v, c.rel,
        |         round(0.75 * c.rel - 0.25 * (SELECT
        |             max(round(list_cosine_similarity(c.v, s.v) + 1e-9, 6))
        |           FROM s1 s) + 1e-9, 6) score
        |       FROM cand c WHERE c.id NOT IN (SELECT id FROM s1)),
        |s2 AS (SELECT id, v, rel, score, 2 step FROM m2
        |       ORDER BY score DESC, id LIMIT 1),
        |u2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
        |m3 AS (SELECT c.id, c.v, c.rel,
        |         round(0.75 * c.rel - 0.25 * (SELECT
        |             max(round(list_cosine_similarity(c.v, s.v) + 1e-9, 6))
        |           FROM u2 s) + 1e-9, 6) score
        |       FROM cand c WHERE c.id NOT IN (SELECT id FROM u2)),
        |s3 AS (SELECT id, v, rel, score, 3 step FROM m3
        |       ORDER BY score DESC, id LIMIT 1),
        |u3 AS (SELECT * FROM u2 UNION ALL SELECT * FROM s3),
        |m4 AS (SELECT c.id, c.v, c.rel,
        |         round(0.75 * c.rel - 0.25 * (SELECT
        |             max(round(list_cosine_similarity(c.v, s.v) + 1e-9, 6))
        |           FROM u3 s) + 1e-9, 6) score
        |       FROM cand c WHERE c.id NOT IN (SELECT id FROM u3)),
        |s4 AS (SELECT id, v, rel, score, 4 step FROM m4
        |       ORDER BY score DESC, id LIMIT 1),
        |u4 AS (SELECT * FROM u3 UNION ALL SELECT * FROM s4)
        |SELECT step::BIGINT AS step, id AS vec_id, rel,
        |       score AS mmr_score
        |FROM u4 ORDER BY step""") { c =>
      val q0 = c.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val cand = c.embeddings.filter(col("vec_id") > 0)
        .crossJoin(broadcast(q0))
        .select(col("vec_id").as("id"), col("embedding").as("v"),
          r6(VectorSim.cosine(col("embedding"), col("qv"))).as("rel"))
        .orderBy(col("rel").desc, col("id")).limit(12)
      VectorSim.mmrSelect(cand, k = 4, lambda = 0.75)
        .select(col("step"), col("id").as("vec_id"), col("rel"),
          col("score").as("mmr_score"))
        .orderBy("step")
    },
  )
}
