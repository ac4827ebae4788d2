package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 governance/operability tier: temperature-based corpus mixing,
  * k-anonymity suppression, data-quality gates, and join-skew
  * diagnostics — the checks a production training-data pipeline runs
  * around the transform steps (none of which the reference ships; all
  * value-add like the LLM tier).
  */
object GovernanceQueries {

  val defs: Seq[graft.QueryDef] = Seq(

    // Temperature-based corpus mixing (the T5/mT5 alpha-sampling rule,
    // Raffel et al. 2020 §3.4.3 / Conneau et al. 2020): per-language
    // sampling weight ∝ p_l^alpha with alpha=0.3, renormalized. One
    // tiny aggregation per stratum + a 1-row total; weights quantized
    // via micro-units so the renormalized ratios hash identically.
    // Output also carries the expected per-language document draw for a
    // 10k-doc epoch (integer-rounded), the number a mixing loader
    // consumes directly.
    q("llm_mix_temperature",
      """WITH s AS (SELECT lang, count(*) n FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) total FROM s),
        |w AS (SELECT lang, n,
        |             CAST(round(pow(n / t.total, 0.3) * 1e9 + 1e-9)
        |                  AS BIGINT) AS w_u
        |      FROM s, t),
        |z AS (SELECT sum(w_u) z FROM w)
        |SELECT lang, n::BIGINT AS n_docs,
        |       round(w_u / z.z + 1e-9, 6) AS mix_weight,
        |       CAST(round(w_u * 10000.0 / z.z + 1e-9) AS BIGINT)
        |         AS epoch_docs
        |FROM w, z ORDER BY lang""") { c =>
      val s = c.documents.groupBy("lang").agg(count(lit(1)).as("n"))
      val t = s.agg(sum(col("n")).as("total"))
      val w = s.crossJoin(broadcast(t))
        .withColumn("w_u",
          round(pow(col("n").cast("double") / col("total"), 0.3) *
            lit(1e9) + lit(1e-9)).cast("long"))
      val z = w.agg(sum(col("w_u")).as("z"))
      w.crossJoin(broadcast(z))
        .select(col("lang"), col("n").as("n_docs"),
          r6(col("w_u").cast("double") / col("z")).as("mix_weight"),
          round(col("w_u") * lit(10000.0) / col("z") + lit(1e-9))
            .cast("long").as("epoch_docs"))
        .orderBy("lang")
    },

    // k-anonymity suppression (Sweeney 2002) — the privacy gate run
    // before a quasi-identifier view is released: groups of
    // (nation, market segment) smaller than k=200 are suppressed.
    // Output: per-group size, suppression flag, and the released group
    // label (group values, or '<suppressed>' for small groups) — one
    // hash aggregation + a per-row projection; scales like any groupBy.
    q("gov_k_anonymity",
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) n
        |           FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, n::BIGINT AS group_n,
        |       n < 200 AS suppressed,
        |       CASE WHEN n < 200 THEN '<suppressed>'
        |            ELSE c_nationkey::VARCHAR || '|' || c_mktsegment END
        |         AS released_key
        |FROM g ORDER BY c_nationkey, c_mktsegment""") { c =>
      c.customer.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("group_n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("group_n"),
          (col("group_n") < 200).as("suppressed"),
          when(col("group_n") < 200, lit("<suppressed>"))
            .otherwise(concat(col("c_nationkey").cast("string"),
              lit("|"), col("c_mktsegment"))).as("released_key"))
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // EMBEDDING-column QA profile (the screen a vector corpus gets
    // before any ANN index is built — degenerate norms and dimension
    // drift silently poison recall): per-vector L2 norm by an
    // element-ORDER-pinned fold of double-cast squares (0.0-init left
    // fold ≡ DuckDB list_reduce), quantized to integer micro-units so
    // the corpus mean is an EXACT integer sum, and the norm quartiles
    // are exact order statistics via the distributed
    // Positional.withRowNumber (no global window over the corpus).
    q("dq_embedding_profile",
      """WITH v AS (SELECT vec_id, len(embedding) dim,
        |    CAST(round(sqrt(list_reduce(
        |        list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
        |        (a, b) -> a + b)) * 1e6 + 1e-9) AS BIGINT) nq
        |  FROM embeddings),
        |r AS (SELECT vec_id, dim, nq,
        |        row_number() OVER (ORDER BY nq, vec_id) rn,
        |        count(*) OVER () n FROM v),
        |qs AS (SELECT
        |    max(CASE WHEN rn = (n + 3) // 4 THEN nq END) q1,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN nq END) q2,
        |    max(CASE WHEN rn = (3 * n + 1) // 4 THEN nq END) q3
        |  FROM r)
        |SELECT count(*)::BIGINT AS n_vecs,
        |  min(v.dim)::BIGINT AS dim_min, max(v.dim)::BIGINT AS dim_max,
        |  sum(CASE WHEN v.nq = 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_zero_norm,
        |  round(min(v.nq) / 1e6 + 1e-9, 6) AS min_norm,
        |  round(max(qs.q1) / 1e6 + 1e-9, 6) AS p25_norm,
        |  round(max(qs.q2) / 1e6 + 1e-9, 6) AS p50_norm,
        |  round(max(qs.q3) / 1e6 + 1e-9, 6) AS p75_norm,
        |  round(max(v.nq) / 1e6 + 1e-9, 6) AS max_norm,
        |  round(sum(v.nq) / count(*) / 1e6 + 1e-9, 6) AS mean_norm
        |FROM v, qs""") { c =>
      val nq = round(sqrt(aggregate(
          transform(col("embedding"),
            x => x.cast("double") * x.cast("double")),
          lit(0.0), (a, b) => a + b)) * 1e6 + lit(1e-9)).cast("long")
      val v = c.embeddings.select(col("vec_id"),
        size(col("embedding")).as("dim"), nq.as("nq"))
      val r = graft.ops.Positional.withRowNumber(v,
        Seq(col("nq"), col("vec_id")), "rn")
      val n = v.agg(count(lit(1)).as("n"))
      val qs = r.crossJoin(broadcast(n)).agg(
        max(when(col("rn") === ((col("n") + 3) / 4).cast("long"),
          col("nq"))).as("q1"),
        max(when(col("rn") === ((col("n") + 1) / 2).cast("long"),
          col("nq"))).as("q2"),
        max(when(col("rn") === ((lit(3) * col("n") + 1) / 4)
          .cast("long"), col("nq"))).as("q3"))
      v.agg(count(lit(1)).as("n_vecs"), min(col("dim")).as("dim_min"),
          max(col("dim")).as("dim_max"),
          sum(when(col("nq") === 0, 1L).otherwise(0L))
            .as("n_zero_norm"),
          min(col("nq")).as("mn"), max(col("nq")).as("mx"),
          sum(col("nq")).as("sq"))
        .crossJoin(broadcast(qs))
        .select(col("n_vecs"), col("dim_min"), col("dim_max"),
          col("n_zero_norm"),
          r6(col("mn") / 1e6).as("min_norm"),
          r6(col("q1") / 1e6).as("p25_norm"),
          r6(col("q2") / 1e6).as("p50_norm"),
          r6(col("q3") / 1e6).as("p75_norm"),
          r6(col("mx") / 1e6).as("max_norm"),
          r6(col("sq") / col("n_vecs") / 1e6).as("mean_norm"))
    },

    // Data-quality gate (the dbt-test / Great-Expectations shape): each
    // check is one distributed aggregate or anti join; the result is a
    // small check×metric relation a CI gate thresholds on. Checks:
    // null rates, key uniqueness, referential integrity (orphan
    // lineitems / orders), domain violations, and freshness bounds.
    q("dq_checks",
      """SELECT 'lineitem_orphans' AS check_name,
        |       (SELECT count(*) FROM lineitem l
        |        WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT
        |         AS violations
        |UNION ALL
        |SELECT 'orders_dup_keys',
        |       (SELECT count(*) FROM (
        |          SELECT o_orderkey FROM orders
        |          GROUP BY 1 HAVING count(*) > 1))::BIGINT
        |UNION ALL
        |SELECT 'customer_null_segment',
        |       (SELECT count(*) FROM customer
        |        WHERE c_mktsegment IS NULL)::BIGINT
        |UNION ALL
        |SELECT 'lineitem_bad_discount',
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_discount < 0 OR l_discount > 0.1)::BIGINT
        |UNION ALL
        |SELECT 'lineitem_qty_domain',
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_quantity < 1 OR l_quantity > 50)::BIGINT
        |ORDER BY check_name""") { c =>
      def check(name: String, cnt: org.apache.spark.sql.DataFrame) =
        cnt.select(lit(name).as("check_name"),
          col("violations").cast("long").as("violations"))
      val orphans = c.lineitem.join(c.orders,
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
      val dups = c.orders.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(count(lit(1)).as("violations"))
      val nullSeg = c.customer.filter(col("c_mktsegment").isNull)
        .agg(count(lit(1)).as("violations"))
      val badDisc = c.lineitem
        .filter(col("l_discount") < 0 || col("l_discount") > 0.1)
        .agg(count(lit(1)).as("violations"))
      val badQty = c.lineitem
        .filter(col("l_quantity") < 1 || col("l_quantity") > 50)
        .agg(count(lit(1)).as("violations"))
      check("lineitem_orphans", orphans)
        .unionByName(check("orders_dup_keys", dups))
        .unionByName(check("customer_null_segment", nullSeg))
        .unionByName(check("lineitem_bad_discount", badDisc))
        .unionByName(check("lineitem_qty_domain", badQty))
        .orderBy("check_name")
    },

    // Join-skew diagnostic (the report ops/Skew.scala's salting is the
    // fix for): per-key frequency profile of the probe side of the
    // orders⋈lineitem join — max/mean skew factor, the p99 key count,
    // and the top hot keys. Two hash aggregations over the key
    // histogram (corpus → histogram → 1-row stats + top-k window over
    // the histogram, never the corpus). The skew factor is what decides
    // salting/AQE-skew-join at plan time.
    q("diag_skew_report",
      """WITH h AS (SELECT l_orderkey k, count(*) c
        |           FROM lineitem GROUP BY 1),
        |st AS (SELECT count(*) nk, sum(c) total, max(c) maxc,
        |              CAST(round(avg(c) * 1e6 + 1e-9) AS BIGINT) mean_u,
        |              CAST(round(quantile_cont(c, 0.99) * 1e6 + 1e-9)
        |                   AS BIGINT) p99_u
        |       FROM h),
        |top AS (SELECT k, c, row_number() OVER (ORDER BY c DESC, k) rn
        |        FROM h)
        |SELECT st.nk::BIGINT AS n_keys, st.total::BIGINT AS n_rows,
        |       st.maxc::BIGINT AS max_key_rows, st.mean_u, st.p99_u,
        |       round(st.maxc * 1e6 / st.mean_u + 1e-9, 4) AS skew_factor,
        |       t.k AS hot_key, t.c::BIGINT AS hot_rows, t.rn AS hot_rank
        |FROM st CROSS JOIN top t WHERE t.rn <= 5
        |ORDER BY hot_rank""") { c =>
      val h = c.lineitem.groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("c"))
      val st = h.agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"), max(col("c")).as("max_key_rows"),
        round(avg(col("c")) * lit(1e6) + lit(1e-9)).cast("long")
          .as("mean_u"),
        round(percentile(col("c"), lit(0.99)) *
          lit(1e6) + lit(1e-9)).cast("long").as("p99_u"))
      // top-5 via TakeOrdered (distributed partial top-k), THEN ranked —
      // the window's input is the 5-row result, never the histogram
      val top = h.orderBy(col("c").desc, col("k")).limit(5)
        .withColumn("hot_rank", row_number().over(
          Window.orderBy(col("c").desc, col("k"))))
        .select(col("k").as("hot_key"), col("c").as("hot_rows"),
          col("hot_rank"))
      top.crossJoin(broadcast(st))
        .select(col("n_keys"), col("n_rows"), col("max_key_rows"),
          col("mean_u"), col("p99_u"),
          r4(col("max_key_rows") * lit(1e6) / col("mean_u"))
            .as("skew_factor"),
          col("hot_key"), col("hot_rows"), col("hot_rank"))
        .orderBy("hot_rank")
    },

    // Differentially-private count release (Dwork et al. 2006): Laplace
    // noise with sensitivity 1 and epsilon=1 added to per-segment
    // customer counts via the inverse CDF,
    // noise = -b·sign(u-½)·ln(1-2|u-½|). The uniform u is derived from
    // md5(group key) so the release is REPRODUCIBLE across engines and
    // runs (that is what makes it oracle-able; a production DP
    // deployment must draw real randomness instead — seeded release is
    // the "deterministic pipeline replay" mode, documented as such).
    // (u comes from a 24-bit hash slice shifted by +0.5 so it is never
    // exactly 0, ½, or 1; noise is micro-unit-quantized before the
    // integer release so both engines round identically.) One hash
    // aggregation + a per-group projection — scales like any groupBy.
    q("gov_dp_release",
      """WITH g AS (SELECT c_mktsegment seg, count(*) n
        |           FROM customer GROUP BY 1),
        |u AS (SELECT seg, n,
        |             (('0x' || substr(md5(seg), 1, 6))::BIGINT + 0.5)
        |               / 16777216.0 AS uu
        |      FROM g),
        |z AS (SELECT seg, n, uu,
        |             CAST(round(-1.0 * (CASE WHEN uu >= 0.5 THEN 1
        |                                     ELSE -1 END)
        |                        * ln(1 - 2 * abs(uu - 0.5)) * 1e6 + 1e-9)
        |                  AS BIGINT) AS noise_u
        |      FROM u)
        |SELECT seg, n::BIGINT AS true_n, noise_u,
        |       n + CAST(round(noise_u / 1e6 + 1e-9) AS BIGINT)
        |         AS released_n
        |FROM z ORDER BY seg""") { c =>
      val g = c.customer.groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"))
      val u = g.withColumn("uu",
        (conv(substring(md5(col("seg")), 1, 6), 16, 10).cast("long") +
          lit(0.5)) / lit(16777216.0))
      val z = u.withColumn("noise_u",
        round(lit(-1.0) *
          when(col("uu") >= 0.5, lit(1.0)).otherwise(lit(-1.0)) *
          log(lit(1.0) - lit(2.0) * abs(col("uu") - 0.5)) * lit(1e6) +
          lit(1e-9)).cast("long"))
      z.select(col("seg"), col("n").as("true_n"), col("noise_u"),
          (col("n") + round(col("noise_u") / lit(1e6) + lit(1e-9))
            .cast("long")).as("released_n"))
        .orderBy("seg")
    },

    // Deterministic shard-export manifest — the final step before
    // training: every document is assigned a stable shard by key hash
    // (md5 — cluster-size- and engine-independent, re-runnable), and
    // the manifest records per-shard document/byte occupancy plus a
    // per-shard order fingerprint (min/max of the within-shard sort
    // key) so a loader can verify it got exactly the published shard.
    // One hash aggregation; the actual partitioned write is the
    // src_partitioned_write path with partitionBy(shard).
    q("llm_export_shards",
      """WITH a AS (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 8
        |      AS shard,
        |    md5(doc_id::VARCHAR) AS ok
        |  FROM documents)
        |SELECT shard, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS n_bytes,
        |       min(ok) AS first_key, max(ok) AS last_key
        |FROM a GROUP BY shard ORDER BY shard""") { c =>
      val a = c.documents.select(col("doc_id"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 8).as("shard"),
        md5(col("doc_id").cast("string")).as("ok"))
      a.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_bytes"),
          min(col("ok")).as("first_key"), max(col("ok")).as("last_key"))
        .orderBy("shard")
    },

    // Skew-salted aggregation (ops/Skew.scala) cross-checked against
    // the plain GROUP BY oracle on a deliberately skewed key (2/3 of
    // lineitem collapses onto ONE key): the salted two-phase partial/
    // final decomposition must be value-identical to the direct
    // aggregate — sums in exact integer cents so salting order can
    // never show through the hash gate.
    q("agg_skew_salted",
      """WITH k AS (SELECT CASE WHEN l_orderkey % 3 = 0
        |                  THEN 'cold_' || l_orderkey::VARCHAR
        |                  ELSE 'HOT' END AS key,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) c,
        |                  l_quantity q
        |           FROM lineitem)
        |SELECT key, count(*)::BIGINT AS n, sum(c)::BIGINT AS cents,
        |       CAST(min(q) AS BIGINT) AS min_q, CAST(max(q) AS BIGINT) AS max_q
        |FROM k GROUP BY key ORDER BY n DESC, key LIMIT 20""") { c =>
      import graft.ops.Skew
      val k = c.lineitem.select(
        when(col("l_orderkey") % 3 === 0,
          concat(lit("cold_"), col("l_orderkey").cast("string")))
          .otherwise(lit("HOT")).as("key"),
        round(col("l_extendedprice") * 100).cast("long").as("c"),
        col("l_quantity").cast("long").as("q"))
      Skew.saltedAgg(k, Seq("key"), Seq(
          Skew.count2("n"), Skew.sum2(col("c"), "cents"),
          Skew.min2(col("q"), "min_q"), Skew.max2(col("q"), "max_q")))
        .orderBy(col("n").desc, col("key")).limit(20)
    },

    // Right-to-be-forgotten purge (GDPR art. 17 shape): a deletion-
    // request list (customers with c_custkey%97=0) is anti-joined out
    // of the customer dimension AND cascaded through orders; the audit
    // manifest records per-table purge counts and a deterministic
    // tombstone digest (md5 over the sorted purged-key list) so the
    // erasure is verifiable without retaining the data. Anti joins are
    // broadcast-able; the digest aggregates the REQUEST list, not the
    // corpus.
    q("gov_rtbf_purge",
      """WITH req AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |pc AS (SELECT count(*) n FROM customer c
        |       WHERE EXISTS (SELECT 1 FROM req r
        |                     WHERE r.c_custkey = c.c_custkey)),
        |po AS (SELECT count(*) n FROM orders o
        |       WHERE EXISTS (SELECT 1 FROM req r
        |                     WHERE r.c_custkey = o.o_custkey)),
        |rc AS (SELECT count(*) n FROM customer c
        |       WHERE NOT EXISTS (SELECT 1 FROM req r
        |                         WHERE r.c_custkey = c.c_custkey)),
        |dg AS (SELECT md5(string_agg(c_custkey::VARCHAR, ','
        |                  ORDER BY c_custkey)) d
        |       FROM req)
        |SELECT (SELECT count(*) FROM req)::BIGINT AS n_requests,
        |       pc.n::BIGINT AS purged_customers,
        |       po.n::BIGINT AS purged_orders,
        |       rc.n::BIGINT AS remaining_customers,
        |       dg.d AS tombstone_digest
        |FROM pc, po, rc, dg""") { c =>
      val req = c.customer.filter(col("c_custkey") % 97 === 0)
        .select("c_custkey")
      val purgedC = c.customer.join(req, Seq("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("purged_customers"))
      val purgedO = c.orders.join(req.withColumnRenamed("c_custkey",
          "o_custkey"), Seq("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("purged_orders"))
      val remaining = c.customer.join(req, Seq("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("remaining_customers"))
      val digest = req.agg(
        md5(expr("array_join(transform(array_sort(collect_list(" +
          "c_custkey)), x -> cast(x AS STRING)), ',')"))
          .as("tombstone_digest"))
      val nReq = req.agg(count(lit(1)).as("n_requests"))
      nReq.crossJoin(purgedC).crossJoin(purgedO)
        .crossJoin(remaining).crossJoin(digest)
    },

    // Dataset diff / reconciliation (the datacompy shape): the current
    // customer table against a mutated snapshot (planted: %13 balance
    // drift, %17 segment change, %41 dropped, shifted keys added), ONE
    // full-outer key join classifying added/removed/changed/unchanged
    // plus per-column change counts — the audit a migration or
    // backfill runs before swapping tables. Exact integer counts; at
    // scale this is one key-partitioned join, AQE-skew-safe.
    q("dq_table_diff",
      """WITH cur AS (SELECT c_custkey k, c_acctbal bal, c_mktsegment seg
        |             FROM customer),
        |snap AS (
        |  SELECT k, CASE WHEN k % 13 = 0 THEN bal + 5.0 ELSE bal END bal,
        |         CASE WHEN k % 17 = 0 THEN 'MOVED' ELSE seg END seg
        |  FROM cur WHERE k % 41 <> 0
        |  UNION ALL
        |  SELECT k + 5000000, bal, seg FROM cur WHERE k % 53 = 0),
        |j AS (SELECT coalesce(c.k, s.k) k,
        |             c.k IS NULL AS added, s.k IS NULL AS removed,
        |             (c.k IS NOT NULL AND s.k IS NOT NULL AND
        |              (c.bal IS DISTINCT FROM s.bal OR
        |               c.seg IS DISTINCT FROM s.seg)) AS changed,
        |             (c.k IS NOT NULL AND s.k IS NOT NULL AND
        |              c.bal IS DISTINCT FROM s.bal) AS bal_chg,
        |             (c.k IS NOT NULL AND s.k IS NOT NULL AND
        |              c.seg IS DISTINCT FROM s.seg) AS seg_chg
        |      FROM cur c FULL OUTER JOIN snap s ON c.k = s.k)
        |SELECT count(*)::BIGINT AS n_keys,
        |       sum(added::INT)::BIGINT AS n_added,
        |       sum(removed::INT)::BIGINT AS n_removed,
        |       sum(changed::INT)::BIGINT AS n_changed,
        |       sum(bal_chg::INT)::BIGINT AS n_bal_changed,
        |       sum(seg_chg::INT)::BIGINT AS n_seg_changed
        |FROM j""") { c =>
      val cur = c.customer.select(col("c_custkey").as("k"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
      val snap = cur.filter(col("k") % 41 =!= 0)
        .select(col("k"),
          when(col("k") % 13 === 0, col("bal") + 5.0)
            .otherwise(col("bal")).as("bal"),
          when(col("k") % 17 === 0, lit("MOVED"))
            .otherwise(col("seg")).as("seg"))
        .unionByName(cur.filter(col("k") % 53 === 0)
          .select((col("k") + 5000000).as("k"), col("bal"), col("seg")))
      val j = cur.as("c").join(snap.as("s"),
          col("c.k") === col("s.k"), "full_outer")
        .select(
          col("c.k").isNull.as("added"),
          col("s.k").isNull.as("removed"),
          (col("c.k").isNotNull && col("s.k").isNotNull &&
            (!(col("c.bal") <=> col("s.bal")) ||
              !(col("c.seg") <=> col("s.seg")))).as("changed"),
          (col("c.k").isNotNull && col("s.k").isNotNull &&
            !(col("c.bal") <=> col("s.bal"))).as("bal_chg"),
          (col("c.k").isNotNull && col("s.k").isNotNull &&
            !(col("c.seg") <=> col("s.seg"))).as("seg_chg"))
      j.agg(count(lit(1)).as("n_keys"),
        sum(col("added").cast("int")).as("n_added"),
        sum(col("removed").cast("int")).as("n_removed"),
        sum(col("changed").cast("int")).as("n_changed"),
        sum(col("bal_chg").cast("int")).as("n_bal_changed"),
        sum(col("seg_chg").cast("int")).as("n_seg_changed"))
    },

    // Pareto / ABC contribution analysis — parts ranked by revenue with
    // cumulative share classes (A < 80%, B < 95%, C rest), the 80/20
    // inventory classification. The cumulative revenue comes from the
    // DISTRIBUTED Positional cumsum over (revenue DESC, key) — the part
    // dimension is corpus-scale in general, so no global ranking
    // window; revenue itself is an exact integer-cents sum.
    q("agg_pareto_abc",
      """WITH r AS (SELECT l_partkey,
        |             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) rev
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(rev) tot FROM r),
        |c AS (SELECT l_partkey, rev,
        |             sum(rev) OVER (ORDER BY rev DESC, l_partkey) crev
        |      FROM r),
        |cls AS (SELECT l_partkey, rev,
        |               CASE WHEN crev * 100 <= t.tot * 80 THEN 'A'
        |                    WHEN crev * 100 <= t.tot * 95 THEN 'B'
        |                    ELSE 'C' END AS abc
        |        FROM c, t)
        |SELECT abc, count(*)::BIGINT AS n_parts,
        |       sum(rev)::BIGINT AS cents,
        |       round(sum(rev) * 1.0 / max(t2.tot) + 1e-9, 6) AS share
        |FROM cls, (SELECT tot FROM t) t2
        |GROUP BY abc ORDER BY abc""") { c =>
      import graft.ops.Positional
      val r = c.lineitem.groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("rev"))
      val t = r.agg(sum(col("rev")).as("tot"))
      // exclusive cumsum + own rev = inclusive running revenue
      val cum = Positional.withCumSum(
        r.withColumn("negrev", -col("rev")),
        Seq(col("negrev"), col("l_partkey")), col("rev"), "crev0")
        .withColumn("crev", col("crev0") + col("rev"))
      cum.crossJoin(broadcast(t))
        .withColumn("abc",
          when(col("crev") * 100 <= col("tot") * 80, "A")
            .when(col("crev") * 100 <= col("tot") * 95, "B")
            .otherwise("C"))
        .groupBy("abc")
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("cents"),
          r6(sum(col("rev")) * lit(1.0) / max(col("tot"))).as("share"))
        .orderBy("abc")
    },

    // l-diversity audit (Machanavajjhala et al. 2007) — the
    // k-anonymity companion: a quasi-identifier group is safe only if
    // its SENSITIVE attribute also takes at least l distinct values
    // (k-anonymous groups can still leak when everyone in the group
    // shares the sensitive value). One aggregation per quasi-ID cell;
    // group size AND distinct-sensitive count audited together.
    q("gov_l_diversity",
      """WITH j AS (SELECT c_nationkey nat, o_orderpriority pri,
        |                  o_orderstatus sens
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT nat, pri, count(*) n, count(DISTINCT sens) l
        |      FROM j GROUP BY 1, 2)
        |SELECT nat, pri, n::BIGINT AS n, l::BIGINT AS l_diversity,
        |       l >= 3 AS meets_l3
        |FROM g ORDER BY nat, pri""") { c =>
      val j = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nat"),
          col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("sens"))
      j.groupBy("nat", "pri")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("sens")).as("l_diversity"))
        .select(col("nat"), col("pri"), col("n"), col("l_diversity"),
          (col("l_diversity") >= 3).as("meets_l3"))
        .orderBy("nat", "pri")
    },

    // t-closeness audit (Li, Li, Venkatasubramanian 2007) — the third
    // rung of the k-anonymity / l-diversity ladder: a quasi-ID group
    // leaks even with l distinct sensitive values when its sensitive
    // DISTRIBUTION skews far from the table's (everyone-in-group-
    // mostly-F). Distance = total variation, computed EXACTLY in
    // integers: |p_g − p_tot| = |cnt·N − C·n| / (n·N), so the per-
    // group sum is a BIGINT aggregation (order-independent by
    // construction — no FP sum to pin) and only ONE final division
    // makes a double. Absent sensitive values still contribute (the
    // group × sensitive-domain grid is built before the left join).
    // Scale: two corpus aggregations + a broadcast-sized domain grid.
    q("gov_t_closeness",
      """WITH j AS (SELECT c_nationkey nat, o_orderpriority pri,
        |                  o_orderstatus sens
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |tot AS (SELECT count(*)::BIGINT nt FROM j),
        |gs AS (SELECT sens, count(*)::BIGINT cg FROM j GROUP BY 1),
        |grp AS (SELECT nat, pri, count(*)::BIGINT n FROM j GROUP BY 1, 2),
        |cell AS (SELECT nat, pri, sens, count(*)::BIGINT cnt
        |         FROM j GROUP BY 1, 2, 3),
        |grid AS (SELECT g.nat, g.pri, g.n, s.sens, s.cg,
        |           coalesce(c.cnt, 0)::BIGINT cnt
        |         FROM grp g CROSS JOIN gs s
        |         LEFT JOIN cell c ON c.nat = g.nat AND c.pri = g.pri
        |                         AND c.sens = s.sens),
        |d AS (SELECT nat, pri, n,
        |        sum(abs(cnt * t.nt - cg * n))::BIGINT num, max(t.nt) nt
        |      FROM grid CROSS JOIN tot t GROUP BY 1, 2, 3)
        |SELECT nat, pri, n,
        |       round(num::DOUBLE / (2.0 * n * nt) + 1e-9, 6) AS tvd,
        |       round(num::DOUBLE / (2.0 * n * nt) + 1e-9, 6) <= 0.2
        |         AS meets_t02
        |FROM d ORDER BY nat, pri""") { c =>
      val j = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nat"),
          col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("sens"))
      val tot = j.agg(count(lit(1)).as("nt"))
      val gs = j.groupBy("sens").agg(count(lit(1)).as("cg"))
      val grp = j.groupBy("nat", "pri").agg(count(lit(1)).as("n"))
      val cell = j.groupBy("nat", "pri", "sens")
        .agg(count(lit(1)).as("cnt"))
      val grid = grp.crossJoin(broadcast(gs))
        .join(cell, Seq("nat", "pri", "sens"), "left")
        .select(col("nat"), col("pri"), col("n"), col("cg"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
      val tvd = round(col("num").cast("double") /
        (lit(2.0) * col("n") * col("nt")) + lit(1e-9), 6)
      grid.crossJoin(broadcast(tot))
        .groupBy("nat", "pri", "n")
        .agg(sum(abs(col("cnt") * col("nt") - col("cg") * col("n")))
          .as("num"), max(col("nt")).as("nt"))
        .select(col("nat"), col("pri"), col("n"),
          tvd.as("tvd"), (tvd <= 0.2).as("meets_t02"))
        .orderBy("nat", "pri")
    },

    // Deterministic pseudonymization with referential integrity: the
    // customer key is replaced by a salted-hash token IN BOTH tables,
    // so cross-table joins still line up on the token while the raw id
    // never appears downstream (the PII-safe analytics export shape
    // beside pii_redact's free-text pass). The check: per-nation order
    // and distinct-customer counts through the tokenized join equal
    // the raw-key truth.
    q("gov_pseudonymize",
      """WITH cm AS (SELECT substr(md5('cust:' || c_custkey::VARCHAR),
        |                    1, 16) tok,
        |                   c_nationkey FROM customer),
        |om AS (SELECT substr(md5('cust:' || o_custkey::VARCHAR),
        |               1, 16) tok,
        |              o_totalprice FROM orders),
        |j AS (SELECT cm.c_nationkey, count(*) n_orders,
        |             count(DISTINCT cm.tok) n_custs
        |      FROM om JOIN cm USING (tok) GROUP BY 1)
        |SELECT c_nationkey, n_orders::BIGINT AS n_orders,
        |       n_custs::BIGINT AS n_custs
        |FROM j ORDER BY c_nationkey""") { c =>
      def tok(k: org.apache.spark.sql.Column) =
        substring(md5(concat(lit("cust:"), k.cast("string"))), 1, 16)
      val cm = c.customer.select(tok(col("c_custkey")).as("tok"),
        col("c_nationkey"))
      val om = c.orders.select(tok(col("o_custkey")).as("tok"))
      om.join(cm, Seq("tok"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("tok")).as("n_custs"))
        .orderBy("c_nationkey")
    },

    // Order-independent table content fingerprint: per-row md5-derived
    // 60-bit ints folded with XOR — commutative/associative, so the
    // digest is identical under any partitioning or row order and
    // merges across shards for free (the cheap cross-system
    // reconciliation check before shipping a 100 TB copy; dq_table_diff
    // is the row-level drill-down once digests disagree). Canonical
    // row strings use only integer-rendered columns — double
    // formatting is never engine-portable.
    q("dq_table_fingerprint",
      """WITH r AS (SELECT ('0x' || substr(md5(l_orderkey::VARCHAR
        |             || '|' || l_linenumber::VARCHAR || '|' ||
        |             CAST(round(l_quantity) AS BIGINT)::VARCHAR),
        |             1, 15))::BIGINT h
        |           FROM lineitem)
        |SELECT count(*)::BIGINT AS n_rows,
        |       bit_xor(h)::BIGINT AS content_digest
        |FROM r""") { c =>
      val h = conv(substring(md5(concat_ws("|",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          round(col("l_quantity")).cast("long").cast("string"))),
        1, 15), 16, 10).cast("long")
      c.lineitem.select(h.as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("content_digest"))
    },

    // Column profiling (the pandas-profiling / dbt-docs shape): one
    // ALL-COLUMNS-IN-ONE-PASS aggregation — count/filled/distinct per
    // column computed in a single scan (not one scan per column), then
    // unpivoted to a profile row per column with fill rate and
    // cardinality ratio, the two signals schema-drift monitors watch.
    q("dq_column_profile",
      """WITH p AS (
        |  SELECT 'o_custkey' col, count(*) n, count(o_custkey) n_filled,
        |         count(DISTINCT o_custkey) n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), count(o_orderstatus),
        |         count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*), count(o_totalprice),
        |         count(DISTINCT o_totalprice) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*), count(o_orderpriority),
        |         count(DISTINCT o_orderpriority) FROM orders)
        |SELECT col, n::BIGINT AS n, (n - n_filled)::BIGINT AS n_null,
        |       n_distinct::BIGINT AS n_distinct,
        |       round(n_filled * 1.0 / n + 1e-9, 6) AS fill_rate,
        |       round(n_distinct * 1.0 / n_filled + 1e-9, 6)
        |         AS cardinality_ratio
        |FROM p ORDER BY col""") { c =>
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      // single scan: every column's three stats in ONE aggregation
      val aggs = cols.flatMap(cn => Seq(
        count(col(cn)).as(s"f_$cn"),
        countDistinct(col(cn)).as(s"d_$cn")))
      val allAggs = count(lit(1)).as("n") +: aggs
      val one = c.orders.agg(allAggs.head, allAggs.tail: _*)
      // unpivot the single stats row into one profile row per column
      val stacked = one.select(col("n"), explode(array(cols.map(cn =>
        struct(lit(cn).as("col"), col(s"f_$cn").as("n_filled"),
          col(s"d_$cn").as("n_distinct"))): _*)).as("p"))
      stacked.select(col("p.col").as("col"), col("n"),
          (col("n") - col("p.n_filled")).as("n_null"),
          col("p.n_distinct").as("n_distinct"),
          r6(col("p.n_filled") * lit(1.0) / col("n")).as("fill_rate"),
          r6(col("p.n_distinct") * lit(1.0) / col("p.n_filled"))
            .as("cardinality_ratio"))
        .orderBy("col")
    },

    // Shewhart X-bar control chart (Shewhart 1931 — the SPC screen
    // behind every pipeline-health dashboard): hourly subgroup means
    // of event value vs 3σ control limits from the between-subgroup
    // spread. Determinism: each subgroup mean is quantized to
    // MICRO-CENTS by pure integer half-up division
    // (2·s·10⁴ + n) // (2n), so the k-subgroup moments are exact
    // integers; CL/σ/limits are one fixed double tree, and the
    // out-of-control flag compares ROUNDED values on both engines
    // (the borderline-row lesson). Scale shape: one corpus hash
    // aggregate → hour-count-sized frame + broadcast stats.
    q("dq_control_chart",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |    count(*)::BIGINT n,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT s
        |  FROM events GROUP BY 1),
        |m AS (SELECT hb, n, (2 * s * 10000 + n) // (2 * n) mm FROM h),
        |st AS (SELECT count(*)::BIGINT k, sum(mm)::BIGINT sm,
        |         (sum(mm::HUGEINT * mm))::DOUBLE qm
        |       FROM m),
        |d AS (SELECT hb, n, mm, k, sm, qm,
        |        sm::DOUBLE / k / 1000000 cl,
        |        sqrt((k * qm - sm::DOUBLE * sm) / (k::DOUBLE * k * (k - 1)))
        |          / 1000000 sd
        |      FROM m, st)
        |SELECT hb AS hour, n, round(mm / 1000000.0 + 1e-9, 4) AS xbar,
        |       round(cl + 1e-9, 4) AS cl,
        |       round(cl + 3 * sd + 1e-9, 4) AS ucl,
        |       round(cl - 3 * sd + 1e-9, 4) AS lcl,
        |       (round(abs(mm / 1000000.0 - cl) + 1e-9, 4) >
        |        round(3 * sd + 1e-9, 4)) AS out_of_control
        |FROM d ORDER BY hour""") { c =>
      val h = c.events.select(
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cv"))
        .groupBy("hb")
        .agg(count(lit(1)).as("n"), sum(col("cv")).as("s"))
      val m = h.select(col("hb"), col("n"),
        expr("(2 * s * 10000 + n) div (2 * n)").as("mm"))
      val st = m.agg(count(lit(1)).as("k"), sum(col("mm")).as("sm"),
        sum(col("mm").cast("decimal(38,0)") * col("mm")).cast("double")
          .as("qm"))
      val cl = col("sm").cast("double") / col("k") / 1000000
      val sd = sqrt((col("k") * col("qm") -
        col("sm").cast("double") * col("sm")) /
        (col("k").cast("double") * col("k") * (col("k") - 1))) / 1000000
      m.crossJoin(broadcast(st))
        .select(col("hb").as("hour"), col("n"),
          r4(col("mm") / 1000000.0).as("xbar"),
          r4(cl).as("cl"),
          r4(cl + lit(3) * sd).as("ucl"),
          r4(cl - lit(3) * sd).as("lcl"),
          (r4(abs(col("mm") / 1000000.0 - cl)) > r4(lit(3) * sd))
            .as("out_of_control"))
        .orderBy("hour")
    },

    // Luhn checksum scan (ISO/IEC 7812 mod-10) — the payment-card
    // detector a PII scrub runs beside the regex family (pii_redact
    // masks patterns; Luhn VALIDATES them, cutting the false-positive
    // digit runs a 13-19-digit regex alone would flag): per document,
    // extract digit runs, validate each with the exact integer Luhn
    // fold (double every second digit from the right, subtract 9 above
    // 9, sum ≡ 0 mod 10), and report candidate vs validated counts.
    // Synthetic plants make the contract checkable: every 7th doc gets
    // the public test PAN 4242424242424242 (Luhn-valid), every 5th a
    // derived 16-digit account-like run (valid only by chance) — the
    // gap between n_candidates and n_valid_luhn IS the false-positive
    // reduction. Pure per-row expression work over one scan; the
    // per-candidate fold is length-bounded (≤19 digits).
    // Retention-policy sweep — the RTBF family's bulk sibling (RTBF
    // deletes one subject; retention expires whole partitions): rows
    // past the policy cutoff are inventoried per ORDER-MONTH partition
    // into a deletion MANIFEST (count, key range, share of the
    // partition) — exactly the artifact a compliance pipeline commits
    // before issuing partition drops. Scale shape: at 100 TB the month
    // column is the partition key, so the sweep is partition-pruned
    // metadata work plus one aggregation over only the EXPIRED
    // partitions; months where nothing expires simply do not appear.
    // Wholly-expired months are flagged drop_partition = true (a
    // metadata-only delete); partially-expired months need a rewrite.
    q("gov_retention_sweep",
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') ym,
        |             o_orderkey,
        |             o_orderdate < DATE '1997-01-01' expired
        |           FROM orders)
        |SELECT ym AS month,
        |       count(*) FILTER (expired)::BIGINT AS n_expired,
        |       count(*)::BIGINT AS n_rows,
        |       min(CASE WHEN expired THEN o_orderkey END)::BIGINT
        |         AS min_key,
        |       max(CASE WHEN expired THEN o_orderkey END)::BIGINT
        |         AS max_key,
        |       (count(*) FILTER (expired) = count(*)) AS drop_partition
        |FROM m GROUP BY 1 HAVING count(*) FILTER (expired) > 0
        |ORDER BY 1""") { c =>
      val m = c.orders.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_orderkey"),
        (col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .as("expired"))
      m.groupBy(col("ym").as("month"))
        .agg(
          sum(when(col("expired"), 1L).otherwise(0L)).as("n_expired"),
          count(lit(1)).as("n_rows"),
          min(when(col("expired"), col("o_orderkey"))).as("min_key"),
          max(when(col("expired"), col("o_orderkey"))).as("max_key"))
        .filter(col("n_expired") > 0)
        .select(col("month"), col("n_expired"), col("n_rows"),
          col("min_key"), col("max_key"),
          (col("n_expired") === col("n_rows")).as("drop_partition"))
        .orderBy("month")
    },

    q("gov_luhn_scan",
      """WITH t AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 7 = 0
        |                 THEN ' card 4242424242424242' ELSE '' END
        |         || CASE WHEN doc_id % 5 = 0
        |                 THEN ' acct ' || lpad(
        |                   ((doc_id * 2654435761) % 10000000000000)
        |                     ::VARCHAR, 16, '7')
        |                 ELSE '' END t2
        |  FROM documents),
        |cand AS (SELECT doc_id,
        |    unnest(regexp_extract_all(t2, '[0-9]{13,19}')) num FROM t),
        |v AS (SELECT doc_id, num,
        |    list_reduce([0] || list_transform(
        |        generate_series(0, length(num) - 1),
        |        j -> CASE WHEN j % 2 = 1 THEN
        |               CASE WHEN 2 * substr(num, length(num) - j, 1)
        |                          ::INT > 9
        |                    THEN 2 * substr(num, length(num) - j, 1)
        |                         ::INT - 9
        |                    ELSE 2 * substr(num, length(num) - j, 1)
        |                         ::INT END
        |             ELSE substr(num, length(num) - j, 1)::INT END),
        |      (a, x) -> a + x) % 10 = 0 ok
        |  FROM cand)
        |SELECT doc_id, count(*)::BIGINT AS n_candidates,
        |       count(*) FILTER (ok)::BIGINT AS n_valid_luhn
        |FROM v GROUP BY 1 ORDER BY doc_id""") { c =>
      val t2 = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" card 4242424242424242"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" acct "),
            lpad(((col("doc_id") * lit(2654435761L)) %
              lit(10000000000000L)).cast("string"), 16, "7")))
          .otherwise(lit("")))
      val cand = c.documents.select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(t2, '[0-9]{13,19}', 0)"))
            .as("num"))
      val digit = (j: org.apache.spark.sql.Column) =>
        col("num").substr(length(col("num")) - j, lit(1)).cast("int")
      val terms = transform(sequence(lit(0), length(col("num")) - 1),
        j => when(j % 2 === 1,
          when(lit(2) * digit(j) > 9, lit(2) * digit(j) - 9)
            .otherwise(lit(2) * digit(j)))
          .otherwise(digit(j)))
      cand.select(col("doc_id"),
          (aggregate(terms, lit(0), (a, x) => a + x) % 10 === 0)
            .as("ok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_valid_luhn"))
        .orderBy("doc_id")
    },
  )
}
