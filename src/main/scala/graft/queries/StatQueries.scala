package graft.queries

import graft.ops.Positional
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 statistical-testing tier: the A/B-experiment readouts
  * (Welch's t, chi-square independence, two-sample Kolmogorov-Smirnov)
  * as distributed aggregations. The KS statistic runs on the Positional
  * distributed cumulative sums — the ECDF comparison stays scale-safe
  * even over a continuous (corpus-cardinality) support, the exact
  * situation where a naive `Window.orderBy` ECDF collapses to one task.
  */
object StatQueries {

  val defs: Seq[graft.QueryDef] = Seq(

    // Welch's unequal-variance t-test between the two experiment arms
    // (user_id parity) on purchase values: two-group count/mean/var in
    // ONE aggregation pass, then the t statistic and Welch-Satterthwaite
    // df as scalar arithmetic. var_samp matches across engines at the
    // rounding grain (the agg_stats family contract).
    q("stat_ab_ttest",
      """WITH p AS (SELECT user_id % 2 AS arm, value
        |           FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT count(*) FILTER (arm = 0) n0,
        |             count(*) FILTER (arm = 1) n1,
        |             avg(value) FILTER (arm = 0) m0,
        |             avg(value) FILTER (arm = 1) m1,
        |             var_samp(value) FILTER (arm = 0) v0,
        |             var_samp(value) FILTER (arm = 1) v1
        |      FROM p)
        |SELECT n0::BIGINT AS n0, n1::BIGINT AS n1,
        |       round(m0 + 1e-9, 4) AS mean0, round(m1 + 1e-9, 4) AS mean1,
        |       round((m0 - m1) / sqrt(v0 / n0 + v1 / n1) + 1e-9, 4) AS t,
        |       round(pow(v0 / n0 + v1 / n1, 2)
        |             / (pow(v0 / n0, 2) / (n0 - 1)
        |                + pow(v1 / n1, 2) / (n1 - 1)) + 1e-9, 2) AS df
        |FROM g""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"), col("value"))
      val g = p.agg(
        count(when(col("arm") === 0, 1)).as("n0"),
        count(when(col("arm") === 1, 1)).as("n1"),
        avg(when(col("arm") === 0, col("value"))).as("m0"),
        avg(when(col("arm") === 1, col("value"))).as("m1"),
        var_samp(when(col("arm") === 0, col("value"))).as("v0"),
        var_samp(when(col("arm") === 1, col("value"))).as("v1"))
      g.select(col("n0"), col("n1"),
        r4(col("m0")).as("mean0"), r4(col("m1")).as("mean1"),
        r4((col("m0") - col("m1")) /
          sqrt(col("v0") / col("n0") + col("v1") / col("n1"))).as("t"),
        r2(pow(col("v0") / col("n0") + col("v1") / col("n1"), 2) /
          (pow(col("v0") / col("n0"), 2) / (col("n0") - 1) +
            pow(col("v1") / col("n1"), 2) / (col("n1") - 1))).as("df"))
    },

    // Fixed-effect META-ANALYSIS (inverse-variance pooling + Cochran's
    // Q and I² heterogeneity — the evidence-synthesis layer above the
    // per-study tests: 25 nations = 25 "studies" of the urgent-order
    // price effect): per-study effects and variances are closed forms
    // of EXACT integer cents moments (Σv via BIGINT, Σv² via
    // DECIMAL/HUGEINT), and the three study-level reductions (Σw, Σwe,
    // Q) ride pinned-order folds keyed by nation. One corpus
    // aggregate; everything after is 25-row work.
    q("stat_meta_fixed",
      """WITH b AS (SELECT c.c_nationkey k,
        |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END u,
        |    CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT) v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT k, u, count(*)::BIGINT n, sum(v)::BIGINT s,
        |        sum(v::HUGEINT * v)::DOUBLE q FROM b GROUP BY 1, 2),
        |w AS (SELECT k,
        |    max(CASE WHEN u = 1 THEN n END) n1,
        |    max(CASE WHEN u = 1 THEN s END) s1,
        |    max(CASE WHEN u = 1 THEN q END) q1,
        |    max(CASE WHEN u = 0 THEN n END) n0,
        |    max(CASE WHEN u = 0 THEN s END) s0,
        |    max(CASE WHEN u = 0 THEN q END) q0
        |  FROM g GROUP BY 1),
        |e AS (SELECT k,
        |    (s1::DOUBLE / n1 - s0::DOUBLE / n0) / 100 eff,
        |    ((q1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1
        |     + (q0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0) / 10000 se2
        |  FROM w),
        |t AS (SELECT count(*)::BIGINT kk,
        |    list_reduce(list(1 / se2 ORDER BY k), (x, y) -> x + y) sw,
        |    list_reduce(list(eff / se2 ORDER BY k), (x, y) -> x + y) swe
        |  FROM e),
        |p AS (SELECT kk, sw, swe / sw pooled FROM t),
        |qq AS (SELECT p.kk, p.sw, p.pooled,
        |    list_reduce(list((eff - p.pooled) * (eff - p.pooled) / se2
        |      ORDER BY k), (x, y) -> x + y) qstat
        |  FROM e, p GROUP BY p.kk, p.sw, p.pooled)
        |SELECT kk AS k_studies, round(pooled + 1e-9, 4)
        |    AS pooled_effect_dollars,
        |  round(sqrt(1 / sw) + 1e-9, 6) AS se_pooled,
        |  round(qstat + 1e-9, 4) AS q_stat,
        |  round(greatest(0, (qstat - (kk - 1)) / qstat) + 1e-9, 4)
        |    AS i_squared
        |FROM qq""") { c =>
      val b = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("k"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
            .as("u"),
          round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
            .as("v"))
      val g = b.groupBy("k", "u").agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"),
        sum(col("v").cast("decimal(38,0)") * col("v")).cast("double")
          .as("q"))
      val w = g.groupBy("k").agg(
        max(when(col("u") === 1, col("n"))).as("n1"),
        max(when(col("u") === 1, col("s"))).as("s1"),
        max(when(col("u") === 1, col("q"))).as("q1"),
        max(when(col("u") === 0, col("n"))).as("n0"),
        max(when(col("u") === 0, col("s"))).as("s0"),
        max(when(col("u") === 0, col("q"))).as("q0"))
      val e = w.select(col("k"),
        ((col("s1").cast("double") / col("n1") -
          col("s0").cast("double") / col("n0")) / 100).as("eff"),
        (((col("q1") - col("s1").cast("double") * col("s1") / col("n1")) /
          (col("n1") - 1) / col("n1") +
          (col("q0") - col("s0").cast("double") * col("s0") / col("n0")) /
            (col("n0") - 1) / col("n0")) / 10000).as("se2"))
      def pf(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("k"),
          term.as("t")))), lit(0.0), (a, x) => a + x.getField("t"))
      val t = e.agg(count(lit(1)).as("kk"),
        pf(lit(1) / col("se2")).as("sw"),
        pf(col("eff") / col("se2")).as("swe"))
      val p = t.select(col("kk"), col("sw"),
        (col("swe") / col("sw")).as("pooled"))
      val qq = e.crossJoin(broadcast(p)).groupBy("kk", "sw", "pooled")
        .agg(pf((col("eff") - col("pooled")) * (col("eff") -
          col("pooled")) / col("se2")).as("qstat"))
      qq.select(col("kk").as("k_studies"),
        r4(col("pooled")).as("pooled_effect_dollars"),
        r6(sqrt(lit(1) / col("sw"))).as("se_pooled"),
        r4(col("qstat")).as("q_stat"),
        r4(greatest(lit(0), (col("qstat") - (col("kk") - 1)) /
          col("qstat"))).as("i_squared"))
    },

    // TOST equivalence test (Schuirmann 1987 — the NON-inferiority
    // face of stat_ab_ttest: can we affirm the arms are the SAME
    // within ±δ, not merely fail to find a difference?): per-user
    // purchase deci-unit sums, exact integer moments per arm, margin
    // δ = 50 deci-units; both one-sided z statistics are closed forms,
    // and the verdict compares the ROUNDED statistics to 1.645 (the
    // FP-boolean rule). One user aggregate + one 2-group reduce.
    q("stat_equivalence_tost",
      """WITH u AS (SELECT user_id % 2 arm,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 10 + 1e-9) AS BIGINT)
        |        ELSE 0 END)::BIGINT v
        |  FROM events GROUP BY user_id),
        |g AS (SELECT arm, count(*)::BIGINT n, sum(v)::BIGINT s,
        |        sum(v::HUGEINT * v)::DOUBLE q FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 1 THEN n END) n1,
        |    max(CASE WHEN arm = 1 THEN s END) s1,
        |    max(CASE WHEN arm = 1 THEN q END) q1,
        |    max(CASE WHEN arm = 0 THEN n END) n0,
        |    max(CASE WHEN arm = 0 THEN s END) s0,
        |    max(CASE WHEN arm = 0 THEN q END) q0
        |  FROM g),
        |e AS (SELECT n0, n1,
        |    s1::DOUBLE / n1 - s0::DOUBLE / n0 diff,
        |    sqrt((q1 - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1
        |       + (q0 - s0::DOUBLE * s0 / n0) / (n0 - 1) / n0) se
        |  FROM w),
        |o AS (SELECT n0, n1, round(diff + 1e-9, 4) diff,
        |        round(se + 1e-9, 6) se,
        |        round((diff + 50) / se + 1e-9, 4) t_lower,
        |        round((diff - 50) / se + 1e-9, 4) t_upper
        |      FROM e)
        |SELECT n0, n1, diff AS diff_deci, se, t_lower, t_upper,
        |  (t_lower >= 1.645 AND t_upper <= -1.645) AS equivalent
        |FROM o""") { c =>
      val u = c.events.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase",
          round(col("value") * 10 + lit(1e-9)).cast("long"))
          .otherwise(0L)).as("v"))
        .select((col("user_id") % 2).as("arm"), col("v"))
      val g = u.groupBy("arm").agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"),
        sum(col("v").cast("decimal(38,0)") * col("v")).cast("double")
          .as("q"))
      val w = g.agg(
        max(when(col("arm") === 1, col("n"))).as("n1"),
        max(when(col("arm") === 1, col("s"))).as("s1"),
        max(when(col("arm") === 1, col("q"))).as("q1"),
        max(when(col("arm") === 0, col("n"))).as("n0"),
        max(when(col("arm") === 0, col("s"))).as("s0"),
        max(when(col("arm") === 0, col("q"))).as("q0"))
      val e = w.select(col("n0"), col("n1"),
        (col("s1").cast("double") / col("n1") -
          col("s0").cast("double") / col("n0")).as("diff"),
        sqrt((col("q1") - col("s1").cast("double") * col("s1") /
          col("n1")) / (col("n1") - 1) / col("n1") +
          (col("q0") - col("s0").cast("double") * col("s0") /
            col("n0")) / (col("n0") - 1) / col("n0")).as("se"))
      val o = e.select(col("n0"), col("n1"),
        r4(col("diff")).as("diff"), r6(col("se")).as("se"),
        r4((col("diff") + 50) / col("se")).as("t_lower"),
        r4((col("diff") - 50) / col("se")).as("t_upper"))
      o.select(col("n0"), col("n1"), col("diff").as("diff_deci"),
        col("se"), col("t_lower"), col("t_upper"),
        (col("t_lower") >= 1.645 && col("t_upper") <= -1.645)
          .as("equivalent"))
    },

    // Bland–Altman agreement analysis (Bland & Altman 1986 — the
    // method-comparison standard: never correlate two instruments,
    // chart their DIFFERENCES): measurement A is the order's stored
    // total, measurement B the total recomputed from its line items
    // (extprice·(1−disc)·(1+tax), per-line cents rounding) — a real
    // reconciliation pair. Per-order integer-cent differences give
    // exact Σd/Σd² (DECIMAL squares), the bias and 1.96σ limits of
    // agreement are closed forms, and the outside-LoA count compares
    // ROUNDED limits. Scale: one join + two aggregates.
    q("stat_bland_altman",
      """WITH l AS (SELECT l_orderkey k,
        |    sum(CAST(round(l_extendedprice * (1 - l_discount)
        |        * (1 + l_tax) * 100 + 1e-9) AS BIGINT))::BIGINT m2
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT)
        |        - l.m2 df
        |      FROM orders o JOIN l ON o.o_orderkey = l.k),
        |m AS (SELECT count(*)::BIGINT n, sum(df)::BIGINT s,
        |        sum(df::HUGEINT * df)::DOUBLE q FROM d),
        |b AS (SELECT n, s::DOUBLE / n bias,
        |        sqrt((q - s::DOUBLE * s / n) / (n - 1)) sd FROM m),
        |o AS (SELECT n, round(bias + 1e-9, 4) bias,
        |        round(bias - 1.96 * sd + 1e-9, 4) lo,
        |        round(bias + 1.96 * sd + 1e-9, 4) hi FROM b),
        |x AS (SELECT sum(CASE WHEN df < o.lo OR df > o.hi
        |        THEN 1 ELSE 0 END)::BIGINT n_outside
        |      FROM d, o)
        |SELECT o.n AS n_orders, o.bias AS bias_cents,
        |  o.lo AS loa_lower, o.hi AS loa_upper, x.n_outside,
        |  round(x.n_outside * 1.0 / o.n + 1e-9, 6) AS frac_outside
        |FROM o, x""") { c =>
      val l = c.lineitem.groupBy(col("l_orderkey").as("k"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) -
          col("l_discount")) * (lit(1) + col("l_tax")) * 100 +
          lit(1e-9)).cast("long")).as("m2"))
      val d = c.orders.join(l, col("o_orderkey") === col("k"))
        .select((round(col("o_totalprice") * 100 + lit(1e-9))
          .cast("long") - col("m2")).as("df"))
      val m = d.agg(count(lit(1)).as("n"), sum(col("df")).as("s"),
        sum(col("df").cast("decimal(38,0)") * col("df")).cast("double")
          .as("q"))
      val b = m.select(col("n"),
        (col("s").cast("double") / col("n")).as("bias"),
        sqrt((col("q") - col("s").cast("double") * col("s") / col("n")) /
          (col("n") - 1)).as("sd"))
      val o = b.select(col("n"), r4(col("bias")).as("bias"),
        r4(col("bias") - lit(1.96) * col("sd")).as("lo"),
        r4(col("bias") + lit(1.96) * col("sd")).as("hi"))
      val x = d.crossJoin(broadcast(o))
        .agg(sum(when(col("df") < col("lo") || col("df") > col("hi"),
          1L).otherwise(0L)).as("n_outside"))
      o.crossJoin(broadcast(x))
        .select(col("n").as("n_orders"), col("bias").as("bias_cents"),
          col("lo").as("loa_lower"), col("hi").as("loa_upper"),
          col("n_outside"),
          r6(col("n_outside") * lit(1.0) / col("n")).as("frac_outside"))
    },

    // Two-sided 10% TRIMMED MEAN (the robust location estimate between
    // the outlier-hostage mean and the information-discarding median):
    // computed EXACTLY and distributed — the order-statistic trim
    // never sorts the corpus; the (cents → count) histogram gets
    // exclusive cumulative counts via Positional.withCumSums, and each
    // distinct value contributes the INTEGER overlap of its rank span
    // [cum+1, cum+cnt] with the kept window (k, n−k]. Exact integer
    // sums end to end. One histogram aggregate + one bucketed cumsum.
    q("stat_trimmed_mean",
      """WITH o AS (SELECT CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) v
        |           FROM orders),
        |g AS (SELECT v, count(*)::BIGINT cnt FROM o GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT n FROM g),
        |cw AS (SELECT v, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cum
        |       FROM g),
        |kp AS (SELECT v, cnt, cum, t.n, t.n // 10 k,
        |         greatest(0, least(cum + cnt, t.n - t.n // 10)
        |                     - greatest(cum, t.n // 10)) keep
        |       FROM cw, t),
        |s AS (SELECT max(n) n, max(k) k, sum(keep)::BIGINT n_kept,
        |        sum(v * keep)::BIGINT skept, sum(v * cnt)::BIGINT sall
        |      FROM kp)
        |SELECT n AS n_orders, k AS k_trimmed_each_side, n_kept,
        |  round(skept * 1.0 / n_kept / 100 + 1e-9, 4)
        |    AS trimmed_mean_dollars,
        |  round(sall * 1.0 / n / 100 + 1e-9, 4) AS raw_mean_dollars
        |FROM s""") { c =>
      val o = c.orders.select(
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
          .as("v"))
      val g = o.groupBy("v").agg(count(lit(1)).as("cnt"))
      val t = g.agg(sum(col("cnt")).as("n"))
      val cw = graft.ops.Positional.withCumSums(g, Seq(col("v")),
        Seq(col("cnt") -> "cum"))
      val kp = cw.crossJoin(broadcast(t))
        .withColumn("k", (col("n") / 10).cast("long"))
        .withColumn("keep", greatest(lit(0L),
          least(col("cum") + col("cnt"), col("n") - col("k")) -
            greatest(col("cum"), col("k"))))
      val s = kp.agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("keep")).as("n_kept"),
        sum(col("v") * col("keep")).as("skept"),
        sum(col("v") * col("cnt")).as("sall"))
      s.select(col("n").as("n_orders"),
        col("k").as("k_trimmed_each_side"), col("n_kept"),
        r4(col("skept") * lit(1.0) / col("n_kept") / 100)
          .as("trimmed_mean_dollars"),
        r4(col("sall") * lit(1.0) / col("n") / 100)
          .as("raw_mean_dollars"))
    },

    // Rolling-origin forecast BACKTEST (Tashman 2000 — the evaluation
    // harness that belongs NEXT to ts_holt/ts_holt_winters: never
    // trust one split): three 24-hour test windows walking back from
    // the series end; three closed-form forecasters (naive-last,
    // seasonal-naive-168h, drift line); per-point errors are exact
    // integers (naive/seasonal) or rationals of integers (drift),
    // MAE/MAPE fold in pinned (origin, horizon) order. The hourly
    // series is time-bounded; the corpus is touched once.
    q("ts_backtest",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |  FROM events GROUP BY 1),
        |r AS (SELECT y, row_number() OVER (ORDER BY hb) rn,
        |        count(*) OVER () n FROM h),
        |og AS (SELECT unnest(generate_series(1, 3)) k),
        |ori AS (SELECT k, n - 24 * k o FROM og, (SELECT max(n) n FROM r) t),
        |base AS (SELECT ori.k, ori.o, lv.y yo, fv.y y1 FROM ori
        |         JOIN r lv ON lv.rn = ori.o
        |         JOIN r fv ON fv.rn = 1),
        |pt AS (SELECT base.k, base.o, base.yo, base.y1,
        |         unnest(generate_series(1, 24)) hz FROM base),
        |fc AS (SELECT pt.k, pt.hz, a.y act, pt.yo naive,
        |         sn.y snaive,
        |         pt.yo + pt.hz * (pt.yo - pt.y1) * 1.0 / (pt.o - 1) drift
        |       FROM pt JOIN r a ON a.rn = pt.o + pt.hz
        |       JOIN r sn ON sn.rn = pt.o + pt.hz - 168),
        |m AS (SELECT 'm1_naive' fc_method,
        |        sum(abs(act - naive))::BIGINT ae_i, 0.0 ae_d,
        |        list_reduce(list(abs(act - naive) * 1.0 / act
        |          ORDER BY k, hz), (x, y) -> x + y) pe,
        |        count(*)::BIGINT np FROM fc
        |      UNION ALL
        |      SELECT 'm2_seasonal', sum(abs(act - snaive))::BIGINT, 0.0,
        |        list_reduce(list(abs(act - snaive) * 1.0 / act
        |          ORDER BY k, hz), (x, y) -> x + y),
        |        count(*)::BIGINT FROM fc
        |      UNION ALL
        |      SELECT 'm3_drift', 0::BIGINT,
        |        list_reduce(list(abs(act - drift) ORDER BY k, hz),
        |          (x, y) -> x + y),
        |        list_reduce(list(abs(act - drift) / act
        |          ORDER BY k, hz), (x, y) -> x + y),
        |        count(*)::BIGINT FROM fc)
        |SELECT fc_method,
        |  round((ae_i + ae_d) / np / 100 + 1e-9, 4) AS mae_dollars,
        |  round(pe / np + 1e-9, 6) AS mape
        |FROM m ORDER BY fc_method""") { c =>
      val h = c.events.select(
          floor(expr("unix_timestamp(ts)") / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cents"))
        .groupBy("hb").agg(sum(col("cents")).as("y"))
      val w = Window.orderBy("hb")
      val r = h.select(col("y"), row_number().over(w).cast("long")
          .as("rn"),
        count(lit(1)).over(Window.partitionBy()).as("n")).persist()
      val sp3 = c.spark
      import sp3.implicits._
      val og = (1 to 3).toDF("k")
      val ori = broadcast(og).crossJoin(
          broadcast(r.agg(max(col("n")).as("nn"))))
        .select(col("k"), (col("nn") - col("k") * 24).as("o"))
      val base = ori
        .join(r.select(col("rn").as("ro"), col("y").as("yo")),
          col("ro") === col("o"))
        .crossJoin(broadcast(r.filter(col("rn") === 1)
          .select(col("y").as("y1"))))
      val pt = base.select(col("k"), col("o"), col("yo"), col("y1"),
        explode(sequence(lit(1L), lit(24L))).as("hz"))
      val fc = pt
        .join(r.select(col("rn").as("ra"), col("y").as("act")),
          col("ra") === col("o") + col("hz"))
        .join(r.select(col("rn").as("rs"), col("y").as("snaive")),
          col("rs") === col("o") + col("hz") - 168)
        .select(col("k"), col("hz"), col("act"), col("yo").as("naive"),
          col("snaive"),
          (col("yo") + col("hz") * (col("yo") - col("y1")) * lit(1.0) /
            (col("o") - 1)).as("drift"))
      def pf(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("k"), col("hz"),
          term.as("t")))), lit(0.0), (a, e) => a + e.getField("t"))
      val m1 = fc.agg(lit("m1_naive").as("fc_method"),
        sum(abs(col("act") - col("naive"))).as("ae_i"),
        lit(0.0).as("ae_d"),
        pf(abs(col("act") - col("naive")) * lit(1.0) / col("act"))
          .as("pe"),
        count(lit(1)).as("np"))
      val m2 = fc.agg(lit("m2_seasonal").as("fc_method"),
        sum(abs(col("act") - col("snaive"))).as("ae_i"),
        lit(0.0).as("ae_d"),
        pf(abs(col("act") - col("snaive")) * lit(1.0) / col("act"))
          .as("pe"),
        count(lit(1)).as("np"))
      val m3 = fc.agg(lit("m3_drift").as("fc_method"),
        lit(0L).as("ae_i"),
        pf(abs(col("act") - col("drift"))).as("ae_d"),
        pf(abs(col("act") - col("drift")) / col("act")).as("pe"),
        count(lit(1)).as("np"))
      m1.union(m2).union(m3)
        .select(col("fc_method"),
          r4((col("ae_i") + col("ae_d")) / col("np") / 100)
            .as("mae_dollars"),
          r6(col("pe") / col("np")).as("mape"))
        .orderBy("fc_method")
    },

    // Time-to-convert distribution (the funnel-latency readout beside
    // win_funnel's step counts — HOW LONG does signup → purchase
    // take?): per user the first signup and the first purchase AFTER
    // it, delay floored to integer hours; exact p50/p90 from the
    // delay HISTOGRAM's cumulative counts (domain-bounded — hours of
    // history, not users), conversion share as an integer ratio. Two
    // hash aggregates + a histogram window.
    q("events_time_to_convert",
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup'
        |        THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |        END) su
        |  FROM events GROUP BY 1),
        |p AS (SELECT e.user_id,
        |    min(CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))) AS BIGINT)) pu
        |  FROM events e JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'purchase' AND u.su IS NOT NULL
        |    AND CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))) AS BIGINT)
        |        >= u.su
        |  GROUP BY 1),
        |d AS (SELECT (p.pu - u.su) // 3600 dh FROM p
        |      JOIN u ON p.user_id = u.user_id),
        |ns AS (SELECT count(*)::BIGINT n_signups FROM u
        |       WHERE su IS NOT NULL),
        |g AS (SELECT dh, count(*)::BIGINT cnt FROM d GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT nc FROM g),
        |cw AS (SELECT dh, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY dh
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cum
        |       FROM g),
        |qs AS (SELECT
        |    min(CASE WHEN cum + cnt >= (t.nc + 1) // 2 THEN dh END) p50,
        |    min(CASE WHEN cum + cnt >= (t.nc * 9 + 9) // 10 THEN dh END)
        |      p90,
        |    max(dh) mx FROM cw, t GROUP BY t.nc)
        |SELECT ns.n_signups, t.nc AS n_converted,
        |  round(t.nc * 1.0 / ns.n_signups + 1e-9, 4) AS conv_rate,
        |  qs.p50 AS p50_hours, qs.p90 AS p90_hours,
        |  qs.mx AS max_hours
        |FROM ns, t, qs""") { c =>
      val sec = expr("unix_timestamp(ts)")
      val u = c.events.groupBy("user_id").agg(
        min(when(col("event_type") === "signup", sec)).as("su"))
      val p = c.events.filter(col("event_type") === "purchase")
        .join(u.filter(col("su").isNotNull), Seq("user_id"))
        .filter(sec >= col("su"))
        .groupBy("user_id").agg(min(sec).as("pu"), max(col("su")).as("su2"))
      val d = p.select(((col("pu") - col("su2")) / 3600).cast("long")
        .as("dh"))
      val ns = u.filter(col("su").isNotNull)
        .agg(count(lit(1)).as("n_signups"))
      val g = d.groupBy("dh").agg(count(lit(1)).as("cnt"))
      val t = g.agg(sum(col("cnt")).as("nc"))
      val cw = graft.ops.Positional.withCumSums(g, Seq(col("dh")),
        Seq(col("cnt") -> "cum"))
      // grouping-FREE scalar aggregate (nc is constant across rows, so
      // max(nc) ≡ the oracle's GROUP BY t.nc key; the isNotNull filter
      // reproduces the oracle's empty-histogram edge where GROUP BY
      // over zero rows yields zero rows) — a 1-row agg the BNLJ plan
      // audit recognizes as a bounded broadcast build side
      val qs = cw.crossJoin(broadcast(t)).agg(
        min(when(col("cum") + col("cnt") >=
          ((col("nc") + 1) / 2).cast("long"), col("dh"))).as("p50"),
        min(when(col("cum") + col("cnt") >=
          ((col("nc") * 9 + 9) / 10).cast("long"), col("dh"))).as("p90"),
        max(col("dh")).as("mx"),
        max(col("nc")).as("nc"))
        .filter(col("nc").isNotNull)
      ns.crossJoin(broadcast(qs))
        .select(col("n_signups"), col("nc").as("n_converted"),
          r4(col("nc") * lit(1.0) / col("n_signups")).as("conv_rate"),
          col("p50").as("p50_hours"), col("p90").as("p90_hours"),
          col("mx").as("max_hours"))
    },

    // Overdispersion / negative-binomial moment fit (the count-data
    // reality check before any Poisson assumption — user event counts
    // are NEVER Poisson): per-user event counts give exact integer
    // moments; the variance-to-mean ratio, and the method-of-moments
    // NB parameters r = m²/(v−m), p = m/v, are closed forms written
    // identically on both engines. One user aggregate + one moment
    // reduce.
    q("stat_overdispersion",
      """WITH u AS (SELECT user_id, count(*)::BIGINT k FROM events
        |           GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT n, sum(k)::BIGINT s,
        |        sum(k * k)::BIGINT q FROM u),
        |e AS (SELECT n, s::DOUBLE / n mean,
        |        (q - s::DOUBLE * s / n) / (n - 1) vr FROM m)
        |SELECT n AS n_users, round(mean + 1e-9, 4) AS mean_events,
        |  round(vr + 1e-9, 4) AS var_events,
        |  round(vr / mean + 1e-9, 4) AS dispersion_ratio,
        |  round(mean * mean / (vr - mean) + 1e-9, 4) AS nb_r,
        |  round(mean / vr + 1e-9, 6) AS nb_p
        |FROM e""") { c =>
      val u = c.events.groupBy("user_id").agg(count(lit(1)).as("k"))
      val m = u.agg(count(lit(1)).as("n"), sum(col("k")).as("s"),
        sum(col("k") * col("k")).as("q"))
      val e = m.select(col("n"),
        (col("s").cast("double") / col("n")).as("mean"),
        ((col("q") - col("s").cast("double") * col("s") / col("n")) /
          (col("n") - 1)).as("vr"))
      e.select(col("n").as("n_users"), r4(col("mean")).as("mean_events"),
        r4(col("vr")).as("var_events"),
        r4(col("vr") / col("mean")).as("dispersion_ratio"),
        r4(col("mean") * col("mean") / (col("vr") - col("mean")))
          .as("nb_r"),
        r6(col("mean") / col("vr")).as("nb_p"))
    },

    // Wilson score confidence interval for a proportion (Wilson 1927 —
    // what every dashboard SHOULD show instead of the Wald interval
    // that breaks near 0/1 and small n): converted users over all
    // users, z = 1.96, the interval a closed form of the two integer
    // counts written identically on both engines. One aggregate.
    q("stat_wilson_ci",
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) cv
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT n, sum(cv)::BIGINT k FROM u),
        |e AS (SELECT n, k, k * 1.0 / n p,
        |        1.96 * 1.96 z2 FROM m)
        |SELECT n AS n_users, k AS n_converted,
        |  round(p + 1e-9, 6) AS rate,
        |  round((p + z2 / (2 * n)
        |         - 1.96 * sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)))
        |        / (1 + z2 / n) + 1e-9, 6) AS wilson_lo,
        |  round((p + z2 / (2 * n)
        |         + 1.96 * sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)))
        |        / (1 + z2 / n) + 1e-9, 6) AS wilson_hi
        |FROM e""") { c =>
      val u = c.events.groupBy("user_id").agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("cv"))
      val m = u.agg(count(lit(1)).as("n"), sum(col("cv")).as("k"))
      val e = m.select(col("n"), col("k"),
        (col("k") * lit(1.0) / col("n")).as("p"),
        (lit(1.96) * lit(1.96)).as("z2"))
      def bound(sign: Double) =
        (col("p") + col("z2") / (lit(2) * col("n")) +
          lit(sign) * lit(1.96) *
            sqrt(col("p") * (lit(1) - col("p")) / col("n") +
              col("z2") / (lit(4.0) * col("n") * col("n")))) /
          (lit(1) + col("z2") / col("n"))
      e.select(col("n").as("n_users"), col("k").as("n_converted"),
        r6(col("p")).as("rate"),
        r6(bound(-1.0)).as("wilson_lo"),
        r6(bound(1.0)).as("wilson_hi"))
    },

    // Mann–Kendall trend test (the nonparametric significance test
    // that belongs WITH ts_theilsen's slope — monotone trend without
    // distributional assumptions): S = Σ sign(v_j − v_i) over ordered
    // day pairs is a pure INTEGER, the tie-corrected variance
    // [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 is integer arithmetic, and
    // the continuity-corrected z is one closed-form expression. The
    // corpus collapses to the daily series first; the pair join is
    // day²-sized, not corpus-sized.
    q("stat_mann_kendall",
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY dy) rn FROM d),
        |sp AS (SELECT sum(CASE WHEN b.v > a.v THEN 1
        |           WHEN b.v < a.v THEN -1 ELSE 0 END)::BIGINT s
        |       FROM r a JOIN r b ON b.rn > a.rn),
        |nt AS (SELECT count(*)::BIGINT n FROM r),
        |tg AS (SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT tie_adj
        |       FROM (SELECT count(*)::BIGINT t FROM r GROUP BY v
        |             HAVING count(*) > 1)),
        |vr AS (SELECT (nt.n * (nt.n - 1) * (2 * nt.n + 5)
        |          - coalesce(tg.tie_adj, 0)) / 18.0 var_s
        |       FROM nt, tg)
        |SELECT nt.n AS n_days, sp.s AS s_stat,
        |  round(CASE WHEN sp.s > 0 THEN (sp.s - 1) / sqrt(vr.var_s)
        |        WHEN sp.s < 0 THEN (sp.s + 1) / sqrt(vr.var_s)
        |        ELSE 0.0 END + 1e-9, 4) AS z_stat
        |FROM sp, nt, vr""") { c =>
      val d = c.orders
        .select(col("o_orderdate").cast("date").as("dy"),
          round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
            .as("cents"))
        .groupBy("dy").agg(sum(col("cents")).as("v"))
      val w = Window.orderBy("dy")
      val r = d.select(col("v"), row_number().over(w).cast("long")
        .as("rn")).persist()
      val sp = r.as("a").join(r.as("b"), col("b.rn") > col("a.rn"))
        .agg(sum(when(col("b.v") > col("a.v"), 1L)
          .when(col("b.v") < col("a.v"), -1L).otherwise(0L)).as("s"))
      val nt = r.agg(count(lit(1)).as("n"))
      val tg = r.groupBy("v").agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie_adj"))
      val vr = nt.crossJoin(broadcast(tg)).select(col("n"),
        ((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
          coalesce(col("tie_adj"), lit(0L))) / 18.0).as("var_s"))
      sp.crossJoin(broadcast(vr))
        .select(col("n").as("n_days"), col("s").as("s_stat"),
          r4(when(col("s") > 0,
            (col("s") - 1) / sqrt(col("var_s")))
            .when(col("s") < 0, (col("s") + 1) / sqrt(col("var_s")))
            .otherwise(lit(0.0))).as("z_stat"))
    },

    // Friedman test (the repeated-measures companion to
    // stat_kruskal_wallis — rank the k treatments WITHIN each block,
    // so block-level differences cancel): blocks are nations,
    // treatments the 5 order priorities, the blocked response each
    // cell's mean order price. Within-block ranks order by the exact
    // rational mean with the priority as a total-order tiebreak (both
    // engines sort identical doubles); χ²_F = 12/(nk(k+1))·ΣR_j² −
    // 3n(k+1) is then pure integer arithmetic over the k rank sums.
    // One corpus aggregate; ranking runs over the n×k cell table.
    q("stat_friedman",
      """WITH cell AS (SELECT c.c_nationkey b, o.o_orderpriority tr,
        |    sum(CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT s,
        |    count(*)::BIGINT n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT b, tr,
        |    row_number() OVER (PARTITION BY b
        |      ORDER BY s * 1.0 / n, tr) r
        |  FROM cell),
        |rs AS (SELECT tr, sum(r)::BIGINT rsum FROM rk GROUP BY 1),
        |nb AS (SELECT count(DISTINCT b)::BIGINT n,
        |         count(DISTINCT tr)::BIGINT k FROM cell)
        |SELECT nb.n AS n_blocks, nb.k AS k_treatments,
        |  round(12.0 / (nb.n * nb.k * (nb.k + 1))
        |        * (SELECT sum(rsum * rsum) FROM rs)
        |        - 3.0 * nb.n * (nb.k + 1) + 1e-9, 4) AS chi2_f
        |FROM nb""") { c =>
      val cell = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("b"),
          col("o_orderpriority").as("tr"))
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
            .cast("long")).as("s"),
          count(lit(1)).as("n"))
      val w = Window.partitionBy("b")
        .orderBy(col("s") * lit(1.0) / col("n"), col("tr"))
      val rk = cell.select(col("b"), col("tr"),
        row_number().over(w).cast("long").as("r"))
      val rs = rk.groupBy("tr").agg(sum(col("r")).as("rsum"))
      val sq = rs.agg(sum(col("rsum") * col("rsum")).as("ssq"))
      val nb = cell.agg(countDistinct(col("b")).as("n"),
        countDistinct(col("tr")).as("k"))
      nb.crossJoin(broadcast(sq))
        .select(col("n").as("n_blocks"), col("k").as("k_treatments"),
          r4(lit(12.0) / (col("n") * col("k") * (col("k") + 1)) *
            col("ssq") - lit(3.0) * col("n") * (col("k") + 1))
            .as("chi2_f"))
    },

    // Nemenyi post-hoc pairwise test (1963) — the WHICH-treatments-
    // differ step after stat_friedman (as stat_dunn is to
    // Kruskal–Wallis, but on BLOCKED within-nation ranks): z_ij =
    // (R̄i − R̄j)/√(k(k+1)/(6n)) from the same within-block rank sums.
    // Rank sums are exact integers (row_number over n×k cells); each
    // z is one fixed double tree; the pair walk runs on the k-row
    // treatment relation — never the corpus.
    q("stat_nemenyi",
      """WITH cell AS (SELECT c.c_nationkey b, o.o_orderpriority tr,
        |    sum(CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT s,
        |    count(*)::BIGINT n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT b, tr,
        |    row_number() OVER (PARTITION BY b
        |      ORDER BY s * 1.0 / n, tr) r
        |  FROM cell),
        |rs AS (SELECT tr, sum(r)::BIGINT rsum FROM rk GROUP BY 1),
        |nb AS (SELECT count(DISTINCT b)::BIGINT n,
        |         count(DISTINCT tr)::BIGINT k FROM cell),
        |pr AS (SELECT a.tr t1, b.tr t2, a.rsum r1, b.rsum r2
        |       FROM rs a JOIN rs b ON a.tr < b.tr)
        |SELECT t1, t2,
        |  round(r1 * 1.0 / n + 1e-9, 4) AS mean_rank_1,
        |  round(r2 * 1.0 / n + 1e-9, 4) AS mean_rank_2,
        |  round((r1 * 1.0 / n - r2 * 1.0 / n)
        |        / sqrt(k * (k + 1.0) / (6.0 * n)) + 1e-9, 4) AS z
        |FROM pr, nb ORDER BY t1, t2""") { c =>
      val cell = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("b"),
          col("o_orderpriority").as("tr"))
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
            .cast("long")).as("s"),
          count(lit(1)).as("n"))
      val w = Window.partitionBy("b")
        .orderBy(col("s") * lit(1.0) / col("n"), col("tr"))
      val rk = cell.select(col("b"), col("tr"),
        row_number().over(w).cast("long").as("r"))
      val rs = rk.groupBy("tr").agg(sum(col("r")).as("rsum"))
      val nb = cell.agg(countDistinct(col("b")).as("n"),
        countDistinct(col("tr")).as("k"))
      val pr = rs.as("a")
        .join(broadcast(rs.as("b")), col("a.tr") < col("b.tr"))
        .select(col("a.tr").as("t1"), col("b.tr").as("t2"),
          col("a.rsum").as("r1"), col("b.rsum").as("r2"))
      val m1 = col("r1") * lit(1.0) / col("n")
      val m2 = col("r2") * lit(1.0) / col("n")
      pr.crossJoin(broadcast(nb))
        .select(col("t1"), col("t2"),
          r4(m1).as("mean_rank_1"), r4(m2).as("mean_rank_2"),
          r4((m1 - m2) /
            sqrt(col("k") * (col("k") + lit(1.0)) / (lit(6.0) * col("n"))))
            .as("z"))
        .orderBy("t1", "t2")
    },

    // Page–Hinkley sequential mean-shift detector (Page 1954; the
    // always-on drift monitor beside ts_cusum_changepoint's
    // retrospective split): per day t over integer dollar totals,
    // dev_t = x_t − x̄_t − δ with the RUNNING mean from exact cumsums,
    // M_t the ordered window cumsum of dev (window running sums fold
    // in window order — engine-invariant by construction), alarm at
    // the first ROUNDED M_t − min(M_{≤t}) > λ. The series is
    // time-bounded; the corpus is touched once.
    q("ts_page_hinkley",
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT)) // 100
        |      v
        |  FROM orders GROUP BY 1),
        |s AS (SELECT dy, v,
        |        sum(v) OVER w cs, row_number() OVER w t
        |      FROM d WINDOW w AS (ORDER BY dy)),
        |m AS (SELECT dy, t,
        |        sum(CAST(round((v - cs * 1.0 / t - 500.0) * 100 + 1e-9)
        |            AS BIGINT)) OVER (ORDER BY dy) mt
        |      FROM s),
        |ph AS (SELECT dy, t,
        |        round((mt - min(mt) OVER (ORDER BY dy)) / 100.0
        |          + 1e-9, 4) stat
        |      FROM m),
        |al AS (SELECT min(t) art FROM ph WHERE stat > 100000),
        |f AS (SELECT ph.dy::VARCHAR alarm_day, ph.t, ph.stat
        |      FROM ph, al WHERE ph.t = al.art),
        |nn AS (SELECT count(*)::BIGINT n,
        |         round(max(stat) + 1e-9, 4) mx FROM ph)
        |SELECT nn.n AS n_days, nn.mx AS max_stat,
        |  f.alarm_day, f.t AS alarm_t, f.stat AS alarm_stat
        |FROM nn LEFT JOIN f ON TRUE""") { c =>
      val d = c.orders
        .select(col("o_orderdate").cast("date").as("dy"),
          round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
            .as("cents"))
        .groupBy("dy")
        .agg((sum(col("cents")) / 100).cast("long").as("v"))
      val w = Window.orderBy("dy")
      val s = d.select(col("dy"), col("v"),
        sum(col("v")).over(w).as("cs"),
        row_number().over(w).cast("long").as("t"))
      // quantize the per-row deviation BEFORE the running sum so the
      // ordered cumsum is an exact integer fold (a raw double window
      // sum could associate differently across engines)
      val m = s.select(col("dy"), col("t"),
        sum(round((col("v") - col("cs") * lit(1.0) / col("t") -
          lit(500.0)) * 100 + lit(1e-9)).cast("long"))
          .over(w).as("mt"))
      val ph = m.select(col("dy"), col("t"),
        r4((col("mt") - min(col("mt")).over(w)) / 100.0).as("stat"))
      val al = ph.filter(col("stat") > 100000)
        .agg(min(col("t")).as("art"))
      val f = ph.crossJoin(broadcast(al)).filter(col("t") === col("art"))
        .select(col("dy").cast("string").as("alarm_day"),
          col("t").as("alarm_t"), col("stat").as("alarm_stat"))
      val nn = ph.agg(count(lit(1)).as("n_days"),
        r4(max(col("stat"))).as("max_stat"))
      nn.join(f, lit(true), "left")
        .select(col("n_days"), col("max_stat"), col("alarm_day"),
          col("alarm_t"), col("alarm_stat"))
    },

    // Lincoln–Petersen capture–recapture (the mark-recapture estimate
    // ecology gave data engineering — how many TOTAL distinct users
    // exist if two short capture windows overlap this much? the same
    // logic estimates corpus size from dedup overlap): n1 = users in
    // the first half, n2 = second half, m = both; Chapman's
    // bias-corrected N̂ = (n1+1)(n2+1)/(m+1) − 1 is a closed form of
    // three integer counts, compared against the true distinct count.
    // One user aggregate.
    q("stat_capture_recapture",
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND ts >= TIMESTAMP '2024-01-02 00:00:00'
        |        AND ts < TIMESTAMP '2024-01-05 00:00:00'
        |        THEN 1 ELSE 0 END) a,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND ts >= TIMESTAMP '2024-01-20 00:00:00'
        |        AND ts < TIMESTAMP '2024-01-23 00:00:00'
        |        THEN 1 ELSE 0 END) b
        |  FROM events GROUP BY 1),
        |m AS (SELECT sum(a)::BIGINT n1, sum(b)::BIGINT n2,
        |        sum(a * b)::BIGINT m, count(*)::BIGINT total FROM u)
        |SELECT n1, n2, m AS n_both, total AS true_total,
        |  round((n1 + 1.0) * (n2 + 1) / (m + 1) - 1 + 1e-9, 2)
        |    AS chapman_estimate,
        |  round(((n1 + 1.0) * (n2 + 1) / (m + 1) - 1 - total) / total
        |        + 1e-9, 6) AS rel_err
        |FROM m""") { c =>
      def win(lo: String, hi: String) =
        col("event_type") === "purchase" &&
          col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp")
      val u = c.events.groupBy("user_id").agg(
        max(when(win("2024-01-02 00:00:00", "2024-01-05 00:00:00"), 1L)
          .otherwise(0L)).as("a"),
        max(when(win("2024-01-20 00:00:00", "2024-01-23 00:00:00"), 1L)
          .otherwise(0L)).as("b"))
      val m = u.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
        sum(col("a") * col("b")).as("m"), count(lit(1)).as("total"))
      val est = (col("n1") + lit(1.0)) * (col("n2") + 1) /
        (col("m") + 1) - 1
      m.select(col("n1"), col("n2"), col("m").as("n_both"),
        col("total").as("true_total"),
        r2(est).as("chapman_estimate"),
        r6((est - col("total")) / col("total")).as("rel_err"))
    },

    // Lorenz curve points (the PICTURE behind stat_gini — what share
    // of revenue do the bottom d deciles of customers hold?): exact
    // decile boundaries and cumulative value shares from the
    // customer-revenue HISTOGRAM's cumulative counts/sums (the
    // trimmed-mean rank-span device) — each decile row reports the
    // exact cumulative population and revenue shares as integer
    // ratios. Histogram-sized work after one corpus aggregate.
    q("stat_lorenz_curve",
      """WITH u AS (SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT v
        |  FROM orders GROUP BY 1),
        |g AS (SELECT v, count(*)::BIGINT cnt,
        |        sum(v)::BIGINT vs_g FROM u GROUP BY v),
        |t AS (SELECT sum(cnt)::BIGINT n, sum(vs_g)::BIGINT tv FROM g),
        |cw AS (SELECT v, cnt, vs_g,
        |         coalesce(sum(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) ccnt,
        |         coalesce(sum(vs_g) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cval
        |       FROM g),
        |dc AS (SELECT unnest(generate_series(1, 10)) d),
        |pt AS (SELECT dc.d, t.n, t.tv,
        |         (dc.d * t.n) // 10 kd FROM dc, t),
        |lz AS (SELECT pt.d, pt.kd, pt.n, pt.tv,
        |         max(cw.cval + (pt.kd - cw.ccnt) * cw.v) cum_v
        |       FROM pt JOIN cw ON cw.ccnt < pt.kd
        |         AND pt.kd <= cw.ccnt + cw.cnt
        |       GROUP BY 1, 2, 3, 4)
        |SELECT d AS decile, kd AS n_customers,
        |  round(kd * 1.0 / n + 1e-9, 4) AS pop_share,
        |  round(cum_v * 1.0 / tv + 1e-9, 6) AS value_share
        |FROM lz ORDER BY d""") { c =>
      val u = c.orders.groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
          .cast("long")).as("v"))
      val g = u.groupBy("v")
        .agg(count(lit(1)).as("cnt"), sum(col("v")).as("vs_g"))
      val t = g.agg(sum(col("cnt")).as("n"), sum(col("vs_g")).as("tv"))
      val cw = graft.ops.Positional.withCumSums(g, Seq(col("v")),
        Seq(col("cnt") -> "ccnt", col("vs_g") -> "cval"))
      val sp4 = c.spark
      import sp4.implicits._
      val dc = (1 to 10).toDF("d")
      val pt = broadcast(dc).crossJoin(broadcast(t))
        .select(col("d"), col("n"), col("tv"),
          ((col("d") * col("n")) / 10).cast("long").as("kd"))
      val lz = pt.join(cw,
          col("ccnt") < col("kd") &&
            col("kd") <= col("ccnt") + col("cnt"))
        .groupBy("d", "kd", "n", "tv")
        .agg(max(col("cval") + (col("kd") - col("ccnt")) * col("v"))
          .as("cum_v"))
      lz.select(col("d").as("decile"), col("kd").as("n_customers"),
          r4(col("kd") * lit(1.0) / col("n")).as("pop_share"),
          r6(col("cum_v") * lit(1.0) / col("tv")).as("value_share"))
        .orderBy("decile")
    },

    // Weibull fit by median-rank regression (the reliability-
    // engineering standard — shape k tells wear-out from infant
    // mortality): time-to-first-purchase hours, Bernard's median ranks
    // F_i = (i−0.3)/(n+0.4) over the duration histogram's exact
    // cumulative counts, OLS of ln(−ln(1−F)) on ln(t) with pinned
    // folds over the distinct durations (the zipf-fit ln-regression
    // stance); shape = slope, scale = exp(−intercept/slope).
    // Histogram-sized work after one corpus aggregate.
    q("stat_weibull_fit",
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup'
        |        THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |        END) su
        |  FROM events GROUP BY 1),
        |p AS (SELECT e.user_id,
        |    min(CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))) AS BIGINT)) pu
        |  FROM events e JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'purchase' AND u.su IS NOT NULL
        |    AND CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))) AS BIGINT)
        |        >= u.su
        |  GROUP BY 1),
        |d AS (SELECT greatest((p.pu - u.su) // 3600, 1) dh FROM p
        |      JOIN u ON p.user_id = u.user_id),
        |g AS (SELECT dh, count(*)::BIGINT cnt FROM d GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT n FROM g),
        |cw AS (SELECT dh, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY dh
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cum
        |       FROM g),
        |xy AS (SELECT dh, ln(dh::DOUBLE) x,
        |         ln(-ln(1 - (cum + cnt - 0.3) / (t.n + 0.4))) y
        |       FROM cw, t WHERE cum + cnt < t.n),
        |m AS (SELECT count(*)::BIGINT k,
        |    list_reduce(list(x ORDER BY dh), (a, b) -> a + b) sx,
        |    list_reduce(list(y ORDER BY dh), (a, b) -> a + b) sy,
        |    list_reduce(list(x * x ORDER BY dh), (a, b) -> a + b) sxx,
        |    list_reduce(list(x * y ORDER BY dh), (a, b) -> a + b) sxy
        |  FROM xy),
        |f AS (SELECT k,
        |    (k * sxy - sx * sy) / (k * sxx - sx * sx) shape,
        |    (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
        |      icpt FROM m)
        |SELECT k AS n_points, round(shape + 1e-9, 4) AS weibull_shape,
        |  round(exp(-icpt / shape) + 1e-9, 2) AS weibull_scale_hours
        |FROM f""") { c =>
      val sec = expr("unix_timestamp(ts)")
      val u = c.events.groupBy("user_id").agg(
        min(when(col("event_type") === "signup", sec)).as("su"))
      val p = c.events.filter(col("event_type") === "purchase")
        .join(u.filter(col("su").isNotNull), Seq("user_id"))
        .filter(sec >= col("su"))
        .groupBy("user_id")
        .agg(min(sec).as("pu"), max(col("su")).as("su2"))
      val d = p.select(greatest(((col("pu") - col("su2")) / 3600)
        .cast("long"), lit(1L)).as("dh"))
      val g = d.groupBy("dh").agg(count(lit(1)).as("cnt"))
      val t = g.agg(sum(col("cnt")).as("n"))
      val cw = graft.ops.Positional.withCumSums(g, Seq(col("dh")),
        Seq(col("cnt") -> "cum"))
      val xy = cw.crossJoin(broadcast(t))
        .filter(col("cum") + col("cnt") < col("n"))
        .select(col("dh"), log(col("dh").cast("double")).as("x"),
          log(-log(lit(1) - (col("cum") + col("cnt") - lit(0.3)) /
            (col("n") + lit(0.4)))).as("y"))
      def pf(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("dh"),
          term.as("t")))), lit(0.0), (a, e) => a + e.getField("t"))
      val m = xy.agg(count(lit(1)).as("k"), pf(col("x")).as("sx"),
        pf(col("y")).as("sy"), pf(col("x") * col("x")).as("sxx"),
        pf(col("x") * col("y")).as("sxy"))
      val shape = (col("k") * col("sxy") - col("sx") * col("sy")) /
        (col("k") * col("sxx") - col("sx") * col("sx"))
      val f = m.select(col("k"), shape.as("shape"),
        ((col("sy") - shape * col("sx")) / col("k")).as("icpt"))
      f.select(col("k").as("n_points"),
        r4(col("shape")).as("weibull_shape"),
        r2(exp(-col("icpt") / col("shape"))).as("weibull_scale_hours"))
    },

    // Chi-square independence test on the event_type × arm contingency
    // table: observed counts are one hash aggregation; expected counts
    // are rationals of the integer marginals; the statistic sums
    // (o−e)²/e over the r×c (model-sized) table.
    q("stat_chi2",
      """WITH p AS (SELECT event_type, user_id % 2 AS arm FROM events),
        |o AS (SELECT event_type, arm, count(*) obs FROM p GROUP BY 1, 2),
        |m AS (SELECT o.event_type, o.arm, o.obs,
        |             sum(o.obs) OVER (PARTITION BY o.event_type) rt,
        |             sum(o.obs) OVER (PARTITION BY o.arm) ct,
        |             sum(o.obs) OVER () n
        |      FROM o)
        |SELECT round(sum(pow(obs - rt * (ct * 1.0) / n, 2)
        |                 / (rt * (ct * 1.0) / n)) + 1e-9, 4) AS chi2,
        |       (count(DISTINCT event_type) - 1)
        |         * (count(DISTINCT arm) - 1) AS dof,
        |       max(n)::BIGINT AS n
        |FROM m""") { c =>
      import org.apache.spark.sql.expressions.Window
      val o = c.events.select(col("event_type"),
          (col("user_id") % 2).as("arm"))
        .groupBy("event_type", "arm").agg(count(lit(1)).as("obs"))
      // windows over the r×c contingency table — model-sized
      val m = o
        .withColumn("rt", sum(col("obs")).over(
          Window.partitionBy("event_type")))
        .withColumn("ct", sum(col("obs")).over(Window.partitionBy("arm")))
        .withColumn("n", sum(col("obs")).over(
          Window.partitionBy(lit(1))))
      // rt·(ct·1.0): the margin product goes through DOUBLE — as a
      // BIGINT product rt·ct is SF² and passes 2^63 near events
      // SF~50 (WidthAuditSpec found the left-to-right grouping)
      m.agg(
        r4(sum(pow(col("obs") - col("rt") * (col("ct") * lit(1.0)) / col("n"),
          2) / (col("rt") * (col("ct") * lit(1.0)) / col("n")))).as("chi2"),
        ((countDistinct(col("event_type")) - 1) *
          (countDistinct(col("arm")) - 1)).as("dof"),
        max(col("n")).as("n"))
    },

    // Two-sample Kolmogorov-Smirnov on view values between the arms:
    // D = max |F0(x) − F1(x)| over the COMBINED support. The per-value
    // arm counts are one aggregation; both cumulative counts come from
    // ONE Positional.withCumSums pass (shared bucket exchange, no
    // single-partition window even though the support is continuous /
    // corpus-cardinality). The max runs on the INTEGER cross-scaled
    // difference |c0·n1 − c1·n0| so D is an exact rational (long
    // arithmetic bounds this at n0·n1 < 2^63 — quantize first beyond
    // ~3·10^9 rows per arm).
    q("stat_ks_2sample",
      """WITH v AS (SELECT user_id % 2 AS arm, value
        |           FROM events WHERE event_type = 'view'),
        |h AS (SELECT value,
        |             count(*) FILTER (arm = 0) w0,
        |             count(*) FILTER (arm = 1) w1
        |      FROM v GROUP BY 1),
        |t AS (SELECT sum(w0) n0, sum(w1) n1 FROM h),
        |cum AS (SELECT value, w0, w1,
        |               sum(w0) OVER (ORDER BY value) c0,
        |               sum(w1) OVER (ORDER BY value) c1
        |        FROM h)
        |SELECT t.n0::BIGINT AS n0, t.n1::BIGINT AS n1,
        |       round(max(abs(c0 * t.n1 - c1 * t.n0))
        |             / (t.n0 * 1.0 * t.n1) + 1e-9, 6) AS d_stat
        |FROM cum, t GROUP BY t.n0, t.n1""") { c =>
      val v = c.events.filter(col("event_type") === "view")
        .select((col("user_id") % 2).as("arm"), col("value"))
      val h = v.groupBy("value").agg(
        count(when(col("arm") === 0, 1)).as("w0"),
        count(when(col("arm") === 1, 1)).as("w1"))
      val t = h.agg(sum(col("w0")).as("n0"), sum(col("w1")).as("n1"))
      // exclusive cumsums + own weight = inclusive ECDF counts
      val cum = Positional.withCumSums(h, Seq(col("value")),
        Seq(col("w0") -> "e0", col("w1") -> "e1"))
        .withColumn("c0", col("e0") + col("w0"))
        .withColumn("c1", col("e1") + col("w1"))
      cum.crossJoin(broadcast(t))
        .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
          r6(max(abs(col("c0") * col("n1") - col("c1") * col("n0"))) /
            (max(col("n0")) * lit(1.0) * max(col("n1")))).as("d_stat"))
        .select(col("n0"), col("n1"), col("d_stat"))
    },

    // Association-rule mining (Agrawal & Srikant 1994, the 2-itemset
    // tier): co-purchased part pairs with support/confidence/lift from
    // integer basket counts. The pair enumeration is the same order-
    // keyed self-join as the graph queries (bounded by per-basket
    // fan-out, never corpus×corpus); rule metrics are exact rationals
    // rounded once. Top-10 by (lift, pair) via TakeOrdered; min support 2 baskets at this corpus density.
    q("mine_assoc_rules",
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |           WHERE l_quantity > 40),
        |n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b),
        |item AS (SELECT l_partkey, count(*) cnt FROM b GROUP BY 1),
        |pair AS (SELECT a.l_partkey x, b2.l_partkey y, count(*) cxy
        |         FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
        |         WHERE a.l_partkey < b2.l_partkey
        |         GROUP BY 1, 2 HAVING count(*) >= 2),
        |r AS (SELECT p.x, p.y, p.cxy, ix.cnt cx, iy.cnt cy, n.nb
        |      FROM pair p JOIN item ix ON p.x = ix.l_partkey
        |                  JOIN item iy ON p.y = iy.l_partkey
        |                  CROSS JOIN n)
        |SELECT x, y, cxy::BIGINT AS n_xy,
        |       round(cxy * 1.0 / nb + 1e-9, 6) AS support,
        |       round(cxy * 1.0 / cx + 1e-9, 6) AS confidence,
        |       round(cxy * 1.0 * nb / (cx * 1.0 * cy) + 1e-9, 4) AS lift
        |FROM r ORDER BY lift DESC, x, y LIMIT 10""") { c =>
      val b = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = b.agg(countDistinct(col("l_orderkey")).as("nb"))
      val item = b.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      val pair = b.as("a").join(b.as("b2"),
          col("a.l_orderkey") === col("b2.l_orderkey") &&
            col("a.l_partkey") < col("b2.l_partkey"))
        .select(col("a.l_partkey").as("x"), col("b2.l_partkey").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 2)
      pair
        .join(item.select(col("l_partkey").as("x"), col("cnt").as("cx")),
          Seq("x"))
        .join(item.select(col("l_partkey").as("y"), col("cnt").as("cy")),
          Seq("y"))
        .crossJoin(broadcast(n))
        .select(col("x"), col("y"), col("cxy").as("n_xy"),
          r6(col("cxy") * lit(1.0) / col("nb")).as("support"),
          r6(col("cxy") * lit(1.0) / col("cx")).as("confidence"),
          r4(col("cxy") * lit(1.0) * col("nb") /
            (col("cx") * lit(1.0) * col("cy"))).as("lift"))
        .orderBy(col("lift").desc, col("x"), col("y")).limit(10)
    },

    // 2×2 difference-in-differences (Card & Krueger's workhorse causal
    // design): DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) over
    // per-user period totals, with the standard four-cell SE
    // √(Σ s²_cell/n_cell). Same determinism machinery as ab_cuped:
    // deci-quantized per-user BIGINT sums, cell variances from exact
    // integer moments (squares via DECIMAL/HUGEINT), doubles only in
    // the final closed forms written identically on both engines.
    q("ab_did",
      """WITH e AS (SELECT user_id, user_id % 2 AS variant,
        |             CAST(round(value * 10 + 1e-9) AS BIGINT) v,
        |             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |                  THEN 0 ELSE 1 END AS period
        |           FROM events),
        |u AS (SELECT user_id, max(variant) variant, period,
        |        sum(v)::BIGINT y
        |      FROM e GROUP BY 1, 3),
        |g AS (SELECT variant, period, count(*)::BIGINT n,
        |        sum(y)::BIGINT s, CAST(sum(y::HUGEINT * y) AS DOUBLE) s2
        |      FROM u GROUP BY 1, 2),
        |w AS (SELECT
        |  max(CASE WHEN variant=1 AND period=1 THEN s END)::DOUBLE stp,
        |  max(CASE WHEN variant=1 AND period=1 THEN n END) ntp,
        |  max(CASE WHEN variant=1 AND period=1 THEN s2 END) qtp,
        |  max(CASE WHEN variant=1 AND period=0 THEN s END)::DOUBLE str,
        |  max(CASE WHEN variant=1 AND period=0 THEN n END) ntr,
        |  max(CASE WHEN variant=1 AND period=0 THEN s2 END) qtr,
        |  max(CASE WHEN variant=0 AND period=1 THEN s END)::DOUBLE scp,
        |  max(CASE WHEN variant=0 AND period=1 THEN n END) ncp,
        |  max(CASE WHEN variant=0 AND period=1 THEN s2 END) qcp,
        |  max(CASE WHEN variant=0 AND period=0 THEN s END)::DOUBLE scr,
        |  max(CASE WHEN variant=0 AND period=0 THEN n END) ncr,
        |  max(CASE WHEN variant=0 AND period=0 THEN s2 END) qcr
        |  FROM g)
        |SELECT ntp, ntr, ncp, ncr,
        |  round(((stp/ntp - str/ntr) - (scp/ncp - scr/ncr)) / 10
        |        + 1e-9, 4) AS did,
        |  round(sqrt((qtp - stp*stp/ntp) / (ntp - 1) / ntp +
        |             (qtr - str*str/ntr) / (ntr - 1) / ntr +
        |             (qcp - scp*scp/ncp) / (ncp - 1) / ncp +
        |             (qcr - scr*scr/ncr) / (ncr - 1) / ncr) / 10
        |        + 1e-9, 4) AS se,
        |  round((((stp/ntp - str/ntr) - (scp/ncp - scr/ncr)) / 10) /
        |        (sqrt((qtp - stp*stp/ntp) / (ntp - 1) / ntp +
        |              (qtr - str*str/ntr) / (ntr - 1) / ntr +
        |              (qcp - scp*scp/ncp) / (ncp - 1) / ncp +
        |              (qcr - scr*scr/ncr) / (ncr - 1) / ncr) / 10)
        |        + 1e-9, 4) AS t_stat
        |FROM w""") { c =>
      val e = c.events.select(col("user_id"),
        (col("user_id") % 2).as("variant"),
        round(col("value") * 10 + lit(1e-9)).cast("long").as("v"),
        when(col("ts") <
          lit("2024-01-16 00:00:00").cast("timestamp_ntz"), 0)
          .otherwise(1).as("period"))
      val u = e.groupBy("user_id", "period")
        .agg(max(col("variant")).as("variant"), sum(col("v")).as("y"))
      val g = u.groupBy("variant", "period").agg(count(lit(1)).as("n"),
        sum(col("y")).as("s"),
        sum(col("y").cast("decimal(38,0)") * col("y")).cast("double")
          .as("s2"))
      val cell = (v: Int, p: Int, cn: String) =>
        max(when(col("variant") === v && col("period") === p, col(cn)))
      val w = g.agg(
        cell(1, 1, "s").cast("double").as("stp"), cell(1, 1, "n").as("ntp"),
        cell(1, 1, "s2").as("qtp"),
        cell(1, 0, "s").cast("double").as("str"), cell(1, 0, "n").as("ntr"),
        cell(1, 0, "s2").as("qtr"),
        cell(0, 1, "s").cast("double").as("scp"), cell(0, 1, "n").as("ncp"),
        cell(0, 1, "s2").as("qcp"),
        cell(0, 0, "s").cast("double").as("scr"), cell(0, 0, "n").as("ncr"),
        cell(0, 0, "s2").as("qcr"))
      val did = ((col("stp") / col("ntp") - col("str") / col("ntr")) -
        (col("scp") / col("ncp") - col("scr") / col("ncr"))) / 10
      val se = sqrt(
        (col("qtp") - col("stp") * col("stp") / col("ntp")) /
          (col("ntp") - 1) / col("ntp") +
        (col("qtr") - col("str") * col("str") / col("ntr")) /
          (col("ntr") - 1) / col("ntr") +
        (col("qcp") - col("scp") * col("scp") / col("ncp")) /
          (col("ncp") - 1) / col("ncp") +
        (col("qcr") - col("scr") * col("scr") / col("ncr")) /
          (col("ncr") - 1) / col("ncr")) / 10
      w.select(col("ntp"), col("ntr"), col("ncp"), col("ncr"),
        r4(did).as("did"), r4(se).as("se"),
        r4(did / se).as("t_stat"))
    },

    // Autocorrelation function of the hourly value series, lags 1-6
    // (the Box-Jenkins identification tool beside ts_holt/ts_kalman):
    // r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)², expanded to the
    // closed form (P_k − (A_k+B_k)·ȳ + n_k·ȳ²)/(Σy² − S·ȳ) so every
    // aggregated quantity is an EXACT BIGINT sum of quantized cents
    // (order-independent) and ȳ enters only through identical double
    // expressions on both engines. The hourly series is TIME-BOUNDED
    // (one row per hour of history, the seasonal-decomposition
    // stance), so the lag self-join is model-sized; the only
    // corpus-scale pass is the hourly aggregation.
    q("ts_acf",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |             sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |           FROM events GROUP BY 1),
        |st AS (SELECT count(*)::BIGINT m, sum(y)::BIGINT s,
        |         sum(y*y)::BIGINT syy FROM h),
        |l AS (SELECT unnest(generate_series(1, 6)) k),
        |p AS (SELECT l.k, count(*)::BIGINT nk,
        |        sum(a.y * b.y)::BIGINT pk,
        |        sum(a.y)::BIGINT ak, sum(b.y)::BIGINT bk
        |      FROM l JOIN h a ON TRUE JOIN h b ON b.hb = a.hb + l.k
        |      GROUP BY 1)
        |SELECT k, nk,
        |  round((pk - (ak + bk) * (s::DOUBLE / m)
        |         + nk * (s::DOUBLE / m) * (s::DOUBLE / m))
        |        / (syy - s * (s::DOUBLE / m)) + 1e-9, 6) AS acf
        |FROM p, st ORDER BY k""") { c =>
      val sp = c.spark
      import sp.implicits._
      val h = c.events.select(
          floor(expr("unix_timestamp(ts)") / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cents"))
        .groupBy("hb").agg(sum(col("cents")).as("y"))
      val st = h.agg(count(lit(1)).as("m"), sum(col("y")).as("s"),
        sum(col("y") * col("y")).as("syy"))
      val lags = (1 to 6).toDF("k")
      val p = broadcast(lags).crossJoin(h.select(col("hb"), col("y")))
        .join(h.select(col("hb").as("hb2"), col("y").as("y2")),
          col("hb2") === col("hb") + col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("nk"), sum(col("y") * col("y2")).as("pk"),
          sum(col("y")).as("ak"), sum(col("y2")).as("bk"))
      val ybar = col("s").cast("double") / col("m")
      p.crossJoin(broadcast(st))
        .select(col("k"), col("nk"),
          r6((col("pk") - (col("ak") + col("bk")) * ybar +
            col("nk") * ybar * ybar) /
            (col("syy") - col("s") * ybar)).as("acf"))
        .orderBy("k")
    },

    // Partial autocorrelation function, lags 1-4, via the
    // Durbin–Levinson recursion (Box-Jenkins AR-order identification —
    // the companion readout to ts_acf: PACF cuts off at lag p for an
    // AR(p) process where ACF only decays). The ACF lattice values are
    // computed exactly as in ts_acf (EXACT BIGINT sums of quantized
    // cents, rounded ONCE to the 1e-6 lattice), and the fixed-depth
    // recursion is then pure double arithmetic written STRUCTURALLY
    // IDENTICALLY on both engines over those identical lattice inputs
    // — the chained-CTE unroll device. Scale: one corpus-sized hourly
    // aggregation; everything after is a 6-row/1-row relation.
    q("ts_pacf",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |             sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |           FROM events GROUP BY 1),
        |st AS (SELECT count(*)::BIGINT m, sum(y)::BIGINT s,
        |         sum(y*y)::BIGINT syy FROM h),
        |l AS (SELECT unnest(generate_series(1, 4)) k),
        |p AS (SELECT l.k, count(*)::BIGINT nk,
        |        sum(a.y * b.y)::BIGINT pk,
        |        sum(a.y)::BIGINT ak, sum(b.y)::BIGINT bk
        |      FROM l JOIN h a ON TRUE JOIN h b ON b.hb = a.hb + l.k
        |      GROUP BY 1),
        |acf AS (SELECT k,
        |    round((pk - (ak + bk) * (s::DOUBLE / m)
        |           + nk * (s::DOUBLE / m) * (s::DOUBLE / m))
        |          / (syy - s * (s::DOUBLE / m)) + 1e-9, 6) r
        |  FROM p, st),
        |w AS (SELECT max(CASE WHEN k = 1 THEN r END) r1,
        |        max(CASE WHEN k = 2 THEN r END) r2,
        |        max(CASE WHEN k = 3 THEN r END) r3,
        |        max(CASE WHEN k = 4 THEN r END) r4 FROM acf),
        |d1 AS (SELECT r1, r2, r3, r4, r1 p11,
        |         (r2 - r1 * r1) / (1 - r1 * r1) p22 FROM w),
        |d2 AS (SELECT *, p11 - p22 * p11 p21 FROM d1),
        |d3 AS (SELECT *,
        |         (r3 - (p21 * r2 + p22 * r1))
        |           / (1 - (p21 * r1 + p22 * r2)) p33 FROM d2),
        |d4 AS (SELECT *, p21 - p33 * p22 p31,
        |         p22 - p33 * p21 p32 FROM d3),
        |d5 AS (SELECT *,
        |         (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
        |           / (1 - (p31 * r1 + p32 * r2 + p33 * r3)) p44 FROM d4)
        |SELECT k, round(pacf + 1e-9, 6) AS pacf FROM (
        |  SELECT 1::BIGINT k, p11 pacf FROM d5 UNION ALL
        |  SELECT 2::BIGINT, p22 FROM d5 UNION ALL
        |  SELECT 3::BIGINT, p33 FROM d5 UNION ALL
        |  SELECT 4::BIGINT, p44 FROM d5) ORDER BY k""") { c =>
      val sp = c.spark
      import sp.implicits._
      val h = c.events.select(
          floor(expr("unix_timestamp(ts)") / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cents"))
        .groupBy("hb").agg(sum(col("cents")).as("y"))
      val st = h.agg(count(lit(1)).as("m"), sum(col("y")).as("s"),
        sum(col("y") * col("y")).as("syy"))
      val lags = (1 to 4).toDF("k")
      val p = broadcast(lags).crossJoin(h.select(col("hb"), col("y")))
        .join(h.select(col("hb").as("hb2"), col("y").as("y2")),
          col("hb2") === col("hb") + col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("nk"), sum(col("y") * col("y2")).as("pk"),
          sum(col("y")).as("ak"), sum(col("y2")).as("bk"))
      val ybar = col("s").cast("double") / col("m")
      val acf = p.crossJoin(broadcast(st))
        .select(col("k"),
          r6((col("pk") - (col("ak") + col("bk")) * ybar +
            col("nk") * ybar * ybar) /
            (col("syy") - col("s") * ybar)).as("r"))
      val w = acf.agg(
        max(when(col("k") === 1, col("r"))).as("r1"),
        max(when(col("k") === 2, col("r"))).as("r2"),
        max(when(col("k") === 3, col("r"))).as("r3"),
        max(when(col("k") === 4, col("r"))).as("r4"))
      val d5 = w
        .withColumn("p11", col("r1"))
        .withColumn("p22",
          (col("r2") - col("r1") * col("r1")) /
            (lit(1) - col("r1") * col("r1")))
        .withColumn("p21", col("p11") - col("p22") * col("p11"))
        .withColumn("p33",
          (col("r3") - (col("p21") * col("r2") + col("p22") * col("r1"))) /
            (lit(1) - (col("p21") * col("r1") + col("p22") * col("r2"))))
        .withColumn("p31", col("p21") - col("p33") * col("p22"))
        .withColumn("p32", col("p22") - col("p33") * col("p21"))
        .withColumn("p44",
          (col("r4") - (col("p31") * col("r3") + col("p32") * col("r2") +
            col("p33") * col("r1"))) /
            (lit(1) - (col("p31") * col("r1") + col("p32") * col("r2") +
              col("p33") * col("r3"))))
      d5.selectExpr(
          "stack(4, 1L, p11, 2L, p22, 3L, p33, 4L, p44) as (k, pacf)")
        .select(col("k"), r6(col("pacf")).as("pacf"))
        .orderBy("k")
    },

    // Ljung–Box portmanteau white-noise test (the residual-diagnostic
    // gate after any ts_holt/ts_kalman fit — "is anything LEFT in the
    // autocorrelations?"): Q = m(m+2)·Σ_{k≤6} r_k²/(m−k) over the same
    // exact-integer ACF lattice as ts_acf (each r_k rounded ONCE to
    // 1e-6 before entering Q, so the sum of six identical lattice
    // doubles is engine-invariant in pinned k order). Compare to
    // χ²₆; the statistic and df are reported, the repo's test
    // convention. Scale: one hourly aggregation + model-sized lag join.
    q("ts_ljung_box",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |             sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |           FROM events GROUP BY 1),
        |st AS (SELECT count(*)::BIGINT m, sum(y)::BIGINT s,
        |         sum(y*y)::BIGINT syy FROM h),
        |l AS (SELECT unnest(generate_series(1, 6)) k),
        |p AS (SELECT l.k, count(*)::BIGINT nk,
        |        sum(a.y * b.y)::BIGINT pk,
        |        sum(a.y)::BIGINT ak, sum(b.y)::BIGINT bk
        |      FROM l JOIN h a ON TRUE JOIN h b ON b.hb = a.hb + l.k
        |      GROUP BY 1),
        |acf AS (SELECT k,
        |    round((pk - (ak + bk) * (s::DOUBLE / m)
        |           + nk * (s::DOUBLE / m) * (s::DOUBLE / m))
        |          / (syy - s * (s::DOUBLE / m)) + 1e-9, 6) r
        |  FROM p, st)
        |SELECT 6::BIGINT AS h_lags, st.m AS n_obs,
        |  round(st.m * (st.m + 2)
        |        * list_reduce(list(r * r / (st.m - k) ORDER BY k),
        |            (x, y) -> x + y) + 1e-9, 4) AS q_stat
        |FROM acf, st GROUP BY st.m""") { c =>
      val sp = c.spark
      import sp.implicits._
      val h = c.events.select(
          floor(expr("unix_timestamp(ts)") / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cents"))
        .groupBy("hb").agg(sum(col("cents")).as("y"))
      val st = h.agg(count(lit(1)).as("m"), sum(col("y")).as("s"),
        sum(col("y") * col("y")).as("syy"))
      val lags = (1 to 6).toDF("k")
      val p = broadcast(lags).crossJoin(h.select(col("hb"), col("y")))
        .join(h.select(col("hb").as("hb2"), col("y").as("y2")),
          col("hb2") === col("hb") + col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("nk"), sum(col("y") * col("y2")).as("pk"),
          sum(col("y")).as("ak"), sum(col("y2")).as("bk"))
      val ybar = col("s").cast("double") / col("m")
      val acf = p.crossJoin(broadcast(st))
        .select(col("k"), col("m"),
          r6((col("pk") - (col("ak") + col("bk")) * ybar +
            col("nk") * ybar * ybar) /
            (col("syy") - col("s") * ybar)).as("r"))
      acf.groupBy("m").agg(
          aggregate(array_sort(collect_list(struct(col("k"),
              (col("r") * col("r") / (col("m") - col("k"))).as("t")))),
            lit(0.0), (acc, e) => acc + e.getField("t")).as("qsum"))
        .select(lit(6L).as("h_lags"), col("m").as("n_obs"),
          r4(col("m") * (col("m") + 2) * col("qsum")).as("q_stat"))
    },

    // McNemar's test for PAIRED binary outcomes (the within-subject
    // companion to stat_chi2's independent 2×2 — did behavior change
    // between periods for the SAME users?): per user, purchased-before
    // vs purchased-after the period cutoff (the ab_cuped pre/post
    // device); only the DISCORDANT counts b (pre-only) and c
    // (post-only) carry information, and the continuity-corrected
    // χ² = (|b−c|−1)²/(b+c) is a single integer-ratio expression.
    // Scale: one user-keyed aggregate, one global 2-count reduce.
    q("stat_mcnemar",
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND ts < TIMESTAMP '2024-01-16 00:00:00'
        |        THEN 1 ELSE 0 END) pre,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND ts >= TIMESTAMP '2024-01-16 00:00:00'
        |        THEN 1 ELSE 0 END) post
        |  FROM events GROUP BY 1),
        |m AS (SELECT
        |    sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
        |      ::BIGINT b,
        |    sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
        |      ::BIGINT c,
        |    sum(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END)
        |      ::BIGINT n_both,
        |    sum(CASE WHEN pre = 0 AND post = 0 THEN 1 ELSE 0 END)
        |      ::BIGINT n_neither
        |  FROM u)
        |SELECT b AS pre_only, c AS post_only, n_both, n_neither,
        |  round(CASE WHEN b + c = 0 THEN 0.0
        |        ELSE (abs(b - c) - 1) * (abs(b - c) - 1)
        |             * 1.0 / (b + c) END + 1e-9, 4) AS chi2_cc
        |FROM m""") { c =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val u = c.events.groupBy("user_id").agg(
        max(when(col("event_type") === "purchase" && col("ts") < cut,
          1).otherwise(0)).as("pre"),
        max(when(col("event_type") === "purchase" && col("ts") >= cut,
          1).otherwise(0)).as("post"))
      val m = u.agg(
        sum(when(col("pre") === 1 && col("post") === 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("pre") === 0 && col("post") === 1, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("pre") === 1 && col("post") === 1, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("pre") === 0 && col("post") === 0, 1L)
          .otherwise(0L)).as("n_neither"))
      m.select(col("b").as("pre_only"), col("c").as("post_only"),
        col("n_both"), col("n_neither"),
        r4(when(col("b") + col("c") === 0, 0.0)
          .otherwise((abs(col("b") - col("c")) - 1) *
            (abs(col("b") - col("c")) - 1) * lit(1.0) /
            (col("b") + col("c")))).as("chi2_cc"))
    },

    // Wald sequential probability ratio test (SPRT, Wald 1945 — the
    // always-valid sequential monitor behind modern continuous A/B
    // peeking): H0 conversion p₀=0.15 vs H1 p₁=0.20 at α=β=0.05 over
    // the event stream in time order. LLR_n = k·ln(p₁/p₀) +
    // (n−k)·ln((1−p₁)/(1−p₀)) is a CLOSED FORM of the integer pair
    // (k, n); the two log constants are PINNED 17-digit literals on
    // both engines (no engine evaluates ln — the dctCos device), the
    // per-row LLR rounds once to the 1e-6 lattice, and the decision is
    // the first lattice crossing of ±ln(19)≈2.944439. Scale: the
    // cumulative (k, n) ride Positional.withCumSums (range-bucketed
    // two-pass prefix sums — no global window, no repartition(1)).
    q("stat_sprt",
      """WITH e AS (SELECT ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END x
        |  FROM events),
        |s AS (SELECT row_number() OVER (ORDER BY ts, event_id) n,
        |        sum(x) OVER (ORDER BY ts, event_id) k FROM e),
        |t AS (SELECT n::BIGINT n, k::BIGINT k,
        |        round(k * 0.287682072451781
        |              + (n - k) * -0.060624621816434736 + 1e-9, 6) llr
        |      FROM s),
        |cx AS (SELECT min(n) nd FROM t
        |       WHERE llr >= 2.944439 OR llr <= -2.944439),
        |f AS (SELECT t.n n_dec, t.k k_dec, t.llr llr_dec
        |      FROM t, cx WHERE t.n = cx.nd),
        |tot AS (SELECT count(*)::BIGINT n_total FROM e)
        |SELECT tot.n_total,
        |  CASE WHEN f.llr_dec IS NULL THEN 'continue'
        |       WHEN f.llr_dec > 0 THEN 'accept_h1'
        |       ELSE 'accept_h0' END AS decision,
        |  f.n_dec, f.k_dec, f.llr_dec
        |FROM tot LEFT JOIN f ON TRUE""") { c =>
      val e = c.events.select(col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
      val cum = graft.ops.Positional.withCumSums(e,
        Seq(col("ts"), col("event_id")),
        Seq(col("x") -> "k_lt", lit(1L) -> "n_lt"))
      val t = cum.select(
        (col("n_lt") + lit(1L)).as("n"),
        (col("k_lt") + col("x")).as("k"))
        .withColumn("llr", r6(col("k") * lit(0.287682072451781) +
          (col("n") - col("k")) * lit(-0.060624621816434736)))
      val crossed = t.filter(
        col("llr") >= 2.944439 || col("llr") <= -2.944439)
      val f = crossed
        .agg(min(struct(col("n"), col("k"), col("llr"))).as("f"))
        .select(col("f.n").as("n_dec"), col("f.k").as("k_dec"),
          col("f.llr").as("llr_dec"))
      val tot = e.agg(count(lit(1)).as("n_total"))
      tot.crossJoin(broadcast(f))
        .select(col("n_total"),
          when(col("llr_dec").isNull, "continue")
            .when(col("llr_dec") > 0, "accept_h1")
            .otherwise("accept_h0").as("decision"),
          col("n_dec"), col("k_dec"), col("llr_dec"))
    },

    // Brown–Forsythe / Levene variance-homogeneity test (the
    // assumption check BEFORE trusting stat_anova's pooled variance —
    // ANOVA compares means, this compares SPREADS): groups are order
    // priorities, the center is each group's LOWER MEDIAN (exact
    // order statistic of integer cents via row_number — no
    // interpolated median, so the center is an exact integer on both
    // engines), z = |x − med| is integer cents, and the one-way F on
    // the z's runs entirely on exact integer moments (Σz via BIGINT,
    // Σz² through DECIMAL/HUGEINT — the Stump pattern). Scale: two
    // hash aggregates + one per-group window over the orders table.
    q("stat_levene",
      """WITH o AS (SELECT o_orderpriority pri,
        |        CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) v
        |      FROM orders),
        |rn AS (SELECT pri, v,
        |         row_number() OVER (PARTITION BY pri ORDER BY v) rk,
        |         count(*) OVER (PARTITION BY pri) n FROM o),
        |md AS (SELECT pri, v med FROM rn WHERE rk = (n + 1) // 2),
        |z AS (SELECT o.pri, abs(o.v - md.med) z FROM o
        |      JOIN md ON o.pri = md.pri),
        |g AS (SELECT pri, count(*)::BIGINT n, sum(z)::BIGINT sz,
        |        sum(z::HUGEINT * z)::DOUBLE szz FROM z GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT k, sum(n)::BIGINT nt,
        |        sum(sz)::BIGINT tz,
        |        list_reduce(list(sz::DOUBLE * sz / n ORDER BY pri),
        |          (x, y) -> x + y) a,
        |        list_reduce(list(szz ORDER BY pri),
        |          (x, y) -> x + y) w FROM g)
        |SELECT k, nt AS n_total,
        |  round((a - tz::DOUBLE * tz / nt) / (k - 1)
        |        / ((w - a) / (nt - k)) + 1e-9, 6) AS w_stat
        |FROM t""") { c =>
      val o = c.orders.select(col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long").as("v"))
      // lower median from the per-group VALUE HISTOGRAM: the window
      // runs over distinct (pri, cents) rows — bounded by the price
      // domain, not the corpus — and the median is the smallest value
      // whose inclusive cumulative count reaches ceil(n/2)
      val hist = o.groupBy("pri", "v").agg(count(lit(1)).as("cnt"))
      val wn = Window.partitionBy("pri").orderBy("v")
      val cum = hist.withColumn("cm", sum(col("cnt")).over(
        wn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val np = o.groupBy("pri").agg(count(lit(1)).as("n"))
      val md = cum.join(broadcast(np), Seq("pri"))
        .filter(col("cm") >= ((col("n") + 1) / 2).cast("long"))
        .groupBy("pri").agg(min(col("v")).as("med"))
      val z = o.join(broadcast(md), Seq("pri"))
        .select(col("pri"), abs(col("v") - col("med")).as("z"))
      val g = z.groupBy("pri").agg(count(lit(1)).as("n"),
        sum(col("z")).as("sz"),
        sum(col("z").cast("decimal(38,0)") * col("z")).cast("double")
          .as("szz"))
      def pinnedSum(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("pri"),
            term.as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t"))
      val t = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(col("sz")).as("tz"),
        pinnedSum(col("sz").cast("double") * col("sz") / col("n"))
          .as("a"),
        pinnedSum(col("szz")).as("w"))
      t.select(col("k"), col("nt").as("n_total"),
        r6((col("a") - col("tz").cast("double") * col("tz") / col("nt")) /
          (col("k") - 1) /
          ((col("w") - col("a")) / (col("nt") - col("k")))).as("w_stat"))
    },

    // Fisher's EXACT test on a 2×2 (the small-sample answer where
    // stat_chi2's asymptotics fail — pilot cohorts, rare outcomes):
    // arm (user parity) × any-error outcome over the user_id<120 pilot
    // cohort. The hypergeometric tail is computed WITHOUT any
    // transcendental: unnormalized weights ride the exact PMF
    // recurrence w(x)/w(x−1) = (r1−x+1)(c1−x+1)/(x(r2−c1+x)) — every
    // ratio an exact-integer quotient, cumulative products and tail
    // sums LEFT-FOLDED in pinned x order on both engines (the
    // list_reduce ≡ aggregate(array_sort(collect_list)) device), and
    // the two-sided tail takes w(x) ≤ w(obs)·(1+1e-7), R's convention.
    // Scale: one corpus aggregation to a 2×2; the x-range is
    // margin-sized (≤ cohort), never corpus-sized.
    q("stat_fisher_exact",
      """WITH u AS (SELECT user_id, user_id % 2 arm,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |                  THEN 1 ELSE 0 END)
        |            > sum(CASE WHEN event_type = 'error'
        |                  THEN 1 ELSE 0 END)
        |         THEN 1 ELSE 0 END err
        |  FROM events WHERE user_id < 120 GROUP BY 1),
        |cells AS (SELECT
        |    sum(CASE WHEN arm = 0 AND err = 1 THEN 1 ELSE 0 END)::BIGINT a,
        |    sum(CASE WHEN arm = 0 AND err = 0 THEN 1 ELSE 0 END)::BIGINT b,
        |    sum(CASE WHEN arm = 1 AND err = 1 THEN 1 ELSE 0 END)::BIGINT c,
        |    sum(CASE WHEN arm = 1 AND err = 0 THEN 1 ELSE 0 END)::BIGINT d
        |  FROM u),
        |m AS (SELECT a, b, c, d, a + b r1, c + d r2, a + c c1,
        |        greatest(0, (a + c) - (c + d)) lo,
        |        least(a + b, a + c) hi FROM cells),
        |xs AS (SELECT m.*, unnest(range(m.lo, m.hi + 1)) x FROM m),
        |wr AS (SELECT x, a,
        |    CASE WHEN x = lo THEN 1.0
        |         ELSE list_reduce(
        |           list_transform(range(lo + 1, x + 1),
        |             i -> ((r1 - i + 1) * (c1 - i + 1))
        |                  / (i * (r2 - c1 + i))),
        |           (p, q) -> p * q) END w
        |  FROM xs),
        |wo AS (SELECT max(CASE WHEN x = a THEN w END) wobs FROM wr),
        |s AS (SELECT
        |    list_reduce(list(CASE WHEN w <= wobs * (1 + 1e-7)
        |      THEN w ELSE 0.0 END ORDER BY x), (p, q) -> p + q) num,
        |    list_reduce(list(w ORDER BY x), (p, q) -> p + q) den
        |  FROM wr, wo)
        |SELECT m.a, m.b, m.c, m.d,
        |  round((m.a * m.d)::DOUBLE / (m.b * m.c) + 1e-9, 4)
        |    AS odds_ratio,
        |  round(s.num / s.den + 1e-9, 6) AS p_two_sided
        |FROM m, s""") { c =>
      val uu = c.events.filter(col("user_id") < 120)
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1).otherwise(0))
            > sum(when(col("event_type") === "error", 1).otherwise(0)))
          .cast("int").as("err"))
        .select((col("user_id") % 2).as("arm"), col("err"))
      val cells = uu.agg(
        sum(when(col("arm") === 0 && col("err") === 1, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("arm") === 0 && col("err") === 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("arm") === 1 && col("err") === 1, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("arm") === 1 && col("err") === 0, 1L)
          .otherwise(0L)).as("d"))
      val m = cells.withColumn("r1", col("a") + col("b"))
        .withColumn("r2", col("c") + col("d"))
        .withColumn("c1", col("a") + col("c"))
        .withColumn("lo", greatest(lit(0L), col("c1") - col("r2")))
        .withColumn("hi", least(col("r1"), col("c1")))
      val xs = m.select(col("*"),
        explode(sequence(col("lo"), col("hi"))).as("x"))
      val wr = xs.select(col("x"), col("a"),
        when(col("x") === col("lo"), lit(1.0))
          .otherwise(aggregate(
            sequence(col("lo") + 1, col("x")), lit(1.0),
            (p, i) => p * (((col("r1") - i + lit(1)) *
              (col("c1") - i + lit(1))) /
              (i * (col("r2") - col("c1") + i))))).as("w"))
      val wo = wr.agg(max(when(col("x") === col("a"), col("w")))
        .as("wobs"))
      val s = wr.crossJoin(broadcast(wo)).agg(
        aggregate(array_sort(collect_list(struct(col("x"),
            when(col("w") <= col("wobs") * (lit(1) + lit(1e-7)),
              col("w")).otherwise(lit(0.0)).as("t")))),
          lit(0.0), (p, e) => p + e.getField("t")).as("num"),
        aggregate(array_sort(collect_list(struct(col("x"),
            col("w").as("t")))),
          lit(0.0), (p, e) => p + e.getField("t")).as("den"))
      m.crossJoin(broadcast(s))
        .select(col("a"), col("b"), col("c"), col("d"),
          r4((col("a") * col("d")).cast("double") /
            (col("b") * col("c"))).as("odds_ratio"),
          r6(col("num") / col("den")).as("p_two_sided"))
    },

    // Kendall's τ-b rank correlation (the ordinal companion to
    // stat_spearman — counts pairwise order agreements instead of rank
    // differences, with the tie-adjusted denominator): nations ranked
    // by revenue vs by customer count. The corpus collapses to one row
    // per nation (exact integer cents + counts), then the pair walk is
    // an n²-of-25 self-join on EXACT INTEGERS — concordant/discordant/
    // tie counts are integer aggregates and τ-b's sqrt runs once on an
    // integer product, identically on both engines. Scale: group-sized
    // pair join, never corpus-sized.
    q("stat_kendall_tau",
      """WITH g AS (SELECT n.n_nationkey k,
        |    sum(CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT x,
        |    count(DISTINCT c.c_custkey)::BIGINT y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1),
        |p AS (SELECT
        |    sum(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) > 0
        |        THEN 1 ELSE 0 END)::BIGINT cc,
        |    sum(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) < 0
        |        THEN 1 ELSE 0 END)::BIGINT dd,
        |    sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)::BIGINT tx,
        |    sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)::BIGINT ty,
        |    count(*)::BIGINT np
        |  FROM g a JOIN g b ON a.k < b.k)
        |SELECT cc AS concordant, dd AS discordant, tx AS ties_x,
        |  ty AS ties_y,
        |  round((cc - dd) / sqrt(((np - tx) * (np - ty))::DOUBLE)
        |        + 1e-9, 6) AS tau_b
        |FROM p""") { c =>
      val g = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(c.nation),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_nationkey").as("k"))
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
            .cast("long")).as("x"),
          countDistinct(col("c_custkey")).as("y"))
      val a = g.select(col("k"), col("x"), col("y"))
      val b = g.select(col("k").as("k2"), col("x").as("x2"),
        col("y").as("y2"))
      // concordance needs only the SIGN of dx·dy: signum first, so no
      // BIGINT cross-product of SF-linear cents sums ever forms (the
      // raw product passes 2^63 near SF~70 — WidthAuditSpec class)
      val p = a.join(broadcast(b), col("k") < col("k2"))
        .agg(
          sum(when(signum(col("x") - col("x2")) *
            signum(col("y") - col("y2")) > 0,
            1L).otherwise(0L)).as("cc"),
          sum(when(signum(col("x") - col("x2")) *
            signum(col("y") - col("y2")) < 0,
            1L).otherwise(0L)).as("dd"),
          sum(when(col("x") === col("x2"), 1L).otherwise(0L)).as("tx"),
          sum(when(col("y") === col("y2"), 1L).otherwise(0L)).as("ty"),
          count(lit(1)).as("np"))
      p.select(col("cc").as("concordant"), col("dd").as("discordant"),
        col("tx").as("ties_x"), col("ty").as("ties_y"),
        r6((col("cc") - col("dd")) /
          sqrt(((col("np") - col("tx")) * (col("np") - col("ty")))
            .cast("double"))).as("tau_b"))
    },

    // CUPED variance-reduced A/B analysis (Deng et al. 2013 — the
    // industry-standard experiment readout): adjust each unit's metric
    // by its PRE-experiment covariate, Y′ = Y − θ(X − X̄) with
    // θ = cov(X,Y)/var(X), then two-sample z on the adjusted means.
    // Determinism by the integer-moments pattern end-to-end: event
    // values quantize to deci-units, so per-user X/Y and every raw
    // moment (Σx, Σxy, Σx²) are exact BIGINT sums (order-independent;
    // magnitudes sized to stay under 2⁶³ at sf0.1 — a larger
    // deployment widens to DECIMAL); θ and X̄ are single divisions;
    // the adjusted metric re-quantizes to milli-units per user
    // (+1e-9 nudge ≫ ulp at this magnitude) so the variant moments
    // are exact again, with squares through DECIMAL/HUGEINT (the
    // Stump pattern). Scale: two hash aggregations (events → users →
    // moments) and broadcast scalars — nothing corpus-sized moves.
    q("ab_cuped",
      """WITH e AS (SELECT user_id, user_id % 2 AS variant,
        |             CAST(round(value * 10 + 1e-9) AS BIGINT) v,
        |             ts < TIMESTAMP '2024-01-16 00:00:00' AS pre
        |           FROM events),
        |u AS (SELECT user_id, max(variant) variant,
        |        sum(CASE WHEN pre THEN v ELSE 0 END)::BIGINT x,
        |        sum(CASE WHEN NOT pre THEN v ELSE 0 END)::BIGINT y
        |      FROM e GROUP BY 1),
        |mo AS (SELECT count(*)::BIGINT n, sum(x)::BIGINT sx,
        |         sum(y)::BIGINT sy,
        |         sum(x*y)::BIGINT sxy, sum(x*x)::BIGINT sxx
        |       FROM u),
        |th AS (SELECT n, sx,
        |         (n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx) AS theta,
        |         sx::DOUBLE / n AS xbar FROM mo),
        |adj AS (SELECT u.variant,
        |          y::BIGINT AS yr,
        |          CAST(round((y - th.theta * (x - th.xbar)) * 100
        |                     + 1e-9) AS BIGINT) ya
        |        FROM u, th),
        |g AS (SELECT variant, count(*)::BIGINT n,
        |        sum(yr)::BIGINT syr,
        |        CAST(sum(yr::HUGEINT * yr) AS DOUBLE) syr2,
        |        sum(ya)::BIGINT sya,
        |        CAST(sum(ya::HUGEINT * ya) AS DOUBLE) sya2
        |      FROM adj GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN variant = 1 THEN n END) nt,
        |  max(CASE WHEN variant = 0 THEN n END) nc,
        |  max(CASE WHEN variant = 1 THEN syr END)::DOUBLE syrt,
        |  max(CASE WHEN variant = 0 THEN syr END)::DOUBLE syrc,
        |  max(CASE WHEN variant = 1 THEN syr2 END) syr2t,
        |  max(CASE WHEN variant = 0 THEN syr2 END) syr2c,
        |  max(CASE WHEN variant = 1 THEN sya END)::DOUBLE syat,
        |  max(CASE WHEN variant = 0 THEN sya END)::DOUBLE syac,
        |  max(CASE WHEN variant = 1 THEN sya2 END) sya2t,
        |  max(CASE WHEN variant = 0 THEN sya2 END) sya2c
        |  FROM g)
        |SELECT nt, nc,
        |  round((SELECT theta FROM th) + 1e-9, 6) AS theta,
        |  round((syrt/nt - syrc/nc) / 10 + 1e-9, 4) AS diff_raw,
        |  round((syat/nt - syac/nc) / 1000 + 1e-9, 4) AS diff_cuped,
        |  round((syrt/nt - syrc/nc) /
        |    sqrt((syr2t - syrt*syrt/nt) / (nt - 1) / nt +
        |         (syr2c - syrc*syrc/nc) / (nc - 1) / nc) + 1e-9, 4)
        |    AS z_raw,
        |  round((syat/nt - syac/nc) /
        |    sqrt((sya2t - syat*syat/nt) / (nt - 1) / nt +
        |         (sya2c - syac*syac/nc) / (nc - 1) / nc) + 1e-9, 4)
        |    AS z_cuped
        |FROM w""") { c =>
      val e = c.events.select(col("user_id"),
        (col("user_id") % 2).as("variant"),
        round(col("value") * 10 + lit(1e-9)).cast("long").as("v"),
        (col("ts") < lit("2024-01-16 00:00:00").cast("timestamp_ntz"))
          .as("pre"))
      val u = e.groupBy("user_id").agg(max(col("variant")).as("variant"),
        sum(when(col("pre"), col("v")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("v")).otherwise(0L)).as("y"))
      val mo = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val th = mo.select(col("n"), col("sx"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("theta"))
        .select(col("theta"), (col("sx").cast("double") / col("n"))
          .as("xbar"))
      val adj = u.crossJoin(broadcast(th))
        .select(col("variant"), col("y").as("yr"),
          round((col("y") - col("theta") * (col("x") - col("xbar"))) *
            100 + lit(1e-9)).cast("long").as("ya"))
      val dec = (cc: org.apache.spark.sql.Column) =>
        sum(cc.cast("decimal(38,0)") * cc).cast("double")
      val g = adj.groupBy("variant").agg(count(lit(1)).as("n"),
        sum(col("yr")).as("syr"), dec(col("yr")).as("syr2"),
        sum(col("ya")).as("sya"), dec(col("ya")).as("sya2"))
      val pick = (v: Int, cn: String) =>
        max(when(col("variant") === v, col(cn)))
      val w = g.agg(
        pick(1, "n").as("nt"), pick(0, "n").as("nc"),
        pick(1, "syr").cast("double").as("syrt"),
        pick(0, "syr").cast("double").as("syrc"),
        pick(1, "syr2").as("syr2t"), pick(0, "syr2").as("syr2c"),
        pick(1, "sya").cast("double").as("syat"),
        pick(0, "sya").cast("double").as("syac"),
        pick(1, "sya2").as("sya2t"), pick(0, "sya2").as("sya2c"))
      def z(st: String, sc: String, s2t: String, s2c: String) =
        ((col(st) / col("nt") - col(sc) / col("nc")) /
          sqrt((col(s2t) - col(st) * col(st) / col("nt")) /
              (col("nt") - 1) / col("nt") +
            (col(s2c) - col(sc) * col(sc) / col("nc")) /
              (col("nc") - 1) / col("nc")))
      w.crossJoin(broadcast(th.select(col("theta"))))
        .select(col("nt"), col("nc"),
          r6(col("theta")).as("theta"),
          r4((col("syrt") / col("nt") - col("syrc") / col("nc")) / 10)
            .as("diff_raw"),
          r4((col("syat") / col("nt") - col("syac") / col("nc")) / 1000)
            .as("diff_cuped"),
          r4(z("syrt", "syrc", "syr2t", "syr2c")).as("z_raw"),
          r4(z("syat", "syac", "sya2t", "sya2c")).as("z_cuped"))
    },

    // First-order Markov transition matrix over per-user event
    // sequences — the behavioral model behind next-event prediction and
    // anomalous-session scoring. Successive events pair up through ONE
    // user-partitioned lead() window (ordered by time, id tiebreak);
    // transition probabilities are exact count rationals.
    q("events_markov_transitions",
      """WITH s AS (SELECT user_id, event_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS next_type
        |           FROM events),
        |t AS (SELECT event_type, next_type, count(*) c FROM s
        |      WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT event_type, sum(c) tot FROM t GROUP BY 1)
        |SELECT t.event_type AS from_type, t.next_type AS to_type,
        |       t.c::BIGINT AS n,
        |       round(t.c * 1.0 / m.tot + 1e-9, 6) AS p
        |FROM t JOIN m ON t.event_type = m.event_type
        |ORDER BY from_type, to_type""") { c =>
      import org.apache.spark.sql.expressions.Window
      val s = c.events.select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("next_type"))
      val t = s.filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("c"))
      val m = t.groupBy("event_type").agg(sum(col("c")).as("tot"))
      t.join(broadcast(m), Seq("event_type"))
        .select(col("event_type").as("from_type"),
          col("next_type").as("to_type"), col("c").as("n"),
          r6(col("c") * lit(1.0) / col("tot")).as("p"))
        .orderBy("from_type", "to_type")
    },

    // Markov REMOVAL-EFFECT attribution (Anderl et al. 2014 — the
    // data-driven model that completes the attribution family beside
    // win_attribution's linear and U-shaped heuristics): journeys are
    // per-user event paths truncated at first purchase with a virtual
    // 'start' state; transition probabilities are exact integer
    // ratios; conversion probability is a 6-hop truncated walk
    // iterated as CLOSED-FORM column expressions over a ONE-ROW
    // transition matrix (fixed alphabetical term order, so the 4-term
    // dot products are engine-invariant); each channel's removal
    // effect re-runs the walk with that state's inflow zeroed. The
    // Spark unroll and the SQL CTE chain are GENERATED from the same
    // loop, so the two engines execute structurally identical
    // arithmetic. Scale: one corpus window pass + one 5×5 aggregate;
    // the walk is 1-row work.
    {
      val chans = Seq("click", "error", "signup", "view")
      val scens = "full" +: chans
      val pcells = for {
        s <- "start" +: chans; t <- chans :+ "purchase"
      } yield (s, t)
      def pn(s: String, t: String) = s"p_${s}_$t"
      // one step of the walk for scenario `sc` (removed = sc unless
      // "full"): returns (colName -> expression-string) pairs in terms
      // of the PREVIOUS step's columns
      def stepExprs(sc: String): Seq[(String, String)] = {
        val rm = if (sc == "full") "" else sc
        val conv = s"conv_$sc + (" + chans.map(s =>
          s"v_${sc}_$s * ${pn(s, "purchase")}").mkString(" + ") + ")"
        val vs = chans.map { t =>
          val e =
            if (t == rm) "0.0"
            else "(" + chans.map(s =>
              s"v_${sc}_$s * ${pn(s, t)}").mkString(" + ") + ")"
          (s"v_${sc}_$t", e)
        }
        (s"conv_$sc", conv) +: vs
      }
      def initExprs(sc: String): Seq[(String, String)] = {
        val rm = if (sc == "full") "" else sc
        (s"conv_$sc", pn("start", "purchase")) +:
          chans.map { t =>
            (s"v_${sc}_$t",
              if (t == rm) "0.0" else pn("start", t))
          }
      }
      val pList = pcells.map { case (s, t) => pn(s, t) }
      val sql = {
        val cells = pcells.map { case (s, t) =>
          s"coalesce(max(CASE WHEN from_t = '$s' AND to_t = '$t' " +
            s"THEN p END), 0) ${pn(s, t)}"
        }.mkString(",\n    ")
        val s0 = "s0 AS (SELECT " + (pList ++ scens.flatMap(initExprs)
          .map { case (n, e) => s"$e $n" }).mkString(",\n    ") +
          " FROM w)"
        val steps = (1 to 5).map { k =>
          s"s$k AS (SELECT " + (pList ++ scens.flatMap(stepExprs)
            .map { case (n, e) => s"$e $n" }).mkString(",\n    ") +
            s" FROM s${k - 1})"
        }
        val reSum = chans.map(ch =>
          s"(1 - conv_$ch / conv_full)").mkString(" + ")
        val rows = chans.map(ch =>
          s"SELECT '$ch' channel, conv_full, conv_$ch conv_removed, " +
            s"1 - conv_$ch / conv_full re, " +
            s"(1 - conv_$ch / conv_full) / ($reSum) attr_share FROM s5")
          .mkString("\n  UNION ALL ")
        s"""WITH r AS (SELECT user_id, event_type,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) rn FROM events),
           |fp AS (SELECT user_id,
           |    min(CASE WHEN event_type = 'purchase' THEN rn END) pn
           |  FROM r GROUP BY 1),
           |j AS (SELECT r.user_id, r.event_type, r.rn FROM r
           |      JOIN fp ON r.user_id = fp.user_id
           |      WHERE fp.pn IS NULL OR r.rn <= fp.pn),
           |tr AS (SELECT coalesce(lag(event_type) OVER (
           |    PARTITION BY user_id ORDER BY rn), 'start') from_t,
           |    event_type to_t FROM j),
           |cnt AS (SELECT from_t, to_t, count(*)::BIGINT c FROM tr
           |        GROUP BY 1, 2),
           |outc AS (SELECT from_t, sum(c)::BIGINT tot FROM cnt
           |         GROUP BY 1),
           |pr AS (SELECT cnt.from_t, cnt.to_t, cnt.c * 1.0 / outc.tot p
           |       FROM cnt JOIN outc USING (from_t)),
           |w AS (SELECT
           |    $cells
           |  FROM pr),
           |$s0,
           |${steps.mkString(",\n")}
           |SELECT channel, round(conv_full + 1e-9, 6) AS conv_full,
           |  round(conv_removed + 1e-9, 6) AS conv_removed,
           |  round(re + 1e-9, 6) AS removal_effect,
           |  round(attr_share + 1e-9, 6) AS attr_share
           |FROM ($rows) t ORDER BY channel""".stripMargin
      }
      q("events_markov_attribution", sql) { c =>
        import org.apache.spark.sql.expressions.Window
        val wUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val r = c.events.select(col("user_id"), col("event_type"),
          row_number().over(wUser).as("rn"))
        val fp = r.groupBy("user_id").agg(
          min(when(col("event_type") === "purchase", col("rn")))
            .as("pn"))
        val j = r.join(fp, Seq("user_id"))
          .filter(col("pn").isNull || col("rn") <= col("pn"))
        val wj = Window.partitionBy("user_id").orderBy("rn")
        val tr = j.select(
          coalesce(lag(col("event_type"), 1).over(wj), lit("start"))
            .as("from_t"),
          col("event_type").as("to_t"))
        val cnt = tr.groupBy("from_t", "to_t")
          .agg(count(lit(1)).as("c"))
        val outc = cnt.groupBy("from_t").agg(sum(col("c")).as("tot"))
        val pr = cnt.join(broadcast(outc), Seq("from_t"))
          .select(col("from_t"), col("to_t"),
            (col("c") * lit(1.0) / col("tot")).as("p"))
        val w = pr.agg(
          pcells.head match { case (s, t) =>
            coalesce(max(when(col("from_t") === s &&
              col("to_t") === t, col("p"))), lit(0.0)).as(pn(s, t))
          },
          pcells.tail.map { case (s, t) =>
            coalesce(max(when(col("from_t") === s &&
              col("to_t") === t, col("p"))), lit(0.0)).as(pn(s, t))
          }: _*)
        var cur = w.select(
          pList.map(col) ++ scens.flatMap(initExprs).map {
            case (n, e) => expr(e).as(n)
          }: _*)
        (1 to 5).foreach { _ =>
          cur = cur.select(
            pList.map(col) ++ scens.flatMap(stepExprs).map {
              case (n, e) => expr(e).as(n)
            }: _*).localCheckpoint()
        }
        val reSum = chans.map(ch =>
          s"(1 - conv_$ch / conv_full)").mkString(" + ")
        val rows = chans.map { ch =>
          cur.selectExpr(s"'$ch' as channel", "conv_full",
            s"conv_$ch as conv_removed",
            s"1 - conv_$ch / conv_full as re",
            s"(1 - conv_$ch / conv_full) / ($reSum) as attr_share")
        }.reduce(_ union _)
        rows.select(col("channel"), r6(col("conv_full")).as("conv_full"),
            r6(col("conv_removed")).as("conv_removed"),
            r6(col("re")).as("removal_effect"),
            r6(col("attr_share")).as("attr_share"))
          .orderBy("channel")
      }
    },

    // Granger causality, 1 lag (Granger 1969 — does yesterday's X
    // improve the forecast of today's Y beyond Y's own history?):
    // hourly value-cents (x) vs hourly event count (y); restricted
    // AR(1) vs unrestricted ADL(1,1), F = (SSE_r − SSE_u)/(SSE_u/(n−3)).
    // Both SSEs are CLOSED FORMS of centered moments over the lag-
    // joined triples (y_t, y_{t−1}, x_{t−1}) — every raw moment an
    // EXACT BIGINT sum, centered combinations written identically on
    // both engines (the shap/levene device). Scale: one hourly
    // aggregation, one hour-index equi-join, one moment aggregate.
    q("ts_granger",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT x,
        |    count(*)::BIGINT y
        |  FROM events GROUP BY 1),
        |j AS (SELECT b.y yt, a.y yl, a.x xl FROM h a
        |      JOIN h b ON b.hb = a.hb + 1),
        |m AS (SELECT count(*)::BIGINT n,
        |    sum(yt)::BIGINT st, sum(yl)::BIGINT sl, sum(xl)::BIGINT sx,
        |    sum(yl * yl)::BIGINT sll, sum(yl * xl)::BIGINT slx,
        |    sum(xl * xl)::BIGINT sxx, sum(yl * yt)::BIGINT slt,
        |    sum(xl * yt)::BIGINT sxt, sum(yt * yt)::BIGINT stt
        |  FROM j),
        |cm AS (SELECT n,
        |    n::DOUBLE * sll - sl::DOUBLE * sl c11,
        |    n::DOUBLE * slx - sl::DOUBLE * sx c12,
        |    n::DOUBLE * sxx - sx::DOUBLE * sx c22,
        |    n::DOUBLE * slt - sl::DOUBLE * st c1y,
        |    n::DOUBLE * sxt - sx::DOUBLE * st c2y,
        |    n::DOUBLE * stt - st::DOUBLE * st cyy FROM m),
        |f AS (SELECT n, cyy,
        |    cyy - c1y * c1y / c11 sse_r,
        |    cyy - ((c22 * c1y - c12 * c2y) * c1y
        |           + (c11 * c2y - c12 * c1y) * c2y)
        |          / (c11 * c22 - c12 * c12) sse_u,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) bx
        |  FROM cm)
        |SELECT n AS n_pairs, round(bx + 1e-9, 6) AS beta_xlag,
        |  round((sse_r - sse_u) / (sse_u / (n - 3)) + 1e-9, 4)
        |    AS f_stat
        |FROM f""") { c =>
      val h = c.events.select(
          floor(expr("unix_timestamp(ts)") / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cents"))
        .groupBy("hb")
        .agg(sum(col("cents")).as("x"), count(lit(1)).as("y"))
      val j = h.as("a").join(h.as("b"),
          col("b.hb") === col("a.hb") + 1)
        .select(col("b.y").as("yt"), col("a.y").as("yl"),
          col("a.x").as("xl"))
      val m = j.agg(count(lit(1)).as("n"),
        sum(col("yt")).as("st"), sum(col("yl")).as("sl"),
        sum(col("xl")).as("sx"),
        sum(col("yl") * col("yl")).as("sll"),
        sum(col("yl") * col("xl")).as("slx"),
        sum(col("xl") * col("xl")).as("sxx"),
        sum(col("yl") * col("yt")).as("slt"),
        sum(col("xl") * col("yt")).as("sxt"),
        sum(col("yt") * col("yt")).as("stt"))
      def ctr(sab: String, sa: String, sb: String) =
        col("n").cast("double") * col(sab) -
          col(sa).cast("double") * col(sb)
      val cm = m.select(col("n"),
        ctr("sll", "sl", "sl").as("c11"), ctr("slx", "sl", "sx").as("c12"),
        ctr("sxx", "sx", "sx").as("c22"), ctr("slt", "sl", "st").as("c1y"),
        ctr("sxt", "sx", "st").as("c2y"), ctr("stt", "st", "st").as("cyy"))
      val det = col("c11") * col("c22") - col("c12") * col("c12")
      val f = cm.select(col("n"), col("cyy"),
        (col("cyy") - col("c1y") * col("c1y") / col("c11")).as("sse_r"),
        (col("cyy") - ((col("c22") * col("c1y") -
          col("c12") * col("c2y")) * col("c1y") +
          (col("c11") * col("c2y") - col("c12") * col("c1y")) *
            col("c2y")) / det).as("sse_u"),
        ((col("c11") * col("c2y") - col("c12") * col("c1y")) / det)
          .as("bx"))
      f.select(col("n").as("n_pairs"), r6(col("bx")).as("beta_xlag"),
        r4((col("sse_r") - col("sse_u")) /
          (col("sse_u") / (col("n") - 3))).as("f_stat"))
    },

    // Wilcoxon signed-rank test (the PAIRED nonparametric companion to
    // stat_mannwhitney — same users before/after the cutoff, no
    // normality assumed): per-user pre/post deci-unit sums, zero
    // differences dropped, |d| ranked with AVERAGE ties kept exact by
    // carrying 2×rank as the integer r2 = 2·minrank + ties − 1
    // (minrank from an exclusive cumsum over the |d| HISTOGRAM — the
    // distributed rank shape, no global window over user rows), then
    // 2W⁺ = Σ r2·(positive count per |d|) stays a pure integer and the
    // normal z uses the closed-form moments. Scale: two hash
    // aggregates + a histogram-sized window.
    q("stat_wilcoxon_signed",
      """WITH u AS (SELECT user_id,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |        THEN CAST(round(value * 10 + 1e-9) AS BIGINT)
        |        ELSE 0 END)::BIGINT pre,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |        THEN CAST(round(value * 10 + 1e-9) AS BIGINT)
        |        ELSE 0 END)::BIGINT post
        |  FROM events GROUP BY 1),
        |d AS (SELECT post - pre df, abs(post - pre) ad FROM u
        |      WHERE post <> pre),
        |g AS (SELECT ad, count(*)::BIGINT cnt,
        |        sum(CASE WHEN df > 0 THEN 1 ELSE 0 END)::BIGINT pos
        |      FROM d GROUP BY 1),
        |r AS (SELECT ad, cnt, pos,
        |        coalesce(sum(cnt) OVER (ORDER BY ad
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |          0) cum
        |      FROM g),
        |s AS (SELECT sum(cnt)::BIGINT n,
        |        sum(pos * (2 * (1 + cum) + cnt - 1))::BIGINT w2
        |      FROM r)
        |SELECT n, (w2 / 2.0) AS w_plus,
        |  round((w2 / 2.0 - n * (n + 1) / 4.0)
        |        / sqrt(n * (n + 1) * (2 * n + 1) / 24.0) + 1e-9, 4)
        |    AS z_stat
        |FROM s""") { c =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val dv = round(col("value") * 10 + lit(1e-9)).cast("long")
      val u = c.events.groupBy("user_id").agg(
        sum(when(col("ts") < cut, dv).otherwise(0L)).as("pre"),
        sum(when(col("ts") >= cut, dv).otherwise(0L)).as("post"))
      val d = u.filter(col("post") =!= col("pre"))
        .select((col("post") - col("pre")).as("df"),
          abs(col("post") - col("pre")).as("ad"))
      val g = d.groupBy("ad").agg(count(lit(1)).as("cnt"),
        sum(when(col("df") > 0, 1L).otherwise(0L)).as("pos"))
      val r = graft.ops.Positional.withCumSums(g, Seq(col("ad")),
        Seq(col("cnt") -> "cum"))
      val s = r.agg(sum(col("cnt")).as("n"),
        sum(col("pos") * (lit(2) * (lit(1) + col("cum")) + col("cnt") -
          1)).as("w2"))
      s.select(col("n"), (col("w2") / 2.0).as("w_plus"),
        r4((col("w2") / 2.0 - col("n") * (col("n") + 1) / 4.0) /
          sqrt(col("n") * (col("n") + 1) * (lit(2) * col("n") + 1) /
            24.0)).as("z_stat"))
    },

    // Durbin–Watson serial-correlation test on detrended daily revenue
    // (the regression-residual diagnostic beside ts_ljung_box's raw
    // ACF screen — DW ≈ 2 means the linear day-trend left white
    // residuals): OLS day-trend from exact integer moments, residuals
    // QUANTIZED per row to integer dollars (DW is unit-invariant, and
    // integer residuals make both Σ(Δe)² and Σe² exact
    // order-independent sums), consecutive-observation diffs by a
    // row_number self-join on the TIME-BOUNDED daily series. Scale:
    // one corpus aggregation to days; everything after is day-sized.
    q("ts_durbin_watson",
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT y
        |  FROM orders GROUP BY 1),
        |ix AS (SELECT y,
        |    row_number() OVER (ORDER BY dy) - 1 t FROM d),
        |m AS (SELECT count(*)::BIGINT n, sum(t)::BIGINT st,
        |        sum(y)::BIGINT sy, sum(t * t)::BIGINT stt,
        |        sum(t * y)::BIGINT sty FROM ix),
        |ab AS (SELECT n,
        |    (n::DOUBLE * sty - st::DOUBLE * sy)
        |      / (n::DOUBLE * stt - st::DOUBLE * st) b,
        |    sy::DOUBLE / n
        |      - (n::DOUBLE * sty - st::DOUBLE * sy)
        |        / (n::DOUBLE * stt - st::DOUBLE * st)
        |        * (st::DOUBLE / n) a
        |  FROM m),
        |e AS (SELECT t,
        |    CAST(round((y - (ab.a + ab.b * t)) / 100 + 1e-9) AS BIGINT)
        |      q
        |  FROM ix, ab),
        |p AS (SELECT b.q q1, a.q q0 FROM e a JOIN e b ON b.t = a.t + 1),
        |s AS (SELECT
        |    sum((q1 - q0) * (q1 - q0))::BIGINT num FROM p),
        |s2 AS (SELECT sum(q * q)::BIGINT den FROM e)
        |SELECT ab.n AS n_days, round(ab.b / 100 + 1e-9, 6)
        |    AS trend_dollars_per_day,
        |  round(s.num * 1.0 / s2.den + 1e-9, 4) AS dw_stat
        |FROM ab, s, s2""") { c =>
      val d = c.orders
        .select(col("o_orderdate").cast("date").as("dy"),
          round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
            .as("cents"))
        .groupBy("dy").agg(sum(col("cents")).as("y"))
      val w = Window.orderBy("dy")
      val ix = d.select(col("y"),
        (row_number().over(w) - 1).cast("long").as("t"))
      val m = ix.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("y")).as("sy"), sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("y")).as("sty"))
      val bCol = (col("n").cast("double") * col("sty") -
        col("st").cast("double") * col("sy")) /
        (col("n").cast("double") * col("stt") -
          col("st").cast("double") * col("st"))
      val ab = m.select(col("n"), bCol.as("b"),
        (col("sy").cast("double") / col("n") -
          bCol * (col("st").cast("double") / col("n"))).as("a"))
      val e = ix.crossJoin(broadcast(ab))
        .select(col("t"),
          round((col("y") - (col("a") + col("b") * col("t"))) / 100 +
            lit(1e-9)).cast("long").as("q"))
      val p = e.as("a").join(e.as("b"), col("b.t") === col("a.t") + 1)
        .select(col("b.q").as("q1"), col("a.q").as("q0"))
      val s = p.agg(sum((col("q1") - col("q0")) *
        (col("q1") - col("q0"))).as("num"))
      val s2 = e.agg(sum(col("q") * col("q")).as("den"))
      ab.crossJoin(broadcast(s)).crossJoin(broadcast(s2))
        .select(col("n").as("n_days"),
          r6(col("b") / 100).as("trend_dollars_per_day"),
          r4(col("num") * lit(1.0) / col("den")).as("dw_stat"))
    },

    // Cochran–Armitage trend test (the dose-response test for ordered
    // proportions — does the fulfilled-order share move MONOTONICALLY
    // with priority?): groups are the 5 order priorities with ordinal
    // scores 1..5 (parsed from the priority's leading digit — an
    // integer, not an assumption), successes are 'F' statuses;
    // T = Σwᵢ(rᵢ − nᵢp̄) and Var(T) = p̄(1−p̄)(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N) are
    // closed forms of exact integer aggregates. One hash aggregate.
    q("stat_cochran_armitage",
      """WITH g AS (SELECT
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) w,
        |    count(*)::BIGINT n,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      ::BIGINT r
        |  FROM orders GROUP BY 1),
        |m AS (SELECT sum(n)::BIGINT nt, sum(r)::BIGINT rt,
        |        sum(w * r)::BIGINT swr, sum(w * n)::BIGINT swn,
        |        sum(w * w * n)::BIGINT swwn FROM g)
        |SELECT nt AS n_total, rt AS n_success,
        |  round((swr - swn * (rt::DOUBLE / nt))
        |        / sqrt((rt::DOUBLE / nt) * (1 - rt::DOUBLE / nt)
        |               * (swwn - swn::DOUBLE * swn / nt)) + 1e-9, 4)
        |    AS z_trend
        |FROM m""") { c =>
      val g = c.orders.groupBy(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("r"))
      val m = g.agg(sum(col("n")).as("nt"), sum(col("r")).as("rt"),
        sum(col("w") * col("r")).as("swr"),
        sum(col("w") * col("n")).as("swn"),
        sum(col("w") * col("w") * col("n")).as("swwn"))
      val pbar = col("rt").cast("double") / col("nt")
      m.select(col("nt").as("n_total"), col("rt").as("n_success"),
        r4((col("swr") - col("swn") * pbar) /
          sqrt(pbar * (lit(1) - pbar) *
            (col("swwn") - col("swn").cast("double") * col("swn") /
              col("nt")))).as("z_trend"))
    },

    // Permutation test on the arm difference in per-user purchase
    // spend (Fisher 1935's exact logic, resampling-free determinism:
    // the "random" relabelings are 19 PORTABLE md5-salted parities, so
    // both engines walk the identical permutation set — the
    // ml_permutation_importance device applied to inference): each
    // permuted mean difference is a ratio of EXACT integer sums
    // computed in ONE salt-exploded aggregate; the p-value counts
    // ROUNDED |diff| exceedances with the add-one rule. Scale: one
    // user aggregate, one 19× broadcast explode of user-level rows.
    q("stat_permutation_test",
      """WITH u AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 10 + 1e-9) AS BIGINT)
        |        ELSE 0 END)::BIGINT v
        |  FROM events GROUP BY 1),
        |ob AS (SELECT
        |    round(sum(CASE WHEN user_id % 2 = 1 THEN v END) * 1.0
        |          / sum(CASE WHEN user_id % 2 = 1 THEN 1 END)
        |        - sum(CASE WHEN user_id % 2 = 0 THEN v END) * 1.0
        |          / sum(CASE WHEN user_id % 2 = 0 THEN 1 END)
        |        + 1e-9, 6) od
        |  FROM u),
        |sl AS (SELECT unnest(generate_series(1, 19)) s),
        |pm AS (SELECT sl.s,
        |    round(sum(CASE WHEN ('0x' || substr(md5(u.user_id || '#'
        |            || sl.s), 1, 8))::BIGINT % 2 = 1 THEN u.v END)
        |          * 1.0
        |          / sum(CASE WHEN ('0x' || substr(md5(u.user_id || '#'
        |            || sl.s), 1, 8))::BIGINT % 2 = 1 THEN 1 END)
        |        - sum(CASE WHEN ('0x' || substr(md5(u.user_id || '#'
        |            || sl.s), 1, 8))::BIGINT % 2 = 0 THEN u.v END)
        |          * 1.0
        |          / sum(CASE WHEN ('0x' || substr(md5(u.user_id || '#'
        |            || sl.s), 1, 8))::BIGINT % 2 = 0 THEN 1 END)
        |        + 1e-9, 6) pd
        |  FROM u, sl GROUP BY 1)
        |SELECT ob.od AS obs_diff_deci, 19::BIGINT AS n_perms,
        |  sum(CASE WHEN abs(pm.pd) >= abs(ob.od) THEN 1 ELSE 0 END)
        |    ::BIGINT AS n_extreme,
        |  round((1 + sum(CASE WHEN abs(pm.pd) >= abs(ob.od)
        |        THEN 1 ELSE 0 END)) / 20.0 + 1e-9, 4) AS p_value
        |FROM pm, ob GROUP BY ob.od""") { c =>
      val u = c.events.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase",
          round(col("value") * 10 + lit(1e-9)).cast("long"))
          .otherwise(0L)).as("v"))
      val ob = u.agg(r6(
        sum(when(col("user_id") % 2 === 1, col("v"))) * lit(1.0) /
          sum(when(col("user_id") % 2 === 1, 1)) -
          sum(when(col("user_id") % 2 === 0, col("v"))) * lit(1.0) /
            sum(when(col("user_id") % 2 === 0, 1))).as("od"))
      val sp2 = c.spark
      import sp2.implicits._
      val sl = (1 to 19).toDF("s")
      val hb = conv(substring(md5(concat(col("user_id").cast("string"),
        lit("#"), col("s").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2
      val pm = u.crossJoin(broadcast(sl))
        .groupBy("s")
        .agg(r6(
          sum(when(hb === 1, col("v"))) * lit(1.0) /
            sum(when(hb === 1, 1)) -
            sum(when(hb === 0, col("v"))) * lit(1.0) /
              sum(when(hb === 0, 1))).as("pd"))
      pm.crossJoin(broadcast(ob))
        .groupBy("od")
        .agg(lit(19L).as("n_perms"),
          sum(when(abs(col("pd")) >= abs(col("od")), 1L).otherwise(0L))
            .as("n_extreme"))
        .select(col("od").as("obs_diff_deci"), col("n_perms"),
          col("n_extreme"),
          r4((lit(1) + col("n_extreme")) / 20.0).as("p_value"))
    },

    // Hill tail-index estimator (Hill 1975 — the standard power-law
    // tail measure; α near 1-2 = heavy Pareto tail, the shape that
    // decides whether means/variances even exist): over order totals
    // above the exact integer-cents threshold of the top decile
    // (row_number order statistic, not an interpolated percentile),
    // α̂ = 1 + k / Σ ln(x_i/x_min). The ln terms ride the PINNED-ORDER
    // fold keyed by (value, rank) so the tail sum is engine-invariant.
    // Scale: one window for the order statistic, one tail-sized fold.
    q("stat_hill_tail",
      """WITH o AS (SELECT CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) v
        |           FROM orders),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) rn,
        |        count(*) OVER () n FROM o),
        |th AS (SELECT v xmin FROM r WHERE rn = n - (n + 9) // 10 + 1),
        |t AS (SELECT r.v FROM r, th WHERE r.v > th.xmin),
        |s AS (SELECT count(*)::BIGINT k,
        |        list_reduce(list(ln(v::DOUBLE / th.xmin) ORDER BY v),
        |          (x, y) -> x + y) lsum
        |      FROM t, th GROUP BY th.xmin)
        |SELECT s.k AS k_tail, round(th.xmin / 100.0 + 1e-9, 2)
        |    AS xmin_dollars,
        |  round(1 + s.k / s.lsum + 1e-9, 6) AS hill_alpha
        |FROM s, th""") { c =>
      val o = c.orders.select(
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
          .as("v"))
      // distributed rank: range-bucketed row numbering, no global
      // window over the corpus (the Positional device); ties share a
      // value so both the order statistic and the value-keyed fold are
      // invariant to tie order
      val r0 = graft.ops.Positional.withRowNumber(o, Seq(col("v")), "rn")
      val n = o.agg(count(lit(1)).as("n"))
      val r = r0.crossJoin(broadcast(n))
      val th = r.filter(col("rn") ===
          (col("n") - ((col("n") + 9) / 10).cast("long") + 1))
        .select(col("v").as("xmin"))
      val t = r.crossJoin(broadcast(th)).filter(col("v") > col("xmin"))
      val s = t.groupBy("xmin").agg(count(lit(1)).as("k"),
        aggregate(array_sort(collect_list(struct(col("v"),
            log(col("v").cast("double") / col("xmin")).as("t")))),
          lit(0.0), (acc, e) => acc + e.getField("t")).as("lsum"))
      s.select(col("k").as("k_tail"),
        r2(col("xmin") / 100.0).as("xmin_dollars"),
        r6(lit(1) + col("k") / col("lsum")).as("hill_alpha"))
    },

    // Zipf's-law fit of the corpus vocabulary: regression slope of
    // ln(freq) on ln(rank) — the corpus-health statistic (natural text
    // ≈ −1; generated/boilerplate corpora drift). Frequency ranks come
    // from the DISTRIBUTED Positional row number over the vocabulary
    // (vocab can be corpus-scale; no global window), the fit is the
    // ANSI regr_slope/regr_intercept aggregate pair.
    q("text_zipf_fit",
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '[a-z]+')) w
        |           FROM documents),
        |f AS (SELECT w, count(*) freq FROM w GROUP BY 1),
        |r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, w) rk
        |      FROM f)
        |SELECT count(*)::BIGINT AS vocab,
        |       round(regr_slope(ln(freq), ln(rk)) + 1e-9, 4) AS zipf_slope,
        |       round(regr_intercept(ln(freq), ln(rk)) + 1e-9, 4)
        |         AS zipf_intercept,
        |       round(regr_r2(ln(freq), ln(rk)) + 1e-9, 4) AS r2
        |FROM r""") { c =>
      val f = c.documents.select(explode(
          expr("regexp_extract_all(text, '[a-z]+', 0)")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val r = Positional.withRowNumber(
        f.withColumn("negf", -col("freq")),
        Seq(col("negf"), col("w")), "rk")
      r.agg(count(lit(1)).as("vocab"),
        r4(expr("regr_slope(ln(freq), ln(rk))")).as("zipf_slope"),
        r4(expr("regr_intercept(ln(freq), ln(rk))")).as("zipf_intercept"),
        r4(expr("regr_r2(ln(freq), ln(rk))")).as("r2"))
    },

    // Frequent event-path mining — top event-type TRIGRAM paths across
    // user sessions (the sequential-pattern complement of the Markov
    // matrix: which exact 3-step journeys dominate). Per-user ordered
    // sequences come from ONE sort_array(collect_list) aggregation
    // (state bounded by per-user event counts), trigrams explode from
    // the sequence, support is an exact count rational over users.
    q("events_frequent_paths",
      """WITH ord AS (SELECT user_id, event_type,
        |                 row_number() OVER (PARTITION BY user_id
        |                   ORDER BY ts, event_id) rn,
        |                 count(*) OVER (PARTITION BY user_id) n
        |          FROM events),
        |tri AS (SELECT a.user_id,
        |               a.event_type || '>' || b.event_type || '>'
        |                 || c.event_type AS path
        |        FROM ord a JOIN ord b ON a.user_id = b.user_id
        |                             AND b.rn = a.rn + 1
        |                   JOIN ord c ON a.user_id = c.user_id
        |                             AND c.rn = a.rn + 2),
        |u AS (SELECT count(DISTINCT user_id) nu FROM events)
        |SELECT path, count(*)::BIGINT AS n_occurrences,
        |       count(DISTINCT tri.user_id)::BIGINT AS n_users,
        |       round(count(DISTINCT tri.user_id) * 1.0 / u.nu + 1e-9, 6)
        |         AS user_support
        |FROM tri, u GROUP BY path, u.nu
        |ORDER BY n_occurrences DESC, path LIMIT 15""") { c =>
      // order key is MICROSECOND epoch + id so the in-array sort agrees
      // with the oracle's ORDER BY ts, event_id at full ts precision
      val s = c.events.groupBy("user_id")
        .agg(expr("transform(array_sort(collect_list(struct(" +
          "unix_micros(cast(ts AS TIMESTAMP)) AS t, event_id AS i, event_type AS e)))," +
          " x -> x.e)").as("seq"))
      val tri = s.select(col("user_id"), explode(expr(
          "CASE WHEN size(seq) >= 3 THEN transform(" +
            "sequence(0, size(seq) - 3), " +
            "i -> concat(seq[i], '>', seq[i + 1], '>', seq[i + 2])) " +
            "ELSE array() END")).as("path"))
      val u = c.events.agg(countDistinct(col("user_id")).as("nu"))
      tri.groupBy("path")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("user_id")).as("n_users"))
        .crossJoin(broadcast(u))
        .select(col("path"), col("n_occurrences"), col("n_users"),
          r6(col("n_users") * lit(1.0) / col("nu")).as("user_support"))
        .orderBy(col("n_occurrences").desc, col("path")).limit(15)
    },

    // Mann-Whitney U (Wilcoxon rank-sum) between the experiment arms —
    // the nonparametric complement of stat_ab_ttest for non-normal
    // value distributions. Midranks come from the DISTRIBUTED
    // Positional cumulative count over the grouped support (no global
    // window even for a continuous value column); the tie-corrected
    // normal approximation gives the z statistic. Every rank-sum term
    // w0·midrank is an exactly-representable double (integer or .5
    // lattice, partial sums < 2^53), so the aggregation is
    // order-independent — the hash cannot drift with shuffle order.
    q("stat_mannwhitney",
      """WITH p AS (SELECT user_id % 2 AS arm, value
        |           FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT value, count(*) FILTER (arm = 0) w0,
        |             count(*) FILTER (arm = 1) w1, count(*) w
        |      FROM p GROUP BY 1),
        |c AS (SELECT value, w0, w1, w,
        |             coalesce(sum(w) OVER (ORDER BY value
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) cum
        |      FROM h),
        |g AS (SELECT sum(w0) n0, sum(w1) n1,
        |             sum(w0 * (cum + (w + 1) / 2.0)) r0,
        |             sum(w * w * w - w) tt FROM c)
        |SELECT n0::BIGINT AS n0, n1::BIGINT AS n1,
        |       round(r0 - n0 * (n0 + 1) / 2.0 + 1e-9, 2) AS u,
        |       round((r0 - n0 * (n0 + 1) / 2.0 - n0 * 1.0 * n1 / 2.0)
        |             / sqrt(n0 * 1.0 * n1 / 12.0 * ((n0 + n1 + 1)
        |                    - tt / ((n0 + n1) * 1.0 * (n0 + n1 - 1))))
        |             + 1e-9, 4) AS z
        |FROM g""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"), col("value"))
      val h = p.groupBy("value").agg(
        count(when(col("arm") === 0, 1)).as("w0"),
        count(when(col("arm") === 1, 1)).as("w1"),
        count(lit(1)).as("w"))
      val cum = Positional.withCumSum(h, Seq(col("value")), col("w"), "cum")
      val g = cum.agg(
        sum(col("w0")).as("n0"), sum(col("w1")).as("n1"),
        sum(col("w0") * (col("cum") + (col("w") + 1) / lit(2.0))).as("r0"),
        sum(col("w") * col("w") * col("w") - col("w")).as("tt"))
      val u = col("r0") - col("n0") * (col("n0") + 1) / lit(2.0)
      val sigma = sqrt(col("n0") * lit(1.0) * col("n1") / lit(12.0) *
        ((col("n0") + col("n1") + 1) - col("tt") /
          ((col("n0") + col("n1")) * lit(1.0) *
            (col("n0") + col("n1") - 1))))
      g.select(col("n0"), col("n1"), r2(u).as("u"),
        r4((u - col("n0") * lit(1.0) * col("n1") / lit(2.0)) / sigma)
          .as("z"))
    },

    // Spearman rank correlation between quantity and price — monotone
    // association robust to outliers and nonlinearity. Both midrank
    // assignments are Positional cumulative counts over the grouped
    // per-column supports (scale-safe for continuous columns, where
    // the distinct-value relation is corpus-sized and a naive
    // rank() window would collapse to one task), joined back to rows
    // by value; rho is then one Pearson corr over exact .0/.5-lattice
    // midranks.
    q("stat_spearman",
      """WITH r AS (SELECT rank() OVER (ORDER BY l_quantity)
        |             + (count(*) OVER (PARTITION BY l_quantity) - 1)
        |               / 2.0 AS rx,
        |                  rank() OVER (ORDER BY l_extendedprice)
        |             + (count(*) OVER (PARTITION BY l_extendedprice) - 1)
        |               / 2.0 AS ry
        |           FROM lineitem)
        |SELECT round(corr(rx, ry) + 1e-9, 6) AS rho,
        |       count(*)::BIGINT AS n
        |FROM r""") { c =>
      val li = c.lineitem.select(col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
      val rx = Positional.withCumSum(
          li.groupBy("x").agg(count(lit(1)).as("wx")),
          Seq(col("x")), col("wx"), "cumx")
        .select(col("x"),
          (col("cumx") + (col("wx") + 1) / lit(2.0)).as("rx"))
      val ry = Positional.withCumSum(
          li.groupBy("y").agg(count(lit(1)).as("wy")),
          Seq(col("y")), col("wy"), "cumy")
        .select(col("y"),
          (col("cumy") + (col("wy") + 1) / lit(2.0)).as("ry"))
      li.join(rx, Seq("x")).join(ry, Seq("y"))
        .agg(r6(corr(col("rx"), col("ry"))).as("rho"),
          count(lit(1)).as("n"))
    },

    // Kaplan-Meier survival curve for time-to-conversion: per user,
    // the duration (whole hours) from first event to first purchase
    // (observed) or to the last seen event (right-censored). The
    // at-risk counts are a Positional cumulative count over distinct
    // durations; the survival product Π(1 − d/n_risk) runs as
    // exp of a SECOND Positional cumulative sum of logs — both passes
    // scale-safe over a continuous-duration support. The final time
    // point where everyone at risk converts yields survival exactly 0
    // (guarded before the log).
    q("stat_kaplan_meier",
      """WITH u AS (SELECT user_id,
        |      min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) e0,
        |      min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
        |        FILTER (event_type = 'purchase') ep,
        |      max(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) ez
        |    FROM events GROUP BY 1),
        |d AS (SELECT
        |        CAST(floor((coalesce(ep, ez) - e0) / 3600.0) AS BIGINT)
        |          dur_h,
        |        CASE WHEN ep IS NOT NULL THEN 1 ELSE 0 END obs FROM u),
        |h AS (SELECT dur_h, sum(obs) d, count(*) w FROM d GROUP BY 1),
        |n AS (SELECT sum(w) nt FROM h),
        |c AS (SELECT dur_h, d, w,
        |             coalesce(sum(w) OVER (ORDER BY dur_h
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) cum
        |      FROM h),
        |s AS (SELECT dur_h, d, (n.nt - cum) at_risk,
        |             CASE WHEN d < n.nt - cum
        |                  THEN ln(1 - d * 1.0 / (n.nt - cum)) END term
        |      FROM c, n),
        |k AS (SELECT dur_h, d, at_risk,
        |             CASE WHEN term IS NULL THEN 0.0
        |                  ELSE exp(sum(term) OVER (ORDER BY dur_h)) END
        |               surv
        |      FROM s)
        |SELECT dur_h, at_risk::BIGINT AS at_risk, d::BIGINT AS deaths,
        |       round(surv + 1e-9, 6) AS survival
        |FROM k ORDER BY dur_h""") { c =>
      val sec = unix_timestamp(col("ts"))
      val u = c.events.groupBy("user_id").agg(
        min(sec).as("e0"),
        min(when(col("event_type") === "purchase", sec)).as("ep"),
        max(sec).as("ez"))
      val d = u.select(
        floor((coalesce(col("ep"), col("ez")) - col("e0")) / lit(3600.0))
          .as("dur_h"),
        when(col("ep").isNotNull, 1).otherwise(0).as("obs"))
      val h = d.groupBy("dur_h")
        .agg(sum(col("obs")).as("d"), count(lit(1)).as("w"))
      val n = h.agg(sum(col("w")).as("nt"))
      val cum = Positional.withCumSum(h, Seq(col("dur_h")), col("w"), "cum")
      val s = cum.crossJoin(broadcast(n))
        .withColumn("at_risk", col("nt") - col("cum"))
        .withColumn("term", when(col("d") < col("at_risk"),
          log(lit(1) - col("d") * lit(1.0) / col("at_risk"))))
      // exclusive log-cumsum + own term = inclusive survival product
      Positional.withCumSum(s, Seq(col("dur_h")), col("term"), "cumt")
        .select(col("dur_h"), col("at_risk"), col("d").as("deaths"),
          r6(when(col("term").isNull, lit(0.0))
            .otherwise(exp(col("cumt") + col("term")))).as("survival"))
        .orderBy("dur_h")
    },

    // Poisson bootstrap confidence interval for the mean (Chamandy et
    // al. 2012, the streaming/distributed bootstrap): resampling
    // weights are per-(row, replicate) Poisson(1) draws inverted from
    // an md5-derived uniform — DETERMINISTIC and engine-portable, so
    // the whole B=32 bootstrap is one ×32 explode + one replicate
    // aggregation, embarrassingly parallel with no RNG state and no
    // row collection. The normal-approximation CI uses the bootstrap
    // standard error (avoids cross-engine percentile semantics).
    q("stat_bootstrap_ci",
      """WITH p AS (SELECT event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |draws AS (SELECT b.b, event_id, value,
        |            ('0x' || substr(md5(event_id::VARCHAR || ':'
        |              || b.b::VARCHAR), 1, 8))::BIGINT
        |              / 4294967296.0 u
        |          FROM p, generate_series(0, 31) b(b)),
        |w AS (SELECT b, value,
        |        CASE WHEN u < 0.36787944117144233 THEN 0
        |             WHEN u < 0.7357588823428846 THEN 1
        |             WHEN u < 0.9196986029286058 THEN 2
        |             WHEN u < 0.9810118431238462 THEN 3
        |             WHEN u < 0.9963401531726563 THEN 4
        |             ELSE 5 END wt
        |      FROM draws),
        |rep AS (SELECT b, sum(wt * value) / sum(wt) m FROM w GROUP BY 1),
        |pt AS (SELECT avg(value) mu, count(*) n FROM p),
        |s AS (SELECT avg(m) boot_mean, stddev_samp(m) boot_se,
        |             min(m) boot_min, max(m) boot_max FROM rep)
        |SELECT pt.n::BIGINT AS n, round(pt.mu + 1e-9, 4) AS point_est,
        |       round(s.boot_mean + 1e-9, 4) AS boot_mean,
        |       round(s.boot_se + 1e-9, 4) AS boot_se,
        |       round(pt.mu - 1.959963984540054 * s.boot_se + 1e-9, 4)
        |         AS ci_lo,
        |       round(pt.mu + 1.959963984540054 * s.boot_se + 1e-9, 4)
        |         AS ci_hi,
        |       round(s.boot_min + 1e-9, 4) AS boot_min,
        |       round(s.boot_max + 1e-9, 4) AS boot_max
        |FROM pt, s""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value"))
      val draws = p
        .select(col("event_id"), col("value"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u",
          conv(substring(md5(concat(col("event_id"), lit(":"), col("b"))),
            1, 8), 16, 10).cast("double") / lit(4294967296.0))
        .withColumn("wt",
          when(col("u") < 0.36787944117144233, 0)
            .when(col("u") < 0.7357588823428846, 1)
            .when(col("u") < 0.9196986029286058, 2)
            .when(col("u") < 0.9810118431238462, 3)
            .when(col("u") < 0.9963401531726563, 4)
            .otherwise(5))
      val rep = draws.groupBy("b")
        .agg((sum(col("wt") * col("value")) / sum(col("wt"))).as("m"))
      val pt = p.agg(avg(col("value")).as("mu"), count(lit(1)).as("n"))
      val s = rep.agg(avg(col("m")).as("boot_mean"),
        stddev_samp(col("m")).as("boot_se"),
        min(col("m")).as("boot_min"), max(col("m")).as("boot_max"))
      val zc = lit(1.959963984540054)
      pt.crossJoin(s).select(col("n"), r4(col("mu")).as("point_est"),
        r4(col("boot_mean")).as("boot_mean"),
        r4(col("boot_se")).as("boot_se"),
        r4(col("mu") - zc * col("boot_se")).as("ci_lo"),
        r4(col("mu") + zc * col("boot_se")).as("ci_hi"),
        r4(col("boot_min")).as("boot_min"),
        r4(col("boot_max")).as("boot_max"))
    },

    // Seasonal z-score anomaly detection: per (event_type × hour-of-
    // day) baseline mean/σ (the seasonal profile, a model-sized
    // broadcast), then every event scores against its own season.
    // Cells thinner than 30 events or with zero variance are excluded
    // from scoring rather than producing unstable z values. The |z|>3
    // threshold is applied to the ROUNDED z (r8, advisor ask): mu/sd
    // come from cross-engine double aggregations, so a raw-zs
    // comparison could flip borderline rows per engine; thresholding
    // the 4-dp value keeps membership and output on the same grain.
    q("events_anomaly_z",
      """WITH e AS (SELECT event_id, event_type,
        |                  hour(CAST(ts AS TIMESTAMP)) hr, value
        |           FROM events),
        |base AS (SELECT event_type, hr, avg(value) mu,
        |                stddev_samp(value) sd, count(*) n
        |         FROM e GROUP BY 1, 2),
        |z AS (SELECT e.event_id, e.event_type, e.hr,
        |             (e.value - b.mu) / b.sd zs
        |      FROM e JOIN base b ON e.event_type = b.event_type
        |                        AND e.hr = b.hr
        |      WHERE b.n >= 30 AND b.sd > 0)
        |SELECT event_id, event_type, hr::BIGINT AS hr,
        |       round(zs + 1e-9, 4) AS z
        |FROM z WHERE abs(round(zs + 1e-9, 4)) > 3
        |ORDER BY event_id""") { c =>
      val e = c.events.select(col("event_id"), col("event_type"),
        hour(col("ts")).as("hr"), col("value"))
      val base = e.groupBy("event_type", "hr")
        .agg(avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sd"), count(lit(1)).as("n"))
        .filter(col("n") >= 30 && col("sd") > 0)
      e.join(broadcast(base), Seq("event_type", "hr"))
        .withColumn("z", r4((col("value") - col("mu")) / col("sd")))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"),
          col("hr").cast("long").as("hr"), col("z"))
        .orderBy("event_id")
    },

    // Benford's-law audit of order totals — the classic forensic /
    // data-quality screen for fabricated numeric columns. First digits
    // come from the INTEGER-cents string (never from double
    // formatting, which engines render differently); per-digit
    // chi-square terms against log10(1 + 1/d) quantify the deviation.
    q("stat_benford",
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |             cents
        |           FROM orders WHERE o_totalprice > 0),
        |d AS (SELECT CAST(substr(cents::VARCHAR, 1, 1) AS INT) dig
        |      FROM c),
        |o AS (SELECT dig, count(*) n FROM d GROUP BY 1),
        |t AS (SELECT sum(n) tot FROM o)
        |SELECT dig, n::BIGINT AS n,
        |       round(n * 1.0 / t.tot + 1e-9, 6) AS observed,
        |       round(ln(1 + 1.0 / dig) / ln(10) + 1e-9, 6) AS benford,
        |       round(pow(n * 1.0 / t.tot - ln(1 + 1.0 / dig) / ln(10), 2)
        |             / (ln(1 + 1.0 / dig) / ln(10)) * t.tot + 1e-9, 4)
        |         AS chi2_term
        |FROM o, t ORDER BY dig""") { c =>
      val o = c.orders.filter(col("o_totalprice") > 0)
        .select(round(col("o_totalprice") * 100).cast("long")
          .cast("string").substr(1, 1).cast("int").as("dig"))
        .groupBy("dig").agg(count(lit(1)).as("n"))
      val t = o.agg(sum(col("n")).as("tot"))
      val exp = log(lit(1) + lit(1.0) / col("dig")) / log(lit(10))
      o.crossJoin(broadcast(t))
        .select(col("dig"), col("n"),
          r6(col("n") * lit(1.0) / col("tot")).as("observed"),
          r6(exp).as("benford"),
          r4(pow(col("n") * lit(1.0) / col("tot") - exp, 2) / exp *
            col("tot")).as("chi2_term"))
        .orderBy("dig")
    },

    // Theil-Sen robust slope (repeated-pair variant): pair rank r with
    // rank r + n/2 under the (x, y, id) total order — n/2 deterministic
    // pairs instead of O(n²) — and take the WEIGHTED MEDIAN of the
    // pairwise slopes. Ranks come from the distributed Positional row
    // number; the median from its cumulative-sum sibling, so no stage
    // ever sees a single-partition window. Outlier-immune where OLS
    // (agg_regr) is not.
    q("stat_theil_sen",
      """WITH s AS (SELECT l_quantity x, l_extendedprice y,
        |             row_number() OVER (ORDER BY l_quantity,
        |               l_extendedprice, l_orderkey, l_linenumber) rn,
        |             count(*) OVER () n
        |           FROM lineitem WHERE l_orderkey % 29 = 0),
        |p AS (SELECT a.x x1, a.y y1, b.x x2, b.y y2
        |      FROM s a JOIN s b ON b.rn = a.rn + a.n // 2
        |      WHERE a.x <> b.x),
        |sl AS (SELECT (y2 - y1) / (x2 - x1) m FROM p),
        |h AS (SELECT m, count(*) w FROM sl GROUP BY 1),
        |t AS (SELECT sum(w) tw FROM h),
        |c AS (SELECT m, w, coalesce(sum(w) OVER (ORDER BY m
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum
        |      FROM h)
        |SELECT round(min(m) + 1e-9, 4) AS slope,
        |       max(t.tw)::BIGINT AS n_pairs
        |FROM c, t WHERE cum * 2 < t.tw AND (cum + w) * 2 >= t.tw""") { c =>
      val s0 = c.lineitem.filter(col("l_orderkey") % 29 === 0)
        .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"),
          col("l_orderkey"), col("l_linenumber"))
      val ranked = Positional.withRowNumber(s0,
        Seq(col("x"), col("y"), col("l_orderkey"), col("l_linenumber")),
        "rn")
      val nDf = ranked.agg(count(lit(1)).as("n"))
      val a = ranked.crossJoin(broadcast(nDf))
        .withColumn("rn2", expr("rn + n div 2"))
        .select(col("x").as("x1"), col("y").as("y1"), col("rn2"))
      val b = ranked.select(col("x").as("x2"), col("y").as("y2"),
        col("rn"))
      val sl = a.join(b, col("rn2") === col("rn"))
        .filter(col("x1") =!= col("x2"))
        .select(((col("y2") - col("y1")) / (col("x2") - col("x1")))
          .as("m"))
      val h = sl.groupBy("m").agg(count(lit(1)).as("w"))
      val t = h.agg(sum(col("w")).as("tw"))
      val cum = Positional.withCumSum(h, Seq(col("m")), col("w"), "cum")
      cum.crossJoin(broadcast(t))
        .filter(col("cum") * 2 < col("tw") &&
          (col("cum") + col("w")) * 2 >= col("tw"))
        .agg(r4(min(col("m"))).as("slope"),
          max(col("tw")).as("n_pairs"))
    },

    // 1-day and trailing-7-day rolling distinct active users — the
    // product-health metric whose naive form (count distinct over a
    // sliding window) has no mergeable state. The distributed shape:
    // dedupe to (day, user) once, then join the model-sized day grid
    // onto its trailing week — the distinct count per day touches only
    // the 7-day slice, and the grid is calendar-bounded.
    q("events_rolling_dau",
      """WITH du AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |              dy, user_id
        |            FROM events),
        |days AS (SELECT DISTINCT dy FROM du),
        |roll AS (SELECT d.dy, count(DISTINCT du.user_id) dau7
        |         FROM days d JOIN du ON du.dy BETWEEN d.dy - 6 AND d.dy
        |         GROUP BY 1),
        |one AS (SELECT dy, count(*) dau1 FROM du GROUP BY 1)
        |SELECT roll.dy::VARCHAR AS day, one.dau1::BIGINT AS dau,
        |       roll.dau7::BIGINT AS dau_7d
        |FROM roll JOIN one USING (dy) ORDER BY day""") { c =>
      val du = c.events
        .select(col("ts").cast("date").as("dy"), col("user_id"))
        .distinct()
      val days = du.select(col("dy").as("d")).distinct()
      val roll = broadcast(days).join(du,
          col("dy").between(date_sub(col("d"), 6), col("d")))
        .groupBy("d").agg(countDistinct(col("user_id")).as("dau7"))
      val one = du.groupBy("dy").agg(count(lit(1)).as("dau1"))
      roll.join(one, col("d") === col("dy"))
        .select(col("d").cast("string").as("day"),
          col("dau1").as("dau"), col("dau7").as("dau_7d"))
        .orderBy("day")
    },

    // Day-over-day and week-over-week revenue growth over the daily
    // grid — the canonical KPI window. Daily sums are exact DECIMAL
    // (the money-sum contract) so the growth ratios cannot sit on a
    // rounding tie; the only window runs on the calendar-bounded day
    // grid. Leading rows without a comparison basis stay NULL.
    q("events_dod_growth",
      """WITH rev AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) dy,
        |               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |                 rev,
        |               count(*) n
        |             FROM events WHERE event_type = 'purchase'
        |             GROUP BY 1),
        |w AS (SELECT dy, rev, n,
        |             lag(rev) OVER (ORDER BY dy) prev,
        |             lag(rev, 7) OVER (ORDER BY dy) prev7
        |      FROM rev)
        |SELECT dy::VARCHAR AS day, round(rev + 1e-9, 2) AS revenue,
        |       n::BIGINT AS n_purchases,
        |       round((rev - prev) / prev + 1e-9, 6) AS dod_growth,
        |       round((rev - prev7) / prev7 + 1e-9, 6) AS wow_growth
        |FROM w ORDER BY day""") { c =>
      import org.apache.spark.sql.expressions.Window
      val rev = c.events.filter(col("event_type") === "purchase")
        .groupBy(col("ts").cast("date").as("dy"))
        .agg(dsum(col("value"), 6).as("rev"), count(lit(1)).as("n"))
      val w = Window.orderBy("dy") // calendar-bounded day grid
      rev
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .withColumn("prev7", lag(col("rev"), 7).over(w))
        .select(col("dy").cast("string").as("day"),
          r2(col("rev")).as("revenue"), col("n").as("n_purchases"),
          r6((col("rev") - col("prev")) / col("prev")).as("dod_growth"),
          r6((col("rev") - col("prev7")) / col("prev7"))
            .as("wow_growth"))
        .orderBy("day")
    },

    // Cox proportional-hazards regression (Cox 1972; Breslow ties) for
    // the two-arm time-to-conversion setup — the model BEHIND the
    // Kaplan-Meier curves: β is the log hazard ratio between arms,
    // fitted by two pinned Newton steps on the partial likelihood.
    // The binary covariate makes every risk-set sum S_k(t) a closed
    // form of the two integer at-risk counts (exp(βx) takes exactly
    // two values — the Boost/Gbrt determinism device), the at-risk
    // counts are Positional cumulative sums over distinct durations,
    // and each Newton step is ONE aggregation; only β crosses the
    // driver between steps.
    q("stat_cox_ph",
      """WITH u AS (SELECT user_id, user_id % 2 x,
        |      min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
        |        e0,
        |      min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
        |        FILTER (event_type = 'purchase') ep,
        |      max(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
        |        ez
        |    FROM events GROUP BY 1, 2),
        |d AS (SELECT CAST(floor((coalesce(ep, ez) - e0) / 3600.0)
        |               AS BIGINT) dur,
        |             CASE WHEN ep IS NOT NULL THEN 1 ELSE 0 END obs, x
        |      FROM u),
        |h AS (SELECT dur,
        |             sum(CASE WHEN x = 1 THEN obs ELSE 0 END) ev1,
        |             sum(CASE WHEN x = 0 THEN obs ELSE 0 END) ev0,
        |             count(*) FILTER (x = 1) w1,
        |             count(*) FILTER (x = 0) w0
        |      FROM d GROUP BY 1),
        |t AS (SELECT sum(w0) t0, sum(w1) t1 FROM h),
        |c AS (SELECT dur, ev0, ev1, w0, w1,
        |             coalesce(sum(w0) OVER (ORDER BY dur
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) c0,
        |             coalesce(sum(w1) OVER (ORDER BY dur
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) c1
        |      FROM h),
        |rk AS (SELECT dur, ev0, ev1, (t.t0 - c0) r0, (t.t1 - c1) r1
        |       FROM c, t WHERE ev0 + ev1 > 0),
        |s1 AS (SELECT sum(ev1 - (ev0 + ev1) * (r1 * 1.0 / (r0 + r1)))
        |                u1,
        |              sum((ev0 + ev1) * ((r1 * 1.0 / (r0 + r1))
        |                  * (1 - r1 * 1.0 / (r0 + r1)))) i1
        |       FROM rk),
        |b1 AS (SELECT u1 / i1 beta1 FROM s1),
        |s2 AS (SELECT sum(ev1 - (ev0 + ev1)
        |                 * (r1 * exp(b1.beta1)
        |                    / (r0 + r1 * exp(b1.beta1)))) u2,
        |              sum((ev0 + ev1)
        |                 * ((r1 * exp(b1.beta1)
        |                     / (r0 + r1 * exp(b1.beta1)))
        |                    * (1 - r1 * exp(b1.beta1)
        |                         / (r0 + r1 * exp(b1.beta1))))) i2,
        |              max(b1.beta1) beta1
        |       FROM rk, b1),
        |fin AS (SELECT beta1 + u2 / i2 beta2, i2 FROM s2),
        |ne AS (SELECT sum(obs)::BIGINT n_events, count(*)::BIGINT n
        |       FROM d)
        |SELECT round(fin.beta2 + 1e-9, 6) AS beta,
        |       round(exp(fin.beta2) + 1e-9, 6) AS hazard_ratio,
        |       round(1.0 / sqrt(fin.i2) + 1e-9, 6) AS se,
        |       ne.n_events, ne.n
        |FROM fin, ne""") { c =>
      val sec = unix_timestamp(col("ts"))
      val u = c.events.groupBy(col("user_id"),
          (col("user_id") % 2).as("x"))
        .agg(min(sec).as("e0"),
          min(when(col("event_type") === "purchase", sec)).as("ep"),
          max(sec).as("ez"))
      val d = u.select(
        floor((coalesce(col("ep"), col("ez")) - col("e0")) / lit(3600.0))
          .as("dur"),
        when(col("ep").isNotNull, 1).otherwise(0).as("obs"), col("x"))
        .persist()
      val h = d.groupBy("dur").agg(
        sum(when(col("x") === 1, col("obs")).otherwise(0)).as("ev1"),
        sum(when(col("x") === 0, col("obs")).otherwise(0)).as("ev0"),
        count(when(col("x") === 1, 1)).as("w1"),
        count(when(col("x") === 0, 1)).as("w0"))
      val t = h.agg(sum(col("w0")).as("t0"), sum(col("w1")).as("t1"))
      val rk = Positional.withCumSums(h, Seq(col("dur")),
          Seq(col("w0") -> "c0", col("w1") -> "c1"))
        .crossJoin(broadcast(t))
        .filter(col("ev0") + col("ev1") > 0)
        .select(col("ev0"), col("ev1"),
          (col("t0") - col("c0")).as("r0"),
          (col("t1") - col("c1")).as("r1"))
        .persist()
      val frac1 = col("r1") * lit(1.0) / (col("r0") + col("r1"))
      val s1 = rk.agg(
        sum(col("ev1") - (col("ev0") + col("ev1")) * frac1).as("u1"),
        sum((col("ev0") + col("ev1")) * (frac1 * (lit(1) - frac1)))
          .as("i1")).collect().head
      val beta1 = s1.getDouble(0) / s1.getDouble(1)
      val a = math.exp(beta1)
      val frac2 = col("r1") * lit(a) / (col("r0") + col("r1") * lit(a))
      val s2 = rk.agg(
        sum(col("ev1") - (col("ev0") + col("ev1")) * frac2).as("u2"),
        sum((col("ev0") + col("ev1")) * (frac2 * (lit(1) - frac2)))
          .as("i2")).collect().head
      rk.unpersist()
      val beta2 = beta1 + s2.getDouble(0) / s2.getDouble(1)
      val ne = d.agg(sum(col("obs")).as("ev"), count(lit(1)).as("n"))
        .collect().head
      d.unpersist()
      def r6d(y: Double): Double = BigDecimal(y + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = c.spark
      import s.implicits._
      Seq((r6d(beta2), r6d(math.exp(beta2)),
        r6d(1.0 / math.sqrt(s2.getDouble(1))), ne.getLong(0),
        ne.getLong(1)))
        .toDF("beta", "hazard_ratio", "se", "n_events", "n")
    },

    // Inter-arrival time analysis: per-user gaps from one lag window,
    // then the Poisson-process diagnostics — a coefficient of
    // variation near 1 is the memoryless signature; the hourly rate is
    // the exponential MLE 1/mean. Exact integer-second gaps feed every
    // statistic.
    q("events_interarrival",
      """WITH s AS (SELECT user_id,
        |             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |               sec
        |           FROM events),
        |g AS (SELECT user_id, sec - lag(sec) OVER (PARTITION BY user_id
        |        ORDER BY sec) gap
        |      FROM s),
        |v AS (SELECT gap FROM g WHERE gap IS NOT NULL AND gap > 0)
        |SELECT count(*)::BIGINT AS n_gaps,
        |       round(avg(gap) + 1e-9, 4) AS mean_gap_s,
        |       round(stddev_samp(gap) / avg(gap) + 1e-9, 6) AS cv,
        |       round(1.0 / avg(gap) * 3600 + 1e-9, 6) AS rate_per_hour,
        |       round(median(gap) + 1e-9, 1) AS median_gap_s
        |FROM v""") { c =>
      import org.apache.spark.sql.expressions.Window
      val s = c.events.select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
      val g = s.withColumn("gap", col("sec") -
        lag(col("sec"), 1).over(
          Window.partitionBy("user_id").orderBy("sec")))
      val v = g.filter(col("gap").isNotNull && col("gap") > 0)
      v.agg(count(lit(1)).as("n_gaps"),
        r4(avg(col("gap"))).as("mean_gap_s"),
        r6(stddev_samp(col("gap")) / avg(col("gap"))).as("cv"),
        round(lit(1.0) / avg(col("gap")) * 3600 + lit(1e-9), 6)
          .as("rate_per_hour"),
        round(percentile(col("gap"), lit(0.5)) + lit(1e-9), 1)
          .as("median_gap_s"))
    },

    // Degree assortativity (Newman 2002): Pearson correlation of
    // endpoint degrees over all directed edge ends — does the graph
    // wire hubs to hubs (positive) or hubs to leaves (negative)? Two
    // degree joins + one corr; bipartite purchase graphs are strongly
    // DISassortative, which this measures exactly.
    q("graph_assortativity",
      """WITH e0 AS (SELECT DISTINCT 'c' || o_custkey s, 's' || l_suppkey t
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |            WHERE l_quantity > 45),
        |e AS (SELECT s src, t dst FROM e0 UNION SELECT t, s FROM e0),
        |deg AS (SELECT src node, count(*) d FROM e GROUP BY 1)
        |SELECT round(corr(ds.d, dd.d) + 1e-9, 6) AS assortativity,
        |       count(*)::BIGINT AS n_edge_ends
        |FROM e JOIN deg ds ON e.src = ds.node
        |       JOIN deg dd ON e.dst = dd.node""") { c =>
      val e0 = c.lineitem.filter(col("l_quantity") > 45)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("s"),
          concat(lit("s"), col("l_suppkey")).as("t"))
        .distinct()
      val e = e0.select(col("s").as("src"), col("t").as("dst"))
        .union(e0.select(col("t").as("src"), col("s").as("dst")))
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d"))
      e.join(deg.select(col("node").as("sn"), col("d").as("ds")),
          col("src") === col("sn"))
        .join(deg.select(col("node").as("dn"), col("d").as("dd")),
          col("dst") === col("dn"))
        .agg(r6(corr(col("ds"), col("dd"))).as("assortativity"),
          count(lit(1)).as("n_edge_ends"))
    },

    // Power analysis / sample-size calculator: given the experiment's
    // observed effect size and variance, the per-arm n needed to
    // detect it at 80% and 90% power (two-sided α=0.05) —
    // n = 2σ²(z_α + z_β)²/δ², the capacity-planning readout every
    // experimentation platform pairs with stat_ab_ttest. One
    // aggregation; the rest is closed-form scalar math with pinned
    // z constants.
    q("stat_power_analysis",
      """WITH p AS (SELECT user_id % 2 AS arm, value FROM events
        |           WHERE event_type = 'purchase'),
        |g AS (SELECT avg(CASE WHEN arm = 0 THEN value END) m0,
        |             avg(CASE WHEN arm = 1 THEN value END) m1,
        |             var_samp(value) v FROM p),
        |c AS (SELECT abs(m0 - m1) delta, sqrt(v) sd,
        |             1.959963984540054 za, 0.8416212335729143 zb FROM g)
        |SELECT round(delta + 1e-9, 4) AS observed_delta,
        |       round(sd + 1e-9, 4) AS pooled_sd,
        |       CAST(ceil(2 * (sd * sd) * ((za + zb) * (za + zb))
        |                 / (delta * delta) + 1e-9) AS BIGINT)
        |         AS n_per_arm_80pct,
        |       CAST(ceil(2 * (sd * sd)
        |                 * ((za + 1.2815515655446004)
        |                    * (za + 1.2815515655446004))
        |                 / (delta * delta) + 1e-9) AS BIGINT)
        |         AS n_per_arm_90pct
        |FROM c""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"), col("value"))
      val g = p.agg(
        avg(when(col("arm") === 0, col("value"))).as("m0"),
        avg(when(col("arm") === 1, col("value"))).as("m1"),
        var_samp(col("value")).as("v"))
      val za = lit(1.959963984540054)
      def nFor(zb: org.apache.spark.sql.Column) =
        ceil(lit(2) * (col("sd") * col("sd")) *
          ((za + zb) * (za + zb)) / (col("delta") * col("delta")) +
          lit(1e-9)).cast("long")
      g.select(abs(col("m0") - col("m1")).as("delta"),
          sqrt(col("v")).as("sd"))
        .select(r4(col("delta")).as("observed_delta"),
          r4(col("sd")).as("pooled_sd"),
          nFor(lit(0.8416212335729143)).as("n_per_arm_80pct"),
          nFor(lit(1.2815515655446004)).as("n_per_arm_90pct"))
    },

    // Q-Q decile comparison between the experiment arms — WHERE in the
    // distribution an effect lives (uniform shift vs tail-only), the
    // readout a mean-based t-test cannot give. One exact
    // multi-percentile aggregation per arm (Spark percentile ==
    // DuckDB quantile_cont interpolation), zipped by decile.
    q("stat_qq_arms",
      """WITH p AS (SELECT user_id % 2 arm, value FROM events
        |           WHERE event_type = 'purchase'),
        |s AS (SELECT quantile_cont(value,
        |          [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
        |          FILTER (arm = 0) q0a,
        |        quantile_cont(value,
        |          [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
        |          FILTER (arm = 1) q1a
        |      FROM p),
        |u AS (SELECT unnest(range(1, 10)) d, unnest(q0a) q0,
        |             unnest(q1a) q1
        |      FROM s)
        |SELECT d::BIGINT AS decile, round(q0 + 1e-9, 4) AS q_arm0,
        |       round(q1 + 1e-9, 4) AS q_arm1,
        |       round(q1 - q0 + 1e-9, 4) AS shift
        |FROM u ORDER BY d""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"), col("value"))
      val probs = typedlit((1 to 9).map(_ / 10.0))
      val s = p.agg(
        percentile(when(col("arm") === 0, col("value")), probs)
          .as("q0a"),
        percentile(when(col("arm") === 1, col("value")), probs)
          .as("q1a"))
      s.select(posexplode(arrays_zip(col("q0a"), col("q1a")))
          .as(Seq("i", "z")))
        .select((col("i") + 1).cast("long").as("decile"),
          r4(col("z.q0a")).as("q_arm0"), r4(col("z.q1a")).as("q_arm1"),
          r4(col("z.q1a") - col("z.q0a")).as("shift"))
        .orderBy("decile")
    },

    // Cohort LTV curves: cumulative per-user revenue by signup cohort
    // and weeks-since-signup — the unit-economics readout on top of
    // the retention triangle. Weekly revenue cells are exact DECIMAL
    // sums; the cumulative runs on the calendar-bounded
    // (cohort × age) grid.
    q("events_cohort_ltv",
      """WITH su AS (SELECT user_id,
        |              CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))
        |                   / 604800) AS BIGINT) cohort_w
        |            FROM events GROUP BY 1),
        |pur AS (SELECT e.user_id,
        |               CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))
        |                    / 604800) AS BIGINT) w,
        |               e.value
        |        FROM events e WHERE e.event_type = 'purchase'),
        |j AS (SELECT su.cohort_w, pur.w - su.cohort_w age_w,
        |             CAST(pur.value AS DECIMAL(18,6)) v
        |      FROM pur JOIN su USING (user_id)),
        |cs AS (SELECT cohort_w, count(*) n_users FROM su GROUP BY 1),
        |rev AS (SELECT cohort_w, age_w, CAST(sum(v) AS DOUBLE) r
        |        FROM j GROUP BY 1, 2),
        |cum AS (SELECT cohort_w, age_w, r,
        |               sum(r) OVER (PARTITION BY cohort_w
        |                            ORDER BY age_w) cr
        |        FROM rev)
        |SELECT cum.cohort_w, cum.age_w::BIGINT AS age_w,
        |       round(cum.cr / cs.n_users + 1e-9, 4) AS cum_ltv_per_user,
        |       cs.n_users::BIGINT AS cohort_size
        |FROM cum JOIN cs USING (cohort_w)
        |ORDER BY cohort_w, age_w""") { c =>
      import org.apache.spark.sql.expressions.Window
      val week = (t: org.apache.spark.sql.Column) =>
        floor(unix_timestamp(t) / lit(604800.0))
      val su = c.events.groupBy("user_id")
        .agg(week(min(col("ts"))).as("cohort_w"))
      val pur = c.events.filter(col("event_type") === "purchase")
        .select(col("user_id"), week(col("ts")).as("w"), col("value"))
      val rev = pur.join(su, Seq("user_id"))
        .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("age_w"))
        .agg(dsum(col("value"), 6).as("r"))
      val cs = su.groupBy("cohort_w").agg(count(lit(1)).as("n_users"))
      rev
        .withColumn("cr", sum(col("r")).over(
          Window.partitionBy("cohort_w").orderBy("age_w")))
        .join(broadcast(cs), Seq("cohort_w"))
        .select(col("cohort_w"), col("age_w").cast("long").as("age_w"),
          r4(col("cr") / col("n_users")).as("cum_ltv_per_user"),
          col("n_users").as("cohort_size"))
        .orderBy("cohort_w", "age_w")
    },

    // Gini coefficient of customer revenue concentration — the
    // inequality measure behind "top x% of customers drive y%"
    // (agg_pareto_abc's scalar summary). Computed from the
    // rank-weighted sum identity G = 2Σi·xᵢ/(nΣx) − (n+1)/n with
    // ranks from the DISTRIBUTED Positional row number and exact
    // DECIMAL revenue totals per customer.
    q("stat_gini",
      """WITH v AS (SELECT o_custkey k,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         x
        |     FROM orders GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, k) i,
        |             count(*) OVER () n, sum(x) OVER () s
        |      FROM v)
        |SELECT round(2.0 * sum(i * x) / (max(n) * max(s))
        |             - (max(n) + 1.0) / max(n) + 1e-9, 6) AS gini,
        |       max(n)::BIGINT AS n_customers
        |FROM r""") { c =>
      val v = c.orders.groupBy(col("o_custkey").as("k"))
        .agg(dsum(col("o_totalprice")).as("x"))
      val ranked = Positional.withRowNumber(v,
        Seq(col("x"), col("k")), "i")
      val tot = v.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      ranked.crossJoin(broadcast(tot))
        .agg(r6(lit(2.0) * sum(col("i") * col("x")) /
            (max(col("n")) * max(col("s"))) -
          (max(col("n")) + lit(1.0)) / max(col("n"))).as("gini"),
          max(col("n")).as("n_customers"))
    },

    // One-way ANOVA F-test (Fisher 1925) of quantity across the three
    // return-flag groups — the k-group generalization of stat_ab_ttest.
    // Determinism device: the corpus pass produces EXACT integer
    // moments per group (n, Σy, Σy² all BIGINT — quantity is integer-
    // valued ≤ 50 so Σy² fits comfortably); the group frame is then
    // pivoted to ONE row via the ab_did cell-extraction pattern, so
    // the between/within sums of squares are a fixed explicit
    // expression tree over identical doubles on both engines — no FP
    // aggregation order exists anywhere. Scale shape: one hash
    // aggregate → 3-row pivot; pure codegen at 100 TB.
    q("stat_anova",
      """WITH g AS (SELECT l_returnflag f, count(*)::BIGINT n,
        |             sum(l_quantity::BIGINT)::BIGINT s,
        |             sum(l_quantity::BIGINT * l_quantity::BIGINT)::BIGINT q
        |           FROM lineitem GROUP BY 1),
        |w AS (SELECT
        |        max(n) FILTER (f = 'A') na, max(s) FILTER (f = 'A') sa,
        |        max(q) FILTER (f = 'A') qa,
        |        max(n) FILTER (f = 'N') nb, max(s) FILTER (f = 'N') sb,
        |        max(q) FILTER (f = 'N') qb,
        |        max(n) FILTER (f = 'R') nc, max(s) FILTER (f = 'R') sc,
        |        max(q) FILTER (f = 'R') qc
        |      FROM g),
        |d AS (SELECT (na + nb + nc)::BIGINT n,
        |        ((sa::DOUBLE * sa / na + sb::DOUBLE * sb / nb)
        |          + sc::DOUBLE * sc / nc) cg,
        |        (sa + sb + sc)::DOUBLE t, (qa + qb + qc)::DOUBLE q
        |      FROM w)
        |SELECT n, 3::BIGINT AS k,
        |       round(cg - t * t / n + 1e-9, 4) AS ss_between,
        |       round(q - cg + 1e-9, 4) AS ss_within,
        |       round(((cg - t * t / n) / 2)
        |             / ((q - cg) / (n - 3)) + 1e-9, 6) AS f_stat
        |FROM d""") { c =>
      val y = col("l_quantity").cast("long")
      val g = c.lineitem.groupBy(col("l_returnflag").as("f"))
        .agg(count(lit(1)).as("n"), sum(y).as("s"), sum(y * y).as("q"))
      val cell = (f: String, cn: String) =>
        max(when(col("f") === f, col(cn)))
      val w = g.agg(
        cell("A", "n").as("na"), cell("A", "s").as("sa"),
        cell("A", "q").as("qa"),
        cell("N", "n").as("nb"), cell("N", "s").as("sb"),
        cell("N", "q").as("qb"),
        cell("R", "n").as("nc"), cell("R", "s").as("sc"),
        cell("R", "q").as("qc"))
      val cg = (col("sa").cast("double") * col("sa") / col("na") +
        col("sb").cast("double") * col("sb") / col("nb")) +
        col("sc").cast("double") * col("sc") / col("nc")
      val n = (col("na") + col("nb") + col("nc")).cast("long")
      val t = (col("sa") + col("sb") + col("sc")).cast("double")
      val qq = (col("qa") + col("qb") + col("qc")).cast("double")
      val ssb = cg - t * t / n
      val ssw = qq - cg
      w.select(n.as("n"), lit(3L).as("k"),
        r4(ssb).as("ss_between"), r4(ssw).as("ss_within"),
        r6((ssb / 2) / (ssw / (n - lit(3)))).as("f_stat"))
    },

    // Bot/abuse rate screen (the request-rate heuristics every
    // ingestion pipeline runs before letting events into training
    // data): per user, minimum inter-event gap (lag over the
    // event-time order) and the maximum number of events inside ANY
    // rolling 5-minute window (range frame over epoch seconds — both
    // engines include all peers in range, so duplicate timestamps
    // agree). Flags are pure INTEGER threshold compares. Scale shape:
    // per-key windows + one hash aggregate, no self-join.
    q("events_bot_flags",
      """WITH s AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) sec
        |  FROM events),
        |w AS (SELECT user_id,
        |        sec - lag(sec) OVER (PARTITION BY user_id
        |          ORDER BY sec, event_id) gap,
        |        count(*) OVER (PARTITION BY user_id ORDER BY sec
        |          RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) in5m
        |      FROM s),
        |g AS (SELECT user_id, count(*)::BIGINT n_events,
        |        min(gap)::BIGINT min_gap_s,
        |        max(in5m)::BIGINT max_in_5m
        |      FROM w GROUP BY 1)
        |SELECT user_id, n_events, min_gap_s, max_in_5m,
        |       (min_gap_s <= 1) AS rapid_fire,
        |       (max_in_5m >= 20) AS burst_5m
        |FROM g ORDER BY user_id""") { c =>
      val s = c.events.select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      val lagW = Window.partitionBy("user_id").orderBy("sec", "event_id")
      val rngW = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-300, Window.currentRow)
      val w = s.select(col("user_id"),
        (col("sec") - lag(col("sec"), 1).over(lagW)).as("gap"),
        count(lit(1)).over(rngW).as("in5m"))
      w.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), min(col("gap")).as("min_gap_s"),
          max(col("in5m")).as("max_in_5m"))
        .select(col("user_id"), col("n_events"), col("min_gap_s"),
          col("max_in_5m"),
          (col("min_gap_s") <= 1).as("rapid_fire"),
          (col("max_in_5m") >= 20).as("burst_5m"))
        .orderBy("user_id")
    },

    // Wald–Wolfowitz runs test (1940) for serial randomness: per user,
    // the binary purchase/non-purchase event sequence's run count R vs
    // its null mean μ = 1 + 2·n1·n2/n and variance
    // 2·n1·n2·(2·n1·n2 − n)/(n²(n−1)). All inputs are exact integers
    // (R from a per-key lag compare, n1/n2 plain counts), so z is one
    // fixed expression tree over identical doubles. Scale shape:
    // per-key window lag + one hash aggregate — no global order.
    q("stat_runs_test",
      """WITH s AS (SELECT user_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END b,
        |    CASE WHEN lag(CASE WHEN event_type = 'purchase' THEN 1
        |                       ELSE 0 END) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id)
        |      IS DISTINCT FROM
        |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |    THEN 1 ELSE 0 END brk
        |  FROM events),
        |g AS (SELECT user_id, sum(b)::BIGINT n1,
        |        (count(*) - sum(b))::BIGINT n2,
        |        sum(brk)::BIGINT runs, count(*)::BIGINT n
        |      FROM s GROUP BY 1
        |      HAVING sum(b) > 0 AND count(*) - sum(b) > 0)
        |SELECT user_id, n1, n2, runs,
        |       round((runs - (1 + 2.0 * n1 * n2 / n)) /
        |         sqrt(2.0 * n1 * n2 * (2 * n1 * n2 - n)
        |              / (n * n::DOUBLE * (n - 1))) + 1e-9, 4) AS z
        |FROM g ORDER BY user_id""") { c =>
      val b = when(col("event_type") === "purchase", 1).otherwise(0)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val s = c.events.select(col("user_id"), b.as("b"),
        when(lag(b, 1).over(w).isNull ||
          lag(b, 1).over(w) =!= b, 1).otherwise(0).as("brk"))
      val g = s.groupBy("user_id")
        .agg(sum(col("b")).as("n1"),
          (count(lit(1)) - sum(col("b"))).as("n2"),
          sum(col("brk")).as("runs"), count(lit(1)).as("n"))
        .filter(col("n1") > 0 && col("n2") > 0)
      val mu = lit(1) + lit(2.0) * col("n1") * col("n2") / col("n")
      val vr = lit(2.0) * col("n1") * col("n2") *
        (lit(2) * col("n1") * col("n2") - col("n")) /
        (col("n") * col("n").cast("double") * (col("n") - 1))
      g.select(col("user_id"), col("n1"), col("n2"), col("runs"),
          r4((col("runs") - mu) / sqrt(vr)).as("z"))
        .orderBy("user_id")
    },

    // Restricted mean survival time (Royston & Parmar 2013 — the
    // clinically-preferred KM summary when hazards aren't
    // proportional): area under the stat_kaplan_meier survival curve
    // up to τ = 240 h on the same time-to-first-purchase frame.
    // Each interval term is ROUNDED survival (1e-6 lattice) × an
    // exact integer gap, so every term is exactly representable and
    // the area sum is order-independent; the sequential ln-sum rides
    // the same ordered window as stat_kaplan_meier. One aggregate +
    // event-time-sized window work.
    q("stat_survival_rmst",
      """WITH u AS (SELECT user_id,
        |      min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) e0,
        |      min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
        |        FILTER (event_type = 'purchase') ep,
        |      max(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) ez
        |    FROM events GROUP BY 1),
        |d AS (SELECT
        |        CAST(floor((coalesce(ep, ez) - e0) / 3600.0) AS BIGINT)
        |          dur_h,
        |        CASE WHEN ep IS NOT NULL THEN 1 ELSE 0 END obs FROM u),
        |h AS (SELECT dur_h, sum(obs) d, count(*) w FROM d GROUP BY 1),
        |n AS (SELECT sum(w) nt FROM h),
        |c AS (SELECT dur_h, d, w,
        |             coalesce(sum(w) OVER (ORDER BY dur_h
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) cum
        |      FROM h),
        |s AS (SELECT dur_h, d, (n.nt - cum) at_risk,
        |             CASE WHEN d < n.nt - cum
        |                  THEN ln(1 - d * 1.0 / (n.nt - cum)) END term
        |      FROM c, n),
        |k AS (SELECT dur_h,
        |             round(CASE WHEN term IS NULL THEN 0.0
        |                  ELSE exp(sum(term) OVER (ORDER BY dur_h)) END
        |               + 1e-9, 6) surv
        |      FROM s),
        |iv AS (SELECT dur_h, surv,
        |         lead(dur_h, 1, 240) OVER (ORDER BY dur_h) nxt
        |       FROM k WHERE dur_h < 240),
        |a AS (SELECT min(dur_h) t1,
        |        sum(surv * (least(nxt, 240) - dur_h))
        |          FILTER (nxt > dur_h) area
        |      FROM iv)
        |SELECT 240::BIGINT AS tau_hours, n.nt::BIGINT AS n_users,
        |       round(least(a.t1, 240) + a.area + 1e-9, 4) AS rmst_hours
        |FROM a, n""") { c =>
      val u = c.events.groupBy("user_id").agg(
        expr("unix_timestamp(min(ts))").as("e0"),
        expr(
          "unix_timestamp(min(CASE WHEN event_type = 'purchase' THEN ts END))")
          .as("ep"),
        expr("unix_timestamp(max(ts))").as("ez"))
      val d = u.select(
        floor((coalesce(col("ep"), col("ez")) - col("e0")) / 3600.0)
          .cast("long").as("dur_h"),
        when(col("ep").isNotNull, 1L).otherwise(0L).as("obs"))
      val h = d.groupBy("dur_h")
        .agg(sum(col("obs")).as("d"), count(lit(1)).as("w"))
      val nt = h.agg(sum(col("w")).as("nt"))
      val wOrd = Window.orderBy("dur_h")
      val cum = h.withColumn("cum",
        coalesce(sum(col("w")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val s = cum.crossJoin(broadcast(nt))
        .withColumn("at_risk", col("nt") - col("cum"))
        .withColumn("term",
          when(col("d") < col("at_risk"),
            log(lit(1) - col("d") * lit(1.0) / col("at_risk"))))
      val k = s.select(col("dur_h"),
        r6(when(col("term").isNull, 0.0)
          .otherwise(exp(sum(col("term")).over(wOrd)))).as("surv"))
      val iv = k.filter(col("dur_h") < 240)
        .withColumn("nxt", lead(col("dur_h"), 1, 240).over(wOrd))
      val a = iv.agg(min(col("dur_h")).as("t1"),
        sum(when(col("nxt") > col("dur_h"),
          col("surv") * (least(col("nxt"), lit(240)) - col("dur_h"))))
          .as("area"))
      a.crossJoin(broadcast(nt))
        .select(lit(240L).as("tau_hours"), col("nt").as("n_users"),
          r4(least(col("t1"), lit(240)) + col("area")).as("rmst_hours"))
    },

    // Two-model (T-learner) uplift readout (Künzel et al. 2019's
    // baseline meta-learner — the causal family beside ab_cuped and
    // ab_did): per arm, a closed-form simple OLS of purchase cents on
    // view count from EXACT integer moments (n, Σx, Σy, Σxy, Σx² all
    // BIGINT), pivoted to one row by cell extraction; the uplift curve
    // τ̂(x) = f_t(x) − f_c(x) is evaluated at x ∈ {5, 10, 20}. No FP
    // aggregation anywhere — slopes/intercepts/uplifts are one fixed
    // double tree. Scale: one per-user aggregate → one 2-row pivot.
    q("ab_uplift_tlearner",
      """WITH u AS (SELECT user_id, user_id % 2 arm,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT x,
        |    sum(CASE WHEN event_type = 'purchase' THEN
        |          CAST(round(value * 100 + 1e-9) AS BIGINT)
        |        ELSE 0 END)::BIGINT y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, count(*)::BIGINT n, sum(x)::BIGINT sx,
        |        sum(y)::BIGINT sy, sum(x * y)::BIGINT sxy,
        |        sum(x * x)::BIGINT sxx
        |      FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(n) FILTER (arm = 1) nt, max(sx) FILTER (arm = 1) sxt,
        |    max(sy) FILTER (arm = 1) syt, max(sxy) FILTER (arm = 1) sxyt,
        |    max(sxx) FILTER (arm = 1) sxxt,
        |    max(n) FILTER (arm = 0) nc, max(sx) FILTER (arm = 0) sxc,
        |    max(sy) FILTER (arm = 0) syc, max(sxy) FILTER (arm = 0) sxyc,
        |    max(sxx) FILTER (arm = 0) sxxc
        |  FROM g),
        |d AS (SELECT nt, nc,
        |        (nt * sxyt - sxt::DOUBLE * syt)
        |          / (nt * sxxt - sxt::DOUBLE * sxt) bt,
        |        (nc * sxyc - sxc::DOUBLE * syc)
        |          / (nc * sxxc - sxc::DOUBLE * sxc) bc,
        |        sxt, syt, sxc, syc
        |      FROM w),
        |e AS (SELECT nt, nc, bt, bc,
        |        (syt - bt * sxt) / nt att, (syc - bc * sxc) / nc acc
        |      FROM d)
        |SELECT nt AS n_treat, nc AS n_control,
        |       round(bt / 100 + 1e-9, 6) AS slope_treat,
        |       round(bc / 100 + 1e-9, 6) AS slope_control,
        |       round((att + bt * 5 - (acc + bc * 5)) / 100 + 1e-9, 4)
        |         AS uplift_at_5,
        |       round((att + bt * 10 - (acc + bc * 10)) / 100 + 1e-9, 4)
        |         AS uplift_at_10,
        |       round((att + bt * 20 - (acc + bc * 20)) / 100 + 1e-9, 4)
        |         AS uplift_at_20
        |FROM e""") { c =>
      val u = c.events.groupBy(col("user_id"),
          (col("user_id") % 2).as("arm"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100 + lit(1e-9)).cast("long"))
            .otherwise(0L)).as("y"))
      val g = u.groupBy("arm").agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val cell = (a: Int, cn: String) =>
        max(when(col("arm") === a, col(cn)))
      val w = g.agg(
        cell(1, "n").as("nt"), cell(1, "sx").as("sxt"),
        cell(1, "sy").as("syt"), cell(1, "sxy").as("sxyt"),
        cell(1, "sxx").as("sxxt"),
        cell(0, "n").as("nc"), cell(0, "sx").as("sxc"),
        cell(0, "sy").as("syc"), cell(0, "sxy").as("sxyc"),
        cell(0, "sxx").as("sxxc"))
      val bt = (col("nt") * col("sxyt") -
        col("sxt").cast("double") * col("syt")) /
        (col("nt") * col("sxxt") - col("sxt").cast("double") * col("sxt"))
      val bc = (col("nc") * col("sxyc") -
        col("sxc").cast("double") * col("syc")) /
        (col("nc") * col("sxxc") - col("sxc").cast("double") * col("sxc"))
      val att = (col("syt") - bt * col("sxt")) / col("nt")
      val acc = (col("syc") - bc * col("sxc")) / col("nc")
      def upliftAt(x: Int) =
        r4((att + bt * x - (acc + bc * x)) / 100)
      w.select(col("nt").as("n_treat"), col("nc").as("n_control"),
        r6(bt / 100).as("slope_treat"), r6(bc / 100).as("slope_control"),
        upliftAt(5).as("uplift_at_5"), upliftAt(10).as("uplift_at_10"),
        upliftAt(20).as("uplift_at_20"))
    },

    // Standardized effect sizes for the two-arm experiment (the
    // companion readout to stat_ab_ttest's p-value — Cohen's d,
    // Hedges' g small-sample correction, and the NON-parametric
    // Cliff's delta): d and g come from exact per-arm integer moments
    // (cents lattice); Cliff's δ = (#(x₁>x₀) − #(x₁<x₀))/(n₁n₀) is
    // counted EXACTLY via per-value histograms + Positional cumsums
    // (Σ c₁(v)·C₀_<(v) — never an n₁×n₀ pair join). Scale: one value
    // histogram, one distributed cumsum, one broadcast pivot.
    q("ab_effect_size",
      """WITH p AS (SELECT user_id % 2 arm,
        |    CAST(round(value * 100 + 1e-9) AS BIGINT) v
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT v, count(*) FILTER (arm = 1)::BIGINT c1,
        |        count(*) FILTER (arm = 0)::BIGINT c0
        |      FROM p GROUP BY 1),
        |cu AS (SELECT v, c1, c0,
        |        coalesce(sum(c1) OVER (ORDER BY v ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0) c1lt,
        |        coalesce(sum(c0) OVER (ORDER BY v ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0) c0lt
        |      FROM h),
        |cd AS (SELECT sum(c1 * c0lt)::BIGINT gt,
        |         sum(c0 * c1lt)::BIGINT lt FROM cu),
        |m AS (SELECT count(*) FILTER (arm = 1)::BIGINT n1,
        |        sum(v) FILTER (arm = 1)::BIGINT s1,
        |        (sum(v::HUGEINT * v) FILTER (arm = 1))::DOUBLE q1,
        |        count(*) FILTER (arm = 0)::BIGINT n0,
        |        sum(v) FILTER (arm = 0)::BIGINT s0,
        |        (sum(v::HUGEINT * v) FILTER (arm = 0))::DOUBLE q0
        |      FROM p),
        |d AS (SELECT n1, n0, gt, lt,
        |        (s1::DOUBLE / n1 - s0::DOUBLE / n0) / 100 diff,
        |        sqrt(((q1 - s1::DOUBLE * s1 / n1)
        |              + (q0 - s0::DOUBLE * s0 / n0))
        |             / (n1 + n0 - 2)) / 100 sp
        |      FROM m, cd)
        |SELECT n1, n0,
        |       round(diff / sp + 1e-9, 4) AS cohens_d,
        |       round(diff / sp * (1 - 3.0 / (4 * (n1 + n0) - 9))
        |             + 1e-9, 4) AS hedges_g,
        |       round((gt - lt)::DOUBLE / (n1::DOUBLE * n0) + 1e-9, 6)
        |         AS cliffs_delta
        |FROM d""") { c =>
      val p = c.events.filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("v"))
      val h = p.groupBy("v").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"))
      val cu = graft.ops.Positional.withCumSums(h, Seq(col("v")),
        Seq(col("c1") -> "c1lt", col("c0") -> "c0lt"))
      val cd = cu.agg(sum(col("c1") * col("c0lt")).as("gt"),
        sum(col("c0") * col("c1lt")).as("lt"))
      val m = p.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("v")).otherwise(0L)).as("s1"),
        sum(when(col("arm") === 1,
          col("v").cast("decimal(38,0)") * col("v"))).cast("double")
          .as("q1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("v")).otherwise(0L)).as("s0"),
        sum(when(col("arm") === 0,
          col("v").cast("decimal(38,0)") * col("v"))).cast("double")
          .as("q0"))
      val diff = (col("s1").cast("double") / col("n1") -
        col("s0").cast("double") / col("n0")) / 100
      val sp = sqrt(((col("q1") -
        col("s1").cast("double") * col("s1") / col("n1")) +
        (col("q0") - col("s0").cast("double") * col("s0") / col("n0"))) /
        (col("n1") + col("n0") - 2)) / 100
      m.crossJoin(broadcast(cd))
        .select(col("n1"), col("n0"),
          r4(diff / sp).as("cohens_d"),
          r4(diff / sp * (lit(1) - lit(3.0) /
            (lit(4) * (col("n1") + col("n0")) - 9))).as("hedges_g"),
          r6((col("gt") - col("lt")).cast("double") /
            (col("n1").cast("double") * col("n0"))).as("cliffs_delta"))
    },

    // Kruskal–Wallis H (1952 — the rank-based k-group test beside
    // stat_anova's parametric F and stat_mannwhitney's 2-group U):
    // quantity ranks across the three return-flag groups with midrank
    // ties. Exactness device: DOUBLED midranks 2r = 2·c_lt + t + 1 are
    // exact BIGINTs (c_lt = count below, t = tie size), so every group
    // rank-sum is an exact integer and H + the tie correction are one
    // fixed double tree over the 3-group cell-extracted pivot.
    // Cumulative counts ride Positional's distributed cumsum — no
    // single-task global ranking at 100 TB.
    q("stat_kruskal_wallis",
      """WITH vg AS (SELECT l_quantity v, l_returnflag f,
        |              count(*)::BIGINT cgv
        |            FROM lineitem GROUP BY 1, 2),
        |vc AS (SELECT v, sum(cgv)::BIGINT t FROM vg GROUP BY 1),
        |cu AS (SELECT v, t, coalesce(sum(t) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          c_lt
        |       FROM vc),
        |r AS (SELECT cu.v, vg.f, vg.cgv,
        |        (2 * cu.c_lt + cu.t + 1) r2 FROM cu
        |      JOIN vg ON cu.v = vg.v),
        |g AS (SELECT f, sum(cgv * r2)::BIGINT sr2,
        |        sum(cgv)::BIGINT ng FROM r GROUP BY 1),
        |w AS (SELECT
        |    max(sr2) FILTER (f = 'A') ra, max(ng) FILTER (f = 'A') na,
        |    max(sr2) FILTER (f = 'N') rb, max(ng) FILTER (f = 'N') nb,
        |    max(sr2) FILTER (f = 'R') rc, max(ng) FILTER (f = 'R') nc
        |  FROM g),
        |tc AS (SELECT (sum(t::HUGEINT * t * t - t))::DOUBLE st
        |       FROM vc),
        |d AS (SELECT (na + nb + nc)::BIGINT n,
        |        ((ra::DOUBLE * ra / na + rb::DOUBLE * rb / nb)
        |          + rc::DOUBLE * rc / nc) s4, na, nb, nc, st
        |      FROM w, tc),
        |h AS (SELECT n, na, nb, nc, st,
        |        3.0 / (n * (n + 1.0)) * s4 - 3 * (n + 1.0) hh
        |      FROM d)
        |SELECT n, na, nb, nc, round(hh + 1e-9, 4) AS h,
        |       round(hh / (1 - st / (n::DOUBLE * n * n - n)) + 1e-9, 4)
        |         AS h_corrected
        |FROM h""") { c =>
      val vg = c.lineitem
        .groupBy(col("l_quantity").as("v"), col("l_returnflag").as("f"))
        .agg(count(lit(1)).as("cgv"))
      val vc = vg.groupBy("v").agg(sum(col("cgv")).as("t"))
      val cu = graft.ops.Positional.withCumSums(vc, Seq(col("v")),
        Seq(col("t") -> "c_lt"))
      val r = cu.join(vg, Seq("v"))
        .select(col("f"), col("cgv"),
          (lit(2) * col("c_lt") + col("t") + 1).as("r2"))
      val g = r.groupBy("f").agg(sum(col("cgv") * col("r2")).as("sr2"),
        sum(col("cgv")).as("ng"))
      val cell = (f: String, cn: String) =>
        max(when(col("f") === f, col(cn)))
      val w = g.agg(
        cell("A", "sr2").as("ra"), cell("A", "ng").as("na"),
        cell("N", "sr2").as("rb"), cell("N", "ng").as("nb"),
        cell("R", "sr2").as("rc"), cell("R", "ng").as("nc"))
      val tc = vc.agg(
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") -
          col("t")).cast("double").as("st"))
      val n = (col("na") + col("nb") + col("nc")).cast("long")
      val s4 = (col("ra").cast("double") * col("ra") / col("na") +
        col("rb").cast("double") * col("rb") / col("nb")) +
        col("rc").cast("double") * col("rc") / col("nc")
      val hh = lit(3.0) / (n * (n + lit(1.0))) * s4 -
        lit(3) * (n + lit(1.0))
      w.crossJoin(broadcast(tc))
        .select(n.as("n"), col("na"), col("nb"), col("nc"),
          r4(hh).as("h"),
          r4(hh / (lit(1) - col("st") /
            (n.cast("double") * n * n - n))).as("h_corrected"))
    },

    // Two-sample Cramér–von Mises (Anderson 1962) — the L² distance
    // between the two arms' ECDFs, the whole-distribution companion
    // of the sup-norm KS test (stat_ks_2sample): T = nm/(n+m)² ·
    // Σ_pooled (F_n(x) − G_m(x))², summed over every pooled
    // observation with multiplicity — well-defined under ties via the
    // ECDF form. Computed EXACTLY from the integer value histogram:
    // inclusive per-arm cumulative counts ride ONE distributed
    // bucketed cumsum (Positional.withCumSums — no single-partition
    // window), each pooled term is the integer
    // (a+b)·(cumA·m − cumB·n)², accumulated as DECIMAL(38) (≈1e27 at
    // 1e6 rows — headroom to 1e38), and the single division happens
    // once at read time.
    q("stat_cramer_von_mises",
      """WITH b AS (SELECT CAST(round(value * 100 + 1e-9) AS BIGINT) v,
        |             user_id % 2 arm FROM events),
        |h AS (SELECT v, count(*) FILTER (arm = 0)::BIGINT a,
        |        count(*) FILTER (arm = 1)::BIGINT bb
        |      FROM b GROUP BY 1),
        |cu AS (SELECT v, a, bb,
        |         sum(a) OVER w ca, sum(bb) OVER w cb
        |       FROM h WINDOW w AS (ORDER BY v
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |nn AS (SELECT sum(a)::BIGINT n, sum(bb)::BIGINT m FROM h),
        |u AS (SELECT sum((a + bb)::HUGEINT
        |        * (ca * nn.m - cb * nn.n)
        |        * (ca * nn.m - cb * nn.n))::DOUBLE su
        |      FROM cu, nn)
        |SELECT nn.n, nn.m,
        |  round(su / (nn.n::DOUBLE * nn.m * (nn.n + nn.m)
        |              * (nn.n + nn.m)) + 1e-9, 6) AS t_cvm
        |FROM u, nn""") { c =>
      val b = c.events.select(
        expr("CAST(round(value * 100 + 1e-9) AS BIGINT)").as("v"),
        (col("user_id") % 2).as("arm"))
      val h = b.groupBy("v").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("bb"))
      val cuEx = graft.ops.Positional.withCumSums(h, Seq(col("v")),
        Seq(col("a") -> "ca_ex", col("bb") -> "cb_ex"))
      val cu = cuEx.select(col("a"), col("bb"),
        (col("ca_ex") + col("a")).as("ca"),
        (col("cb_ex") + col("bb")).as("cb"))
      val nn = h.agg(sum(col("a")).as("n"), sum(col("bb")).as("m"))
      val d = (col("ca") * col("m") - col("cb") * col("n"))
        .cast("decimal(38,0)")
      val u = cu.crossJoin(broadcast(nn))
        .agg(sum((col("a") + col("bb")).cast("decimal(38,0)") * d * d)
          .cast("double").as("su"))
      u.crossJoin(broadcast(nn))
        .select(col("n"), col("m"),
          r6(col("su") / (col("n").cast("double") * col("m") *
            (col("n") + col("m")) * (col("n") + col("m"))))
            .as("t_cvm"))
    },

    // Jonckheere–Terpstra trend test (Jonckheere 1954, Terpstra 1952)
    // — the ORDERED-alternative sibling of Kruskal–Wallis: is there a
    // monotone trend in order value across the five (lexically
    // ordered) order-priority classes? J = Σ_{i<j} U_ij, each U_ij
    // the Mann-Whitney count of (group-i, group-j) pairs with
    // x < y (+½ per tie). Computed EXACTLY at scale on the integer
    // value HISTOGRAM (whole dollars): the (value × 5 groups) lattice
    // carries per-group strictly-below cumulative counts (5-partition
    // window over the DOMAIN-bounded histogram, never the corpus —
    // the grouped-median stance), and the doubled statistic
    // 2J = Σ_v Σ_{i<j} 2·cnt_j(v)·below_i(v) + cnt_j(v)·cnt_i(v)
    // is a plain integer sum. Null mean and the TIE-CORRECTED
    // variance (Lehmann 1975 §5.2) are closed forms of exact integer
    // sums (n ≤ ~1e6 keeps n(n−1)(2n+5) Long-safe; the three
    // correction products combine as doubles — the Stump pattern).
    q("stat_jonckheere",
      """WITH b AS (SELECT o_orderpriority f,
        |    CAST(round(o_totalprice + 1e-9) AS BIGINT) v FROM orders),
        |vg AS (SELECT f, v, count(*)::BIGINT cgv FROM b GROUP BY 1, 2),
        |vc AS (SELECT v, sum(cgv)::BIGINT t FROM vg GROUP BY 1),
        |gs AS (SELECT DISTINCT f FROM vg),
        |lat AS (SELECT gs.f, vc.v, coalesce(vg.cgv, 0)::BIGINT cnt
        |        FROM vc CROSS JOIN gs
        |        LEFT JOIN vg ON vg.f = gs.f AND vg.v = vc.v),
        |cu AS (SELECT f, v, cnt,
        |         coalesce(sum(cnt) OVER (PARTITION BY f ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0)::BIGINT below
        |       FROM lat),
        |tj AS (SELECT sum(2 * j.cnt * i.below
        |                  + j.cnt * i.cnt)::BIGINT two_j
        |       FROM cu j JOIN cu i ON i.v = j.v AND i.f < j.f),
        |gn AS (SELECT f, sum(cgv)::BIGINT ng FROM vg GROUP BY 1),
        |agg AS (SELECT sum(ng)::BIGINT n,
        |          sum(ng * ng)::BIGINT sn2,
        |          sum(ng * (ng - 1) * (2 * ng + 5))::BIGINT sg25,
        |          sum(ng * (ng - 1))::BIGINT sg2,
        |          sum(ng * (ng - 1) * (ng - 2))::BIGINT sg3
        |        FROM gn),
        |tv AS (SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT st25,
        |          sum(t * (t - 1))::BIGINT st2,
        |          sum(t * (t - 1) * (t - 2))::BIGINT st3
        |       FROM vc),
        |z AS (SELECT n, two_j,
        |        (n::DOUBLE * n - sn2) / 2 two_mean,
        |        (n::DOUBLE * (n - 1) * (2 * n + 5) - sg25 - st25) / 72
        |          + sg3::DOUBLE * st3
        |            / (36.0 * n * (n - 1) * (n - 2))
        |          + sg2::DOUBLE * st2 / (8.0 * n * (n - 1)) var
        |      FROM agg, tj, tv)
        |SELECT n, two_j, round(two_mean / 2 + 1e-9, 4) AS mean_j,
        |       round(var + 1e-9, 4) AS var_j,
        |       round((two_j - two_mean) / (2 * sqrt(var)) + 1e-9, 4)
        |         AS z
        |FROM z""") { c =>
      import org.apache.spark.sql.expressions.Window
      val b = c.orders.select(col("o_orderpriority").as("f"),
        expr("CAST(round(o_totalprice + 1e-9) AS BIGINT)").as("v"))
      val vg = b.groupBy("f", "v").agg(count(lit(1)).as("cgv"))
      val vc = vg.groupBy("v").agg(sum(col("cgv")).as("t"))
      val gs = vg.select("f").distinct() // 5-row aggregate
      val lat = vc.crossJoin(broadcast(gs))
        .join(vg, Seq("f", "v"), "left")
        .select(col("f"), col("v"),
          coalesce(col("cgv"), lit(0L)).as("cnt"))
      // 5-partition window over the dollar-domain histogram lattice
      val wf = Window.partitionBy("f").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cu = lat.select(col("f"), col("v"), col("cnt"),
        coalesce(sum(col("cnt")).over(wf), lit(0L)).as("below"))
      val tj = cu.as("j")
        .join(cu.as("i"),
          col("i.v") === col("j.v") && col("i.f") < col("j.f"))
        .agg(sum(lit(2) * col("j.cnt") * col("i.below") +
          col("j.cnt") * col("i.cnt")).as("two_j"))
      val gn = vg.groupBy("f").agg(sum(col("cgv")).as("ng"))
      val agg = gn.agg(sum(col("ng")).as("n"),
        sum(col("ng") * col("ng")).as("sn2"),
        sum(col("ng") * (col("ng") - 1) * (lit(2) * col("ng") + 5))
          .as("sg25"),
        sum(col("ng") * (col("ng") - 1)).as("sg2"),
        sum(col("ng") * (col("ng") - 1) * (col("ng") - 2)).as("sg3"))
      val tv = vc.agg(
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("st25"),
        sum(col("t") * (col("t") - 1)).as("st2"),
        sum(col("t") * (col("t") - 1) * (col("t") - 2)).as("st3"))
      val nD = col("n").cast("double")
      val twoMean = (nD * col("n") - col("sn2")) / 2
      val varJ = (nD * (col("n") - 1) * (lit(2) * col("n") + 5) -
          col("sg25") - col("st25")) / 72 +
        col("sg3").cast("double") * col("st3") /
          (lit(36.0) * col("n") * (col("n") - 1) * (col("n") - 2)) +
        col("sg2").cast("double") * col("st2") /
          (lit(8.0) * col("n") * (col("n") - 1))
      agg.crossJoin(broadcast(tj)).crossJoin(broadcast(tv))
        .select(col("n"), col("two_j"),
          r4(twoMean / 2).as("mean_j"), r4(varJ).as("var_j"),
          r4((col("two_j") - twoMean) / (lit(2) * sqrt(varJ))).as("z"))
    },

    // Dunn's post-hoc pairwise test (Dunn 1964) — the step EVERY
    // Kruskal–Wallis consumer takes next: WHICH groups differ, by
    // tie-corrected pairwise z on the same doubled-midrank machinery
    // (z_ij = (R̄i − R̄j)/√(V·(1/nᵢ+1/nⱼ)), V = N(N+1)/12 −
    // Σ(t³−t)/(12(N−1))). Group rank-sums are exact BIGINTs from the
    // shared distributed-cumsum rank pass; each z is one fixed double
    // tree over exact integers. The pair walk runs on the k-row group
    // relation — never the corpus.
    q("stat_dunn",
      """WITH vg AS (SELECT l_quantity v, l_returnflag f,
        |              count(*)::BIGINT cgv
        |            FROM lineitem GROUP BY 1, 2),
        |vc AS (SELECT v, sum(cgv)::BIGINT t FROM vg GROUP BY 1),
        |cu AS (SELECT v, t, coalesce(sum(t) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          c_lt
        |       FROM vc),
        |r AS (SELECT cu.v, vg.f, vg.cgv,
        |        (2 * cu.c_lt + cu.t + 1) r2 FROM cu
        |      JOIN vg ON cu.v = vg.v),
        |g AS (SELECT f, sum(cgv * r2)::BIGINT sr2,
        |        sum(cgv)::BIGINT ng FROM r GROUP BY 1),
        |tc AS (SELECT (sum(t::HUGEINT * t * t - t))::DOUBLE st
        |       FROM vc),
        |nn AS (SELECT sum(ng)::BIGINT n FROM g),
        |pr AS (SELECT a.f g1, b.f g2, a.ng n1, b.ng n2,
        |         a.sr2 s1, b.sr2 s2
        |       FROM g a JOIN g b ON a.f < b.f)
        |SELECT g1, g2, n1, n2,
        |  round(s1 / (2.0 * n1) + 1e-9, 4) AS mean_rank_1,
        |  round(s2 / (2.0 * n2) + 1e-9, 4) AS mean_rank_2,
        |  round((s1 / (2.0 * n1) - s2 / (2.0 * n2))
        |        / sqrt((n * (n + 1.0) / 12 - st / (12.0 * (n - 1)))
        |               * (1.0 / n1 + 1.0 / n2)) + 1e-9, 4) AS z
        |FROM pr, nn, tc ORDER BY g1, g2""") { c =>
      val vg = c.lineitem
        .groupBy(col("l_quantity").as("v"), col("l_returnflag").as("f"))
        .agg(count(lit(1)).as("cgv"))
      val vc = vg.groupBy("v").agg(sum(col("cgv")).as("t"))
      val cu = graft.ops.Positional.withCumSums(vc, Seq(col("v")),
        Seq(col("t") -> "c_lt"))
      val r = cu.join(vg, Seq("v"))
        .select(col("f"), col("cgv"),
          (lit(2) * col("c_lt") + col("t") + 1).as("r2"))
      val g = r.groupBy("f").agg(sum(col("cgv") * col("r2")).as("sr2"),
        sum(col("cgv")).as("ng"))
      val tc = vc.agg(
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") -
          col("t")).cast("double").as("st"))
      val nn = g.agg(sum(col("ng")).as("n"))
      val pr = g.as("a")
        .join(broadcast(g.as("b")), col("a.f") < col("b.f"))
        .select(col("a.f").as("g1"), col("b.f").as("g2"),
          col("a.ng").as("n1"), col("b.ng").as("n2"),
          col("a.sr2").as("s1"), col("b.sr2").as("s2"))
      val mr1 = col("s1") / (lit(2.0) * col("n1"))
      val mr2 = col("s2") / (lit(2.0) * col("n2"))
      pr.crossJoin(broadcast(nn)).crossJoin(broadcast(tc))
        .select(col("g1"), col("g2"), col("n1"), col("n2"),
          r4(mr1).as("mean_rank_1"), r4(mr2).as("mean_rank_2"),
          r4((mr1 - mr2) /
            sqrt((col("n") * (col("n") + lit(1.0)) / 12 -
              col("st") / (lit(12.0) * (col("n") - 1))) *
              (lit(1.0) / col("n1") + lit(1.0) / col("n2")))).as("z"))
        .orderBy("g1", "g2")
    },

    // Jarque–Bera normality test (1980 — the skewness/kurtosis
    // moment screen): JB = n/6·(S² + K²/4) on order-value cents.
    // The four raw power sums Σc..Σc⁴ are EXACT DECIMAL(38)/HUGEINT
    // integers (c⁴ ≤ ~6e30, sums < 1e38), and every central moment,
    // S, K and JB come from ONE fixed double expression tree over
    // those five exact values — no FP aggregation anywhere. One
    // corpus aggregation; pure codegen at 100 TB.
    q("stat_jarque_bera",
      """WITH b AS (SELECT CAST(round(o_totalprice * 100 + 1e-9)
        |                    AS BIGINT) c FROM orders),
        |m AS (SELECT count(*)::BIGINT n, (sum(c::HUGEINT))::DOUBLE s1,
        |        (sum(c::HUGEINT * c))::DOUBLE s2,
        |        (sum(c::HUGEINT * c * c))::DOUBLE s3,
        |        (sum(c::HUGEINT * c * c * c))::DOUBLE s4
        |      FROM b),
        |d AS (SELECT n, s1 / n mu, s2, s3, s4 FROM m),
        |e AS (SELECT n, mu, s2 / n - mu * mu m2,
        |        s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu m3,
        |        s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
        |          - 3 * mu * mu * mu * mu m4
        |      FROM d),
        |f AS (SELECT n, m3 / (m2 * sqrt(m2)) skew,
        |        m4 / (m2 * m2) - 3 kurt FROM e)
        |SELECT n, round(skew + 1e-9, 6) AS skewness,
        |       round(kurt + 1e-9, 6) AS excess_kurtosis,
        |       round(n / 6.0 * (skew * skew + kurt * kurt / 4)
        |             + 1e-9, 4) AS jb
        |FROM f""") { c =>
      val b = c.orders.select(
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long").as("c"))
      val cd = col("c").cast("decimal(38,0)")
      val m = b.agg(count(lit(1)).as("n"),
        sum(cd).cast("double").as("s1"),
        sum(cd * col("c")).cast("double").as("s2"),
        sum(cd * col("c") * col("c")).cast("double").as("s3"),
        sum(cd * col("c") * col("c") * col("c")).cast("double").as("s4"))
      val mu = col("s1") / col("n")
      val m2 = col("s2") / col("n") - mu * mu
      val m3 = col("s3") / col("n") - lit(3) * mu * (col("s2") / col("n")) +
        lit(2) * mu * mu * mu
      val m4 = col("s4") / col("n") - lit(4) * mu * (col("s3") / col("n")) +
        lit(6) * mu * mu * (col("s2") / col("n")) -
        lit(3) * mu * mu * mu * mu
      val skew = m3 / (m2 * sqrt(m2))
      val kurt = m4 / (m2 * m2) - 3
      m.select(col("n"), r6(skew).as("skewness"),
        r6(kurt).as("excess_kurtosis"),
        r4(col("n") / lit(6.0) * (skew * skew + kurt * kurt / 4))
          .as("jb"))
    },

    // Log-rank test (Mantel 1966 / Peto & Peto 1972 — THE two-sample
    // survival comparison beside stat_kaplan_meier's curves and
    // ml_nelson_aalen's hazards): arms by user parity on
    // time-to-first-error, right-censored at last activity. Per event
    // time, O₁ = d₁ (exact integer), E₁ = n₁·d/n by PURE integer
    // half-up division to 1e-9 units (the Nelson–Aalen device), and
    // the hypergeometric variance quantized per row from a fixed
    // double tree (magnitudes ≤ ~13, so the 1e-3 nudge dwarfs the
    // ulp). Risk counts ride Positional's distributed cumsums; the
    // statistic is one double tree over three exact integer sums.
    q("stat_logrank",
      """WITH pe AS (SELECT user_id, user_id % 2 arm,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) t0,
        |    CAST(floor(epoch(min(ts) FILTER (event_type = 'error')))
        |      AS BIGINT) terr,
        |    CAST(floor(epoch(max(ts))) AS BIGINT) tlast
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT arm,
        |        CASE WHEN terr IS NOT NULL THEN (terr - t0) // 3600
        |             ELSE (tlast - t0) // 3600 END t,
        |        terr IS NOT NULL AS ev FROM pe),
        |d AS (SELECT t, count(*) FILTER (ev)::BIGINT d,
        |        count(*) FILTER (ev AND arm = 1)::BIGINT d1,
        |        count(*)::BIGINT ended,
        |        count(*) FILTER (arm = 1)::BIGINT ended1
        |      FROM u GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT nu,
        |          count(*) FILTER (arm = 1)::BIGINT nu1 FROM u),
        |cc AS (SELECT t, d, d1, nu
        |         - coalesce(sum(ended) OVER (ORDER BY t ROWS BETWEEN
        |             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) n,
        |         nu1
        |         - coalesce(sum(ended1) OVER (ORDER BY t ROWS BETWEEN
        |             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) n1
        |      FROM d, tot),
        |k AS (SELECT d1,
        |        (2 * n1 * d * 1000000000 + n) // (2 * n) eq,
        |        CAST(round((d::DOUBLE * n1 * (n - n1) * (n - d))
        |               / (n::DOUBLE * n * (n - 1)) * 1000000000
        |             + 1e-3) AS BIGINT) vq
        |      FROM cc WHERE d > 0 AND n > 1),
        |f AS (SELECT sum(d1)::BIGINT o1, sum(eq)::BIGINT se,
        |        sum(vq)::BIGINT sv FROM k),
        |t2 AS (SELECT nu, nu1 FROM tot)
        |SELECT (t2.nu - t2.nu1) AS n_arm0, t2.nu1 AS n_arm1, f.o1,
        |       round(f.se / 1e9 + 1e-9, 4) AS e1,
        |       round(f.sv / 1e9 + 1e-9, 4) AS variance,
        |       round((f.o1 - f.se / 1e9) * (f.o1 - f.se / 1e9)
        |             / (f.sv / 1e9) + 1e-9, 4) AS chi2
        |FROM f, t2""") { c =>
      val pe = c.events.groupBy(col("user_id"),
          (col("user_id") % 2).as("arm"))
        .agg(expr("unix_timestamp(min(ts))").as("t0"),
          expr(
            "unix_timestamp(min(CASE WHEN event_type = 'error' THEN ts END))")
            .as("terr"),
          expr("unix_timestamp(max(ts))").as("tlast"))
      val u = pe.select(col("arm"),
        when(col("terr").isNotNull,
          floor((col("terr") - col("t0")) / 3600))
          .otherwise(floor((col("tlast") - col("t0")) / 3600))
          .cast("long").as("t"),
        col("terr").isNotNull.as("ev"))
      val d = u.groupBy("t").agg(
        sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
        sum(when(col("ev") && col("arm") === 1, 1L).otherwise(0L))
          .as("d1"),
        count(lit(1)).as("ended"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("ended1"))
      val tot = u.agg(count(lit(1)).as("nu"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nu1"))
      val cum = graft.ops.Positional.withCumSums(d, Seq(col("t")),
        Seq(col("ended") -> "ended_lt", col("ended1") -> "ended1_lt"))
      val cc = cum.crossJoin(broadcast(tot))
        .withColumn("n", col("nu") - col("ended_lt"))
        .withColumn("n1", col("nu1") - col("ended1_lt"))
        .filter(col("d") > 0 && col("n") > 1)
      val vDbl = (col("d").cast("double") * col("n1") *
        (col("n") - col("n1")) * (col("n") - col("d"))) /
        (col("n").cast("double") * col("n") * (col("n") - 1))
      val k = cc.select(col("d1"),
        expr("(2 * n1 * d * 1000000000L + n) div (2 * n)").as("eq"),
        round(vDbl * 1000000000 + lit(1e-3)).cast("long").as("vq"))
      val f = k.agg(sum(col("d1")).as("o1"), sum(col("eq")).as("se"),
        sum(col("vq")).as("sv"))
      f.crossJoin(broadcast(tot))
        .select((col("nu") - col("nu1")).as("n_arm0"),
          col("nu1").as("n_arm1"), col("o1"),
          r4(col("se") / lit(1e9)).as("e1"),
          r4(col("sv") / lit(1e9)).as("variance"),
          r4((col("o1") - col("se") / lit(1e9)) *
            (col("o1") - col("se") / lit(1e9)) /
            (col("sv") / lit(1e9))).as("chi2"))
    },

    // Growth accounting (the standard new/retained/resurrected/churned
    // weekly decomposition of active users — the a16z/Reforge DAU-MAU
    // bookkeeping): per ISO-ish week (days since 2024-01-01, div 7),
    // actives split by first-seen week and prior-week activity;
    // churned(w) = active in w−1 but not w. All set logic on exact
    // (user, week) DISTINCT frames — joins and counts only, nothing
    // FP. Scale shape: one distinct → self equi-joins on (user, w±1)
    // + a broadcast first-seen min — all shuffle-partitioned on user.
    q("events_growth_accounting",
      """WITH a AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 w
        |  FROM events),
        |f AS (SELECT user_id, min(w) fw FROM a GROUP BY 1),
        |cls AS (SELECT a.user_id, a.w,
        |    CASE WHEN a.w = f.fw THEN 'new'
        |         WHEN p.user_id IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END st
        |  FROM a JOIN f ON a.user_id = f.user_id
        |  LEFT JOIN a p ON a.user_id = p.user_id AND p.w = a.w - 1),
        |ch AS (SELECT a.w + 1 w, count(*)::BIGINT churned
        |       FROM a LEFT JOIN a nx
        |         ON a.user_id = nx.user_id AND nx.w = a.w + 1
        |       WHERE nx.user_id IS NULL GROUP BY 1),
        |g AS (SELECT w,
        |        count(*) FILTER (st = 'new')::BIGINT new_users,
        |        count(*) FILTER (st = 'retained')::BIGINT retained,
        |        count(*) FILTER (st = 'resurrected')::BIGINT resurrected,
        |        count(*)::BIGINT active
        |      FROM cls GROUP BY 1)
        |SELECT g.w::BIGINT AS week, g.new_users, g.retained,
        |       g.resurrected, COALESCE(ch.churned, 0)::BIGINT AS churned,
        |       g.active
        |FROM g LEFT JOIN ch ON g.w = ch.w
        |WHERE g.w <= (SELECT max(w) FROM a)
        |ORDER BY week""") { c =>
      // one corpus scan: the distinct (user, week) frame is tiny
      // relative to events and feeds four consumers — materialize it
      val a = c.events.select(col("user_id"),
          floor(datediff(col("ts").cast("date"),
            lit("2024-01-01").cast("date")) / 7).cast("long").as("w"))
        .distinct()
        .localCheckpoint()
      val f = a.groupBy("user_id").agg(min(col("w")).as("fw"))
      val prev = a.select(col("user_id"), (col("w") + 1).as("w"),
        lit(1).as("was_prev"))
      val cls = a.join(f, "user_id")
        .join(prev, Seq("user_id", "w"), "left")
        .select(col("w"),
          when(col("w") === col("fw"), "new")
            .when(col("was_prev").isNotNull, "retained")
            .otherwise("resurrected").as("st"))
      val nxt = a.select(col("user_id"), (col("w") - 1).as("w"),
        lit(1).as("has_next"))
      val ch = a.join(nxt, Seq("user_id", "w"), "left")
        .filter(col("has_next").isNull)
        .groupBy((col("w") + 1).as("w"))
        .agg(count(lit(1)).as("churned"))
      val g = cls.groupBy("w")
        .agg(sum(when(col("st") === "new", 1L).otherwise(0L))
            .as("new_users"),
          sum(when(col("st") === "retained", 1L).otherwise(0L))
            .as("retained"),
          sum(when(col("st") === "resurrected", 1L).otherwise(0L))
            .as("resurrected"),
          count(lit(1)).as("active"))
      val maxW = a.agg(max(col("w")).as("mw"))
      g.join(ch, Seq("w"), "left")
        .crossJoin(broadcast(maxW))
        .filter(col("w") <= col("mw"))
        .select(col("w").as("week"), col("new_users"), col("retained"),
          col("resurrected"),
          coalesce(col("churned"), lit(0L)).as("churned"), col("active"))
        .orderBy("week")
    },

    // Mood's median test — the MEDIAN-split face of k-sample location
    // testing beside the rank-sum machinery (Kruskal-Wallis ranks ALL
    // values; Mood only asks "above the grand median or not", the
    // robust choice under heavy tails / outliers): grand median of
    // order totals via the exact cents HISTOGRAM + distributed cumsum
    // (never a global sort of raw rows), then a k×2 above/not-above
    // contingency chi². Every cell is an exact integer; the chi²
    // terms are ratios of integers summed over k·2 model-sized cells.
    q("stat_mood_median",
      """WITH v AS (SELECT o_orderpriority g,
        |             CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) c
        |           FROM orders),
        |h AS (SELECT c, count(*)::BIGINT cnt FROM v GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT n FROM h),
        |cw AS (SELECT c, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cum
        |       FROM h),
        |med AS (SELECT min(c) m FROM cw, t
        |        WHERE cum + cnt >= (t.n + 1) // 2),
        |cell AS (SELECT g,
        |           sum(CASE WHEN c > (SELECT m FROM med)
        |               THEN 1 ELSE 0 END)::BIGINT ab,
        |           count(*)::BIGINT tot
        |         FROM v GROUP BY 1),
        |tt AS (SELECT sum(ab)::BIGINT ta, sum(tot)::BIGINT n FROM cell)
        |SELECT max(tt.n) AS n, (SELECT m FROM med) AS median_cents,
        |  round(sum(pow(ab - tot * (ta * 1.0) / tt.n, 2)
        |              / (tot * (ta * 1.0) / tt.n)
        |            + pow((tot - ab) - tot * ((tt.n - ta) * 1.0) / tt.n, 2)
        |              / (tot * ((tt.n - ta) * 1.0) / tt.n)) + 1e-9, 4)
        |    AS chi2,
        |  count(*) - 1 AS dof
        |FROM cell, tt""") { c =>
      val v = c.orders.select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT)").as("c"))
      val h = v.groupBy("c").agg(count(lit(1)).as("cnt"))
      val t = h.agg(sum(col("cnt")).as("n"))
      val cw = graft.ops.Positional.withCumSums(h, Seq(col("c")),
        Seq(col("cnt") -> "cum"))
      val med = cw.crossJoin(broadcast(t))
        .filter(col("cum") + col("cnt") >=
          ((col("n") + 1) / 2).cast("long"))
        .agg(min(col("c")).as("m"))
      val cell = v.crossJoin(broadcast(med))
        .groupBy("g").agg(
          sum(when(col("c") > col("m"), 1L).otherwise(0L)).as("ab"),
          count(lit(1)).as("tot"))
      val tt = cell.agg(sum(col("ab")).as("ta"), sum(col("tot")).as("n"))
      cell.crossJoin(broadcast(tt)).crossJoin(broadcast(med))
        .agg(max(col("n")).as("n"), max(col("m")).as("median_cents"),
          // tot*(ta*1.0): margin products via DOUBLE — the BIGINT
          // grouping is SF^2 (the stat_chi2 width-audit class)
          r4(sum(
            pow(col("ab") - col("tot") * (col("ta") * lit(1.0)) / col("n"), 2)
              / (col("tot") * (col("ta") * lit(1.0)) / col("n"))
            + pow((col("tot") - col("ab")) -
                col("tot") * ((col("n") - col("ta")) * lit(1.0)) / col("n"), 2)
              / (col("tot") * ((col("n") - col("ta")) * lit(1.0)) / col("n"))))
            .as("chi2"),
          (count(lit(1)) - 1).as("dof"))
    },

    // Cochran's Q — the k-treatment BINARY repeated-measures test
    // (does pass-rate differ across the three engagement bars for the
    // SAME users?) beside McNemar's paired 2×2 and Cochran-Armitage's
    // ordered trend: per user x_j = 1 if their channel-j activity
    // meets that channel's engagement bar (every-user-fires-once
    // would make all R_i = k and the denominator vanish — the bars
    // sit around the per-type count quartiles so the indicators
    // discriminate at every SF);
    // Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣR_i − ΣR_i²) with G the
    // bar totals and R the per-user row sums — EVERY term an exact
    // integer aggregate, one user-grouped scan + one 1-row reduction,
    // so the statistic is a single exact-integer ratio.
    q("stat_cochran_q",
      """WITH x AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'click'
        |                  THEN 1 ELSE 0 END) >= 12
        |         THEN 1 ELSE 0 END x1,
        |    CASE WHEN sum(CASE WHEN event_type = 'view'
        |                  THEN 1 ELSE 0 END) >= 14
        |         THEN 1 ELSE 0 END x2,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |                  THEN 1 ELSE 0 END) >= 16
        |         THEN 1 ELSE 0 END x3
        |  FROM events GROUP BY 1),
        |s AS (SELECT count(*)::BIGINT n, sum(x1)::BIGINT g1,
        |        sum(x2)::BIGINT g2, sum(x3)::BIGINT g3,
        |        sum(x1 + x2 + x3)::BIGINT sr,
        |        sum((x1 + x2 + x3) * (x1 + x2 + x3))::BIGINT sr2
        |      FROM x)
        |SELECT n AS n_users, g1 AS g_click, g2 AS g_view,
        |  g3 AS g_purchase,
        |  round(2.0 * (3 * (g1*g1 + g2*g2 + g3*g3)
        |               - (g1+g2+g3) * (g1+g2+g3))
        |        / (3 * sr - sr2) + 1e-9, 6) AS q_stat,
        |  2 AS dof
        |FROM s""") { c =>
      val x = c.events.groupBy("user_id").agg(
        (sum(when(col("event_type") === "click", 1).otherwise(0)) >= 12)
          .cast("int").as("x1"),
        (sum(when(col("event_type") === "view", 1).otherwise(0)) >= 14)
          .cast("int").as("x2"),
        (sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 16)
          .cast("int").as("x3"))
      val s = x.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("g1"), sum(col("x2")).as("g2"),
        sum(col("x3")).as("g3"),
        sum(col("x1") + col("x2") + col("x3")).as("sr"),
        sum((col("x1") + col("x2") + col("x3")) *
          (col("x1") + col("x2") + col("x3"))).as("sr2"))
      s.select(col("n").as("n_users"), col("g1").as("g_click"),
        col("g2").as("g_view"), col("g3").as("g_purchase"),
        r6(lit(2.0) * (lit(3) * (col("g1") * col("g1") +
            col("g2") * col("g2") + col("g3") * col("g3")) -
            (col("g1") + col("g2") + col("g3")) *
            (col("g1") + col("g2") + col("g3"))) /
          (lit(3) * col("sr") - col("sr2"))).as("q_stat"),
        lit(2).as("dof"))
    },

    // Hurst exponent via rescaled-range (R/S) analysis (Hurst 1951;
    // Mandelbrot & Wallis 1969) — the LONG-MEMORY estimator beside
    // ts_acf's short-lag correlations: H≈0.5 = no memory, H>0.5 =
    // persistent trends. Per window size w ∈ {8,16,32} the daily
    // event-count series splits into ⌊n/w⌋ blocks; per block the
    // range of cumulative deviations and the population σ combine as
    // R/S = R′/√(w·Σx²−(Σx)²) with R′ = max−min of w·cumsum − t·Σx —
    // EVERY input an exact integer, so each block's R/S is one IEEE
    // division of an exact integer by the sqrt of an exact integer.
    // Block averages fold in pinned b-order (the text_lm_ppl stance);
    // because ln w is EQUALLY SPACED (3ln2, 4ln2, 5ln2), the log-log
    // regression slope collapses to (ln R̄S₃₂ − ln R̄S₈)/(2·ln 2) —
    // two rounded logs and one pinned literal, no summation at all.
    q("ts_hurst",
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) dy,
        |             count(*)::BIGINT x
        |           FROM events GROUP BY 1),
        |i AS (SELECT x, row_number() OVER (ORDER BY dy) - 1 idx FROM d),
        |nn AS (SELECT count(*)::BIGINT n FROM i),
        |ws AS (SELECT unnest([8, 16, 32]) w),
        |blk AS (SELECT ws.w, i.idx // ws.w b, i.idx % ws.w t, i.x
        |        FROM i, ws, nn WHERE i.idx < (nn.n // ws.w) * ws.w),
        |pre AS (SELECT w, b, t, x,
        |          sum(x) OVER (PARTITION BY w, b ORDER BY t) cx
        |        FROM blk),
        |bs AS (SELECT w, b, sum(x)::BIGINT s1, sum(x * x)::BIGINT s2
        |       FROM blk GROUP BY 1, 2),
        |dev AS (SELECT p.w, p.b,
        |          max(p.w * p.cx - (p.t + 1) * bs.s1)
        |            - min(p.w * p.cx - (p.t + 1) * bs.s1) rp
        |        FROM pre p JOIN bs ON bs.w = p.w AND bs.b = p.b
        |        GROUP BY 1, 2),
        |rs AS (SELECT d2.w, d2.b,
        |         d2.rp / sqrt((d2.w * bs.s2 - bs.s1 * bs.s1)::DOUBLE) rsv
        |       FROM dev d2 JOIN bs ON bs.w = d2.w AND bs.b = d2.b
        |       WHERE d2.w * bs.s2 > bs.s1 * bs.s1),
        |av AS (SELECT w, count(*)::BIGINT n_blocks,
        |         list_reduce(list(rsv ORDER BY b), (a, x2) -> a + x2)
        |           / count(*) avg_rs
        |       FROM rs GROUP BY 1),
        |ly AS (SELECT w, n_blocks, avg_rs,
        |         round(ln(avg_rs) + 1e-9, 6) y FROM av),
        |h AS (SELECT round((max(CASE WHEN w = 32 THEN y END)
        |                    - max(CASE WHEN w = 8 THEN y END))
        |              / 1.3862943611198906 + 1e-9, 4) hurst FROM ly)
        |SELECT ly.w, ly.n_blocks, round(ly.avg_rs + 1e-9, 6) AS avg_rs,
        |       h.hurst
        |FROM ly, h ORDER BY ly.w""") { c =>
      import org.apache.spark.sql.expressions.Window
      val d = c.events.groupBy(col("ts").cast("date").as("dy"))
        .agg(count(lit(1)).as("x"))
      // day-grid series — the documented time-bounded global window
      val i = d.withColumn("idx",
        row_number().over(Window.orderBy("dy")) - 1).drop("dy")
      val nn = i.agg(count(lit(1)).as("n"))
      val ws = c.spark.range(3).select(
        (pow(lit(2), col("id") + 3)).cast("int").as("w"))
      val blk = i.crossJoin(broadcast(ws)).crossJoin(broadcast(nn))
        .filter(col("idx") < (col("n") / col("w")).cast("long") * col("w"))
        .select(col("w"), (col("idx") / col("w")).cast("long").as("b"),
          (col("idx") % col("w")).as("t"), col("x"))
      val wPre = Window.partitionBy("w", "b").orderBy("t")
      val pre = blk.withColumn("cx", sum(col("x")).over(wPre))
      val bs = blk.groupBy("w", "b").agg(sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      val dev = pre.join(bs, Seq("w", "b"))
        .groupBy("w", "b").agg(
          (max(col("w") * col("cx") - (col("t") + 1) * col("s1")) -
            min(col("w") * col("cx") - (col("t") + 1) * col("s1")))
            .as("rp"))
      val rs = dev.join(bs, Seq("w", "b"))
        .filter(col("w") * col("s2") > col("s1") * col("s1"))
        .select(col("w"), col("b"),
          (col("rp") / sqrt((col("w") * col("s2") -
            col("s1") * col("s1")).cast("double"))).as("rsv"))
      val av = rs.groupBy("w").agg(count(lit(1)).as("n_blocks"),
        (aggregate(array_sort(collect_list(struct(col("b"),
            col("rsv").as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")) / count(lit(1)))
          .as("avg_rs"))
      val ly = av.select(col("w"), col("n_blocks"), col("avg_rs"),
        r6(log(col("avg_rs"))).as("y"))
      val h = ly.agg(
        r4((max(when(col("w") === 32, col("y"))) -
          max(when(col("w") === 8, col("y")))) /
          lit(1.3862943611198906)).as("hurst"))
      ly.crossJoin(broadcast(h))
        .select(col("w"), col("n_blocks"), r6(col("avg_rs")).as("avg_rs"),
          col("hurst"))
        .orderBy("w")
    },

    // Benjamini–Hochberg FDR control over a FAMILY of exact Fisher
    // tests — the multiple-testing operator an experimentation
    // platform runs when one release ships m metric comparisons (each
    // p-value alone at α would inflate family-wise false discoveries):
    // per order-priority a 2×2 arm×success table, EXACT one-sided
    // hypergeometric tail p (the stat_fisher_exact machinery
    // generalized per group — relative weights fold as pinned-order
    // products of exact integer ratios), then the BH step-up: rank
    // p's ascending, reject all ranks ≤ the largest k with p_(k) ≤
    // k·q/m at q = 0.10. Booleans compare ROUNDED values on both
    // engines (the FP-boolean rule). The population is capped
    // (o_orderkey < 400) so the per-table weight products stay in
    // double range — the cap is the operator's n, not a scale dodge;
    // the per-group relation after the cap is model-sized.
    q("stat_fdr_bh",
      """WITH o AS (SELECT o_orderpriority g, o_custkey % 2 arm,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END s
        |  FROM orders WHERE o_orderkey < 400),
        |cells AS (SELECT g,
        |    sum(CASE WHEN arm=0 AND s=1 THEN 1 ELSE 0 END)::BIGINT a,
        |    sum(CASE WHEN arm=0 AND s=0 THEN 1 ELSE 0 END)::BIGINT b,
        |    sum(CASE WHEN arm=1 AND s=1 THEN 1 ELSE 0 END)::BIGINT c,
        |    sum(CASE WHEN arm=1 AND s=0 THEN 1 ELSE 0 END)::BIGINT d
        |  FROM o GROUP BY 1),
        |m AS (SELECT g, a, b, c, d, a + b r1, c + d r2, a + c c1,
        |        greatest(0, (a + c) - (c + d)) lo,
        |        least(a + b, a + c) hi FROM cells),
        |xs AS (SELECT m.*, unnest(range(m.lo, m.hi + 1)) x FROM m),
        |wr AS (SELECT g, x, a,
        |    CASE WHEN x = lo THEN 1.0
        |         ELSE list_reduce(
        |           list_transform(range(lo + 1, x + 1),
        |             i -> ((r1 - i + 1) * (c1 - i + 1))
        |                  / (i * (r2 - c1 + i))),
        |           (p2, q2) -> p2 * q2) END w
        |  FROM xs),
        |p AS (SELECT g,
        |    list_reduce(list(CASE WHEN x >= a THEN w ELSE 0.0 END
        |      ORDER BY x), (p2, q2) -> p2 + q2)
        |    / list_reduce(list(w ORDER BY x), (p2, q2) -> p2 + q2) pv
        |  FROM wr GROUP BY g),
        |r AS (SELECT g, round(pv + 1e-9, 6) p6,
        |        row_number() OVER (ORDER BY round(pv + 1e-9, 6), g) rk,
        |        count(*) OVER () mm
        |      FROM p),
        |f AS (SELECT g, p6, rk, mm,
        |        round(rk * 0.10 / mm + 1e-9, 6) th FROM r),
        |k AS (SELECT max(CASE WHEN p6 <= th THEN rk ELSE 0 END) kmax
        |      FROM f)
        |SELECT f.g AS grp, f.p6 AS p_value, f.rk::BIGINT AS rank,
        |  f.th AS bh_threshold, f.rk <= k.kmax AS rejected
        |FROM f, k ORDER BY rank""") { c =>
      import org.apache.spark.sql.expressions.Window
      val o = c.orders.filter(col("o_orderkey") < 400).select(
        col("o_orderpriority").as("g"), (col("o_custkey") % 2).as("arm"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("s"))
      val cells = o.groupBy("g").agg(
        sum(when(col("arm") === 0 && col("s") === 1, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("arm") === 0 && col("s") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("arm") === 1 && col("s") === 1, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("arm") === 1 && col("s") === 0, 1L).otherwise(0L))
          .as("d"))
      val m = cells.withColumn("r1", col("a") + col("b"))
        .withColumn("r2", col("c") + col("d"))
        .withColumn("c1", col("a") + col("c"))
        .withColumn("lo", greatest(lit(0L), col("c1") - col("r2")))
        .withColumn("hi", least(col("r1"), col("c1")))
      val xs = m.select(col("*"),
        explode(sequence(col("lo"), col("hi"))).as("x"))
      val wr = xs.select(col("g"), col("x"), col("a"),
        when(col("x") === col("lo"), lit(1.0))
          .otherwise(aggregate(
            sequence(col("lo") + 1, col("x")), lit(1.0),
            (p, i) => p * (((col("r1") - i + lit(1)) *
              (col("c1") - i + lit(1))) /
              (i * (col("r2") - col("c1") + i))))).as("w"))
      val pdf = wr.groupBy("g").agg(
        (aggregate(array_sort(collect_list(struct(col("x"),
            when(col("x") >= col("a"), col("w")).otherwise(lit(0.0))
              .as("t")))),
          lit(0.0), (acc, e) => acc + e.getField("t")) /
          aggregate(array_sort(collect_list(struct(col("x"),
            col("w").as("t")))),
            lit(0.0), (acc, e) => acc + e.getField("t"))).as("pv"))
      // m-hypothesis relation (5 rows) — model-sized global windows
      val r = pdf.select(col("g"), r6(col("pv")).as("p6"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("p6"), col("g"))))
        .withColumn("mm", count(lit(1)).over(Window.partitionBy(lit(1))))
      val f = r.withColumn("th",
        r6(col("rk") * lit(0.10) / col("mm")))
      val k = f.agg(max(when(col("p6") <= col("th"), col("rk"))
        .otherwise(lit(0))).as("kmax"))
      f.crossJoin(broadcast(k))
        .select(col("g").as("grp"), col("p6").as("p_value"),
          col("rk").cast("long").as("rank"), col("th").as("bh_threshold"),
          (col("rk") <= col("kmax")).as("rejected"))
        .orderBy("rank")
    },

    // Two-sample Anderson–Darling (Scholz & Stephens 1987, the A²kN
    // right-continuous-ECDF form over distinct pooled values, k = 2)
    // — the TAIL-weighted companion of stat_ks_2sample (sup norm) and
    // stat_cramer_von_mises (unweighted L²): the 1/(B(N−B)) weight
    // makes it the most powerful of the three against tail
    // differences, which is where data drift usually shows first.
    // With n1+n2 = N and M1+M2 = B the two arms' deviations are equal
    // and opposite, so A² = (1/n1 + 1/n2)·Σ_j l_j·d_j²/((N·B_j)(N−B_j))
    // with d_j = N·M1_j − n1·B_j an exact BIGINT, l·d² accumulated in
    // 128-bit integers (the CvM device), and the per-cell rational
    // terms — whose varying denominators bar an integer sum — folded
    // in PINNED value order on both engines (the lm-ppl left-fold
    // pattern), one division shape per term. The histogram is the
    // 50-value quantity lattice: bounded cells, no corpus window.
    q("stat_anderson_darling",
      """WITH s AS (SELECT CAST(round(l_quantity + 1e-9) AS BIGINT) v,
        |             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END arm
        |           FROM lineitem),
        |h AS (SELECT v, count(*) FILTER (arm = 1)::BIGINT c1,
        |        count(*) FILTER (arm = 0)::BIGINT c0 FROM s GROUP BY 1),
        |nn AS (SELECT sum(c1)::BIGINT n1, sum(c0)::BIGINT n0,
        |         (sum(c1) + sum(c0))::BIGINT nt FROM h),
        |cu AS (SELECT v, c1 + c0 l,
        |         sum(c1) OVER w m1, sum(c1 + c0) OVER w b
        |       FROM h WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
        |         PRECEDING AND CURRENT ROW)),
        |t AS (SELECT v,
        |        (l::HUGEINT * (nt * m1 - n1 * b)
        |         * (nt * m1 - n1 * b))::DOUBLE
        |          / ((nt::DOUBLE * b) * (nt - b)) term
        |      FROM cu, nn WHERE b < nt),
        |u AS (SELECT list_reduce(list(term ORDER BY v),
        |               (a, x) -> a + x) su FROM t)
        |SELECT nn.n1, nn.n0,
        |       round((1.0 / n1 + 1.0 / n0) * su + 1e-9, 6) AS a2_kn
        |FROM u, nn""") { c =>
      val s = c.lineitem.select(
        round(col("l_quantity") + lit(1e-9)).cast("long").as("v"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("arm"))
      val h = s.groupBy("v").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"))
      val nn = h.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
        (sum(col("c1")) + sum(col("c0"))).as("nt"))
      val wv = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cu = h.select(col("v"), (col("c1") + col("c0")).as("l"),
        sum(col("c1")).over(wv).as("m1"),
        sum(col("c1") + col("c0")).over(wv).as("b"))
      val t = cu.crossJoin(broadcast(nn))
        .filter(col("b") < col("nt"))
        .withColumn("d", col("nt") * col("m1") - col("n1") * col("b"))
        .withColumn("term",
          (col("l").cast("decimal(38,0)") * col("d") * col("d"))
            .cast("double") /
            ((col("nt").cast("double") * col("b")) *
              (col("nt") - col("b"))))
      val su = t.agg(
        aggregate(array_sort(collect_list(struct(col("v"), col("term")))),
          lit(0.0), (a, x) => a + x.getField("term")).as("su"))
      su.crossJoin(broadcast(nn))
        .select(col("n1"), col("n0"),
          r6((lit(1.0) / col("n1") + lit(1.0) / col("n0")) * col("su"))
            .as("a2_kn"))
    },

    // Cross-correlation function between two event-type hourly series
    // (click leads/lags purchase, shifts −3..+3 hours) — the lead-lag
    // screen ts_acf/ts_pacf cannot see (they are single-series): which
    // shift maximizes r tells a pipeline whether one signal PREDICTS
    // another and by how many hours. Hourly means quantize to integer
    // milli-units (the ts_resample device), so every lag's five sums
    // (Σx, Σy, Σxy, Σx², Σy²) are EXACT BIGINTs over the ≤744-hour
    // grid and Pearson r comes from one pinned double expression per
    // lag — no order-dependent FP anywhere. Scale shape: one corpus
    // aggregation to the (type, hour) grid; the 7-shift fan-out is a
    // broadcast of a 7-row range against the grid relation.
    q("ts_xcorr",
      """WITH ev AS (SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600
        |      hr, value
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |h AS (SELECT event_type, hr,
        |        CAST(round(avg(value) * 1000 + 1e-9) AS BIGINT) cv
        |      FROM ev GROUP BY 1, 2),
        |x AS (SELECT hr, cv xv FROM h WHERE event_type = 'click'),
        |y AS (SELECT hr yhr, cv yv FROM h WHERE event_type = 'purchase'),
        |lg AS (SELECT unnest(generate_series(-3, 3)) shift),
        |j AS (SELECT lg.shift, x.xv, y.yv
        |      FROM lg CROSS JOIN x JOIN y ON y.yhr = x.hr + lg.shift),
        |s AS (SELECT shift, count(*)::BIGINT n, sum(xv)::BIGINT sx,
        |        sum(yv)::BIGINT sy, sum(xv * yv)::BIGINT sxy,
        |        sum(xv * xv)::BIGINT sxx, sum(yv * yv)::BIGINT syy
        |      FROM j GROUP BY 1)
        |SELECT shift::BIGINT AS shift, n,
        |       round((n * sxy - sx * sy)::DOUBLE /
        |         sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy))
        |         + 1e-9, 6) AS r
        |FROM s ORDER BY shift""") { c =>
      val ev = c.events
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hr"),
          col("value"))
      val h = ev.groupBy("event_type", "hr")
        .agg(round(avg(col("value")) * 1000 + lit(1e-9)).cast("long")
          .as("cv"))
      val x = h.filter(col("event_type") === "click")
        .select(col("hr"), col("cv").as("xv"))
      val y = h.filter(col("event_type") === "purchase")
        .select(col("hr").as("yhr"), col("cv").as("yv"))
      val lg = c.spark.range(-3, 4).select(col("id").as("shift"))
      val j = x.crossJoin(broadcast(lg))
        .join(y, col("yhr") === col("hr") + col("shift"))
      val s = j.groupBy("shift").agg(count(lit(1)).as("n"),
        sum(col("xv")).as("sx"), sum(col("yv")).as("sy"),
        sum(col("xv") * col("yv")).as("sxy"),
        sum(col("xv") * col("xv")).as("sxx"),
        sum(col("yv") * col("yv")).as("syy"))
      s.select(col("shift"), col("n"),
          r6((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy"))))
            .as("r"))
        .orderBy("shift")
    },

    // Bartlett's test for variance homogeneity (Bartlett 1937) — the
    // PARAMETRIC sibling of stat_levene on the same design (groups =
    // order priorities, response = totalprice cents): Levene is robust
    // to non-normality, Bartlett is the more powerful test when
    // normality holds, and a pipeline reports both. Per-group variance
    // comes from EXACT integer moments (Σv BIGINT, Σv² through
    // DECIMAL/HUGEINT — the levene/stump device), so every s²ᵢ is the
    // identical correctly-rounded double on both engines; the k-term
    // ln-sums run through the pinned-order sorted fold (the text_lm_ppl
    // device). T = [(N−k)·ln s²_p − Σ(nᵢ−1)·ln s²ᵢ] / C with Bartlett's
    // small-sample correction C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)).
    // Scale shape: ONE hash aggregation to k=5 group rows, then k-row
    // arithmetic — no windows, no per-row second pass.
    q("stat_bartlett",
      """WITH o AS (SELECT o_orderpriority pri,
        |    CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) v
        |  FROM orders),
        |g AS (SELECT pri, count(*)::BIGINT n, sum(v)::BIGINT sv,
        |        sum(v::HUGEINT * v) svv FROM o GROUP BY 1),
        |s AS (SELECT pri, n,
        |        (n * svv - sv::HUGEINT * sv)::DOUBLE /
        |          (n::DOUBLE * (n - 1)) s2 FROM g),
        |t AS (SELECT count(*)::BIGINT k, sum(n)::BIGINT nt,
        |        list_reduce(list((n - 1) * s2 ORDER BY pri),
        |          (a, x) -> a + x) wss,
        |        list_reduce(list((n - 1) * ln(s2) ORDER BY pri),
        |          (a, x) -> a + x) wls,
        |        list_reduce(list(1.0 / (n - 1) ORDER BY pri),
        |          (a, x) -> a + x) rin
        |      FROM s)
        |SELECT k, nt AS n_total,
        |  round(wss / (nt - k) / 1e4 + 1e-9, 4) AS pooled_var,
        |  round(((nt - k) * ln(wss / (nt - k)) - wls) /
        |        (1 + (rin - 1.0 / (nt - k)) / (3 * (k - 1)))
        |        + 1e-9, 6) AS bartlett_t
        |FROM t""") { c =>
      val o = c.orders.select(col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long").as("v"))
      val g = o.groupBy("pri").agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("svv"))
      val s = g.select(col("pri"), col("n"),
        ((col("n") * col("svv") -
            col("sv").cast("decimal(38,0)") * col("sv")).cast("double") /
          (col("n").cast("double") * (col("n") - 1))).as("s2"))
      def pinnedSum(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("pri"),
            term.as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t"))
      val t = s.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        pinnedSum((col("n") - 1) * col("s2")).as("wss"),
        pinnedSum((col("n") - 1) * log(col("s2"))).as("wls"),
        pinnedSum(lit(1.0) / (col("n") - 1)).as("rin"))
      t.select(col("k"), col("nt").as("n_total"),
        r4(col("wss") / (col("nt") - col("k")) / 1e4).as("pooled_var"),
        r6(((col("nt") - col("k")) *
              log(col("wss") / (col("nt") - col("k"))) - col("wls")) /
          (lit(1.0) + (col("rin") - lit(1.0) / (col("nt") - col("k"))) /
            (lit(3.0) * (col("k") - 1)))).as("bartlett_t"))
    },

    // Brunner–Munzel test (Brunner & Munzel 2000; the scipy
    // `brunnermunzel` statistic) — the modern replacement for
    // Mann–Whitney U when the two samples may have UNEQUAL variances
    // (the nonparametric Behrens–Fisher problem): does the quantity of
    // returned lines (flag R) stochastically dominate kept lines
    // (flag N)? Everything runs on the (value → per-sample count)
    // HISTOGRAM in 2×midrank integer units: combined and within-sample
    // mid-ranks of a tied block are cumulative-count expressions, so
    // the place differences P = R − R′ are EXACT BIGINTs and their
    // squared sums are carried through DECIMAL(38,0)/HUGEINT (raw
    // Σ c·P² ~ 4·nx·ny² passes 2^63 near 2M rows per sample — the
    // BIGINT carry would hit that scale cliff at roughly TPC-H SF1); p̂ = P(X<Y)+½P(X=Y) and the studentized W both come from
    // one pinned double expression over those integers. Scale shape:
    // one hash aggregation to the ≤50-row quantity histogram, a window
    // over that DOMAIN-BOUNDED aggregated relation, one final fold —
    // the corpus is never ranked row-by-row.
    q("stat_brunner_munzel",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |cw AS (SELECT v, cx, cy,
        |        coalesce(sum(cx + cy) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb,
        |        coalesce(sum(cx) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cxb,
        |        coalesce(sum(cy) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cyb
        |      FROM h),
        |p AS (SELECT v, cx, cy,
        |        2*cb + cx + cy + 1 r2,
        |        2*cxb + cx + 1 rx2,
        |        2*cyb + cy + 1 ry2 FROM cw),
        |s AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny,
        |        sum(cx * r2)::BIGINT srx2,
        |        sum(cy * r2)::BIGINT sry2,
        |        sum(cx * (r2 - rx2))::BIGINT spx2,
        |        sum(cy * (r2 - ry2))::BIGINT spy2,
        |        sum(cx::HUGEINT * (r2 - rx2) * (r2 - rx2)) sqx2,
        |        sum(cy::HUGEINT * (r2 - ry2) * (r2 - ry2)) sqy2
        |      FROM p)
        |SELECT nx, ny,
        |  round((sry2 / 2.0 / ny - (ny + 1) / 2.0) / nx + 1e-9, 6)
        |    AS p_hat,
        |  round((nx::DOUBLE * ny * (sry2/2.0/ny - srx2/2.0/nx) /
        |           (nx + ny)) /
        |        sqrt(nx * ((sqx2 - spx2::DOUBLE * spx2 / nx) /
        |                     (4.0 * (nx - 1)))
        |           + ny * ((sqy2 - spy2::DOUBLE * spy2 / ny) /
        |                     (4.0 * (ny - 1))))
        |        + 1e-9, 6) AS w_stat
        |FROM s""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cw = h.select(col("v"), col("cx"), col("cy"),
        coalesce(sum(col("cx") + col("cy")).over(w), lit(0L)).as("cb"),
        coalesce(sum(col("cx")).over(w), lit(0L)).as("cxb"),
        coalesce(sum(col("cy")).over(w), lit(0L)).as("cyb"))
      val p = cw.select(col("cx"), col("cy"),
        (lit(2) * col("cb") + col("cx") + col("cy") + 1).as("r2"),
        (lit(2) * col("cxb") + col("cx") + 1).as("rx2"),
        (lit(2) * col("cyb") + col("cy") + 1).as("ry2"))
      val s = p.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"),
        sum(col("cx") * col("r2")).as("srx2"),
        sum(col("cy") * col("r2")).as("sry2"),
        sum(col("cx") * (col("r2") - col("rx2"))).as("spx2"),
        sum(col("cy") * (col("r2") - col("ry2"))).as("spy2"),
        sum(col("cx").cast("decimal(38,0)") * (col("r2") - col("rx2")) *
          (col("r2") - col("rx2"))).as("sqx2"),
        sum(col("cy").cast("decimal(38,0)") * (col("r2") - col("ry2")) *
          (col("r2") - col("ry2"))).as("sqy2"))
      s.select(col("nx"), col("ny"),
        r6((col("sry2") / 2.0 / col("ny") - (col("ny") + 1) / lit(2.0)) /
          col("nx")).as("p_hat"),
        r6((col("nx").cast("double") * col("ny") *
              (col("sry2") / 2.0 / col("ny") -
                col("srx2") / 2.0 / col("nx")) /
              (col("nx") + col("ny"))) /
          sqrt(col("nx") *
              ((col("sqx2") - col("spx2").cast("double") * col("spx2") /
                  col("nx")) / (lit(4.0) * (col("nx") - 1))) +
            col("ny") *
              ((col("sqy2") - col("spy2").cast("double") * col("spy2") /
                  col("ny")) / (lit(4.0) * (col("ny") - 1)))))
          .as("w_stat"))
    },

    // Breusch–Pagan LM test for heteroskedasticity (Breusch & Pagan
    // 1979, Koenker's studentized n·R² form) — the regression
    // diagnostic stat_overdispersion is to counts: after fitting
    // price ~ quantity by OLS, do the SQUARED residuals still depend
    // on quantity? OLS slope/intercept come from exact integer moment
    // sums (cents × unit quantities), so (a, b) are bit-identical
    // doubles on both engines; each residual is then RE-QUANTIZED to
    // integer cents (round of an identical double — the lattice-free
    // nudge makes the cut deterministic) so the auxiliary regression's
    // moments Σu, Σu², Σxu (u = e²) are again EXACT integers through
    // DECIMAL/HUGEINT, and LM = n·R²_aux is one pinned double
    // expression. Scale shape: aggregate → 1-row broadcast → per-row
    // residual map → aggregate; two corpus passes, no windows.
    q("stat_breusch_pagan",
      """WITH d AS (SELECT CAST(l_quantity AS BIGINT) x,
        |    CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT) yc
        |  FROM lineitem),
        |m AS (SELECT count(*)::BIGINT n, sum(x)::BIGINT sx,
        |        sum(x * x)::BIGINT sxx, sum(yc)::BIGINT sy,
        |        sum(x::HUGEINT * yc) sxy FROM d),
        |ab AS (SELECT n, sx, sxx,
        |        (n * sxy - sx::HUGEINT * sy)::DOUBLE /
        |          (n * sxx - sx::HUGEINT * sx)::DOUBLE b,
        |        (sy - ((n * sxy - sx::HUGEINT * sy)::DOUBLE /
        |                (n * sxx - sx::HUGEINT * sx)::DOUBLE) * sx) / n a
        |      FROM m),
        |e AS (SELECT x, n, sx, sxx, a, b,
        |        CAST(round(yc - (a + b * x) + 1e-9) AS BIGINT) ec
        |      FROM d, ab),
        |u AS (SELECT max(n) n, max(sx) sx, max(sxx) sxx,
        |        max(a) a, max(b) b,
        |        sum(ec::HUGEINT * ec) su,
        |        sum((ec::HUGEINT * ec) * (ec::HUGEINT * ec)) suu,
        |        sum(x * (ec::HUGEINT * ec)) sux
        |      FROM e)
        |SELECT n, round(b / 100 + 1e-9, 6) AS slope,
        |       round(a / 100 + 1e-9, 4) AS intercept,
        |       round(n::DOUBLE *
        |         ((n::DOUBLE * sux::DOUBLE - sx::DOUBLE * su::DOUBLE) *
        |          (n::DOUBLE * sux::DOUBLE - sx::DOUBLE * su::DOUBLE)) /
        |         ((n::DOUBLE * sxx - sx::DOUBLE * sx) *
        |          (n::DOUBLE * suu::DOUBLE - su::DOUBLE * su::DOUBLE))
        |         + 1e-9, 6) AS bp_lm
        |FROM u""") { c =>
      val d = c.lineitem.select(col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100 + lit(1e-9)).cast("long")
          .as("yc"))
      val m = d.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum(col("yc")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("yc")).as("sxy"))
      val ab = m.select(col("n"), col("sx"), col("sxx"), col("sy"),
        ((col("n") * col("sxy") -
            col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
          (col("n") * col("sxx").cast("decimal(38,0)") -
            col("sx").cast("decimal(38,0)") * col("sx")).cast("double"))
          .as("b"))
        // oracle computes a as (sy − b·sx)/n with the SAME b double —
        // reproduce the expression through the shared b column
        .withColumn("a",
          (col("sy") - col("b") * col("sx")) / col("n"))
        .drop("sy")
      val e = d.crossJoin(broadcast(ab))
        .select(col("x"), col("n"), col("sx"), col("sxx"), col("a"),
          col("b"),
          round(col("yc") - (col("a") + col("b") * col("x")) + lit(1e-9))
            .cast("long").as("ec"))
      val u = e.agg(max(col("n")).as("n"), max(col("sx")).as("sx"),
        max(col("sxx")).as("sxx"), max(col("a")).as("a"),
        max(col("b")).as("b"),
        sum(col("ec").cast("decimal(38,0)") * col("ec")).as("su"),
        sum((col("ec").cast("decimal(38,0)") * col("ec")) *
          (col("ec").cast("decimal(38,0)") * col("ec"))).as("suu"),
        sum(col("x") * (col("ec").cast("decimal(38,0)") * col("ec")))
          .as("sux"))
      u.select(col("n"), r6(col("b") / 100).as("slope"),
        r4(col("a") / 100).as("intercept"),
        r6(col("n").cast("double") *
          ((col("n").cast("double") * col("sux").cast("double") -
              col("sx").cast("double") * col("su").cast("double")) *
            (col("n").cast("double") * col("sux").cast("double") -
              col("sx").cast("double") * col("su").cast("double"))) /
          ((col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx")) *
            (col("n").cast("double") * col("suu").cast("double") -
              col("su").cast("double") * col("su").cast("double"))))
          .as("bp_lm"))
    },

    // Hodges–Lehmann pseudo-median (Hodges & Lehmann 1963) of the
    // daily kilodollar revenue series — the rank-based location
    // estimator behind the Wilcoxon signed-rank interval: the median
    // of all Walsh averages (x_i + x_j)/2, i <= j. A mean that keeps
    // ~29% breakdown robustness, reported beside the plain mean to
    // expose skew. EXACT throughout: Walsh averages are carried as the
    // INTEGER sums x_i + x_j; their median is the lower order
    // statistic ceil(m/2) resolved by cumulative rank over the SUM
    // HISTOGRAM (the grouped-exact-median device — bounded by the
    // value domain, never a corpus sort); HL = median_sum / 2 is the
    // single final division. Scale shape: one corpus aggregation to
    // the day grid, the day-grid x day-grid pair join (documented
    // GRID_BOUND BNLJ class), one hash aggregation to the sum
    // histogram, a window over that aggregated relation, one 1-row
    // limit.
    q("stat_hodges_lehmann",
      """WITH daily AS (SELECT o_orderdate d,
        |    (sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |     + 50000) // 100000 x
        |  FROM orders GROUP BY 1),
        |pr AS (SELECT a.x + b.x s FROM daily a JOIN daily b
        |       ON a.d <= b.d),
        |h AS (SELECT s, count(*)::BIGINT cnt FROM pr GROUP BY 1),
        |cu AS (SELECT s, cnt, sum(cnt) OVER (ORDER BY s) cum FROM h),
        |t AS (SELECT count(*)::BIGINT n, sum(x)::BIGINT sx FROM daily),
        |m AS (SELECT (n * (n + 1)) // 2 m, n, sx FROM t),
        |med AS (SELECT cu.s FROM cu, m
        |        WHERE cu.cum >= (m.m + 1) // 2
        |        ORDER BY cu.s LIMIT 1)
        |SELECT m.n AS n_days, m.m AS n_walsh,
        |  round(med.s / 2.0 + 1e-9, 6) AS hl,
        |  round(m.sx * 1.0 / m.n + 1e-9, 6) AS mean
        |FROM m, med""") { c =>
      val daily = c.orders.groupBy(col("o_orderdate").as("d"))
        .agg(expr("(sum(CAST(round(o_totalprice * 100 + 1e-9) AS " +
          "BIGINT)) + 50000) div 100000").as("x"))
      val pr = daily.as("a")
        .join(daily.as("b"), col("a.d") <= col("b.d"))
        .select((col("a.x") + col("b.x")).as("s"))
      val h = pr.groupBy("s").agg(count(lit(1)).as("cnt"))
      val cu = h.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy("s")))
      val t = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .select(expr("(n * (n + 1)) div 2").as("m"), col("n"),
          col("sx"))
      val med = cu.crossJoin(broadcast(t))
        .filter(col("cum") >= expr("(m + 1) div 2"))
        .orderBy("s").limit(1).select(col("s"))
      broadcast(t).crossJoin(broadcast(med))
        .select(col("n").as("n_days"), col("m").as("n_walsh"),
          r6(col("s") / 2.0).as("hl"),
          r6(col("sx") * 1.0 / col("n")).as("mean"))
    },

    // Sample-ratio mismatch guardrail (the FIRST check any A/B readout
    // runs: if assignment isn't hitting its designed split, every
    // downstream lift number is invalid — Fabijan et al. 2019 diagnose
    // SRM as the most common silent experiment corruption): arms from
    // the user_id parity hash on signups, expected 50/50; chi-square
    // with 1 df collapses to (n0-n1)^2/(n0+n1) on EXACT integer
    // counts, one division at the end, and the pass/fail flag
    // compares the ROUNDED statistic on both engines against the
    // alpha=0.05 critical value 3.841459. One corpus aggregate.
    q("ab_srm",
      """WITH a AS (SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT n0,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT n1
        |  FROM events WHERE event_type = 'signup')
        |SELECT n0, n1,
        |  round(n0 * 1.0 / (n0 + n1) + 1e-9, 6) AS ratio0,
        |  round((n0 - n1) * 1.0 * (n0 - n1) / (n0 + n1) + 1e-9, 6)
        |    AS chi2,
        |  round((n0 - n1) * 1.0 * (n0 - n1) / (n0 + n1) + 1e-9, 6)
        |    > 3.841459 AS srm_detected
        |FROM a""") { c =>
      val a = c.events.filter(col("event_type") === "signup").agg(
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"))
      val chi2 = r6((col("n0") - col("n1")) * lit(1.0) *
        (col("n0") - col("n1")) / (col("n0") + col("n1")))
      a.select(col("n0"), col("n1"),
        r6(col("n0") * lit(1.0) / (col("n0") + col("n1"))).as("ratio0"),
        chi2.as("chi2"),
        (chi2 > 3.841459).as("srm_detected"))
    },

    // Grubbs' test for a single outlier (Grubbs 1950 — the
    // maximum-studentized-deviate screen run before any mean-based
    // readout): G = max|x - x̄| / s over order totals. The argmax is
    // EXACT integer arithmetic — |v·n − S| on cents never touches a
    // double, so the flagged outlier (ties: lowest value) is
    // deterministic at any partitioning; mean/sd come from exact
    // integer moments (Σv² through DECIMAL(38,0)/HUGEINT) and G is one
    // pinned double expression. Scale: one corpus aggregate + one
    // argmax over the corpus — no sort, no window.
    q("stat_grubbs",
      """WITH b AS (SELECT CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) v
        |           FROM orders),
        |t AS (SELECT count(*)::BIGINT n, sum(v)::BIGINT s,
        |        sum(v::HUGEINT * v) q FROM b),
        |d AS (SELECT v, abs(v * n - s) dev FROM b, t),
        |mx AS (SELECT max(dev) md FROM d),
        |m AS (SELECT min(v) v, max(d.dev) dev FROM d, mx
        |      WHERE d.dev = mx.md)
        |SELECT n,
        |  round(s * 1.0 / n / 100 + 1e-9, 4) AS mean,
        |  round(sqrt((q::DOUBLE - s::DOUBLE * s / n) / (n - 1)) / 100
        |        + 1e-9, 4) AS sd,
        |  round(m.v / 100.0 + 1e-9, 2) AS outlier,
        |  round((m.dev * 1.0 / n)
        |        / sqrt((q::DOUBLE - s::DOUBLE * s / n) / (n - 1))
        |        + 1e-9, 6) AS g
        |FROM t, m""") { c =>
      val b = c.orders.select(
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long").as("v"))
      val t = b.agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("q"))
      val d = b.crossJoin(broadcast(t))
        .select(col("v"), abs(col("v") * col("n") - col("s")).as("dev"),
          col("n"), col("s"), col("q"))
      val m = d.orderBy(col("dev").desc, col("v").asc).limit(1)
      val sd = sqrt((col("q").cast("double") -
        col("s").cast("double") * col("s") / col("n")) / (col("n") - 1))
      m.select(col("n"),
        r4(col("s") * lit(1.0) / col("n") / 100).as("mean"),
        r4(sd / 100).as("sd"),
        r2(col("v") / lit(100.0)).as("outlier"),
        r6((col("dev") * lit(1.0) / col("n")) / sd).as("g"))
    },

    // Two-sample Kuiper test (Kuiper 1960 — the rotation-invariant
    // sibling of Kolmogorov-Smirnov: V = D+ + D- weighs both tails
    // equally, the right screen for cyclic or tail-asymmetric shifts
    // KS under-weights): returned vs kept lineitem quantities. Both
    // sups run on EXACT integers — cumx·ny − cumy·nx on the ≤50-row
    // quantity histogram — with the single division at the end, so
    // the statistic is bit-deterministic at any partitioning. The
    // cross-products and nx·ny are SF² (past 2^63 near ~3e9 rows per
    // sample, ~lineitem SF500), so they are carried through HUGEINT /
    // DECIMAL(38,0) — the stat_brunner_munzel width discipline —
    // keeping both engines exact to ~10^19 rows per sample. Scale:
    // one corpus hash aggregation to the bounded histogram, one
    // window over that model-sized relation.
    q("stat_kuiper",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny FROM h),
        |c AS (SELECT v,
        |        sum(cx) OVER (ORDER BY v) cumx,
        |        sum(cy) OVER (ORDER BY v) cumy
        |      FROM h),
        |d AS (SELECT greatest(max(cumx::HUGEINT * ny
        |                           - cumy::HUGEINT * nx), 0) dpi,
        |             greatest(max(cumy::HUGEINT * nx
        |                           - cumx::HUGEINT * ny), 0) dmi
        |      FROM c, t)
        |SELECT nx, ny,
        |  round(dpi * 1.0 / (nx::HUGEINT * ny) + 1e-9, 6) AS d_plus,
        |  round(dmi * 1.0 / (nx::HUGEINT * ny) + 1e-9, 6) AS d_minus,
        |  round((dpi + dmi) * 1.0 / (nx::HUGEINT * ny) + 1e-9, 6)
        |    AS kuiper_v,
        |  round(sqrt(nx::DOUBLE * ny / (nx + ny))
        |        * ((dpi + dmi) * 1.0 / (nx::HUGEINT * ny)) + 1e-9, 6)
        |    AS v_scaled
        |FROM d, t""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
      val w = Window.orderBy("v")
      val cum = h.select(col("v"),
        sum(col("cx")).over(w).as("cumx"),
        sum(col("cy")).over(w).as("cumy"))
      val d = cum.crossJoin(broadcast(t))
        .agg(greatest(max(col("cumx").cast("decimal(38,0)") * col("ny") -
            col("cumy").cast("decimal(38,0)") * col("nx")),
            lit(0L).cast("decimal(38,0)")).as("dpi"),
          greatest(max(col("cumy").cast("decimal(38,0)") * col("nx") -
            col("cumx").cast("decimal(38,0)") * col("ny")),
            lit(0L).cast("decimal(38,0)")).as("dmi"),
          first(col("nx")).as("nx"), first(col("ny")).as("ny"))
      val nxy = col("nx").cast("decimal(38,0)") * col("ny")
      d.select(col("nx"), col("ny"),
        r6(col("dpi") * lit(1.0) / nxy).as("d_plus"),
        r6(col("dmi") * lit(1.0) / nxy).as("d_minus"),
        r6((col("dpi") + col("dmi")) * lit(1.0) / nxy).as("kuiper_v"),
        r6(sqrt(col("nx").cast("double") * col("ny") /
            (col("nx") + col("ny"))) *
          ((col("dpi") + col("dmi")) * lit(1.0) / nxy)).as("v_scaled"))
    },

    // Ansari-Bradley test (Ansari & Bradley 1960 — the rank-based
    // SCALE test: are returned-line quantities more dispersed than
    // kept ones, median shift aside?) on the double-ended midrank
    // scores a(r) = min(r, N+1−r), ties averaged per block. The whole
    // score machinery is EXACT integer arithmetic on the ≤50-row
    // quantity histogram: the cumulative score prefix f(t) has the
    // closed form k(k+1)/2 + [(N−k)(N−k+1) − (N−t)(N−t+1)]/2 (k =
    // min(t, ⌈N/2⌉)), so each tied block's average score is one exact
    // integer ratio, and the statistic T = Σ cx·ā(block), its moments
    // E = nx·ā̄ and Var = nx·ny(Σc·ā² − N·ā̄²)/(N(N−1)), fold those
    // ratios in PINNED v order (the bartlett device) before the one
    // studentization. Scale: one hash aggregation to the bounded
    // histogram; everything after is model-sized.
    q("stat_ansari_bradley",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny,
        |        sum(cx + cy)::BIGINT n,
        |        (sum(cx + cy) + 1) // 2 half FROM h),
        |cw AS (SELECT v, cx, cy, cx + cy c,
        |        coalesce(sum(cx + cy) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb
        |      FROM h),
        |fb AS (SELECT v, cx, cy, c, cb, n, nx, ny, half,
        |        (least(cb + c, half) * (least(cb + c, half) + 1)) // 2
        |          + CASE WHEN cb + c > half THEN
        |              ((n - half) * (n - half + 1)) // 2
        |                - ((n - cb - c) * (n - cb - c + 1)) // 2
        |            ELSE 0 END
        |        - ((least(cb, half) * (least(cb, half) + 1)) // 2
        |          + CASE WHEN cb > half THEN
        |              ((n - half) * (n - half + 1)) // 2
        |                - ((n - cb) * (n - cb + 1)) // 2
        |            ELSE 0 END) bs
        |      FROM cw, t),
        |fold AS (SELECT
        |    list_reduce(list(cx * (bs * 1.0 / c) ORDER BY v),
        |      (a, x) -> a + x) tt,
        |    list_reduce(list(c * (bs * 1.0 / c) * (bs * 1.0 / c)
        |                     ORDER BY v), (a, x) -> a + x) sa2,
        |    max(n) n, max(nx) nx, max(ny) ny, max(half) half
        |  FROM fb),
        |ab AS (SELECT nx, ny, n, tt, sa2,
        |        ((least(n, half) * (least(n, half) + 1)) // 2
        |         + CASE WHEN n > half THEN
        |             ((n - half) * (n - half + 1)) // 2 ELSE 0 END)
        |          * 1.0 / n abar
        |      FROM fold)
        |SELECT nx, ny, round(tt + 1e-9, 4) AS ab_t,
        |  round(nx * abar + 1e-9, 4) AS e_t,
        |  round((tt - nx * abar)
        |        / sqrt(nx::DOUBLE * ny * (sa2 - n * abar * abar)
        |               / (n * (n - 1.0))) + 1e-9, 6) AS z
        |FROM ab""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"),
        sum(col("cx") + col("cy")).as("n"),
        expr("(sum(cx + cy) + 1) div 2").as("half"))
      val wb = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cw = h.select(col("v"), col("cx"), col("cy"),
        (col("cx") + col("cy")).as("c"),
        coalesce(sum(col("cx") + col("cy")).over(wb), lit(0L)).as("cb"))
      // per-block score sum bs = f(cb+c) − f(cb) with the closed-form
      // cumulative double-ended prefix f(t) — all exact integer div
      val fb = cw.crossJoin(broadcast(t)).selectExpr("v", "cx", "cy",
        "c", "cb", "n", "nx", "ny", "half",
        """((least(cb + c, half) * (least(cb + c, half) + 1)) div 2
          | + (CASE WHEN cb + c > half THEN
          |     ((n - half) * (n - half + 1)) div 2
          |       - ((n - cb - c) * (n - cb - c + 1)) div 2
          |   ELSE 0 END)
          | - ((least(cb, half) * (least(cb, half) + 1)) div 2
          |   + (CASE WHEN cb > half THEN
          |       ((n - half) * (n - half + 1)) div 2
          |         - ((n - cb) * (n - cb + 1)) div 2
          |     ELSE 0 END))) AS bs""".stripMargin.replace("\n", " "))
      val fold = fb.agg(
        aggregate(array_sort(collect_list(struct(col("v"),
            (col("cx") * (col("bs") * lit(1.0) / col("c"))).as("tm")))),
          lit(0.0), (a, x) => a + x.getField("tm")).as("tt"),
        aggregate(array_sort(collect_list(struct(col("v"),
            (col("c") * (col("bs") * lit(1.0) / col("c")) *
              (col("bs") * lit(1.0) / col("c"))).as("tm")))),
          lit(0.0), (a, x) => a + x.getField("tm")).as("sa2"),
        max(col("n")).as("n"), max(col("nx")).as("nx"),
        max(col("ny")).as("ny"), max(col("half")).as("half"))
      val ab = fold.selectExpr("nx", "ny", "n", "tt", "sa2",
        """((least(n, half) * (least(n, half) + 1)) div 2
          | + (CASE WHEN n > half THEN
          |     ((n - half) * (n - half + 1)) div 2 ELSE 0 END))
          | * 1.0 / n AS abar""".stripMargin.replace("\n", " "))
      ab.select(col("nx"), col("ny"), r4(col("tt")).as("ab_t"),
        r4(col("nx") * col("abar")).as("e_t"),
        r6((col("tt") - col("nx") * col("abar")) /
          sqrt(col("nx").cast("double") * col("ny") *
            (col("sa2") - col("n") * col("abar") * col("abar")) /
            (col("n") * (col("n") - lit(1.0))))).as("z"))
    },

    // Page's L trend test (Page 1963 — the ORDERED-alternative
    // counterpart of Friedman's test for repeated measures: does mean
    // order spend increase monotonically with priority WITHIN every
    // market segment?): blocks = segments, treatments = the 5 ordered
    // priorities, L = Σ_blocks Σ_j j·R_jb on within-block ranks of
    // the treatment means. Ranks are EXACT integers — means compare
    // by cross-multiplication (s'·n < s·n', ties to the lower
    // priority), so no division ever feeds the ranking. s is an
    // SF-linear cents sum and n an SF-linear count, so the product
    // grows ~SF² and passes 2^63 near SF~13 — carried through
    // HUGEINT / DECIMAL(38,0) (38 digits ≈ SF~10^10) so both engines
    // stay exact instead of Spark wrapping while DuckDB raises (the
    // stat_brunner_munzel width discipline) — and L, E[L]
    // = b·k(k+1)²/4, Var[L] = b·k²(k+1)(k²−1)/144 are closed-form
    // integers with one studentization at the end. Scale: one corpus
    // join+aggregation to the 25-cell (segment × priority) relation;
    // the rank self-join is 5×5 per block.
    q("stat_page_trend",
      """WITH cell AS (SELECT c_mktsegment seg,
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) j,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT s,
        |    count(*)::BIGINT n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT a.seg, a.j,
        |    1 + sum(CASE WHEN b.s::HUGEINT * a.n < a.s::HUGEINT * b.n
        |                 OR (b.s::HUGEINT * a.n = a.s::HUGEINT * b.n
        |                     AND b.j < a.j)
        |            THEN 1 ELSE 0 END)::BIGINT rk
        |  FROM cell a JOIN cell b ON a.seg = b.seg AND a.j <> b.j
        |  GROUP BY 1, 2),
        |l AS (SELECT sum(j * rk)::BIGINT pl FROM r),
        |bk AS (SELECT count(DISTINCT seg)::BIGINT b, 5::BIGINT k
        |       FROM cell)
        |SELECT b, k, pl AS page_l,
        |  (b * k * (k + 1) * (k + 1)) // 4 AS e_l,
        |  round((pl - b * k * (k + 1) * (k + 1) / 4.0) /
        |        sqrt(b * k * k * (k + 1) * (k * k - 1) / 144.0)
        |        + 1e-9, 6) AS z
        |FROM l, bk""") { c =>
      val cell = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("j"))
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
          .cast("long")).as("s"), count(lit(1)).as("n"))
      val r = cell.as("a")
        .join(cell.as("b"),
          col("a.seg") === col("b.seg") && col("a.j") =!= col("b.j"))
        .groupBy(col("a.seg"), col("a.j"))
        .agg((lit(1L) + sum(when(
          col("b.s").cast("decimal(38,0)") * col("a.n") <
            col("a.s").cast("decimal(38,0)") * col("b.n") ||
            (col("b.s").cast("decimal(38,0)") * col("a.n") ===
              col("a.s").cast("decimal(38,0)") * col("b.n") &&
              col("b.j") < col("a.j")), 1L).otherwise(0L))).as("rk"))
      val l = r.agg(sum(col("j") * col("rk")).as("pl"))
      val bk = cell.agg(countDistinct(col("seg")).as("b"),
        lit(5L).as("k"))
      l.crossJoin(broadcast(bk))
        .select(col("b"), col("k"), col("pl").as("page_l"),
          expr("(b * k * (k + 1) * (k + 1)) div 4").as("e_l"),
          r6((col("pl") - col("b") * col("k") * (col("k") + 1) *
              (col("k") + 1) / lit(4.0)) /
            sqrt(col("b") * col("k") * col("k") * (col("k") + 1) *
              (col("k") * col("k") - 1) / lit(144.0))).as("z"))
    },

    // Cramér's V + chi-square independence on the (returnflag ×
    // linestatus) contingency table (Cramér 1946) — the categorical-
    // association screen. One hash aggregation to the r×c (=3×2) cell
    // table; chi² via the identity χ² = N·(Σ o²/(rᵢ·cⱼ) − 1) with the
    // 6 cell terms folded in PINNED (rf, ls) order (the bartlett
    // device — no order-dependent double sum), V = √(χ²/(N·min(r−1,
    // c−1))). Cell counts and margins are exact integers; the fold
    // terms are one fixed expression tree per engine.
    q("stat_cramers_v",
      """WITH ct AS (SELECT l_returnflag rf, l_linestatus ls,
        |              count(*)::BIGINT o
        |            FROM lineitem GROUP BY 1, 2),
        |mg AS (SELECT rf, sum(o)::BIGINT ri FROM ct GROUP BY 1),
        |mc AS (SELECT ls, sum(o)::BIGINT cj FROM ct GROUP BY 1),
        |tot AS (SELECT sum(o)::BIGINT n,
        |          count(DISTINCT rf)::BIGINT r,
        |          count(DISTINCT ls)::BIGINT c FROM ct),
        |term AS (SELECT ct.rf, ct.ls,
        |           ct.o::DOUBLE * ct.o / (mg.ri::DOUBLE * mc.cj) t
        |         FROM ct JOIN mg USING (rf) JOIN mc USING (ls)),
        |s AS (SELECT list_reduce(list(t ORDER BY rf, ls),
        |        (a, x) -> a + x) st FROM term)
        |SELECT n, r, c,
        |  round(n * (st - 1) + 1e-9, 6) AS chi2,
        |  (r - 1) * (c - 1) AS dof,
        |  round(sqrt((st - 1) / least(r - 1, c - 1)) + 1e-9, 6)
        |    AS cramers_v
        |FROM s, tot""") { c =>
      val ct = c.lineitem.groupBy(col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls")).agg(count(lit(1)).as("o"))
      val mg = ct.groupBy("rf").agg(sum(col("o")).as("ri"))
      val mc = ct.groupBy("ls").agg(sum(col("o")).as("cj"))
      val tot = ct.agg(sum(col("o")).as("n"),
        countDistinct(col("rf")).as("r"),
        countDistinct(col("ls")).as("c"))
      val term = ct.join(broadcast(mg), Seq("rf"))
        .join(broadcast(mc), Seq("ls"))
        .select(col("rf"), col("ls"),
          (col("o").cast("double") * col("o") /
            (col("ri").cast("double") * col("cj"))).as("t"))
      val s = term.agg(expr(
        "aggregate(array_sort(collect_list(named_struct(" +
          "'rf', rf, 'ls', ls, 't', t))), cast(0.0 as double), " +
          "(a, x) -> a + x.t)").as("st"))
      s.crossJoin(broadcast(tot))
        .select(col("n"), col("r"), col("c"),
          r6(col("n") * (col("st") - 1)).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          r6(sqrt((col("st") - 1) /
            least(col("r") - 1, col("c") - 1))).as("cramers_v"))
    },

    // Two-sample Cramér–von Mises (Anderson 1962, ECDF form with
    // multiplicity-weighted pooled points) — the INTEGRATED-squared
    // ECDF-distance sibling of stat_kuiper's sup-distance: T =
    // Σ_pooled (Fx − Fy)² · nm / N² = Σ_v cnt_v·d_v² / (nm·N²) with
    // d_v = cumx·ny − cumy·nx on the ≤50-row quantity histogram —
    // EXACT integer arithmetic (d² carried through HUGEINT /
    // DECIMAL(38,0): d ≤ nm is SF², d² SF⁴ — 38 digits holds to
    // ~SF100 lineitem) with ONE division at the end, so the statistic
    // is bit-deterministic at any partitioning. Same returned-vs-kept
    // framing as kuiper/KS; CvM weighs the whole distance profile
    // where kuiper takes the two extremes.
    q("stat_cvm",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny FROM h),
        |c AS (SELECT v, cx + cy cnt,
        |        sum(cx) OVER (ORDER BY v) cumx,
        |        sum(cy) OVER (ORDER BY v) cumy
        |      FROM h),
        |d AS (SELECT sum((cnt::HUGEINT) *
        |               ((cumx::HUGEINT * ny - cumy::HUGEINT * nx) *
        |                (cumx::HUGEINT * ny - cumy::HUGEINT * nx))) sd2
        |      FROM c, t)
        |SELECT nx, ny,
        |  round(sd2::DOUBLE
        |        / ((nx::HUGEINT * ny * (nx + ny) * (nx + ny))::DOUBLE)
        |        + 1e-9, 6) AS cvm_t,
        |  round(sd2::DOUBLE
        |        / ((nx::HUGEINT * ny * (nx + ny) * (nx + ny))::DOUBLE)
        |        - (4.0 * nx * ny - 1) / (6.0 * (nx + ny)) / (nx + ny)
        |        + 1e-9, 6) AS cvm_t_adj
        |FROM d, t""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
      val w = Window.orderBy("v")
      val cum = h.select(col("v"), (col("cx") + col("cy")).as("cnt"),
        sum(col("cx")).over(w).as("cumx"),
        sum(col("cy")).over(w).as("cumy"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val dv = dec(col("cumx")) * col("ny") - dec(col("cumy")) * col("nx")
      val d = cum.crossJoin(broadcast(t))
        .agg(sum(dec(col("cnt")) * (dv * dv)).as("sd2"),
          first(col("nx")).as("nx"), first(col("ny")).as("ny"))
      val nn = (dec(col("nx")) * col("ny") *
        (col("nx") + col("ny")) * (col("nx") + col("ny"))).cast("double")
      d.select(col("nx"), col("ny"),
        r6(col("sd2").cast("double") / nn).as("cvm_t"),
        r6(col("sd2").cast("double") / nn -
          (lit(4.0) * col("nx") * col("ny") - 1) /
            (lit(6.0) * (col("nx") + col("ny"))) /
            (col("nx") + col("ny"))).as("cvm_t_adj"))
    },

    // Cliff's delta + Vargha–Delaney Â (Cliff 1993; Vargha & Delaney
    // 2000) — the nonparametric EFFECT SIZES the rank tests above
    // only p-value: δ = P(X>Y) − P(X<Y) and Â = P(X>Y) + ½P(X=Y) for
    // returned vs kept quantities. No pair join at all: on the ≤50-row
    // histogram, #{X>Y} = Σᵥ cxᵥ·cumy(<v) and ties = Σᵥ cxᵥ·cyᵥ via
    // ONE prefix window — exact integer sums through HUGEINT /
    // DECIMAL(38,0) (the counts are SF-linear so products are SF²),
    // one division each at the end.
    q("stat_cliffs_delta",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny FROM h),
        |c AS (SELECT v, cx, cy,
        |        coalesce(sum(cy) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          cyb
        |      FROM h),
        |s AS (SELECT sum(cx::HUGEINT * cyb) gt,
        |             sum(cx::HUGEINT * cy) tie,
        |             sum(cx::HUGEINT * (ny - cyb - cy)) lt
        |      FROM c, t)
        |SELECT nx, ny,
        |  round((gt - lt)::DOUBLE / ((nx::HUGEINT * ny)::DOUBLE)
        |        + 1e-9, 6) AS cliffs_delta,
        |  round((gt + 0.5 * tie) / ((nx::HUGEINT * ny)::DOUBLE)
        |        + 1e-9, 6) AS vd_a
        |FROM s, t""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
      val wb = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = h.select(col("v"), col("cx"), col("cy"),
        coalesce(sum(col("cy")).over(wb), lit(0L)).as("cyb"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val s = cum.crossJoin(broadcast(t)).agg(
        sum(dec(col("cx")) * col("cyb")).as("gt"),
        sum(dec(col("cx")) * col("cy")).as("tie"),
        sum(dec(col("cx")) * (col("ny") - col("cyb") - col("cy")))
          .as("lt"))
      s.crossJoin(broadcast(t))
        .select(col("nx"), col("ny"),
          r6((col("gt") - col("lt")).cast("double") /
            (dec(col("nx")) * col("ny")).cast("double"))
            .as("cliffs_delta"),
          r6((col("gt") + lit(0.5) * col("tie")) /
            (dec(col("nx")) * col("ny")).cast("double")).as("vd_a"))
    },

    // Paired sign test (Arbuthnot 1710; the assumption-free paired
    // location test under Wilcoxon signed-rank) — does the BUILDING
    // segment out-earn the MACHINERY segment on the same calendar
    // day? Pairs join on exact day; STRICT integer-cents compares
    // (ties counted and dropped, the classical treatment); the
    // statistic is the binomial normal approximation z = (2k − n)/√n
    // — one fixed double tree over exact integers.
    q("stat_sign_test",
      """WITH r AS (SELECT o.o_orderdate dy, c.c_mktsegment seg,
        |    sum(CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  GROUP BY 1, 2),
        |p AS (SELECT a.dy, a.cents xa, b.cents xb
        |      FROM r a JOIN r b ON a.dy = b.dy
        |      WHERE a.seg = 'BUILDING' AND b.seg = 'MACHINERY'),
        |s AS (SELECT count(*)::BIGINT n_days,
        |        sum(CASE WHEN xa > xb THEN 1 ELSE 0 END)::BIGINT k,
        |        sum(CASE WHEN xa = xb THEN 1 ELSE 0 END)::BIGINT t
        |      FROM p)
        |SELECT n_days, k AS n_building_wins, t AS n_ties,
        |  round(k * 1.0 / (n_days - t) + 1e-9, 6) AS win_rate,
        |  round((2.0 * k - (n_days - t)) / sqrt(n_days - t) + 1e-9, 6)
        |    AS z
        |FROM s""") { c =>
      val r = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(col("o_orderdate").as("dy"),
          col("c_mktsegment").as("seg"))
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
          .cast("long")).as("cents"))
        .localCheckpoint()
      val p = r.filter(col("seg") === "BUILDING").as("a")
        .join(r.filter(col("seg") === "MACHINERY").as("b"),
          col("a.dy") === col("b.dy"))
        .select(col("a.cents").as("xa"), col("b.cents").as("xb"))
      val s = p.agg(count(lit(1)).as("n_days"),
        sum(when(col("xa") > col("xb"), 1L).otherwise(0L)).as("k"),
        sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("t"))
      s.select(col("n_days"), col("k").as("n_building_wins"),
        col("t").as("n_ties"),
        r6(col("k") * lit(1.0) / (col("n_days") - col("t")))
          .as("win_rate"),
        r6((lit(2.0) * col("k") - (col("n_days") - col("t"))) /
          sqrt(col("n_days") - col("t"))).as("z"))
    },

    // External clustering evaluation — Adjusted Rand Index (Hubert &
    // Arabie 1985) + purity between two derived partitions of the
    // document corpus (length terciles vs language): ARI is PURE
    // integer pair-counting — Σij C(nij,2), row/column C(·,2) sums,
    // and the expected-index correction, all exact (HUGEINT /
    // DECIMAL(38,0) for the products) with one division; purity is
    // Σ_clusters max_j nij / N, an exact integer ratio via one
    // grouped max. The contingency table is (3 terciles × languages)
    // — model-sized; one corpus aggregation feeds everything.
    q("ml_rand_index",
      """WITH d AS (SELECT doc_id, lang,
        |    CASE WHEN n_chars < 200 THEN 0
        |         WHEN n_chars < 350 THEN 1 ELSE 2 END cl
        |  FROM documents),
        |ct AS (SELECT cl, lang, count(*)::BIGINT nij
        |       FROM d GROUP BY 1, 2),
        |ra AS (SELECT cl, sum(nij)::BIGINT ai FROM ct GROUP BY 1),
        |cb AS (SELECT lang, sum(nij)::BIGINT bj FROM ct GROUP BY 1),
        |t AS (SELECT sum(nij)::BIGINT n FROM ct),
        |sums AS (SELECT
        |    (SELECT sum(nij::HUGEINT * (nij - 1)) FROM ct) // 2 sij,
        |    (SELECT sum(ai::HUGEINT * (ai - 1)) FROM ra) // 2 sa,
        |    (SELECT sum(bj::HUGEINT * (bj - 1)) FROM cb) // 2 sb,
        |    (SELECT (n::HUGEINT * (n - 1)) // 2 FROM t) st),
        |pur AS (SELECT sum(mx)::BIGINT pn FROM
        |        (SELECT cl, max(nij) mx FROM ct GROUP BY 1))
        |SELECT n,
        |  round(pn * 1.0 / n + 1e-9, 6) AS purity,
        |  round((sij::DOUBLE - sa::DOUBLE * sb / st::DOUBLE)
        |        / ((sa::DOUBLE + sb) / 2 - sa::DOUBLE * sb / st::DOUBLE)
        |        + 1e-9, 6) AS ari
        |FROM sums, t, pur""") { c =>
      val d = c.documents.select(col("doc_id"), col("lang"),
        when(col("n_chars") < 200, 0).when(col("n_chars") < 350, 1)
          .otherwise(2).as("cl"))
      val ct = d.groupBy("cl", "lang").agg(count(lit(1)).as("nij"))
        .localCheckpoint()
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      def c2(x: org.apache.spark.sql.Column) =
        (dec(x) * (x - 1)).cast("decimal(38,0)")
      val sij = ct.agg((sum(c2(col("nij"))) / 2).cast("decimal(38,0)")
        .as("sij"))
      val sa = ct.groupBy("cl").agg(sum(col("nij")).as("ai"))
        .agg((sum(c2(col("ai"))) / 2).cast("decimal(38,0)").as("sa"))
      val sb = ct.groupBy("lang").agg(sum(col("nij")).as("bj"))
        .agg((sum(c2(col("bj"))) / 2).cast("decimal(38,0)").as("sb"))
      val t = ct.agg(sum(col("nij")).as("n"))
      val st = t.select(col("n"),
        ((dec(col("n")) * (col("n") - 1)) / 2).cast("decimal(38,0)")
          .as("st"))
      val pur = ct.groupBy("cl").agg(max(col("nij")).as("mx"))
        .agg(sum(col("mx")).as("pn"))
      val exp = col("sa").cast("double") * col("sb") /
        col("st").cast("double")
      sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .crossJoin(broadcast(st)).crossJoin(broadcast(pur))
        .select(col("n"),
          r6(col("pn") * lit(1.0) / col("n")).as("purity"),
          r6((col("sij").cast("double") - exp) /
            ((col("sa").cast("double") + col("sb")) / 2 - exp))
            .as("ari"))
    },

    // Quade test (Quade 1979) — the blocked-design rank test that
    // WEIGHTS blocks by their range, the higher-power alternative to
    // stat_friedman when block effect sizes differ (here: do order
    // priorities shift per-nation mean order value, weighting nations
    // by how much their priorities differ at all?). Same n×k cell
    // relation as friedman/nemenyi; within-block treatment ranks r and
    // block-range ranks Q come from row_number over the n·k-row model
    // relation; the statistic runs on the DOUBLED scores T = Q·(2r −
    // k − 1) so every sum is an exact integer, and F₃ = (n−1)·ΣⱼSⱼ² /
    // (n·ΣT² − ΣⱼSⱼ²) is one exact integer ratio (the ×4 scale
    // cancels).
    q("stat_quade",
      """WITH cell AS (SELECT c.c_nationkey b, o.o_orderpriority tr,
        |    sum(CAST(round(o.o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT s,
        |    count(*)::BIGINT n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT b, tr,
        |    row_number() OVER (PARTITION BY b
        |      ORDER BY s * 1.0 / n, tr) r
        |  FROM cell),
        |rg AS (SELECT b, max(s * 1.0 / n) - min(s * 1.0 / n) rng
        |       FROM cell GROUP BY 1),
        |qk AS (SELECT b, row_number() OVER (ORDER BY rng, b) q FROM rg),
        |nb AS (SELECT count(DISTINCT b)::BIGINT n,
        |         count(DISTINCT tr)::BIGINT k FROM cell),
        |sc AS (SELECT rk.b, rk.tr,
        |         (qk.q * (2 * rk.r - nb.k - 1))::BIGINT t2
        |       FROM rk JOIN qk USING (b), nb),
        |sj AS (SELECT tr, sum(t2)::BIGINT sj2 FROM sc GROUP BY 1),
        |ag AS (SELECT (SELECT sum(t2 * t2) FROM sc)::BIGINT a4,
        |              (SELECT sum(sj2 * sj2) FROM sj)::BIGINT b4)
        |SELECT nb.n AS n_blocks, nb.k AS k_treatments,
        |  round((nb.n - 1) * b4 * 1.0 / (nb.n * a4 - b4) + 1e-9, 6)
        |    AS quade_f
        |FROM ag, nb""") { c =>
      val cell = c.orders
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("b"),
          col("o_orderpriority").as("tr"))
        .agg(sum(round(col("o_totalprice") * 100 + lit(1e-9))
            .cast("long")).as("s"),
          count(lit(1)).as("n"))
        .localCheckpoint()
      val wr = Window.partitionBy("b")
        .orderBy(col("s") * lit(1.0) / col("n"), col("tr"))
      val rk = cell.select(col("b"), col("tr"),
        row_number().over(wr).cast("long").as("r"))
      val rg = cell.groupBy("b").agg(
        (max(col("s") * lit(1.0) / col("n")) -
          min(col("s") * lit(1.0) / col("n"))).as("rng"))
      val qk = rg.select(col("b"), row_number()
        .over(Window.orderBy(col("rng"), col("b"))).cast("long").as("q"))
      val nb = cell.agg(countDistinct(col("b")).as("n"),
        countDistinct(col("tr")).as("k"))
      val sc = rk.join(qk, Seq("b")).crossJoin(broadcast(nb))
        .select(col("b"), col("tr"),
          (col("q") * (lit(2L) * col("r") - col("k") - 1)).as("t2"))
      val a4 = sc.agg(sum(col("t2") * col("t2")).as("a4"))
      val b4 = sc.groupBy("tr").agg(sum(col("t2")).as("sj2"))
        .agg(sum(col("sj2") * col("sj2")).as("b4"))
      nb.crossJoin(broadcast(a4)).crossJoin(broadcast(b4))
        .select(col("n").as("n_blocks"), col("k").as("k_treatments"),
          r6((col("n") - 1) * col("b4") * lit(1.0) /
            (col("n") * col("a4") - col("b4"))).as("quade_f"))
    },

    // Mood's squared-rank scale test (Mood 1954) — the companion to
    // stat_ansari_bradley with the QUADRATIC score a(r) = (r−(N+1)/2)²
    // in place of Ansari's double-ended min-rank (heavier tail weight;
    // the classical pairing in the rank-scale family), ties averaged
    // per block exactly as there. The cumulative score prefix has the
    // closed form 3·S₂(t) = 2t(t+1)(2t+1) − 6(N+1)t(t+1) + 3t(N+1)²
    // on the DOUBLED residuals u = 2r−(N+1) (so every block sum is an
    // exact integer, carried through HUGEINT / DECIMAL(38,0) — the
    // prefix is CUBIC in N and passes 2^63 near N~2M); each block's
    // average score is one exact ratio bs₃/(12c), and T, E[T] =
    // nx·ā̄, Var = nx·ny(Σc·ā² − N·ā̄²)/(N(N−1)) fold those ratios in
    // PINNED v order (the bartlett device) before the one
    // studentization; the GLOBAL mean score uses the closed identity
    // 3·S₂(N) = N(N²−1) ⇒ ā̄ = (N²−1)/12, a small-double expression
    // both engines evaluate bit-identically. Same returned-vs-kept
    // quantity histogram fixture as ansari/kuiper/cvm.
    q("stat_mood_scale",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny,
        |        sum(cx + cy)::BIGINT n FROM h),
        |cw AS (SELECT v, cx, cy, cx + cy c,
        |        coalesce(sum(cx + cy) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb
        |      FROM h),
        |fb AS (SELECT v, cx, cy, c, cb, n, nx, ny,
        |        (2 * (cb + c)::HUGEINT * (cb + c + 1) * (2 * (cb + c) + 1)
        |         - 6 * (n + 1)::HUGEINT * (cb + c) * (cb + c + 1)
        |         + 3 * (cb + c)::HUGEINT * (n + 1) * (n + 1))
        |        - (2 * cb::HUGEINT * (cb + 1) * (2 * cb + 1)
        |           - 6 * (n + 1)::HUGEINT * cb * (cb + 1)
        |           + 3 * cb::HUGEINT * (n + 1) * (n + 1)) bs3
        |      FROM cw, t),
        |fold AS (SELECT
        |    list_reduce(list(cx * (bs3 * 1.0 / (c * 12)) ORDER BY v),
        |      (a, x) -> a + x) tt,
        |    list_reduce(list(c * (bs3 * 1.0 / (c * 12))
        |                       * (bs3 * 1.0 / (c * 12)) ORDER BY v),
        |      (a, x) -> a + x) sa2,
        |    max(n) n, max(nx) nx, max(ny) ny
        |  FROM fb),
        |md AS (SELECT nx, ny, n, tt, sa2,
        |        (n::DOUBLE * n - 1) / 12 abar
        |      FROM fold)
        |SELECT nx, ny, round(tt + 1e-9, 4) AS mood_t,
        |  round(nx * abar + 1e-9, 4) AS e_t,
        |  round((tt - nx * abar)
        |        / sqrt(nx::DOUBLE * ny * (sa2 - n * abar * abar)
        |               / (n * (n - 1.0))) + 1e-9, 6) AS z
        |FROM md""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"),
        sum(col("cx") + col("cy")).as("n"))
      val wb = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cw = h.select(col("v"), col("cx"), col("cy"),
        (col("cx") + col("cy")).as("c"),
        coalesce(sum(col("cx") + col("cy")).over(wb), lit(0L)).as("cb"))
      // 3·S2 prefix in decimal(38,0) — cubic in N, BIGINT dies at ~2M
      val fb = cw.crossJoin(broadcast(t)).selectExpr("v", "cx", "cy",
        "c", "cb", "n", "nx", "ny",
        """((2 * cast(cb + c as decimal(38,0)) * (cb + c + 1)
          |    * (2 * (cb + c) + 1)
          |  - 6 * cast(n + 1 as decimal(38,0)) * (cb + c) * (cb + c + 1)
          |  + 3 * cast(cb + c as decimal(38,0)) * (n + 1) * (n + 1))
          | - (2 * cast(cb as decimal(38,0)) * (cb + 1) * (2 * cb + 1)
          |  - 6 * cast(n + 1 as decimal(38,0)) * cb * (cb + 1)
          |  + 3 * cast(cb as decimal(38,0)) * (n + 1) * (n + 1)))
          | AS bs3""".stripMargin.replace("\n", " "))
      val fold = fb.agg(
        aggregate(array_sort(collect_list(struct(col("v"),
            (col("cx") * (col("bs3") * lit(1.0) / (col("c") * 12)))
              .as("tm")))),
          lit(0.0), (a, x) => a + x.getField("tm")).as("tt"),
        aggregate(array_sort(collect_list(struct(col("v"),
            (col("c") * (col("bs3") * lit(1.0) / (col("c") * 12)) *
              (col("bs3") * lit(1.0) / (col("c") * 12))).as("tm")))),
          lit(0.0), (a, x) => a + x.getField("tm")).as("sa2"),
        max(col("n")).as("n"), max(col("nx")).as("nx"),
        max(col("ny")).as("ny"))
      // mean score has the closed identity 3*S2(N) = N(N^2-1), so
      // abar = (N^2-1)/12 — a SMALL-double expression both engines
      // evaluate bit-identically (N^2 < 2^53 far beyond any SF here;
      // the wide-decimal route divided by 12N was 13 ulps apart
      // across engines at 2.7e12 magnitude)
      val md = fold.selectExpr("nx", "ny", "n", "tt", "sa2",
        "((cast(n as double) * n - 1) / 12) AS abar")
      md.select(col("nx"), col("ny"), r4(col("tt")).as("mood_t"),
        r4(col("nx") * col("abar")).as("e_t"),
        r6((col("tt") - col("nx") * col("abar")) /
          sqrt(col("nx").cast("double") * col("ny") *
            (col("sa2") - col("n") * col("abar") * col("abar")) /
            (col("n") * (col("n") - lit(1.0))))).as("z"))
    },

    // 1-D Wasserstein / earth-mover distance (Kantorovich 1942;
    // W₁ = ∫|Fx − Fy| dv) between returned and kept quantity
    // distributions — the TRANSPORT-COST lens beside kuiper's sup and
    // cvm's integrated square: on the ≤50-row histogram, each
    // inter-value segment contributes |cumx·ny − cumy·nx| · gap in
    // EXACT integers (HUGEINT / DECIMAL(38,0) — the cross-product is
    // SF²), with the single division by nx·ny at the end — bit-exact
    // at any partitioning, no folds needed (integer sums commute).
    q("stat_wasserstein",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny FROM h),
        |c AS (SELECT v, lead(v) OVER (ORDER BY v) nv,
        |        sum(cx) OVER (ORDER BY v) cumx,
        |        sum(cy) OVER (ORDER BY v) cumy
        |      FROM h),
        |d AS (SELECT sum(abs(cumx::HUGEINT * ny - cumy::HUGEINT * nx)
        |               * (nv - v)) sw
        |      FROM c, t WHERE nv IS NOT NULL)
        |SELECT nx, ny,
        |  round(sw::DOUBLE / ((nx::HUGEINT * ny)::DOUBLE) + 1e-9, 6)
        |    AS w1
        |FROM d, t""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
        sum(lit(1L) - col("gx")).as("cy"))
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
      val w = Window.orderBy("v")
      val cum = h.select(col("v"), lead(col("v"), 1).over(w).as("nv"),
        sum(col("cx")).over(w).as("cumx"),
        sum(col("cy")).over(w).as("cumy"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val d = cum.crossJoin(broadcast(t)).filter(col("nv").isNotNull)
        .agg(sum(abs(dec(col("cumx")) * col("ny") -
          dec(col("cumy")) * col("nx")) * (col("nv") - col("v")))
          .as("sw"), first(col("nx")).as("nx"),
          first(col("ny")).as("ny"))
      d.select(col("nx"), col("ny"),
        r6(col("sw").cast("double") /
          (dec(col("nx")) * col("ny")).cast("double")).as("w1"))
    },

    // Energy distance (Székely & Rizzo 2004) between returned and
    // kept quantities — the DISTANCE-BASED two-sample test (consistent
    // against ANY alternative, where rank tests see only location/
    // scale): e = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, each expectation an
    // EXACT integer sum Σ c_u·c_v·|u−v| over the ≤50×50 histogram
    // pair lattice (HUGEINT / DECIMAL(38,0) — counts are SF-linear so
    // products are SF²) divided once; the test statistic scales by
    // nx·ny/(nx+ny). The pair join is value-domain bounded (≤50 rows
    // a side — allowlisted with an executed bound in PlanAuditSpec).
    q("stat_energy_distance",
      """WITH li AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END gx,
        |    CAST(l_quantity AS BIGINT) v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |h AS (SELECT v, sum(gx)::BIGINT cx, sum(1 - gx)::BIGINT cy
        |      FROM li GROUP BY 1),
        |t AS (SELECT sum(cx)::BIGINT nx, sum(cy)::BIGINT ny FROM h),
        |p AS (SELECT a.v av, b.v bv, a.cx acx, a.cy acy,
        |             b.cx bcx, b.cy bcy
        |      FROM h a, h b),
        |s AS (SELECT
        |        sum(acx::HUGEINT * bcy * abs(av - bv)) sxy,
        |        sum(acx::HUGEINT * bcx * abs(av - bv)) sxx,
        |        sum(acy::HUGEINT * bcy * abs(av - bv)) syy
        |      FROM p)
        |SELECT nx, ny,
        |  round(2.0 * sxy / ((nx::HUGEINT * ny)::DOUBLE)
        |        - sxx::DOUBLE / ((nx::HUGEINT * nx)::DOUBLE)
        |        - syy::DOUBLE / ((ny::HUGEINT * ny)::DOUBLE)
        |        + 1e-9, 6) AS energy_e,
        |  round((nx::DOUBLE * ny / (nx + ny))
        |        * (2.0 * sxy / ((nx::HUGEINT * ny)::DOUBLE)
        |           - sxx::DOUBLE / ((nx::HUGEINT * nx)::DOUBLE)
        |           - syy::DOUBLE / ((ny::HUGEINT * ny)::DOUBLE))
        |        + 1e-9, 4) AS energy_t
        |FROM s, t""") { c =>
      val li = c.lineitem.filter(col("l_returnflag").isin("R", "N"))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("gx"),
          col("l_quantity").cast("long").as("v"))
      val h = li.groupBy("v").agg(sum(col("gx")).as("cx"),
          sum(lit(1L) - col("gx")).as("cy"))
        .localCheckpoint()
      val t = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val p = h.as("a").crossJoin(broadcast(h.as("b")))
      val s = p.agg(
        sum(dec(col("a.cx")) * col("b.cy") *
          abs(col("a.v") - col("b.v"))).as("sxy"),
        sum(dec(col("a.cx")) * col("b.cx") *
          abs(col("a.v") - col("b.v"))).as("sxx"),
        sum(dec(col("a.cy")) * col("b.cy") *
          abs(col("a.v") - col("b.v"))).as("syy"))
      val e = lit(2.0) * col("sxy") /
        (dec(col("nx")) * col("ny")).cast("double") -
        col("sxx").cast("double") /
          (dec(col("nx")) * col("nx")).cast("double") -
        col("syy").cast("double") /
          (dec(col("ny")) * col("ny")).cast("double")
      s.crossJoin(broadcast(t))
        .select(col("nx"), col("ny"),
          r6(e).as("energy_e"),
          r4((col("nx").cast("double") * col("ny") /
            (col("nx") + col("ny"))) * e).as("energy_t"))
    },

    // Delete-one-group (grouped) jackknife CI for the mean order
    // value (Quenouille 1956 / Tukey 1958; the deterministic
    // resampling-inference member next to the closed-form CIs): 10
    // folds by the PORTABLE md5 bucket of o_orderkey (the split_lib
    // hash seam — never a random resample), each leave-one-fold-out
    // mean is one exact integer ratio (S−sᵢ)/(N−nᵢ) in cents, and the
    // jackknife variance (g−1)/g·Σ(θ̂₍ᵢ₎−θ̂₍·₎)² folds the 10 ratios
    // in PINNED fold order. CI uses the pinned 1.96 normal quantile.
    q("ab_jackknife_ci",
      """WITH o AS (SELECT
        |    ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT
        |      % 10 f,
        |    CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) cents
        |  FROM orders),
        |g AS (SELECT f, count(*)::BIGINT n, sum(cents)::BIGINT s
        |      FROM o GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT tn, sum(s)::BIGINT ts FROM g),
        |l AS (SELECT f, (ts - s) * 1.0 / (tn - n) th FROM g, t),
        |m AS (SELECT list_reduce(list(th ORDER BY f),
        |        (a, x) -> a + x) / 10 thbar FROM l),
        |v AS (SELECT list_reduce(list((th - thbar) * (th - thbar)
        |                              ORDER BY f),
        |        (a, x) -> a + x) * 9 / 10 jvar FROM l, m)
        |SELECT tn AS n,
        |  round(ts * 1.0 / tn / 100 + 1e-9, 4) AS theta,
        |  round(sqrt(jvar) / 100 + 1e-9, 6) AS se_jack,
        |  round((ts * 1.0 / tn - 1.96 * sqrt(jvar)) / 100 + 1e-9, 4)
        |    AS ci_lo,
        |  round((ts * 1.0 / tn + 1.96 * sqrt(jvar)) / 100 + 1e-9, 4)
        |    AS ci_hi
        |FROM t, v""") { c =>
      val o = c.orders.select(
        (conv(substring(md5(col("o_orderkey").cast("string")), 1, 8),
          16, 10).cast("long") % 10).as("f"),
        round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
          .as("cents"))
      val g = o.groupBy("f").agg(count(lit(1)).as("n"),
        sum(col("cents")).as("s"))
      val t = g.agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"))
      val l = g.crossJoin(broadcast(t))
        .select(col("f"),
          ((col("ts") - col("s")) * lit(1.0) / (col("tn") - col("n")))
            .as("th"))
      val m = l.agg((expr(
        "aggregate(array_sort(collect_list(named_struct(" +
          "'f', f, 'th', th))), cast(0.0 as double), " +
          "(a, x) -> a + x.th)") / 10).as("thbar"))
      val v = l.crossJoin(broadcast(m))
        .agg((expr(
          "aggregate(array_sort(collect_list(named_struct(" +
            "'f', f, 'tm', (th - thbar) * (th - thbar)))), " +
            "cast(0.0 as double), (a, x) -> a + x.tm)") * 9 / 10)
          .as("jvar"))
      t.crossJoin(broadcast(v))
        .select(col("tn").as("n"),
          r4(col("ts") * lit(1.0) / col("tn") / 100).as("theta"),
          r6(sqrt(col("jvar")) / 100).as("se_jack"),
          r4((col("ts") * lit(1.0) / col("tn") -
            lit(1.96) * sqrt(col("jvar"))) / 100).as("ci_lo"),
          r4((col("ts") * lit(1.0) / col("tn") +
            lit(1.96) * sqrt(col("jvar"))) / 100).as("ci_hi"))
    },

    // KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    // Shin 1992 — the null-of-STATIONARITY complement to
    // ts_dickey_fuller's null-of-unit-root; running both is the
    // standard confirmatory pair): η = Σ_t S_t² / (m²·σ̂²) with S_t
    // the partial sums of demeaned y (the lag-0 short-run variance —
    // the textbook form). Exactness device: scale the residual by m
    // so e′ = m·y − Σy and S′_t = Σ_{≤t} e′ are EXACT BIGINTs on the
    // hourly cents grid, then η = ΣS′² / (m·Σe′²) with both
    // squared sums through DECIMAL(38,0)/HUGEINT and ONE double
    // division. Scale: one hourly aggregation, a cumsum over the
    // time-bounded hour grid, one 1-row reduction.
    q("ts_kpss",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |  FROM events GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT m, sum(y)::BIGINT s FROM h),
        |e AS (SELECT hb, t.m * y - t.s ep, t.m m FROM h, t),
        |cw AS (SELECT hb, m, ep, sum(ep) OVER (ORDER BY hb) sp FROM e),
        |a AS (SELECT max(m) m, sum(sp::HUGEINT * sp) ss2,
        |        sum(ep::HUGEINT * ep) se2 FROM cw)
        |SELECT m AS n_hours,
        |  round(ss2::DOUBLE / (m * se2::DOUBLE) + 1e-9, 6) AS kpss_eta,
        |  CASE WHEN round(ss2::DOUBLE / (m * se2::DOUBLE) + 1e-9, 6)
        |            > 0.463 THEN 1 ELSE 0 END AS reject_stationary
        |FROM a""") { c =>
      val h = c.events.select(
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cv"))
        .groupBy("hb").agg(sum(col("cv")).as("y"))
      val t = h.agg(count(lit(1)).as("m"), sum(col("y")).as("s"))
      val e = h.crossJoin(broadcast(t))
        .select(col("hb"), (col("m") * col("y") - col("s")).as("ep"),
          col("m"))
      val cw = e.withColumn("sp", sum(col("ep")).over(
        Window.orderBy("hb")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val a = cw.agg(max(col("m")).as("m"),
        sum(dec(col("sp")) * col("sp")).as("ss2"),
        sum(dec(col("ep")) * col("ep")).as("se2"))
      val eta = col("ss2").cast("double") /
        (col("m") * col("se2").cast("double"))
      a.select(col("m").as("n_hours"), r6(eta).as("kpss_eta"),
        when(r6(eta) > 0.463, 1).otherwise(0).as("reject_stationary"))
    },

    // Seasonal strength via day-of-week variance decomposition
    // (Hyndman & Athanasopoulos' STL strength-of-seasonality measure
    // specialized to the weekly cycle, computed as the classic
    // one-way η²: removing the per-DOW means from the daily series
    // leaves remainder SS = SST − SSB by the ANOVA identity, so
    // F_s = max(0, 1 − SSR/SST) = max(0, SSB/SST)). Every raw moment
    // is an exact integer (Σy BIGINT, Σy² through DECIMAL(38)); the
    // 7-term between-group sum folds in PINNED dow order; one final
    // ratio. Output: the 7 DOW rows (n, mean) + the replicated
    // strength — the practitioner's seasonality table.
    q("ts_seasonal_strength",
      """WITH d AS (SELECT o_orderdate dy, isodow(o_orderdate) dow,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT y
        |  FROM orders GROUP BY 1, 2),
        |t AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT s,
        |        sum(y::HUGEINT * y)::DOUBLE syy FROM d),
        |g AS (SELECT dow, count(*)::BIGINT nw, sum(y)::BIGINT dw
        |      FROM d GROUP BY 1),
        |b AS (SELECT list_reduce(list(dw::DOUBLE * dw / nw
        |                             ORDER BY dow),
        |               (acc, x) -> acc + x) ssbr FROM g),
        |f AS (SELECT greatest(0.0,
        |        (ssbr - s::DOUBLE * s / n) / (syy - s::DOUBLE * s / n))
        |        fs FROM b, t)
        |SELECT g.dow::BIGINT AS dow, g.nw AS n_days,
        |  round(g.dw * 1.0 / g.nw / 100 + 1e-9, 4) AS mean_dollars,
        |  round(f.fs + 1e-9, 6) AS seasonal_strength
        |FROM g, f ORDER BY dow""") { c =>
      val d = c.orders.select(col("o_orderdate").as("dy"),
          (weekday(col("o_orderdate")) + 1).as("dow"),
          expr("CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT)")
            .as("cents"))
        .groupBy("dy", "dow").agg(sum(col("cents")).as("y"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val t = d.agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum(dec(col("y")) * col("y")).cast("double").as("syy"))
      val g = d.groupBy("dow").agg(count(lit(1)).as("nw"),
        sum(col("y")).as("dw"))
      val b = g.agg(aggregate(array_sort(collect_list(struct(col("dow"),
          (col("dw").cast("double") * col("dw") / col("nw")).as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t")).as("ssbr"))
      val f = b.crossJoin(broadcast(t)).select(
        greatest(lit(0.0),
          (col("ssbr") - col("s").cast("double") * col("s") / col("n")) /
            (col("syy") - col("s").cast("double") * col("s") / col("n")))
          .as("fs"))
      g.crossJoin(broadcast(f))
        .select(col("dow").cast("long").as("dow"),
          col("nw").as("n_days"),
          r4(col("dw") * lit(1.0) / col("nw") / 100).as("mean_dollars"),
          r6(col("fs")).as("seasonal_strength"))
        .orderBy("dow")
    },

    // Welch's heteroscedastic one-way ANOVA (Welch 1951 — the
    // unequal-variances F test that stat_anova's classical F assumes
    // away; the k-sample sibling of stat_ab_ttest's Welch t): weights
    // w_i = n_i/s_i², weighted grand mean, F* with the Welch
    // correction term Λ = Σ(1 − w_i/Σw)²/(n_i − 1), df2 = (k²−1)/3Λ.
    // Every raw moment is an exact integer (Σy BIGINT, Σy² through
    // DECIMAL(38)); the three k-term folds run in PINNED flag order
    // (the aggregate/array_sort ≡ list_reduce ORDER BY device), so
    // the libm-free part is bit-identical and the final statistic is
    // one pinned double expression.
    q("stat_welch_anova",
      """WITH s AS (SELECT l_returnflag f, count(*)::BIGINT n,
        |             sum(l_quantity::BIGINT)::BIGINT sy,
        |             sum(l_quantity::BIGINT * l_quantity::BIGINT)
        |               ::BIGINT qq
        |           FROM lineitem GROUP BY 1),
        |g AS (SELECT f, n, sy * 1.0 / n mu,
        |        (n * qq - sy::HUGEINT * sy)::DOUBLE / (n * (n - 1.0))
        |          s2
        |      FROM s),
        |w AS (SELECT f, n, mu, n / s2 wi FROM g),
        |t AS (SELECT count(*)::BIGINT k,
        |        list_reduce(list(wi ORDER BY f), (a, x) -> a + x) sw,
        |        list_reduce(list(wi * mu ORDER BY f),
        |          (a, x) -> a + x) swm
        |      FROM w),
        |l AS (SELECT k, sw, swm / sw mw,
        |        (SELECT list_reduce(
        |           list((1 - wi / t.sw) * (1 - wi / t.sw) / (n - 1)
        |                ORDER BY f), (a, x) -> a + x) FROM w) lam
        |      FROM t),
        |f2 AS (SELECT k, sw, mw, lam,
        |        (SELECT list_reduce(
        |           list(wi * (mu - l.mw) * (mu - l.mw) ORDER BY f),
        |           (a, x) -> a + x) FROM w) num
        |      FROM l)
        |SELECT k, round(mw + 1e-9, 6) AS weighted_mean,
        |  round((num / (k - 1))
        |        / (1 + 2.0 * (k - 2) / (k * k - 1) * lam) + 1e-9, 4)
        |    AS f_star,
        |  round((k * k - 1.0) / (3 * lam) + 1e-9, 2) AS df2
        |FROM f2""") { c =>
      val s = c.lineitem.select(col("l_returnflag").as("f"),
          col("l_quantity").cast("long").as("y"))
        .groupBy("f").agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("qq"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val g = s.select(col("f"), col("n"),
        (col("sy") * lit(1.0) / col("n")).as("mu"),
        ((col("n") * col("qq") - dec(col("sy")) * col("sy"))
          .cast("double") / (col("n") * (col("n") - lit(1.0))))
          .as("s2"))
      val w = g.select(col("f"), col("n"), col("mu"),
        (col("n") / col("s2")).as("wi"))
      def pinned(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("f"),
            term.as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t"))
      val t = w.agg(count(lit(1)).as("k"), pinned(col("wi")).as("sw"),
        pinned(col("wi") * col("mu")).as("swm"))
      val l = w.crossJoin(broadcast(t)).agg(
        max(col("k")).as("k"), max(col("sw")).as("sw"),
        max(col("swm") / col("sw")).as("mw"),
        pinned((lit(1) - col("wi") / col("sw")) *
          (lit(1) - col("wi") / col("sw")) / (col("n") - 1)).as("lam"))
      val f2 = w.crossJoin(broadcast(l)).agg(
        max(col("k")).as("k"), max(col("mw")).as("mw"),
        max(col("lam")).as("lam"),
        pinned(col("wi") * (col("mu") - col("mw")) *
          (col("mu") - col("mw"))).as("num"))
      f2.select(col("k"), r6(col("mw")).as("weighted_mean"),
        r4((col("num") / (col("k") - 1)) /
          (lit(1) + lit(2.0) * (col("k") - 2) /
            (col("k") * col("k") - 1) * col("lam"))).as("f_star"),
        r2((col("k") * col("k") - lit(1.0)) / (lit(3) * col("lam")))
          .as("df2"))
    },

    // Bartels' rank version of von Neumann's ratio (Bartels 1982 —
    // the RANK test for serial randomness: is the daily revenue
    // sequence exchangeable, or does it trend/oscillate?): doubled
    // midranks of the daily totals over the calendar-bounded day
    // grid, RVN = Σ(r_t − r_{t+1})² / Σ(r_t − r̄)² (the doubling
    // cancels in the ratio; 2r̄ = n+1 exactly), z against the exact
    // null moments E = 2, Var = 4(n−2)/((n+1)(n−1)). Integers
    // until the final two divisions; every magnitude is bounded by
    // the CUBE of the day-grid size — saturating, not SF-linear.
    q("stat_bartels_rank",
      """WITH d AS (SELECT o_orderdate dy,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT dy,
        |        2 * rank() OVER (ORDER BY y)
        |          + count(*) OVER (PARTITION BY y) - 1 r2
        |      FROM d),
        |sq AS (SELECT r2, lead(r2) OVER (ORDER BY dy) nx,
        |         count(*) OVER () n FROM r),
        |a AS (SELECT max(n) n,
        |        sum(CASE WHEN nx IS NULL THEN 0
        |            ELSE (r2 - nx) * (r2 - nx) END)::BIGINT nm,
        |        sum((r2 - (n + 1)) * (r2 - (n + 1)))::BIGINT dd
        |      FROM sq)
        |SELECT n AS n_days,
        |  round(nm::DOUBLE / dd + 1e-9, 6) AS rvn,
        |  round((nm::DOUBLE / dd - 2)
        |        / sqrt(4.0 * (n - 2) / ((n + 1.0) * (n - 1)))
        |        + 1e-9, 4) AS z
        |FROM a""") { c =>
      val d = c.orders.select(col("o_orderdate").as("dy"),
          expr("CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT)")
            .as("cents"))
        .groupBy("dy").agg(sum(col("cents")).as("y"))
      val r = d.select(col("dy"),
        (lit(2) * rank().over(Window.orderBy("y")) +
          count(lit(1)).over(Window.partitionBy("y")) - 1).as("r2"))
      val sq = r.select(col("r2"),
        lead(col("r2"), 1).over(Window.orderBy("dy")).as("nx"),
        count(lit(1)).over(Window.partitionBy(lit(1))).as("n"))
      val a = sq.agg(max(col("n")).as("n"),
        sum(when(col("nx").isNull, 0L).otherwise(
          (col("r2") - col("nx")) * (col("r2") - col("nx")))).as("nm"),
        sum((col("r2") - (col("n") + 1)) *
          (col("r2") - (col("n") + 1))).as("dd"))
      val rvn = col("nm").cast("double") / col("dd")
      a.select(col("n").as("n_days"), r6(rvn).as("rvn"),
        r4((rvn - 2) / sqrt(lit(4.0) * (col("n") - 2) /
          ((col("n") + lit(1.0)) * (col("n") - 1)))).as("z"))
    },

    // Tukey's HSD studentized-range statistics (Tukey 1949 — the
    // post-hoc pairwise follow-up once stat_anova rejects): for each
    // return-flag pair, q = |m̄_i − m̄_j| / √(MSE/2·(1/n_i + 1/n_j))
    // (the Tukey-Kramer unequal-n form). MSE comes from the exact
    // integer within-group moments (Σy BIGINT, Σy² through
    // DECIMAL(38); the group-mean squares fold in PINNED flag order);
    // the 3 pair rows are a self-join over the 3-row group relation.
    q("stat_tukey_hsd",
      """WITH s AS (SELECT l_returnflag f, count(*)::BIGINT n,
        |             sum(l_quantity::BIGINT)::BIGINT sy,
        |             sum(l_quantity::BIGINT * l_quantity::BIGINT)
        |               ::BIGINT qq
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT nt, count(*)::BIGINT k,
        |        sum(qq)::DOUBLE sqq,
        |        list_reduce(list(sy::DOUBLE * sy / n ORDER BY f),
        |          (acc, x) -> acc + x) ssw FROM s),
        |m AS (SELECT (sqq - ssw) / (nt - k) mse FROM t)
        |SELECT a.f || '-' || b.f AS pair,
        |  round(a.sy * 1.0 / a.n + 1e-9, 4) AS mean_i,
        |  round(b.sy * 1.0 / b.n + 1e-9, 4) AS mean_j,
        |  round(abs(a.sy * 1.0 / a.n - b.sy * 1.0 / b.n)
        |        / sqrt(m.mse / 2 * (1.0 / a.n + 1.0 / b.n))
        |        + 1e-9, 4) AS q_stat
        |FROM s a JOIN s b ON a.f < b.f, m ORDER BY pair""") { c =>
      val s = c.lineitem.select(col("l_returnflag").as("f"),
          col("l_quantity").cast("long").as("y"))
        .groupBy("f").agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("qq"))
      val t = s.agg(sum(col("n")).as("nt"), count(lit(1)).as("k"),
        sum(col("qq")).cast("double").as("sqq"),
        aggregate(array_sort(collect_list(struct(col("f"),
            (col("sy").cast("double") * col("sy") / col("n")).as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("ssw"))
      val m = t.select(
        ((col("sqq") - col("ssw")) / (col("nt") - col("k"))).as("mse"))
      val a = s.select(col("f"), col("n"), col("sy"))
      val b = s.select(col("f").as("f2"), col("n").as("n2"),
        col("sy").as("sy2"))
      a.join(broadcast(b), col("f") < col("f2"))
        .crossJoin(broadcast(m))
        .select(concat(col("f"), lit("-"), col("f2")).as("pair"),
          r4(col("sy") * lit(1.0) / col("n")).as("mean_i"),
          r4(col("sy2") * lit(1.0) / col("n2")).as("mean_j"),
          r4(abs(col("sy") * lit(1.0) / col("n") -
            col("sy2") * lit(1.0) / col("n2")) /
            sqrt(col("mse") / 2 *
              (lit(1.0) / col("n") + lit(1.0) / col("n2"))))
            .as("q_stat"))
        .orderBy("pair")
    },

    // Median absolute deviation — the GLOBAL robust-σ estimate
    // (σ̂ = 1.4826·MAD under normality; ts_hampel applies the same
    // MAD idea as a per-window ROLLING filter — this is the
    // corpus-level scale constant quality filters calibrate against):
    // TWO chained histogram-median extractions, both
    // on the mood_median device (exact cents histogram + Positional
    // distributed cumsum — never a global sort of raw rows): first
    // the grand median of order totals, then the median of the
    // integer |cents − median| deviations. Exact integers end to
    // end; the 1.4826 consistency constant is a pinned literal.
    q("stat_mad",
      """WITH v AS (SELECT CAST(round(o_totalprice * 100 + 1e-9)
        |             AS BIGINT) c FROM orders),
        |h AS (SELECT c, count(*)::BIGINT cnt FROM v GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT n FROM h),
        |cw AS (SELECT c, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cum FROM h),
        |med AS (SELECT min(c) m FROM cw, t
        |        WHERE cum + cnt >= (t.n + 1) // 2),
        |dv AS (SELECT abs(c - (SELECT m FROM med)) d FROM v),
        |h2 AS (SELECT d, count(*)::BIGINT cnt FROM dv GROUP BY 1),
        |cw2 AS (SELECT d, cnt,
        |          coalesce(sum(cnt) OVER (ORDER BY d
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |            0) cum FROM h2),
        |mad AS (SELECT min(d) md FROM cw2, t
        |        WHERE cum + cnt >= (t.n + 1) // 2)
        |SELECT t.n AS n, med.m AS median_cents, mad.md AS mad_cents,
        |  round(1.4826 * mad.md / 100 + 1e-9, 4) AS sigma_hat_dollars
        |FROM t, med, mad""") { c =>
      val v = c.orders.select(
        expr("CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT)").as("c"))
      val h = v.groupBy("c").agg(count(lit(1)).as("cnt"))
      val t = h.agg(sum(col("cnt")).as("n"))
      def histMedian(hist: org.apache.spark.sql.DataFrame,
          vc: String): org.apache.spark.sql.DataFrame = {
        val cw = graft.ops.Positional.withCumSums(hist, Seq(col(vc)),
          Seq(col("cnt") -> "cum"))
        cw.crossJoin(broadcast(t))
          .filter(col("cum") + col("cnt") >=
            ((col("n") + 1) / 2).cast("long"))
          .agg(min(col(vc)).as("m"))
      }
      val med = histMedian(h, "c")
      val dv = v.crossJoin(broadcast(med)).select(
        abs(col("c") - col("m")).as("d"))
      val h2 = dv.groupBy("d").agg(count(lit(1)).as("cnt"))
      val mad = histMedian(h2, "d").select(col("m").as("md"))
      t.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
        .select(col("n"), col("m").as("median_cents"),
          col("md").as("mad_cents"),
          r4(lit(1.4826) * col("md") / 100).as("sigma_hat_dollars"))
    },
  )
}
