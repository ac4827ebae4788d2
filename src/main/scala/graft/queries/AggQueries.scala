package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** SURVEY §2.3 reductions (vendor/ibis/expr/operations/reductions.py):
  * Count/CountStar/CountDistinct, Sum/Mean/Min/Max, Median/Quantile,
  * Variance/StandardDev, Correlation/Covariance, Mode, ArgMax/ArgMin,
  * First/Last/Arbitrary, BitAnd/Or/Xor, GroupConcat, ArrayCollect,
  * All/Any, filtered aggregates (Filterable :27), ApproxCountDistinct,
  * ApproxQuantile.
  *
  * Scale notes: all of these are hash-aggregates with map-side partial
  * aggregation in Spark — one shuffle on the group keys, no skew risk at
  * TPC-H cardinalities. Approx variants (HLL++, t-digest-style quantiles)
  * exist precisely for the 100 TB path where exact distinct/quantile would
  * shuffle the full column.
  */
object AggQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape — the flagship aggregate (Aggregate relations.py:307).
    q("agg_basic",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity) + 1e-9, 2) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(20,6))) AS DOUBLE) AS sum_charge,
        |       round(avg(l_quantity) + 1e-9, 2) AS avg_qty,
        |       round(avg(l_extendedprice) + 1e-9, 2) AS avg_price,
        |       round(avg(l_discount) + 1e-9, 4) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""", bench = true) { c =>
      c.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")), 6).as("sum_charge"),
          r2(avg(col("l_quantity"))).as("avg_qty"),
          r2(avg(col("l_extendedprice"))).as("avg_price"),
          r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Count / CountStar / CountDistinct / CountDistinctStar
    // (reductions.py:32/:41/:359/:54).
    q("agg_count_distinct",
      """SELECT l_returnflag,
        |       count(*) AS n_rows,
        |       count(l_orderkey) AS n_ok,
        |       count(DISTINCT l_orderkey) AS n_distinct_ok,
        |       count(DISTINCT l_suppkey) AS n_distinct_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          count(col("l_orderkey")).as("n_ok"),
          countDistinct(col("l_orderkey")).as("n_distinct_ok"),
          countDistinct(col("l_suppkey")).as("n_distinct_supp"))
        .orderBy("l_returnflag")
    },

    // ApproxCountDistinct (reductions.py:368) — HLL++ sketch values are
    // engine-specific, so the hash-checkable contract is the ERROR BOUND:
    // we emit the exact distinct plus booleans asserting the approx is
    // within 5 % / 2 % of it; the oracle asserts the same bounds hold
    // (trivially TRUE on the oracle side, where approx = exact).
    q("agg_approx_distinct",
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS exact_ok,
        |       TRUE AS ok_within_5pct,
        |       TRUE AS pk_within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      // exact (expand-based) and approx (wide HLL buffers) aggregates
      // are computed SEPARATELY and joined: mixing count-distinct's
      // Expand with high-precision HLL buffers forces a sort-based
      // aggregate that copies 100 KB+ sketches per row (measured 106 s
      // at sf0.1; this split shape runs in ~9 s)
      val exact = c.lineitem.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_ok"),
          countDistinct(col("l_partkey")).as("exact_pk"))
      val approx = c.lineitem.groupBy(col("l_returnflag").as("rf2"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a_ok"),
          approx_count_distinct(col("l_partkey"), 0.01).as("a_pk"))
      exact.join(broadcast(approx), col("l_returnflag") === col("rf2"))
        .select(col("l_returnflag"), col("exact_ok"),
          (abs(col("a_ok") - col("exact_ok")).cast("double") /
            col("exact_ok") < 0.05).as("ok_within_5pct"),
          (abs(col("a_pk") - col("exact_pk")).cast("double") /
            col("exact_pk") < 0.02).as("pk_within_2pct"))
        .orderBy("l_returnflag")
    },

    // Filtered aggregates — every reduction carries `where` (Filterable :27).
    q("agg_filtered",
      """SELECT l_linestatus,
        |       round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A') + 1e-9, 2) AS qty_a,
        |       count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        |       round(avg(l_extendedprice) FILTER (WHERE l_quantity > 25) + 1e-9, 2) AS avg_big
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""") { c =>
      c.lineitem.groupBy("l_linestatus")
        .agg(
          r2(sum(when(col("l_returnflag") === "A", col("l_quantity")))).as("qty_a"),
          count(when(col("l_discount") > 0.05, lit(1))).as("n_disc"),
          r2(avg(when(col("l_quantity") > 25, col("l_extendedprice"))))
            .as("avg_big"))
        .orderBy("l_linestatus")
    },

    // Full pairwise Pearson correlation MATRIX over four numeric
    // columns in ONE corpus pass (the EDA/feature-screen companion of
    // agg_stats' single corr): every moment (Σa, Σab, Σa²) is an EXACT
    // integer sum of lattice-quantized values — products through
    // DECIMAL(38)/HUGEINT (the Stump squaring pattern) — so both
    // engines hold identical integers, and each r casts to double
    // only at the final num/(√da·√db) (da·db would need 52 digits;
    // the split-sqrt form stays in range and is written identically
    // on both engines). Unpivoted to one row per pair.
    q("agg_corr_matrix",
      """WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) a1,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) a2,
        |                  CAST(round(l_discount * 100) AS BIGINT) a3,
        |                  CAST(round(l_tax * 100) AS BIGINT) a4
        |           FROM lineitem),
        |m AS (SELECT count(*)::HUGEINT n,
        |        sum(a1)::HUGEINT s1, sum(a2)::HUGEINT s2,
        |        sum(a3)::HUGEINT s3, sum(a4)::HUGEINT s4,
        |        sum(a1::HUGEINT * a1) q1, sum(a2::HUGEINT * a2) q2,
        |        sum(a3::HUGEINT * a3) q3, sum(a4::HUGEINT * a4) q4,
        |        sum(a1::HUGEINT * a2) p12, sum(a1::HUGEINT * a3) p13,
        |        sum(a1::HUGEINT * a4) p14, sum(a2::HUGEINT * a3) p23,
        |        sum(a2::HUGEINT * a4) p24, sum(a3::HUGEINT * a4) p34
        |      FROM b),
        |u AS (
        |  SELECT 'quantity~extprice' pair, n*p12 - s1*s2 num,
        |         n*q1 - s1*s1 da, n*q2 - s2*s2 db FROM m
        |  UNION ALL SELECT 'quantity~discount', n*p13 - s1*s3,
        |         n*q1 - s1*s1, n*q3 - s3*s3 FROM m
        |  UNION ALL SELECT 'quantity~tax', n*p14 - s1*s4,
        |         n*q1 - s1*s1, n*q4 - s4*s4 FROM m
        |  UNION ALL SELECT 'extprice~discount', n*p23 - s2*s3,
        |         n*q2 - s2*s2, n*q3 - s3*s3 FROM m
        |  UNION ALL SELECT 'extprice~tax', n*p24 - s2*s4,
        |         n*q2 - s2*s2, n*q4 - s4*s4 FROM m
        |  UNION ALL SELECT 'discount~tax', n*p34 - s3*s4,
        |         n*q3 - s3*s3, n*q4 - s4*s4 FROM m)
        |SELECT pair,
        |       round(num::DOUBLE / (sqrt(da::DOUBLE) * sqrt(db::DOUBLE))
        |             + 1e-9, 6) AS r
        |FROM u ORDER BY pair""") { c =>
      val b = c.lineitem.select(
        round(col("l_quantity")).cast("long").as("a1"),
        round(col("l_extendedprice") * 100).cast("long").as("a2"),
        round(col("l_discount") * 100).cast("long").as("a3"),
        round(col("l_tax") * 100).cast("long").as("a4"))
      val d = (s: String) => col(s).cast("decimal(38,0)")
      val m = b.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("a1")).cast("decimal(38,0)").as("s1"),
        sum(col("a2")).cast("decimal(38,0)").as("s2"),
        sum(col("a3")).cast("decimal(38,0)").as("s3"),
        sum(col("a4")).cast("decimal(38,0)").as("s4"),
        sum(d("a1") * col("a1")).as("q1"), sum(d("a2") * col("a2")).as("q2"),
        sum(d("a3") * col("a3")).as("q3"), sum(d("a4") * col("a4")).as("q4"),
        sum(d("a1") * col("a2")).as("p12"), sum(d("a1") * col("a3")).as("p13"),
        sum(d("a1") * col("a4")).as("p14"), sum(d("a2") * col("a3")).as("p23"),
        sum(d("a2") * col("a4")).as("p24"), sum(d("a3") * col("a4")).as("p34"))
      def pair(name: String, p: String, si: String, sj: String,
               qi: String, qj: String) =
        m.select(lit(name).as("pair"),
          (col("n") * col(p) - col(si) * col(sj)).as("num"),
          (col("n") * col(qi) - col(si) * col(si)).as("da"),
          (col("n") * col(qj) - col(sj) * col(sj)).as("db"))
      val u = pair("quantity~extprice", "p12", "s1", "s2", "q1", "q2")
        .unionAll(pair("quantity~discount", "p13", "s1", "s3", "q1", "q3"))
        .unionAll(pair("quantity~tax", "p14", "s1", "s4", "q1", "q4"))
        .unionAll(pair("extprice~discount", "p23", "s2", "s3", "q2", "q3"))
        .unionAll(pair("extprice~tax", "p24", "s2", "s4", "q2", "q4"))
        .unionAll(pair("discount~tax", "p34", "s3", "s4", "q3", "q4"))
      u.select(col("pair"),
          r6(col("num").cast("double") /
            (sqrt(col("da").cast("double")) *
              sqrt(col("db").cast("double")))).as("r"))
        .orderBy("pair")
    },

    // Variance / StandardDev sample+pop (reductions.py:254-277),
    // Correlation / Covariance (:279/:290).
    q("agg_stats",
      """SELECT l_returnflag,
        |       round(var_samp(l_quantity) + 1e-9, 2) AS var_s,
        |       round(var_pop(l_quantity) + 1e-9, 2) AS var_p,
        |       round(stddev_samp(l_extendedprice) + 1e-9, 2) AS sd_s,
        |       round(stddev_pop(l_extendedprice) + 1e-9, 2) AS sd_p,
        |       round(corr(l_quantity, l_extendedprice) + 1e-9, 4) AS cor,
        |       round(covar_samp(l_quantity, l_extendedprice) + 1e-9, 1) AS cov_s,
        |       round(covar_pop(l_quantity, l_extendedprice) + 1e-9, 1) AS cov_p
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(r2(var_samp(col("l_quantity"))).as("var_s"),
          r2(var_pop(col("l_quantity"))).as("var_p"),
          r2(stddev_samp(col("l_extendedprice"))).as("sd_s"),
          r2(stddev_pop(col("l_extendedprice"))).as("sd_p"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("cor"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")) + lit(1e-9), 1).as("cov_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")) + lit(1e-9), 1).as("cov_p"))
        .orderBy("l_returnflag")
    },

    // Linear-regression aggregate family (ANSI regr_*): slope,
    // intercept, r², component means/counts — both engines compute
    // from the same moment sums, so rounded values hash-match.
    q("agg_regr",
      """SELECT l_returnflag,
        |       regr_count(l_extendedprice, l_quantity)::BIGINT AS n,
        |       round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 2) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 6) AS r2v,
        |       round(regr_avgx(l_extendedprice, l_quantity) + 1e-9, 4) AS avgx,
        |       round(regr_avgy(l_extendedprice, l_quantity) + 1e-9, 2) AS avgy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(regr_count(col("l_extendedprice"), col("l_quantity"))
            .cast("long").as("n"),
          r4(regr_slope(col("l_extendedprice"), col("l_quantity")))
            .as("slope"),
          r2(regr_intercept(col("l_extendedprice"), col("l_quantity")))
            .as("icept"),
          r6(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2v"),
          r4(regr_avgx(col("l_extendedprice"), col("l_quantity")))
            .as("avgx"),
          r2(regr_avgy(col("l_extendedprice"), col("l_quantity")))
            .as("avgy"))
        .orderBy("l_returnflag")
    },

    // Median / Quantile / MultiQuantile exact (reductions.py:209-248);
    // both engines use linear interpolation (percentile ≡ quantile_cont).
    q("agg_quantile",
      """SELECT l_returnflag,
        |       round(median(l_quantity) + 1e-9, 2) AS med_qty,
        |       round(quantile_cont(l_extendedprice, 0.25) + 1e-9, 2) AS p25,
        |       round(quantile_cont(l_extendedprice, 0.75) + 1e-9, 2) AS p75,
        |       round(quantile_cont(l_extendedprice, 0.95) + 1e-9, 2) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", bench = true) { c =>
      // MultiQuantile: ONE percentile aggregate evaluates all three
      // price quantiles in a single pass (3× less sort work than three
      // scalar percentile calls); elements are then projected out.
      c.lineitem.groupBy("l_returnflag")
        .agg(r2(percentile(col("l_quantity"), lit(0.5))).as("med_qty"),
          percentile(col("l_extendedprice"),
            array(lit(0.25), lit(0.75), lit(0.95))).as("pq"))
        .select(col("l_returnflag"), col("med_qty"),
          r2(element_at(col("pq"), 1)).as("p25"),
          r2(element_at(col("pq"), 2)).as("p75"),
          r2(element_at(col("pq"), 3)).as("p95"))
        .orderBy("l_returnflag")
    },

    // Exact grouped quantiles at the 100 TB shape — the HISTOGRAM-RANK
    // formulation of agg_quantile's contract: the built-in
    // percentile() sorts every group's raw values (per-group sort
    // buffers that grow with the corpus), while this computes the
    // type-1 (no-interpolation) p50/p90/p99 from the (group, value)
    // histogram — bounded by the VALUE DOMAIN, not the row count —
    // with one hash aggregation, one per-group cumulative pass, and a
    // min-over-threshold pick (the grouped-median device generalized
    // to any rank). Integer dollars keep every comparison exact;
    // ceil goes through the 1e-9 nudge on both engines.
    q("agg_quantile_hist",
      """WITH h AS (SELECT l_returnflag flag,
        |    CAST(round(l_extendedprice / 100 + 1e-9) AS BIGINT) v,
        |    count(*)::BIGINT cnt
        |  FROM lineitem GROUP BY 1, 2),
        |cu AS (SELECT flag, v, cnt,
        |         sum(cnt) OVER (PARTITION BY flag ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           cum,
        |         sum(cnt) OVER (PARTITION BY flag) n
        |       FROM h)
        |SELECT flag, max(n)::BIGINT AS n,
        |  min(CASE WHEN cum >= ceil(0.5 * n - 1e-9) THEN v END)::BIGINT
        |    AS p50_hundreds,
        |  min(CASE WHEN cum >= ceil(0.9 * n - 1e-9) THEN v END)::BIGINT
        |    AS p90_hundreds,
        |  min(CASE WHEN cum >= ceil(0.99 * n - 1e-9) THEN v END)::BIGINT
        |    AS p99_hundreds
        |FROM cu GROUP BY flag ORDER BY flag""") { c =>
      import org.apache.spark.sql.expressions.Window
      val h = c.lineitem.groupBy(col("l_returnflag").as("flag"),
          expr("CAST(round(l_extendedprice / 100 + 1e-9) AS BIGINT)")
            .as("v"))
        .agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy("flag").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cu = h.select(col("flag"), col("v"), col("cnt"),
        sum(col("cnt")).over(wc).as("cum"),
        sum(col("cnt")).over(Window.partitionBy("flag")).as("n"))
      def pick(tau: Double) =
        min(when(col("cum") >= ceil(lit(tau) * col("n") - lit(1e-9)),
          col("v")))
      cu.groupBy("flag").agg(max(col("n")).as("n"),
          pick(0.5).as("p50_hundreds"),
          pick(0.9).as("p90_hundreds"),
          pick(0.99).as("p99_hundreds"))
        .orderBy("flag")
    },

    // ApproxMedian / ApproxQuantile (reductions.py:214/:226) — sketch
    // values are engine-specific, so (like agg_approx_distinct) the
    // checkable contract is the error bound vs the exact quantile:
    // scalar boolean columns only, no raw arrays (r1 harness fix).
    q("agg_approx_quantile",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5) + 1e-9, 2) AS exact_med,
        |       TRUE AS med_within_2pct,
        |       TRUE AS p25_within_2pct,
        |       TRUE AS p75_within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      def within(p: Double): org.apache.spark.sql.Column =
        abs(percentile_approx(col("l_extendedprice"), lit(p), lit(10000)) -
          percentile(col("l_extendedprice"), lit(p))) /
          percentile(col("l_extendedprice"), lit(p)) < 0.02
      c.lineitem.groupBy("l_returnflag")
        .agg(r2(percentile(col("l_extendedprice"), lit(0.5))).as("exact_med"),
          within(0.5).as("med_within_2pct"),
          within(0.25).as("p25_within_2pct"),
          within(0.75).as("p75_within_2pct"))
        .orderBy("l_returnflag")
    },

    // ArgMax / ArgMin (reductions.py:328/:338) → max_by/min_by with a
    // composite (value, unique-key) rank so ties cannot flip the result.
    q("agg_argminmax",
      """SELECT o_orderpriority,
        |       max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_order,
        |       max(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_order
        |FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { c =>
      c.orders.groupBy("o_orderpriority")
        .agg(max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("bottom_order"))
        .orderBy("o_orderpriority")
    },

    // First / Last / Arbitrary (reductions.py:79/:90/:67) — made
    // deterministic the same way the reference's tests do: explicit order,
    // here via min_by/max_by on the event ordering key.
    q("agg_first_last",
      """SELECT user_id,
        |       max(CASE WHEN rfirst = 1 THEN event_type END) AS first_type,
        |       max(CASE WHEN rlast = 1 THEN event_type END) AS last_type,
        |       count(*) AS n
        |FROM (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts ASC, event_id ASC) AS rfirst,
        |         row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rlast
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id LIMIT 2000""") { c =>
      c.events.groupBy("user_id")
        .agg(min_by(col("event_type"), struct(col("ts"), col("event_id")))
            .as("first_type"),
          max_by(col("event_type"), struct(col("ts"), col("event_id")))
            .as("last_type"),
          count(lit(1)).as("n"))
        .orderBy("user_id").limit(2000)
    },

    // BitAnd / BitOr / BitXor (reductions.py:101-155).
    q("agg_bits",
      """SELECT l_returnflag,
        |       bit_and(l_suppkey) AS band,
        |       bit_or(l_suppkey) AS bor,
        |       bit_xor(l_suppkey) AS bxor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(bit_and(col("l_suppkey")).as("band"),
          bit_or(col("l_suppkey")).as("bor"),
          bit_xor(col("l_suppkey")).as("bxor"))
        .orderBy("l_returnflag")
    },

    // All / Any (reductions.py:386/:395) → bool_and / bool_or.
    q("agg_bool",
      """SELECT l_returnflag,
        |       bool_and(l_quantity > 0) AS all_pos,
        |       bool_or(l_discount > 0.09) AS any_big_disc,
        |       bool_and(l_quantity > 25) AS all_big
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"),
          bool_and(col("l_quantity") > 25).as("all_big"))
        .orderBy("l_returnflag")
    },

    // GroupConcat (reductions.py:348) — order pinned on both engines.
    q("agg_group_concat",
      """SELECT n_regionkey,
        |       string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""") { c =>
      c.nation.groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("names"))
        .orderBy("n_regionkey")
    },

    // ArrayCollect (reductions.py:373) — the list is sorted then compared
    // as its canonical string encoding: the driver's harness hashes scalar
    // cells, so raw array columns are serialized via array_join (r1 fix).
    // A size column keeps the cardinality independently checkable.
    q("agg_collect",
      """SELECT n_regionkey,
        |       array_to_string(list_sort(list(n_nationkey)), ',') AS keys,
        |       len(list(n_nationkey)) AS n_keys
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""") { c =>
      c.nation.groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_nationkey"))), ",")
            .as("keys"),
          size(collect_list(col("n_nationkey"))).as("n_keys"))
        .orderBy("n_regionkey")
    },

    // Mode (reductions.py:301) — defined deterministically as the smallest
    // most-frequent value (plain mode() tie-breaks arbitrarily in both
    // engines), computed with the same rank-based plan on both sides.
    q("agg_mode",
      """SELECT l_returnflag, l_quantity AS mode_qty FROM (
        |  SELECT l_returnflag, l_quantity,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1 ORDER BY l_returnflag""") { c =>
      import org.apache.spark.sql.expressions.Window
      val counted = c.lineitem.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity"))
      counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
        .orderBy("l_returnflag")
    },

    // Grouping sets / cube / rollup — absent from the reference IR
    // (SURVEY §2.3 note) but free on Spark; declared as surplus coverage.
    q("agg_rollup",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity) + 1e-9, 2) AS qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { c =>
      c.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(r2(sum(col("l_quantity"))).as("qty"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Arbitrary GROUPING SETS (the general form rollup/cube specialize;
    // ANSI + vendored-Ibis group_by coverage): three hand-picked sets
    // incl. the grand total, with grouping_id disambiguating NULL-as-
    // rollup from NULL-as-value. Expressed through spark.sql over a
    // temp view — the same Catalyst Expand the rollup/cube API plans.
    q("agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |       count(*)::BIGINT AS cnt,
        |       round(sum(l_quantity) + 1e-9, 2) AS qty,
        |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST,
        |         l_linestatus NULLS FIRST""") { c =>
      c.lineitem.createOrReplaceTempView("gs_lineitem")
      c.spark.sql(
        """SELECT l_returnflag, l_linestatus,
          |       count(*) AS cnt,
          |       round(sum(l_quantity) + 1e-9, 2) AS qty,
          |       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_linestatus), ())
          |ORDER BY gid, l_returnflag ASC NULLS FIRST,
          |         l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // Weighted median (lower convention): the first value whose
    // inclusive cumulative weight crosses half the total. Cumulative
    // weights come from the DISTRIBUTED Positional prefix sum over the
    // grouped support, so a continuous value column never collapses to
    // a single-partition window; weights are integer-valued doubles,
    // keeping every comparison exact.
    q("agg_weighted_median",
      """WITH h AS (SELECT l_extendedprice v, sum(l_quantity) w
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(w) tw FROM h),
        |c AS (SELECT v, w, coalesce(sum(w) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum
        |      FROM h)
        |SELECT round(min(v) + 1e-9, 2) AS weighted_median,
        |       round(max(t.tw) + 1e-9, 2) AS total_weight
        |FROM c, t WHERE cum * 2 < t.tw AND (cum + w) * 2 >= t.tw""") { c =>
      val h = c.lineitem.groupBy(col("l_extendedprice").as("v"))
        .agg(sum(col("l_quantity")).as("w"))
      val t = h.agg(sum(col("w")).as("tw"))
      val cum = graft.ops.Positional.withCumSum(
        h, Seq(col("v")), col("w"), "cum")
      cum.crossJoin(broadcast(t))
        .filter(col("cum") * 2 < col("tw") &&
          (col("cum") + col("w")) * 2 >= col("tw"))
        .agg(r2(min(col("v"))).as("weighted_median"),
          r2(max(col("tw"))).as("total_weight"))
    },

    // HyperLogLog from first principles (Flajolet et al. 2007) as a
    // DISTRIBUTED query — the white-box companion to
    // agg_approx_distinct's built-in sketch, and the mergeable-state
    // shape a 100 TB pipeline ships between stages: 256 registers from
    // the portable md5 hash (register = hex window [1,2]; rank input =
    // the DISJOINT 56-bit window [3,16], so register and rank are
    // independent), ρ = first-1-bit position via exact STRING ops
    // (lpad(bin(v)) — no FP log2 near power-of-2 boundaries), register
    // maxima by hash aggregation, and the 2^(−M) harmonic sum over the
    // fixed 256-row frame through the pinned-order fold. Empty
    // registers contribute 2⁰ via a generate_series outer join. The
    // small-range linear-counting branch never fires at these
    // cardinalities (est ≫ 2.5·m) and is omitted — raw estimate only.
    // BITMAP INDEX set algebra (the roaring-bitmap idea — encode a
    // predicate's member set as per-block bitmasks, then AND/OR the
    // masks instead of joining raw ids; the warehouse trick for cheap
    // segment intersections): customers blocked by custkey into
    // 32-bit words (32, not 64 — DuckDB's BIGINT shift overflows at
    // bit 63, and 32-bit words keep every mask positive on both
    // engines), one bit_or-aggregated mask per (block, predicate),
    // set sizes/intersections/unions by summing bit_count over the
    // block-aligned masks. Pure integer arithmetic; the block
    // relation is |keys|/32 — the only thing shuffled.
    q("agg_bitmap_index",
      """WITH b AS (SELECT c_custkey // 32 blk,
        |    bit_or(CASE WHEN c_acctbal > 5000
        |      THEN 1::BIGINT << (c_custkey % 32)::INT ELSE 0 END) ma,
        |    bit_or(CASE WHEN c_mktsegment = 'BUILDING'
        |      THEN 1::BIGINT << (c_custkey % 32)::INT ELSE 0 END) mb
        |  FROM customer GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_blocks,
        |  sum(bit_count(ma))::BIGINT AS cnt_high_bal,
        |  sum(bit_count(mb))::BIGINT AS cnt_building,
        |  sum(bit_count(ma & mb))::BIGINT AS cnt_both,
        |  sum(bit_count(ma | mb))::BIGINT AS cnt_either,
        |  round(sum(bit_count(ma & mb)) * 1.0
        |        / sum(bit_count(ma | mb)) + 1e-9, 6) AS jaccard
        |FROM b""") { c =>
      val b = c.customer
        .groupBy((col("c_custkey") / 32).cast("long").as("blk"))
        .agg(
          expr("bit_or(CASE WHEN c_acctbal > 5000 THEN " +
            "shiftleft(1L, cast(c_custkey % 32 as int)) ELSE 0L END)")
            .as("ma"),
          expr("bit_or(CASE WHEN c_mktsegment = 'BUILDING' THEN " +
            "shiftleft(1L, cast(c_custkey % 32 as int)) ELSE 0L END)")
            .as("mb"))
      b.agg(count(lit(1)).as("n_blocks"),
          sum(bit_count(col("ma"))).as("cnt_high_bal"),
          sum(bit_count(col("mb"))).as("cnt_building"),
          sum(bit_count(col("ma").bitwiseAND(col("mb")))).as("cnt_both"),
          sum(bit_count(col("ma").bitwiseOR(col("mb"))))
            .as("cnt_either"))
        .select(col("n_blocks"), col("cnt_high_bal"), col("cnt_building"),
          col("cnt_both"), col("cnt_either"),
          r6(col("cnt_both") * lit(1.0) / col("cnt_either"))
            .as("jaccard"))
    },

    // HLL SET ALGEBRA (the reason sketches exist at 100 TB — union by
    // register max is lossless, and intersections come free by
    // inclusion–exclusion): big-spender customers (any order >150k)
    // vs urgent-order customers, estimated from ONE register pass
    // carrying three maxima (A, B, A∪B) — the mergeable-state shape
    // two pipeline stages would ship. Same portable-md5 register
    // construction as agg_hll_custom; exact counts reported beside
    // the estimates. |A∩B| ≈ est(A) + est(B) − est(A∪B).
    q("agg_hll_intersect",
      """WITH f AS (SELECT o_custkey k,
        |    max(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) a,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |        END) b
        |  FROM orders GROUP BY 1),
        |fx AS (SELECT a, b,
        |    ('0x' || substr(md5(k::VARCHAR), 1, 2))::BIGINT reg,
        |    CASE WHEN ('0x' || substr(md5(k::VARCHAR), 3, 14))::BIGINT = 0
        |         THEN 57
        |         ELSE strpos(lpad(bin(
        |           ('0x' || substr(md5(k::VARCHAR), 3, 14))::BIGINT),
        |           56, '0'), '1') END rho
        |  FROM f WHERE a = 1 OR b = 1),
        |rr AS (SELECT reg,
        |         max(CASE WHEN a = 1 THEN rho ELSE 0 END) ma,
        |         max(CASE WHEN b = 1 THEN rho ELSE 0 END) mb,
        |         max(rho) mu
        |       FROM fx GROUP BY 1),
        |regs AS (SELECT gs.g reg, coalesce(rr.ma, 0) ma,
        |           coalesce(rr.mb, 0) mb, coalesce(rr.mu, 0) mu
        |         FROM (SELECT unnest(generate_series(0, 255)) g) gs
        |         LEFT JOIN rr ON gs.g = rr.reg),
        |s AS (SELECT
        |    list_reduce(list(pow(2.0, -ma) ORDER BY reg),
        |      (x, y) -> x + y) ha,
        |    list_reduce(list(pow(2.0, -mb) ORDER BY reg),
        |      (x, y) -> x + y) hb,
        |    list_reduce(list(pow(2.0, -mu) ORDER BY reg),
        |      (x, y) -> x + y) hu
        |  FROM regs),
        |ex AS (SELECT sum(a)::BIGINT ea, sum(b)::BIGINT eb,
        |         sum(a * b)::BIGINT ei FROM f),
        |e AS (SELECT 0.7213 / (1 + 1.079 / 256) * 256 * 256 / ha est_a,
        |        0.7213 / (1 + 1.079 / 256) * 256 * 256 / hb est_b,
        |        0.7213 / (1 + 1.079 / 256) * 256 * 256 / hu est_u
        |      FROM s)
        |SELECT ex.ea AS exact_a, round(e.est_a + 1e-9, 2) AS est_a,
        |       ex.eb AS exact_b, round(e.est_b + 1e-9, 2) AS est_b,
        |       ex.ei AS exact_intersect,
        |       round(e.est_a + e.est_b - e.est_u + 1e-9, 2)
        |         AS est_intersect
        |FROM e, ex""") { c =>
      val f = c.orders.groupBy(col("o_custkey").as("k"))
        .agg(max(when(col("o_totalprice") > 150000, 1).otherwise(0))
            .as("a"),
          max(when(col("o_orderpriority") === "1-URGENT", 1)
            .otherwise(0)).as("b"))
      val hx = md5(col("k").cast("string"))
      val vCol = conv(substring(hx, 3, 14), 16, 10).cast("long")
      val fx = f.filter(col("a") === 1 || col("b") === 1)
        .select(col("a"), col("b"),
          conv(substring(hx, 1, 2), 16, 10).cast("long").as("reg"),
          when(vCol === 0, 57)
            .otherwise(instr(lpad(bin(vCol), 56, "0"), "1")).as("rho"))
      val rr = fx.groupBy("reg").agg(
        max(when(col("a") === 1, col("rho")).otherwise(0)).as("ma"),
        max(when(col("b") === 1, col("rho")).otherwise(0)).as("mb"),
        max(col("rho")).as("mu"))
      val regs = c.spark.range(256).toDF("reg")
        .join(rr, Seq("reg"), "left")
        .na.fill(0, Seq("ma", "mb", "mu"))
      def harm(cn: String) =
        aggregate(array_sort(collect_list(struct(col("reg"),
            pow(lit(2.0), -col(cn)).as("t")))),
          lit(0.0), (x, y) => x + y.getField("t"))
      val s = regs.agg(harm("ma").as("ha"), harm("mb").as("hb"),
        harm("mu").as("hu"))
      val ex = f.agg(sum(col("a")).cast("long").as("ea"),
        sum(col("b")).cast("long").as("eb"),
        sum(col("a") * col("b")).cast("long").as("ei"))
      def est(cn: String) = lit(0.7213) / (lit(1) + lit(1.079) / 256) *
        lit(256) * lit(256) / col(cn)
      s.crossJoin(broadcast(ex))
        .select(col("ea").as("exact_a"), r2(est("ha")).as("est_a"),
          col("eb").as("exact_b"), r2(est("hb")).as("est_b"),
          col("ei").as("exact_intersect"),
          r2(est("ha") + est("hb") - est("hu")).as("est_intersect"))
    },

    // SHARDED HLL MERGE — the proof that union-by-register-max is
    // LOSSLESS (the property that lets 1000 executors sketch 100 TB
    // independently and a coordinator merge 1000 tiny register tables):
    // four shard-local register tables built independently by orderkey
    // parity, merged by per-register max, estimate compared against
    // the direct single-pass sketch of the same column — BIT-EQUAL by
    // construction (max is associative/commutative over shards), and
    // the query outputs both so the hash gate enforces it forever.
    q("agg_hll_sharded_merge",
      """WITH h AS (SELECT l_orderkey % 4 shard,
        |    md5(CAST(l_partkey AS VARCHAR)) hx FROM lineitem),
        |rv AS (SELECT shard, ('0x' || substr(hx, 1, 2))::BIGINT reg,
        |         CASE WHEN ('0x' || substr(hx, 3, 14))::BIGINT = 0
        |              THEN 57
        |              ELSE strpos(lpad(bin(
        |                ('0x' || substr(hx, 3, 14))::BIGINT), 56, '0'),
        |                '1') END rho
        |       FROM h),
        |sh AS (SELECT shard, reg, max(rho) mx FROM rv GROUP BY 1, 2),
        |mg AS (SELECT reg, max(mx) mx FROM sh GROUP BY 1),
        |dr AS (SELECT reg, max(rho) mx FROM rv GROUP BY 1),
        |regs AS (SELECT gs.g reg, coalesce(mg.mx, 0) mmx,
        |           coalesce(dr.mx, 0) dmx
        |         FROM (SELECT unnest(generate_series(0, 255)) g) gs
        |         LEFT JOIN mg ON gs.g = mg.reg
        |         LEFT JOIN dr ON gs.g = dr.reg),
        |s AS (SELECT
        |    list_reduce(list(pow(2.0, -mmx) ORDER BY reg),
        |      (a, x) -> a + x) hm,
        |    list_reduce(list(pow(2.0, -dmx) ORDER BY reg),
        |      (a, x) -> a + x) hd,
        |    sum(CASE WHEN mmx <> dmx THEN 1 ELSE 0 END)::BIGINT
        |      reg_diffs
        |  FROM regs),
        |ns AS (SELECT count(DISTINCT shard)::BIGINT n_shards FROM h)
        |SELECT ns.n_shards, s.reg_diffs,
        |  round(0.7213 / (1 + 1.079 / 256) * 256 * 256 / s.hm
        |        + 1e-9, 2) AS est_merged,
        |  round(0.7213 / (1 + 1.079 / 256) * 256 * 256 / s.hd
        |        + 1e-9, 2) AS est_direct
        |FROM s, ns""") { c =>
      val h = c.lineitem.select((col("l_orderkey") % 4).as("shard"),
        md5(col("l_partkey").cast("string")).as("hx"))
      val vCol = conv(substring(col("hx"), 3, 14), 16, 10).cast("long")
      val rv = h.select(col("shard"),
        conv(substring(col("hx"), 1, 2), 16, 10).cast("long").as("reg"),
        when(vCol === 0, 57)
          .otherwise(instr(lpad(bin(vCol), 56, "0"), "1")).as("rho"))
      val sh = rv.groupBy("shard", "reg").agg(max(col("rho")).as("mx"))
      val mg = sh.groupBy("reg").agg(max(col("mx")).as("mmx"))
      val dr = rv.groupBy("reg").agg(max(col("rho")).as("dmx"))
      val regs = c.spark.range(256).toDF("reg")
        .join(mg, Seq("reg"), "left").join(dr, Seq("reg"), "left")
        .na.fill(0, Seq("mmx", "dmx"))
      def harm(cn: String) =
        aggregate(array_sort(collect_list(struct(col("reg"),
            pow(lit(2.0), -col(cn)).as("t")))),
          lit(0.0), (a, x) => a + x.getField("t"))
      val s = regs.agg(harm("mmx").as("hm"), harm("dmx").as("hd"),
        sum(when(col("mmx") =!= col("dmx"), 1L).otherwise(0L))
          .as("reg_diffs"))
      val ns = h.agg(countDistinct(col("shard")).as("n_shards"))
      def est(cn: String) = lit(0.7213) / (lit(1) + lit(1.079) / 256) *
        lit(256) * lit(256) / col(cn)
      s.crossJoin(broadcast(ns))
        .select(col("n_shards"), col("reg_diffs"),
          r2(est("hm")).as("est_merged"), r2(est("hd")).as("est_direct"))
    },

    // SLIDING-WINDOW HLL (mergeability applied to TIME — keep one tiny
    // register table per day, answer any trailing window by merging
    // register tables instead of re-scanning raw events; the only way
    // rolling distinct counts stay tractable at 100 TB): per-day
    // register maxima over the user hash, 7-day windows merged by max,
    // estimate reported BESIDE the exact rolling distinct (the
    // events_rolling_dau shape) with the relative error under the hash
    // gate. Per-day tables are 256 rows — the window merge never
    // touches events again.
    q("agg_hll_sliding",
      """WITH du AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |              dy, user_id
        |            FROM events),
        |h AS (SELECT dy, md5(CAST(user_id AS VARCHAR)) hx FROM du),
        |rv AS (SELECT dy, ('0x' || substr(hx, 1, 2))::BIGINT reg,
        |         CASE WHEN ('0x' || substr(hx, 3, 14))::BIGINT = 0
        |              THEN 57
        |              ELSE strpos(lpad(bin(
        |                ('0x' || substr(hx, 3, 14))::BIGINT), 56, '0'),
        |                '1') END rho
        |       FROM h),
        |dr AS (SELECT dy, reg, max(rho) mx FROM rv GROUP BY 1, 2),
        |days AS (SELECT DISTINCT dy FROM du),
        |wnd AS (SELECT d.dy, dr.reg, max(dr.mx) mx
        |        FROM days d JOIN dr
        |          ON dr.dy BETWEEN d.dy - 6 AND d.dy
        |        GROUP BY 1, 2),
        |regs AS (SELECT d.dy, gs.g reg, coalesce(wnd.mx, 0) mx
        |         FROM days d
        |         CROSS JOIN (SELECT unnest(generate_series(0, 255)) g) gs
        |         LEFT JOIN wnd ON wnd.dy = d.dy AND wnd.reg = gs.g),
        |s AS (SELECT dy,
        |        list_reduce(list(pow(2.0, -mx) ORDER BY reg),
        |          (a, x) -> a + x) hs,
        |        sum(CASE WHEN mx = 0 THEN 1 ELSE 0 END)::BIGINT zeros
        |      FROM regs GROUP BY 1),
        |es AS (SELECT dy, zeros,
        |        CASE WHEN 0.7213 / (1 + 1.079 / 256) * 256 * 256 / hs
        |               <= 2.5 * 256 AND zeros > 0
        |             THEN 256 * ln(256.0 / zeros)
        |             ELSE 0.7213 / (1 + 1.079 / 256) * 256 * 256 / hs
        |        END e FROM s),
        |ex AS (SELECT d.dy, count(DISTINCT du.user_id)::BIGINT exact
        |       FROM days d JOIN du ON du.dy BETWEEN d.dy - 6 AND d.dy
        |       GROUP BY 1)
        |SELECT es.dy::VARCHAR AS day, ex.exact,
        |  round(es.e + 1e-9, 2) AS est,
        |  round((es.e - ex.exact) / ex.exact + 1e-9, 6) AS rel_err
        |FROM es JOIN ex ON es.dy = ex.dy ORDER BY day""") { c =>
      val du = c.events
        .select(col("ts").cast("date").as("dy"), col("user_id"))
        .distinct()
      val hx = md5(col("user_id").cast("string"))
      val vCol = conv(substring(hx, 3, 14), 16, 10).cast("long")
      val rv = du.select(col("dy"),
        conv(substring(hx, 1, 2), 16, 10).cast("long").as("reg"),
        when(vCol === 0, 57)
          .otherwise(instr(lpad(bin(vCol), 56, "0"), "1")).as("rho"))
      val dr = rv.groupBy("dy", "reg").agg(max(col("rho")).as("mx"))
      val days = du.select(col("dy").as("d")).distinct()
      val wnd = broadcast(days).join(dr,
          col("dy").between(date_sub(col("d"), 6), col("d")))
        .groupBy(col("d"), col("reg")).agg(max(col("mx")).as("mx"))
      val regs = broadcast(days)
        .crossJoin(c.spark.range(256).toDF("reg"))
        .join(wnd, Seq("d", "reg"), "left")
        .na.fill(0, Seq("mx"))
      val s = regs.groupBy("d").agg(
        aggregate(array_sort(collect_list(struct(col("reg"),
            pow(lit(2.0), -col("mx")).as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("hs"),
        sum(when(col("mx") === 0, 1L).otherwise(0L)).as("zeros"))
      val raw = lit(0.7213) / (lit(1) + lit(1.079) / 256) *
        lit(256) * lit(256) / col("hs")
      // small-range (linear counting) branch — required here: a 7-day
      // window holds few hundred users, well under 2.5·m
      val es = s.select(col("d"),
        when(raw <= 2.5 * 256 && col("zeros") > 0,
          lit(256) * log(lit(256.0) / col("zeros")))
          .otherwise(raw).as("e"))
      val ex = broadcast(days.select(col("d").as("d2")))
        .join(du, col("dy").between(date_sub(col("d2"), 6), col("d2")))
        .groupBy(col("d2"))
        .agg(countDistinct(col("user_id")).as("exact"))
      es.join(ex, col("d") === col("d2"))
        .select(col("d").cast("string").as("day"), col("exact"),
          r2(col("e")).as("est"),
          r6((col("e") - col("exact")) / col("exact")).as("rel_err"))
        .orderBy("day")
    },

    q("agg_hll_custom",
      """WITH h AS (SELECT md5(CAST(l_partkey AS VARCHAR)) hx
        |           FROM lineitem),
        |rv AS (SELECT ('0x' || substr(hx, 1, 2))::BIGINT reg,
        |              ('0x' || substr(hx, 3, 14))::BIGINT v
        |       FROM h),
        |rr AS (SELECT reg, max(CASE WHEN v = 0 THEN 57
        |                ELSE strpos(lpad(bin(v), 56, '0'), '1') END) mx
        |       FROM rv GROUP BY 1),
        |regs AS (SELECT gs.g reg, COALESCE(rr.mx, 0) mx
        |         FROM (SELECT unnest(generate_series(0, 255)) g) gs
        |         LEFT JOIN rr ON gs.g = rr.reg),
        |s AS (SELECT list_reduce(list(pow(2.0, -mx) ORDER BY reg),
        |               (a, x) -> a + x) hs,
        |        count(*) FILTER (mx = 0)::BIGINT zeros
        |      FROM regs),
        |ex AS (SELECT count(DISTINCT l_partkey)::BIGINT n_exact
        |       FROM lineitem)
        |SELECT 256::BIGINT AS m, n_exact, zeros,
        |       round(0.7213 / (1 + 1.079 / 256) * 256 * 256 / hs
        |             + 1e-9, 2) AS estimate,
        |       round((0.7213 / (1 + 1.079 / 256) * 256 * 256 / hs
        |              - n_exact) / n_exact + 1e-9, 6) AS rel_err
        |FROM s, ex""") { c =>
      val h = c.lineitem.select(
        md5(col("l_partkey").cast("string")).as("hx"))
      val rv = h.select(
        conv(substring(col("hx"), 1, 2), 16, 10).cast("long").as("reg"),
        conv(substring(col("hx"), 3, 14), 16, 10).cast("long").as("v"))
      val rr = rv.groupBy("reg").agg(
        max(when(col("v") === 0, 57).otherwise(
          instr(lpad(bin(col("v")), 56, "0"), "1"))).as("mx"))
      val regs = c.spark.range(256).toDF("reg")
        .join(rr, Seq("reg"), "left").na.fill(0, Seq("mx"))
      val s = regs.agg(
        aggregate(array_sort(collect_list(struct(col("reg"),
            pow(lit(2.0), -col("mx")).as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("hs"),
        sum(when(col("mx") === 0, 1L).otherwise(0L)).as("zeros"))
      val ex = c.lineitem.agg(
        countDistinct(col("l_partkey")).as("n_exact"))
      val est = lit(0.7213) / (lit(1) + lit(1.079) / 256) *
        lit(256) * lit(256) / col("hs")
      s.crossJoin(broadcast(ex))
        .select(lit(256L).as("m"), col("n_exact"), col("zeros"),
          r2(est).as("estimate"),
          r6((est - col("n_exact")) / col("n_exact")).as("rel_err"))
    },

    // Higher sample moments — skewness g₁ = m₃/m₂^{3/2} and EXCESS
    // kurtosis g₂ = m₄/m₂² − 3 per group, the two reductions above
    // var/std in the moment ladder (SURVEY §2.3 covers mean/var; the
    // built-in skewness/kurtosis aggregates are FP-order-dependent
    // partial folds, so this computes them the graft way): EXACT
    // integer power sums S₁..S₄ of the small-integer quantity column
    // (q ≤ 50 ⇒ S₄ ≤ n·6.25e6, Long-safe at any corpus scale), ONE
    // hash aggregation, then one closed-form double expression per
    // group with the SAME shape on both engines (m₂·√m₂ instead of
    // pow(·,1.5) — sqrt is correctly-rounded IEEE everywhere,
    // engine-provided pow is not). Order-independent by construction:
    // every aggregate is an integer sum.
    q("agg_moments",
      """WITH s AS (SELECT l_returnflag flag, count(*)::BIGINT n,
        |    sum(CAST(round(l_quantity) AS BIGINT))::BIGINT s1,
        |    sum(CAST(round(l_quantity) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT))::BIGINT s2,
        |    sum(CAST(round(l_quantity) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT))::BIGINT s3,
        |    sum(CAST(round(l_quantity) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT))::BIGINT s4
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT flag, n,
        |        s1 * 1.0 / n a, s2 * 1.0 / n b,
        |        s3 * 1.0 / n c3, s4 * 1.0 / n d4
        |      FROM s),
        |k AS (SELECT flag, n, a,
        |        b - a * a m2,
        |        c3 - 3 * a * b + 2 * a * a * a m3,
        |        d4 - 4 * a * c3 + 6 * a * a * b - 3 * a * a * a * a m4
        |      FROM m)
        |SELECT flag, n, round(a + 1e-9, 6) AS mean_qty,
        |       round(m2 + 1e-9, 6) AS var_qty,
        |       round(m3 / (m2 * sqrt(m2)) + 1e-9, 6) AS skewness,
        |       round(m4 / (m2 * m2) - 3 + 1e-9, 6) AS kurtosis_excess
        |FROM k ORDER BY flag""") { c =>
      val qn = expr("CAST(round(l_quantity) AS BIGINT)")
      val s = c.lineitem.groupBy(col("l_returnflag").as("flag")).agg(
        count(lit(1)).as("n"),
        sum(qn).as("s1"), sum(qn * qn).as("s2"),
        sum(qn * qn * qn).as("s3"), sum(qn * qn * qn * qn).as("s4"))
      val a = col("s1") * lit(1.0) / col("n")
      val b = col("s2") * lit(1.0) / col("n")
      val c3 = col("s3") * lit(1.0) / col("n")
      val d4 = col("s4") * lit(1.0) / col("n")
      val m = s.select(col("flag"), col("n"), a.as("a"), b.as("b"),
        c3.as("c3"), d4.as("d4"))
      val m2 = col("b") - col("a") * col("a")
      val m3 = col("c3") - lit(3) * col("a") * col("b") +
        lit(2) * col("a") * col("a") * col("a")
      val m4 = col("d4") - lit(4) * col("a") * col("c3") +
        lit(6) * col("a") * col("a") * col("b") -
        lit(3) * col("a") * col("a") * col("a") * col("a")
      val k = m.select(col("flag"), col("n"), col("a"),
        m2.as("m2"), m3.as("m3"), m4.as("m4"))
      k.select(col("flag"), col("n"), r6(col("a")).as("mean_qty"),
          r6(col("m2")).as("var_qty"),
          r6(col("m3") / (col("m2") * sqrt(col("m2")))).as("skewness"),
          r6(col("m4") / (col("m2") * col("m2")) - lit(3))
            .as("kurtosis_excess"))
        .orderBy("flag")
    },

    // KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; the
    // k-minimum-values estimator behind Theta sketches) beside the
    // HLL family: per order priority, the k=64 smallest PORTABLE
    // 32-bit hashes (disjoint 8-hex md5 window — the engine-portable
    // hash device) of the distinct customer ids; the estimate is
    // (k−1)·2^32/h_(k). Everything except the final division is exact
    // integer arithmetic, and the plan is the MERGEABLE two-stage
    // shape (ops/Kmv.scala, r13 verdict #1): per-group sketches come
    // out of a bounded Aggregator — map-side partials keep ≤64 longs
    // per (partition, group), the exchange moves O(64·groups·parts)
    // rows, never the corpus, and duplicates are absorbed by the
    // dedup-aware fold so no distinct() shuffle precedes it — and the
    // UNION sketch is computed FROM the ≤5×64 per-group sketch rows
    // (the bottom-64 of the union IS the bottom-64 of the per-group
    // bottom-64s), not from the corpus: no unpartitioned window
    // anywhere. The ORACLE is the textbook row_number formulation the
    // aggregate replaces — same rows, radically different plan at
    // 100 TB. Output: per-group exact vs estimate, plus the merged
    // global estimate replicated per row.
    q("agg_kmv",
      """WITH d AS (SELECT DISTINCT o_orderpriority pri,
        |    ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT h
        |  FROM orders),
        |r AS (SELECT pri, h, row_number() OVER (PARTITION BY pri
        |        ORDER BY h) rk FROM d),
        |kth AS (SELECT pri, max(h) hk, count(*)::BIGINT kk
        |        FROM r WHERE rk <= 64 GROUP BY 1),
        |ex AS (SELECT o_orderpriority pri,
        |         count(DISTINCT o_custkey)::BIGINT exact
        |       FROM orders GROUP BY 1),
        |g AS (SELECT h, row_number() OVER (ORDER BY h) rk
        |      FROM (SELECT DISTINCT h FROM d)),
        |gk AS (SELECT max(h) hk, count(*)::BIGINT kk FROM g
        |       WHERE rk <= 64),
        |gx AS (SELECT count(DISTINCT o_custkey)::BIGINT gexact
        |       FROM orders)
        |SELECT ex.pri, ex.exact,
        |  CASE WHEN kth.kk < 64 THEN ex.exact ELSE
        |    CAST(round((kth.kk - 1) * 4294967296.0 / kth.hk + 1e-9)
        |         AS BIGINT) END AS kmv_est,
        |  CASE WHEN gk.kk < 64 THEN gx.gexact ELSE
        |    CAST(round((gk.kk - 1) * 4294967296.0 / gk.hk + 1e-9)
        |         AS BIGINT) END AS kmv_union_est,
        |  gx.gexact AS union_exact
        |FROM ex JOIN kth ON ex.pri = kth.pri, gk, gx
        |ORDER BY ex.pri""") { c =>
      val bk = udaf(new graft.ops.Kmv.BottomKAgg(64))
      val hashed = c.orders.select(col("o_orderpriority").as("pri"),
        graft.ops.Kmv.portableHash(col("o_custkey")).as("h"))
      // stage 1: bounded per-group sketches (≤64 longs each)
      val sk = hashed.groupBy("pri").agg(bk(col("h")).as("mins"))
        .localCheckpoint()
      val kth = sk.select(col("pri"),
        element_at(col("mins"), size(col("mins"))).as("hk"),
        size(col("mins")).cast("long").as("kk"))
      val ex = c.orders.groupBy(col("o_orderpriority").as("pri"))
        .agg(countDistinct(col("o_custkey")).as("exact"))
      // stage 2: union sketch FROM the per-group sketches — a second
      // bounded fold over ≤ 5×64 rows, never the corpus
      val gk = sk.select(explode(col("mins")).as("h"))
        .agg(bk(col("h")).as("gmins"))
        .select(element_at(col("gmins"), size(col("gmins"))).as("hk2"),
          size(col("gmins")).cast("long").as("kk2"))
      val gx = c.orders.agg(countDistinct(col("o_custkey")).as("gexact"))
      def est(kk: org.apache.spark.sql.Column,
          hk: org.apache.spark.sql.Column,
          exact: org.apache.spark.sql.Column) =
        when(kk < 64, exact).otherwise(
          round((kk - 1) * lit(4294967296.0) / hk + lit(1e-9))
            .cast("long"))
      ex.join(kth, Seq("pri"))
        .crossJoin(broadcast(gk)).crossJoin(broadcast(gx))
        .select(col("pri"), col("exact"),
          est(col("kk"), col("hk"), col("exact")).as("kmv_est"),
          est(col("kk2"), col("hk2"), col("gexact"))
            .as("kmv_union_est"),
          col("gexact").as("union_exact"))
        .orderBy("pri")
    },

    // KMV/Theta-sketch SET OPERATIONS (r14 verdict #6; Dasgupta,
    // Lang, Rhodes, Thaler 2016 "Data Sketching with Theta" — the
    // θ-clipping rule that turns two bottom-k sketches into
    // intersection/difference/union ESTIMATORS): clip both sketches
    // to the common θ = min(θ_A, θ_B) (θ = kth minimum at capacity,
    // the whole 2³² lattice under it); below θ each sketch holds its
    // set's hash population EXACTLY, so ∩ / \ / ∪ restricted to
    // [0,θ) are exact set ops on ≤64-element arrays, each scaled by
    // 2³²/θ. Sets: A = urgent-order customers, B = high-order
    // customers (overlapping but distinct). Plan shape: ONE corpus
    // aggregation per side — the bounded BottomKAgg sketches (≤64
    // longs per partition×group map-side) and a per-custkey
    // membership aggregate for the exact columns; every set
    // operation then runs on two ≤64-long ARRAYS in a 1×1 broadcast
    // cross join. `ops/Kmv.setOpEstimates` is the same math as a
    // pure function — the streaming spec folds IT over kmvState
    // sketches and must match this query's algebra. Oracle: the
    // textbook row_number bottom-64 + θ-clip in SQL.
    q("agg_kmv_setops",
      """WITH base AS (SELECT
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
        |         ELSE 'b' END g,
        |    o_custkey k,
        |    ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT h
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |d AS (SELECT DISTINCT g, h FROM base),
        |r AS (SELECT g, h, row_number() OVER (PARTITION BY g
        |        ORDER BY h) rk FROM d),
        |sk AS (SELECT g, h FROM r WHERE rk <= 64),
        |kth AS (SELECT g, CASE WHEN count(*) < 64 THEN 4294967296
        |          ELSE max(h) END theta FROM sk GROUP BY 1),
        |th AS (SELECT min(theta) tv FROM kth),
        |sa AS (SELECT h FROM sk, th WHERE g = 'a' AND h < tv),
        |sb AS (SELECT h FROM sk, th WHERE g = 'b' AND h < tv),
        |cnt AS (SELECT
        |  (SELECT count(*) FROM sa JOIN sb USING (h)) ic,
        |  (SELECT count(*) FROM sa
        |     WHERE h NOT IN (SELECT h FROM sb)) ac,
        |  (SELECT count(*) FROM sb
        |     WHERE h NOT IN (SELECT h FROM sa)) bc,
        |  (SELECT count(*) FROM
        |     (SELECT h FROM sa UNION SELECT h FROM sb)) uc),
        |mem AS (SELECT k,
        |    max(CASE WHEN g = 'a' THEN 1 ELSE 0 END) ina,
        |    max(CASE WHEN g = 'b' THEN 1 ELSE 0 END) inb
        |  FROM base GROUP BY 1),
        |ex AS (SELECT sum(ina)::BIGINT n_a, sum(inb)::BIGINT n_b,
        |    sum(ina * inb)::BIGINT inter_exact,
        |    count(*)::BIGINT union_exact FROM mem)
        |SELECT ex.n_a, ex.n_b, ex.inter_exact, ex.union_exact,
        |  CASE WHEN th.tv = 4294967296 THEN ic::BIGINT
        |    ELSE CAST(round(ic * 4294967296.0 / th.tv + 1e-9)
        |         AS BIGINT) END AS inter_est,
        |  CASE WHEN th.tv = 4294967296 THEN ac::BIGINT
        |    ELSE CAST(round(ac * 4294967296.0 / th.tv + 1e-9)
        |         AS BIGINT) END AS a_only_est,
        |  CASE WHEN th.tv = 4294967296 THEN bc::BIGINT
        |    ELSE CAST(round(bc * 4294967296.0 / th.tv + 1e-9)
        |         AS BIGINT) END AS b_only_est,
        |  CASE WHEN th.tv = 4294967296 THEN uc::BIGINT
        |    ELSE CAST(round(uc * 4294967296.0 / th.tv + 1e-9)
        |         AS BIGINT) END AS union_est
        |FROM ex, cnt, th""") { c =>
      val bk = udaf(new graft.ops.Kmv.BottomKAgg(64))
      val base = c.orders
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
          when(col("o_orderpriority") === "1-URGENT", "a")
            .otherwise("b").as("g"),
          col("o_custkey").as("k"),
          graft.ops.Kmv.portableHash(col("o_custkey")).as("h"))
      // one bounded corpus aggregation -> two ≤64-long sketch rows
      val sk = base.groupBy("g").agg(bk(col("h")).as("mins"))
        .localCheckpoint()
      def theta(m: org.apache.spark.sql.Column) =
        when(size(m) < 64, lit(4294967296L))
          .otherwise(element_at(m, size(m)))
      val w = sk.filter(col("g") === "a").select(col("mins").as("ma"))
        .crossJoin(sk.filter(col("g") === "b")
          .select(col("mins").as("mb")))
        .withColumn("tv", least(theta(col("ma")), theta(col("mb"))))
        .withColumn("sa", filter(col("ma"), h => h < col("tv")))
        .withColumn("sb", filter(col("mb"), h => h < col("tv")))
      def est(cnt: org.apache.spark.sql.Column) =
        when(col("tv") === 4294967296L, cnt.cast("long"))
          .otherwise(round(cnt * lit(4294967296.0) / col("tv") +
            lit(1e-9)).cast("long"))
      val ests = w.select(
        est(size(array_intersect(col("sa"), col("sb"))))
          .as("inter_est"),
        est(size(array_except(col("sa"), col("sb")))).as("a_only_est"),
        est(size(array_except(col("sb"), col("sa")))).as("b_only_est"),
        est(size(array_union(col("sa"), col("sb")))).as("union_est"))
      // exact columns from ONE per-custkey membership aggregate
      val ex = base.groupBy("k").agg(
          max(when(col("g") === "a", 1).otherwise(0)).as("ina"),
          max(when(col("g") === "b", 1).otherwise(0)).as("inb"))
        .agg(sum(col("ina")).cast("long").as("n_a"),
          sum(col("inb")).cast("long").as("n_b"),
          sum(col("ina") * col("inb")).cast("long").as("inter_exact"),
          count(lit(1)).as("union_exact"))
      ex.crossJoin(broadcast(ests))
        .select(col("n_a"), col("n_b"), col("inter_exact"),
          col("union_exact"), col("inter_est"), col("a_only_est"),
          col("b_only_est"), col("union_est"))
    },

    // Deterministic "reservoir" sample — uniform k-of-n WITHOUT
    // replacement as bottom-k by the portable md5 hash (Vitter 1985's
    // reservoir semantics, made order/partition/engine-independent:
    // the k smallest hashes of a uniform hash family ARE a uniform
    // k-subset, and unlike a sequential reservoir the result is a
    // pure function of the SET — reruns, repartitions, and the DuckDB
    // oracle all pick identical rows; samples at different k NEST,
    // the fitSubsample property). Plan shape: TakeOrderedAndProject —
    // per-partition top-k heaps + one k-row merge, never a corpus
    // sort; at 1000 executors only k·parts rows move.
    q("agg_reservoir_sample",
      """WITH h AS (SELECT o_orderkey, o_totalprice,
        |    ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT hv
        |  FROM orders),
        |r AS (SELECT o_orderkey, o_totalprice, hv,
        |        row_number() OVER (ORDER BY hv, o_orderkey) rk
        |      FROM h)
        |SELECT rk::BIGINT AS rk, o_orderkey,
        |  round(o_totalprice + 1e-9, 2) AS total_price
        |FROM r WHERE rk <= 10 ORDER BY rk""") { c =>
      val h = c.orders.select(col("o_orderkey"), col("o_totalprice"),
        graft.ops.Kmv.portableHash(col("o_orderkey")).as("hv"))
      // orderBy + limit => TakeOrderedAndProject (distributed top-k)
      val top = h.orderBy(col("hv"), col("o_orderkey")).limit(10)
      top.select(
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("hv"), col("o_orderkey"))).cast("long")
            .as("rk"),
          col("o_orderkey"), r2(col("o_totalprice")).as("total_price"))
        .orderBy("rk")
    },

    // Linear counting (Whang, Vander-Zanden & Taylor 1990 — the
    // bitmap-occupancy cardinality estimator that PREDATES HLL and
    // still beats it at small n/m): hash keys into m = 4096 buckets,
    // count the DISTINCT buckets hit (k), estimate n̂ = −m·ln(1 −
    // k/m). The whole sketch is a per-group set of ≤m bucket ids —
    // a bounded aggregation with map-side combine (the agg_kmv plan
    // stance); the ln runs once per group on an exact rational k/m.
    // Saturated bitmaps (k = m) fall back to the exact count.
    // Beside agg_approx_distinct (HLL) and agg_kmv (bottom-k): the
    // THIRD classic cardinality sketch family.
    q("agg_linear_counting",
      """WITH b AS (SELECT o_orderpriority pri,
        |    ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT
        |      % 4096 bk,
        |    o_custkey
        |  FROM orders),
        |g AS (SELECT pri, count(DISTINCT bk)::BIGINT k,
        |        count(DISTINCT o_custkey)::BIGINT exact
        |      FROM b GROUP BY 1)
        |SELECT pri, exact, k AS k_buckets,
        |  CASE WHEN k >= 4096 THEN exact
        |       ELSE CAST(round(-4096.0 * ln(1.0 - k / 4096.0) + 1e-9)
        |            AS BIGINT) END AS lc_est
        |FROM g ORDER BY pri""") { c =>
      val b = c.orders.select(col("o_orderpriority").as("pri"),
        (graft.ops.Kmv.portableHash(col("o_custkey")) % 4096).as("bk"),
        col("o_custkey"))
      val g = b.groupBy("pri").agg(
        countDistinct(col("bk")).as("k"),
        countDistinct(col("o_custkey")).as("exact"))
      g.select(col("pri"), col("exact"), col("k").as("k_buckets"),
          when(col("k") >= 4096, col("exact")).otherwise(
            round(lit(-4096.0) *
              log(lit(1.0) - col("k") / lit(4096.0)) + lit(1e-9))
              .cast("long")).as("lc_est"))
        .orderBy("pri")
    },
  )
}
