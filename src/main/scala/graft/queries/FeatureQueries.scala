package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 feature-engineering tier: leave-one-out target encoding,
  * probability calibration curves, robust (MAD) outlier profiling, and
  * equi-depth quantile binning — the feature-prep passes between raw
  * tables and an estimator fit. All distributed as groupBy + broadcast
  * join + per-row projection; nothing corpus-sized is collected.
  */
object FeatureQueries {

  val defs: Seq[graft.QueryDef] = Seq(

    // Leave-one-out target encoding of a HIGH-CARDINALITY category
    // (l_suppkey ~ hundreds-thousands of levels — the case where
    // one-hot explodes and target encoding is the standard move).
    // enc_i = (sum_y(cat) − y_i + m·prior) / (n(cat) − 1 + m) with
    // smoothing m=10 toward the global prior — the leave-one-out form
    // that does NOT leak the row's own label (the classic target-
    // leakage bug this operator family exists to avoid). One
    // category aggregation + one 1-row prior + a broadcast join back;
    // the encoding is a pure projection after that.
    q("ml_target_encoding",
      """WITH lab AS (SELECT l_orderkey, l_linenumber, l_suppkey,
        |                    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |             FROM lineitem),
        |cat AS (SELECT l_suppkey, count(*) n, sum(y) s
        |        FROM lab GROUP BY 1),
        |pri AS (SELECT sum(y)::DOUBLE / count(*) pri_v FROM lab)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, l.y,
        |       round((c.s - l.y + 10 * p.pri_v) / (c.n - 1 + 10) + 1e-9, 6)
        |         AS enc
        |FROM lab l JOIN cat c ON l.l_suppkey = c.l_suppkey
        |CROSS JOIN pri p
        |ORDER BY l.l_orderkey, l.l_linenumber""") { c =>
      val lab = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      val cat = lab.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      val pri = lab.agg((sum(col("y")).cast("double") /
        count(lit(1))).as("prior"))
      lab.join(cat, Seq("l_suppkey"))
        .crossJoin(broadcast(pri))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("y"),
          r6((col("s") - col("y") + lit(10) * col("prior")) /
            (col("n") - 1 + lit(10))).as("enc"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Probability calibration curve (reliability diagram, DeGroot &
    // Fienberg 1983): a deterministic score proxy p = l_quantity/50 is
    // binned into 10 equal-width cells; per cell the mean predicted
    // probability vs the observed positive rate is what a calibration
    // plot draws and what Platt/isotonic recalibration consumes.
    // Integer bin arithmetic, micro-rounded means — one aggregation.
    q("ml_calibration_curve",
      """WITH s AS (SELECT least(CAST(floor(l_quantity * 10 / 51) AS BIGINT),
        |                        9) AS bin,
        |                  l_quantity / 50.0 AS p,
        |                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |           FROM lineitem)
        |SELECT bin, count(*)::BIGINT AS n,
        |       round(CAST(sum(CAST(round(p * 1e6 + 1e-9) AS BIGINT))
        |                  AS DOUBLE) / count(*) / 1e6 + 1e-9, 6)
        |         AS mean_pred,
        |       round(sum(y)::DOUBLE / count(*) + 1e-9, 6) AS frac_pos
        |FROM s GROUP BY bin ORDER BY bin""") { c =>
      val s = c.lineitem.select(
        least(floor(col("l_quantity") * 10 / 51).cast("long"),
          lit(9L)).as("bin"),
        (col("l_quantity") / 50.0).as("p"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      s.groupBy("bin")
        .agg(count(lit(1)).as("n"),
          r6(sum(round(col("p") * lit(1e6) + lit(1e-9)).cast("long"))
            .cast("double") / count(lit(1)) / lit(1e6)).as("mean_pred"),
          r6(sum(col("y")).cast("double") / count(lit(1))).as("frac_pos"))
        .orderBy("bin")
    },

    // Split-conformal prediction interval (Vovk et al. 2005; the
    // distribution-free coverage guarantee): fit a simple regression
    // on the train fold, take q̂ = the ⌈(n+1)(1−α)⌉-th smallest
    // absolute calibration residual — an EXACT order statistic, not a
    // quantile interpolation — and audit empirical coverage of
    // ŷ ± q̂ on the held-out test fold. Deterministic end-to-end: the
    // OLS slope/intercept are ratios of exact DECIMAL sums (integer x,
    // money-lattice y), residuals are rounded to the 1e-6 lattice
    // before BOTH the rank and the coverage compare (the boolean-
    // from-rounded rule), and the order statistic picks a value
    // rather than summing. Scale: three aggregations + one broadcast
    // scalar join; the rank runs on the per-fold sort of rounded
    // residuals (TakeOrdered-sized selection, never a global sort of
    // the corpus output).
    q("ml_conformal",
      """WITH b AS (SELECT l_orderkey, l_linenumber,
        |             CAST(round(l_quantity) AS BIGINT) x, l_extendedprice y,
        |             l_orderkey % 3 AS fold
        |           FROM lineitem),
        |f AS (SELECT count(*)::BIGINT n,
        |        sum(x)::BIGINT sx, sum(x*x)::BIGINT sxx,
        |        CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) sy,
        |        CAST(sum(CAST(x AS DECIMAL(18,2)) *
        |                 CAST(y AS DECIMAL(18,2))) AS DOUBLE) sxy
        |      FROM b WHERE fold = 0),
        |m AS (SELECT (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
        |             (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n
        |               AS icept FROM f),
        |cal AS (SELECT round(abs(b.y - (m.icept + m.slope * b.x))
        |                     + 1e-9, 6) r
        |        FROM b, m WHERE fold = 1),
        |nc AS (SELECT count(*)::BIGINT ncal FROM cal),
        |qh AS (SELECT r AS q_hat FROM (
        |         SELECT r, row_number() OVER (ORDER BY r) rk FROM cal), nc
        |       WHERE rk = CAST(ceil((ncal + 1) * 0.9) AS BIGINT)),
        |tst AS (SELECT round(abs(b.y - (m.icept + m.slope * b.x))
        |                     + 1e-9, 6) r
        |        FROM b, m WHERE fold = 2)
        |SELECT (SELECT n FROM f) AS n_train,
        |       (SELECT ncal FROM nc) AS n_cal,
        |       count(*)::BIGINT AS n_test,
        |       round((SELECT slope FROM m) + 1e-9, 6) AS slope,
        |       round((SELECT icept FROM m) + 1e-9, 6) AS icept,
        |       (SELECT q_hat FROM qh) AS q_hat,
        |       round(sum(CASE WHEN r <= (SELECT q_hat FROM qh)
        |                 THEN 1 ELSE 0 END)::DOUBLE / count(*) + 1e-9, 6)
        |         AS coverage
        |FROM tst""") { c =>
      val b = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long").as("x"),
        col("l_extendedprice").as("y"),
        (col("l_orderkey") % 3).as("fold"))
      val f = b.filter(col("fold") === 0).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        dsum(col("y"), 2).as("sy"),
        sum(col("x").cast("decimal(18,2)") * col("y").cast("decimal(18,2)"))
          .cast("double").as("sxy"))
      val m = f.select(
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
        .select(col("slope"),
          ((col("sy") - col("slope") * col("sx")) / col("n")).as("icept"),
          col("n"))
      val resid = (fold: Int) => b.filter(col("fold") === fold)
        .crossJoin(broadcast(m))
        .select(r6(abs(col("y") - (col("icept") + col("slope") * col("x"))))
          .as("r"))
      val cal = resid(1)
      val nc = cal.agg(count(lit(1)).as("ncal"))
      // k-th smallest WITHOUT a global sort: histogram of rounded
      // residuals → Positional exclusive cumsums → the bucket whose
      // cumulative count crosses k (the ml_pr_curve distributed path)
      val hist = cal.groupBy("r").agg(count(lit(1)).as("cnt"))
      val qh = graft.ops.Positional.withCumSums(hist, Seq(col("r")),
          Seq(col("cnt") -> "c_lt"))
        .crossJoin(broadcast(nc))
        .withColumn("k", ceil((col("ncal") + 1) * 0.9).cast("long"))
        .filter(col("c_lt") < col("k") &&
          col("k") <= col("c_lt") + col("cnt"))
        .select(col("r").as("q_hat"))
      val tst = resid(2)
      tst.crossJoin(broadcast(qh)).crossJoin(broadcast(nc))
        .crossJoin(broadcast(m.select(col("slope"), col("icept"), col("n"))))
        .agg(max(col("n")).as("n_train"), max(col("ncal")).as("n_cal"),
          count(lit(1)).as("n_test"),
          r6(max(col("slope"))).as("slope"),
          r6(max(col("icept"))).as("icept"),
          max(col("q_hat")).as("q_hat"),
          r6(sum(when(col("r") <= col("q_hat"), 1).otherwise(0))
            .cast("double") / count(lit(1))).as("coverage"))
        .select(col("n_train"), col("n_cal"), col("n_test"),
          col("slope"), col("icept"), col("q_hat"), col("coverage"))
    },

    // Isotonic (PAV) probability calibration (Zadrozny & Elkan 2002;
    // Robertson's minimax characterization): the monotone recalibration
    // map over the 10-bin reliability curve, iso_i = max_{j≤i}
    // min_{k≥i} avg(y over bins j..k) — the closed form of pool-
    // adjacent-violators, exactly computable on BOTH engines because
    // every interval average is one division of exact integer sums and
    // min/max pick (never sum) doubles. Scale shape: ONE corpus
    // aggregation to the B=10 bin relation, then O(B³) joins on a
    // model-sized frame — the standard binned-isotonic at 100 TB.
    q("ml_isotonic_calibration",
      """WITH s AS (SELECT least(CAST(floor(l_quantity * 10 / 51) AS BIGINT),
        |                        9) AS bin,
        |                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |b AS (SELECT bin, count(*)::BIGINT n, sum(y)::BIGINT s
        |      FROM s GROUP BY 1),
        |pairs AS (SELECT j.bin jb, k.bin kb,
        |            sum(m.s)::DOUBLE / sum(m.n) a
        |          FROM b j JOIN b k ON j.bin <= k.bin
        |          JOIN b m ON m.bin BETWEEN j.bin AND k.bin
        |          GROUP BY 1, 2),
        |imn AS (SELECT i.bin ib, p.jb, min(p.a) mn
        |        FROM b i JOIN pairs p ON p.jb <= i.bin AND p.kb >= i.bin
        |        GROUP BY 1, 2),
        |iso AS (SELECT ib AS bin, round(max(mn) + 1e-9, 6) iso_p
        |        FROM imn GROUP BY 1)
        |SELECT b.bin, b.n, round(b.s::DOUBLE / b.n + 1e-9, 6) AS frac_pos,
        |       iso.iso_p
        |FROM b JOIN iso USING (bin) ORDER BY bin""") { c =>
      val s = c.lineitem.select(
        least(floor(col("l_quantity") * 10 / 51).cast("long"),
          lit(9L)).as("bin"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      val b = s.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      val pairs = b.as("j").join(broadcast(b.as("k")),
          col("j.bin") <= col("k.bin"))
        .select(col("j.bin").as("jb"), col("k.bin").as("kb"))
        .join(broadcast(b.as("m")),
          col("m.bin") >= col("jb") && col("m.bin") <= col("kb"))
        .groupBy("jb", "kb")
        .agg((sum(col("m.s")).cast("double") / sum(col("m.n"))).as("a"))
      val imn = b.as("i").select(col("i.bin").as("ib"))
        .join(broadcast(pairs),
          col("jb") <= col("ib") && col("kb") >= col("ib"))
        .groupBy("ib", "jb").agg(min(col("a")).as("mn"))
      val iso = imn.groupBy(col("ib").as("bin"))
        .agg(r6(max(col("mn"))).as("iso_p"))
      b.join(iso, Seq("bin"))
        .select(col("bin"), col("n"),
          r6(col("s").cast("double") / col("n")).as("frac_pos"),
          col("iso_p"))
        .orderBy("bin")
    },

    // Robust outlier profile (median/MAD, the Hampel filter): per event
    // type, median and median-absolute-deviation of `value`, and the
    // count beyond the 3·1.4826·MAD fence — the outlier gate that
    // survives heavy tails where mean/stddev z-scores break. Two
    // chained aggregations (median, then MAD over deviations), both
    // exact interpolated percentiles; per-row flagging is a broadcast
    // join + projection.
    q("dq_mad_outliers",
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) m
        |             FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type,
        |               quantile_cont(abs(e.value - med.m), 0.5) mad
        |        FROM events e JOIN med ON e.event_type = med.event_type
        |        GROUP BY 1),
        |j AS (SELECT e.event_type, e.value, med.m, dev.mad
        |      FROM events e
        |      JOIN med ON e.event_type = med.event_type
        |      JOIN dev ON e.event_type = dev.event_type)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       round(max(m) + 1e-9, 6) AS med,
        |       round(max(mad) + 1e-9, 6) AS mad,
        |       sum(CASE WHEN abs(value - m) > 3 * 1.4826 * mad
        |                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM j GROUP BY event_type ORDER BY event_type""") { c =>
      val ev = c.events.select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("m"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .groupBy("event_type")
        .agg(percentile(abs(col("value") - col("m")), lit(0.5)).as("mad"))
      ev.join(broadcast(med), Seq("event_type"))
        .join(broadcast(dev), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          r6(max(col("m"))).as("med"),
          r6(max(col("mad"))).as("mad"),
          sum(when(abs(col("value") - col("m")) >
            lit(3) * lit(1.4826) * col("mad"), 1).otherwise(0))
            .cast("long").as("n_outliers"))
        .orderBy("event_type")
    },

    // Equi-depth quantile binning (the maxBins quantization feeding
    // tree learners like ml_stump_fit): decile boundaries of
    // l_extendedprice from ONE exact multi-percentile aggregation
    // (boundaries are a 9-element model literal at plan level), then a
    // per-row bucket assignment and a bin-occupancy histogram.
    // Boundary comparisons use micro-rounded cutpoints so bucket
    // membership is engine-stable at the cut.
    q("ml_quantile_bins",
      """WITH b AS (SELECT list_transform(
        |                    quantile_cont(l_extendedprice,
        |                      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |                    c -> round(c * 1e6 + 1e-9)) AS cuts
        |           FROM lineitem),
        |a AS (SELECT l.l_extendedprice,
        |             len(list_filter(b.cuts,
        |                 c -> round(l.l_extendedprice * 1e6 + 1e-9) >= c))
        |               AS bin
        |      FROM lineitem l CROSS JOIN b)
        |SELECT bin, count(*)::BIGINT AS n,
        |       round(min(l_extendedprice) + 1e-9, 2) AS lo,
        |       round(max(l_extendedprice) + 1e-9, 2) AS hi
        |FROM a GROUP BY bin ORDER BY bin""") { c =>
      // one exact multi-percentile pass; boundaries micro-rounded
      val cuts = c.lineitem.agg(
        transform(percentile(col("l_extendedprice"),
            typedlit((1 to 9).map(_ / 10.0))),
          x => round(x * lit(1e6) + lit(1e-9))).as("cuts"))
      c.lineitem.crossJoin(broadcast(cuts))
        .select(col("l_extendedprice"),
          size(filter(col("cuts"),
            cc => round(col("l_extendedprice") * lit(1e6) + lit(1e-9))
              >= cc)).as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          r2(min(col("l_extendedprice"))).as("lo"),
          r2(max(col("l_extendedprice"))).as("hi"))
        .orderBy("bin")
    },

    // Incremental aggregate maintenance (ops/IncrementalAgg.scala) —
    // the materialized-view refresh path: state is built from the
    // pre-cutoff half of lineitem, the post-cutoff half is folded in as
    // an append-only delta, and the refreshed view must equal the
    // ORACLE'S FULL RECOMPUTE over all of lineitem — cross-engine proof
    // that the mergeable-partial algebra (count/sum/min/max, avg
    // derived at read) loses nothing. The delta aggregation touches
    // only delta rows; the merge shuffle is state-sized.
    q("inc_agg_refresh",
      """SELECT l_returnflag, l_linestatus,
        |       count(l_quantity)::BIGINT AS q_count,
        |       round(sum(l_quantity) + 1e-9, 2) AS q_sum,
        |       round(min(l_quantity) + 1e-9, 2) AS q_min,
        |       round(max(l_quantity) + 1e-9, 2) AS q_max,
        |       round(sum(l_quantity) / count(l_quantity) + 1e-9, 4)
        |         AS q_mean
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
      import graft.ops.IncrementalAgg
      val cut = "2024-06-01"
      val keys = Seq("l_returnflag", "l_linestatus")
      val ms = Seq("l_quantity")
      val state = IncrementalAgg.aggregate(
        c.lineitem.filter(col("l_shipdate") < lit(cut)), keys, ms)
      val refreshed = IncrementalAgg.refresh(state,
        c.lineitem.filter(col("l_shipdate") >= lit(cut)), keys, ms)
      refreshed.select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity_count").as("q_count"),
          r2(col("l_quantity_sum")).as("q_sum"),
          r2(col("l_quantity_min")).as("q_min"),
          r2(col("l_quantity_max")).as("q_max"),
          r4(col("l_quantity_sum") / col("l_quantity_count")).as("q_mean"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Time-series resample + linear interpolation — the gap-filling
    // regularization every metrics/feature pipeline runs before
    // modeling: events collapse to an hourly mean per type (the only
    // corpus-sized work, one hash aggregation with micro-unit means),
    // the per-type hour GRID is generated from the type's own span, and
    // missing hours are linearly interpolated between the nearest
    // present samples (edge gaps fill from the single available side).
    // The interpolation windows run over the GRID relation (hours ×
    // types, partitioned by type) — bounded by the time span, never by
    // corpus row count.
    q("ts_resample_interp",
      """WITH ev AS (SELECT event_type,
        |              -- floor BEFORE the cast: DuckDB epoch() is a
        |              -- fractional DOUBLE and ::BIGINT would ROUND a
        |              -- :59:59.8 event into the next hour (Spark's
        |              -- unix_timestamp truncates)
        |              CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |                // 3600 AS hr,
        |              value
        |            FROM events),
        |b AS (SELECT event_type, hr,
        |             CAST(round(avg(value) * 1e6 + 1e-9) AS BIGINT) vu
        |      FROM ev GROUP BY 1, 2),
        |span AS (SELECT event_type, min(hr) h0, max(hr) h1
        |         FROM b GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr
        |         FROM span),
        |g AS (SELECT grid.event_type, grid.hr, b.vu
        |      FROM grid LEFT JOIN b ON grid.event_type = b.event_type
        |                           AND grid.hr = b.hr),
        |f AS (SELECT event_type, hr, vu,
        |        last_value(vu IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY hr
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
        |        last_value(CASE WHEN vu IS NOT NULL THEN hr END
        |                   IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY hr
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ph,
        |        last_value(vu IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY hr DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) nv,
        |        last_value(CASE WHEN vu IS NOT NULL THEN hr END
        |                   IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY hr DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) nh
        |      FROM g)
        |SELECT event_type, hr, vu IS NOT NULL AS present,
        |       round((CASE WHEN vu IS NOT NULL THEN vu
        |               WHEN pv IS NULL THEN nv
        |               WHEN nv IS NULL THEN pv
        |               ELSE pv + (nv - pv) * 1.0 * (hr - ph) / (nh - ph)
        |              END) / 1e6 + 1e-9, 6) AS value
        |FROM f ORDER BY event_type, hr""") { c =>
      import org.apache.spark.sql.expressions.Window
      val ev = c.events.select(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("hr"), col("value"))
      val b = ev.groupBy("event_type", "hr")
        .agg(round(avg(col("value")) * lit(1e6) + lit(1e-9)).cast("long")
          .as("vu"))
      val grid = b.groupBy("event_type")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"))).as("hr"))
      val g = grid.join(b, Seq("event_type", "hr"), "left")
      val wAsc = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = Window.partitionBy("event_type").orderBy(col("hr").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hrIfPresent = when(col("vu").isNotNull, col("hr"))
      val f = g
        .withColumn("pv", last(col("vu"), ignoreNulls = true).over(wAsc))
        .withColumn("ph", last(hrIfPresent, ignoreNulls = true).over(wAsc))
        .withColumn("nv", last(col("vu"), ignoreNulls = true).over(wDesc))
        .withColumn("nh", last(hrIfPresent, ignoreNulls = true).over(wDesc))
      f.select(col("event_type"), col("hr"),
          col("vu").isNotNull.as("present"),
          r6((when(col("vu").isNotNull, col("vu"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) * lit(1.0) *
              (col("hr") - col("ph")) / (col("nh") - col("ph"))))
            / lit(1e6)).as("value"))
        .orderBy("event_type", "hr")
    },

    // CUSUM changepoint scan (Page 1954) — the sequential drift
    // detector over the hourly series: per type, the running sum of
    // deviations from the series mean, flagged beyond 5σ. Determinism
    // (r7 verdict prescription): FP leaves the pipeline at the FIRST
    // step — each raw value is quantized per ROW to integer
    // milli-units (round() of one double is order-free and identical
    // cross-engine), and every downstream statistic is exact integer
    // arithmetic: bucket mean = round(Σvu3/n) (one IEEE division of
    // exact ints), per-type mean/σ from integer Σx and Σx² (milli
    // scale keeps Σx² ≤ ~1e15, comfortably inside both BIGINT and
    // double's 2^53 exactness), and the running CUSUM is a window sum
    // of integers. Only the final display division touches FP.
    q("ts_cusum_changepoint",
      """WITH ev AS (SELECT event_type,
        |              CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |                // 3600 AS hr,
        |              CAST(round(value * 1000) AS BIGINT) vu3
        |            FROM events),
        |b AS (SELECT event_type, hr,
        |             CAST(round(CAST(sum(vu3) AS DOUBLE) / count(*))
        |                  AS BIGINT) vu
        |      FROM ev GROUP BY 1, 2),
        |st AS (SELECT event_type,
        |              CAST(round(CAST(sum(vu) AS DOUBLE) / count(*))
        |                   AS BIGINT) mu,
        |              CAST(round(sqrt(CAST(count(*) * sum(vu * vu)
        |                                   - sum(vu) * sum(vu) AS DOUBLE))
        |                         / count(*)) AS BIGINT) sd
        |       FROM b GROUP BY 1),
        |c AS (SELECT b.event_type, b.hr, b.vu, st.mu, st.sd,
        |             sum(b.vu - st.mu) OVER (PARTITION BY b.event_type
        |               ORDER BY b.hr ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW) cusum
        |      FROM b JOIN st ON b.event_type = st.event_type)
        |SELECT event_type, hr, round(cusum / 1e3 + 1e-9, 4) AS cusum,
        |       abs(cusum) > 5 * sd AS drift
        |FROM c ORDER BY event_type, hr""") { c =>
      import org.apache.spark.sql.expressions.Window
      val ev = c.events.select(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("hr"),
        round(col("value") * 1000).cast("long").as("vu3"))
      val b = ev.groupBy("event_type", "hr")
        .agg(round(sum(col("vu3")).cast("double") / count(lit(1)))
          .cast("long").as("vu"))
      val st = b.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("vu")).as("s1"),
          sum(col("vu") * col("vu")).as("s2"))
        .select(col("event_type"),
          round(col("s1").cast("double") / col("n")).cast("long").as("mu"),
          round(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
            .cast("double")) / col("n")).cast("long").as("sd"))
      val w = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      b.join(broadcast(st), Seq("event_type"))
        .withColumn("cusum", sum(col("vu") - col("mu")).over(w))
        .select(col("event_type"), col("hr"),
          r4(col("cusum") / lit(1e3)).as("cusum"),
          (abs(col("cusum")) > lit(5) * col("sd")).as("drift"))
        .orderBy("event_type", "hr")
    },

    // Numeric band join (IntervalJoin.bandJoin): order totals matched to
    // line prices within +/-50 cents, in the integer cents domain — the
    // tolerance-reconciliation join that a raw abs(a-b)<=d condition
    // turns into a BroadcastNestedLoopJoin; here it is the bucketized
    // equi-join (one bucket per point, (2d/W)+1 per interval). Output
    // aggregated per return flag to keep the relation small.
    q("join_band",
      """WITH l AS (SELECT l_returnflag,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) lc
        |           FROM lineitem),
        |o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) oc
        |      FROM orders)
        |SELECT l_returnflag, count(*)::BIGINT AS n_pairs,
        |       CAST(min(abs(lc - oc)) AS BIGINT) AS min_gap,
        |       CAST(max(abs(lc - oc)) AS BIGINT) AS max_gap
        |FROM l JOIN o ON abs(l.lc - o.oc) <= 50
        |GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      val l = c.lineitem.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("lc"))
      val o = c.orders.select(
        round(col("o_totalprice") * 100).cast("long").as("oc"))
      graft.ops.IntervalJoin.bandJoin(l, "lc", o, "oc", delta = 50L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_pairs"),
          min(abs(col("lc") - col("oc"))).as("min_gap"),
          max(abs(col("lc") - col("oc"))).as("max_gap"))
        .orderBy("l_returnflag")
    },

    // AUC with the DeLong confidence interval (DeLong et al. 1988 —
    // the number every model report owes beside the point AUC): the
    // tie-corrected AUC and both structural-component variances come
    // from the score HISTOGRAM's cumulative counts, with half-credits
    // carried as ×2 INTEGERS (w0 = 2·neg_below + neg_equal per
    // positive's score, mirrored for negatives), so Σw, Σw² are exact
    // and only the final divisions are FP. Histogram-sized work after
    // one corpus aggregate.
    q("ml_auc_delong",
      """WITH s AS (SELECT l_quantity::BIGINT score,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |  FROM lineitem),
        |h AS (SELECT score, sum(y)::BIGINT n1s,
        |        (count(*) - sum(y))::BIGINT n0s FROM s GROUP BY 1),
        |t AS (SELECT sum(n1s)::BIGINT n1, sum(n0s)::BIGINT n0 FROM h),
        |cw AS (SELECT score, n1s, n0s,
        |         coalesce(sum(n0s) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) c0lt,
        |         coalesce(sum(n1s) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) c1lt
        |       FROM h),
        |w AS (SELECT score, n1s, n0s,
        |        2 * c0lt + n0s w0,
        |        2 * (t.n1 - c1lt - n1s) + n1s w1
        |      FROM cw, t),
        |m AS (SELECT sum(n1s * w0)::BIGINT sw0,
        |        sum(n1s * w0 * w0)::BIGINT sw0q,
        |        sum(n0s * w1)::BIGINT sw1,
        |        sum(n0s * w1 * w1)::BIGINT sw1q FROM w),
        |e AS (SELECT t.n1, t.n0,
        |    m.sw0 * 1.0 / (2.0 * t.n1 * t.n0) auc,
        |    (m.sw0q - m.sw0 * 1.0 * m.sw0 / t.n1) / (t.n1 - 1)
        |      / (4.0 * t.n0 * t.n0) s10,
        |    (m.sw1q - m.sw1 * 1.0 * m.sw1 / t.n0) / (t.n0 - 1)
        |      / (4.0 * t.n1 * t.n1) s01
        |  FROM m, t)
        |SELECT n1 AS n_pos, n0 AS n_neg, round(auc + 1e-9, 6) AS auc,
        |  round(sqrt(s10 / n1 + s01 / n0) + 1e-9, 6) AS delong_se,
        |  round(auc - 1.96 * sqrt(s10 / n1 + s01 / n0) + 1e-9, 6)
        |    AS ci_lo,
        |  round(auc + 1.96 * sqrt(s10 / n1 + s01 / n0) + 1e-9, 6)
        |    AS ci_hi
        |FROM e""") { c =>
      val s = c.lineitem.select(
        col("l_quantity").cast("long").as("score"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val h = s.groupBy("score").agg(sum(col("y")).as("n1s"),
        (count(lit(1)) - sum(col("y"))).as("n0s"))
      val t = h.agg(sum(col("n1s")).as("n1"), sum(col("n0s")).as("n0"))
      val cw = graft.ops.Positional.withCumSums(h, Seq(col("score")),
        Seq(col("n0s") -> "c0lt", col("n1s") -> "c1lt"))
      val w = cw.crossJoin(broadcast(t)).select(col("n1s"), col("n0s"),
        (lit(2) * col("c0lt") + col("n0s")).as("w0"),
        (lit(2) * (col("n1") - col("c1lt") - col("n1s")) + col("n1s"))
          .as("w1"))
      val m = w.agg(sum(col("n1s") * col("w0")).as("sw0"),
        sum(col("n1s") * col("w0") * col("w0")).as("sw0q"),
        sum(col("n0s") * col("w1")).as("sw1"),
        sum(col("n0s") * col("w1") * col("w1")).as("sw1q"))
      val e = m.crossJoin(broadcast(t)).select(col("n1"), col("n0"),
        (col("sw0") * lit(1.0) / (lit(2.0) * col("n1") * col("n0")))
          .as("auc"),
        ((col("sw0q") - col("sw0") * lit(1.0) * col("sw0") / col("n1")) /
          (col("n1") - 1) / (lit(4.0) * col("n0") * col("n0")))
          .as("s10"),
        ((col("sw1q") - col("sw1") * lit(1.0) * col("sw1") / col("n0")) /
          (col("n0") - 1) / (lit(4.0) * col("n1") * col("n1")))
          .as("s01"))
      val se = sqrt(col("s10") / col("n1") + col("s01") / col("n0"))
      e.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        r6(col("auc")).as("auc"), r6(se).as("delong_se"),
        r6(col("auc") - lit(1.96) * se).as("ci_lo"),
        r6(col("auc") + lit(1.96) * se).as("ci_hi"))
    },

    // F1-optimal THRESHOLD SELECTION (the deployment step after any
    // scored classifier — pick the cutoff, don't ship the curve): one
    // candidate per distinct score on the same Positional.withCumSums
    // distributed-cumulative path as ml_pr_curve, tp/fp/fn exact
    // integers per threshold, F1 an integer-ratio double rounded once,
    // and the argmax taken by a max(struct(f1, −t, …)) reduce — ties
    // break to the SMALLER threshold on both engines. One aggregation
    // + one model-sized reduce; no per-threshold rescan.
    q("ml_best_threshold",
      """WITH s AS (SELECT l_quantity::BIGINT score,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |  FROM lineitem),
        |h AS (SELECT score, count(*)::BIGINT n, sum(y)::BIGINT pos
        |      FROM s GROUP BY 1),
        |t AS (SELECT sum(pos)::BIGINT tpos, sum(n)::BIGINT ntot FROM h),
        |cw AS (SELECT score,
        |         coalesce(sum(n) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cn_lt,
        |         coalesce(sum(pos) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) cp_lt
        |       FROM h),
        |f AS (SELECT score,
        |        (t.tpos - cp_lt)::BIGINT tp,
        |        (t.ntot - cn_lt - (t.tpos - cp_lt))::BIGINT fp,
        |        (cp_lt)::BIGINT fn,
        |        round(2.0 * (t.tpos - cp_lt)
        |          / (2 * (t.tpos - cp_lt)
        |             + (t.ntot - cn_lt - (t.tpos - cp_lt)) + cp_lt)
        |          + 1e-9, 6) f1
        |      FROM cw, t),
        |bst AS (SELECT score, tp, fp, fn, f1 FROM f
        |        ORDER BY f1 DESC, score LIMIT 1)
        |SELECT score AS best_threshold, tp, fp, fn,
        |  round(tp * 1.0 / (tp + fp) + 1e-9, 6) AS precision,
        |  round(tp * 1.0 / (tp + fn) + 1e-9, 6) AS recall, f1
        |FROM bst""") { c =>
      val s = c.lineitem.select(
        col("l_quantity").cast("long").as("score"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val h = s.groupBy("score")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val t = h.agg(sum(col("pos")).as("tpos"), sum(col("n")).as("ntot"))
      val cum = graft.ops.Positional.withCumSums(h, Seq(col("score")),
        Seq(col("n") -> "cn_lt", col("pos") -> "cp_lt"))
      val f = cum.crossJoin(broadcast(t))
        .withColumn("tp", col("tpos") - col("cp_lt"))
        .withColumn("fp",
          col("ntot") - col("cn_lt") - (col("tpos") - col("cp_lt")))
        .withColumn("fn", col("cp_lt"))
        .withColumn("f1", r6(lit(2.0) * col("tp") /
          (lit(2) * col("tp") + col("fp") + col("fn"))))
      val best = f.agg(max(struct(col("f1"), (-col("score")).as("negs"),
        col("score"), col("tp"), col("fp"), col("fn"))).as("b"))
      best.select(col("b.score").as("best_threshold"),
        col("b.tp").as("tp"), col("b.fp").as("fp"), col("b.fn").as("fn"),
        r6(col("b.tp") * lit(1.0) / (col("b.tp") + col("b.fp")))
          .as("precision"),
        r6(col("b.tp") * lit(1.0) / (col("b.tp") + col("b.fn")))
          .as("recall"),
        col("b.f1").as("f1"))
    },

    // Precision-recall curve over the score HISTOGRAM: one point per
    // distinct score threshold, cumulative TP/FP on the SAME
    // distributed path rocAuc/averagePrecision take (r7 verdict ask
    // #5): Positional.withCumSums buckets the distinct-score relation
    // by literal range boundaries and runs per-bucket windows plus a
    // broadcast offsets prefix-sum, so a CONTINUOUS-score corpus never
    // collapses onto one partition. The ≥-threshold cumulatives come
    // from the ascending exclusive cumsums as total − cum(<s).
    // Precision/recall are exact rationals of integer counts, rounded
    // once.
    q("ml_pr_curve",
      """WITH s AS (SELECT l_quantity AS score,
        |                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |h AS (SELECT score, count(*) n, sum(y) pos FROM s GROUP BY 1),
        |t AS (SELECT sum(pos) tpos FROM h),
        |c AS (SELECT score,
        |             sum(pos) OVER (ORDER BY score DESC) ctp,
        |             sum(n)   OVER (ORDER BY score DESC) cn
        |      FROM h)
        |SELECT score, ctp::BIGINT AS tp, (cn - ctp)::BIGINT AS fp,
        |       round(ctp * 1.0 / cn + 1e-9, 6) AS precision,
        |       round(ctp * 1.0 / t.tpos + 1e-9, 6) AS recall
        |FROM c, t ORDER BY score DESC""") { c =>
      val s = c.lineitem.select(col("l_quantity").as("score"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      val h = s.groupBy("score")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val cum = graft.ops.Positional.withCumSums(h, Seq(col("score")),
        Seq(col("n") -> "cn_lt", col("pos") -> "cp_lt"))
      val t = h.agg(sum(col("pos")).as("tpos"), sum(col("n")).as("ntot"))
      cum.crossJoin(broadcast(t))
        .withColumn("ctp", col("tpos") - col("cp_lt"))
        .withColumn("cn", col("ntot") - col("cn_lt"))
        .select(col("score"), col("ctp").as("tp"),
          (col("cn") - col("ctp")).as("fp"),
          r6(col("ctp") * lit(1.0) / col("cn")).as("precision"),
          r6(col("ctp") * lit(1.0) / col("tpos")).as("recall"))
        .orderBy(col("score").desc)
    },

    // Nelson–Aalen cumulative-hazard estimator — the CUMULATIVE-HAZARD
    // face of survival analysis beside stat_kaplan_meier's survival
    // CURVE (NA sums d/n hazard increments where KM multiplies
    // survival factors; NA is the integer-friendly estimator at
    // scale): time-to-first-error per
    // user from their first observed event, right-censored at the last
    // event when no error occurs. Every hazard increment d_i/n_i is a
    // ratio of EXACT integer counts quantized to 1e-9 BIGINT units, so
    // the cumulative hazard is an integer cumsum (order-independent by
    // construction — the text_lm_ppl lesson applied to survival) run
    // on Positional's range-bucketed distributed path, and ONE final
    // division per row makes the double. Risk counts come from the
    // same cumsum machinery (n_at_risk = total − #ended-before-t).
    q("ml_nelson_aalen",
      """WITH pe AS (SELECT user_id,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) t0,
        |    CAST(floor(epoch(min(ts) FILTER (event_type = 'error')))
        |      AS BIGINT) terr,
        |    CAST(floor(epoch(max(ts))) AS BIGINT) tlast
        |  FROM events GROUP BY 1),
        |u AS (SELECT user_id,
        |        CASE WHEN terr IS NOT NULL THEN (terr - t0) // 3600
        |             ELSE (tlast - t0) // 3600 END t,
        |        terr IS NOT NULL AS ev FROM pe),
        |d AS (SELECT t, count(*) FILTER (ev)::BIGINT d,
        |             count(*)::BIGINT ended FROM u GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT nu FROM u),
        |c AS (SELECT t, d,
        |        CAST(nu - coalesce(sum(ended) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS n_risk
        |      FROM d, tot),
        |h AS (SELECT t, d, n_risk,
        |        (2 * d * 1000000000 + n_risk) // (2 * n_risk) AS hp
        |      FROM c WHERE d > 0),
        |k AS (SELECT t, d, n_risk, hp,
        |        sum(hp) OVER (ORDER BY t) chp FROM h)
        |SELECT t AS t_hours, d AS d_events, n_risk,
        |       hp / 1e9 AS hazard, chp / 1e9 AS cum_hazard
        |FROM k ORDER BY t""") { c =>
      val pe = c.events.groupBy("user_id").agg(
        expr("unix_timestamp(min(ts))").as("t0"),
        expr("unix_timestamp(min(CASE WHEN event_type = 'error' THEN ts END))")
          .as("terr"),
        expr("unix_timestamp(max(ts))").as("tlast"))
      val u = pe.select(col("user_id"),
        when(col("terr").isNotNull, floor((col("terr") - col("t0")) / 3600))
          .otherwise(floor((col("tlast") - col("t0")) / 3600))
          .cast("long").as("t"),
        col("terr").isNotNull.as("ev"))
      val d = u.groupBy("t").agg(
        sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("ended"))
      val tot = u.agg(count(lit(1)).as("nu"))
      // exclusive cumsum of ended-before-t on the distributed path
      val cum = graft.ops.Positional.withCumSums(d, Seq(col("t")),
        Seq(col("ended") -> "ended_lt"))
      // hp = round(d·1e9 / n_risk) HALF-UP in PURE integer arithmetic
      // ((2a + n) div 2n) — a double round() here could tie-split
      // between engines at magnitudes where the 1e-9 nudge is below
      // one ulp
      val h = cum.crossJoin(broadcast(tot))
        .withColumn("n_risk", col("nu") - col("ended_lt"))
        .filter(col("d") > 0)
        .withColumn("hp",
          expr("(2 * d * 1000000000L + n_risk) div (2 * n_risk)"))
      val hc = graft.ops.Positional.withCumSums(
        h.select("t", "d", "n_risk", "hp"), Seq(col("t")),
        Seq(col("hp") -> "chp_lt"))
      hc.select(col("t").as("t_hours"), col("d").as("d_events"),
          col("n_risk"), (col("hp") / lit(1e9)).as("hazard"),
          ((col("chp_lt") + col("hp")) / lit(1e9)).as("cum_hazard"))
        .orderBy("t_hours")
    },

    // Mutual information between two categorical columns (the
    // entropy-based feature-selection / dependency screen):
    // I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), evaluated per CELL from
    // exact integer counts — the ln argument is (c_xy·N)/(c_x·c_y),
    // a ratio of exact integers, and each cell's contribution is
    // rounded BEFORE the total (engine ln() differs in the last ulp;
    // the 1e-6 lattice absorbs it; 15 rounded terms re-round at 1e-4).
    // One corpus aggregation + two broadcast-sized marginals.
    q("fe_mutual_info",
      """WITH j AS (SELECT o_orderpriority x, o_orderstatus y FROM orders),
        |t AS (SELECT count(*)::BIGINT nt FROM j),
        |cxy AS (SELECT x, y, count(*)::BIGINT c FROM j GROUP BY 1, 2),
        |cx AS (SELECT x, count(*)::BIGINT cx FROM j GROUP BY 1),
        |cy AS (SELECT y, count(*)::BIGINT cy FROM j GROUP BY 1),
        |k AS (SELECT cxy.x, cxy.y, cxy.c, cx.cx, cy.cy, t.nt,
        |        round((cxy.c::DOUBLE / t.nt) *
        |              ln(cxy.c::DOUBLE * t.nt / (cx.cx::DOUBLE * cy.cy))
        |              + 1e-9, 6) mi_part
        |      FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN t)
        |SELECT x, y, c, cx, cy, mi_part,
        |       round(sum(mi_part) OVER () + 1e-9, 4) AS mi_total
        |FROM k ORDER BY x, y""") { c =>
      val j = c.orders.select(col("o_orderpriority").as("x"),
        col("o_orderstatus").as("y"))
      val t = j.agg(count(lit(1)).as("nt"))
      val cxy = j.groupBy("x", "y").agg(count(lit(1)).as("c"))
      val cx = j.groupBy("x").agg(count(lit(1)).as("cx"))
      val cy = j.groupBy("y").agg(count(lit(1)).as("cy"))
      val k = cxy.join(broadcast(cx), Seq("x"))
        .join(broadcast(cy), Seq("y"))
        .crossJoin(broadcast(t))
        .select(col("x"), col("y"), col("c"), col("cx"), col("cy"),
          r6((col("c").cast("double") / col("nt")) *
            log(col("c").cast("double") * col("nt") /
              (col("cx").cast("double") * col("cy")))).as("mi_part"))
      k.withColumn("mi_total",
          r4(sum(col("mi_part")).over(Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing))))
        .select(col("x"), col("y"), col("c"), col("cx"), col("cy"),
          col("mi_part"), col("mi_total"))
        .orderBy("x", "y")
    },

    // Decile lift/gains table — rank by the score proxy, split into 10
    // equal-depth bins with the DISTRIBUTED Positional row number (no
    // global ntile window), per-bin response rate and cumulative lift
    // vs the base rate. The targeting-model evaluation every campaign/
    // quality-classifier rollout reads.
    q("ml_lift_table",
      """WITH s AS (SELECT l_orderkey, l_linenumber,
        |                  l_quantity + l_orderkey * 1e-9 AS score,
        |                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |r AS (SELECT y, row_number() OVER (ORDER BY score DESC,
        |                l_orderkey, l_linenumber) rn,
        |             count(*) OVER () n, sum(y) OVER () pos
        |      FROM s),
        |d AS (SELECT y, (rn - 1) * 10 // n AS decile, n, pos FROM r)
        |SELECT decile, count(*)::BIGINT AS n_rows,
        |       sum(y)::BIGINT AS n_pos,
        |       round(sum(y) * 1.0 / count(*) + 1e-9, 6) AS response_rate,
        |       round((sum(y) * 1.0 / count(*))
        |             / (max(pos) * 1.0 / max(n)) + 1e-9, 4) AS lift
        |FROM d GROUP BY decile ORDER BY decile""") { c =>
      import graft.ops.Positional
      val s = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + col("l_orderkey") * lit(1e-9)).as("score"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      // Positional needs the first sort column ASCENDING — rank on the
      // negated score so "best first" still holds
      val rn = Positional.withRowNumber(
        s.withColumn("negscore", -col("score")),
        Seq(col("negscore"), col("l_orderkey"), col("l_linenumber")), "rn")
      val tot = s.agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      rn.crossJoin(broadcast(tot))
        .select(col("y"), expr("(rn - 1) * 10 div n").as("decile"),
          col("n"), col("pos"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_rows"), sum(col("y")).as("n_pos"),
          r6(sum(col("y")) * lit(1.0) / count(lit(1)))
            .as("response_rate"),
          r4((sum(col("y")) * lit(1.0) / count(lit(1))) /
            (max(col("pos")) * lit(1.0) / max(col("n")))).as("lift"))
        .orderBy("decile")
    },

    // Population stability index (the model-monitoring drift metric):
    // bin boundaries come from the REFERENCE window's deciles (first
    // half of lineitem by ship date), both windows' prices are bucketed
    // by those same micro-rounded cutpoint literals, and
    // PSI = Σ (p−q)·ln(p/q) over the 10 bins (a model-sized relation;
    // bin fractions are exact count rationals, the PSI terms micro-
    // quantized before the sum). PSI > 0.2 = action threshold.
    q("ml_psi_drift",
      """WITH ref AS (SELECT l_extendedprice v FROM lineitem
        |             WHERE l_shipdate < '2024-06-01'),
        |cur AS (SELECT l_extendedprice v FROM lineitem
        |        WHERE l_shipdate >= '2024-06-01'),
        |b AS (SELECT list_transform(
        |               quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |               c -> round(c * 1e6 + 1e-9)) AS cuts
        |      FROM ref),
        |rb AS (SELECT len(list_filter(b.cuts,
        |                c -> round(r.v * 1e6 + 1e-9) >= c)) AS bin,
        |              count(*) n
        |       FROM ref r CROSS JOIN b GROUP BY 1),
        |cb AS (SELECT len(list_filter(b.cuts,
        |                c -> round(r.v * 1e6 + 1e-9) >= c)) AS bin,
        |              count(*) n
        |       FROM cur r CROSS JOIN b GROUP BY 1),
        |tt AS (SELECT (SELECT sum(n) FROM rb) rn, (SELECT sum(n) FROM cb) cn),
        |terms AS (SELECT rb.bin,
        |                 CAST(round((rb.n * 1.0 / tt.rn - cb.n * 1.0 / tt.cn)
        |                      * ln((rb.n * 1.0 / tt.rn) / (cb.n * 1.0 / tt.cn))
        |                      * 1e9 + 1e-9) AS BIGINT) term_u
        |          FROM rb JOIN cb ON rb.bin = cb.bin CROSS JOIN tt)
        |SELECT count(*)::BIGINT AS n_bins,
        |       round(sum(term_u) / 1e9 + 1e-9, 6) AS psi,
        |       round(sum(term_u) / 1e9 + 1e-9, 6) > 0.2 AS drifted
        |FROM terms""") { c =>
      val ref = c.lineitem.filter(col("l_shipdate") < lit("2024-06-01"))
        .select(col("l_extendedprice").as("v"))
      val cur = c.lineitem.filter(col("l_shipdate") >= lit("2024-06-01"))
        .select(col("l_extendedprice").as("v"))
      val cuts = ref.agg(transform(percentile(col("v"),
          typedlit((1 to 9).map(_ / 10.0))),
        x => round(x * lit(1e6) + lit(1e-9))).as("cuts"))
      def binned(df: org.apache.spark.sql.DataFrame) =
        df.crossJoin(broadcast(cuts))
          .select(size(filter(col("cuts"),
            cc => round(col("v") * lit(1e6) + lit(1e-9)) >= cc)).as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n"))
      val rb = binned(ref).withColumnRenamed("n", "rn_b")
      val cb = binned(cur).withColumnRenamed("n", "cn_b")
      val tt = rb.agg(sum(col("rn_b")).as("rn"))
        .crossJoin(cb.agg(sum(col("cn_b")).as("cn")))
      val terms = rb.join(cb, Seq("bin")).crossJoin(broadcast(tt))
        .select(round((col("rn_b") * lit(1.0) / col("rn") -
            col("cn_b") * lit(1.0) / col("cn")) *
          log((col("rn_b") * lit(1.0) / col("rn")) /
            (col("cn_b") * lit(1.0) / col("cn"))) * lit(1e9) + lit(1e-9))
          .cast("long").as("term_u"))
      terms.agg(count(lit(1)).as("n_bins"),
        r6(sum(col("term_u")) / lit(1e9)).as("psi"),
        (r6(sum(col("term_u")) / lit(1e9)) > 0.2).as("drifted"))
    },

    // Winsorization at p01/p99 — the robust clipping that precedes any
    // scale-sensitive fit: two exact percentiles from one pass become
    // plan literals via a 1-row broadcast; the clip is a pure
    // projection. Output is the per-flag profile of the clipped column
    // with exact clip counts.
    q("fe_winsorize",
      """WITH b AS (SELECT quantile_cont(l_extendedprice, 0.01) lo,
        |                  quantile_cont(l_extendedprice, 0.99) hi
        |           FROM lineitem),
        |w AS (SELECT l_returnflag,
        |             least(greatest(l_extendedprice, b.lo), b.hi) wv,
        |             (l_extendedprice < b.lo)::INT clip_lo,
        |             (l_extendedprice > b.hi)::INT clip_hi
        |      FROM lineitem CROSS JOIN b)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |       sum(clip_lo)::BIGINT AS n_clip_lo,
        |       sum(clip_hi)::BIGINT AS n_clip_hi,
        |       round(CAST(sum(CAST(wv AS DECIMAL(18,4))) AS DOUBLE)
        |             + 1e-9, 2) AS wsum
        |FROM w GROUP BY 1 ORDER BY 1""") { c =>
      val b = c.lineitem.agg(
        percentile(col("l_extendedprice"), lit(0.01)).as("lo"),
        percentile(col("l_extendedprice"), lit(0.99)).as("hi"))
      c.lineitem.crossJoin(broadcast(b))
        .select(col("l_returnflag"),
          least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
            .as("wv"),
          (col("l_extendedprice") < col("lo")).cast("int").as("clip_lo"),
          (col("l_extendedprice") > col("hi")).cast("int").as("clip_hi"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("clip_lo")).as("n_clip_lo"),
          sum(col("clip_hi")).as("n_clip_hi"),
          r2(dsum(col("wv"))).as("wsum"))
        .orderBy("l_returnflag")
    },

    // NEAREST-match asof (either direction, bounded) — the bidirectional
    // complement of join_asof's backward-only semantics: each purchase
    // pairs with the closest error event by ANY-direction time distance
    // within ±1 h, ties to the earlier event. Candidates come from the
    // bucketized band join (ops/IntervalJoin.bandJoin — never a BNLJ);
    // the winner is a per-purchase argmin window over candidates only.
    // Exact integer epoch-second distances.
    q("join_asof_nearest",
      """WITH p AS (SELECT event_id pid,
        |             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) pts
        |           FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT event_id eid,
        |             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) ets
        |      FROM events WHERE event_type = 'error'),
        |cand AS (SELECT p.pid, p.pts, e.eid, e.ets,
        |                abs(p.pts - e.ets) AS gap
        |         FROM p JOIN e ON abs(p.pts - e.ets) <= 3600),
        |best AS (SELECT *, row_number() OVER (PARTITION BY pid
        |                   ORDER BY gap, ets, eid) rn
        |         FROM cand)
        |SELECT pid, eid AS nearest_error, gap
        |FROM best WHERE rn = 1 ORDER BY pid""") { c =>
      import org.apache.spark.sql.expressions.Window
      val p = c.events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"),
          expr("unix_timestamp(ts)").as("pts"))
      val e = c.events.filter(col("event_type") === "error")
        .select(col("event_id").as("eid"),
          expr("unix_timestamp(ts)").as("ets"))
      val cand = graft.ops.IntervalJoin.bandJoin(
          p, "pts", e, "ets", delta = 3600L)
        .withColumn("gap", abs(col("pts") - col("ets")))
      cand.withColumn("rn", row_number().over(
          Window.partitionBy("pid")
            .orderBy(col("gap"), col("ets"), col("eid"))))
        .filter(col("rn") === 1)
        .select(col("pid"), col("eid").as("nearest_error"), col("gap"))
        .orderBy("pid")
    },

    // Holt's linear-trend (double exponential) smoothing per user
    // value series — the trend-aware forecast state the EWMA feature
    // (win_ewma) cannot carry. Runs as ops/Holt's secondary-sort
    // streaming scan: repartition by key, sort within partitions,
    // one O(1)-state pass per series — the 100 TB shape for per-key
    // recurrences outside window-frame reach. α=0.5/β=0.25 are dyadic
    // rationals, so 1−α/1−β are exact and both engines evaluate the
    // recurrence bit-identically; the oracle replays it as a
    // recursive CTE joined step rn → rn+1.
    q("ts_holt",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) rn,
        |         count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 50),
        |rec(user_id, rn, l, b, n) AS (
        |  SELECT user_id, 1, value, 0.0::DOUBLE, n FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |         0.5::DOUBLE * s.value + 0.5::DOUBLE * (rec.l + rec.b),
        |         0.25::DOUBLE * ((0.5::DOUBLE * s.value
        |             + 0.5::DOUBLE * (rec.l + rec.b)) - rec.l)
        |           + 0.75::DOUBLE * rec.b,
        |         rec.n
        |  FROM rec JOIN s ON s.user_id = rec.user_id
        |                 AND s.rn = rec.rn + 1)
        |SELECT user_id, n::BIGINT AS n, round(l + 1e-9, 4) AS level,
        |       round(b + 1e-9, 4) AS trend,
        |       round(l + b + 1e-9, 4) AS forecast
        |FROM rec WHERE rn = n ORDER BY user_id""",
      bench = true) { c =>
      val fitted = graft.ops.Holt.linear(
        c.events.filter(col("user_id") < 50),
        key = "user_id", order = Seq(col("ts"), col("event_id")),
        value = col("value"), alpha = 0.5, beta = 0.25)
      fitted.select(col("user_id"), col("n"),
          r4(col("level")).as("level"), r4(col("trend")).as("trend"),
          r4(col("level") + col("trend")).as("forecast"))
        .orderBy("user_id")
    },

    // Holt–Winters ADDITIVE seasonal (triple exponential) smoothing —
    // the season-aware forecast state above ts_holt, season length
    // m=4. Same secondary-sort O(m)-state scan (ops/Holt.winters:
    // circular seasonal buffer per live series); dyadic α/β/γ
    // (0.5/0.25/0.25) keep both engines bit-identical, and the oracle
    // replays the recurrence as a recursive CTE carrying the seasonal
    // buffer as a LIST column (head = s_{t−m}; step = drop head,
    // append the updated seasonal). Unique lateral aliases per the
    // recursive-CTE shadowing trap.
    q("ts_holt_winters",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) rn,
        |         count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 50),
        |rec(user_id, rn, l, b, sl, n) AS (
        |  SELECT user_id, 1, value, 0.0::DOUBLE,
        |         [0.0::DOUBLE, 0.0, 0.0, 0.0], n
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT user_id, rn, lnew,
        |         0.25::DOUBLE * (lnew - lprev) + 0.75::DOUBLE * bprev,
        |         sl_tail || [0.25::DOUBLE * (yv - lnew)
        |                     + 0.75::DOUBLE * sold],
        |         n
        |  FROM (
        |    SELECT s.user_id, s.rn, s.value yv, rec.l lprev, rec.b bprev,
        |           rec.sl[1] sold, rec.sl[2:4] sl_tail, rec.n,
        |           0.5::DOUBLE * (s.value - rec.sl[1])
        |             + 0.5::DOUBLE * (rec.l + rec.b) lnew
        |    FROM rec JOIN s ON s.user_id = rec.user_id
        |                   AND s.rn = rec.rn + 1))
        |SELECT user_id, n::BIGINT AS n, round(l + 1e-9, 4) AS level,
        |       round(b + 1e-9, 4) AS trend,
        |       round(sl[1] + 1e-9, 4) AS seasonal,
        |       round(l + b + sl[1] + 1e-9, 4) AS forecast
        |FROM rec WHERE rn = n ORDER BY user_id""") { c =>
      val fitted = graft.ops.Holt.winters(
        c.events.filter(col("user_id") < 50),
        key = "user_id", order = Seq(col("ts"), col("event_id")),
        value = col("value"), alpha = 0.5, beta = 0.25, gamma = 0.25,
        m = 4)
      fitted.select(col("user_id"), col("n"),
          r4(col("level")).as("level"), r4(col("trend")).as("trend"),
          r4(col("seasonal")).as("seasonal"),
          r4(col("level") + col("trend") + col("seasonal")).as("forecast"))
        .orderBy("user_id")
    },

    // Croston's intermittent-demand method (Croston 1972) — the
    // forecast state the Holt family lacks when most periods have NO
    // demand (spare parts, long-tail SKUs, per-user purchases): SES on
    // the demand SIZES and SES on the INTER-DEMAND INTERVALS, both
    // over the nonzero-demand subsequence only; demand rate = z/x per
    // period. Per-user daily purchase cents from one corpus
    // aggregation (purchase days are sparse per user — the method's
    // native regime), then ops/Holt.croston's secondary-sort
    // O(1)-state scan (the 100 TB per-key recurrence shape). α=0.5
    // dyadic → bit-identical recurrences; the oracle replays step
    // rn → rn+1 as a recursive CTE carrying (z, x, prev day).
    q("ts_croston",
      """WITH RECURSIVE s0 AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400)
        |              AS BIGINT) d,
        |         sum(CAST(round(value * 100 + 1e-9) AS BIGINT)) y
        |  FROM events WHERE event_type = 'purchase' AND user_id < 50
        |  GROUP BY 1, 2),
        |r AS (SELECT user_id, d, y,
        |        row_number() OVER (PARTITION BY user_id ORDER BY d) rn,
        |        count(*) OVER (PARTITION BY user_id) n
        |      FROM s0),
        |rec(user_id, rn, prevd, z, x, n) AS (
        |  SELECT user_id, 1, d, y::DOUBLE, 1.0::DOUBLE, n
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.rn, r.d,
        |         0.5::DOUBLE * r.y + 0.5::DOUBLE * rec.z,
        |         0.5::DOUBLE * (r.d - rec.prevd) + 0.5::DOUBLE * rec.x,
        |         rec.n
        |  FROM rec JOIN r ON r.user_id = rec.user_id
        |                 AND r.rn = rec.rn + 1)
        |SELECT user_id, n::BIGINT AS n_demands,
        |       round(z / 100 + 1e-9, 4) AS size_level,
        |       round(x + 1e-9, 4) AS interval_days,
        |       round(z / x / 100 + 1e-9, 4) AS demand_rate
        |FROM rec WHERE rn = n ORDER BY user_id""") { c =>
      val demands = c.events
        .filter(col("event_type") === "purchase" && col("user_id") < 50)
        .groupBy(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)")
            .as("d"))
        .agg(sum(expr("CAST(round(value * 100 + 1e-9) AS BIGINT)"))
          .as("y"))
      val fitted = graft.ops.Holt.croston(
        demands, key = "user_id", period = col("d"), value = col("y"),
        alpha = 0.5)
      fitted.select(col("user_id"), col("n").as("n_demands"),
          r4(col("size_level") / 100).as("size_level"),
          r4(col("interval_level")).as("interval_days"),
          r4(col("size_level") / col("interval_level") / 100)
            .as("demand_rate"))
        .orderBy("user_id")
    },

    // Periodogram power at candidate periods (Schuster 1898 — the
    // classical seasonality detector feeding ts_decompose's choice of
    // season length): DFT power of the demeaned hourly revenue series
    // at periods {6, 12, 24, 168} h. Determinism device for the trig
    // sums: demean EXACTLY (milli-cent integer half-up mean), then
    // round each yd·cos/sin term to the 1e-4 lattice with a 1e-6
    // nudge (cross-engine libm cos differs by ~1 ulp → term diff
    // ~1e-8 ≪ nudge ≪ grain) — every rounded term is exactly
    // representable, so the corpus sums are order-independent. Power
    // is shift-invariant, so raw hour indices need no re-basing.
    // Scale: one hash aggregate → ×4 periods → one aggregate.
    q("ts_periodogram",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |  FROM events GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT s FROM h),
        |d AS (SELECT hb, y * 1000 - (2 * s * 1000 + n) // (2 * n) yd, n
        |      FROM h, t),
        |p AS (SELECT unnest([6, 12, 24, 168]) per),
        |q AS (SELECT p.per, d.n,
        |        round(d.yd * cos(2 * pi() * d.hb / p.per) + 1e-6, 4) ct,
        |        round(d.yd * sin(2 * pi() * d.hb / p.per) + 1e-6, 4) st_
        |      FROM d, p),
        |g AS (SELECT per, max(n) n, sum(ct) re, sum(st_) im
        |      FROM q GROUP BY 1)
        |SELECT per AS period_hours, n AS n_hours,
        |       round((re * re + im * im) / (n::DOUBLE * n) / 1e10
        |             + 1e-9, 2) AS power
        |FROM g ORDER BY period_hours""") { c =>
      val h = c.events.select(
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cv"))
        .groupBy("hb").agg(sum(col("cv")).as("y"))
      val t = h.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      val d = h.crossJoin(broadcast(t))
        .select(col("hb"),
          (col("y") * 1000 -
            expr("(2 * s * 1000 + n) div (2 * n)")).as("yd"), col("n"))
      val p = d.select(col("hb"), col("yd"), col("n"),
        explode(array(lit(6), lit(12), lit(24), lit(168))).as("per"))
      val theta = lit(2) * lit(math.Pi) * col("hb") / col("per")
      val q = p.select(col("per"), col("n"),
        round(col("yd") * cos(theta) + lit(1e-6), 4).as("ct"),
        round(col("yd") * sin(theta) + lit(1e-6), 4).as("st_"))
      q.groupBy("per").agg(max(col("n")).as("n"),
          sum(col("ct")).as("re"), sum(col("st_")).as("im"))
        .select(col("per").as("period_hours"), col("n").as("n_hours"),
          r2((col("re") * col("re") + col("im") * col("im")) /
            (col("n").cast("double") * col("n")) / lit(1e10))
            .as("power"))
        .orderBy("period_hours")
    },

    // Spectral entropy over the ts_periodogram frequency probe set
    // (Inouye et al. 1991; the "how concentrated is the power
    // spectrum?" forecastability signal — white noise → H ≈ 1, a
    // single dominant cycle → H ≈ 0). Same exactness device as the
    // periodogram: per-term cos/sin products round ONCE to the 1e-4
    // lattice before summing, each per-period power then rounds to a
    // shared 4-decimal value on BOTH engines, and the entropy
    // −Σ q·ln q / ln K folds over those ROUNDED powers in pinned
    // period order — the engines' libm sees identical inputs in an
    // identical expression tree. Zero-power periods contribute 0.
    q("ts_spectral_entropy",
      """WITH h AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 hb,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |  FROM events GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT s FROM h),
        |d AS (SELECT hb, y * 1000 - (2 * s * 1000 + n) // (2 * n) yd, n
        |      FROM h, t),
        |p AS (SELECT unnest([6, 12, 24, 48, 168]) per),
        |qt AS (SELECT p.per, d.n,
        |        round(d.yd * cos(2 * pi() * d.hb / p.per) + 1e-6, 4) ct,
        |        round(d.yd * sin(2 * pi() * d.hb / p.per) + 1e-6, 4) st_
        |      FROM d, p),
        |g AS (SELECT per, max(n) n, sum(ct) re, sum(st_) im
        |      FROM qt GROUP BY 1),
        |pw AS (SELECT per,
        |         round((re * re + im * im) / (n::DOUBLE * n) / 1e10
        |               + 1e-9, 4) pk
        |       FROM g),
        |tot AS (SELECT sum(pk) tp, count(*)::BIGINT k FROM pw),
        |e AS (SELECT list_reduce(
        |          list(CASE WHEN pk <= 0 THEN 0.0
        |               ELSE -(pk / tp) * ln(pk / tp) END ORDER BY per),
        |          (acc, x) -> acc + x) hsum, max(k) k
        |      FROM pw, tot GROUP BY tp)
        |SELECT k AS n_periods,
        |  round(hsum / ln(k) + 1e-9, 6) AS spectral_entropy
        |FROM e""") { c =>
      val h = c.events.select(
          floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hb"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("cv"))
        .groupBy("hb").agg(sum(col("cv")).as("y"))
      val t = h.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      val d = h.crossJoin(broadcast(t))
        .select(col("hb"),
          (col("y") * 1000 -
            expr("(2 * s * 1000 + n) div (2 * n)")).as("yd"), col("n"))
      val p = d.select(col("hb"), col("yd"), col("n"),
        explode(array(lit(6), lit(12), lit(24), lit(48), lit(168)))
          .as("per"))
      val theta = lit(2) * lit(math.Pi) * col("hb") / col("per")
      val qt = p.select(col("per"), col("n"),
        round(col("yd") * cos(theta) + lit(1e-6), 4).as("ct"),
        round(col("yd") * sin(theta) + lit(1e-6), 4).as("st_"))
      val pw = qt.groupBy("per").agg(max(col("n")).as("n"),
          sum(col("ct")).as("re"), sum(col("st_")).as("im"))
        .select(col("per"),
          r4((col("re") * col("re") + col("im") * col("im")) /
            (col("n").cast("double") * col("n")) / lit(1e10)).as("pk"))
      val tot = pw.agg(sum(col("pk")).as("tp"),
        count(lit(1)).as("k"))
      pw.crossJoin(broadcast(tot))
        .agg(aggregate(array_sort(collect_list(struct(col("per"),
            when(col("pk") <= 0, lit(0.0)).otherwise(
              -(col("pk") / col("tp")) * log(col("pk") / col("tp")))
              .as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("hsum"),
          max(col("k")).as("k"))
        .select(col("k").as("n_periods"),
          r6(col("hsum") / log(col("k"))).as("spectral_entropy"))
    },

    // Scalar Kalman filter per user value series (random-walk state +
    // observation noise — the online denoiser beside Holt's trend
    // smoother). Same secondary-sort streaming scan (ops/Kalman.scala:
    // repartition by key, one O(1)-state pass per series); the oracle
    // replays the recurrence operation-for-operation as a recursive
    // CTE (division is correctly-rounded IEEE on both engines, so
    // identical operand bits give identical quotients; Q=0.25, R=1
    // are dyadic so the additions are exact too).
    q("ts_kalman",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) rn,
        |         count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 50),
        |rec(user_id, rn, x, p, k, n) AS (
        |  SELECT user_id, 1, value, 1.0::DOUBLE, 0.0::DOUBLE, n
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |         rec.x + ((rec.p + 0.25::DOUBLE) /
        |                  ((rec.p + 0.25::DOUBLE) + 1.0::DOUBLE))
        |               * (s.value - rec.x),
        |         (1.0::DOUBLE - (rec.p + 0.25::DOUBLE) /
        |                        ((rec.p + 0.25::DOUBLE) + 1.0::DOUBLE))
        |           * (rec.p + 0.25::DOUBLE),
        |         (rec.p + 0.25::DOUBLE) /
        |           ((rec.p + 0.25::DOUBLE) + 1.0::DOUBLE),
        |         rec.n
        |  FROM rec JOIN s ON s.user_id = rec.user_id
        |                 AND s.rn = rec.rn + 1)
        |SELECT user_id, n::BIGINT AS n, round(x + 1e-9, 4) AS state,
        |       round(p + 1e-9, 6) AS p_var, round(k + 1e-9, 6) AS gain
        |FROM rec WHERE rn = n ORDER BY user_id""") { c =>
      val fitted = graft.ops.Kalman.scalar(
        c.events.filter(col("user_id") < 50),
        key = "user_id", order = Seq(col("ts"), col("event_id")),
        value = col("value"), q = 0.25, r = 1.0)
      fitted.select(col("user_id"), col("n"),
          r4(col("state")).as("state"), r6(col("p_var")).as("p_var"),
          r6(col("gain")).as("gain"))
        .orderBy("user_id")
    },

    // Theil–Sen robust trend (Theil 1950 / Sen 1968): per-user slope =
    // the MEDIAN of all pairwise slopes (y_j−y_i)/(t_j−t_i) — the
    // outlier-immune alternative to the OLS trend (29% breakdown
    // point). PER-SERIES time trends; the GLOBAL sampled-pair
    // regression slope is stat_theil_sen (StatQueries) — different
    // granularity and pairing scheme, complementary operators. Scale shape: the pair join is PER-KEY (equi-join on
    // user_id, O(len²) within a series, never corpus × corpus) and
    // the median is an explicit middle-of-sorted-rounded construction
    // (window row_number + the avg-of-two-middles rule spelled out the
    // same way on both engines — no engine median() whose even-count
    // interpolation could differ). Slopes are rounded BEFORE ranking
    // so last-ulp division noise cannot flip the middle elements.
    q("ts_theilsen",
      """WITH s AS (SELECT user_id, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) t, value
        |           FROM events WHERE user_id < 50),
        |pr AS (SELECT a.user_id,
        |         round((b.value - a.value) / (b.t - a.t) + 1e-9, 6) sl
        |       FROM s a JOIN s b ON a.user_id = b.user_id AND a.t < b.t),
        |rk AS (SELECT user_id, sl,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY sl, user_id) rn,
        |         count(*) OVER (PARTITION BY user_id) np FROM pr),
        |med AS (SELECT user_id, max(np)::BIGINT n_pairs,
        |          round(avg(sl) + 1e-9, 6) slope
        |        FROM rk WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
        |        GROUP BY 1)
        |SELECT user_id, n_pairs, slope FROM med ORDER BY user_id""") { c =>
      val s = c.events.filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"),
          expr("unix_timestamp(ts)").as("t"), col("value"))
      val a = s.as("a")
      val b = s.as("b")
      val pr = a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.t") < col("b.t"))
        .select(col("a.user_id").as("user_id"),
          r6((col("b.value") - col("a.value")) /
            (col("b.t") - col("a.t"))).as("sl"))
      val w = Window.partitionBy("user_id").orderBy(col("sl"), col("user_id"))
      val rk = pr
        .withColumn("rn", row_number().over(w))
        .withColumn("np", count(lit(1)).over(Window.partitionBy("user_id")))
      rk.filter(col("rn") === expr("(np + 1) div 2") ||
          col("rn") === expr("np div 2 + 1"))
        .groupBy("user_id")
        .agg(max(col("np")).cast("long").as("n_pairs"),
          r6(avg(col("sl"))).as("slope"))
        .orderBy("user_id")
    },

    // The hashing trick (Weinberger et al. 2009): project an unbounded
    // token vocabulary onto a FIXED 64-dim signed feature space with no
    // vocabulary dictionary at all — the standard featurizer when a
    // fitted vocabulary (e.g. CountVectorizer) would itself be
    // corpus-scale state. Bucket and sign both derive from md5 prefixes
    // (engine-portable, unlike murmur), so the whole featurization is a
    // stateless per-row projection + one hash aggregation — nothing is
    // fit, nothing broadcast, nothing collected.
    q("fe_feature_hashing",
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) w
        |  FROM documents WHERE doc_id < 40),
        |h AS (SELECT doc_id,
        |             ('0x' || substr(md5(w), 1, 8))::BIGINT % 64 AS bucket,
        |             CASE WHEN ('0x' || substr(md5(w), 9, 1))::BIGINT % 2 = 0
        |                  THEN 1 ELSE -1 END sgn
        |      FROM tok)
        |SELECT doc_id, bucket, sum(sgn)::BIGINT AS val,
        |       count(*)::BIGINT AS n_tokens
        |FROM h GROUP BY 1, 2 HAVING sum(sgn) != 0
        |ORDER BY doc_id, bucket""") { c =>
      val tok = c.documents.filter(col("doc_id") < 40)
        .select(col("doc_id"), explode(
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      val h = tok.select(col("doc_id"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % 64)
          .as("bucket"),
        when(conv(substring(md5(col("w")), 9, 1), 16, 10)
          .cast("long") % 2 === 0, 1).otherwise(-1).as("sgn"))
      h.groupBy("doc_id", "bucket")
        .agg(sum(col("sgn")).as("val"), count(lit(1)).as("n_tokens"))
        .filter(col("val") =!= 0)
        .orderBy("doc_id", "bucket")
    },

    // Classical seasonal decomposition (trend = centered ±12 h moving
    // average, seasonal = hour-of-day mean of the detrended series,
    // residual = remainder) over the hourly event-value series. The
    // only corpus-sized pass is the hourly aggregation; every window
    // after it runs on the TIME-BOUNDED hourly series (one row per
    // hour of history — grows with calendar time, not data volume), so
    // the unpartitioned centered-MA window is model-sized by
    // construction. Output: the 24 seasonal indices plus the variance
    // fraction the trend+seasonal fit explains.
    q("ts_decompose",
      """WITH h AS (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600)
        |                    AS BIGINT) hb,
        |                  avg(value) y
        |           FROM events GROUP BY 1),
        |t AS (SELECT hb, y,
        |             avg(y) OVER (ORDER BY hb ROWS BETWEEN 12 PRECEDING
        |                          AND 12 FOLLOWING) trend,
        |             count(*) OVER (ORDER BY hb ROWS BETWEEN 12 PRECEDING
        |                            AND 12 FOLLOWING) win_n
        |      FROM h),
        |d AS (SELECT hb, y, trend, y - trend detr FROM t
        |      WHERE win_n = 25),
        |s AS (SELECT hb % 24 hr, avg(detr) seas FROM d GROUP BY 1),
        |r AS (SELECT d.hb, d.y, s.seas, d.detr - s.seas resid
        |      FROM d JOIN s ON d.hb % 24 = s.hr),
        |vars AS (SELECT var_samp(y) vy, var_samp(resid) vr FROM r)
        |SELECT s.hr::BIGINT AS hr, round(s.seas + 1e-9, 4) AS seasonal,
        |       round(1 - vars.vr / vars.vy + 1e-9, 6) AS frac_explained
        |FROM s, vars ORDER BY hr""") { c =>
      val h = c.events
        .groupBy(floor(unix_timestamp(col("ts")) / lit(3600.0)).as("hb"))
        .agg(avg(col("value")).as("y"))
      val wMa = Window.orderBy("hb").rowsBetween(-12, 12)
      val d = h
        .withColumn("trend", avg(col("y")).over(wMa))
        .withColumn("win_n", count(lit(1)).over(wMa))
        .filter(col("win_n") === 25)
        .withColumn("detr", col("y") - col("trend"))
      val s = d.groupBy((col("hb") % 24).as("hr"))
        .agg(avg(col("detr")).as("seas"))
      val r = d.join(broadcast(s), col("hb") % 24 === col("hr"))
        .withColumn("resid", col("detr") - col("seas"))
      val vars = r.agg(var_samp(col("y")).as("vy"),
        var_samp(col("resid")).as("vr"))
      s.crossJoin(broadcast(vars))
        .select(col("hr").cast("long").as("hr"),
          r4(col("seas")).as("seasonal"),
          r6(lit(1) - col("vr") / col("vy")).as("frac_explained"))
        .orderBy("hr")
    },

    // Weight-of-Evidence / Information-Value screen (the credit-
    // scoring categorical-predictor ranking; Siddiqi 2006): per
    // order-priority category, WOE = ln((bad_i/B)/(good_i/G)) for
    // bad = status 'F', and IV = Σ (bad_i/B − good_i/G)·WOE_i.
    // Determinism: counts are exact integers; WOE's argument is ONE
    // exact rational (bad_i·G)/(good_i·B) of BIGINT products cast to
    // double (< 2^53, exact), so both engines ln() the same double and
    // r6 absorbs the last-ulp libm skew; IV parts are rounded to the
    // 1e-6 lattice BEFORE the 5-term total (each part exactly
    // representable, so the window sum is order-exact). Scale shape:
    // one hash aggregate → broadcast totals → 5-row window.
    q("fe_woe_iv",
      """WITH b AS (SELECT o_orderpriority cat,
        |        count(*) FILTER (o_orderstatus = 'F')::BIGINT bad,
        |        count(*) FILTER (o_orderstatus <> 'F')::BIGINT good
        |      FROM orders GROUP BY 1),
        |t AS (SELECT sum(bad)::BIGINT tb, sum(good)::BIGINT tg FROM b),
        |k AS (SELECT cat, bad, good,
        |        round(ln((bad * tg)::DOUBLE / (good * tb)) + 1e-9, 6)
        |          woe, tb, tg
        |      FROM b, t),
        |p AS (SELECT cat, bad, good, woe,
        |        round((bad::DOUBLE / tb - good::DOUBLE / tg) * woe
        |              + 1e-9, 6) iv_part
        |      FROM k)
        |SELECT cat, bad, good, woe, iv_part,
        |       round(sum(iv_part) OVER () + 1e-9, 4) AS iv
        |FROM p ORDER BY cat""") { c =>
      val b = c.orders.groupBy(col("o_orderpriority").as("cat"))
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("bad"),
          sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L))
            .as("good"))
      val t = b.agg(sum(col("bad")).as("tb"), sum(col("good")).as("tg"))
      val woe = r6(log((col("bad") * col("tg")).cast("double") /
        (col("good") * col("tb"))))
      val p = b.crossJoin(broadcast(t))
        .select(col("cat"), col("bad"), col("good"), woe.as("woe"),
          r6((col("bad").cast("double") / col("tb") -
            col("good").cast("double") / col("tg")) * woe).as("iv_part"))
      p.withColumn("iv",
          r4(sum(col("iv_part")).over(Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))))
        .orderBy("cat")
    },

    // MASE-style scaled forecast-error ratio (Hyndman & Koehler 2006
    // — the scale-free accuracy metric): per user series, mean
    // absolute 1-step naive error |y_t − y_{t−1}| scaled by the
    // season-4 naive error |y_t − y_{t−4}|. Every |Δ| is an exact
    // CENTS BIGINT from per-key window lags, so the ratio is ONE
    // double division of exact integer products s1·n4/(n1·s4).
    // Scale shape: per-key window lags + one hash aggregate.
    q("ts_mase",
      """WITH s AS (SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) c,
        |    lag(CAST(round(value * 100) AS BIGINT), 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) c1,
        |    lag(CAST(round(value * 100) AS BIGINT), 4) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) c4
        |  FROM events),
        |g AS (SELECT user_id,
        |        sum(abs(c - c1)) FILTER (c1 IS NOT NULL)::BIGINT s1,
        |        count(*) FILTER (c1 IS NOT NULL)::BIGINT n1,
        |        sum(abs(c - c4)) FILTER (c4 IS NOT NULL)::BIGINT s4,
        |        count(*) FILTER (c4 IS NOT NULL)::BIGINT n4
        |      FROM s GROUP BY 1
        |      HAVING count(*) FILTER (c4 IS NOT NULL) > 0
        |         AND sum(abs(c - c4)) FILTER (c4 IS NOT NULL) > 0)
        |SELECT user_id, n1, n4,
        |       round(s1 / 100.0 / n1 + 1e-9, 4) AS mae_naive1,
        |       round(s4 / 100.0 / n4 + 1e-9, 4) AS mae_naive4,
        |       round((s1::DOUBLE * n4) / (n1::DOUBLE * s4) + 1e-9, 6)
        |         AS mase
        |FROM g ORDER BY user_id""") { c =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cents = round(col("value") * 100).cast("long")
      val s = c.events.select(col("user_id"), cents.as("c"),
        lag(cents, 1).over(w).as("c1"), lag(cents, 4).over(w).as("c4"))
      s.groupBy("user_id")
        .agg(sum(when(col("c1").isNotNull, abs(col("c") - col("c1"))))
            .as("s1"),
          count(col("c1")).as("n1"),
          sum(when(col("c4").isNotNull, abs(col("c") - col("c4"))))
            .as("s4"),
          count(col("c4")).as("n4"))
        .filter(col("n4") > 0 && col("s4") > 0)
        .select(col("user_id"), col("n1"), col("n4"),
          r4(col("s1") / 100.0 / col("n1")).as("mae_naive1"),
          r4(col("s4") / 100.0 / col("n4")).as("mae_naive4"),
          r6((col("s1").cast("double") * col("n4")) /
            (col("n1").cast("double") * col("s4"))).as("mase"))
        .orderBy("user_id")
    },

    // Binary-segmentation changepoint detection (Scott & Knott 1974;
    // the offline default in ruptures) on the daily revenue series —
    // the BATCH sibling of the online ts_cusum_changepoint /
    // ts_page_hinkley detectors: find the split minimizing total SSE,
    // then recurse once into each half (depth 2, up to 3 change
    // points). The variance-reduction ordering of split t is preserved
    // by the EXACT integer score (cums_t*n - S*t)^2 // (t*(n-t)) — the
    // Otsu device on the time axis (n constant per segment; BIGINT
    // prefix sums of the kilodollar day series; squaring through
    // DECIMAL(38); floor division; ties to the earliest day) — so both
    // engines pick identical splits with zero FP in any argmax. Scale
    // shape: ONE corpus aggregation to the ~2.4k-row day grid, windows
    // only over that aggregated relation, three 1-row argmax limits
    // broadcast back (the graph_diameter pivot pattern).
    q("ts_binseg_changepoint",
      """WITH daily AS (SELECT o_orderdate d,
        |    (sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |     + 50000) // 100000 x
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT d, x,
        |          row_number() OVER (ORDER BY d) t,
        |          sum(x) OVER (ORDER BY d) cs
        |        FROM daily),
        |tot AS (SELECT count(*)::BIGINT n, sum(x)::BIGINT s FROM daily),
        |s1 AS (SELECT t, d, cs,
        |         ((cs * n - s * t)::HUGEINT * (cs * n - s * t))
        |           // (t * (n - t)) sc, n, s
        |       FROM cum, tot WHERE t < n),
        |b1 AS (SELECT t t1, d d1, cs cs1, sc sc1, n, s FROM s1
        |       ORDER BY sc DESC, t LIMIT 1),
        |r1 AS (SELECT 1 rnd, 'all' seg, t1 split_t, d1::VARCHAR
        |         split_day,
        |         round(cs1 * 1.0 / t1 + 1e-9, 6) mean_left,
        |         round((s - cs1) * 1.0 / (n - t1) + 1e-9, 6) mean_right,
        |         sc1::BIGINT score
        |       FROM b1),
        |sl AS (SELECT c.t, c.d, c.cs, b.t1, b.cs1,
        |         ((c.cs * b.t1 - b.cs1 * c.t)::HUGEINT
        |          * (c.cs * b.t1 - b.cs1 * c.t))
        |           // (c.t * (b.t1 - c.t)) sc
        |       FROM cum c, b1 b WHERE c.t < b.t1),
        |bl AS (SELECT * FROM sl ORDER BY sc DESC, t LIMIT 1),
        |r2 AS (SELECT 2 rnd, 'left' seg, t split_t, d::VARCHAR
        |         split_day,
        |         round(cs * 1.0 / t + 1e-9, 6) mean_left,
        |         round((cs1 - cs) * 1.0 / (t1 - t) + 1e-9, 6) mean_right,
        |         sc::BIGINT score
        |       FROM bl),
        |sr AS (SELECT c.t, c.d, c.cs, b.t1, b.cs1, b.n, b.s,
        |         (((c.cs - b.cs1) * (b.n - b.t1)
        |           - (b.s - b.cs1) * (c.t - b.t1))::HUGEINT
        |          * ((c.cs - b.cs1) * (b.n - b.t1)
        |             - (b.s - b.cs1) * (c.t - b.t1)))
        |           // ((c.t - b.t1) * (b.n - c.t)) sc
        |       FROM cum c, b1 b WHERE c.t > b.t1 AND c.t < b.n),
        |br AS (SELECT * FROM sr ORDER BY sc DESC, t LIMIT 1),
        |r3 AS (SELECT 2 rnd, 'right' seg, t split_t, d::VARCHAR
        |         split_day,
        |         round((cs - cs1) * 1.0 / (t - t1) + 1e-9, 6) mean_left,
        |         round((s - cs) * 1.0 / (n - t) + 1e-9, 6) mean_right,
        |         sc::BIGINT score
        |       FROM br)
        |SELECT rnd, seg, split_t::BIGINT AS split_t, split_day,
        |       mean_left, mean_right, score
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |      UNION ALL SELECT * FROM r3)
        |ORDER BY rnd, seg""") { c =>
      val daily = c.orders.groupBy(col("o_orderdate").as("d"))
        .agg(expr("(sum(CAST(round(o_totalprice * 100 + 1e-9) AS " +
          "BIGINT)) + 50000) div 100000").as("x"))
      val w = Window.orderBy("d")
      val cum = daily.select(col("d"), col("x"))
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("cs", sum(col("x")).over(w))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val s1 = cum.crossJoin(broadcast(tot)).filter(col("t") < col("n"))
        .withColumn("sc", expr(
          "CAST((CAST(cs * n - s * t AS DECIMAL(38,0)) * " +
          "(cs * n - s * t)) div (t * (n - t)) AS BIGINT)"))
      val b1 = s1.orderBy(col("sc").desc, col("t")).limit(1)
        .select(col("t").as("t1"), col("d").as("d1"),
          col("cs").as("cs1"), col("sc").as("sc1"), col("n"), col("s"))
      val r1 = b1.select(lit(1).as("rnd"), lit("all").as("seg"),
        col("t1").as("split_t"), col("d1").cast("string").as("split_day"),
        r6(col("cs1") * 1.0 / col("t1")).as("mean_left"),
        r6((col("s") - col("cs1")) * 1.0 / (col("n") - col("t1")))
          .as("mean_right"),
        col("sc1").as("score"))
      val bb = broadcast(b1)
      val sl = cum.crossJoin(bb).filter(col("t") < col("t1"))
        .withColumn("sc", expr(
          "CAST((CAST(cs * t1 - cs1 * t AS DECIMAL(38,0)) * " +
          "(cs * t1 - cs1 * t)) div (t * (t1 - t)) AS BIGINT)"))
      val r2 = sl.orderBy(col("sc").desc, col("t")).limit(1)
        .select(lit(2).as("rnd"), lit("left").as("seg"),
          col("t").as("split_t"), col("d").cast("string").as("split_day"),
          r6(col("cs") * 1.0 / col("t")).as("mean_left"),
          r6((col("cs1") - col("cs")) * 1.0 / (col("t1") - col("t")))
            .as("mean_right"),
          col("sc").as("score"))
      val sr = cum.crossJoin(bb)
        .filter(col("t") > col("t1") && col("t") < col("n"))
        .withColumn("sc", expr(
          "CAST((CAST((cs - cs1) * (n - t1) - (s - cs1) * (t - t1) AS " +
          "DECIMAL(38,0)) * ((cs - cs1) * (n - t1) - (s - cs1) * " +
          "(t - t1))) div ((t - t1) * (n - t)) AS BIGINT)"))
      val r3 = sr.orderBy(col("sc").desc, col("t")).limit(1)
        .select(lit(2).as("rnd"), lit("right").as("seg"),
          col("t").as("split_t"), col("d").cast("string").as("split_day"),
          r6((col("cs") - col("cs1")) * 1.0 / (col("t") - col("t1")))
            .as("mean_left"),
          r6((col("s") - col("cs")) * 1.0 / (col("n") - col("t")))
            .as("mean_right"),
          col("sc").as("score"))
      r1.union(r2).union(r3).orderBy("rnd", "seg")
    },

    // Kleinberg two-state burst detection (Kleinberg 2002) in its
    // ONLINE/FILTERED form over per-type daily event shares — the
    // trending-topic automaton: state 0 expects the base share
    // q0 = 1/8, state 1 the elevated q1 = 1/4, entering a burst pays a
    // toll, each day's label is the argmin of the running path costs
    // (ties to base). All four emission weights and the toll are
    // PRE-SCALED INTEGER micro-nat constants (round(-ln(q)*1e6)
    // computed offline — never an engine libm call), so the whole pass
    // is exact BIGINT arithmetic on both engines. Runs as the
    // Holt-device secondary-sort scan (ops/Burst.twoState); the oracle
    // replays the identical integer recurrence as a recursive CTE with
    // the holt_winters inner-derived-table device. The day x type grid
    // is DENSE (absent combinations count 0 — the detector needs the
    // gaps), built from one day aggregate x a broadcast type list.
    q("ts_burst_kleinberg",
      """WITH RECURSIVE ev AS (SELECT CAST(ts AS DATE) d, event_type et
        |  FROM events),
        |dt AS (SELECT d, count(*)::BIGINT n FROM ev GROUP BY 1),
        |ty AS (SELECT DISTINCT et FROM ev),
        |ct AS (SELECT d, et, count(*)::BIGINT k FROM ev GROUP BY 1, 2),
        |grid AS (SELECT ty.et, dt.d, coalesce(ct.k, 0)::BIGINT k, dt.n
        |         FROM dt CROSS JOIN ty
        |         LEFT JOIN ct ON ct.d = dt.d AND ct.et = ty.et),
        |s AS (SELECT et, d, k, n,
        |        row_number() OVER (PARTITION BY et ORDER BY d) rn,
        |        count(*) OVER (PARTITION BY et) nd
        |      FROM grid),
        |rec(et, rn, c0, c1, prev, nb, ni, fb, nd) AS (
        |  SELECT et, 1,
        |    k * 2079442 + (n - k) * 133531,
        |    4000000 + k * 1386294 + (n - k) * 287682,
        |    CASE WHEN 4000000 + k * 1386294 + (n - k) * 287682
        |              < k * 2079442 + (n - k) * 133531
        |         THEN 1 ELSE 0 END,
        |    CASE WHEN 4000000 + k * 1386294 + (n - k) * 287682
        |              < k * 2079442 + (n - k) * 133531
        |         THEN 1 ELSE 0 END,
        |    CASE WHEN 4000000 + k * 1386294 + (n - k) * 287682
        |              < k * 2079442 + (n - k) * 133531
        |         THEN 1 ELSE 0 END,
        |    CASE WHEN 4000000 + k * 1386294 + (n - k) * 287682
        |              < k * 2079442 + (n - k) * 133531
        |         THEN 1 ELSE 0 END,
        |    nd
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT et, rn, nc0, nc1,
        |    CASE WHEN nc1 < nc0 THEN 1 ELSE 0 END,
        |    nb + CASE WHEN nc1 < nc0 THEN 1 ELSE 0 END,
        |    ni + CASE WHEN nc1 < nc0 AND pv = 0 THEN 1 ELSE 0 END,
        |    CASE WHEN fb > 0 THEN fb
        |         WHEN nc1 < nc0 THEN rn ELSE 0 END,
        |    nd
        |  FROM (SELECT s.et, s.rn, rec.prev pv, rec.nb, rec.ni,
        |          rec.fb, rec.nd,
        |          least(rec.c0, rec.c1) + s.k * 2079442
        |            + (s.n - s.k) * 133531 nc0,
        |          least(rec.c1, rec.c0 + 4000000) + s.k * 1386294
        |            + (s.n - s.k) * 287682 nc1
        |        FROM rec JOIN s ON s.et = rec.et
        |                       AND s.rn = rec.rn + 1))
        |SELECT et AS event_type, nd::BIGINT AS n_days,
        |  nb::BIGINT AS n_burst, ni::BIGINT AS n_intervals,
        |  fb::BIGINT AS first_burst, least(c0, c1)::BIGINT AS cost
        |FROM rec WHERE rn = nd ORDER BY et""") { c =>
      val ev = c.events.select(col("ts").cast("date").as("d"),
        col("event_type").as("et"))
      val dayTot = ev.groupBy("d").agg(count(lit(1)).as("n"))
      val cnt = ev.groupBy("d", "et").agg(count(lit(1)).as("k"))
      val types = ev.select("et").distinct()
      val grid = dayTot.crossJoin(broadcast(types))
        .join(cnt, Seq("d", "et"), "left")
        .select(col("et"), col("d"),
          coalesce(col("k"), lit(0L)).as("k"), col("n"))
      graft.ops.Burst.twoState(grid, "et", Seq(col("d")),
          col("k"), col("n"),
          a0 = 2079442L, b0 = 133531L, a1 = 1386294L, b1 = 287682L,
          trans = 4000000L)
        .select(col("et").as("event_type"), col("n_days"),
          col("n_burst"), col("n_intervals"), col("first_burst"),
          col("cost"))
        .orderBy("event_type")
    },

    // SAX symbolic aggregate approximation (Lin, Keogh, Lonardi & Chiu
    // 2003 — the discretization behind motif discovery and symbolic
    // time-series indexing): per user series, 8-segment PAA of the
    // cent-quantized values, z-normalized against the user's own
    // mean/sd, mapped to a 4-letter alphabet at the Gaussian
    // quartile breakpoints (+-0.6745, pinned literals — never an
    // engine quantile call). Determinism: every count/sum is an exact
    // BIGINT, mean and sd derive from the one-pass integer moments
    // (vnum = n*Svv - Sv^2, exact; zero-variance series excluded on
    // the INTEGER vnum before sqrt), so each z is the identical
    // correctly-rounded double on both engines and every breakpoint
    // comparison lands identically. Scale shape: one user-partitioned
    // window pass for positions, two hash aggregations (user stats,
    // user x segment PAA), string assembly from an 8-element sorted
    // collect — never a corpus-wide sort or collect.
    q("ts_sax_symbols",
      """WITH e AS (SELECT user_id u,
        |    CAST(round(value * 100 + 1e-9) AS BIGINT) v,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) rn,
        |    count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 30),
        |us AS (SELECT u, max(n)::BIGINT n, sum(v)::BIGINT sv,
        |         sum(v * v)::BIGINT svv FROM e GROUP BY 1),
        |seg AS (SELECT u, (rn - 1) * 8 // n s, sum(v)::BIGINT ssum,
        |          count(*)::BIGINT scnt FROM e GROUP BY 1, 2),
        |z AS (SELECT seg.u, seg.s,
        |        (seg.ssum * 1.0 / seg.scnt - us.sv * 1.0 / us.n)
        |          / (sqrt((us.n * us.svv - us.sv * us.sv) * 1.0)
        |             / us.n) zv,
        |        us.n
        |      FROM seg JOIN us ON seg.u = us.u
        |      WHERE us.n * us.svv - us.sv * us.sv > 0),
        |sym AS (SELECT u, s, n,
        |          CASE WHEN zv < -0.6745 THEN 'a'
        |               WHEN zv < 0.0 THEN 'b'
        |               WHEN zv < 0.6745 THEN 'c'
        |               ELSE 'd' END sy
        |        FROM z)
        |SELECT u AS user_id, max(n)::BIGINT AS n,
        |  string_agg(sy, '' ORDER BY s) AS sax,
        |  count(DISTINCT sy)::BIGINT AS n_sym
        |FROM sym GROUP BY 1 ORDER BY user_id""") { c =>
      val w = Window.partitionBy("u")
        .orderBy(col("ts"), col("event_id"))
      val e = c.events.filter(col("user_id") < 30)
        .select(col("user_id").as("u"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("v"),
          col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("u")).cast("long"))
      val us = e.groupBy("u").agg(max(col("n")).as("n"),
        sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"))
      val seg = e.groupBy(col("u"), expr("(rn - 1) * 8 div n").as("s"))
        .agg(sum(col("v")).as("ssum"), count(lit(1)).as("scnt"))
      val z = seg.join(us, Seq("u"))
        .filter(col("n") * col("svv") - col("sv") * col("sv") > 0)
        .select(col("u"), col("s"), col("n"),
          ((col("ssum") * 1.0 / col("scnt") -
              col("sv") * 1.0 / col("n")) /
            (sqrt((col("n") * col("svv") - col("sv") * col("sv")) *
              1.0) / col("n"))).as("zv"))
      val sym = z.select(col("u"), col("s"), col("n"),
        when(col("zv") < -0.6745, "a")
          .when(col("zv") < 0.0, "b")
          .when(col("zv") < 0.6745, "c").otherwise("d").as("sy"))
      sym.groupBy(col("u").as("user_id"))
        .agg(max(col("n")).as("n"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(s, sy))), " +
            "x -> x.sy)"), "").as("sax"),
          countDistinct(col("sy")).as("n_sym"))
        .orderBy("user_id")
    },

    // Matrix profile (Yeh et al. 2016, ICDM — THE modern time-series
    // mining primitive): for every 7-day window of the daily revenue
    // series, the distance to its nearest non-overlapping neighbor
    // window; minima are MOTIFS (repeated structure), maxima are
    // DISCORDS (anomalies). This is the non-normalized (Euclidean-on-
    // levels) profile, so every pairwise distance is an EXACT BIGINT:
    // windows hold kilodollar integers and d2 = Sum (a_i - b_i)^2 folds
    // in one zip_with — both argmins and the motif/discord rankings
    // order on exact integers with pinned day ties. Scale shape: one
    // corpus aggregation to the day grid, a window-array projection
    // over that AGGREGATED relation, and the day-grid x day-grid pair
    // join (the documented ts_acf/day-grid BNLJ class, allowlisted
    // with a machine-checked GRID_BOUND — the grid is bounded by the
    // calendar, not the corpus). Top-5 motifs + top-5 discords out.
    q("ts_matrix_profile",
      """WITH daily AS (SELECT o_orderdate d,
        |    (sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |     + 50000) // 100000 x
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT d, x, row_number() OVER (ORDER BY d) t,
        |          list(x) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING
        |            AND CURRENT ROW) wa
        |        FROM daily),
        |win AS (SELECT t, d, wa FROM cum WHERE len(wa) = 7),
        |pr AS (SELECT a.t ta, a.d da, b.t tb,
        |         list_reduce(list_transform(range(1, 8),
        |           i -> (a.wa[i] - b.wa[i]) * (a.wa[i] - b.wa[i])),
        |           (p, q) -> p + q) d2
        |       FROM win a JOIN win b ON abs(a.t - b.t) >= 7),
        |nn AS (SELECT ta, da, tb, d2,
        |         row_number() OVER (PARTITION BY ta
        |           ORDER BY d2, tb) rn
        |       FROM pr),
        |n1 AS (SELECT ta, da, tb, d2 FROM nn WHERE rn = 1),
        |mo AS (SELECT 'motif' kind, ta, da, tb, d2,
        |         row_number() OVER (ORDER BY d2, ta) rk FROM n1),
        |di AS (SELECT 'discord' kind, ta, da, tb, d2,
        |         row_number() OVER (ORDER BY d2 DESC, ta) rk FROM n1)
        |SELECT kind, ta::BIGINT AS t, da::VARCHAR AS day,
        |  tb::BIGINT AS nn_t, d2::BIGINT AS nn_dist2
        |FROM (SELECT * FROM mo WHERE rk <= 5
        |      UNION ALL SELECT * FROM di WHERE rk <= 5)
        |ORDER BY kind, t""") { c =>
      val daily = c.orders.groupBy(col("o_orderdate").as("d"))
        .agg(expr("(sum(CAST(round(o_totalprice * 100 + 1e-9) AS " +
          "BIGINT)) + 50000) div 100000").as("x"))
      val wOrd = Window.orderBy("d")
      val win = daily
        .withColumn("t", row_number().over(wOrd).cast("long"))
        .withColumn("wa", collect_list(col("x")).over(
          wOrd.rowsBetween(-6, 0)))
        .filter(size(col("wa")) === 7)
        .select(col("t"), col("d"), col("wa"))
      val pairs = win.as("a")
        .join(win.as("b"), abs(col("a.t") - col("b.t")) >= 7)
        .select(col("a.t").as("ta"), col("a.d").as("da"),
          col("b.t").as("tb"), col("a.wa").as("waa"),
          col("b.wa").as("wab"))
        // UNROLLED 7-term distance (r15): zip_with + aggregate are
        // interpreted HOFs and this expression runs once per day-grid
        // PAIR (~5.8M rows on the TPC-H calendar) — the unrolled
        // element_at arithmetic is whole-stage-codegen'd and computes
        // the identical exact BIGINT (28.7 s -> 8.4 s at sf0.01)
        .withColumn("d2", (0 until 7).map { i =>
          val p = element_at(col("waa"), i + 1) -
            element_at(col("wab"), i + 1)
          p * p
        }.reduce(_ + _))
      val n1 = pairs.withColumn("rn", row_number().over(
          Window.partitionBy("ta").orderBy(col("d2"), col("tb"))))
        .filter(col("rn") === 1)
        .select(col("ta"), col("da"), col("tb"), col("d2"))
      val mo = n1.orderBy(col("d2").asc, col("ta")).limit(5)
        .select(lit("motif").as("kind"), col("ta"), col("da"),
          col("tb"), col("d2"))
      val di = n1.orderBy(col("d2").desc, col("ta")).limit(5)
        .select(lit("discord").as("kind"), col("ta"), col("da"),
          col("tb"), col("d2"))
      mo.union(di)
        .select(col("kind"), col("ta").as("t"),
          col("da").cast("string").as("day"), col("tb").as("nn_t"),
          col("d2").as("nn_dist2"))
        .orderBy("kind", "t")
    },

    // SES hyperparameter selection per user series — the alpha sweep a
    // forecasting pipeline actually runs before ts_holt: the simple-
    // exponential-smoothing recurrence for the dyadic grid
    // {1/4, 1/2, 3/4} evaluated SIMULTANEOUSLY in one secondary-sort
    // pass (ops/Holt.sesGrid, O(|grid|) state — not |grid| passes),
    // scored by one-step-ahead SSE, argmin with ties to the smaller
    // alpha. Dyadic alphas keep the recurrences bit-identical across
    // engines; the oracle carries one (level, sse) pair per alpha
    // through the recursive CTE and replays the identical argmin.
    q("ts_ses_grid",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) rn,
        |         count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 50),
        |rec(user_id, rn, l1, s1, l2, s2, l3, s3, n) AS (
        |  SELECT user_id, 1, value, 0.0::DOUBLE, value, 0.0::DOUBLE,
        |         value, 0.0::DOUBLE, n
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |    0.25::DOUBLE * s.value + 0.75::DOUBLE * rec.l1,
        |    rec.s1 + (s.value - rec.l1) * (s.value - rec.l1),
        |    0.5::DOUBLE * s.value + 0.5::DOUBLE * rec.l2,
        |    rec.s2 + (s.value - rec.l2) * (s.value - rec.l2),
        |    0.75::DOUBLE * s.value + 0.25::DOUBLE * rec.l3,
        |    rec.s3 + (s.value - rec.l3) * (s.value - rec.l3),
        |    rec.n
        |  FROM rec JOIN s ON s.user_id = rec.user_id
        |                 AND s.rn = rec.rn + 1)
        |SELECT user_id, n::BIGINT AS n,
        |  CASE WHEN s1 <= s2 AND s1 <= s3 THEN 0.25
        |       WHEN s2 <= s3 THEN 0.5 ELSE 0.75 END AS best_alpha,
        |  round(CASE WHEN s1 <= s2 AND s1 <= s3 THEN s1
        |             WHEN s2 <= s3 THEN s2 ELSE s3 END + 1e-9, 4)
        |    AS sse_best
        |FROM rec WHERE rn = n ORDER BY user_id""") { c =>
      val fitted = graft.ops.Holt.sesGrid(
        c.events.filter(col("user_id") < 50),
        key = "user_id", order = Seq(col("ts"), col("event_id")),
        value = col("value"), alphas = Seq(0.25, 0.5, 0.75))
      fitted.select(col("user_id"), col("n"), col("best_alpha"),
          r4(col("sse_best")).as("sse_best"))
        .orderBy("user_id")
    },

    // DAMPED-trend Holt smoothing (Gardner & McKenzie 1985 — the
    // long-horizon default of the M-competitions; phi = 1/2 flattens
    // the trend extrapolation plain ts_holt overshoots). Completes the
    // exponential-smoothing family (SES grid / Holt / Holt-Winters /
    // Croston / MACD) on the same secondary-sort scan
    // (ops/Holt.damped); dyadic alpha/beta/phi keep the recursive-CTE
    // oracle bit-identical (inner derived table computes l_t first,
    // the holt_winters device).
    q("ts_holt_damped",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) rn,
        |         count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 50),
        |rec(user_id, rn, l, b, n) AS (
        |  SELECT user_id, 1, value, 0.0::DOUBLE, n FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT user_id, rn, lnew,
        |         0.25::DOUBLE * (lnew - lprev)
        |           + 0.75::DOUBLE * (0.5::DOUBLE * bprev),
        |         n
        |  FROM (
        |    SELECT s.user_id, s.rn, rec.l lprev, rec.b bprev, rec.n,
        |           0.5::DOUBLE * s.value
        |             + 0.5::DOUBLE * (rec.l + 0.5::DOUBLE * rec.b) lnew
        |    FROM rec JOIN s ON s.user_id = rec.user_id
        |                   AND s.rn = rec.rn + 1))
        |SELECT user_id, n::BIGINT AS n, round(l + 1e-9, 4) AS level,
        |       round(b + 1e-9, 4) AS trend,
        |       round(l + 0.5::DOUBLE * b + 1e-9, 4) AS forecast
        |FROM rec WHERE rn = n ORDER BY user_id""") { c =>
      val fitted = graft.ops.Holt.damped(
        c.events.filter(col("user_id") < 50),
        key = "user_id", order = Seq(col("ts"), col("event_id")),
        value = col("value"), alpha = 0.5, beta = 0.25, phi = 0.5)
      fitted.select(col("user_id"), col("n"),
          r4(col("level")).as("level"), r4(col("trend")).as("trend"),
          r4(col("forecast")).as("forecast"))
        .orderBy("user_id")
    },

    // Hampel filter (Hampel 1974; Pearson's recommended despiker for
    // sensor/metric streams — replace a point more than 3 scaled MADs
    // from its rolling median, never smearing neighbors the way a
    // moving average does) over the daily value series: centered
    // 7-day window, median and MAD from the sorted window array, and
    // the decision rule runs ENTIRELY in integers — |y−med|·10000 >
    // 44478·mad encodes the 3·1.4826 Gaussian consistency constant
    // exactly, so the flag can never split on an engine's rounding.
    // Full windows only (the filter is undefined at the edges).
    // Scale: one corpus aggregation to the calendar-bounded daily
    // grid; the window runs over that model-sized relation.
    q("ts_hampel",
      """WITH d AS (SELECT CAST(ts AS DATE) d,
        |    sum(CAST(round(value * 100 + 1e-9) AS BIGINT))::BIGINT y
        |  FROM events GROUP BY 1),
        |a AS (SELECT d, y, list(y) OVER (ORDER BY d
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) arr
        |      FROM d),
        |f AS (SELECT d, y, arr, list_sort(arr)[4] med FROM a
        |      WHERE len(arr) = 7),
        |m AS (SELECT d, y, med,
        |        list_sort([abs(x - med) for x in arr])[4] mad
        |      FROM f)
        |SELECT d::VARCHAR AS day, y, med AS med7, mad AS mad7,
        |  abs(y - med) * 10000 > 44478 * mad AS is_outlier,
        |  CASE WHEN abs(y - med) * 10000 > 44478 * mad
        |       THEN med ELSE y END AS cleaned
        |FROM m ORDER BY day""") { c =>
      val d = c.events.select(col("ts").cast("date").as("d"),
          round(col("value") * 100 + lit(1e-9)).cast("long").as("c"))
        .groupBy("d").agg(sum(col("c")).as("y"))
      val w7 = Window.orderBy("d").rowsBetween(-3, 3)
      val a = d.withColumn("arr", collect_list(col("y")).over(w7))
        .filter(size(col("arr")) === 7)
        .withColumn("med", expr("element_at(array_sort(arr), 4)"))
        .withColumn("mad",
          expr("element_at(array_sort(transform(arr, x -> abs(x - med))), 4)"))
      a.select(col("d").cast("string").as("day"), col("y"),
          col("med").as("med7"), col("mad").as("mad7"),
          (abs(col("y") - col("med")) * 10000 > col("mad") * 44478)
            .as("is_outlier"),
          when(abs(col("y") - col("med")) * 10000 > col("mad") * 44478,
            col("med")).otherwise(col("y")).as("cleaned"))
        .orderBy("day")
    },

    // Lo–MacKinlay variance-ratio test (Lo & MacKinlay 1988) — the
    // random-walk screen on the daily-revenue series: VR(q) compares
    // the variance of q-day level changes to q× the 1-day variance
    // (VR≈1 under a random walk, <1 mean-reverting, >1 trending).
    // Every data reduction is an EXACT integer moment on the day-grid
    // cents series (ΣD, ΣD² with squares carried through HUGEINT /
    // DECIMAL(38,0)); the variances come out of the algebraic
    // expansion Σ(D−qμ)² = ΣD² − 2qμΣD + n(qμ)² — one fixed double
    // tree per engine, never an order-dependent sum of per-row
    // doubles. Windows run over the calendar-day aggregate
    // (machine-checked bounded by the plan audit).
    q("ts_variance_ratio",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(sum(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |lg AS (SELECT dy, cl,
        |    cl - lag(cl, 1) OVER (ORDER BY dy) d1,
        |    cl - lag(cl, 2) OVER (ORDER BY dy) d2,
        |    cl - lag(cl, 5) OVER (ORDER BY dy) d5
        |  FROM d),
        |m AS (SELECT count(d1)::BIGINT n1, sum(d1)::BIGINT s1,
        |        sum(d1::HUGEINT * d1) q1,
        |        count(d2)::BIGINT n2, sum(d2)::BIGINT s2,
        |        sum(d2::HUGEINT * d2) q2,
        |        count(d5)::BIGINT n5, sum(d5)::BIGINT s5,
        |        sum(d5::HUGEINT * d5) q5
        |      FROM lg),
        |v AS (SELECT n1,
        |        (q1::DOUBLE - 2 * (s1 * 1.0 / n1) * s1
        |         + n1 * (s1 * 1.0 / n1) * (s1 * 1.0 / n1)) / n1 v1,
        |        (q2::DOUBLE - 2 * (2 * (s1 * 1.0 / n1)) * s2
        |         + n2 * (2 * (s1 * 1.0 / n1)) * (2 * (s1 * 1.0 / n1)))
        |          / (n2 * 2) v2,
        |        (q5::DOUBLE - 2 * (5 * (s1 * 1.0 / n1)) * s5
        |         + n5 * (5 * (s1 * 1.0 / n1)) * (5 * (s1 * 1.0 / n1)))
        |          / (n5 * 5) v5
        |      FROM m)
        |SELECT n1 AS n_diffs,
        |  round(v2 / v1 + 1e-9, 6) AS vr2,
        |  round(v5 / v1 + 1e-9, 6) AS vr5,
        |  round((v2 / v1 - 1)
        |        / sqrt(2.0 * (2 * 2 - 1) * (2 - 1) / (3.0 * 2 * n1))
        |        + 1e-9, 6) AS z2,
        |  round((v5 / v1 - 1)
        |        / sqrt(2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5 * n1))
        |        + 1e-9, 6) AS z5
        |FROM v""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(round(sum(col("l_extendedprice")) * 100 + lit(1e-9))
          .cast("long").as("cl"))
      val w = Window.orderBy("dy")
      val lg = d.select(col("dy"), col("cl"),
        (col("cl") - lag(col("cl"), 1).over(w)).as("d1"),
        (col("cl") - lag(col("cl"), 2).over(w)).as("d2"),
        (col("cl") - lag(col("cl"), 5).over(w)).as("d5"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val m = lg.agg(
        count(col("d1")).as("n1"), sum(col("d1")).as("s1"),
        sum(dec(col("d1")) * col("d1")).as("q1"),
        count(col("d2")).as("n2"), sum(col("d2")).as("s2"),
        sum(dec(col("d2")) * col("d2")).as("q2"),
        count(col("d5")).as("n5"), sum(col("d5")).as("s5"),
        sum(dec(col("d5")) * col("d5")).as("q5"))
      val mu = col("s1") * lit(1.0) / col("n1")
      def varq(qc: org.apache.spark.sql.Column,
          sc: org.apache.spark.sql.Column,
          nc: org.apache.spark.sql.Column, q: Int) = {
        val qmu = if (q == 1) mu else lit(q) * mu
        (qc.cast("double") - lit(2) * qmu * sc + nc * qmu * qmu) /
          (if (q == 1) nc else nc * lit(q))
      }
      val v = m.select(col("n1"),
        varq(col("q1"), col("s1"), col("n1"), 1).as("v1"),
        varq(col("q2"), col("s2"), col("n2"), 2).as("v2"),
        varq(col("q5"), col("s5"), col("n5"), 5).as("v5"))
      def z(vr: org.apache.spark.sql.Column, q: Int) =
        (vr - 1) / sqrt(lit(2.0) * (2 * q - 1) * (q - 1) /
          (lit(3.0) * q * col("n1")))
      v.select(col("n1").as("n_diffs"),
        r6(col("v2") / col("v1")).as("vr2"),
        r6(col("v5") / col("v1")).as("vr5"),
        r6(z(col("v2") / col("v1"), 2)).as("z2"),
        r6(z(col("v5") / col("v1"), 5)).as("z5"))
    },

    // Dickey–Fuller unit-root test (Dickey & Fuller 1979, the
    // with-drift no-trend form): Δy_t = α + ρ·y_{t−1} + ε on the
    // daily-revenue cents series; H₀ (unit root) is ρ = 0. The OLS
    // fit is CLOSED-FORM over exact integer moments (Σx, Σz, Σx²,
    // Σxz, Σz² with products through HUGEINT / DECIMAL(38,0)):
    // ρ̂ = (nΣxz − ΣxΣz)/(nΣx² − (Σx)²), SSR by algebraic expansion,
    // se(ρ̂) = √(s²·n/(nΣx²−(Σx)²)) — every double is one fixed
    // expression tree over those integers, bit-identical on both
    // engines; no per-row double ever sums.
    q("ts_dickey_fuller",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(sum(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |lg AS (SELECT dy, cl,
        |    lag(cl, 1) OVER (ORDER BY dy) x
        |  FROM d),
        |p AS (SELECT x, cl - x z FROM lg WHERE x IS NOT NULL),
        |m AS (SELECT count(*)::BIGINT n, sum(x)::BIGINT sx,
        |        sum(z)::BIGINT sz, sum(x::HUGEINT * x) sxx,
        |        sum(x::HUGEINT * z) sxz, sum(z::HUGEINT * z) szz
        |      FROM p),
        |f AS (SELECT n, sx, sz, szz, sxz, sxx,
        |        (n::HUGEINT * sxz - sx::HUGEINT * sz)::DOUBLE
        |          / ((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE) rho
        |      FROM m),
        |g AS (SELECT n, rho,
        |        (sz - rho * sx) / n alpha,
        |        sxx, sxz, szz, sx, sz FROM f),
        |h AS (SELECT n, rho, alpha,
        |        szz::DOUBLE - 2 * alpha * sz - 2 * rho * sxz::DOUBLE
        |          + n * alpha * alpha + 2 * alpha * rho * sx
        |          + rho * rho * sxx::DOUBLE ssr,
        |        (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE dxx
        |      FROM g)
        |SELECT n,
        |  round(rho + 1e-9, 6) AS rho,
        |  round(alpha + 1e-9, 4) AS alpha,
        |  round(rho / sqrt((ssr / (n - 2)) * n / dxx) + 1e-9, 4)
        |    AS df_t
        |FROM h""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(round(sum(col("l_extendedprice")) * 100 + lit(1e-9))
          .cast("long").as("cl"))
      val w = Window.orderBy("dy")
      val lg = d.select(col("dy"), col("cl"),
        lag(col("cl"), 1).over(w).as("x"))
      val p = lg.filter(col("x").isNotNull)
        .select(col("x"), (col("cl") - col("x")).as("z"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val m = p.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("z")).as("sz"), sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("x")) * col("z")).as("sxz"),
        sum(dec(col("z")) * col("z")).as("szz"))
      val rho = (dec(col("n")) * col("sxz") -
        dec(col("sx")) * col("sz")).cast("double") /
        (dec(col("n")) * col("sxx") -
          dec(col("sx")) * col("sx")).cast("double")
      val f = m.select(col("n"), col("sx"), col("sz"), col("szz"),
        col("sxz"), col("sxx"), rho.as("rho"))
      val g = f.select(col("n"), col("rho"),
        ((col("sz") - col("rho") * col("sx")) / col("n")).as("alpha"),
        col("sxx"), col("sxz"), col("szz"), col("sx"), col("sz"))
      val h = g.select(col("n"), col("rho"), col("alpha"),
        (col("szz").cast("double") - lit(2) * col("alpha") * col("sz") -
          lit(2) * col("rho") * col("sxz").cast("double") +
          col("n") * col("alpha") * col("alpha") +
          lit(2) * col("alpha") * col("rho") * col("sx") +
          col("rho") * col("rho") * col("sxx").cast("double")).as("ssr"),
        (dec(col("n")) * col("sxx") - dec(col("sx")) * col("sx"))
          .cast("double").as("dxx"))
      h.select(col("n"),
        r6(col("rho")).as("rho"),
        r4(col("alpha")).as("alpha"),
        r4(col("rho") / sqrt((col("ssr") / (col("n") - 2)) * col("n") /
          col("dxx"))).as("df_t"))
    },

    // Cross-correlation function (Box & Jenkins §11.1) between the
    // daily click and purchase event-count series at lags −3..+3 —
    // the lead/lag screen before any transfer-function fit: per lag,
    // pairs join on an exact CALENDAR-day offset and r_k is the
    // closed-form Pearson over exact integer moments (Σxy, Σx², Σy²
    // through HUGEINT / DECIMAL(38,0)) — one fixed double tree per
    // lag, no order-dependent sum. The lag grid is a 7-row literal;
    // everything joins through plain equi-conditions on the day grid.
    q("ts_ccf",
      """WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) dy,
        |             event_type FROM events),
        |x AS (SELECT dy, count(*)::BIGINT xv FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |y AS (SELECT dy, count(*)::BIGINT yv FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1),
        |lg AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) k),
        |p AS (SELECT lg.k, x.xv, y.yv
        |      FROM lg, x JOIN y ON y.dy = x.dy + lg.k),
        |m AS (SELECT k, count(*)::BIGINT n, sum(xv)::BIGINT sx,
        |        sum(yv)::BIGINT sy, sum(xv::HUGEINT * yv) sxy,
        |        sum(xv::HUGEINT * xv) sxx, sum(yv::HUGEINT * yv) syy
        |      FROM p GROUP BY 1)
        |SELECT k AS lag, n AS n_pairs,
        |  round((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
        |        / sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE
        |               * ((n::HUGEINT * syy - sy::HUGEINT * sy)
        |                  ::DOUBLE)) + 1e-9, 6) AS ccf
        |FROM m ORDER BY lag""") { c =>
      val e = c.events.select(col("ts").cast("date").as("dy"),
        col("event_type"))
      val x = e.filter(col("event_type") === "click")
        .groupBy("dy").agg(count(lit(1)).as("xv"))
      val y = e.filter(col("event_type") === "purchase")
        .groupBy(col("dy").as("dy2")).agg(count(lit(1)).as("yv"))
      val lg = c.spark.createDataFrame(
        (-3 to 3).map(k => Tuple1(k.toLong))).toDF("k")
      val p = x.crossJoin(broadcast(lg))
        .join(y, col("dy2") === date_add(col("dy"), col("k").cast("int")))
      val dec = (v: org.apache.spark.sql.Column) => v.cast("decimal(38,0)")
      val m = p.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("xv")).as("sx"), sum(col("yv")).as("sy"),
        sum(dec(col("xv")) * col("yv")).as("sxy"),
        sum(dec(col("xv")) * col("xv")).as("sxx"),
        sum(dec(col("yv")) * col("yv")).as("syy"))
      m.select(col("k").as("lag"), col("n").as("n_pairs"),
          r6((dec(col("n")) * col("sxy") - dec(col("sx")) * col("sy"))
            .cast("double") /
            sqrt((dec(col("n")) * col("sxx") -
                dec(col("sx")) * col("sx")).cast("double") *
              (dec(col("n")) * col("syy") -
                dec(col("sy")) * col("sy")).cast("double"))).as("ccf"))
        .orderBy("lag")
    },

    // Turning-point randomness test (Kendall & Stuart §45.18) on the
    // daily-revenue series: T = #{t : x_t is a strict local max or
    // min}, E[T] = 2(n−2)/3, Var[T] = (16n−29)/90 — the whole
    // statistic is exact integer compares on lag/lead over the
    // calendar-day aggregate (strict inequalities, so a tie is
    // deterministically NOT a turning point on both engines), with
    // the one studentization at the end.
    q("ts_turning_points",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(sum(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT dy, cl, lag(cl) OVER (ORDER BY dy) p,
        |        lead(cl) OVER (ORDER BY dy) nx FROM d),
        |tp AS (SELECT count(*)::BIGINT n FROM d),
        |tc AS (SELECT sum(CASE WHEN (cl > p AND cl > nx)
        |                         OR (cl < p AND cl < nx)
        |                       THEN 1 ELSE 0 END)::BIGINT t
        |       FROM w WHERE p IS NOT NULL AND nx IS NOT NULL)
        |SELECT n, t AS turning_points,
        |  round(2.0 * (n - 2) / 3 + 1e-9, 4) AS e_t,
        |  round((t - 2.0 * (n - 2) / 3)
        |        / sqrt((16 * n - 29) / 90.0) + 1e-9, 6) AS z
        |FROM tp, tc""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(round(sum(col("l_extendedprice")) * 100 + lit(1e-9))
          .cast("long").as("cl"))
      val wd = Window.orderBy("dy")
      val w = d.select(col("dy"), col("cl"),
        lag(col("cl"), 1).over(wd).as("p"),
        lead(col("cl"), 1).over(wd).as("nx"))
      val tp = d.agg(count(lit(1)).as("n"))
      val tc = w.filter(col("p").isNotNull && col("nx").isNotNull)
        .agg(sum(when((col("cl") > col("p") && col("cl") > col("nx")) ||
          (col("cl") < col("p") && col("cl") < col("nx")), 1L)
          .otherwise(0L)).as("t"))
      tp.crossJoin(broadcast(tc))
        .select(col("n"), col("t").as("turning_points"),
          r4(lit(2.0) * (col("n") - 2) / 3).as("e_t"),
          r6((col("t") - lit(2.0) * (col("n") - 2) / 3) /
            sqrt((lit(16) * col("n") - 29) / lit(90.0))).as("z"))
    },

    // Smoothed target encoding (the Micci-Barreca 2001 empirical-Bayes
    // form every tabular-ML pipeline ships): brand → encoded rate
    // enc = (Σy + m·prior)/(cnt + m) with pinned smoothing m = 10,
    // where y = the part was EVER returned on a lineitem. Exact
    // integer sums end to end with ONE division per brand (and one
    // for the prior); the per-brand relation is the 25-value brand
    // domain — model-sized at any SF, one corpus join + aggregation.
    q("fe_target_encode",
      """WITH y AS (SELECT l_partkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) ret
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT p.p_brand brand, y.ret
        |      FROM part p JOIN y ON p.p_partkey = y.l_partkey),
        |g AS (SELECT brand, count(*)::BIGINT cnt, sum(ret)::BIGINT pos
        |      FROM j GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT n, sum(pos)::BIGINT p FROM g)
        |SELECT brand, cnt, pos,
        |  round(pos * 1.0 / cnt + 1e-9, 6) AS raw_rate,
        |  round((pos + 10 * (t.p * 1.0 / t.n)) / (cnt + 10) + 1e-9, 6)
        |    AS enc_smooth
        |FROM g, t ORDER BY brand""") { c =>
      val y = c.lineitem.groupBy("l_partkey")
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("ret"))
      val j = c.part
        .join(y, col("p_partkey") === col("l_partkey"))
        .select(col("p_brand").as("brand"), col("ret"))
      val g = j.groupBy("brand")
        .agg(count(lit(1)).as("cnt"), sum(col("ret")).as("pos"))
      val t = g.agg(sum(col("cnt")).as("n"), sum(col("pos")).as("p"))
      g.crossJoin(broadcast(t))
        .select(col("brand"), col("cnt"), col("pos"),
          r6(col("pos") * lit(1.0) / col("cnt")).as("raw_rate"),
          r6((col("pos") + lit(10) * (col("p") * lit(1.0) / col("n"))) /
            (col("cnt") + 10)).as("enc_smooth"))
        .orderBy("brand")
    },
  )
}
