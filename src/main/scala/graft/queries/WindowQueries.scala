package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.4 window/analytic surface (vendor/ibis/expr/operations/
  * window.py + analytic.py): Lag :33, Lead :38, MinRank :50, DenseRank :55,
  * RowNumber :60, PercentRank :65, CumeDist :72, NTile :79, NthValue :88,
  * First/LastValue (rewrites.py:72-96), frames rows|range with
  * preceding/following bounds (WindowBoundary :30), any reduction
  * `.over(window)`, and WindowAggregate / window_by time bucketing
  * (temporal_windows.py:18).
  *
  * Scale notes: every window here partitions by a key (supplier, user,
  * flag) — one shuffle per distinct (partitionBy, orderBy) pair; Spark
  * reuses the exchange across functions sharing the spec. Unpartitioned
  * windows (a single global sort) are avoided except where semantically
  * required on small inputs (join_positional).
  */
object WindowQueries {

  private val wSupp = Window.partitionBy("l_suppkey")
    .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))

  val defs: Seq[QueryDef] = Seq(

    // Time-decayed engagement score (the recency-weighted aggregate
    // every ranking/retention feature store carries): per user,
    // Σ value·2^(−days_to_horizon) — a HALF-LIFE-OF-ONE-DAY decay
    // chosen base-2 so every term is an EXACT dyadic rational
    // (cents·2^(−k) via an integer shift, never pow()): all terms sit
    // on the 2^(−31) lattice and their sum needs < 53 mantissa bits,
    // so the aggregation is bit-exact and order-independent with no
    // quantization step at all. One per-row projection + one hash
    // aggregation.
    q("win_time_decay",
      """WITH e AS (SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) cents,
        |    date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') dd
        |  FROM events),
        |s AS (SELECT user_id,
        |        sum(cents::DOUBLE / (1::BIGINT << least(dd, 31))) decv,
        |        sum(cents)::BIGINT tot, count(*)::BIGINT n
        |      FROM e GROUP BY 1)
        |SELECT user_id, n, round(tot / 100.0 + 1e-9, 2) AS total,
        |       round(decv / 100 + 1e-9, 6) AS decayed
        |FROM s ORDER BY user_id""") { c =>
      val e = c.events.select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        datediff(lit("2024-01-31").cast("date"),
          col("ts").cast("date")).as("dd"))
      e.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          r2(sum(col("cents")).cast("double") / 100.0).as("total"),
          r6(sum(col("cents").cast("double") /
            expr("shiftleft(1L, cast(least(dd, 31) as int))"))
            / 100).as("decayed"))
        .select(col("user_id"), col("n"), col("total"), col("decayed"))
        .orderBy("user_id")
    },

    // Ranking family over a deterministic (unique-key-extended) order.
    q("win_rank",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       row_number() OVER w AS rn,
        |       rank()       OVER w2 AS rk,
        |       dense_rank() OVER w2 AS drk,
        |       ntile(4)     OVER w AS nt
        |FROM lineitem
        |WHERE l_suppkey <= 10
        |WINDOW w  AS (PARTITION BY l_suppkey
        |              ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |       w2 AS (PARTITION BY l_suppkey ORDER BY l_quantity)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""") { c =>
      val w2 = Window.partitionBy("l_suppkey").orderBy(col("l_quantity"))
      c.lineitem.filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(wSupp).as("rn"),
          rank().over(w2).as("rk"),
          dense_rank().over(w2).as("drk"),
          ntile(4).over(wSupp).as("nt"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // percent_rank / cume_dist (analytic.py:65/:72).
    q("win_percent",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       round(percent_rank() OVER w + 1e-9, 4) AS prk,
        |       round(cume_dist()    OVER w + 1e-9, 4) AS cd
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""") { c =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      c.lineitem.filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          r4(percent_rank().over(w)).as("prk"),
          r4(cume_dist().over(w)).as("cd"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Lag / Lead with offsets and defaults (analytic.py:33/:38).
    q("win_lag_lead",
      """SELECT user_id, event_id,
        |       lag(event_type)        OVER w AS prev_type,
        |       lead(event_type)       OVER w AS next_type,
        |       lag(event_type, 2, 'none') OVER w AS prev2_type
        |FROM events WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""") { c =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      c.events.filter(col("user_id") <= 20)
        .select(col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          lag(col("event_type"), 2, "none").over(w).as("prev2_type"))
        .orderBy("user_id", "event_id")
    },

    // ROWS frame: moving sum/avg over the preceding 5 rows
    // (WindowBoundary preceding/following, how="rows").
    q("win_rows_frame",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       round(sum(l_quantity) OVER w + 1e-9, 2) AS mov_sum,
        |       round(avg(l_quantity) OVER w + 1e-9, 2) AS mov_avg,
        |       round(sum(l_quantity) OVER wcum + 1e-9, 2) AS cum_sum
        |FROM lineitem WHERE l_suppkey <= 10
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
        |       wcum AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""", bench = true) { c =>
      val w = wSupp.rowsBetween(-5, Window.currentRow)
      val wcum = wSupp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.lineitem.filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          r2(sum(col("l_quantity")).over(w)).as("mov_sum"),
          r2(avg(col("l_quantity")).over(w)).as("mov_avg"),
          r2(sum(col("l_quantity")).over(wcum)).as("cum_sum"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // RANGE frame on a numeric key (how="range"): all rows within ±2
    // quantity units.
    q("win_range_frame",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       count(*) OVER w AS n_close,
        |       round(sum(l_extendedprice) OVER w + 1e-9, 2) AS sum_close
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity
        |             RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""") { c =>
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity"))
        .rangeBetween(-2, 2)
      c.lineitem.filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          count(lit(1)).over(w).as("n_close"),
          r2(sum(col("l_extendedprice")).over(w)).as("sum_close"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // first_value / last_value / nth_value with explicit frames
    // (FirstValue/LastValue rewrite, NthValue analytic.py:88).
    q("win_nth",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       first_value(l_orderkey) OVER w AS first_ok,
        |       last_value(l_orderkey)  OVER wfull AS last_ok,
        |       nth_value(l_orderkey, 3) OVER wfull AS third_ok
        |FROM lineitem WHERE l_suppkey <= 10
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |       wfull AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""", bench = true) { c =>
      val wfull = wSupp.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      c.lineitem.filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          first(col("l_orderkey")).over(wSupp).as("first_ok"),
          last(col("l_orderkey")).over(wfull).as("last_ok"),
          nth_value(col("l_orderkey"), 3).over(wfull).as("third_ok"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Share-of-total: aggregate over an unordered partition window.
    q("win_share",
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |       round(l_extendedprice / sum(l_extendedprice) OVER (PARTITION BY l_returnflag) + 1e-9, 6) AS share
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""") { c =>
      val w = Window.partitionBy("l_returnflag")
      c.lineitem.filter(col("l_orderkey") <= 100)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          r6(col("l_extendedprice") / sum(col("l_extendedprice")).over(w))
            .as("share"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    },

    // WindowAggregate / window_by (temporal_windows.py:18): tumbling
    // 1-day buckets — Spark `window()` on event time; oracle date_trunc.
    // Weekly cohort retention: users cohorted by first-signup week,
    // counted distinct per (cohort, weeks-since) cell — the standard
    // retention triangle. Shape: one min-aggregate (cohort), one
    // user-keyed equi-join, one distinct-count aggregation; week
    // offsets are exact integer arithmetic on week-truncated dates.
    q("win_retention",
      """WITH su AS (SELECT user_id, date_trunc('week', min(ts)) cw,
        |              min(ts) signup_ts
        |            FROM events WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, su.cw,
        |          CAST(date_diff('day', su.cw::DATE,
        |               date_trunc('week', e.ts)::DATE) / 7 AS INT) week_offset
        |        FROM events e JOIN su USING (user_id)
        |        WHERE e.ts >= su.signup_ts)
        |SELECT CAST(cw AS TIMESTAMP) AS cohort_week, week_offset,
        |       count(DISTINCT user_id)::BIGINT AS n_active
        |FROM act GROUP BY cw, week_offset
        |ORDER BY cohort_week, week_offset""") { c =>
      val su = c.events.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cw"),
          min(col("ts")).as("signup_ts"))
      c.events.join(su, "user_id")
        .filter(col("ts") >= col("signup_ts"))
        .select(col("user_id"), col("cw"),
          (datediff(to_date(date_trunc("week", col("ts"))),
            to_date(col("cw"))) / 7).cast("int").as("week_offset"))
        .distinct()
        .groupBy(col("cw").as("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },

    // Batch gap sessionization (30-min inactivity gap) — the
    // oracle-checked batch complement of the streaming sessionizer
    // (StreamOps.sessionize): lag-over-user detects session starts,
    // a running sum numbers them, one groupBy collapses to per-session
    // rows. All windows partition by user_id — no global sort.
    // Durations in exact integer microseconds (no float, no
    // boundary-crossing truncation ambiguity).
    q("win_sessionize",
      """WITH o AS (SELECT user_id, ts, event_id,
        |             CASE WHEN lag(ts) OVER w IS NULL
        |                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END new_s
        |           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) session_id
        |      FROM o)
        |SELECT user_id, session_id::BIGINT AS session_id,
        |       count(*)::BIGINT AS n_events,
        |       CAST(min(ts) AS TIMESTAMP) AS s_start,
        |       CAST(max(ts) AS TIMESTAMP) AS s_end,
        |       epoch_us(CAST(max(ts) AS TIMESTAMP))
        |         - epoch_us(CAST(min(ts) AS TIMESTAMP)) AS dur_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""") { c =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.events
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") > lag(col("ts"), 1).over(w) +
              expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(ws))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("s_start"), max(col("ts")).as("s_end"),
          (unix_micros(max(col("ts")).cast("timestamp")) -
            unix_micros(min(col("ts")).cast("timestamp"))).as("dur_us"))
        .orderBy("user_id", "session_id")
    },

    // Ordered-funnel analysis (view → click → purchase, each step
    // within 24h of the previous): the standard product-analytics
    // sequence-match. Shape: one conditional min-aggregate per step,
    // chained through equi-joins on user_id — every shuffle is keyed
    // by user, no self-join explosion, no per-user event collect.
    q("win_funnel",
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |v AS (SELECT user_id, min(ts) view_ts FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |cl AS (SELECT e.user_id, min(e.ts) click_ts FROM ev e
        |       JOIN v USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > v.view_ts
        |         AND e.ts <= v.view_ts + INTERVAL 24 HOUR GROUP BY 1),
        |pu AS (SELECT e.user_id, min(e.ts) purchase_ts FROM ev e
        |       JOIN cl USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > cl.click_ts
        |         AND e.ts <= cl.click_ts + INTERVAL 24 HOUR GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |       CAST(v.view_ts AS TIMESTAMP) AS view_ts,
        |       CAST(cl.click_ts AS TIMESTAMP) AS click_ts,
        |       CAST(pu.purchase_ts AS TIMESTAMP) AS purchase_ts,
        |       pu.purchase_ts IS NOT NULL AS converted
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN cl USING (user_id)
        |LEFT JOIN pu USING (user_id)
        |ORDER BY u.user_id""") { c =>
      val ev = c.events.select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
      val cl = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("view_ts") &&
          col("ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(cl, "user_id")
        .filter(col("ts") > col("click_ts") &&
          col("ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
      ev.select("user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(cl, Seq("user_id"), "left")
        .join(pu, Seq("user_id"), "left")
        .select(col("user_id"), col("view_ts"), col("click_ts"),
          col("purchase_ts"), col("purchase_ts").isNotNull.as("converted"))
        .orderBy("user_id")
    },

    q("win_time_bucket",
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
        |       count(*) AS n, round(sum(value) + 1e-9, 2) AS v
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""") { c =>
      c.events
        .groupBy(window(col("ts"), "1 day").as("wnd"), col("event_type"))
        .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("v"))
        .select(col("wnd.start").cast("timestamp_ntz").as("bucket"),
          col("event_type"), col("n"), col("v"))
        .orderBy("bucket", "event_type")
    },

    // Longest consecutive-day activity streak per user — the classic
    // gaps-and-islands analysis: day-number minus per-user row_number
    // is constant exactly along a run of consecutive days, so streaks
    // fall out of one distinct + one user-partitioned window + one
    // grouping. Dates serialize as ISO strings so the driver's hash
    // bridge sees identical cells from both engines.
    q("win_streaks",
      """WITH d AS (SELECT DISTINCT user_id,
        |                  CAST(CAST(ts AS TIMESTAMP) AS DATE) dy
        |           FROM events),
        |grp AS (SELECT user_id, dy,
        |               datediff('day', DATE '2024-01-01', dy)
        |                 - row_number() OVER (PARTITION BY user_id
        |                                      ORDER BY dy) g
        |        FROM d),
        |s AS (SELECT user_id, count(*) len, min(dy) s0, max(dy) s1
        |      FROM grp GROUP BY user_id, g),
        |best AS (SELECT user_id, len, s0, s1,
        |                row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY len DESC, s0) rn
        |         FROM s)
        |SELECT user_id, len::BIGINT AS streak_days,
        |       s0::VARCHAR AS streak_start, s1::VARCHAR AS streak_end
        |FROM best WHERE rn = 1 AND user_id < 60 ORDER BY user_id""") { c =>
      val d = c.events
        .select(col("user_id"), col("ts").cast("date").as("dy"))
        .distinct()
      val grp = d.withColumn("g",
        datediff(col("dy"), lit("2024-01-01").cast("date")) -
          row_number().over(
            Window.partitionBy("user_id").orderBy("dy")))
      val s = grp.groupBy("user_id", "g")
        .agg(count(lit(1)).as("len"),
          min(col("dy")).as("s0"), max(col("dy")).as("s1"))
      s.withColumn("rn", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("len").desc, col("s0"))))
        .filter(col("rn") === 1 && col("user_id") < 60)
        .select(col("user_id"), col("len").as("streak_days"),
          col("s0").cast("string").as("streak_start"),
          col("s1").cast("string").as("streak_end"))
        .orderBy("user_id")
    },

    // Rolling median over a 5-row trailing frame — the robust moving
    // statistic mean-based frames cannot give (one outlier shifts a
    // mean forever, a median shrugs). Spark has no median window
    // function; the exact equivalent is the sorted middle element of
    // the frame's collect_list — bounded state (frame size), exact
    // doubles, and partial leading frames excluded so the odd-count
    // middle is well-defined on both engines.
    // Bollinger bands (Bollinger 1980s — rolling mean ± 2σ envelope,
    // the canonical rolling-volatility feature): per user, a 20-row
    // window over integer CENTS gives exact Σc and Σc² (BIGINT window
    // sums), so mid, the population σ and %B are fixed expression
    // trees over exact integers — the only FP is the final sqrt /
    // divisions, identical on both engines. Rows reported only at
    // full windows (n = 20). Scale shape: one per-key window, no
    // global order.
    // Relative Strength Index (Wilder 1978, simple-average variant —
    // the bounded momentum oscillator beside win_bollinger's
    // volatility envelope): the corpus collapses to ONE row per order
    // day (exact integer cents), diffs/gains/losses stay integers, the
    // 14-observation trailing sums are exact BIGINT window sums, and
    // RSI = 100·G/(G+L) is a single integer-ratio division. The
    // unpartitioned window runs over the TIME-BOUNDED daily series
    // (model-sized after the corpus aggregation — the ts_acf stance).
    q("win_rsi",
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
        |    sum(CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT c
        |  FROM orders GROUP BY 1),
        |v AS (SELECT dy, c, c - lag(c) OVER (ORDER BY dy) df,
        |        row_number() OVER (ORDER BY dy) rn FROM d),
        |g AS (SELECT dy, rn,
        |        (sum(greatest(df, 0)) OVER fr)::BIGINT sg,
        |        (sum(greatest(-df, 0)) OVER fr)::BIGINT sl
        |      FROM v WINDOW fr AS (ORDER BY rn
        |        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day, sg AS gain_14, sl AS loss_14,
        |  round(CASE WHEN sg + sl = 0 THEN 50.0
        |        ELSE 100.0 * sg / (sg + sl) END + 1e-9, 4) AS rsi
        |FROM g WHERE rn >= 15 ORDER BY day""") { c =>
      val d = c.orders
        .select(col("o_orderdate").cast("date").as("dy"),
          round(col("o_totalprice") * 100 + lit(1e-9)).cast("long")
            .as("cents"))
        .groupBy("dy").agg(sum(col("cents")).as("c"))
      val wo = Window.orderBy("dy")
      val v = d.select(col("dy"), col("c"),
        (col("c") - lag(col("c"), 1).over(wo)).as("df"),
        row_number().over(wo).as("rn"))
      val fr = Window.orderBy("rn").rowsBetween(-13, Window.currentRow)
      val g = v.select(col("dy"), col("rn"),
        sum(greatest(col("df"), lit(0L))).over(fr).as("sg"),
        sum(greatest(-col("df"), lit(0L))).over(fr).as("sl"))
      g.filter(col("rn") >= 15)
        .select(col("dy").cast("string").as("day"),
          col("sg").as("gain_14"), col("sl").as("loss_14"),
          r4(when(col("sg") + col("sl") === 0, 50.0)
            .otherwise(lit(100.0) * col("sg") /
              (col("sg") + col("sl")))).as("rsi"))
        .orderBy("day")
    },

    q("win_bollinger",
      """WITH v AS (SELECT event_id, user_id,
        |    CAST(round(value * 100) AS BIGINT) c,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) rn
        |  FROM events WHERE user_id < 30),
        |w AS (SELECT event_id, user_id, c, rn,
        |        (sum(c) OVER fr)::BIGINT s,
        |        (sum(c::HUGEINT * c) OVER fr)::DOUBLE q
        |      FROM v WINDOW fr AS (PARTITION BY user_id ORDER BY rn
        |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |b AS (SELECT event_id, user_id, c, s, q,
        |        s / 2000.0 mid,
        |        sqrt(20 * q - s::DOUBLE * s) / 2000.0 sd
        |      FROM w WHERE rn >= 20)
        |SELECT event_id, user_id, round(c / 100.0 + 1e-9, 2) AS value,
        |       round(mid + 1e-9, 4) AS mid,
        |       round(mid + 2 * sd + 1e-9, 4) AS upper,
        |       round(mid - 2 * sd + 1e-9, 4) AS lower,
        |       round(CASE WHEN sd = 0 THEN 0.5 ELSE
        |         (c / 100.0 - (mid - 2 * sd)) / (4 * sd) END
        |         + 1e-9, 6) AS pct_b
        |FROM b ORDER BY event_id""") { c =>
      val cents = round(col("value") * 100).cast("long")
      val v = c.events.filter(col("user_id") < 30)
        .select(col("event_id"), col("user_id"), col("ts"), cents.as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .drop("ts")
      val fr = Window.partitionBy("user_id").orderBy("rn")
        .rowsBetween(-19, Window.currentRow)
      val w = v.select(col("event_id"), col("user_id"), col("c"),
        col("rn"), sum(col("c")).over(fr).as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c")).over(fr)
          .cast("double").as("q"))
      val mid = col("s") / 2000.0
      val sd = sqrt(lit(20) * col("q") -
        col("s").cast("double") * col("s")) / 2000.0
      w.filter(col("rn") >= 20)
        .select(col("event_id"), col("user_id"),
          r2(col("c") / 100.0).as("value"),
          r4(mid).as("mid"),
          r4(mid + lit(2) * sd).as("upper"),
          r4(mid - lit(2) * sd).as("lower"),
          r6(when(sd === 0, 0.5).otherwise(
            (col("c") / 100.0 - (mid - lit(2) * sd)) / (lit(4) * sd)))
            .as("pct_b"))
        .orderBy("event_id")
    },

    q("win_rolling_median",
      """WITH v AS (SELECT event_id, user_id, value,
        |                  row_number() OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) rn
        |           FROM events WHERE user_id < 30),
        |m AS (SELECT event_id, user_id, rn,
        |             median(value) OVER (PARTITION BY user_id ORDER BY rn
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) med
        |      FROM v)
        |SELECT event_id, user_id, round(med + 1e-9, 4) AS rolling_median
        |FROM m WHERE rn >= 5 ORDER BY event_id""") { c =>
      val v = c.events.filter(col("user_id") < 30)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
      val frame = Window.partitionBy("user_id").orderBy("rn")
        .rowsBetween(-4, Window.currentRow)
      v.withColumn("med",
          element_at(sort_array(collect_list(col("value")).over(frame)), 3))
        .filter(col("rn") >= 5)
        .select(col("event_id"), col("user_id"),
          r4(col("med")).as("rolling_median"))
        .orderBy("event_id")
    },

    // Maximum drawdown per user over the signed event-value flow
    // (credits: purchase/signup; debits: everything else) — the
    // peak-to-trough risk statistic for any running balance (spend
    // budgets, token quotas, account P&L). Values are quantized to
    // integer CENTS per row FIRST, so the cumulative sum, running max
    // and drawdown are all exact integer window arithmetic — immune to
    // FP summation order (the r7 lesson). Windows partition by user:
    // one shuffle, no global sort.
    q("win_drawdown",
      """WITH f AS (SELECT user_id, ts, event_id,
        |                  CASE WHEN event_type IN ('purchase', 'signup')
        |                       THEN CAST(round(value * 100) AS BIGINT)
        |                       ELSE -CAST(round(value * 100) AS BIGINT)
        |                  END cents
        |           FROM events),
        |b0 AS (SELECT user_id, ts, event_id, sum(cents) OVER w bal
        |       FROM f
        |       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |b AS (SELECT user_id, bal, max(bal) OVER w peak
        |      FROM b0
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |d AS (SELECT user_id, max(peak - bal) dd, min(bal) low,
        |             max(peak) high
        |      FROM b GROUP BY 1)
        |SELECT user_id, round(dd / 100.0, 2) AS max_drawdown,
        |       round(high / 100.0, 2) AS peak_balance,
        |       round(low / 100.0, 2) AS trough_balance
        |FROM d ORDER BY max_drawdown DESC, user_id LIMIT 25""") { c =>
      val credit = col("event_type").isin("purchase", "signup")
      val f = c.events.select(col("user_id"), col("ts"), col("event_id"),
        when(credit, round(col("value") * 100).cast("long"))
          .otherwise(-round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val b = f
        .withColumn("bal", sum(col("cents")).over(w))
        .withColumn("peak", max(col("bal")).over(w))
      b.groupBy("user_id")
        .agg(max(col("peak") - col("bal")).as("dd"),
          min(col("bal")).as("low"), max(col("peak")).as("high"))
        .select(col("user_id"),
          round(col("dd") / 100.0, 2).as("max_drawdown"),
          round(col("high") / 100.0, 2).as("peak_balance"),
          round(col("low") / 100.0, 2).as("trough_balance"))
        .orderBy(col("max_drawdown").desc, col("user_id")).limit(25)
    },

    // Rolling VWAP (volume-weighted average price) — the
    // RATIO-of-rolling-sums window shape beside the plain rolling
    // mean/std family (Bollinger tracks price dispersion; VWAP tracks
    // where the VOLUME traded): per ship-day value and quantity
    // totals from ONE corpus aggregation, then a 7-row frame over the
    // day series sums both exactly (integer cents / integer units)
    // and divides ONCE per row — the ratio of two exact integer
    // rolling sums is engine-exact before the final rounding. The
    // frame runs on the day-grid relation (time-bounded), never the
    // corpus.
    q("win_vwap",
      """WITH d AS (SELECT l_shipdate dy,
        |    sum(CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT))
        |      ::BIGINT pv,
        |    sum(CAST(round(l_quantity) AS BIGINT))::BIGINT vol
        |  FROM lineitem GROUP BY 1)
        |SELECT dy::VARCHAR AS day,
        |  sum(pv) OVER w::BIGINT AS pv7,
        |  sum(vol) OVER w::BIGINT AS vol7,
        |  round((sum(pv) OVER w) * 1.0 / (sum(vol) OVER w) / 100
        |        + 1e-9, 4) AS vwap7
        |FROM d
        |WINDOW w AS (ORDER BY dy ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""") { c =>
      import org.apache.spark.sql.expressions.Window
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        sum(expr("CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT)"))
          .as("pv"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("vol"))
      // day-grid series — the documented time-bounded global window
      val w = Window.orderBy("dy").rowsBetween(-6, 0)
      d.select(col("dy").cast("string").as("day"),
          sum(col("pv")).over(w).as("pv7"),
          sum(col("vol")).over(w).as("vol7"),
          r4(sum(col("pv")).over(w) * lit(1.0) /
            sum(col("vol")).over(w) / 100).as("vwap7"))
        .orderBy("day")
    },

    // Stochastic oscillator %K / %D — the ROLLING-EXTREMES window
    // shape the rolling mean/σ family lacks (Bollinger is dispersion,
    // RSI is gain/loss, VWAP is ratio-of-sums; %K locates today's
    // close INSIDE the trailing 14-day high-low range): %K =
    // 100·(close − min₁₄)/(max₁₄ − min₁₄) on integer cents, %D = its
    // 3-day mean. Each %K is ONE division of exact integer
    // differences; %D is the explicit 3-term sum kraw + lag1 + lag2
    // over 3 — the SAME left-to-right expression tree on both engines
    // (a windowed avg could re-associate through DuckDB's segment
    // tree), null until 3 %K values exist. Flat-range days (max =
    // min) emit NULL on both engines. Day-grid relation, time-bounded.
    q("win_stochastic",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) c
        |  FROM lineitem GROUP BY 1),
        |k AS (SELECT dy, c,
        |    min(c) OVER w14 mn, max(c) OVER w14 mx
        |  FROM d
        |  WINDOW w14 AS (ORDER BY dy ROWS BETWEEN 13 PRECEDING
        |                 AND CURRENT ROW)),
        |pk AS (SELECT dy,
        |    CASE WHEN mx > mn
        |         THEN 100.0 * (c - mn) / (mx - mn) END kraw
        |  FROM k)
        |SELECT dy::VARCHAR AS day,
        |  round(kraw + 1e-9, 4) AS pct_k,
        |  round((kraw + lag(kraw, 1) OVER o + lag(kraw, 2) OVER o) / 3
        |        + 1e-9, 4) AS pct_d
        |FROM pk
        |WINDOW o AS (ORDER BY dy)
        |ORDER BY day""") { c =>
      import org.apache.spark.sql.expressions.Window
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("c"))
      // day-grid series — the documented time-bounded global window
      val w14 = Window.orderBy("dy").rowsBetween(-13, 0)
      val o = Window.orderBy("dy")
      val k = d.select(col("dy"), col("c"),
        min(col("c")).over(w14).as("mn"), max(col("c")).over(w14).as("mx"))
      val pk = k.select(col("dy"),
        when(col("mx") > col("mn"),
          lit(100.0) * (col("c") - col("mn")) / (col("mx") - col("mn")))
          .as("kraw"))
      pk.select(col("dy").cast("string").as("day"),
          r4(col("kraw")).as("pct_k"),
          r4((col("kraw") + lag(col("kraw"), 1).over(o) +
            lag(col("kraw"), 2).over(o)) / lit(3)).as("pct_d"))
        .orderBy("day")
    },

    // Average True Range (Wilder 1978, the simple-mean variant) — the
    // rolling-RANGE volatility window beside the dispersion family
    // (Bollinger = rolling σ of closes; ATR measures the day's full
    // traded RANGE including the overnight gap): per ship-day
    // high/low/close in integer cents from ONE corpus aggregation,
    // TR = greatest(hi−lo, |hi−prev_close|, |lo−prev_close|) — exact
    // integer arithmetic on both engines (first day has no previous
    // close → TR = hi−lo, the standard convention) — and ATR₁₄ the
    // ratio of the exact integer 14-row rolling TR sum over the frame
    // row count, divided ONCE per row before the final rounding.
    // Day-grid relation, time-bounded (the documented ts_acf stance).
    q("win_atr",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT dy,
        |    greatest(hi - lo,
        |             abs(hi - coalesce(lag(cl) OVER o, hi)),
        |             abs(lo - coalesce(lag(cl) OVER o, lo))) tr
        |  FROM d WINDOW o AS (ORDER BY dy))
        |SELECT dy::VARCHAR AS day, tr::BIGINT AS tr_cents,
        |  round((sum(tr) OVER w) * 1.0 / (count(*) OVER w) / 100
        |        + 1e-9, 4) AS atr14
        |FROM t
        |WINDOW w AS (ORDER BY dy ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |ORDER BY day""") { c =>
      import org.apache.spark.sql.expressions.Window
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("hi"),
        expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("lo"),
        expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("cl"))
      // day-grid series — the documented time-bounded global window
      val o = Window.orderBy("dy")
      val w14 = Window.orderBy("dy").rowsBetween(-13, 0)
      val t = d.select(col("dy"),
        greatest(col("hi") - col("lo"),
          abs(col("hi") - coalesce(lag(col("cl"), 1).over(o), col("hi"))),
          abs(col("lo") - coalesce(lag(col("cl"), 1).over(o), col("lo"))))
          .as("tr"))
      t.select(col("dy").cast("string").as("day"),
          col("tr").as("tr_cents"),
          r4(sum(col("tr")).over(w14) * lit(1.0) /
            count(lit(1)).over(w14) / 100).as("atr14"))
        .orderBy("day")
    },

    // MACD momentum state per user series (Appel's moving-average
    // convergence/divergence — the triple-EMA momentum feature beside
    // win_rsi / win_bollinger / win_atr in any quant feature store):
    // fast EMA (a=1/4), slow EMA (a=1/8), and the signal line smoothing
    // the macd difference (a=1/2). Inherently sequential per series, so
    // it runs as the Holt-device secondary-sort scan
    // (ops/Holt.macd: repartition by user + sortWithinPartitions + one
    // O(1)-state iterator pass — the 100 TB shape; no collect_list, no
    // global sort). Dyadic smoothing factors keep 1-a exact in binary,
    // so the recursive-CTE oracle replays a bit-identical recurrence.
    q("win_macd",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) rn,
        |         count(*) OVER (PARTITION BY user_id) n
        |  FROM events WHERE user_id < 50),
        |rec(user_id, rn, ef, es, sg, n) AS (
        |  SELECT user_id, 1, value, value, 0.0::DOUBLE, n
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |         0.25::DOUBLE * s.value + 0.75::DOUBLE * rec.ef,
        |         0.125::DOUBLE * s.value + 0.875::DOUBLE * rec.es,
        |         0.5::DOUBLE * ((0.25::DOUBLE * s.value
        |                         + 0.75::DOUBLE * rec.ef)
        |                      - (0.125::DOUBLE * s.value
        |                         + 0.875::DOUBLE * rec.es))
        |           + 0.5::DOUBLE * rec.sg,
        |         rec.n
        |  FROM rec JOIN s ON s.user_id = rec.user_id
        |                 AND s.rn = rec.rn + 1)
        |SELECT user_id, n::BIGINT AS n,
        |       round(ef - es + 1e-9, 4) AS macd,
        |       round(sg + 1e-9, 4) AS sig,
        |       round(ef - es - sg + 1e-9, 4) AS hist
        |FROM rec WHERE rn = n ORDER BY user_id""") { c =>
      val fitted = graft.ops.Holt.macd(
        c.events.filter(col("user_id") < 50),
        key = "user_id", order = Seq(col("ts"), col("event_id")),
        value = col("value"), aFast = 0.25, aSlow = 0.125, aSig = 0.5)
      fitted.select(col("user_id"), col("n"),
          r4(col("macd")).as("macd"), r4(col("signal")).as("sig"),
          r4(col("macd") - col("signal")).as("hist"))
        .orderBy("user_id")
    },

    // Donchian channel (Richard Donchian's 20-day breakout system —
    // the rolling-extremum channel beside win_bollinger's
    // rolling-moment one): 20-day rolling high/low of the daily price
    // extremes, integer midline, and the classic breakout flags
    // (close crossing YESTERDAY's channel). All EXACT integer cents —
    // rolling max/min, floor-divided midline, integer comparisons for
    // the flags; the one global window runs over the aggregated day
    // grid (the documented win_atr stance).
    q("win_donchian",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |ch AS (SELECT dy, cl,
        |    max(hi) OVER w20 up, min(lo) OVER w20 dn
        |  FROM d
        |  WINDOW w20 AS (ORDER BY dy ROWS BETWEEN 19 PRECEDING
        |                 AND CURRENT ROW)),
        |fl AS (SELECT dy, cl, up, dn, (up + dn) // 2 mid,
        |    CASE WHEN cl > lag(up) OVER (ORDER BY dy)
        |         THEN 1 ELSE 0 END bu,
        |    CASE WHEN cl < lag(dn) OVER (ORDER BY dy)
        |         THEN 1 ELSE 0 END bd
        |  FROM ch)
        |SELECT dy::VARCHAR AS day, up AS upper_cents,
        |  dn AS lower_cents, mid AS mid_cents, cl AS close_cents,
        |  bu AS breakout_up, bd AS breakout_down
        |FROM fl ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("hi"),
        expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("lo"),
        expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("cl"))
      val o = Window.orderBy("dy")
      val w20 = o.rowsBetween(-19, 0)
      val ch = d.select(col("dy"), col("cl"),
        max(col("hi")).over(w20).as("up"),
        min(col("lo")).over(w20).as("dn"))
      ch.select(col("dy").cast("string").as("day"),
          col("up").as("upper_cents"), col("dn").as("lower_cents"),
          expr("(up + dn) div 2").as("mid_cents"),
          col("cl").as("close_cents"),
          when(col("cl") > lag(col("up"), 1).over(o), 1)
            .otherwise(0).as("breakout_up"),
          when(col("cl") < lag(col("dn"), 1).over(o), 1)
            .otherwise(0).as("breakout_down"))
        .orderBy("day")
    },

    // Keltner channels in Chester Keltner's ORIGINAL 1960 form (the
    // "ten-day moving average trading rule": centerline = 10-day SMA
    // of the typical price (H+L+C)/3, bands at ± the 10-day SMA of
    // the daily range H−L) over the same daily OHLC-from-lineitem
    // grid as win_atr/win_donchian. Every rolling sum is an exact
    // BIGINT over cents (3× typical kept integral as hi+lo+cl), the
    // two divisions happen once per output row in the identical
    // expression shape on both engines, and breakout flags compare
    // the exact 2-decimal close against the ROUNDED band so no
    // borderline day can flip per engine. Scale: corpus-sized daily
    // aggregation, then a window over the calendar-bounded grid.
    q("win_keltner",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |k AS (SELECT dy, cl,
        |    sum(hi + lo + cl) OVER w styp,
        |    sum(hi - lo) OVER w srng,
        |    count(*) OVER w cnt
        |  FROM d
        |  WINDOW w AS (ORDER BY dy ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day,
        |  round(styp * 1.0 / cnt / 3 / 100 + 1e-9, 4) AS mid,
        |  round(styp * 1.0 / cnt / 3 / 100 + srng * 1.0 / cnt / 100
        |        + 1e-9, 4) AS upper,
        |  round(styp * 1.0 / cnt / 3 / 100 - srng * 1.0 / cnt / 100
        |        + 1e-9, 4) AS lower,
        |  round(cl / 100.0 + 1e-9, 2) AS close,
        |  cl / 100.0 > round(styp * 1.0 / cnt / 3 / 100
        |        + srng * 1.0 / cnt / 100 + 1e-9, 4) AS breakout_up,
        |  cl / 100.0 < round(styp * 1.0 / cnt / 3 / 100
        |        - srng * 1.0 / cnt / 100 + 1e-9, 4) AS breakdown
        |FROM k ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("hi"),
        expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("lo"),
        expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("cl"))
      val w10 = Window.orderBy("dy").rowsBetween(-9, 0)
      val k = d.select(col("dy"), col("cl"),
        sum(col("hi") + col("lo") + col("cl")).over(w10).as("styp"),
        sum(col("hi") - col("lo")).over(w10).as("srng"),
        count(lit(1)).over(w10).as("cnt"))
      val mid = col("styp") * lit(1.0) / col("cnt") / 3 / 100
      val rng = col("srng") * lit(1.0) / col("cnt") / 100
      k.select(col("dy").cast("string").as("day"),
          r4(mid).as("mid"), r4(mid + rng).as("upper"),
          r4(mid - rng).as("lower"),
          r2(col("cl") / 100.0).as("close"),
          (col("cl") / 100.0 > r4(mid + rng)).as("breakout_up"),
          (col("cl") / 100.0 < r4(mid - rng)).as("breakdown"))
        .orderBy("day")
    },

    // Ulcer Index (Martin 1987) — the drawdown-RMS risk measure next
    // to win_drawdown/win_bollinger: per day, the percent drawdown vs
    // the rolling 14-day high is QUANTIZED to integer basis points
    // (round once per row), so the rolling sum of squared drawdowns
    // is EXACT BIGINT arithmetic (the win_keltner cents discipline —
    // dd ≤ 10⁴ bps, Σ14·dd² ≤ 1.4e9, no FP order anywhere) and
    // UI = √(Σdd²/cnt)/100 is one fixed double tree per row. Windows
    // run over the calendar-day aggregate (plan-audit bounded).
    q("win_ulcer",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT dy, cl, max(cl) OVER w rmax
        |      FROM d
        |      WINDOW w AS (ORDER BY dy
        |        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |b AS (SELECT dy, cl,
        |        CAST(round((rmax - cl) * 10000.0 / rmax + 1e-9)
        |             AS BIGINT) dd
        |      FROM r),
        |u AS (SELECT dy, cl, dd,
        |        sum(dd * dd) OVER w sdd2, count(*) OVER w cnt
        |      FROM b
        |      WINDOW w AS (ORDER BY dy
        |        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day,
        |  round(cl / 100.0 + 1e-9, 2) AS close,
        |  round(dd / 100.0 + 1e-9, 2) AS dd_pct,
        |  round(sqrt(sdd2 * 1.0 / cnt) / 100 + 1e-9, 4) AS ulcer
        |FROM u ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(round(avg(col("l_extendedprice")) * 100 + lit(1e-9))
          .cast("long").as("cl"))
      val w14 = Window.orderBy("dy").rowsBetween(-13, 0)
      val r = d.select(col("dy"), col("cl"),
        max(col("cl")).over(w14).as("rmax"))
      val b = r.select(col("dy"), col("cl"),
        round((col("rmax") - col("cl")) * lit(10000.0) / col("rmax") +
          lit(1e-9)).cast("long").as("dd"))
      val u = b.select(col("dy"), col("cl"), col("dd"),
        sum(col("dd") * col("dd")).over(w14).as("sdd2"),
        count(lit(1)).over(w14).as("cnt"))
      u.select(col("dy").cast("string").as("day"),
          r2(col("cl") / 100.0).as("close"),
          r2(col("dd") / 100.0).as("dd_pct"),
          r4(sqrt(col("sdd2") * lit(1.0) / col("cnt")) / 100).as("ulcer"))
        .orderBy("day")
    },

    // Ichimoku Kinkō Hyō (Hosoda 1969) — the multi-horizon
    // midpoint-channel system beside Donchian/Keltner: tenkan (9-day
    // hi-lo midpoint), kijun (26-day), senkou A = their average,
    // senkou B (52-day midpoint), chikou = close led 26 days. All
    // midpoints are integer-cents sums halved ONCE at render (the
    // win_keltner discipline); the bullish signal compares
    // 2·close > hi26+lo26 in EXACT integers, so no FP boundary can
    // flip it. Windows run over the calendar-day aggregate
    // (plan-audit bounded).
    q("win_ichimoku",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |k AS (SELECT dy, cl,
        |    max(hi) OVER w9 mh9, min(lo) OVER w9 ml9,
        |    max(hi) OVER w26 mh26, min(lo) OVER w26 ml26,
        |    max(hi) OVER w52 mh52, min(lo) OVER w52 ml52,
        |    lead(cl, 26) OVER (ORDER BY dy) chikou
        |  FROM d
        |  WINDOW
        |    w9 AS (ORDER BY dy ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
        |    w26 AS (ORDER BY dy ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
        |    w52 AS (ORDER BY dy ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day,
        |  round(cl / 100.0 + 1e-9, 2) AS close,
        |  round((mh9 + ml9) * 1.0 / 2 / 100 + 1e-9, 4) AS tenkan,
        |  round((mh26 + ml26) * 1.0 / 2 / 100 + 1e-9, 4) AS kijun,
        |  round((mh9 + ml9 + mh26 + ml26) * 1.0 / 4 / 100 + 1e-9, 4)
        |    AS senkou_a,
        |  round((mh52 + ml52) * 1.0 / 2 / 100 + 1e-9, 4) AS senkou_b,
        |  round(chikou / 100.0 + 1e-9, 2) AS chikou,
        |  2 * cl > mh26 + ml26 AS bullish
        |FROM k ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(round(max(col("l_extendedprice")) * 100 + lit(1e-9))
            .cast("long").as("hi"),
          round(min(col("l_extendedprice")) * 100 + lit(1e-9))
            .cast("long").as("lo"),
          round(avg(col("l_extendedprice")) * 100 + lit(1e-9))
            .cast("long").as("cl"))
      def wn(n: Int) = Window.orderBy("dy").rowsBetween(-(n - 1), 0)
      val k = d.select(col("dy"), col("cl"),
        max(col("hi")).over(wn(9)).as("mh9"),
        min(col("lo")).over(wn(9)).as("ml9"),
        max(col("hi")).over(wn(26)).as("mh26"),
        min(col("lo")).over(wn(26)).as("ml26"),
        max(col("hi")).over(wn(52)).as("mh52"),
        min(col("lo")).over(wn(52)).as("ml52"),
        lead(col("cl"), 26).over(Window.orderBy("dy")).as("chikou"))
      k.select(col("dy").cast("string").as("day"),
          r2(col("cl") / 100.0).as("close"),
          r4((col("mh9") + col("ml9")) * lit(1.0) / 2 / 100).as("tenkan"),
          r4((col("mh26") + col("ml26")) * lit(1.0) / 2 / 100).as("kijun"),
          r4((col("mh9") + col("ml9") + col("mh26") + col("ml26")) *
            lit(1.0) / 4 / 100).as("senkou_a"),
          r4((col("mh52") + col("ml52")) * lit(1.0) / 2 / 100)
            .as("senkou_b"),
          r2(col("chikou") / 100.0).as("chikou"),
          (lit(2) * col("cl") > col("mh26") + col("ml26")).as("bullish"))
        .orderBy("day")
    },

    // Sortino ratio (Sortino & Price 1994) — the downside-only risk
    // measure beside win_ulcer's drawdown RMS: daily returns are
    // QUANTIZED once to integer basis points, so the rolling mean and
    // the downside second moment Σ min(ret,0)² are exact BIGINT
    // window sums (ret ≤ 10⁴ bps ⇒ Σ14·ret² ≤ 1.4e9 — the
    // win_keltner discipline), and the ratio is one fixed double tree
    // per row; a window with zero downside emits NULL by an exact
    // integer test, never an FP boundary. Windows run over the
    // calendar-day aggregate (plan-audit bounded).
    q("win_sortino",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT dy, cl, lag(cl) OVER (ORDER BY dy) p FROM d),
        |b AS (SELECT dy,
        |        CAST(round((cl - p) * 10000.0 / p + 1e-9) AS BIGINT) ret
        |      FROM r WHERE p IS NOT NULL),
        |u AS (SELECT dy, ret,
        |        sum(ret) OVER w sr,
        |        sum(CASE WHEN ret < 0 THEN ret * ret ELSE 0 END) OVER w
        |          sd2,
        |        count(*) OVER w cnt
        |      FROM b
        |      WINDOW w AS (ORDER BY dy
        |        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day,
        |  round(ret / 100.0 + 1e-9, 2) AS ret_pct,
        |  round(sr * 1.0 / cnt / 100 + 1e-9, 4) AS mean_ret_pct,
        |  round(sqrt(sd2 * 1.0 / cnt) / 100 + 1e-9, 4)
        |    AS downside_dev_pct,
        |  CASE WHEN sd2 > 0 THEN
        |    round((sr * 1.0 / cnt) / sqrt(sd2 * 1.0 / cnt) + 1e-9, 4)
        |  END AS sortino
        |FROM u ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy"))
        .agg(round(avg(col("l_extendedprice")) * 100 + lit(1e-9))
          .cast("long").as("cl"))
      val wd = Window.orderBy("dy")
      val r = d.select(col("dy"), col("cl"),
        lag(col("cl"), 1).over(wd).as("p"))
      val b = r.filter(col("p").isNotNull)
        .select(col("dy"),
          round((col("cl") - col("p")) * lit(10000.0) / col("p") +
            lit(1e-9)).cast("long").as("ret"))
      val w14 = Window.orderBy("dy").rowsBetween(-13, 0)
      val u = b.select(col("dy"), col("ret"),
        sum(col("ret")).over(w14).as("sr"),
        sum(when(col("ret") < 0, col("ret") * col("ret"))
          .otherwise(0L)).over(w14).as("sd2"),
        count(lit(1)).over(w14).as("cnt"))
      u.select(col("dy").cast("string").as("day"),
          r2(col("ret") / 100.0).as("ret_pct"),
          r4(col("sr") * lit(1.0) / col("cnt") / 100).as("mean_ret_pct"),
          r4(sqrt(col("sd2") * lit(1.0) / col("cnt")) / 100)
            .as("downside_dev_pct"),
          when(col("sd2") > 0,
            r4((col("sr") * lit(1.0) / col("cnt")) /
              sqrt(col("sd2") * lit(1.0) / col("cnt")))).as("sortino"))
        .orderBy("day")
    },

    // Aroon indicator (Tushar Chande 1995 — "how long since the
    // 25-day high/low?", the trend-age oscillator beside
    // win_donchian's breakout channel). The days-since-extremum comes
    // out of ONE window max via an ENCODING trick instead of a nested
    // argmax: enc = value·4096 + rn packs the tie-break into the low
    // bits (most recent wins ties, the Aroon convention; rn < 4096
    // because the day grid is calendar-bounded), so
    // max(enc) % 4096 IS the row number of the extremum — exact
    // integer arithmetic, no struct comparisons, portable to both
    // engines. Lows negate through an offset (1e8 > any price cents)
    // to keep the encoding positive for %. aroon = 100·(len−ds)/len
    // over the actual window length (ramp-up rows use their shorter
    // frame). One global window over the bounded day grid.
    q("win_aroon",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT dy, hi, lo,
        |        row_number() OVER (ORDER BY dy) rn FROM d),
        |e AS (SELECT dy, rn, hi, lo,
        |        hi * 4096 + rn eu,
        |        (100000000 - lo) * 4096 + rn el FROM r),
        |w AS (SELECT dy, rn,
        |        least(rn, 25) len,
        |        max(eu) OVER w25 % 4096 up_rn,
        |        max(el) OVER w25 % 4096 dn_rn
        |      FROM e
        |      WINDOW w25 AS (ORDER BY rn ROWS BETWEEN 24 PRECEDING
        |                     AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day,
        |  (rn - up_rn)::BIGINT AS days_since_high,
        |  (rn - dn_rn)::BIGINT AS days_since_low,
        |  round(100.0 * (len - (rn - up_rn)) / len + 1e-9, 4)
        |    AS aroon_up,
        |  round(100.0 * (len - (rn - dn_rn)) / len + 1e-9, 4)
        |    AS aroon_down,
        |  round(100.0 * (len - (rn - up_rn)) / len
        |        - 100.0 * (len - (rn - dn_rn)) / len + 1e-9, 4)
        |    AS aroon_osc
        |FROM w ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("hi"),
        expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("lo"))
      val o = Window.orderBy("rn")
      val w25 = o.rowsBetween(-24, 0)
      val r = d.withColumn("rn",
        row_number().over(Window.orderBy("dy")))
      val e = r.select(col("dy"), col("rn"),
        least(col("rn"), lit(25)).as("len"),
        (col("hi") * 4096 + col("rn")).as("eu"),
        ((lit(100000000L) - col("lo")) * 4096 + col("rn")).as("el"))
      val w = e.select(col("dy"), col("rn"), col("len"),
        (max(col("eu")).over(w25) % 4096).as("up_rn"),
        (max(col("el")).over(w25) % 4096).as("dn_rn"))
      val up = lit(100.0) * (col("len") - (col("rn") - col("up_rn"))) /
        col("len")
      val dn = lit(100.0) * (col("len") - (col("rn") - col("dn_rn"))) /
        col("len")
      w.select(col("dy").cast("string").as("day"),
          (col("rn") - col("up_rn")).cast("long").as("days_since_high"),
          (col("rn") - col("dn_rn")).cast("long").as("days_since_low"),
          r4(up).as("aroon_up"), r4(dn).as("aroon_down"),
          r4(up - dn).as("aroon_osc"))
        .orderBy("day")
    },

    // On-balance volume (Joseph Granville 1963 — THE classic
    // volume-flow accumulator: volume counts toward the trend of the
    // day's close). dir ∈ {−1, 0, +1} from an integer-cents compare
    // with yesterday's close (no FP, no sign()); OBV is the running
    // sum of dir·volume — EXACT integers end to end, one global
    // window over the calendar-bounded day grid.
    q("win_obv",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl,
        |    CAST(sum(l_quantity) AS BIGINT) vol
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT dy, cl, vol,
        |        CASE WHEN lag(cl) OVER w IS NULL THEN 0
        |             WHEN cl > lag(cl) OVER w THEN 1
        |             WHEN cl < lag(cl) OVER w THEN -1 ELSE 0 END dir
        |      FROM d WINDOW w AS (ORDER BY dy))
        |SELECT dy::VARCHAR AS day, cl AS close_cents, vol AS volume,
        |  dir AS direction,
        |  sum(dir * vol) OVER (ORDER BY dy)::BIGINT AS obv
        |FROM s ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("cl"),
        sum(col("l_quantity")).cast("long").as("vol"))
      val o = Window.orderBy("dy")
      val s = d.withColumn("dir",
        when(lag(col("cl"), 1).over(o).isNull, 0)
          .when(col("cl") > lag(col("cl"), 1).over(o), 1)
          .when(col("cl") < lag(col("cl"), 1).over(o), -1)
          .otherwise(0))
      s.select(col("dy").cast("string").as("day"),
          col("cl").as("close_cents"), col("vol").as("volume"),
          col("dir").as("direction"),
          sum(col("dir") * col("vol")).over(
            o.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long").as("obv"))
        .orderBy("day")
    },

    // Chaikin money flow (Marc Chaikin — where in the day's range did
    // the close land, weighted by volume?): the money-flow multiplier
    // ((cl−lo)−(hi−cl))/(hi−lo) is quantized ONCE per day to integer
    // micro-units (round of an identical IEEE expression on both
    // engines — the lattice device), so the 20-day rolling sums are
    // exact integer window aggregates and CMF is a single division
    // per row. Degenerate hi=lo days contribute 0 by convention.
    q("win_cmf",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl,
        |    CAST(sum(l_quantity) AS BIGINT) vol
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT dy, vol,
        |        CASE WHEN hi = lo THEN 0
        |             ELSE CAST(round((2 * cl - hi - lo) * 1e6 * vol
        |                             / (hi - lo) + 1e-9) AS BIGINT)
        |        END mfv
        |      FROM d),
        |w AS (SELECT dy,
        |        sum(mfv) OVER w20 smfv, sum(vol) OVER w20 svol
        |      FROM m
        |      WINDOW w20 AS (ORDER BY dy ROWS BETWEEN 19 PRECEDING
        |                     AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day,
        |  round(smfv / (1e6 * svol) + 1e-9, 6) AS cmf
        |FROM w ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("hi"),
        expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("lo"),
        expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("cl"),
        sum(col("l_quantity")).cast("long").as("vol"))
      val m = d.select(col("dy"), col("vol"),
        when(col("hi") === col("lo"), 0L).otherwise(
          round((lit(2) * col("cl") - col("hi") - col("lo")) *
            lit(1e6) * col("vol") / (col("hi") - col("lo")) + lit(1e-9))
            .cast("long")).as("mfv"))
      val w20 = Window.orderBy("dy").rowsBetween(-19, 0)
      m.select(col("dy").cast("string").as("day"),
          r6(sum(col("mfv")).over(w20) /
            (lit(1e6) * sum(col("vol")).over(w20))).as("cmf"))
        .orderBy("day")
    },

    // Commodity channel index (Donald Lambert 1980): how far is
    // today's typical price from its 20-day mean, in units of the
    // 20-day MEAN ABSOLUTE DEVIATION? The MAD needs every frame
    // member's deviation from the frame's OWN mean — not expressible
    // as one window function — so the frame is materialized as a
    // BOUNDED 20-offset equi-join over the day grid (the mm_sobel
    // offset-grid device, ~20·|days| rows at any corpus scale).
    // Working in tp3 = hi+lo+cl (3× the typical price — the /3
    // cancels in the ratio) keeps every intermediate an exact
    // integer: cci = n·(n·tp3_t − Σ_f tp3)/(0.015·Σ_f|n·tp3_j − Σ_f|).
    q("win_cci",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)
        |      + CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)
        |      + CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)
        |      tp3
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT dy, tp3, row_number() OVER (ORDER BY dy) rn FROM d),
        |w AS (SELECT dy, rn, tp3,
        |        count(*) OVER w20 nf, sum(tp3) OVER w20 sf
        |      FROM r
        |      WINDOW w20 AS (ORDER BY rn ROWS BETWEEN 19 PRECEDING
        |                     AND CURRENT ROW)),
        |o AS (SELECT unnest(range(0, 20)) ofs),
        |md AS (SELECT a.dy, a.rn, a.tp3, a.nf, a.sf,
        |         sum(abs(a.nf * b.tp3 - a.sf))::BIGINT mdn
        |       FROM w a, o JOIN r b ON b.rn = a.rn - o.ofs
        |       GROUP BY 1, 2, 3, 4, 5)
        |SELECT dy::VARCHAR AS day,
        |  CASE WHEN mdn = 0 THEN 0.0
        |       ELSE round(nf * (nf * tp3 - sf) / (0.015 * mdn)
        |                  + 1e-9, 4) END AS cci
        |FROM md ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        (expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)") +
          expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)") +
          expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)"))
          .as("tp3"))
      val r = d.withColumn("rn", row_number().over(Window.orderBy("dy")))
      val w20 = Window.orderBy("rn").rowsBetween(-19, 0)
      val w = r.select(col("dy"), col("rn"), col("tp3"),
        count(lit(1)).over(w20).as("nf"),
        sum(col("tp3")).over(w20).as("sf"))
      val off = broadcast(c.spark.range(0, 20).select(
        col("id").cast("int").as("off")))
      val md = w.crossJoin(off)
        .join(r.select(col("rn").as("rn2"), col("tp3").as("tp3b")),
          col("rn2") === col("rn") - col("off"))
        .groupBy("dy", "rn", "tp3", "nf", "sf")
        .agg(sum(abs(col("nf") * col("tp3b") - col("sf"))).as("mdn"))
      md.select(col("dy").cast("string").as("day"),
          when(col("mdn") === 0, lit(0.0)).otherwise(
            r4(col("nf") * (col("nf") * col("tp3") - col("sf")) /
              (lit(0.015) * col("mdn")))).as("cci"))
        .orderBy("day")
    },

    // Williams %R (Larry Williams — where is the close inside the
    // 14-day high-low range, on a 0..−100 scale?): two rolling
    // extrema + one pinned double division per row, integer cents
    // throughout; a degenerate flat range reports the −50 midpoint by
    // convention. The stochastic oscillator's inverse twin
    // (win_stochastic measures closeness to the HIGH; %R to the LOW).
    q("win_williams_r",
      """WITH d AS (SELECT l_shipdate dy,
        |    CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT) hi,
        |    CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT) lo,
        |    CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT) cl
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT dy, cl,
        |        max(hi) OVER w14 hh, min(lo) OVER w14 ll
        |      FROM d
        |      WINDOW w14 AS (ORDER BY dy ROWS BETWEEN 13 PRECEDING
        |                     AND CURRENT ROW))
        |SELECT dy::VARCHAR AS day, hh AS hh14_cents, ll AS ll14_cents,
        |  CASE WHEN hh = ll THEN -50.0
        |       ELSE round(-100.0 * (hh - cl) / (hh - ll) + 1e-9, 4)
        |  END AS williams_r
        |FROM w ORDER BY day""") { c =>
      val d = c.lineitem.groupBy(col("l_shipdate").as("dy")).agg(
        expr("CAST(round(max(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("hi"),
        expr("CAST(round(min(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("lo"),
        expr("CAST(round(avg(l_extendedprice) * 100 + 1e-9) AS BIGINT)")
          .as("cl"))
      val w14 = Window.orderBy("dy").rowsBetween(-13, 0)
      d.select(col("dy").cast("string").as("day"),
          max(col("hi")).over(w14).as("hh14_cents"),
          min(col("lo")).over(w14).as("ll14_cents"),
          when(max(col("hi")).over(w14) === min(col("lo")).over(w14),
            lit(-50.0)).otherwise(
            r4(lit(-100.0) * (max(col("hi")).over(w14) - col("cl")) /
              (max(col("hi")).over(w14) - min(col("lo")).over(w14))))
            .as("williams_r"))
        .orderBy("day")
    },
  )
}
