package graft.queries

import graft.ops.Positional
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
        |SELECT round(sum(pow(obs - rt * ct * 1.0 / n, 2)
        |                 / (rt * ct * 1.0 / n)) + 1e-9, 4) AS chi2,
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
      m.agg(
        r4(sum(pow(col("obs") - col("rt") * col("ct") * lit(1.0) / col("n"),
          2) / (col("rt") * col("ct") * lit(1.0) / col("n")))).as("chi2"),
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
  )
}
