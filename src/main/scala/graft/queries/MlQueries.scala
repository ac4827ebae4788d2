package graft.queries

import graft.QueryDef
import graft.ml._
import org.apache.spark.sql.functions._

/** SURVEY §2.8 deferred ML under the correctness gate. The portable
  * (md5-bucket) split/fold variants are used here so DuckDB can
  * reproduce the EXACT row→split assignment; production code uses the
  * xxhash64 variants (same contract, engine-native speed).
  */
object MlQueries {

  val defs: Seq[QueryDef] = Seq(

    // Deterministic hash-bucket split (ref ml/split_lib.py:68-252 —
    // hash(key, seed) % buckets, NOT randomSplit): the oracle recomputes
    // every row's assignment from its key alone.
    q("ml_split",
      """SELECT o_orderkey,
        |       CASE WHEN b < 700 THEN 0 WHEN b < 900 THEN 1 ELSE 2 END AS split_idx
        |FROM (SELECT o_orderkey,
        |             ('0x' || substr(md5('42|' || o_orderkey), 1, 8))::BIGINT % 1000 AS b
        |      FROM orders)
        |WHERE o_orderkey < 3000 ORDER BY o_orderkey""") { c =>
      Splits.withSplitColumn(
          c.orders.filter(col("o_orderkey") < 3000),
          keys = Seq("o_orderkey"),
          testSizes = Seq(0.7, 0.2, 0.1),
          numBuckets = 1000, seed = 42L, portable = true)
        .select("o_orderkey", "split_idx")
        .orderBy("o_orderkey")
    },

    // Split size/disjointness audit: fractions land on the bucket
    // lattice; sum of counts is total (exhaustive + disjoint).
    q("ml_split_sizes",
      """SELECT CASE WHEN b < 700 THEN 0 WHEN b < 900 THEN 1 ELSE 2 END AS split_idx,
        |       count(*) AS n, count(DISTINCT o_orderkey) AS n_keys
        |FROM (SELECT o_orderkey,
        |             ('0x' || substr(md5('42|' || o_orderkey), 1, 8))::BIGINT % 1000 AS b
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""") { c =>
      Splits.withSplitColumn(c.orders, Seq("o_orderkey"),
          Seq(0.7, 0.2, 0.1), 1000, 42L, portable = true)
        .groupBy("split_idx")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_keys"))
        .orderBy("split_idx")
    },

    // Deferred pipeline: StandardScaler → closed-form linear regression
    // (fit = one aggregate per step; transform = pure projection; the
    // model params ARE the artifact — pipeline_lib.py Step/Fitted*).
    q("ml_pipeline_linreg",
      """WITH s AS (SELECT avg(l_quantity) mu, stddev_samp(l_quantity) sigma FROM lineitem),
        |t AS (SELECT l_orderkey, l_linenumber, (l_quantity - mu) / sigma AS qs,
        |             l_extendedprice FROM lineitem, s),
        |m AS (SELECT regr_slope(l_extendedprice, qs) a,
        |             regr_intercept(l_extendedprice, qs) b FROM t)
        |SELECT l_orderkey, l_linenumber, round(b + a * qs + 1e-9, 2) AS pred
        |FROM t, m WHERE l_orderkey < 300 ORDER BY l_orderkey, l_linenumber""") { c =>
      val pipe = Pipeline(Seq(
        StandardScaler("l_quantity", "qs"),
        LinearRegression("qs", "l_extendedprice", "pred")))
      val fitted = pipe.fit(c.lineitem)
      fitted.transform(c.lineitem)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r2(col("pred")).as("pred"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Linear SHAP attribution (Lundberg & Lee 2017 §Corollary 1 — for
    // a linear model the Shapley value is exactly φ_j = β_j(x_j − x̄_j),
    // making model explanation a CLOSED FORM of the same integer
    // moments the fit uses): 2-feature OLS on exact integer columns
    // (quantity, discount-percent → price cents), β from centered
    // 2×2 normal equations where every S-term is n·Σab − Σa·Σb of
    // EXACT BIGINT sums combined in double identically on both
    // engines, and mean|φ_j| = |β_j|·Σ|x_j·n − Σx_j| / n² — the
    // absolute deviation stays an EXACT INTEGER sum because the mean
    // is cleared of its denominator before the abs. Two corpus
    // aggregations, broadcast scalars between — nothing corpus-sized
    // moves.
    q("ml_shap_linear",
      """WITH b AS (SELECT l_quantity::BIGINT x1,
        |    CAST(round(l_discount * 100 + 1e-9) AS BIGINT) x2,
        |    CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT) y
        |  FROM lineitem),
        |m AS (SELECT count(*)::BIGINT n, sum(x1)::BIGINT s1,
        |        sum(x2)::BIGINT s2, sum(y)::BIGINT sy,
        |        sum(x1 * x1)::BIGINT s11, sum(x1 * x2)::BIGINT s12,
        |        sum(x2 * x2)::BIGINT s22,
        |        sum(x1 * y)::BIGINT s1y, sum(x2 * y)::BIGINT s2y
        |      FROM b),
        |cm AS (SELECT n, s1, s2, sy,
        |    n::DOUBLE * s11 - s1::DOUBLE * s1 c11,
        |    n::DOUBLE * s12 - s1::DOUBLE * s2 c12,
        |    n::DOUBLE * s22 - s2::DOUBLE * s2 c22,
        |    n::DOUBLE * s1y - s1::DOUBLE * sy c1y,
        |    n::DOUBLE * s2y - s2::DOUBLE * sy c2y FROM m),
        |bet AS (SELECT n, s1, s2, sy,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) b1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) b2
        |  FROM cm),
        |ad AS (SELECT sum(abs(b.x1 * bet.n - bet.s1))::BIGINT a1,
        |         sum(abs(b.x2 * bet.n - bet.s2))::BIGINT a2
        |       FROM b, bet)
        |SELECT feature, round(beta + 1e-9, 6) AS beta_dollars,
        |  round(mas + 1e-9, 4) AS mean_abs_shap_dollars,
        |  round(bet.sy::DOUBLE / bet.n / 100 + 1e-9, 4) AS base_dollars
        |FROM (
        |  SELECT 'l_quantity' feature, b1 / 100 beta,
        |      abs(b1) * a1 / (n::DOUBLE * n) / 100 mas
        |    FROM bet, ad
        |  UNION ALL
        |  SELECT 'l_discount_pct', b2 / 100,
        |      abs(b2) * a2 / (n::DOUBLE * n) / 100
        |    FROM bet, ad) t, bet
        |ORDER BY feature""") { c =>
      val b = c.lineitem.select(
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100 + lit(1e-9)).cast("long").as("x2"),
        round(col("l_extendedprice") * 100 + lit(1e-9)).cast("long")
          .as("y"))
      val m = b.agg(count(lit(1)).as("n"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      def ctr(sab: String, sa: String, sb: String) =
        col("n").cast("double") * col(sab) -
          col(sa).cast("double") * col(sb)
      val cm = m.select(col("n"), col("s1"), col("s2"), col("sy"),
        ctr("s11", "s1", "s1").as("c11"), ctr("s12", "s1", "s2").as("c12"),
        ctr("s22", "s2", "s2").as("c22"), ctr("s1y", "s1", "sy").as("c1y"),
        ctr("s2y", "s2", "sy").as("c2y"))
      val det = col("c11") * col("c22") - col("c12") * col("c12")
      val bet = cm.select(col("n"), col("s1"), col("s2"), col("sy"),
        ((col("c22") * col("c1y") - col("c12") * col("c2y")) / det)
          .as("b1"),
        ((col("c11") * col("c2y") - col("c12") * col("c1y")) / det)
          .as("b2"))
      val ad = b.crossJoin(broadcast(bet)).agg(
        sum(abs(col("x1") * col("n") - col("s1"))).as("a1"),
        sum(abs(col("x2") * col("n") - col("s2"))).as("a2"))
      val one = bet.crossJoin(broadcast(ad))
      val rows = one.selectExpr(
        """stack(2,
          |'l_quantity', b1 / 100,
          |  abs(b1) * a1 / (cast(n as double) * n) / 100,
          |'l_discount_pct', b2 / 100,
          |  abs(b2) * a2 / (cast(n as double) * n) / 100)
          |as (feature, beta, mas)""".stripMargin.replace("\n", " "),
        "sy", "n")
      rows.select(col("feature"), r6(col("beta")).as("beta_dollars"),
          r4(col("mas")).as("mean_abs_shap_dollars"),
          r4(col("sy").cast("double") / col("n") / 100)
            .as("base_dollars"))
        .orderBy("feature")
    },

    // Permutation feature importance (Breiman 2001 §10 — the
    // model-agnostic sibling of ml_shap_linear: break one feature's
    // pairing with the target and measure the R² drop): the
    // "shuffle" is a DETERMINISTIC hash permutation — rows re-sorted
    // by disjoint 8-hex windows of one portable md5 digest pair each
    // row with a permuted donor via Positional.positionalJoin
    // (range-bucketed row numbering, no global window). Permuting
    // preserves each feature's marginal moments EXACTLY (same
    // multiset), so only the integer cross-moments are recomputed and
    // R² stays a closed form of exact sums. Scale: two positional
    // joins + three aggregates.
    q("ml_permutation_importance",
      """WITH b AS (SELECT l_orderkey * 10 + l_linenumber pk,
        |    l_quantity::BIGINT x1,
        |    CAST(round(l_discount * 100 + 1e-9) AS BIGINT) x2,
        |    CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT) y
        |  FROM lineitem),
        |h AS (SELECT pk, x1, x2, y,
        |    ('0x' || substr(md5(pk::VARCHAR), 1, 8))::BIGINT h1,
        |    ('0x' || substr(md5(pk::VARCHAR), 9, 8))::BIGINT h2
        |  FROM b),
        |p0 AS (SELECT pk, x1, x2, y,
        |    row_number() OVER (ORDER BY pk) pos FROM h),
        |p1 AS (SELECT x1 x1p,
        |    row_number() OVER (ORDER BY h1, pk) pos FROM h),
        |p2 AS (SELECT x2 x2p,
        |    row_number() OVER (ORDER BY h2, pk) pos FROM h),
        |j AS (SELECT p0.*, p1.x1p, p2.x2p
        |      FROM p0 JOIN p1 USING (pos) JOIN p2 USING (pos)),
        |m AS (SELECT count(*)::BIGINT n,
        |    sum(x1)::BIGINT s1, sum(x2)::BIGINT s2, sum(y)::BIGINT sy,
        |    sum(x1 * x1)::BIGINT s11, sum(x1 * x2)::BIGINT s12,
        |    sum(x2 * x2)::BIGINT s22,
        |    sum(x1 * y)::BIGINT s1y, sum(x2 * y)::BIGINT s2y,
        |    sum(y::HUGEINT * y)::DOUBLE syy,
        |    sum(x1p * y)::BIGINT q1y, sum(x1p * x2)::BIGINT q12,
        |    sum(x2p * y)::BIGINT q2y, sum(x2p * x1)::BIGINT q21
        |  FROM j),
        |r AS (SELECT
        |    n::DOUBLE * s11 - s1::DOUBLE * s1 c11,
        |    n::DOUBLE * s12 - s1::DOUBLE * s2 c12,
        |    n::DOUBLE * s22 - s2::DOUBLE * s2 c22,
        |    n::DOUBLE * s1y - s1::DOUBLE * sy c1y,
        |    n::DOUBLE * s2y - s2::DOUBLE * sy c2y,
        |    n::DOUBLE * syy - sy::DOUBLE * sy cyy,
        |    n::DOUBLE * q1y - s1::DOUBLE * sy d1y,
        |    n::DOUBLE * q12 - s1::DOUBLE * s2 d12,
        |    n::DOUBLE * q2y - s2::DOUBLE * sy d2y,
        |    n::DOUBLE * q21 - s2::DOUBLE * s1 d21
        |  FROM m),
        |r2s AS (SELECT
        |    ((c22 * c1y - c12 * c2y) * c1y
        |     + (c11 * c2y - c12 * c1y) * c2y)
        |      / (c11 * c22 - c12 * c12) / cyy r2_base,
        |    ((c22 * d1y - d12 * c2y) * d1y
        |     + (c11 * c2y - d12 * d1y) * c2y)
        |      / (c11 * c22 - d12 * d12) / cyy r2_p1,
        |    ((c22 * c1y - d21 * d2y) * c1y
        |     + (c11 * d2y - d21 * c1y) * d2y)
        |      / (c11 * c22 - d21 * d21) / cyy r2_p2
        |  FROM r)
        |SELECT feature, round(r2_base + 1e-9, 6) AS r2_base,
        |  round(r2_perm + 1e-9, 6) AS r2_permuted,
        |  round(r2_base - r2_perm + 1e-9, 6) AS importance
        |FROM (SELECT 'l_quantity' feature, r2_base, r2_p1 r2_perm
        |        FROM r2s
        |      UNION ALL
        |      SELECT 'l_discount_pct', r2_base, r2_p2 FROM r2s) t
        |ORDER BY feature""") { c =>
      val b = c.lineitem.select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("pk"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100 + lit(1e-9)).cast("long").as("x2"),
        round(col("l_extendedprice") * 100 + lit(1e-9)).cast("long")
          .as("y"))
      val hx = md5(col("pk").cast("string"))
      val h = b.select(col("pk"), col("x1"), col("x2"), col("y"),
        conv(substring(hx, 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(hx, 9, 8), 16, 10).cast("long").as("h2"))
        .persist()
      val j0 = graft.ops.Positional.positionalJoin(
        h.select(col("pk"), col("x1"), col("x2"), col("y")),
        Seq(col("pk")),
        h.select(col("x1").as("x1p"), col("h1"), col("pk").as("pk1")),
        Seq(col("h1"), col("pk1")))
      val j = graft.ops.Positional.positionalJoin(
        j0.select(col("pos").as("pos0"), col("x1"), col("x2"), col("y"),
          col("x1p")),
        Seq(col("pos0")),
        h.select(col("x2").as("x2p"), col("h2"), col("pk").as("pk2")),
        Seq(col("h2"), col("pk2")))
      val m = j.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y").cast("decimal(38,0)") * col("y")).cast("double")
          .as("syy"),
        sum(col("x1p") * col("y")).as("q1y"),
        sum(col("x1p") * col("x2")).as("q12"),
        sum(col("x2p") * col("y")).as("q2y"),
        sum(col("x2p") * col("x1")).as("q21"))
      def ctr(sab: String, sa: String, sb: String) =
        col("n").cast("double") * col(sab) -
          col(sa).cast("double") * col(sb)
      val r = m.select(
        ctr("s11", "s1", "s1").as("c11"), ctr("s12", "s1", "s2").as("c12"),
        ctr("s22", "s2", "s2").as("c22"), ctr("s1y", "s1", "sy").as("c1y"),
        ctr("s2y", "s2", "sy").as("c2y"),
        (col("n").cast("double") * col("syy") -
          col("sy").cast("double") * col("sy")).as("cyy"),
        ctr("q1y", "s1", "sy").as("d1y"), ctr("q12", "s1", "s2").as("d12"),
        ctr("q2y", "s2", "sy").as("d2y"), ctr("q21", "s2", "s1").as("d21"))
      def r2Of(cxy: org.apache.spark.sql.Column,
          cxz: org.apache.spark.sql.Column,
          czy: org.apache.spark.sql.Column) =
        ((col("c22") * cxy - cxz * czy) * cxy +
          (col("c11") * czy - cxz * cxy) * czy) /
          (col("c11") * col("c22") - cxz * cxz) / col("cyy")
      val r2s = r.select(
        r2Of(col("c1y"), col("c12"), col("c2y")).as("r2_base"),
        r2Of(col("d1y"), col("d12"), col("c2y")).as("r2_p1"),
        r2Of(col("c1y"), col("d21"), col("d2y")).as("r2_p2"))
      r2s.selectExpr(
          "stack(2, 'l_quantity', r2_base, r2_p1, " +
            "'l_discount_pct', r2_base, r2_p2) " +
            "as (feature, rb, rp)")
        .select(col("feature"), r6(col("rb")).as("r2_base"),
          r6(col("rp")).as("r2_permuted"),
          r6(col("rb") - col("rp")).as("importance"))
        .orderBy("feature")
    },

    // Learning curve over deterministic hash fractions (the
    // data-scaling diagnostic — "would more data help?" — run before
    // any capacity decision): nested 10/25/50/100% subsets selected by
    // the portable md5 bucket of the row key (NOT random — the same
    // rows on any engine, any partitioning), a closed-form 1-feature
    // OLS per fraction from EXACT integer moments, slope and R²
    // reported per fraction. Scale: a 4-way broadcast fraction join
    // over one scan, four hash aggregates.
    q("ml_learning_curve",
      """WITH b AS (SELECT l_orderkey * 10 + l_linenumber pk,
        |    l_quantity::BIGINT x,
        |    CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT) y
        |  FROM lineitem),
        |h AS (SELECT x, y,
        |    ('0x' || substr(md5(pk::VARCHAR), 1, 8))::BIGINT % 100 hb
        |  FROM b),
        |fr AS (SELECT unnest([10, 25, 50, 100]) frac),
        |m AS (SELECT fr.frac, count(*)::BIGINT n,
        |        sum(x)::BIGINT sx, sum(y)::BIGINT sy,
        |        sum(x * x)::BIGINT sxx, sum(x * y)::BIGINT sxy,
        |        sum(y::HUGEINT * y)::DOUBLE syy
        |      FROM fr JOIN h ON h.hb < fr.frac GROUP BY 1),
        |r AS (SELECT frac, n,
        |        n::DOUBLE * sxy - sx::DOUBLE * sy cxy,
        |        n::DOUBLE * sxx - sx::DOUBLE * sx cxx,
        |        n::DOUBLE * syy - sy::DOUBLE * sy cyy
        |      FROM m)
        |SELECT frac::BIGINT AS frac_pct, n,
        |  round(cxy / cxx / 100 + 1e-9, 6) AS slope_dollars,
        |  round(cxy * cxy / (cxx * cyy) + 1e-9, 6) AS r2
        |FROM r ORDER BY frac_pct""") { c =>
      val b = c.lineitem.select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("pk"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100 + lit(1e-9)).cast("long")
          .as("y"))
      val h = b.select(col("x"), col("y"),
        (conv(substring(md5(col("pk").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100).as("hb"))
      val sp = c.spark
      import sp.implicits._
      val fr = Seq(10L, 25L, 50L, 100L).toDF("frac")
      val m = broadcast(fr).join(h, col("hb") < col("frac"))
        .groupBy("frac")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y").cast("decimal(38,0)") * col("y")).cast("double")
            .as("syy"))
      val r = m.select(col("frac"), col("n"),
        (col("n").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy")).as("cxy"),
        (col("n").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx")).as("cxx"),
        (col("n").cast("double") * col("syy") -
          col("sy").cast("double") * col("sy")).as("cyy"))
      r.select(col("frac").as("frac_pct"), col("n"),
          r6(col("cxy") / col("cxx") / 100).as("slope_dollars"),
          r6(col("cxy") * col("cxy") / (col("cxx") * col("cyy")))
            .as("r2"))
        .orderBy("frac_pct")
    },

    // FAIRNESS AUDIT — demographic parity + equalized odds (Hardt et
    // al. 2016; the responsible-AI gate a scored model passes before
    // deployment): groups are market segments, the "classifier" is the
    // high-quantity rule (score ≥ 25), the label is returned-flag. Per
    // group: selection rate, TPR, FPR — exact integer-count ratios —
    // plus the global disparate-impact ratio (min/max selection rate)
    // and the max TPR/FPR gaps repeated per row. One corpus join +
    // one group aggregate; group count is tiny so the global reduce
    // broadcasts.
    q("ml_fairness_audit",
      """WITH b AS (SELECT c.c_mktsegment seg,
        |    CASE WHEN l.l_quantity >= 25 THEN 1 ELSE 0 END pred,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END y
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT seg, count(*)::BIGINT n,
        |        sum(pred)::BIGINT sel,
        |        sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
        |          ::BIGINT tp,
        |        sum(y)::BIGINT pos,
        |        sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
        |          ::BIGINT fp
        |      FROM b GROUP BY 1),
        |r AS (SELECT seg, n,
        |        round(sel * 1.0 / n + 1e-9, 6) sel_rate,
        |        round(tp * 1.0 / pos + 1e-9, 6) tpr,
        |        round(fp * 1.0 / (n - pos) + 1e-9, 6) fpr
        |      FROM g),
        |t AS (SELECT round(min(sel_rate) / max(sel_rate) + 1e-9, 6) di,
        |        round(max(tpr) - min(tpr) + 1e-9, 6) tpr_gap,
        |        round(max(fpr) - min(fpr) + 1e-9, 6) fpr_gap
        |      FROM r)
        |SELECT r.seg, r.n, r.sel_rate, r.tpr, r.fpr,
        |  t.di AS disparate_impact, t.tpr_gap, t.fpr_gap
        |FROM r, t ORDER BY seg""") { c =>
      val b = c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          when(col("l_quantity") >= 25, 1L).otherwise(0L).as("pred"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val g = b.groupBy("seg").agg(count(lit(1)).as("n"),
        sum(col("pred")).as("sel"),
        sum(when(col("pred") === 1 && col("y") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(col("y")).as("pos"),
        sum(when(col("pred") === 1 && col("y") === 0, 1L)
          .otherwise(0L)).as("fp"))
      val r = g.select(col("seg"), col("n"),
        r6(col("sel") * lit(1.0) / col("n")).as("sel_rate"),
        r6(col("tp") * lit(1.0) / col("pos")).as("tpr"),
        r6(col("fp") * lit(1.0) / (col("n") - col("pos"))).as("fpr"))
      val t = r.agg(
        r6(min(col("sel_rate")) / max(col("sel_rate")))
          .as("disparate_impact"),
        r6(max(col("tpr")) - min(col("tpr"))).as("tpr_gap"),
        r6(max(col("fpr")) - min(col("fpr"))).as("fpr_gap"))
      r.crossJoin(broadcast(t))
        .select(col("seg"), col("n"), col("sel_rate"), col("tpr"),
          col("fpr"), col("disparate_impact"), col("tpr_gap"),
          col("fpr_gap"))
        .orderBy("seg")
    },

    // Bayesian A/B readout — exact P(p_B > p_A) under independent
    // Beta(1,1) posteriors (Evan Miller's closed form), computed with
    // ZERO transcendentals: h(a,b,c,d) = Σᵢ termᵢ where term₀ =
    // Π_{j<d}(b+j)/(a+b+j) and termᵢ₊₁/termᵢ =
    // (a+i)(d+i)/((a+b+d+i)(1+i)) — every factor an exact-integer
    // quotient, folded in pinned ascending order (the Fisher device
    // applied to Bayes). Posterior params come from the pilot cohort's
    // integer conversion counts; the per-term product is
    // O(terms²-of-cohort), never corpus-sized.
    q("ab_bayes_beta",
      """WITH u AS (SELECT user_id, user_id % 2 arm,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |                  THEN 1 ELSE 0 END)
        |            > sum(CASE WHEN event_type = 'error'
        |                  THEN 1 ELSE 0 END)
        |         THEN 1 ELSE 0 END cv
        |  FROM events WHERE user_id < 120 GROUP BY 1),
        |cells AS (SELECT
        |    (1 + sum(CASE WHEN arm = 0 THEN cv ELSE 0 END))::BIGINT a,
        |    (1 + sum(CASE WHEN arm = 0 THEN 1 - cv ELSE 0 END))
        |      ::BIGINT b,
        |    (1 + sum(CASE WHEN arm = 1 THEN cv ELSE 0 END))::BIGINT cc,
        |    (1 + sum(CASE WHEN arm = 1 THEN 1 - cv ELSE 0 END))
        |      ::BIGINT d
        |  FROM u),
        |t0 AS (SELECT a, b, cc, d,
        |    list_reduce(list_transform(range(0, d),
        |        j -> (b + j) / (a + b + j)), (x, y) -> x * y) w0
        |  FROM cells),
        |xs AS (SELECT a, b, cc, d, w0, unnest(range(0, cc)) i FROM t0),
        |wr AS (SELECT i,
        |    CASE WHEN i = 0 THEN w0
        |         ELSE w0 * list_reduce(list_transform(range(0, i),
        |           k -> ((a + k) * (d + k))
        |                / ((a + b + d + k) * (1 + k))),
        |           (x, y) -> x * y) END w
        |  FROM xs),
        |s AS (SELECT list_reduce(list(w ORDER BY i), (x, y) -> x + y)
        |        p FROM wr)
        |SELECT cells.a - 1 AS conv_a, cells.b - 1 AS nonconv_a,
        |  cells.cc - 1 AS conv_b, cells.d - 1 AS nonconv_b,
        |  round(s.p + 1e-9, 6) AS p_b_beats_a
        |FROM cells, s""") { c =>
      val uu = c.events.filter(col("user_id") < 120)
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1).otherwise(0))
            > sum(when(col("event_type") === "error", 1).otherwise(0)))
          .cast("long").as("cv"))
        .select((col("user_id") % 2).as("arm"), col("cv"))
      val cells = uu.agg(
        (lit(1L) + sum(when(col("arm") === 0, col("cv")).otherwise(0L)))
          .as("a"),
        (lit(1L) + sum(when(col("arm") === 0, lit(1L) - col("cv"))
          .otherwise(0L))).as("b"),
        (lit(1L) + sum(when(col("arm") === 1, col("cv")).otherwise(0L)))
          .as("cc"),
        (lit(1L) + sum(when(col("arm") === 1, lit(1L) - col("cv"))
          .otherwise(0L))).as("d"))
      val t0 = cells.withColumn("w0",
        aggregate(sequence(lit(0L), col("d") - 1), lit(1.0),
          (p, j) => p * ((col("b") + j) / (col("a") + col("b") + j))))
      val xs = t0.select(col("*"),
        explode(sequence(lit(0L), col("cc") - 1)).as("i"))
      val wr = xs.select(col("i"),
        when(col("i") === 0, col("w0"))
          .otherwise(col("w0") * aggregate(
            sequence(lit(0L), col("i") - 1), lit(1.0),
            (p, k) => p * (((col("a") + k) * (col("d") + k)) /
              ((col("a") + col("b") + col("d") + k) * (lit(1L) + k)))))
          .as("w"))
      val s = wr.agg(
        aggregate(array_sort(collect_list(struct(col("i"),
            col("w").as("t")))),
          lit(0.0), (acc, e) => acc + e.getField("t")).as("p"))
      cells.crossJoin(broadcast(s))
        .select((col("a") - 1).as("conv_a"), (col("b") - 1)
            .as("nonconv_a"),
          (col("cc") - 1).as("conv_b"), (col("d") - 1).as("nonconv_b"),
          r6(col("p")).as("p_b_beats_a"))
    },

    // Brier-score DECOMPOSITION (Murphy 1973 — reliability −
    // resolution + uncertainty; the diagnosis behind
    // ml_calibration_curve's picture: REL says how far the forecast
    // is from its bin's truth, RES how much the bins separate): the
    // forecast is the exact rational quantity/50, bins are the 50
    // distinct quantities, every bin statistic is a ratio of exact
    // integer counts, and the two bin-level sums fold in pinned bin
    // order. One corpus aggregate + a 50-row reduce.
    q("ml_brier_decomposition",
      """WITH b AS (SELECT l_quantity::BIGINT q,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y
        |  FROM lineitem),
        |g AS (SELECT q, count(*)::BIGINT n, sum(y)::BIGINT pos
        |      FROM b GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT nt, sum(pos)::BIGINT post FROM g),
        |s AS (SELECT
        |    list_reduce(list(
        |      n * (q / 50.0 - pos * 1.0 / n) * (q / 50.0 - pos * 1.0 / n)
        |      ORDER BY q), (x, y) -> x + y) rel_s,
        |    list_reduce(list(
        |      n * (pos * 1.0 / n - t.post * 1.0 / t.nt)
        |        * (pos * 1.0 / n - t.post * 1.0 / t.nt)
        |      ORDER BY q), (x, y) -> x + y) res_s
        |  FROM g, t GROUP BY t.nt, t.post),
        |o AS (SELECT t.nt, t.post, s.rel_s / t.nt rel,
        |        s.res_s / t.nt res,
        |        (t.post * 1.0 / t.nt) * (1 - t.post * 1.0 / t.nt) unc
        |      FROM s, t)
        |SELECT nt AS n_rows,
        |  round(rel + 1e-9, 6) AS reliability,
        |  round(res + 1e-9, 6) AS resolution,
        |  round(unc + 1e-9, 6) AS uncertainty,
        |  round(rel - res + unc + 1e-9, 6) AS brier
        |FROM o""") { c =>
      val b = c.lineitem.select(col("l_quantity").cast("long").as("q"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val g = b.groupBy("q")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val t = g.agg(sum(col("n")).as("nt"), sum(col("pos")).as("post"))
      val gt = g.crossJoin(broadcast(t))
      val relTerm = col("n") *
        (col("q") / 50.0 - col("pos") * lit(1.0) / col("n")) *
        (col("q") / 50.0 - col("pos") * lit(1.0) / col("n"))
      val resTerm = col("n") *
        (col("pos") * lit(1.0) / col("n") -
          col("post") * lit(1.0) / col("nt")) *
        (col("pos") * lit(1.0) / col("n") -
          col("post") * lit(1.0) / col("nt"))
      val s = gt.groupBy("nt", "post").agg(
        aggregate(array_sort(collect_list(struct(col("q"),
          relTerm.as("t")))), lit(0.0),
          (a, e) => a + e.getField("t")).as("rel_s"),
        aggregate(array_sort(collect_list(struct(col("q"),
          resTerm.as("t")))), lit(0.0),
          (a, e) => a + e.getField("t")).as("res_s"))
      val ybar = col("post") * lit(1.0) / col("nt")
      s.select(col("nt").as("n_rows"),
        r6(col("rel_s") / col("nt")).as("reliability"),
        r6(col("res_s") / col("nt")).as("resolution"),
        r6(ybar * (lit(1) - ybar)).as("uncertainty"),
        r6(col("rel_s") / col("nt") - col("res_s") / col("nt") +
          ybar * (lit(1) - ybar)).as("brier"))
    },

    // Nearest-centroid (Rocchio) classification on the labeled
    // embeddings (the zero-hyperparameter baseline every embedding
    // pipeline should beat): per-dimension training sums are EXACT
    // integers (floats quantized to micro-units per element), test
    // distances fold in pinned dimension order against the rational
    // centroids, and the argmin takes the ROUNDED distance with label
    // tie-break. Deterministic hash-free split by vec_id % 5. One
    // explode-aggregate for centroids; test scoring is
    // |test|×|labels|×dim — labels are few, dim is fixed.
    q("ml_nearest_centroid",
      """WITH x AS (SELECT vec_id, label,
        |    list_transform(embedding,
        |      e -> CAST(round(e::DOUBLE * 1e6 + 1e-9) AS BIGINT)) xm
        |  FROM embeddings),
        |tr AS (SELECT label, unnest(xm) v,
        |         unnest(range(1, len(xm) + 1)) d
        |       FROM x WHERE vec_id % 5 <> 0),
        |cen AS (SELECT label clabel, d, sum(v)::BIGINT s,
        |          count(*)::BIGINT n FROM tr GROUP BY 1, 2),
        |te AS (SELECT vec_id, label, unnest(xm) v,
        |         unnest(range(1, len(xm) + 1)) d
        |       FROM x WHERE vec_id % 5 = 0),
        |ds AS (SELECT te.vec_id, te.label, cen.clabel,
        |         round(list_reduce(list(
        |             (te.v - cen.s * 1.0 / cen.n)
        |             * (te.v - cen.s * 1.0 / cen.n) / 1e12
        |             ORDER BY te.d), (p, q) -> p + q) + 1e-9, 6) dist
        |       FROM te JOIN cen ON te.d = cen.d
        |       GROUP BY 1, 2, 3),
        |pr AS (SELECT label, clabel pred FROM (
        |         SELECT label, clabel,
        |           row_number() OVER (PARTITION BY vec_id
        |             ORDER BY dist, clabel) rn
        |         FROM ds) WHERE rn = 1),
        |cm AS (SELECT label, pred, count(*)::BIGINT n FROM pr
        |       GROUP BY 1, 2),
        |ac AS (SELECT round(sum(CASE WHEN label = pred THEN n
        |          ELSE 0 END) * 1.0 / sum(n) + 1e-9, 4) acc FROM cm)
        |SELECT cm.label, cm.pred, cm.n, ac.acc AS accuracy
        |FROM cm, ac ORDER BY label, pred""") { c =>
      val x = c.embeddings.select(col("vec_id"), col("label"),
        transform(col("embedding"),
          e => round(e.cast("double") * 1e6 + lit(1e-9)).cast("long"))
          .as("xm"))
      def explodeDims(df: org.apache.spark.sql.DataFrame) =
        df.select(col("vec_id"), col("label"),
            posexplode(col("xm")).as(Seq("d0", "v")))
          .select(col("vec_id"), col("label"),
            (col("d0") + 1).as("d"), col("v"))
      val tr = explodeDims(x.filter(col("vec_id") % 5 =!= 0))
      val cen = tr.groupBy(col("label").as("clabel"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      val te = explodeDims(x.filter(col("vec_id") % 5 === 0))
      val term = (col("v") - col("s") * lit(1.0) / col("n")) *
        (col("v") - col("s") * lit(1.0) / col("n")) / lit(1e12)
      val ds = te.join(broadcast(cen), Seq("d"))
        .groupBy("vec_id", "label", "clabel")
        .agg(r6(aggregate(array_sort(collect_list(struct(col("d"),
            term.as("t")))),
          lit(0.0), (p, e) => p + e.getField("t"))).as("dist"))
      val pr = ds.groupBy("vec_id", "label")
        .agg(min(struct(col("dist"), col("clabel"))).as("b"))
        .select(col("label"), col("b.clabel").as("pred"))
      val cm = pr.groupBy("label", "pred").agg(count(lit(1)).as("n"))
      val ac = cm.agg(r4(sum(when(col("label") === col("pred"),
        col("n")).otherwise(0L)) * lit(1.0) / sum(col("n")))
        .as("accuracy"))
      cm.crossJoin(broadcast(ac))
        .select(col("label"), col("pred"), col("n"), col("accuracy"))
        .orderBy("label", "pred")
    },

    // Deferred metrics (metrics.py:513): mse/mae/r2 as one aggregate
    // over (y, prediction).
    q("ml_metrics",
      """WITH m AS (SELECT regr_slope(l_extendedprice, l_quantity) a,
        |                  regr_intercept(l_extendedprice, l_quantity) b FROM lineitem),
        |scored AS (SELECT l_extendedprice y, b + a * l_quantity AS pred
        |           FROM lineitem, m)
        |SELECT round(avg((y - pred) * (y - pred)) / 1e6 + 1e-9, 2) AS mse_m,
        |       round(avg(abs(y - pred)) + 1e-9, 2) AS mae,
        |       round(1.0 - sum((y - pred) * (y - pred))
        |                   / (var_pop(y) * count(*)) + 1e-9, 6) AS r2,
        |       round(sqrt(avg((y - pred) * (y - pred))) / 1e3 + 1e-9, 4) AS rmse_k,
        |       round(1.0 - var_pop(y - pred) / var_pop(y) + 1e-9, 6) AS expl_var,
        |       round(max(abs(y - pred)) / 1e3 + 1e-9, 4) AS max_err_k
        |FROM scored""") { c =>
      val fitted = Pipeline(Seq(
        LinearRegression("l_quantity", "l_extendedprice", "pred")))
        .fit(c.lineitem)
      val scored = fitted.transform(c.lineitem)
      Metrics.regression(scored, "l_extendedprice", "pred")
        .select(r2(col("mse") / 1e6).as("mse_m"),
          r2(col("mae")).as("mae"),
          r6(col("r2")).as("r2"),
          r4(col("rmse") / 1e3).as("rmse_k"),
          r6(col("explained_variance")).as("expl_var"),
          r4(col("max_err") / 1e3).as("max_err_k"))
    },

    // Arbitrary-estimator deferred fit (ref fit_lib.py:28 — any model
    // as fit-UDAF + predict-UDF): Gaussian naive Bayes is the
    // oracle-checkable instance, because its fit statistics (per-class
    // mean/var_pop/prior) and argmax predict are plain SQL. The Spark
    // side runs the REAL machinery — whole-group EstimatorFitAgg
    // producing serialized model bytes in the model relation, predict
    // broadcast back as a scalar UDF — via the deferred algebra.
    q("ml_pipeline_gnb",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity x1, l_discount x2,
        |             CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END cls
        |           FROM lineitem),
        |p AS (SELECT cls, count(*) n, avg(x1) m1, greatest(var_pop(x1), 1e-9) v1,
        |             avg(x2) m2, greatest(var_pop(x2), 1e-9) v2
        |      FROM d GROUP BY cls),
        |t AS (SELECT sum(n) tot FROM p),
        |pw AS (SELECT cls, ln(n::DOUBLE / tot) lp, m1, v1, m2, v2 FROM p, t),
        |s AS (SELECT d.l_orderkey, d.l_linenumber,
        |        max(CASE WHEN pw.cls = 0 THEN sc END) s0,
        |        max(CASE WHEN pw.cls = 1 THEN sc END) s1,
        |        max(CASE WHEN pw.cls = 2 THEN sc END) s2
        |      FROM (SELECT *, row_number() OVER () rid FROM d) d
        |      CROSS JOIN pw
        |      CROSS JOIN LATERAL (SELECT lp
        |        - 0.5 * (ln(2 * pi() * v1) + (d.x1 - m1) * (d.x1 - m1) / v1)
        |        - 0.5 * (ln(2 * pi() * v2) + (d.x2 - m2) * (d.x2 - m2) / v2) sc)
        |      GROUP BY d.rid, d.l_orderkey, d.l_linenumber)
        |SELECT l_orderkey, l_linenumber,
        |       CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
        |            WHEN s1 >= s2 THEN 1 ELSE 2 END AS pred
        |FROM s WHERE l_orderkey < 300 ORDER BY 1, 2, 3""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        when(col("l_returnflag") === "A", 0.0)
          .when(col("l_returnflag") === "N", 1.0)
          .otherwise(2.0).as("cls"))
      val steps = Seq(graft.rel.EstimatorSpec("gaussian_nb",
        Seq("l_quantity", "l_discount"), "cls", "pred_cls"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("pred_cls").cast("int").as("pred"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Multinomial naive Bayes through the arbitrary-estimator path:
    // the text-classification workhorse. Fit statistics are class-wise
    // feature SUMS on an integer lattice (exact in doubles, summation-
    // order-proof), so the oracle replicates fit AND predict: per-class
    // log prior + Laplace-smoothed log likelihoods, argmax with
    // smallest-class tie-break (s0 >= s1 >= s2 cascade).
    q("ml_pipeline_mnb",
      """WITH d AS (SELECT l_orderkey, l_linenumber,
        |             l_quantity x1, l_linenumber::DOUBLE x2,
        |             CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END cls
        |           FROM lineitem),
        |p AS (SELECT cls, count(*) n, sum(x1) s1, sum(x2) s2 FROM d GROUP BY cls),
        |t AS (SELECT sum(n) tot FROM p),
        |pw AS (SELECT cls, ln(n::DOUBLE / tot) lp,
        |              ln((s1 + 1.0) / (s1 + s2 + 2.0)) l1,
        |              ln((s2 + 1.0) / (s1 + s2 + 2.0)) l2
        |       FROM p, t),
        |s AS (SELECT d.l_orderkey, d.l_linenumber,
        |        max(CASE WHEN pw.cls = 0 THEN sc END) s0,
        |        max(CASE WHEN pw.cls = 1 THEN sc END) s1,
        |        max(CASE WHEN pw.cls = 2 THEN sc END) s2
        |      FROM (SELECT *, row_number() OVER () rid FROM d) d
        |      CROSS JOIN pw
        |      CROSS JOIN LATERAL (SELECT pw.lp + d.x1 * pw.l1 + d.x2 * pw.l2 AS sc)
        |      GROUP BY d.rid, d.l_orderkey, d.l_linenumber)
        |SELECT l_orderkey, l_linenumber,
        |       CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
        |            WHEN s1 >= s2 THEN 1 ELSE 2 END AS pred
        |FROM s WHERE l_orderkey < 300 ORDER BY 1, 2, 3""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_linenumber").cast("double").as("ln_feat"),
        when(col("l_returnflag") === "A", 0.0)
          .when(col("l_returnflag") === "N", 1.0)
          .otherwise(2.0).as("cls"))
      val steps = Seq(graft.rel.EstimatorSpec("multinomial_nb",
        Seq("l_quantity", "ln_feat"), "cls", "pred_cls"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("pred_cls").cast("int").as("pred"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Ridge regression through the SAME arbitrary-estimator path
    // (fit-as-UDAF → model bytes → predict-as-UDF): closed-form
    // centered normal equations, so the DuckDB oracle can replicate
    // the entire fit via var_pop/covar_pop sums and Cramer's rule on
    // the 2×2 ridge system. y is rescaled to ~30 magnitude so the
    // engines' summation-order noise sits far below the r4 rounding
    // grain.
    q("ml_pipeline_ridge",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity u,
        |             l_discount v, l_extendedprice / 1000.0 y FROM lineitem),
        |s AS (SELECT count(*)::DOUBLE n, avg(u) mu, avg(v) mv, avg(y) my,
        |             var_pop(u) vu, var_pop(v) vv, covar_pop(u, v) cuv,
        |             covar_pop(u, y) cuy, covar_pop(v, y) cvy FROM d),
        |w AS (SELECT mu, mv, my,
        |        ((cuy*n) * (vv*n + 10.0) - (cvy*n) * (cuv*n)) /
        |        ((vu*n + 10.0) * (vv*n + 10.0) - (cuv*n)*(cuv*n)) w1,
        |        ((cvy*n) * (vu*n + 10.0) - (cuy*n) * (cuv*n)) /
        |        ((vu*n + 10.0) * (vv*n + 10.0) - (cuv*n)*(cuv*n)) w2
        |      FROM s)
        |SELECT l_orderkey, l_linenumber,
        |       round(my - w1*mu - w2*mv + w1*u + w2*v + 1e-9, 4) AS pred
        |FROM d, w WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        (col("l_extendedprice") / 1000.0).as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("ridge(10.0)",
        Seq("l_quantity", "l_discount"), "y", "pred0"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("pred0")).as("pred"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Unsupervised through the estimator path: 1-D k=2 k-means over
    // the uniform l_quantity lattice (1..50). Maximin init seeds the
    // extremes (1, 50) whose midpoint 25.5 already induces the stable
    // partition {1..25}/{26..50}; Lloyd re-centers near 13/38, keeping
    // the boundary inside (25, 26) with ~1.0 margin — orders of
    // magnitude above summation noise — so the converged ASSIGNMENT
    // (not the float centroids) is the oracle-checkable output, and
    // cluster 0 is the low blob by the deterministic init order.
    q("ml_pipeline_kmeans",
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_quantity <= 25 THEN 0 ELSE 1 END AS cluster
        |FROM lineitem WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), lit(0.0).as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("kmeans(2,10)",
        Seq("l_quantity"), "y", "cl"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("cl").cast("int").as("cluster"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // The genuinely ITERATIVE estimator (gradient-descent logistic
    // regression) under the FULL hash gate: iteration count pinned at 3
    // so the oracle can UNROLL the gradient loop as chained CTEs —
    // standardize, then per round aggregate the sigmoid-residual
    // gradient and update (w, b), then score. Every round is a
    // nonlinear function of the previous one, so this checks the real
    // iterative fit (same code path as the 100-round spec-tested
    // configuration in UdxfMlRelSpec), not a closed-form shadow.
    q("ml_pipeline_logreg",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity x1, l_discount x2,
        |             CASE WHEN l_extendedprice > 30000 THEN 1.0 ELSE 0.0 END y
        |           FROM lineitem),
        |s AS (SELECT count(*)::DOUBLE n, avg(x1) m1, avg(x2) m2,
        |             coalesce(nullif(sqrt(var_pop(x1)), 0), 1.0) s1,
        |             coalesce(nullif(sqrt(var_pop(x2)), 0), 1.0) s2 FROM d),
        |z AS (SELECT l_orderkey, l_linenumber, y, n,
        |             (x1 - m1) / s1 z1, (x2 - m2) / s2 z2 FROM d, s),
        |ga AS (SELECT sum((0.5 - y) * z1) g1, sum((0.5 - y) * z2) g2,
        |              sum(0.5 - y) gb, max(n) n FROM z),
        |wa AS (SELECT -0.5 * g1 / n w1, -0.5 * g2 / n w2, -0.5 * gb / n b FROM ga),
        |gb_ AS (SELECT sum((1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) - y) * z1) g1,
        |               sum((1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) - y) * z2) g2,
        |               sum(1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) - y) gb,
        |               max(z.n) n FROM z, wa w),
        |wb AS (SELECT w.w1 - 0.5 * g.g1 / g.n w1, w.w2 - 0.5 * g.g2 / g.n w2,
        |              w.b - 0.5 * g.gb / g.n b FROM wa w, gb_ g),
        |gc AS (SELECT sum((1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) - y) * z1) g1,
        |              sum((1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) - y) * z2) g2,
        |              sum(1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) - y) gb,
        |              max(z.n) n FROM z, wb w),
        |wc AS (SELECT w.w1 - 0.5 * g.g1 / g.n w1, w.w2 - 0.5 * g.g2 / g.n w2,
        |              w.b - 0.5 * g.gb / g.n b FROM wb w, gc g)
        |SELECT l_orderkey, l_linenumber,
        |       round(1/(1+exp(-(w.w1*z1 + w.w2*z2 + w.b))) + 1e-9, 6) AS prob
        |FROM z, wc w WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        (col("l_extendedprice") > 30000).cast("double").as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("logreg_gd(3,0.5)",
        Seq("l_quantity", "l_discount"), "y", "p1"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("p1")).as("prob"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Two-round gradient-boosted CLASSIFIER (logistic loss on the Gbrt
    // stump machinery — ml.GradientBoostedClassifier2, r11 verdict ask
    // #7) through the FitRel/TransformRel estimator path. The oracle
    // UNROLLS the whole fit as chained CTEs: round-1 split scores are
    // n²-scaled integer-seeded doubles (dnum = posl·n − nl·pos), the
    // log-odds prior and the two round-1 leaf sigmoids are the only
    // transcendentals, and round-2 residual sums apply those two
    // constants ONCE to cumulative integer counts — so both engines
    // rank candidates on bit-identical doubles and no order-dependent
    // reduction feeds either argmax (the Stump/Gbrt discipline).
    q("ml_pipeline_gbc",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity x1,
        |             l_discount x2,
        |             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |tot AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM d),
        |h1 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py
        |       FROM d GROUP BY 2
        |       UNION ALL
        |       SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT
        |       FROM d GROUP BY 2),
        |c1 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h1),
        |s1c AS (SELECT fi, v, nl, posl, n, pos,
        |          (posl * n - nl * pos) dnum
        |        FROM c1, tot WHERE nl < n),
        |b1 AS (SELECT fi, v, nl, posl, n, pos, dnum,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s1c ORDER BY s DESC, fi, v LIMIT 1),
        |g1 AS (SELECT fi f1, v t1, nl nl1, n, pos,
        |         ln(pos::DOUBLE / (n - pos)) f0,
        |         (dnum::DOUBLE / n) /
        |           (nl * (pos::DOUBLE / n) * (1 - pos::DOUBLE / n)) gl1,
        |         (-(dnum::DOUBLE) / n) /
        |           ((n - nl) * (pos::DOUBLE / n) * (1 - pos::DOUBLE / n)) gr1
        |       FROM b1),
        |qv AS (SELECT f1, t1, nl1, n, pos, f0, gl1, gr1,
        |         1 / (1 + exp(-(f0 + 0.5 * gl1))) ql,
        |         1 / (1 + exp(-(f0 + 0.5 * gr1))) qr
        |       FROM g1),
        |q2 AS (SELECT f1, t1, nl1, n, pos, f0, gl1, gr1, ql, qr,
        |         ql * (1 - ql) hl, qr * (1 - qr) hr,
        |         pos - nl1 * ql - (n - nl1) * qr rt
        |       FROM qv),
        |q3 AS (SELECT f1, t1, nl1, n, pos, f0, gl1, gr1, ql, qr, hl, hr,
        |         rt, nl1 * hl + (n - nl1) * hr ht
        |       FROM q2),
        |h2 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py,
        |         sum(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                    <= t1 THEN 1 ELSE 0 END)::BIGINT cl
        |       FROM d, q3 GROUP BY 2
        |       UNION ALL
        |       SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT,
        |         sum(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                    <= t1 THEN 1 ELSE 0 END)::BIGINT
        |       FROM d, q3 GROUP BY 2),
        |c2 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl,
        |         sum(cl) OVER (PARTITION BY fi ORDER BY v) cll
        |       FROM h2),
        |s2c AS (SELECT fi, v, nl, posl, cll, n, rt, ht, hl, hr, ql, qr,
        |          f0, gl1, gr1, f1, t1,
        |          posl - cll * ql - (nl - cll) * qr rl
        |        FROM c2, q3 WHERE nl < n),
        |b2 AS (SELECT fi, v, nl, cll, rl, rt, ht, hl, hr, f0, gl1, gr1,
        |         f1, t1,
        |         rl * rl / nl + (rt - rl) * (rt - rl) / (n - nl) s
        |       FROM s2c ORDER BY s DESC, fi, v LIMIT 1),
        |g2 AS (SELECT f0, gl1, gr1, f1, t1, fi f2, v t2,
        |         rl / (cll * hl + (nl - cll) * hr) gl2,
        |         (rt - rl) / (ht - (cll * hl + (nl - cll) * hr)) gr2
        |       FROM b2)
        |SELECT l_orderkey, l_linenumber,
        |       round(1 / (1 + exp(-(f0
        |         + 0.5 * (CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                            <= t1 THEN gl1 ELSE gr1 END)
        |         + 0.5 * (CASE WHEN (CASE WHEN f2 = 1 THEN x1 ELSE x2 END)
        |                            <= t2 THEN gl2 ELSE gr2 END))))
        |         + 1e-9, 6) AS prob
        |FROM d, g2 WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        (col("l_extendedprice") > 30000).cast("double").as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("gbc2(0.5)",
        Seq("l_quantity", "l_discount"), "y", "p1"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("p1")).as("prob"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Deterministic depth-2 CART classifier (ml.CartClassifier2, r12
    // verdict ask #4) through the FitRel/TransformRel estimator path:
    // root split then the best split inside each child, all from the
    // same exact cumulative-histogram machinery as Stump/Gbrt — every
    // split score is dnum²/nl + dnum²/(n_c−nl) with dnum =
    // posl·n_c − nl·pos_c an exact Long (for 0/1 labels this
    // variance-gain argmax IS the weighted-Gini argmax), NO
    // transcendental anywhere in the fit, and each leaf predicts its
    // exact positive fraction. The oracle unrolls the whole fit as
    // chained CTEs: root scan over the two per-feature histograms,
    // then ONE side-tagged histogram pass whose cumulative left/right
    // columns feed both child argmaxes; ties break (score desc,
    // feature asc, threshold asc) on both engines. The child scans'
    // candidate lattice is the full per-feature value set (zero-mass
    // cells repeat the previous cumulative state), exactly as the
    // estimator enumerates it; the estimator's no-candidate leaf
    // fallback is unreachable on this fixture (both root sides carry
    // multiple quantity AND discount values at every SF).
    q("ml_pipeline_cart",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity x1,
        |             l_discount x2,
        |             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |tot AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM d),
        |h1 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py
        |       FROM d GROUP BY 2
        |       UNION ALL
        |       SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT
        |       FROM d GROUP BY 2),
        |c1 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h1),
        |s1c AS (SELECT fi, v, nl, posl, n, pos,
        |          (posl * n - nl * pos) dnum
        |        FROM c1, tot WHERE nl < n),
        |b1 AS (SELECT fi f1, v t1, nl nl1, posl psl1, n, pos,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s1c ORDER BY s DESC, fi, v LIMIT 1),
        |h2 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py,
        |         sum(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                    <= t1 THEN 1 ELSE 0 END)::BIGINT cl,
        |         sum(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                    <= t1 THEN y ELSE 0 END)::BIGINT pl
        |       FROM d, b1 GROUP BY 2
        |       UNION ALL
        |       SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT,
        |         sum(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                    <= t1 THEN 1 ELSE 0 END)::BIGINT,
        |         sum(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |                    <= t1 THEN y ELSE 0 END)::BIGINT
        |       FROM d, b1 GROUP BY 2),
        |c2 AS (SELECT fi, v,
        |         sum(cl) OVER (PARTITION BY fi ORDER BY v) cnl,
        |         sum(pl) OVER (PARTITION BY fi ORDER BY v) cpl,
        |         sum(cnt - cl) OVER (PARTITION BY fi ORDER BY v) cnr,
        |         sum(py - pl) OVER (PARTITION BY fi ORDER BY v) cpr
        |       FROM h2),
        |sL AS (SELECT fi, v, cnl nl, cpl posl, b1.nl1 nc, b1.psl1 psc,
        |         (cpl * b1.nl1 - cnl * b1.psl1) dnum
        |       FROM c2, b1 WHERE cnl > 0 AND cnl < b1.nl1),
        |bL AS (SELECT fi fl, v tl, nl nll, posl psll, nc ncl, psc pscl,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (nc - nl) s
        |       FROM sL ORDER BY s DESC, fi, v LIMIT 1),
        |sR AS (SELECT fi, v, cnr nl, cpr posl,
        |         (b1.n - b1.nl1) nc, (b1.pos - b1.psl1) psc,
        |         (cpr * (b1.n - b1.nl1) - cnr * (b1.pos - b1.psl1)) dnum
        |       FROM c2, b1 WHERE cnr > 0 AND cnr < b1.n - b1.nl1),
        |bR AS (SELECT fi fr, v tr, nl nlr, posl pslr, nc ncr, psc pscr,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (nc - nl) s
        |       FROM sR ORDER BY s DESC, fi, v LIMIT 1)
        |SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END) <= t1
        |    THEN CASE WHEN (CASE WHEN fl = 1 THEN x1 ELSE x2 END) <= tl
        |         THEN psll::DOUBLE / nll
        |         ELSE (pscl - psll)::DOUBLE / (ncl - nll) END
        |    ELSE CASE WHEN (CASE WHEN fr = 1 THEN x1 ELSE x2 END) <= tr
        |         THEN pslr::DOUBLE / nlr
        |         ELSE (pscr - pslr)::DOUBLE / (ncr - nlr) END
        |    END + 1e-9, 6) AS prob
        |FROM d, b1, bL, bR WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        (col("l_extendedprice") > 30000).cast("double").as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("cart2",
        Seq("l_quantity", "l_discount"), "y", "p1"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("p1")).as("prob"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Bagged-stump ensemble (Breiman 1996) through FitRel/TransformRel
    // — the random-forest-style member of the zoo (ref
    // pipeline_lib.py:109-977), built by COMPOSITION (r13 verdict #6):
    // each of the 3 trees trains the exact variance-gain stump on a
    // DETERMINISTIC half-sample, membership = the portable md5
    // hash-bucket of the row's canonical string + tree index + seed
    // (the split_lib seam, ml/split_lib.py:68-252 — never randomSplit),
    // so the whole fit is a pure function of the training multiset and
    // the oracle unrolls one CTE chain per tree. Prediction averages
    // the per-tree leaf rates in tree order (fixed 3-term sum).
    q("ml_pipeline_rf",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity x1,
        |             l_discount x2,
        |             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |g0 AS (SELECT * FROM d WHERE ('0x' || substr(md5(
        |         x1::VARCHAR || '|' || x2::VARCHAR || '|' || y::VARCHAR
        |         || '|0|42'), 1, 8))::BIGINT % 2 = 0),
        |t0 AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM g0),
        |h0 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py
        |       FROM g0 GROUP BY 2
        |       UNION ALL SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT
        |       FROM g0 GROUP BY 2),
        |c0 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h0),
        |s0 AS (SELECT fi, v, nl, posl, n, pos,
        |         (posl * n - nl * pos) dnum FROM c0, t0 WHERE nl < n),
        |b0 AS (SELECT fi f0, v thr0, posl::DOUBLE / nl pl0,
        |         (pos - posl)::DOUBLE / (n - nl) pr0,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s0 ORDER BY s DESC, fi, v LIMIT 1),
        |g1 AS (SELECT * FROM d WHERE ('0x' || substr(md5(
        |         x1::VARCHAR || '|' || x2::VARCHAR || '|' || y::VARCHAR
        |         || '|1|42'), 1, 8))::BIGINT % 2 = 0),
        |t1 AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM g1),
        |h1 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py
        |       FROM g1 GROUP BY 2
        |       UNION ALL SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT
        |       FROM g1 GROUP BY 2),
        |c1 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h1),
        |s1 AS (SELECT fi, v, nl, posl, n, pos,
        |         (posl * n - nl * pos) dnum FROM c1, t1 WHERE nl < n),
        |b1 AS (SELECT fi f1, v thr1, posl::DOUBLE / nl pl1,
        |         (pos - posl)::DOUBLE / (n - nl) pr1,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s1 ORDER BY s DESC, fi, v LIMIT 1),
        |g2 AS (SELECT * FROM d WHERE ('0x' || substr(md5(
        |         x1::VARCHAR || '|' || x2::VARCHAR || '|' || y::VARCHAR
        |         || '|2|42'), 1, 8))::BIGINT % 2 = 0),
        |t2 AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM g2),
        |h2 AS (SELECT 1 fi, x1 v, count(*)::BIGINT cnt, sum(y)::BIGINT py
        |       FROM g2 GROUP BY 2
        |       UNION ALL SELECT 2, x2, count(*)::BIGINT, sum(y)::BIGINT
        |       FROM g2 GROUP BY 2),
        |c2 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h2),
        |s2 AS (SELECT fi, v, nl, posl, n, pos,
        |         (posl * n - nl * pos) dnum FROM c2, t2 WHERE nl < n),
        |b2 AS (SELECT fi f2, v thr2, posl::DOUBLE / nl pl2,
        |         (pos - posl)::DOUBLE / (n - nl) pr2,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s2 ORDER BY s DESC, fi, v LIMIT 1)
        |SELECT l_orderkey, l_linenumber,
        |  round(((CASE WHEN (CASE WHEN f0 = 1 THEN x1 ELSE x2 END)
        |               <= thr0 THEN pl0 ELSE pr0 END)
        |       + (CASE WHEN (CASE WHEN f1 = 1 THEN x1 ELSE x2 END)
        |               <= thr1 THEN pl1 ELSE pr1 END)
        |       + (CASE WHEN (CASE WHEN f2 = 1 THEN x1 ELSE x2 END)
        |               <= thr2 THEN pl2 ELSE pr2 END)) / 3 + 1e-9, 6)
        |    AS prob
        |FROM d, b0, b1, b2 WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        (col("l_extendedprice") > 30000).cast("double").as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("rf(3,42)",
        Seq("l_quantity", "l_discount"), "y", "p1"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("p1")).as("prob"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Random forest proper (Breiman 2001 — BOTH randomizations:
    // ml_pipeline_rf's bootstrap bagging PLUS per-tree mtry FEATURE
    // bagging; r14 verdict #5) through FitRel/TransformRel, built by
    // COMPOSITION: ml/Estimator.RandomForestStumps reuses
    // BaggedStumps' portable-md5 bag test and variance-gain stump
    // scan verbatim — the only new ingredient is the candidate set,
    // drawn on the same md5 lattice (feature j joins tree t iff
    // (md5-hash("f|j|t|seed"), j) ranks in the mtry smallest), so the
    // subsets are pure functions of (d, trees, mtry, seed) that the
    // oracle recomputes in SQL (sel0/sel1/sel2 CTEs; for this fixture
    // tree 0 drops quantity, tree 1 drops discount, tree 2 drops
    // quantity again). 3 trees, mtry = 2 of (quantity, discount,
    // tax); everything else is the ml_pipeline_rf CTE chain with a
    // third feature histogram and the exclusion filter.
    q("ml_pipeline_rf2",
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity x1,
        |             l_discount x2, l_tax x3,
        |             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END y
        |           FROM lineitem),
        |sel0 AS (SELECT CASE WHEN h3 >= h1 AND h3 >= h2 THEN 3
        |           WHEN h2 >= h1 THEN 2 ELSE 1 END ex FROM (SELECT
        |           ('0x' || substr(md5('f|1|0|7'), 1, 8))::BIGINT h1,
        |           ('0x' || substr(md5('f|2|0|7'), 1, 8))::BIGINT h2,
        |           ('0x' || substr(md5('f|3|0|7'), 1, 8))::BIGINT h3)),
        |g0 AS (SELECT * FROM d WHERE ('0x' || substr(md5(
        |         x1::VARCHAR || '|' || x2::VARCHAR || '|' || x3::VARCHAR
        |         || '|' || y::VARCHAR || '|0|7'), 1, 8))::BIGINT % 2 = 0),
        |t0 AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM g0),
        |h0 AS (SELECT fi, v, cnt, py FROM (
        |         SELECT 1 fi, x1 v, count(*)::BIGINT cnt,
        |                sum(y)::BIGINT py FROM g0 GROUP BY 2
        |         UNION ALL SELECT 2, x2, count(*)::BIGINT,
        |                sum(y)::BIGINT FROM g0 GROUP BY 2
        |         UNION ALL SELECT 3, x3, count(*)::BIGINT,
        |                sum(y)::BIGINT FROM g0 GROUP BY 2
        |       ), sel0 WHERE fi != ex),
        |c0 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h0),
        |s0 AS (SELECT fi, v, nl, posl, n, pos,
        |         (posl * n - nl * pos) dnum FROM c0, t0 WHERE nl < n),
        |b0 AS (SELECT fi f0, v thr0, posl::DOUBLE / nl pl0,
        |         (pos - posl)::DOUBLE / (n - nl) pr0,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s0 ORDER BY s DESC, fi, v LIMIT 1),
        |sel1 AS (SELECT CASE WHEN h3 >= h1 AND h3 >= h2 THEN 3
        |           WHEN h2 >= h1 THEN 2 ELSE 1 END ex FROM (SELECT
        |           ('0x' || substr(md5('f|1|1|7'), 1, 8))::BIGINT h1,
        |           ('0x' || substr(md5('f|2|1|7'), 1, 8))::BIGINT h2,
        |           ('0x' || substr(md5('f|3|1|7'), 1, 8))::BIGINT h3)),
        |g1 AS (SELECT * FROM d WHERE ('0x' || substr(md5(
        |         x1::VARCHAR || '|' || x2::VARCHAR || '|' || x3::VARCHAR
        |         || '|' || y::VARCHAR || '|1|7'), 1, 8))::BIGINT % 2 = 0),
        |t1 AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM g1),
        |h1 AS (SELECT fi, v, cnt, py FROM (
        |         SELECT 1 fi, x1 v, count(*)::BIGINT cnt,
        |                sum(y)::BIGINT py FROM g1 GROUP BY 2
        |         UNION ALL SELECT 2, x2, count(*)::BIGINT,
        |                sum(y)::BIGINT FROM g1 GROUP BY 2
        |         UNION ALL SELECT 3, x3, count(*)::BIGINT,
        |                sum(y)::BIGINT FROM g1 GROUP BY 2
        |       ), sel1 WHERE fi != ex),
        |c1 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h1),
        |s1 AS (SELECT fi, v, nl, posl, n, pos,
        |         (posl * n - nl * pos) dnum FROM c1, t1 WHERE nl < n),
        |b1 AS (SELECT fi f1, v thr1, posl::DOUBLE / nl pl1,
        |         (pos - posl)::DOUBLE / (n - nl) pr1,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s1 ORDER BY s DESC, fi, v LIMIT 1),
        |sel2 AS (SELECT CASE WHEN h3 >= h1 AND h3 >= h2 THEN 3
        |           WHEN h2 >= h1 THEN 2 ELSE 1 END ex FROM (SELECT
        |           ('0x' || substr(md5('f|1|2|7'), 1, 8))::BIGINT h1,
        |           ('0x' || substr(md5('f|2|2|7'), 1, 8))::BIGINT h2,
        |           ('0x' || substr(md5('f|3|2|7'), 1, 8))::BIGINT h3)),
        |g2 AS (SELECT * FROM d WHERE ('0x' || substr(md5(
        |         x1::VARCHAR || '|' || x2::VARCHAR || '|' || x3::VARCHAR
        |         || '|' || y::VARCHAR || '|2|7'), 1, 8))::BIGINT % 2 = 0),
        |t2 AS (SELECT count(*)::BIGINT n, sum(y)::BIGINT pos FROM g2),
        |h2 AS (SELECT fi, v, cnt, py FROM (
        |         SELECT 1 fi, x1 v, count(*)::BIGINT cnt,
        |                sum(y)::BIGINT py FROM g2 GROUP BY 2
        |         UNION ALL SELECT 2, x2, count(*)::BIGINT,
        |                sum(y)::BIGINT FROM g2 GROUP BY 2
        |         UNION ALL SELECT 3, x3, count(*)::BIGINT,
        |                sum(y)::BIGINT FROM g2 GROUP BY 2
        |       ), sel2 WHERE fi != ex),
        |c2 AS (SELECT fi, v,
        |         sum(cnt) OVER (PARTITION BY fi ORDER BY v) nl,
        |         sum(py) OVER (PARTITION BY fi ORDER BY v) posl
        |       FROM h2),
        |s2 AS (SELECT fi, v, nl, posl, n, pos,
        |         (posl * n - nl * pos) dnum FROM c2, t2 WHERE nl < n),
        |b2 AS (SELECT fi f2, v thr2, posl::DOUBLE / nl pl2,
        |         (pos - posl)::DOUBLE / (n - nl) pr2,
        |         dnum::DOUBLE * dnum / nl + dnum::DOUBLE * dnum / (n - nl) s
        |       FROM s2 ORDER BY s DESC, fi, v LIMIT 1)
        |SELECT l_orderkey, l_linenumber,
        |  round(((CASE WHEN (CASE WHEN f0 = 1 THEN x1
        |                     WHEN f0 = 2 THEN x2 ELSE x3 END)
        |               <= thr0 THEN pl0 ELSE pr0 END)
        |       + (CASE WHEN (CASE WHEN f1 = 1 THEN x1
        |                     WHEN f1 = 2 THEN x2 ELSE x3 END)
        |               <= thr1 THEN pl1 ELSE pr1 END)
        |       + (CASE WHEN (CASE WHEN f2 = 1 THEN x1
        |                     WHEN f2 = 2 THEN x2 ELSE x3 END)
        |               <= thr2 THEN pl2 ELSE pr2 END)) / 3 + 1e-9, 6)
        |    AS prob
        |FROM d, b0, b1, b2 WHERE l_orderkey < 300 ORDER BY 1, 2""") { c =>
      val d = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"), col("l_tax"),
        (col("l_extendedprice") > 30000).cast("double").as("y"))
      val steps = Seq(graft.rel.EstimatorSpec("rf2(3,2,7)",
        Seq("l_quantity", "l_discount", "l_tax"), "y", "p1"))
      val model = DeferredMl.fit(d, steps)
      DeferredMl.transform(d, model, steps)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("p1")).as("prob"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Classification metrics (metrics.py:513-669): accuracy/precision/
    // recall/f1 from one counts aggregate; ROC AUC via the rank-sum
    // identity with midranks (≡ trapezoid with ties) over the grouped
    // distinct-score relation. Label: returned lineitems; prediction:
    // a quantity threshold; score: the discount lattice (11 values).
    q("ml_metrics_cls",
      """WITH s AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y,
        |                  CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END p,
        |                  l_discount sc FROM lineitem),
        |c AS (SELECT sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)::BIGINT tp,
        |             sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END)::BIGINT fp,
        |             sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END)::BIGINT fn,
        |             sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END)::BIGINT tn
        |      FROM s),
        |m AS (SELECT (tp + tn)::DOUBLE / (tp + tn + fp + fn) acc,
        |             tp::DOUBLE / (tp + fp) prec, tp::DOUBLE / (tp + fn) rec
        |      FROM c),
        |g AS (SELECT sc, count(*) n, sum(y) np FROM s GROUP BY sc),
        |r AS (SELECT np, n, coalesce(sum(n) OVER (ORDER BY sc
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum
        |      FROM g),
        |a AS (SELECT sum(np * (cum + (n + 1) / 2.0)) rpos,
        |             sum(np) pos, sum(n) tot FROM r)
        |SELECT round(acc + 1e-9, 6) AS accuracy,
        |       round(prec + 1e-9, 6) AS precision,
        |       round(rec + 1e-9, 6) AS recall,
        |       round(2 * prec * rec / (prec + rec) + 1e-9, 6) AS f1,
        |       round((rpos - pos * (pos + 1) / 2.0)
        |             / (pos * (tot - pos)) + 1e-9, 6) AS auc
        |FROM m, a""") { c =>
      val scored = c.lineitem.select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        when(col("l_quantity") > 25, 1).otherwise(0).as("p"),
        col("l_discount").as("sc"))
      val cls = Metrics.classification(scored, "y", "p")
      val auc = Metrics.rocAuc(scored, "y", "sc")
      cls.crossJoin(auc).select(
        r6(col("accuracy")).as("accuracy"),
        r6(col("precision")).as("precision"),
        r6(col("recall")).as("recall"),
        r6(col("f1")).as("f1"),
        r6(col("auc")).as("auc"))
    },

    // Matthews correlation coefficient + balanced accuracy + Youden's J
    // — the imbalance-robust confusion-matrix metrics ml_metrics_cls's
    // accuracy/precision/recall family misses (MCC is the one binary
    // metric that stays honest when 95% of rows are one class — the
    // usual quality-classifier regime). Everything derives from the
    // four integer confusion counts in pinned expression shapes: the
    // MCC numerator tp·tn − fp·fn stays in Long range; the
    // denominator's 4-way product overflows 64 bits, so both engines
    // square via the double-first Stump pattern in the same order.
    // One counts aggregate over the corpus — no second scan.
    q("ml_mcc",
      """WITH s AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y,
        |                  CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END p
        |           FROM lineitem),
        |c AS (SELECT
        |    sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)::BIGINT tp,
        |    sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END)::BIGINT fp,
        |    sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END)::BIGINT fn,
        |    sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END)::BIGINT tn
        |  FROM s)
        |SELECT tp, fp, fn, tn,
        |       round((tp * tn - fp * fn)::DOUBLE /
        |         sqrt(((tp + fp)::DOUBLE * (tp + fn)) *
        |              ((tn + fp)::DOUBLE * (tn + fn))) + 1e-9, 6) AS mcc,
        |       round((tp::DOUBLE / (tp + fn) + tn::DOUBLE / (tn + fp))
        |             / 2 + 1e-9, 6) AS balanced_accuracy,
        |       round(tp::DOUBLE / (tp + fn) + tn::DOUBLE / (tn + fp)
        |             - 1 + 1e-9, 6) AS youden_j
        |FROM c""") { c =>
      val s = c.lineitem.select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        when(col("l_quantity") > 25, 1).otherwise(0).as("p"))
      val cm = s.agg(
        sum(when(col("y") === 1 && col("p") === 1, 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("y") === 0 && col("p") === 1, 1L).otherwise(0L))
          .as("fp"),
        sum(when(col("y") === 1 && col("p") === 0, 1L).otherwise(0L))
          .as("fn"),
        sum(when(col("y") === 0 && col("p") === 0, 1L).otherwise(0L))
          .as("tn"))
      val tpr = col("tp").cast("double") / (col("tp") + col("fn"))
      val tnr = col("tn").cast("double") / (col("tn") + col("fp"))
      cm.select(col("tp"), col("fp"), col("fn"), col("tn"),
        r6((col("tp") * col("tn") - col("fp") * col("fn")).cast("double") /
          sqrt(((col("tp") + col("fp")).cast("double") *
            (col("tp") + col("fn"))) *
            ((col("tn") + col("fp")).cast("double") *
              (col("tn") + col("fn"))))).as("mcc"),
        r6((tpr + tnr) / 2).as("balanced_accuracy"),
        r6(tpr + tnr - 1).as("youden_j"))
    },

    // Average precision (area under the precision–recall curve, the
    // sklearn step interpolation) — the ranking metric that matters
    // more than ROC AUC under class imbalance (the usual
    // quality-classifier regime). Distributed shape: distinct-score
    // collapse + ONE shared bucket-offset prefix-sum pass
    // (Positional.withCumSums) for both cumulative counts — no global
    // window, continuous scores stay distributed.
    q("ml_metrics_pr",
      """WITH s AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y,
        |                  l_discount sc FROM lineitem),
        |g AS (SELECT sc, count(*) n, sum(y) np FROM s GROUP BY sc),
        |c AS (SELECT sc, n, np,
        |        coalesce(sum(n) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cn,
        |        coalesce(sum(np) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cp
        |      FROM g),
        |t AS (SELECT sum(n) nn, sum(np) p FROM g)
        |SELECT round(sum((np::DOUBLE / p) * ((p - cp)::DOUBLE / (nn - cn)))
        |             + 1e-9, 6) AS ap
        |FROM c, t""") { c =>
      val scored = c.lineitem.select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        col("l_discount").as("sc"))
      Metrics.averagePrecision(scored, "y", "sc")
        .select(r6(col("ap")).as("ap"))
    },

    // Average precision on a CONTINUOUS score (r7 verdict ask #8): the
    // 11-level discount lattice above never stresses the distributed
    // path — here the score is l_extendedprice, where nearly every
    // value is distinct, so the distinct-score relation is
    // corpus-sized and the metric stands or falls on the Positional
    // bucket-cumsum (a global window would single-partition ~60k rows
    // at the sf0.01 gate and the whole corpus at scale). n_scores
    // evidences the regime. Order-safety of the final FP sum: ~1e5
    // terms of ~1e-5 magnitude leave reordering noise ~1e-11, four
    // orders under the 1e-6 rounding grain.
    q("ml_metrics_pr_cont",
      """WITH s AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y,
        |                  l_extendedprice sc FROM lineitem),
        |g AS (SELECT sc, count(*) n, sum(y) np FROM s GROUP BY sc),
        |c AS (SELECT sc, n, np,
        |        coalesce(sum(n) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cn,
        |        coalesce(sum(np) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cp
        |      FROM g),
        |t AS (SELECT sum(n) nn, sum(np) p, count(*) ns FROM g)
        |SELECT round(sum((np::DOUBLE / p) * ((p - cp)::DOUBLE / (nn - cn)))
        |             + 1e-9, 6) AS ap,
        |       any_value(ns)::BIGINT AS n_scores
        |FROM c, t""") { c =>
      val scored = c.lineitem.select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        col("l_extendedprice").as("sc"))
      Metrics.averagePrecision(scored, "y", "sc")
        .crossJoin(broadcast(
          scored.agg(countDistinct(col("sc")).as("n_scores"))))
        .select(r6(col("ap")).as("ap"), col("n_scores"))
    },

    // Confusion matrix + log loss (the remaining metrics.py breadth):
    // exact integer tp/fp/fn/tn counts in one pass, and binary
    // cross-entropy with sklearn's 1e-15 probability clipping. The
    // "probability" is the discount lattice rescaled into (0,1) — a
    // deterministic score column with hard 0s (clipping exercised).
    q("ml_metrics_logloss",
      """WITH s AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END y,
        |                  CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END p,
        |                  l_discount * 5.0 pr FROM lineitem),
        |c AS (SELECT sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)::BIGINT tp,
        |             sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END)::BIGINT fp,
        |             sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END)::BIGINT fn,
        |             sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END)::BIGINT tn
        |      FROM s),
        |l AS (SELECT avg(-(y * ln(least(greatest(pr, 1e-15), 1 - 1e-15))
        |          + (1 - y) * ln(1 - least(greatest(pr, 1e-15), 1 - 1e-15))))
        |        ll FROM s)
        |SELECT tp, fp, fn, tn, round(ll + 1e-9, 6) AS log_loss
        |FROM c, l""") { c =>
      val scored = c.lineitem.select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        when(col("l_quantity") > 25, 1).otherwise(0).as("p"),
        (col("l_discount") * 5.0).as("pr"))
      Metrics.confusionWithLogLoss(scored, "y", "p", "pr")
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          r6(col("log_loss")).as("log_loss"))
    },

    // K-fold CV on deterministic hash folds (cross_validation.py):
    // fold i fits on buckets != i, scores mse on bucket == i.
    q("ml_cv",
      """WITH f AS (SELECT l_extendedprice y, l_quantity x,
        |                  CAST(('0x' || substr(md5('7|' || l_orderkey || '|' || l_linenumber), 1, 8))::BIGINT % 3 AS INT) AS fold
        |           FROM lineitem),
        |m AS (SELECT k.fold, regr_slope(t.y, t.x) a, regr_intercept(t.y, t.x) b
        |      FROM (SELECT DISTINCT fold FROM f) k
        |      JOIN f t ON t.fold <> k.fold
        |      GROUP BY k.fold)
        |SELECT t.fold,
        |       round(avg((t.y - (m.b + m.a * t.x)) * (t.y - (m.b + m.a * t.x))) / 1e6 + 1e-9, 2) AS mse_m
        |FROM f t JOIN m ON m.fold = t.fold
        |GROUP BY t.fold ORDER BY t.fold""") { c =>
      val spark = c.spark
      import spark.implicits._
      val results = CrossVal.crossValMse(
        c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice")),
        keys = Seq("l_orderkey", "l_linenumber"),
        pipeline = Pipeline(Seq(
          LinearRegression("l_quantity", "l_extendedprice", "pred"))),
        y = "l_extendedprice", pred = "pred",
        k = 3, seed = 7L, portable = true)
      results.map { case (fold, mse) =>
        (fold, BigDecimal(mse / 1e6 + 1e-9)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("fold", "mse_m").orderBy("fold")
    },

    // Rank-2 ALS matrix factorization (ml/Als.scala) on the
    // customer×part quantity matrix — the collaborative-filtering
    // recommender beside the regression/classification estimators.
    // Two pinned alternating rounds; each per-entity solve is a
    // closed-form 2×2 normal-equation inverse, so a half-step is one
    // equi-join + one keyed five-term Gram aggregation — factors
    // never leave the cluster. The oracle unrolls all four half-steps
    // as chained CTEs; output is the u<10 slice of training
    // predictions plus the global train RMSE.
    q("ml_pipeline_als",
      """WITH r AS (SELECT o_custkey u, l_partkey i, avg(l_quantity) r
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           GROUP BY 1, 2),
        |q0 AS (SELECT DISTINCT i, 1.0::DOUBLE q1,
        |              ((i % 7) - 3) / 10.0::DOUBLE q2 FROM r),
        |ua1 AS (SELECT u, sum(q1*q1) a11, sum(q1*q2) a12, sum(q2*q2) a22,
        |               sum(q1*r.r) b1, sum(q2*r.r) b2
        |        FROM r JOIN q0 USING (i) GROUP BY 1),
        |u1 AS (SELECT u,
        |        ((a22+0.1::DOUBLE)*b1 - a12*b2)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) p1,
        |        ((a11+0.1::DOUBLE)*b2 - a12*b1)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) p2
        |       FROM ua1),
        |ia1 AS (SELECT i, sum(p1*p1) a11, sum(p1*p2) a12, sum(p2*p2) a22,
        |               sum(p1*r.r) b1, sum(p2*r.r) b2
        |        FROM r JOIN u1 USING (u) GROUP BY 1),
        |i1 AS (SELECT i,
        |        ((a22+0.1::DOUBLE)*b1 - a12*b2)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) q1,
        |        ((a11+0.1::DOUBLE)*b2 - a12*b1)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) q2
        |       FROM ia1),
        |ua2 AS (SELECT u, sum(q1*q1) a11, sum(q1*q2) a12, sum(q2*q2) a22,
        |               sum(q1*r.r) b1, sum(q2*r.r) b2
        |        FROM r JOIN i1 USING (i) GROUP BY 1),
        |u2 AS (SELECT u,
        |        ((a22+0.1::DOUBLE)*b1 - a12*b2)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) p1,
        |        ((a11+0.1::DOUBLE)*b2 - a12*b1)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) p2
        |       FROM ua2),
        |ia2 AS (SELECT i, sum(p1*p1) a11, sum(p1*p2) a12, sum(p2*p2) a22,
        |               sum(p1*r.r) b1, sum(p2*r.r) b2
        |        FROM r JOIN u2 USING (u) GROUP BY 1),
        |i2 AS (SELECT i,
        |        ((a22+0.1::DOUBLE)*b1 - a12*b2)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) q1,
        |        ((a11+0.1::DOUBLE)*b2 - a12*b1)
        |          / ((a11+0.1::DOUBLE)*(a22+0.1::DOUBLE) - a12*a12) q2
        |       FROM ia2),
        |pred AS (SELECT r.u, r.i, r.r, (p1*q1 + p2*q2) pred
        |         FROM r JOIN u2 USING (u) JOIN i2 USING (i)),
        |rmse AS (SELECT sqrt(avg((pred - r)*(pred - r))) v FROM pred)
        |SELECT u, i, round(r + 1e-9, 4) rating,
        |       round(pred + 1e-9, 4) pred, round(rmse.v + 1e-9, 4) rmse
        |FROM pred, rmse WHERE u < 10 ORDER BY u, i""",
      bench = true) { c =>
      // ratings is consumed by fit (which persists its own projection
      // but unpersists it on return), by predict, and transitively
      // TWICE in the final plan (the rmse scalar branch and the output
      // branch both contain pred) — without a barrier the
      // lineitem⋈orders aggregation re-ran twice more after fit
      // (r15 probe: predict+output leg 1.7 s, ~1.4 s of it the ratings
      // re-aggregation). localCheckpoint makes ratings and pred plan
      // LEAVES, so each is computed exactly once per invocation.
      val ratings = c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
        .agg(avg(col("l_quantity")).as("r"))
        .localCheckpoint()
      val (users, items) = Als.fit(ratings, lambda = 0.1, iters = 2)
      val pred = Als.predict(ratings, users, items).localCheckpoint()
      val rmse = pred.agg(
        sqrt(avg((col("pred") - col("r")) * (col("pred") - col("r"))))
          .as("v"))
      pred.crossJoin(broadcast(rmse))
        .filter(col("u") < 10)
        .select(col("u"), col("i"), r4(col("r")).as("rating"),
          r4(col("pred")).as("pred"), r4(col("v")).as("rmse"))
        .orderBy("u", "i")
    },

    // Two-round AdaBoost over distributed decision stumps
    // (ml/Boost.scala): round 1 is the exact histogram stump fit;
    // round-2 weights collapse to TWO constants (e^±α), so the
    // weighted histograms aggregate integer counts split by round-1
    // correctness and apply the weights in closed form — the whole
    // boosted fit stays a deterministic function of exact integers and
    // hash-checks against a windowed SQL oracle replaying both rounds.
    q("ml_adaboost",
      """WITH lab AS (SELECT l_quantity::DOUBLE q, l_discount::DOUBLE d,
        |                    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
        |                    END y
        |             FROM lineitem),
        |u1 AS (SELECT 'l_quantity' feature, q v, count(*) cnt, sum(y) pos
        |       FROM lab GROUP BY 2
        |       UNION ALL
        |       SELECT 'l_discount', d, count(*), sum(y)
        |       FROM lab GROUP BY 2),
        |c1 AS (SELECT feature, v,
        |              sum(cnt) OVER (PARTITION BY feature ORDER BY v) nl,
        |              sum(pos) OVER (PARTITION BY feature ORDER BY v) pl,
        |              sum(cnt) OVER (PARTITION BY feature) n,
        |              sum(pos) OVER (PARTITION BY feature) p
        |       FROM u1),
        |g1 AS (SELECT feature, v, nl, pl, n - nl nr, p - pl pr, n,
        |              CAST(round(((pl::DOUBLE*pl::DOUBLE
        |                           + (nl-pl)::DOUBLE*(nl-pl)::DOUBLE)/nl
        |                        + ((p-pl)::DOUBLE*(p-pl)::DOUBLE
        |                           + ((n-nl)-(p-pl))::DOUBLE
        |                             *((n-nl)-(p-pl))::DOUBLE)
        |                          /(n-nl)) * 1e6 / n + 1e-9) AS BIGINT)
        |                score_u
        |       FROM c1 WHERE nl < n),
        |b1 AS (SELECT * FROM g1
        |       QUALIFY row_number() OVER (ORDER BY score_u DESC,
        |                                  feature, v) = 1),
        |m1 AS (SELECT feature f1, v t1,
        |              CASE WHEN 2*pl > nl THEN 1 ELSE 0 END hl1,
        |              CASE WHEN 2*pr > nr THEN 1 ELSE 0 END hr1
        |       FROM b1),
        |r1 AS (SELECT lab.q, lab.d, lab.y,
        |              CASE WHEN (CASE WHEN m1.f1 = 'l_quantity' THEN q
        |                         ELSE d END) <= m1.t1
        |                   THEN m1.hl1 ELSE m1.hr1 END h1
        |       FROM lab, m1),
        |t1s AS (SELECT count(*) n,
        |               sum(CASE WHEN h1 <> y THEN 1 ELSE 0 END) mis
        |        FROM r1),
        |a1 AS (SELECT n, mis, mis * 1.0 / n eps FROM t1s),
        |a1b AS (SELECT n, mis, 0.5 * ln((1 - eps) / eps) alpha1 FROM a1),
        |a1c AS (SELECT n, mis, alpha1, exp(alpha1) wmis,
        |               exp(-alpha1) wok
        |        FROM a1b),
        |tg AS (SELECT q, d, y, CASE WHEN h1 = y THEN 1 ELSE 0 END ok
        |       FROM r1),
        |u2 AS (SELECT 'l_quantity' feature, q v, sum(ok) co,
        |              sum(1 - ok) cm, sum(y * ok) po, sum(y * (1 - ok)) pm
        |       FROM tg GROUP BY 2
        |       UNION ALL
        |       SELECT 'l_discount', d, sum(ok), sum(1 - ok),
        |              sum(y * ok), sum(y * (1 - ok))
        |       FROM tg GROUP BY 2),
        |c2 AS (SELECT feature, v,
        |              sum(co) OVER (PARTITION BY feature ORDER BY v) col_,
        |              sum(cm) OVER (PARTITION BY feature ORDER BY v) cml,
        |              sum(po) OVER (PARTITION BY feature ORDER BY v) pol,
        |              sum(pm) OVER (PARTITION BY feature ORDER BY v) pml,
        |              sum(co) OVER (PARTITION BY feature) cot,
        |              sum(cm) OVER (PARTITION BY feature) cmt,
        |              sum(po) OVER (PARTITION BY feature) pot,
        |              sum(pm) OVER (PARTITION BY feature) pmt
        |       FROM u2),
        |w2 AS (SELECT feature, v,
        |              cml::DOUBLE * wmis + col_::DOUBLE * wok wl,
        |              pml::DOUBLE * wmis + pol::DOUBLE * wok wpl,
        |              cmt::DOUBLE * wmis + cot::DOUBLE * wok wn,
        |              pmt::DOUBLE * wmis + pot::DOUBLE * wok wp
        |       FROM c2, a1c WHERE cml + col_ < cmt + cot),
        |g2 AS (SELECT feature, v, wl, wpl, wn - wl wr, wp - wpl wpr, wn,
        |              CAST(round(((wpl*wpl + (wl-wpl)*(wl-wpl))/wl
        |                        + ((wp-wpl)*(wp-wpl)
        |                           + ((wn-wl)-(wp-wpl))*((wn-wl)-(wp-wpl)))
        |                          /(wn-wl)) * 1e6 / wn + 1e-9) AS BIGINT)
        |                score_u
        |       FROM w2),
        |b2 AS (SELECT * FROM g2
        |       QUALIFY row_number() OVER (ORDER BY score_u DESC,
        |                                  feature, v) = 1),
        |m2 AS (SELECT feature f2, v t2,
        |              CASE WHEN 2*wpl > wl THEN 1 ELSE 0 END hl2,
        |              CASE WHEN 2*wpr > wr THEN 1 ELSE 0 END hr2
        |       FROM b2),
        |r2p AS (SELECT tg.y, tg.ok,
        |               CASE WHEN ok = 1 THEN y ELSE 1 - y END h1,
        |               CASE WHEN (CASE WHEN m2.f2 = 'l_quantity' THEN q
        |                          ELSE d END) <= m2.t2
        |                    THEN m2.hl2 ELSE m2.hr2 END h2
        |        FROM tg, m2),
        |e2 AS (SELECT sum(CASE WHEN h2 <> y AND ok = 0 THEN 1 ELSE 0
        |                  END) m2m,
        |              sum(CASE WHEN h2 <> y AND ok = 1 THEN 1 ELSE 0
        |                  END) m2o
        |       FROM r2p),
        |a2 AS (SELECT (m2m * wmis + m2o * wok)
        |                / (mis * wmis + (n - mis) * wok) eps2, n, alpha1
        |       FROM e2, a1c),
        |a2b AS (SELECT n, alpha1, 0.5 * ln((1 - eps2) / eps2) alpha2
        |        FROM a2),
        |acc AS (SELECT sum(CASE WHEN (CASE WHEN a2b.alpha1 * (h1 * 2 - 1)
        |                                 + a2b.alpha2 * (h2 * 2 - 1) >= 0
        |                              THEN 1 ELSE 0 END) = y
        |                        THEN 1 ELSE 0 END) corr
        |        FROM r2p, a2b)
        |SELECT m1.f1 AS feature1, round(m1.t1 + 1e-9, 4) AS threshold1,
        |       round(a2b.alpha1 + 1e-9, 6) AS alpha1,
        |       m2.f2 AS feature2, round(m2.t2 + 1e-9, 4) AS threshold2,
        |       round(a2b.alpha2 + 1e-9, 6) AS alpha2,
        |       round(acc.corr * 1.0 / a2b.n + 1e-9, 6) AS train_acc,
        |       a2b.n::BIGINT AS n
        |FROM m1, m2, a2b, acc""") { c =>
      val label = (col("l_returnflag") === "R").cast("int")
      val m = Boost.fitTwo(c.lineitem,
        Seq("l_quantity", "l_discount"), label)
      val lab = c.lineitem.select(
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_discount").cast("double").as("l_discount"),
        label.as("y"))
      val st = lab.agg(
        sum((m.prediction === col("y")).cast("long")).as("corr"),
        count(lit(1)).as("n")).collect().head
      def r6d(x: Double): Double = BigDecimal(x + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r4d(x: Double): Double = BigDecimal(x + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = c.spark
      import s.implicits._
      Seq((m.r1.feature, r4d(m.r1.threshold), r6d(m.r1.alpha),
        m.r2.feature, r4d(m.r2.threshold), r6d(m.r2.alpha),
        r6d(st.getLong(0).toDouble / st.getLong(1)), st.getLong(1)))
        .toDF("feature1", "threshold1", "alpha1", "feature2",
          "threshold2", "alpha2", "train_acc", "n")
    },

    // Leading principal component by power iteration (3 pinned rounds)
    // on the 4×4 CORRELATION matrix of the lineitem numeric columns —
    // the distributed part is exactly one six-corr aggregation pass
    // (the matrix is model-sized by construction); the iteration is
    // closed-form scalar math replayed identically by the oracle's
    // chained CTEs. Correlation (not covariance) keeps the component
    // scale-free across differently-ranged features.
    q("ml_pca_power",
      """WITH c AS (SELECT corr(l_quantity, l_extendedprice) c12,
        |                  corr(l_quantity, l_discount) c13,
        |                  corr(l_quantity, l_tax) c14,
        |                  corr(l_extendedprice, l_discount) c23,
        |                  corr(l_extendedprice, l_tax) c24,
        |                  corr(l_discount, l_tax) c34
        |           FROM lineitem),
        |i1 AS (SELECT c.*,
        |         1.0*0.5 + c12*0.5 + c13*0.5 + c14*0.5 a1,
        |         c12*0.5 + 1.0*0.5 + c23*0.5 + c24*0.5 a2,
        |         c13*0.5 + c23*0.5 + 1.0*0.5 + c34*0.5 a3,
        |         c14*0.5 + c24*0.5 + c34*0.5 + 1.0*0.5 a4
        |       FROM c),
        |n1 AS (SELECT *, sqrt(a1*a1 + a2*a2 + a3*a3 + a4*a4) nn FROM i1),
        |v1 AS (SELECT c12, c13, c14, c23, c24, c34,
        |              a1/nn v1, a2/nn v2, a3/nn v3, a4/nn v4 FROM n1),
        |i2 AS (SELECT v1.*,
        |         1.0*v1 + c12*v2 + c13*v3 + c14*v4 a1,
        |         c12*v1 + 1.0*v2 + c23*v3 + c24*v4 a2,
        |         c13*v1 + c23*v2 + 1.0*v3 + c34*v4 a3,
        |         c14*v1 + c24*v2 + c34*v3 + 1.0*v4 a4
        |       FROM v1),
        |n2 AS (SELECT *, sqrt(a1*a1 + a2*a2 + a3*a3 + a4*a4) nn FROM i2),
        |v2c AS (SELECT c12, c13, c14, c23, c24, c34,
        |               a1/nn v1, a2/nn v2, a3/nn v3, a4/nn v4 FROM n2),
        |i3 AS (SELECT v2c.*,
        |         1.0*v1 + c12*v2 + c13*v3 + c14*v4 a1,
        |         c12*v1 + 1.0*v2 + c23*v3 + c24*v4 a2,
        |         c13*v1 + c23*v2 + 1.0*v3 + c34*v4 a3,
        |         c14*v1 + c24*v2 + c34*v3 + 1.0*v4 a4
        |       FROM v2c),
        |n3 AS (SELECT *, sqrt(a1*a1 + a2*a2 + a3*a3 + a4*a4) nn FROM i3),
        |v3c AS (SELECT c12, c13, c14, c23, c24, c34,
        |               a1/nn v1, a2/nn v2, a3/nn v3, a4/nn v4 FROM n3),
        |ray AS (SELECT v1*(1.0*v1 + c12*v2 + c13*v3 + c14*v4)
        |              + v2*(c12*v1 + 1.0*v2 + c23*v3 + c24*v4)
        |              + v3*(c13*v1 + c23*v2 + 1.0*v3 + c34*v4)
        |              + v4*(c14*v1 + c24*v2 + c34*v3 + 1.0*v4) lam,
        |              v1, v2, v3, v4
        |        FROM v3c)
        |SELECT round(v1 + 1e-9, 6) AS w_quantity,
        |       round(v2 + 1e-9, 6) AS w_price,
        |       round(v3 + 1e-9, 6) AS w_discount,
        |       round(v4 + 1e-9, 6) AS w_tax,
        |       round(lam + 1e-9, 6) AS eigenvalue
        |FROM ray""") { c =>
      val cr = c.lineitem.agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c12"),
        corr(col("l_quantity"), col("l_discount")).as("c13"),
        corr(col("l_quantity"), col("l_tax")).as("c14"),
        corr(col("l_extendedprice"), col("l_discount")).as("c23"),
        corr(col("l_extendedprice"), col("l_tax")).as("c24"),
        corr(col("l_discount"), col("l_tax")).as("c34")).collect().head
      val (c12, c13, c14, c23, c24, c34) = (cr.getDouble(0),
        cr.getDouble(1), cr.getDouble(2), cr.getDouble(3),
        cr.getDouble(4), cr.getDouble(5))
      // matrix-vector product with the SAME left-to-right association
      // as the oracle's CTE expressions (FP-identical given equal corr)
      def mul(v: Array[Double]): Array[Double] = Array(
        1.0 * v(0) + c12 * v(1) + c13 * v(2) + c14 * v(3),
        c12 * v(0) + 1.0 * v(1) + c23 * v(2) + c24 * v(3),
        c13 * v(0) + c23 * v(1) + 1.0 * v(2) + c34 * v(3),
        c14 * v(0) + c24 * v(1) + c34 * v(2) + 1.0 * v(3))
      var v = Array(0.5, 0.5, 0.5, 0.5)
      (1 to 3).foreach { _ =>
        val a = mul(v)
        val nn = math.sqrt(a(0) * a(0) + a(1) * a(1) + a(2) * a(2) +
          a(3) * a(3))
        v = a.map(_ / nn)
      }
      val av = mul(v)
      val lam = v(0) * av(0) + v(1) * av(1) + v(2) * av(2) +
        v(3) * av(3)
      def r6d(x: Double): Double = BigDecimal(x + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = c.spark
      import s.implicits._
      Seq((r6d(v(0)), r6d(v(1)), r6d(v(2)), r6d(v(3)), r6d(lam)))
        .toDF("w_quantity", "w_price", "w_discount", "w_tax",
          "eigenvalue")
    },

    // k-NN classification (k=5, cosine) over the embeddings corpus —
    // the lazy-learner baseline every vector store ships: exact top-k
    // neighbors (the sim_topk machinery), then a majority vote with
    // deterministic (votes DESC, label) tie-break. The brute-force
    // scoring here is the oracle-checkable regime; the production path
    // swaps in the LSH/IVF/SQ8 candidate generators unchanged.
    q("ml_knn",
      """WITH q AS (SELECT vec_id q_id, embedding::DOUBLE[] qv, label y
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id n_id, embedding::DOUBLE[] nv, label yl
        |      FROM embeddings),
        |s AS (SELECT q_id, y, n_id, yl, list_cosine_similarity(qv, nv) cos
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, y, yl,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY round(cos + 1e-9, 6) DESC, n_id) rnk FROM s),
        |v AS (SELECT q_id, y, yl, count(*) votes FROM r WHERE rnk <= 5
        |      GROUP BY 1, 2, 3),
        |p AS (SELECT q_id, y, yl pred FROM (
        |        SELECT q_id, y, yl, row_number() OVER (PARTITION BY q_id
        |          ORDER BY votes DESC, yl) rn FROM v) WHERE rn = 1)
        |SELECT q_id, y AS actual, pred, pred = y AS correct
        |FROM p ORDER BY q_id""") { c =>
      import org.apache.spark.sql.expressions.Window
      val queries = c.embeddings.filter(col("vec_id") < 50).limit(50)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = c.embeddings
        .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      graft.functions.GraftFunctions.register(c.spark)
      val top5 = graft.ops.VectorSim.topKBruteForce(queries, corpus, 5,
        native = true)
      val labels = c.embeddings.select(col("vec_id"), col("label"))
      val votes = top5
        .join(labels.select(col("vec_id").as("n_id"),
          col("label").as("yl")), Seq("n_id"))
        .join(labels.select(col("vec_id").as("q_id"),
          col("label").as("y")), Seq("q_id"))
        .groupBy("q_id", "y", "yl").agg(count(lit(1)).as("votes"))
      votes.withColumn("rn", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("votes").desc, col("yl"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("y").as("actual"),
          col("yl").as("pred"), (col("yl") === col("y")).as("correct"))
        .orderBy("q_id")
    },

    // Simplified (centroid-based) silhouette score per cluster — the
    // clustering-quality diagnostic that, unlike the full silhouette,
    // never forms point-pair distances: a(i) is the distance to the own
    // centroid, b(i) the nearest other centroid, so the whole audit is
    // one centroid aggregation plus a #clusters-bounded fan-out join —
    // the 100 TB shape (full silhouette is O(n²) by definition).
    q("ml_silhouette",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v, label
        |           FROM embeddings),
        |el AS (SELECT vec_id, label, g.i, v[g.i] x
        |       FROM e, generate_series(1, 64) g(i)),
        |cent AS (SELECT label clab, i, avg(x) c FROM el GROUP BY 1, 2),
        |d AS (SELECT el.vec_id, el.label, cent.clab,
        |             sum((el.x - cent.c) * (el.x - cent.c)) d2
        |      FROM el JOIN cent ON el.i = cent.i
        |      GROUP BY 1, 2, 3),
        |own AS (SELECT vec_id, label, sqrt(d2) a FROM d
        |        WHERE label = clab),
        |oth AS (SELECT vec_id, min(sqrt(d2)) b FROM d
        |        WHERE label <> clab GROUP BY 1),
        |s AS (SELECT own.label, (oth.b - own.a) / greatest(own.a, oth.b)
        |        sil
        |      FROM own JOIN oth USING (vec_id))
        |SELECT label, count(*)::BIGINT AS n,
        |       round(avg(sil) + 1e-9, 6) AS mean_silhouette
        |FROM s GROUP BY 1 ORDER BY label""") { c =>
      val el = c.embeddings
        .select(col("vec_id"), col("label"),
          posexplode(expr("transform(embedding, x -> cast(x AS DOUBLE))"))
            .as(Seq("i", "x")))
      val cent = el.groupBy(col("label").as("clab"), col("i"))
        .agg(avg(col("x")).as("c"))
      val d = el.join(broadcast(cent), Seq("i"))
        .groupBy("vec_id", "label", "clab")
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d2"))
      val own = d.filter(col("label") === col("clab"))
        .select(col("vec_id"), col("label"), sqrt(col("d2")).as("a"))
      val oth = d.filter(col("label") =!= col("clab"))
        .groupBy("vec_id").agg(min(sqrt(col("d2"))).as("b"))
      own.join(oth, Seq("vec_id"))
        .select(col("label"),
          ((col("b") - col("a")) / greatest(col("a"), col("b")))
            .as("sil"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), r6(avg(col("sil")))
          .as("mean_silhouette"))
        .orderBy("label")
    },

    // Two-component 1-D Gaussian-mixture EM (Dempster et al. 1977,
    // 2 pinned iterations) on purchase values — the soft-clustering
    // counterpart of the hard k-means estimator. Each E-step is a pure
    // per-row responsibility projection; each M-step is ONE aggregation
    // of six sufficient statistics (variances via E[x²]−mean², no
    // second pass); between iterations only the 5-scalar parameter
    // vector crosses the driver. The oracle unrolls both rounds with
    // bit-identical pdf arithmetic; the final log-likelihood rides the
    // second E-step for free.
    q("ml_pipeline_em_gmm",
      """WITH x AS (SELECT value v FROM events
        |           WHERE event_type = 'purchase'),
        |e1 AS (SELECT v,
        |         0.5::DOUBLE * exp(-(v - 30.0::DOUBLE)
        |             * (v - 30.0::DOUBLE)
        |           / (2.0::DOUBLE * 20.0::DOUBLE * 20.0::DOUBLE))
        |           / (20.0::DOUBLE * 2.5066282746310002::DOUBLE) p1,
        |         0.5::DOUBLE * exp(-(v - 70.0::DOUBLE)
        |             * (v - 70.0::DOUBLE)
        |           / (2.0::DOUBLE * 20.0::DOUBLE * 20.0::DOUBLE))
        |           / (20.0::DOUBLE * 2.5066282746310002::DOUBLE) p2
        |       FROM x),
        |r1 AS (SELECT v, p1 / (p1 + p2) r FROM e1),
        |m1 AS (SELECT count(*) n, sum(r) n1, sum(r * v) sx,
        |              sum(r * v * v) sxx,
        |              sum((1 - r) * v) tx, sum((1 - r) * v * v) txx
        |       FROM r1),
        |p1c AS (SELECT n, n1 / n pi,
        |               sx / n1 mu1,
        |               sqrt(sxx / n1 - (sx / n1) * (sx / n1)) s1,
        |               tx / (n - n1) mu2,
        |               sqrt(txx / (n - n1)
        |                    - (tx / (n - n1)) * (tx / (n - n1))) s2
        |        FROM m1),
        |e2 AS (SELECT x.v, p1c.n,
        |         p1c.pi * exp(-(x.v - p1c.mu1) * (x.v - p1c.mu1)
        |           / (2.0::DOUBLE * p1c.s1 * p1c.s1))
        |           / (p1c.s1 * 2.5066282746310002::DOUBLE) q1,
        |         (1 - p1c.pi) * exp(-(x.v - p1c.mu2) * (x.v - p1c.mu2)
        |           / (2.0::DOUBLE * p1c.s2 * p1c.s2))
        |           / (p1c.s2 * 2.5066282746310002::DOUBLE) q2
        |       FROM x, p1c),
        |r2c AS (SELECT v, n, q1 / (q1 + q2) r, ln(q1 + q2) ll FROM e2),
        |m2 AS (SELECT max(n) n, sum(r) n1, sum(r * v) sx,
        |              sum(r * v * v) sxx,
        |              sum((1 - r) * v) tx, sum((1 - r) * v * v) txx,
        |              sum(ll) ll
        |       FROM r2c)
        |SELECT round(n1 / n + 1e-9, 6) AS pi,
        |       round(sx / n1 + 1e-9, 4) AS mu1,
        |       round(sqrt(sxx / n1 - (sx / n1) * (sx / n1)) + 1e-9, 4)
        |         AS sigma1,
        |       round(tx / (n - n1) + 1e-9, 4) AS mu2,
        |       round(sqrt(txx / (n - n1)
        |                  - (tx / (n - n1)) * (tx / (n - n1))) + 1e-9, 4)
        |         AS sigma2,
        |       round(ll + 1e-9, 4) AS loglik,
        |       n::BIGINT AS n
        |FROM m2""") { c =>
      val sqrt2pi = 2.5066282746310002
      val x = c.events.filter(col("event_type") === "purchase")
        .select(col("value").as("v")).persist()
      def resp(pi: Double, mu1: Double, s1: Double, mu2: Double,
          s2: Double): (org.apache.spark.sql.Column,
          org.apache.spark.sql.Column) = {
        val v = col("v")
        val q1 = lit(pi) * exp(-(v - lit(mu1)) * (v - lit(mu1)) /
          (lit(2.0) * lit(s1) * lit(s1))) / (lit(s1) * lit(sqrt2pi))
        val q2 = lit(1 - pi) * exp(-(v - lit(mu2)) * (v - lit(mu2)) /
          (lit(2.0) * lit(s2) * lit(s2))) / (lit(s2) * lit(sqrt2pi))
        (q1, q2)
      }
      def mStep(q1: org.apache.spark.sql.Column,
          q2: org.apache.spark.sql.Column) = {
        val r = (q1 / (q1 + q2)).as("r")
        x.select(col("v"), r, log(q1 + q2).as("ll"))
          .agg(count(lit(1)).as("n"), sum(col("r")).as("n1"),
            sum(col("r") * col("v")).as("sx"),
            sum(col("r") * col("v") * col("v")).as("sxx"),
            sum((lit(1) - col("r")) * col("v")).as("tx"),
            sum((lit(1) - col("r")) * col("v") * col("v")).as("txx"),
            sum(col("ll")).as("ll")).collect().head
      }
      // iteration 1 from the fixed init; driver math mirrors p1c
      val (q1a, q2a) = resp(0.5, 30.0, 20.0, 70.0, 20.0)
      val m1 = mStep(q1a, q2a)
      val n = m1.getLong(0).toDouble
      val (n1a, sxa, sxxa, txa, txxa) = (m1.getDouble(1),
        m1.getDouble(2), m1.getDouble(3), m1.getDouble(4),
        m1.getDouble(5))
      val pi1 = n1a / n
      val mu1b = sxa / n1a
      val s1b = math.sqrt(sxxa / n1a - (sxa / n1a) * (sxa / n1a))
      val mu2b = txa / (n - n1a)
      val s2b = math.sqrt(txxa / (n - n1a) -
        (txa / (n - n1a)) * (txa / (n - n1a)))
      // iteration 2 with the fitted params; final stats + loglik
      val (q1b, q2b) = resp(pi1, mu1b, s1b, mu2b, s2b)
      val m2 = mStep(q1b, q2b)
      x.unpersist()
      val (n1, sx, sxx, tx, txx, ll) = (m2.getDouble(1), m2.getDouble(2),
        m2.getDouble(3), m2.getDouble(4), m2.getDouble(5),
        m2.getDouble(6))
      def r6d(y: Double): Double = BigDecimal(y + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r4d(y: Double): Double = BigDecimal(y + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = c.spark
      import s.implicits._
      Seq((r6d(n1 / n), r4d(sx / n1),
        r4d(math.sqrt(sxx / n1 - (sx / n1) * (sx / n1))),
        r4d(tx / (n - n1)),
        r4d(math.sqrt(txx / (n - n1) - (tx / (n - n1)) * (tx / (n - n1)))),
        r4d(ll), n.toLong))
        .toDF("pi", "mu1", "sigma1", "mu2", "sigma2", "loglik", "n")
    },

    // Two-round gradient-boosted regression (ml/Gbrt.scala): round 1
    // fits a variance-reduction stump on integer-cents labels (exact
    // long histogram sums); round 2 fits the RESIDUALS, whose cell
    // sums are recovered in closed form from (count, Σy, count-left)
    // integer aggregates — so both engines rank every candidate split
    // on bit-identical doubles and the whole boosted fit is oracle-
    // replicable. Output: both splits, leaf values, and the train
    // RMSE against the constant-model baseline.
    q("ml_gbdt",
      """WITH lab AS (SELECT l_quantity::DOUBLE q, l_discount::DOUBLE d,
        |                    CAST(round(l_extendedprice * 100) AS BIGINT) y
        |             FROM lineitem),
        |u1 AS (SELECT 'l_quantity' feature, q v, count(*) cnt, sum(y) sy
        |       FROM lab GROUP BY 2
        |       UNION ALL
        |       SELECT 'l_discount', d, count(*), sum(y)
        |       FROM lab GROUP BY 2),
        |c1 AS (SELECT feature, v,
        |              sum(cnt) OVER (PARTITION BY feature ORDER BY v) nl,
        |              sum(sy) OVER (PARTITION BY feature ORDER BY v) sl,
        |              sum(cnt) OVER (PARTITION BY feature) n,
        |              sum(sy) OVER (PARTITION BY feature) s
        |       FROM u1),
        |g1 AS (SELECT *, sl::DOUBLE * sl::DOUBLE / nl
        |              + (s - sl)::DOUBLE * (s - sl)::DOUBLE / (n - nl)
        |                score
        |       FROM c1 WHERE nl < n),
        |b1 AS (SELECT * FROM g1
        |       QUALIFY row_number() OVER (ORDER BY score DESC,
        |                                  feature, v) = 1),
        |m1 AS (SELECT feature f1, v t1, sl::DOUBLE / nl ml,
        |              (s - sl)::DOUBLE / (n - nl) mr FROM b1),
        |tg AS (SELECT q, d, y,
        |              CASE WHEN (CASE WHEN m1.f1 = 'l_quantity' THEN q
        |                         ELSE d END) <= m1.t1 THEN 1 ELSE 0
        |              END il
        |       FROM lab, m1),
        |u2 AS (SELECT 'l_quantity' feature, q v, count(*) cnt,
        |              sum(y) sy, sum(il) cl
        |       FROM tg GROUP BY 2
        |       UNION ALL
        |       SELECT 'l_discount', d, count(*), sum(y), sum(il)
        |       FROM tg GROUP BY 2),
        |c2 AS (SELECT feature, v,
        |              sum(cnt) OVER (PARTITION BY feature ORDER BY v) nl,
        |              sum(sy) OVER (PARTITION BY feature ORDER BY v) syl,
        |              sum(cl) OVER (PARTITION BY feature ORDER BY v) cll,
        |              sum(cnt) OVER (PARTITION BY feature) n,
        |              sum(sy) OVER (PARTITION BY feature) syt,
        |              sum(cl) OVER (PARTITION BY feature) clt
        |       FROM u2),
        |g2 AS (SELECT feature, v, nl, n,
        |              syl::DOUBLE - cll * m1.ml - (nl - cll) * m1.mr srl,
        |              syt::DOUBLE - clt * m1.ml - (n - clt) * m1.mr srt
        |       FROM c2, m1 WHERE nl < n),
        |g2s AS (SELECT *, srl * srl / nl
        |               + (srt - srl) * (srt - srl) / (n - nl) score
        |        FROM g2),
        |b2 AS (SELECT * FROM g2s
        |       QUALIFY row_number() OVER (ORDER BY score DESC,
        |                                  feature, v) = 1),
        |m2 AS (SELECT feature f2, v t2, srl / nl lv,
        |              (srt - srl) / (n - nl) rv FROM b2),
        |pr AS (SELECT tg.y,
        |              (CASE WHEN (CASE WHEN m1.f1 = 'l_quantity' THEN q
        |                          ELSE d END) <= m1.t1
        |                    THEN m1.ml ELSE m1.mr END)
        |              + (CASE WHEN (CASE WHEN m2.f2 = 'l_quantity' THEN q
        |                            ELSE d END) <= m2.t2
        |                      THEN m2.lv ELSE m2.rv END) p
        |       FROM tg, m1, m2),
        |e AS (SELECT sqrt(avg((y - p) * (y - p))) rmse, count(*) n
        |      FROM pr),
        |v0 AS (SELECT stddev_pop(y::DOUBLE) sd0 FROM lab)
        |SELECT m1.f1 AS feature1, round(m1.t1 + 1e-9, 4) AS threshold1,
        |       round(m1.ml + 1e-9, 4) AS left_mean,
        |       round(m1.mr + 1e-9, 4) AS right_mean,
        |       m2.f2 AS feature2, round(m2.t2 + 1e-9, 4) AS threshold2,
        |       round(m2.lv + 1e-9, 4) AS left_step,
        |       round(m2.rv + 1e-9, 4) AS right_step,
        |       round(v0.sd0 + 1e-9, 4) AS rmse_baseline,
        |       round(e.rmse + 1e-9, 4) AS rmse_boosted,
        |       e.n::BIGINT AS n
        |FROM m1, m2, e, v0""") { c =>
      val m = Gbrt.fitTwo(c.lineitem, Seq("l_quantity", "l_discount"),
        round(col("l_extendedprice") * 100))
      val lab = c.lineitem.select(
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_discount").cast("double").as("l_discount"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      val e = lab.select(col("y"), m.prediction.as("p"))
        .agg(sqrt(avg((col("y") - col("p")) * (col("y") - col("p"))))
          .as("rmse"), count(lit(1)).as("n"),
          stddev_pop(col("y").cast("double")).as("sd0"))
        .collect().head
      def r4d(x: Double): Double = BigDecimal(x + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = c.spark
      import s.implicits._
      Seq((m.r1.feature, r4d(m.r1.threshold), r4d(m.r1.leftValue),
        r4d(m.r1.rightValue), m.r2.feature, r4d(m.r2.threshold),
        r4d(m.r2.leftValue), r4d(m.r2.rightValue),
        r4d(e.getDouble(2)), r4d(e.getDouble(0)), e.getLong(1)))
        .toDF("feature1", "threshold1", "left_mean", "right_mean",
          "feature2", "threshold2", "left_step", "right_step",
          "rmse_baseline", "rmse_boosted", "n")
    },

    // Cohen's kappa — chance-corrected inter-annotator agreement, the
    // label-quality gate a training-data pipeline runs over two
    // labelers (here: two deterministic rule "raters" on the same
    // rows) before trusting their annotations; beside ml_metrics_cls'
    // accuracy family, which ignores chance agreement. κ =
    // (N·(n11+n00) − Σ marginal products) / (N² − Σ marginal
    // products) — ONE ratio of exact integers from a single
    // aggregation, so the statistic is engine-exact to the last bit
    // before the final rounding.
    q("ml_cohen_kappa",
      """WITH l AS (SELECT
        |    CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END a,
        |    CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END b
        |  FROM lineitem),
        |s AS (SELECT count(*)::BIGINT n,
        |        sum(CASE WHEN a=1 AND b=1 THEN 1 ELSE 0 END)::BIGINT n11,
        |        sum(CASE WHEN a=1 AND b=0 THEN 1 ELSE 0 END)::BIGINT n10,
        |        sum(CASE WHEN a=0 AND b=1 THEN 1 ELSE 0 END)::BIGINT n01,
        |        sum(CASE WHEN a=0 AND b=0 THEN 1 ELSE 0 END)::BIGINT n00
        |      FROM l)
        |SELECT n11, n10, n01, n00,
        |  round((n11 + n00) * 1.0 / n + 1e-9, 6) AS po,
        |  round(((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) * 1.0
        |        / (n * n) + 1e-9, 6) AS pe,
        |  round((n * (n11+n00)
        |         - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))) * 1.0
        |        / (n * n
        |           - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
        |        + 1e-9, 6) AS kappa
        |FROM s""") { c =>
      val l = c.lineitem.select(
        when(col("l_quantity") > 25, 1).otherwise(0).as("a"),
        when(col("l_extendedprice") > 30000, 1).otherwise(0).as("b"))
      val s = l.agg(count(lit(1)).as("n"),
        sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
          .as("n11"),
        sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L))
          .as("n00"))
      val marg = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
        (col("n01") + col("n00")) * (col("n10") + col("n00"))
      s.select(col("n11"), col("n10"), col("n01"), col("n00"),
        r6((col("n11") + col("n00")) * lit(1.0) / col("n")).as("po"),
        r6(marg * lit(1.0) / (col("n") * col("n"))).as("pe"),
        r6((col("n") * (col("n11") + col("n00")) - marg) * lit(1.0) /
          (col("n") * col("n") - marg)).as("kappa"))
    },

    // Pinball (quantile) loss — the eval metric for QUANTILE
    // forecasts (Koenker & Bassett 1978 check loss; what the conformal
    // and quantile-bins entries predict, this SCORES): fit per-group
    // τ-quantiles on the md5-bucket TRAIN split, evaluate
    // L_τ(y,q) = τ·(y−q)⁺ + (1−τ)·(q−y)⁺ on the held-out TEST rows.
    // Everything stays in exact integers at any corpus scale: the
    // quantile is the TYPE-1 (no interpolation) order statistic read
    // from the (group, cents) HISTOGRAM rank — the grouped-median
    // device, never a per-row sort — and with DYADIC τ ∈ {1/2, 3/4}
    // the scaled losses 2·L_½ = |y−q| and 4·L_¾ = 3(y−q)⁺ + (q−y)⁺
    // are plain integer sums; the single division per group happens at
    // read time. A lower test loss at τ=0.75 on the upper tail than
    // the symmetric τ=0.5 median loss is the property the metric
    // exists to expose.
    q("ml_pinball_loss",
      """WITH b AS (SELECT l_returnflag flag,
        |    CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT) c,
        |    ('0x' || substr(md5('42|' || l_orderkey || '|'
        |                        || l_linenumber), 1, 8))::BIGINT
        |      % 1000 bk
        |  FROM lineitem),
        |h AS (SELECT flag, c, count(*) cnt FROM b WHERE bk < 700
        |      GROUP BY 1, 2),
        |hc AS (SELECT flag, c,
        |         sum(cnt) OVER (PARTITION BY flag ORDER BY c) cum,
        |         sum(cnt) OVER (PARTITION BY flag) n
        |       FROM h),
        |qs AS (SELECT flag,
        |         min(CASE WHEN cum >= ceil(0.5 * n - 1e-9)
        |                  THEN c END) q50,
        |         min(CASE WHEN cum >= ceil(0.75 * n - 1e-9)
        |                  THEN c END) q75
        |       FROM hc GROUP BY 1),
        |l AS (SELECT b.flag, count(*)::BIGINT n_test, max(q50) q50,
        |        max(q75) q75,
        |        sum(abs(c - q50))::BIGINT pl50x2,
        |        sum(CASE WHEN c >= q75 THEN 3 * (c - q75)
        |                 ELSE q75 - c END)::BIGINT pl75x4
        |      FROM b JOIN qs ON b.flag = qs.flag WHERE bk >= 700
        |      GROUP BY 1)
        |SELECT flag, n_test,
        |       round(q50 / 100.0 + 1e-9, 2) AS q50_train,
        |       round(q75 / 100.0 + 1e-9, 2) AS q75_train,
        |       round(pl50x2 / 2.0 / n_test / 100 + 1e-9, 6)
        |         AS pinball_50,
        |       round(pl75x4 / 4.0 / n_test / 100 + 1e-9, 6)
        |         AS pinball_75
        |FROM l ORDER BY flag""") { c =>
      import org.apache.spark.sql.expressions.Window
      val b = graft.ml.Splits.withSplitColumn(
          c.lineitem, keys = Seq("l_orderkey", "l_linenumber"),
          testSizes = Seq(0.7, 0.3), numBuckets = 1000, seed = 42L,
          portable = true)
        .select(col("l_returnflag").as("flag"),
          expr("CAST(round(l_extendedprice * 100 + 1e-9) AS BIGINT)")
            .as("c"),
          col("split_idx"))
      val h = b.filter(col("split_idx") === 0)
        .groupBy("flag", "c").agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy("flag")
        .orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
      val hc = h.select(col("flag"), col("c"),
        sum(col("cnt")).over(wc).as("cum"),
        sum(col("cnt")).over(Window.partitionBy("flag")).as("n"))
      val qs = hc.groupBy("flag").agg(
        min(when(col("cum") >= ceil(lit(0.5) * col("n") - lit(1e-9)),
          col("c"))).as("q50"),
        min(when(col("cum") >= ceil(lit(0.75) * col("n") - lit(1e-9)),
          col("c"))).as("q75"))
      b.filter(col("split_idx") === 1)
        .join(broadcast(qs), Seq("flag"))
        .groupBy("flag").agg(
          count(lit(1)).as("n_test"),
          max(col("q50")).as("q50"), max(col("q75")).as("q75"),
          sum(abs(col("c") - col("q50"))).as("pl50x2"),
          sum(when(col("c") >= col("q75"), lit(3) * (col("c") - col("q75")))
            .otherwise(col("q75") - col("c"))).as("pl75x4"))
        .select(col("flag"), col("n_test"),
          r2(col("q50") / 100.0).as("q50_train"),
          r2(col("q75") / 100.0).as("q75_train"),
          r6(col("pl50x2") / 2.0 / col("n_test") / 100).as("pinball_50"),
          r6(col("pl75x4") / 4.0 / col("n_test") / 100).as("pinball_75"))
        .orderBy("flag")
    },

    // Multinomial naive Bayes text classifier (the McCallum & Nigam
    // 1998 event model) — train on the md5-bucket split, predict
    // document language from token counts, report the test confusion
    // matrix. Laplace-smoothed log-likelihoods
    // ln((tc(c,t)+1)/(T_c+V)) are evaluated once per (class, token);
    // per-document class scores are ln-term sums folded in PINNED
    // token order (the text_lm stance — aggregate over the sorted
    // struct list ≡ DuckDB list_reduce ORDER BY), and the argmax
    // compares the ROUNDED score with a class-name tie-break, so the
    // prediction is engine- and partition-exact. Out-of-vocabulary
    // test tokens are dropped (the standard convention). Scale shape:
    // one tokenize Generate, two hash aggregations (class-token
    // counts, per-doc counts), a k-class broadcast grid per test doc
    // (k = |lang| domain, PlanAudit-allowlisted), zero corpus
    // self-joins.
    q("ml_naive_bayes",
      """WITH d AS (SELECT doc_id, lang, text,
        |    CASE WHEN ('0x' || substr(md5('42|' || doc_id), 1, 8))
        |              ::BIGINT % 1000 < 700
        |         THEN 0 ELSE 1 END si
        |  FROM documents),
        |tok0 AS (SELECT doc_id, lang, si,
        |           unnest(string_split_regex(lower(trim(text)),
        |                                     '\s+')) tok
        |         FROM d),
        |tok2 AS (SELECT * FROM tok0 WHERE tok <> ''),
        |tc AS (SELECT lang cl, tok, count(*)::BIGINT tc FROM tok2
        |       WHERE si = 0 GROUP BY 1, 2),
        |tcl AS (SELECT cl, sum(tc)::BIGINT tcl FROM tc GROUP BY 1),
        |vv AS (SELECT count(DISTINCT tok)::BIGINT v FROM tok2
        |       WHERE si = 0),
        |pri AS (SELECT lang cl, count(*)::BIGINT ndc FROM d
        |        WHERE si = 0 GROUP BY 1),
        |ntr AS (SELECT count(*)::BIGINT ntr FROM d WHERE si = 0),
        |cls AS (SELECT pri.cl, pri.ndc, tcl.tcl, vv.v, ntr.ntr
        |        FROM pri JOIN tcl ON pri.cl = tcl.cl, vv, ntr),
        |vocab AS (SELECT DISTINCT tok FROM tc),
        |dt AS (SELECT t.doc_id, t.lang true_lang, t.tok,
        |         count(*)::BIGINT cnt
        |       FROM tok2 t JOIN vocab USING (tok)
        |       WHERE si = 1 GROUP BY 1, 2, 3),
        |terms AS (SELECT dt.doc_id, cls.cl, dt.tok,
        |            dt.cnt * ln((coalesce(tc.tc, 0) + 1.0)
        |                        / (cls.tcl + cls.v)) term
        |          FROM dt CROSS JOIN cls
        |          LEFT JOIN tc ON tc.cl = cls.cl AND tc.tok = dt.tok),
        |ts AS (SELECT doc_id, cl,
        |         list_reduce(list(term ORDER BY tok),
        |                     (a, x) -> a + x) s
        |       FROM terms GROUP BY 1, 2),
        |gd AS (SELECT doc_id, lang true_lang FROM d WHERE si = 1),
        |sc AS (SELECT gd.doc_id, gd.true_lang, cls.cl,
        |         ln(cls.ndc * 1.0 / cls.ntr)
        |           + coalesce(ts.s, 0.0) score
        |       FROM gd CROSS JOIN cls
        |       LEFT JOIN ts ON ts.doc_id = gd.doc_id
        |                   AND ts.cl = cls.cl),
        |pr AS (SELECT doc_id, true_lang, cl,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY round(score + 1e-9, 6) DESC, cl) rn
        |       FROM sc)
        |SELECT true_lang, cl AS pred_lang, count(*)::BIGINT AS n
        |FROM pr WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
      import org.apache.spark.sql.expressions.Window
      val d = graft.ml.Splits.withSplitColumn(
          c.documents, keys = Seq("doc_id"), testSizes = Seq(0.7, 0.3),
          numBuckets = 1000, seed = 42L, portable = true)
        .select(col("doc_id"), col("lang"), col("text"),
          col("split_idx").as("si"))
      val tok2 = d.select(col("doc_id"), col("lang"), col("si"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val tc = tok2.filter(col("si") === 0)
        .groupBy(col("lang").as("cl"), col("tok"))
        .agg(count(lit(1)).as("tc"))
      val tcl = tc.groupBy("cl").agg(sum(col("tc")).as("tcl"))
      val vv = tok2.filter(col("si") === 0)
        .agg(countDistinct(col("tok")).as("v"))
      val pri = d.filter(col("si") === 0)
        .groupBy(col("lang").as("cl")).agg(count(lit(1)).as("ndc"))
      val ntr = d.filter(col("si") === 0).agg(count(lit(1)).as("ntr"))
      // k-row class model (k = lang domain) — broadcast grid below
      val cls = pri.join(tcl, Seq("cl"))
        .crossJoin(broadcast(vv)).crossJoin(broadcast(ntr))
      val vocab = tc.select("tok").distinct()
      val dt = tok2.filter(col("si") === 1)
        .groupBy(col("doc_id"), col("lang").as("true_lang"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .join(vocab, Seq("tok")) // OOV test tokens dropped
      val term = col("cnt") *
        log((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
          (col("tcl") + col("v")))
      val ts = dt.crossJoin(broadcast(cls))
        .join(tc, Seq("cl", "tok"), "left")
        .groupBy("doc_id", "cl")
        .agg(aggregate(array_sort(collect_list(struct(col("tok"),
            term.as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("s"))
      val gd = d.filter(col("si") === 1)
        .select(col("doc_id"), col("lang").as("true_lang"))
      val sc = gd.crossJoin(broadcast(cls))
        .join(ts, Seq("doc_id", "cl"), "left")
        .select(col("doc_id"), col("true_lang"), col("cl"),
          (log(col("ndc") * lit(1.0) / col("ntr")) +
            coalesce(col("s"), lit(0.0))).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(r6(col("score")).desc, col("cl").asc)
      sc.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("true_lang"), col("cl").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_lang", "pred_lang")
    },

    // Platt scaling (Platt 1999 — sklearn CalibratedClassifierCV's
    // 'sigmoid' method): fit p = sigma(A*s + B) on a raw classifier
    // margin by 3 pinned gradient-descent iterations (eta = 2, init
    // A = B = 0 — the 1-D sibling of the ml_pipeline_logreg device,
    // whose oracle unrolls the loop as chained CTEs), then report the
    // 10-bin RELIABILITY TABLE the calibration literature grades on:
    // per calibrated-probability decile, pair count, empirical
    // positive rate, and mean calibrated probability. The margin is
    // the linear price score (l_extendedprice - 53000)/30000 — an
    // uncalibrated "regressor output" whose sigmoid map the fit must
    // recover; labels are the usual price > 30000 cut. Determinism: iteration-1 sums are
    // lattice-bounded like logreg; per-row calibrated probabilities
    // QUANTIZE to integer micro-units before any aggregation, so bin
    // membership, positive counts, and mean numerators are exact
    // BIGINT arithmetic (the r8 quantize-then-integer-stats device) —
    // coefficient noise from the two transcendental gradient rounds
    // sits ~1e-15, absorbed by the r6 nudge exactly as in logreg.
    // Scale shape: three full-scan aggregations (one per GD round) +
    // one 10-row hash aggregation — no windows, no joins beyond
    // 1-row broadcast weight states.
    q("ml_platt_scaling",
      """WITH z AS (SELECT (l_extendedprice - 53000) / 30000 s,
        |    CASE WHEN l_extendedprice > 30000 THEN 1.0 ELSE 0.0 END y
        |  FROM lineitem),
        |n_ AS (SELECT count(*)::DOUBLE n FROM z),
        |g1 AS (SELECT sum((0.5 - y) * s) ga, sum(0.5 - y) gb FROM z),
        |w1 AS (SELECT -2.0 * ga / n a, -2.0 * gb / n b FROM g1, n_),
        |g2 AS (SELECT sum((1/(1+exp(-(w.a*s + w.b))) - y) * s) ga,
        |              sum(1/(1+exp(-(w.a*s + w.b))) - y) gb
        |       FROM z, w1 w),
        |w2 AS (SELECT w.a - 2.0 * g.ga / n a, w.b - 2.0 * g.gb / n b
        |       FROM w1 w, g2 g, n_),
        |g3 AS (SELECT sum((1/(1+exp(-(w.a*s + w.b))) - y) * s) ga,
        |              sum(1/(1+exp(-(w.a*s + w.b))) - y) gb
        |       FROM z, w2 w),
        |w3 AS (SELECT w.a - 2.0 * g.ga / n a, w.b - 2.0 * g.gb / n b
        |       FROM w2 w, g3 g, n_),
        |pm AS (SELECT CAST(round(1/(1+exp(-(w.a*s + w.b))) * 1e6
        |                         + 1e-9) AS BIGINT) p,
        |              y::BIGINT yi, round(w.a + 1e-9, 6) ca,
        |              round(w.b + 1e-9, 6) cb
        |       FROM z, w3 w)
        |SELECT least(p // 100000, 9)::INT AS bin, count(*)::BIGINT AS n,
        |  sum(yi)::BIGINT AS n_pos,
        |  round(sum(yi) / count(*)::DOUBLE + 1e-9, 6) AS frac_pos,
        |  round(sum(p) / count(*)::DOUBLE / 1e6 + 1e-9, 6) AS mean_cal,
        |  max(ca) AS coef_a, max(cb) AS coef_b
        |FROM pm GROUP BY 1 ORDER BY bin""") { c =>
      val z = c.lineitem.select(
        ((col("l_extendedprice") - 53000) / 30000).as("s"),
        (col("l_extendedprice") > 30000).cast("double").as("y"))
        .persist()
      val n = z.count().toDouble
      def sig(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        lit(1.0) / (lit(1.0) + exp(-(a * col("s") + b)))
      val w1 = z.agg(sum((lit(0.5) - col("y")) * col("s")).as("ga"),
          sum(lit(0.5) - col("y")).as("gb"))
        .select((lit(-2.0) * col("ga") / n).as("a"),
          (lit(-2.0) * col("gb") / n).as("b"))
      def step(w: org.apache.spark.sql.DataFrame) =
        z.crossJoin(broadcast(w))
          .agg(sum((sig(col("a"), col("b")) - col("y")) * col("s")).as("ga"),
            sum(sig(col("a"), col("b")) - col("y")).as("gb"),
            first(col("a")).as("a0"), first(col("b")).as("b0"))
          .select((col("a0") - lit(2.0) * col("ga") / n).as("a"),
            (col("b0") - lit(2.0) * col("gb") / n).as("b"))
      val w3 = step(step(w1))
      val pm = z.crossJoin(broadcast(w3))
        .select(round(sig(col("a"), col("b")) * 1e6 + lit(1e-9))
            .cast("long").as("p"),
          col("y").cast("long").as("yi"),
          r6(col("a")).as("ca"), r6(col("b")).as("cb"))
      pm.groupBy(expr("least(p div 100000, 9)").cast("int").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("yi")).as("n_pos"),
          r6(sum(col("yi")) / count(lit(1)).cast("double")).as("frac_pos"),
          r6(sum(col("p")) / count(lit(1)).cast("double") / 1e6)
            .as("mean_cal"),
          max(col("ca")).as("coef_a"), max(col("cb")).as("coef_b"))
        .orderBy("bin")
    },

    // Weight-of-Evidence / Information-Value binning (the credit-
    // scoring standard behind scorecard feature selection, Siddiqi
    // 2006): per quantity-quintile bin, WoE = ln(%good / %bad) with
    // the standard +0.5 continuity correction on both counts (so a
    // PURE bin — zero goods or zero bads — yields a large finite WoE
    // instead of ln(0)/ln(inf), where Spark would return a silent
    // NULL while DuckDB raises; the correction makes the engines
    // agree on EVERY input, not just mixed bins) and the
    // IV contribution (%good - %bad) * WoE; total IV is the classic
    // keep/drop feature gate (< 0.02 useless, > 0.3 strong).
    // Determinism: bin counts are exact BIGINTs, each WoE is one ln()
    // of a ratio built from +0.5-shifted counts (exact doubles below
    // 2^52, identical on both engines), and the total IV folds the 10
    // contributions in pinned bin order. Scale shape: ONE corpus hash aggregation to 10
    // bins; everything after is 10-row arithmetic with 1-row
    // broadcast totals.
    q("ml_woe_iv",
      """WITH d AS (SELECT (l_quantity::BIGINT - 1) // 5 bin,
        |    CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END y
        |  FROM lineitem),
        |bb AS (SELECT bin, count(*)::BIGINT n, sum(y)::BIGINT g
        |       FROM d GROUP BY 1),
        |b2 AS (SELECT bin, n, g, n - g bd FROM bb),
        |t AS (SELECT sum(g)::BIGINT gt, sum(bd)::BIGINT bt FROM b2),
        |w AS (SELECT bin, n, g, bd, gt, bt,
        |        ln(((g + 0.5) * bt) / ((bd + 0.5) * gt)) wv,
        |        g * 1.0 / gt - bd * 1.0 / bt dp FROM b2, t),
        |w2 AS (SELECT bin, n, g n_good, bd n_bad, wv, dp * wv ivc
        |       FROM w),
        |iv AS (SELECT list_reduce(list(ivc ORDER BY bin),
        |         (a, x) -> a + x) iv FROM w2)
        |SELECT bin, n, n_good, n_bad, round(wv + 1e-9, 6) AS woe,
        |  round(ivc + 1e-9, 6) AS iv_contrib,
        |  round(iv.iv + 1e-9, 6) AS iv
        |FROM w2, iv ORDER BY bin""") { c =>
      val d = c.lineitem.select(
        expr("(CAST(l_quantity AS BIGINT) - 1) div 5").as("bin"),
        (col("l_extendedprice") > 30000).cast("long").as("y"))
      val b2 = d.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("g"))
        .withColumn("bd", col("n") - col("g"))
      val t = b2.agg(sum(col("g")).as("gt"), sum(col("bd")).as("bt"))
      val w2 = b2.crossJoin(broadcast(t))
        .select(col("bin"), col("n"), col("g").as("n_good"),
          col("bd").as("n_bad"),
          log(((col("g") + 0.5) * col("bt")) /
              ((col("bd") + 0.5) * col("gt")))
            .as("wv"),
          (col("g") * 1.0 / col("gt") - col("bd") * 1.0 / col("bt"))
            .as("dp"))
        .withColumn("ivc", col("dp") * col("wv"))
      val iv = w2.agg(aggregate(array_sort(collect_list(struct(
          col("bin"), col("ivc").as("tm")))),
        lit(0.0), (a, x) => a + x.getField("tm")).as("iv"))
      w2.crossJoin(broadcast(iv))
        .select(col("bin"), col("n"), col("n_good"), col("n_bad"),
          r6(col("wv")).as("woe"), r6(col("ivc")).as("iv_contrib"),
          r6(col("iv")).as("iv"))
        .orderBy("bin")
    },
  )
}
