package graft.queries

import graft.QueryDef
import graft.ops.AsofJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.1 join surface: JoinChain/JoinLink with kinds
  * inner/left/right/outer/cross/semi/anti/any_inner/any_left/positional
  * (vendor relations.py:202-259, API types/relations.py:2853) and
  * asof_join (types/relations.py:3034-3077) + subqueries
  * (operations/subqueries.py: Exists :28, Scalar :36, In :60).
  *
  * Scale notes: dimension joins (nation/region/supplier) are broadcast —
  * Spark auto-broadcasts under the 10 MB threshold and we assert the
  * intent with `broadcast()` so the plan survives statistics drift at
  * 100 TB. Fact-fact joins (lineitem⋈orders) shuffle on the join key;
  * AQE handles skew. The as-of join is the one-shuffle union-sort
  * formulation in [[graft.ops.AsofJoin]].
  */
object JoinQueries {

  val defs: Seq[QueryDef] = Seq(

    // Inner equi-join chain, TPC-H Q3 shape (JoinChain relations.py:218).
    q("join_inner",
      """SELECT l_orderkey, o_orderdate,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 100""", bench = true) { c =>
      c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(100)
    },

    // Left outer join with unmatched rows surviving (how="left" :202).
    q("join_left",
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 400000
        |ORDER BY c_custkey, o_orderkey NULLS FIRST LIMIT 2000""") { c =>
      c.customer.join(c.orders,
          col("c_custkey") === col("o_custkey") &&
            col("o_totalprice") > 400000, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
        .limit(2000)
    },

    // Full outer join on deliberately partial key overlap (how="outer").
    q("join_full_outer",
      """WITH a AS (SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey < 15),
        |     b AS (SELECT n_nationkey AS k, n_regionkey FROM nation WHERE n_nationkey >= 10)
        |SELECT coalesce(a.k, b.k) AS k, a.n_name, b.n_regionkey
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |ORDER BY k""") { c =>
      val a = c.nation.filter(col("n_nationkey") < 15)
        .select(col("n_nationkey").as("k"), col("n_name"))
      val b = c.nation.filter(col("n_nationkey") >= 10)
        .select(col("n_nationkey").as("ka"), col("n_regionkey"))
      a.join(b, col("k") === col("ka"), "full")
        .select(coalesce(col("k"), col("ka")).as("k"), col("n_name"),
          col("n_regionkey"))
        .orderBy("k")
    },

    // Semi join — EXISTS (subqueries.py:28; how="semi").
    q("join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_totalprice > 450000)
        |ORDER BY c_custkey""") { c =>
      c.customer.join(
          c.orders.filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Anti join — NOT EXISTS (how="anti").
    q("join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > 450000)
        |ORDER BY c_custkey""") { c =>
      c.customer.join(
          c.orders.filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Cross join (types/relations.py:3078) — dims only; never facts.
    q("join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""") { c =>
      c.region.crossJoin(c.nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // any_inner rewrite (relations.py:212): dedup right on key, then inner
    // join — "match if any right row matches" without row multiplication.
    q("join_any_inner",
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier
        |JOIN (SELECT DISTINCT n_nationkey FROM nation WHERE n_regionkey <= 2) n
        |  ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""") { c =>
      val anyRight = c.nation.filter(col("n_regionkey") <= 2)
        .select("n_nationkey").distinct()
      c.supplier.join(broadcast(anyRight),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    },

    // Positional join (relations.py:216) — zip by row position via
    // row_number over an explicit total order (position is only
    // well-defined under an order at scale).
    q("join_positional",
      """WITH a AS (SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS rn
        |           FROM nation),
        |     b AS (SELECT s_name, row_number() OVER (ORDER BY s_suppkey) AS rn
        |           FROM supplier WHERE s_suppkey <= 25)
        |SELECT a.rn, a.n_name, b.s_name
        |FROM a JOIN b ON a.rn = b.rn
        |ORDER BY a.rn""", bench = true) { c =>
      // scale-safe global row numbers (range exchange + per-partition
      // offsets, graft.ops.Positional) — NOT an unpartitioned window,
      // which would single-reduce a fact table (r1 weak flag)
      val a = graft.ops.Positional.withRowNumber(
          c.nation.select("n_name", "n_nationkey"),
          Seq(col("n_nationkey")))
        .select(col("n_name"), col("rn"))
      val b = graft.ops.Positional.withRowNumber(
          c.supplier.filter(col("s_suppkey") <= 25)
            .select("s_name", "s_suppkey"),
          Seq(col("s_suppkey")))
        .select(col("s_name"), col("rn"))
      a.join(b, "rn").select(col("rn"), col("n_name"), col("s_name"))
        .orderBy("rn")
    },

    // As-of join (types/relations.py:3034): for each click, the user's
    // most recent signup at-or-before the click. DuckDB has native ASOF.
    q("join_asof",
      """SELECT c.event_id, c.user_id, round(c.value + 1e-9, 2) AS click_value,
        |       round(s.value + 1e-9, 2) AS signup_value,
        |       CAST(s.ts AS TIMESTAMP) AS matched_time
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON c.user_id = s.user_id AND c.ts >= s.ts
        |ORDER BY c.event_id""", bench = true) { c =>
      val clicks = c.events.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          r2(col("value")).as("click_value"))
      val signups = c.events.filter(col("event_type") === "signup")
      AsofJoin.backward(
          clicks, signups,
          on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("value" -> "signup_value"))
        .select(col("event_id"), col("user_id"), col("click_value"),
          r2(col("signup_value")).as("signup_value"), col("matched_time"))
        .orderBy("event_id")
    },

    // As-of join with tolerance (`tolerance=` kwarg :3077): only matches
    // within 1 hour count.
    q("join_asof_tolerance",
      """SELECT event_id, user_id,
        |       CASE WHEN c_ts - s_ts <= INTERVAL 1 HOUR THEN round(s_value + 1e-9, 2) END AS signup_value
        |FROM (
        |  SELECT c.event_id AS event_id, c.user_id AS user_id,
        |         c.ts AS c_ts, s.ts AS s_ts, s.value AS s_value
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |    ON c.user_id = s.user_id AND c.ts >= s.ts)
        |ORDER BY event_id""") { c =>
      val clicks = c.events.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = c.events.filter(col("event_type") === "signup")
      AsofJoin.backward(
          clicks, signups,
          on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("value" -> "signup_value"),
          tolerance = Some(expr("INTERVAL 1 HOUR")))
        .select(col("event_id"), col("user_id"),
          r2(col("signup_value")).as("signup_value"))
        .orderBy("event_id")
    },

    // IN-subquery (subqueries.py:60) → semi join on the subquery result.
    q("join_in_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""") { c =>
      c.orders.join(
          c.customer.filter(col("c_acctbal") > 9000).select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Scalar subquery (subqueries.py:36) → cross join of a 1-row aggregate
    // (Catalyst plans it as a broadcast nested loop over one row).
    q("join_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > round(1.8 * (SELECT avg(o_totalprice) FROM orders), 2)
        |ORDER BY o_orderkey""") { c =>
      // Threshold rounded to the data's cent lattice on BOTH engines so a
      // row a few ulps from the cut cannot flake the hash (ADVICE r1).
      val avgPrice = c.orders
        .agg(round(lit(1.8) * avg(col("o_totalprice")), 2).as("__thr"))
      c.orders.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("__thr"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Temporal timeline alignment (the bitemporal "align two versioned
    // dimensions" join behind SCD reporting): two per-customer validity
    // timelines — priority from even orders, status from odd orders,
    // each interval running to the next change — intersect into the
    // piecewise segments where BOTH attributes are constant. The join
    // is KEYED (customer equi-join + residual overlap predicate), so
    // unlike the unkeyed point-in-interval case no bucketization is
    // needed: per-key interval counts bound the fan-out. Zero-length
    // intervals (same-day changes) drop via strict overlap, on both
    // engines identically.
    q("join_temporal_align",
      """WITH a AS (SELECT o_custkey k, o_orderpriority attr,
        |                  o_orderdate s,
        |                  coalesce(lead(o_orderdate) OVER (
        |                    PARTITION BY o_custkey
        |                    ORDER BY o_orderdate, o_orderkey),
        |                    TIMESTAMP '2099-01-01') e
        |           FROM orders WHERE o_orderkey % 2 = 0),
        |b AS (SELECT o_custkey k, o_orderstatus attr, o_orderdate s,
        |             coalesce(lead(o_orderdate) OVER (
        |               PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey),
        |               TIMESTAMP '2099-01-01') e
        |      FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT a.k AS custkey, greatest(a.s, b.s) AS seg_start,
        |       least(a.e, b.e) AS seg_end,
        |       a.attr AS priority, b.attr AS status
        |FROM a JOIN b ON a.k = b.k AND a.s < b.e AND b.s < a.e
        |WHERE a.k < 150
        |ORDER BY custkey, seg_start, seg_end""") { c =>
      val horizon = to_timestamp(lit("2099-01-01"))
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      def timeline(parity: Int, attr: String) =
        c.orders.filter(col("o_orderkey") % 2 === parity)
          .withColumn("e",
            coalesce(lead(col("o_orderdate"), 1).over(w), horizon))
          .select(col("o_custkey").as("k"), col(attr).as("attr"),
            col("o_orderdate").as("s"), col("e"))
      val a = timeline(0, "o_orderpriority").as("a")
      val b = timeline(1, "o_orderstatus").as("b")
      a.join(b, col("a.k") === col("b.k") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e"))
        .filter(col("a.k") < 150)
        .select(col("a.k").as("custkey"),
          greatest(col("a.s"), col("b.s")).as("seg_start"),
          least(col("a.e"), col("b.e")).as("seg_end"),
          col("a.attr").as("priority"), col("b.attr").as("status"))
        .orderBy("custkey", "seg_start", "seg_end")
    },

    // Salted skew join: half of lineitem is remapped onto ONE supplier
    // key (the hot-key pathology that strands a reduce task at 100 TB).
    // The fix: salt the big side with a 16-way hash of its row id and
    // replicate the SMALL side once per salt, so the hot key's rows
    // spread over 16 reducers while the join result stays row-identical
    // — the oracle is the PLAIN unsalted join, so the equality IS the
    // correctness proof of the rewrite. (AQE's skew handling covers
    // sort-merge cases; explicit salting is the portable form that
    // also works under hash joins and in streaming.)
    q("join_salted",
      """WITH big AS (SELECT CASE WHEN l_orderkey % 10 < 5 THEN 1
        |                         ELSE l_suppkey END k, l_quantity
        |             FROM lineitem),
        |j AS (SELECT s_name, big.l_quantity FROM big
        |      JOIN supplier ON big.k = s_suppkey)
        |SELECT s_name, count(*)::BIGINT AS n,
        |       round(sum(l_quantity) + 1e-9, 2) AS qty
        |FROM j GROUP BY 1 ORDER BY s_name""") { c =>
      val salts = 16
      val big = c.lineitem.select(
          when(col("l_orderkey") % 10 < 5, 1)
            .otherwise(col("l_suppkey")).as("k"),
          col("l_quantity"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(salts)).as("salt"))
      val small = c.supplier
        .select(col("s_suppkey").as("k"), col("s_name"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
        .withColumn("salt", col("salt").cast("long"))
      big.join(small, Seq("k", "salt"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
        .orderBy("s_name")
    },
  )
}
