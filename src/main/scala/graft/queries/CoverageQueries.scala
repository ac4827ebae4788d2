package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Closes the remaining "implemented but untested" rows of the r1
  * operator table: right join, any_left join, Union(distinct),
  * CountDistinctStar, and interval-equivalent RANGE window frames.
  */
object CoverageQueries {

  val defs: Seq[QueryDef] = Seq(

    // Distributed PageRank (3 pinned rounds, damping 0.85) over the
    // customer→supplier bipartite graph — iterative graph analytics
    // beyond connected components. Every round is two node-keyed
    // equi-joins + an aggregation; dangling mass (suppliers have no
    // out-edges) is a 1-row broadcast scalar; per-round
    // localCheckpoint cuts lineage. Oracle unrolls the rounds as
    // chained CTEs; output is rank NORMALIZED by node count (≈1.0
    // scale) so the r6 grain sits 6 orders above summation noise.
    q("graph_pagerank",
      """WITH e AS (SELECT DISTINCT 'c' || o_custkey src, 's' || l_suppkey dst
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) n FROM nodes),
        |od AS (SELECT src, count(*) outdeg FROM e GROUP BY 1),
        |r0 AS (SELECT node, 1.0::DOUBLE / nn.n rank FROM nodes, nn),
        |d1 AS (SELECT coalesce(sum(rank), 0)::DOUBLE dm FROM r0
        |       LEFT JOIN od ON r0.node = od.src WHERE od.src IS NULL),
        |c1 AS (SELECT dst node, sum(r.rank / od.outdeg) contrib FROM e
        |       JOIN r0 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY 1),
        |r1 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85::DOUBLE *
        |         (coalesce(c1.contrib, 0)::DOUBLE + d1.dm / nn.n) rank
        |       FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, nn, d1),
        |d2 AS (SELECT coalesce(sum(rank), 0)::DOUBLE dm FROM r1
        |       LEFT JOIN od ON r1.node = od.src WHERE od.src IS NULL),
        |c2 AS (SELECT dst node, sum(r.rank / od.outdeg) contrib FROM e
        |       JOIN r1 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY 1),
        |r2 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85::DOUBLE *
        |         (coalesce(c2.contrib, 0)::DOUBLE + d2.dm / nn.n) rank
        |       FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, nn, d2),
        |d3 AS (SELECT coalesce(sum(rank), 0)::DOUBLE dm FROM r2
        |       LEFT JOIN od ON r2.node = od.src WHERE od.src IS NULL),
        |c3 AS (SELECT dst node, sum(r.rank / od.outdeg) contrib FROM e
        |       JOIN r2 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY 1),
        |r3 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85::DOUBLE *
        |         (coalesce(c3.contrib, 0)::DOUBLE + d3.dm / nn.n) rank
        |       FROM nodes LEFT JOIN c3 ON nodes.node = c3.node, nn, d3)
        |SELECT node, round(r3.rank * nn.n + 1e-9, 6) pr FROM r3, nn
        |ORDER BY pr DESC, node LIMIT 20""") { c =>
      val edges = c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val n = graft.ops.PageRank.run(edges, iters = 3, damping = 0.85)
      val nNodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct().count()
      n.select(col("node"), r6(col("rank") * nNodes).as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    },

    // Join right (vendor relations.py:202) — kept non-degenerate: only
    // some suppliers have lineitems under the filter.
    q("join_right",
      """SELECT s_suppkey, s_name, l_orderkey
        |FROM (SELECT * FROM lineitem WHERE l_quantity > 49.5) l
        |RIGHT JOIN supplier ON l.l_suppkey = s_suppkey
        |ORDER BY s_suppkey, l_orderkey NULLS FIRST""") { c =>
      c.lineitem.filter(col("l_quantity") > 49.5)
        .join(c.supplier, col("l_suppkey") === col("s_suppkey"), "right")
        .select("s_suppkey", "s_name", "l_orderkey")
        .orderBy(col("s_suppkey"), col("l_orderkey").asc_nulls_first)
    },

    // any_left join (vendor relations.py:214): left join that takes AT
    // MOST one right match — made deterministic by picking the smallest
    // matching key (the reference's ANY is arbitrary; we pin it).
    q("join_any_left",
      """SELECT c_custkey, c_name, o_min
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, min(o_orderkey) AS o_min
        |           FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""") { c =>
      val anyRight = c.orders.groupBy("o_custkey")
        .agg(min(col("o_orderkey")).as("o_min"))
      c.customer
        .join(anyRight, col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_min")
        .orderBy("c_custkey")
    },

    // Union DISTINCT variant (relations.py:333 Union(all=false)).
    q("rel_union_distinct",
      """SELECT c_nationkey AS k FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY k""") { c =>
      c.customer.select(col("c_nationkey").as("k"))
        .unionByName(c.supplier.select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k")
    },

    // CountDistinctStar (reductions.py:54): distinct over a full row
    // tuple.
    q("agg_count_distinct_star",
      """SELECT count(*) AS n_distinct_pairs FROM (
        |  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)""") { c =>
      c.lineitem.agg(
        countDistinct(col("l_returnflag"), col("l_linestatus"))
          .as("n_distinct_pairs"))
    },

    // Interval RANGE frame (SURVEY §2.4: interval range ≡ rangeBetween
    // over the epoch-seconds ordering) — 1-hour trailing sum per user.
    q("win_range_interval",
      """SELECT event_id, user_id,
        |       round(sum(value) OVER (PARTITION BY user_id
        |                              ORDER BY epoch(CAST(ts AS TIMESTAMP))
        |                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) + 1e-9, 2) AS hour_sum
        |FROM events WHERE user_id < 40 ORDER BY event_id""") { c =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-3600, Window.currentRow)
      c.events.filter(col("user_id") < 40)
        .select(col("event_id"), col("user_id"),
          r2(sum(col("value")).over(w)).as("hour_sum"))
        .orderBy("event_id")
    }
  )
}
