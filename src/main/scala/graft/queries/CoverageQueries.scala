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
