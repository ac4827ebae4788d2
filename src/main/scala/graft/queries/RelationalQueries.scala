package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.1 relational/dataflow operators: Project, Filter, Sort, Limit,
  * Distinct(+on/keep), FillNull, DropNull, Sample, set ops, unnest,
  * value_counts, pivot/unpivot.
  *
  * Reference IR: python/xorq/vendor/ibis/expr/operations/relations.py
  * (Project :126, Filter :272, Sort :261, Limit :297, Distinct :504,
  * FillNull :480, DropNull :487, Sample :495, TableUnnest :509,
  * Union/Intersection/Difference :333-383).
  *
  * All queries are deterministic (total ORDER BY on unique keys, or
  * aggregation) and every filter/projection is declared through the
  * DataFrame API so Catalyst pushes it into the parquet scan.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // SKYLINE / Pareto frontier (Börzsönyi et al. 2001 — the classic
    // "best tradeoffs" operator: parts where no other part is both
    // cheaper AND larger): a point survives iff its size strictly
    // exceeds the running size-max over all cheaper-or-tied points in
    // (price asc, size desc) order. The distinct (price, size) relation
    // is CORPUS-cardinality (price is SF-linear — the r14 plan-audit
    // growth check caught the single-task window here), so the scan is
    // the standard TWO-PHASE distributed skyline: skylines are
    // mergeable (global skyline ⊆ union of partition skylines, and
    // every dominated point has a surviving dominator by transitivity
    // along the sort), so phase 1 runs the prefix-max filter inside 32
    // hash buckets in parallel, and the global pass sees only the
    // survivors — per bucket at most |size domain| = 50 prefix maxima
    // can survive, so the final window input is ≤ 32×50 rows at ANY
    // corpus scale (machine-checked by the sweep). Exact integer
    // cents/sizes end to end; result set identical to the one-pass
    // oracle by the domination-transitivity argument above.
    q("rel_skyline",
      """WITH p AS (SELECT
        |    CAST(round(p_retailprice * 100 + 1e-9) AS BIGINT) pc,
        |    p_size sz, p_partkey FROM part),
        |d AS (SELECT pc, sz, count(*)::BIGINT n_parts,
        |        min(p_partkey)::BIGINT rep FROM p GROUP BY 1, 2),
        |w AS (SELECT pc, sz, n_parts, rep,
        |        max(sz) OVER (ORDER BY pc, sz DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) mx
        |      FROM d)
        |SELECT round(pc / 100.0 + 1e-9, 2) AS price_dollars,
        |  sz AS size, n_parts, rep AS example_part
        |FROM w WHERE mx IS NULL OR sz > mx
        |ORDER BY price_dollars""") { c =>
      val p = c.part.select(
        round(col("p_retailprice") * 100 + lit(1e-9)).cast("long")
          .as("pc"),
        col("p_size").as("sz"), col("p_partkey"))
      val d = p.groupBy("pc", "sz")
        .agg(count(lit(1)).as("n_parts"),
          min(col("p_partkey")).cast("long").as("rep"))
      // phase 1: partition-local skyline inside 32 hash buckets —
      // removes only dominated points (keeps every true skyline point)
      val w1 = Window
        .partitionBy(pmod(hash(col("pc"), col("sz")), lit(32)))
        .orderBy(col("pc"), col("sz").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = d.withColumn("mx1", max(col("sz")).over(w1))
        .filter(col("mx1").isNull || col("sz") > col("mx1"))
        .drop("mx1")
      // phase 2: global prefix-max over the ≤ 32×|size-domain|
      // survivors — model-sized at any SF
      val w = Window.orderBy(col("pc"), col("sz").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val s = local.withColumn("mx", max(col("sz")).over(w))
      s.filter(col("mx").isNull || col("sz") > col("mx"))
        .select(r2(col("pc") / 100.0).as("price_dollars"),
          col("sz").as("size"), col("n_parts"),
          col("rep").as("example_part"))
        .orderBy("price_dollars")
    },


    // Project: select + computed named values (relations.py:126).
    q("rel_project",
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount) + 1e-9, 2) AS revenue,
        |       round(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 1e-9, 2) AS charged,
        |       l_quantity * 2 AS dbl_qty
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""") { c =>
      c.lineitem.select(
          col("l_orderkey"), col("l_linenumber"),
          r2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          r2(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charged"),
          (col("l_quantity") * 2).as("dbl_qty"))
        .orderBy("l_orderkey", "l_linenumber").limit(500)
    },

    // Filter: conjunctive/disjunctive predicates + BETWEEN + IN (Filter :272).
    q("rel_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_discount > 0.05
        |  AND l_returnflag IN ('A', 'R')
        |  AND NOT l_linestatus = 'X'
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""") { c =>
      c.lineitem
        .filter(col("l_quantity").between(10, 20) &&
          col("l_discount") > 0.05 &&
          col("l_returnflag").isin("A", "R") &&
          !(col("l_linestatus") === "X"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber").limit(500)
    },

    // Sort (multi-key, desc, nulls-last) + Limit + Offset (Sort :261, Limit :297).
    q("rel_sort_limit_offset",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
        |LIMIT 50 OFFSET 25""") { c =>
      c.orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
        .offset(25).limit(50)
    },

    // Distinct over a projection (Distinct :504).
    q("rel_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus, l_shipdate LIMIT 1000""") { c =>
      c.lineitem.select("l_returnflag", "l_linestatus", "l_shipdate")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "l_shipdate").limit(1000)
    },

    // distinct(on=subset, keep=first) — xorq's subset-distinct
    // (vendor types/relations.py:1010) → window row_number == 1.
    q("rel_distinct_on",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""") { c =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      c.orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    },

    // FillNull + DropNull (relations.py:480/:487). The synthetic tables are
    // null-free, so nulls are manufactured with nullif first.
    q("rel_fill_drop_null",
      """WITH e AS (
        |  SELECT event_id, nullif(event_type, 'click') AS et,
        |         CASE WHEN value < 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, coalesce(et, 'none') AS et_filled, round(v + 1e-9, 2) AS v
        |FROM e WHERE v IS NOT NULL
        |ORDER BY event_id LIMIT 1000""") { c =>
      c.events
        .select(col("event_id"),
          nullif(col("event_type"), lit("click")).as("et"),
          when(col("value") < 0, lit(null)).otherwise(col("value")).as("v"))
        .na.drop(Seq("v"))
        .na.fill(Map("et" -> "none"))
        .withColumnRenamed("et", "et_filled")
        .select(col("event_id"), col("et_filled"), r2(col("v")).as("v"))
        .orderBy("event_id").limit(1000)
    },

    // Sample (relations.py:495): the reference lowers to rand() <= p, which
    // is engine-seeded; for the cross-engine oracle we use the deterministic
    // key-hash analogue (same spirit as its train_test_splits keyed split).
    q("rel_sample_det",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_orderkey % 20 = 3
        |ORDER BY l_orderkey, l_linenumber""") { c =>
      c.lineitem.filter(pmod(col("l_orderkey"), lit(20)) === 3)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Set ops (relations.py:333-383): union all / union distinct /
    // intersect / except over aligned projections.
    q("rel_union",
      """SELECT k, src FROM (
        |  SELECT c_custkey AS k, 'c' AS src FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT o_custkey AS k, 'o' AS src FROM orders WHERE o_custkey % 7 = 0)
        |ORDER BY k, src LIMIT 2000""") { c =>
      val a = c.customer.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("k"), lit("c").as("src"))
      val b = c.orders.filter(col("o_custkey") % 7 === 0)
        .select(col("o_custkey").as("k"), lit("o").as("src"))
      a.unionByName(b).orderBy("k", "src").limit(2000)
    },

    q("rel_intersect",
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey FROM orders
        |ORDER BY k""") { c =>
      c.customer.select(col("c_custkey").as("k"))
        .intersect(c.orders.select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    q("rel_except",
      """SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 45
        |EXCEPT
        |SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08
        |ORDER BY k""") { c =>
      c.lineitem.filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("k"))
        .except(c.lineitem.filter(col("l_discount") > 0.08)
          .select(col("l_orderkey").as("k")))
        .orderBy("k")
    },

    // TableUnnest (relations.py:509): split p_type into words, explode.
    q("rel_unnest",
      """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
        |FROM part WHERE p_partkey <= 200
        |ORDER BY p_partkey, word""") { c =>
      c.part.filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          explode(split(col("p_type"), " ")).as("word"))
        .orderBy("p_partkey", "word")
    },

    // value_counts (types/relations.py:4634).
    q("rel_value_counts",
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { c =>
      c.orders.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    },

    // pivot_wider (types/relations.py:3927) → groupBy().pivot().agg();
    // oracle via portable conditional aggregation.
    q("rel_pivot",
      """SELECT l_linestatus,
        |       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) + 1e-9, 2) AS A,
        |       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) + 1e-9, 2) AS N,
        |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) + 1e-9, 2) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""") { c =>
      val p = c.lineitem.groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(r2(sum(col("l_quantity"))))
      p.orderBy("l_linestatus")
    },

    // pivot_longer / melt (types/relations.py:3597) → unpivot.
    q("rel_unpivot",
      """SELECT c_custkey, m, round(v + 1e-9, 2) AS v FROM (
        |  SELECT c_custkey, 'acctbal' AS m, c_acctbal AS v FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nationkey' AS m, CAST(c_nationkey AS DOUBLE) FROM customer)
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey, m""") { c =>
      c.customer.filter(col("c_custkey") <= 300)
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").cast("double").as("c_nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal").as("acctbal"),
            col("c_nationkey").as("nationkey")), "m", "v")
        .select(col("c_custkey"), col("m"), r2(col("v")).as("v"))
        .orderBy("c_custkey", "m")
    },

    // FULL describe (types/relations.py:2717): count/max/mean/min/
    // quartiles/std per column in ONE aggregate pass (ops.Describe),
    // long format. Everything is rounded to 4dp on both sides: count/
    // min/max are integers or 2dp-lattice money (round = identity) and
    // mean/std/quantiles are summation-order/interpolation dependent,
    // which the shared rounding absorbs.
    q("rel_describe",
      """WITH w AS (SELECT
        |  CAST(count(l_quantity) AS DOUBLE) c_q, CAST(count(l_extendedprice) AS DOUBLE) c_p, CAST(count(l_discount) AS DOUBLE) c_d,
        |  max(l_quantity) mx_q, max(l_extendedprice) mx_p, max(l_discount) mx_d,
        |  avg(l_quantity) me_q, avg(l_extendedprice) me_p, avg(l_discount) me_d,
        |  min(l_quantity) mn_q, min(l_extendedprice) mn_p, min(l_discount) mn_d,
        |  quantile_cont(l_quantity, 0.25) q25_q, quantile_cont(l_extendedprice, 0.25) q25_p, quantile_cont(l_discount, 0.25) q25_d,
        |  quantile_cont(l_quantity, 0.50) q50_q, quantile_cont(l_extendedprice, 0.50) q50_p, quantile_cont(l_discount, 0.50) q50_d,
        |  quantile_cont(l_quantity, 0.75) q75_q, quantile_cont(l_extendedprice, 0.75) q75_p, quantile_cont(l_discount, 0.75) q75_d,
        |  stddev_samp(l_quantity) sd_q, stddev_samp(l_extendedprice) sd_p, stddev_samp(l_discount) sd_d
        |  FROM lineitem)
        |SELECT metric, round(qty + 1e-9, 4) AS qty, round(price + 1e-9, 4) AS price, round(disc + 1e-9, 4) AS disc
        |FROM (
        |  SELECT 'count' AS metric, c_q qty, c_p price, c_d disc FROM w
        |  UNION ALL SELECT 'max', mx_q, mx_p, mx_d FROM w
        |  UNION ALL SELECT 'mean', me_q, me_p, me_d FROM w
        |  UNION ALL SELECT 'min', mn_q, mn_p, mn_d FROM w
        |  UNION ALL SELECT 'p25', q25_q, q25_p, q25_d FROM w
        |  UNION ALL SELECT 'p50', q50_q, q50_p, q50_d FROM w
        |  UNION ALL SELECT 'p75', q75_q, q75_p, q75_d FROM w
        |  UNION ALL SELECT 'std', sd_q, sd_p, sd_d FROM w
        |) ORDER BY metric""") { c =>
      graft.ops.Describe.describe(c.lineitem,
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("metric"),
          r4(col("l_quantity")).as("qty"),
          r4(col("l_extendedprice")).as("price"),
          r4(col("l_discount")).as("disc"))
        .orderBy("metric")
    },

    // SQLStringView (relations.py:459): raw SQL over a registered view.
    q("rel_sql_view",
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity) + 1e-9, 2) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
      c.lineitem.createOrReplaceTempView("graft_sql_view_lineitem")
      c.spark.sql(
        """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity) + 1e-9, 2) AS qty
          |FROM graft_sql_view_lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // CDC changelog apply — the MERGE INTO / changelog-compaction
    // operator a lakehouse ingest runs to materialize a table from an
    // insert/update/delete log (the streaming-CDC counterpart of the
    // SCD2 merge, which KEEPS history where this keeps only the
    // current image): latest op per entity by sequence number wins; a
    // trailing 'D' removes the entity. One keyed window over the log
    // — the shape that shuffles once on the entity key and scales
    // with log size, never with table width. The log is synthesized
    // deterministically from orders (status → op code).
    q("rel_cdc_apply",
      """WITH log AS (SELECT o_orderkey % 1000 AS ent, o_orderkey AS seq,
        |    CASE WHEN o_orderstatus = 'F' THEN 'U'
        |         WHEN o_orderstatus = 'O' THEN 'I' ELSE 'D' END op,
        |    CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT) val
        |  FROM orders),
        |r AS (SELECT ent, seq, op, val,
        |        row_number() OVER (PARTITION BY ent
        |          ORDER BY seq DESC) rn
        |      FROM log)
        |SELECT ent AS entity_id, seq AS last_seq, op AS last_op,
        |       val AS value_cents
        |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY entity_id""") { c =>
      import org.apache.spark.sql.expressions.Window
      val log = c.orders.select(
        (col("o_orderkey") % 1000).as("ent"),
        col("o_orderkey").as("seq"),
        when(col("o_orderstatus") === "F", "U")
          .when(col("o_orderstatus") === "O", "I")
          .otherwise("D").as("op"),
        expr("CAST(round(o_totalprice * 100 + 1e-9) AS BIGINT)")
          .as("val"))
      val w = Window.partitionBy("ent").orderBy(col("seq").desc)
      log.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("ent").as("entity_id"), col("seq").as("last_seq"),
          col("op").as("last_op"), col("val").as("value_cents"))
        .orderBy("entity_id")
    },
  )
}
