package graft.queries

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 graph tier beyond PageRank/triangles/k-core: BFS shortest
  * hop distances ([[graft.ops.Bfs]]) and label-propagation community
  * detection ([[graft.ops.LabelProp]]), both over the customer–supplier
  * bipartite graph derived from lineitem⋈orders. Oracles: a bounded
  * recursive CTE (BFS levels = exact min hop distance) and fully
  * unrolled synchronous rounds (the PageRank/logreg oracle pattern).
  */
object GraphQueries {

  val defs: Seq[QueryDef] = Seq(

    // Single-source shortest hop distances (layered BFS, 4 pinned
    // levels max) from the smallest customer node over the undirected
    // bipartite graph. Every level is one equi-join + distinct +
    // anti-join against the settled set; unreached nodes are absent.
    // Output is the per-level profile (count + lexical endpoints) so
    // the hash pins the exact frontier sets without a 1600-row dump.
    q("graph_sssp",
      """WITH RECURSIVE e0 AS (
        |  SELECT DISTINCT 'c' || o_custkey s, 's' || l_suppkey t
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT s src, t dst FROM e0 UNION SELECT t, s FROM e0),
        |src AS (SELECT 'c' || min(o_custkey) node FROM orders),
        |walk(node, dist) AS (
        |  SELECT node, 0 FROM src
        |  UNION
        |  SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.node
        |  WHERE walk.dist < 4)
        |SELECT dist::BIGINT AS dist, count(*)::BIGINT AS n_nodes,
        |       min(node) AS first_node, max(node) AS last_node
        |FROM (SELECT node, min(dist) dist FROM walk GROUP BY 1)
        |GROUP BY 1 ORDER BY dist""",
      bench = true) { c =>
      // the BFS itself runs on LONG-encoded nodes (customer 2k,
      // supplier 2k+1) instead of the output's 'c…'/'s…' strings:
      // every per-level join/distinct/anti-join then hashes and
      // shuffles 8-byte longs instead of ~8-char strings (guide §2.3,
      // narrower types — measured 13.7 s → 8.8 s for the probe BFS at
      // sf0.1), and the distinct over the lineitem⋈orders pair stream
      // dedups narrow integers (3.0 s → 1.9 s). The bijective decode
      // happens once on the level-profile input, so first/last node
      // strings (and the oracle hash) are unchanged.
      val e0 = c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("s"),
          (col("l_suppkey") * 2 + 1).cast("long").as("t"))
        .distinct()
      val e = e0.select(col("s").as("src"), col("t").as("dst"))
        .union(e0.select(col("t").as("src"), col("s").as("dst")))
      val src = c.orders.agg((min(col("o_custkey")) * 2).cast("long")
        .as("node"))
      val dist = graft.ops.Bfs.hops(e, src, maxHops = 4)
      val decoded = dist.select(col("dist"),
        when(col("node") % 2 === 0,
          concat(lit("c"), shiftright(col("node"), 1)))
          .otherwise(concat(lit("s"), shiftright(col("node"), 1)))
          .as("node"))
      decoded.groupBy("dist").agg(count(lit(1)).as("n_nodes"),
          min(col("node")).as("first_node"),
          max(col("node")).as("last_node"))
        .orderBy("dist")
    },

    // Label-propagation communities (3 pinned synchronous rounds,
    // most-frequent-neighbor label, ties to the smallest) on the
    // SPARSE high-quantity subgraph, where LPA resolves a real
    // multi-community structure instead of collapsing to the bipartite
    // core. Top communities by size.
    q("graph_label_prop",
      """WITH e0 AS (SELECT DISTINCT 'c' || o_custkey s, 's' || l_suppkey t
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |            WHERE l_quantity > 48),
        |e AS (SELECT s src, t dst FROM e0 UNION SELECT t, s FROM e0),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
        |n1 AS (SELECT e.src node, l0.label, count(*) c FROM e
        |       JOIN l0 ON e.dst = l0.node GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (PARTITION BY node
        |           ORDER BY c DESC, label) rn FROM n1) WHERE rn = 1),
        |n2 AS (SELECT e.src node, l1.label, count(*) c FROM e
        |       JOIN l1 ON e.dst = l1.node GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (PARTITION BY node
        |           ORDER BY c DESC, label) rn FROM n2) WHERE rn = 1),
        |n3 AS (SELECT e.src node, l2.label, count(*) c FROM e
        |       JOIN l2 ON e.dst = l2.node GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (PARTITION BY node
        |           ORDER BY c DESC, label) rn FROM n3) WHERE rn = 1)
        |SELECT label, count(*)::BIGINT AS size FROM l3
        |GROUP BY 1 ORDER BY size DESC, label LIMIT 15""") { c =>
      val e0 = c.lineitem.filter(col("l_quantity") > 48)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val labels = graft.ops.LabelProp.run(e0, iters = 3)
      labels.groupBy("label").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("label")).limit(15)
    },

    // Personalized PageRank (Haveliwala 2002): restart AND dangling
    // mass teleport only to the 5-customer source set, so ranks
    // measure proximity to those customers — the recommendation /
    // related-entity primitive standard PageRank cannot express.
    // 2 pinned rounds (r13: 3 -> 2 — each unrolled round is a fixed
    // serial-job-chain cost, and two restarts already separate the
    // source-proximal ranking at every SF; the gate tripwire named
    // this query), oracle fully unrolled; unreachable nodes are
    // exactly 0 and excluded on both engines.
    q("graph_ppr",
      """WITH e AS (SELECT DISTINCT 'c' || o_custkey src,
        |                           's' || l_suppkey dst
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src node FROM e UNION SELECT dst FROM e),
        |s AS (SELECT DISTINCT 'c' || o_custkey node FROM orders
        |      WHERE o_custkey < 5),
        |ns AS (SELECT count(*) n FROM s),
        |tp AS (SELECT nodes.node,
        |              CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n
        |                   ELSE 0.0 END tp
        |       FROM nodes LEFT JOIN s USING (node), ns),
        |od AS (SELECT src, count(*) outdeg FROM e GROUP BY 1),
        |r0 AS (SELECT node, tp rank FROM tp),
        |d1 AS (SELECT coalesce(sum(rank), 0)::DOUBLE dm FROM r0
        |       LEFT JOIN od ON r0.node = od.src WHERE od.src IS NULL),
        |c1 AS (SELECT dst node, sum(r.rank / od.outdeg) contrib FROM e
        |       JOIN r0 r ON e.src = r.node JOIN od ON e.src = od.src
        |       GROUP BY 1),
        |r1 AS (SELECT tp.node, (1.0 - 0.85) * tp.tp + 0.85::DOUBLE *
        |         (coalesce(c1.contrib, 0)::DOUBLE + d1.dm * tp.tp) rank
        |       FROM tp LEFT JOIN c1 ON tp.node = c1.node, d1),
        |d2 AS (SELECT coalesce(sum(rank), 0)::DOUBLE dm FROM r1
        |       LEFT JOIN od ON r1.node = od.src WHERE od.src IS NULL),
        |c2 AS (SELECT dst node, sum(r.rank / od.outdeg) contrib FROM e
        |       JOIN r1 r ON e.src = r.node JOIN od ON e.src = od.src
        |       GROUP BY 1),
        |r2 AS (SELECT tp.node, (1.0 - 0.85) * tp.tp + 0.85::DOUBLE *
        |         (coalesce(c2.contrib, 0)::DOUBLE + d2.dm * tp.tp) rank
        |       FROM tp LEFT JOIN c2 ON tp.node = c2.node, d2)
        |SELECT node, round(rank + 1e-9, 6) pr FROM r2
        |WHERE rank > 0 ORDER BY pr DESC, node LIMIT 20""") { c =>
      val edges = c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val sources = c.orders.filter(col("o_custkey") < 5)
        .select(concat(lit("c"), col("o_custkey")).as("node"))
      val ranks = graft.ops.PageRank.personalized(edges, sources,
        iters = 2, damping = 0.85)
      ranks.filter(col("rank") > 0)
        .select(col("node"), r6(col("rank")).as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    },

    // Adamic-Adar link prediction over the customer projection of the
    // sparse co-purchase bipartite graph: customer pairs sharing
    // suppliers, scored Σ 1/ln(deg) over the shared neighbors —
    // rarer intermediaries count more. The wedge enumeration is the
    // per-supplier self-join bounded by the SPARSE subgraph's degree
    // (the same fan-out discipline as triangles); ranking uses the
    // ROUNDED score so FP noise can never flip the top-k set.
    q("graph_link_prediction",
      """WITH e AS (SELECT DISTINCT 'c' || o_custkey c, 's' || l_suppkey s
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           WHERE l_quantity > 48),
        |deg AS (SELECT s, count(*) d FROM e GROUP BY 1),
        |w AS (SELECT a.c ca, b.c cb, a.s FROM e a JOIN e b ON a.s = b.s
        |      WHERE a.c < b.c),
        |aa AS (SELECT ca, cb, sum(1.0 / ln(deg.d)) score,
        |              count(*) common
        |       FROM w JOIN deg ON w.s = deg.s WHERE deg.d > 1
        |       GROUP BY 1, 2)
        |SELECT ca, cb, round(score + 1e-9, 6) AS adamic_adar,
        |       common::BIGINT AS common_neighbors
        |FROM aa
        |ORDER BY round(score + 1e-9, 6) DESC, ca, cb LIMIT 20""") { c =>
      val e = c.lineitem.filter(col("l_quantity") > 48)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .distinct()
      val deg = e.groupBy("s").agg(count(lit(1)).as("d"))
      val w = e.as("a").join(e.as("b"), col("a.s") === col("b.s"))
        .filter(col("a.c") < col("b.c"))
        .select(col("a.c").as("ca"), col("b.c").as("cb"),
          col("a.s").as("s"))
      val aa = w.join(deg.filter(col("d") > 1), Seq("s"))
        .groupBy("ca", "cb")
        .agg(sum(lit(1.0) / log(col("d"))).as("score"),
          count(lit(1)).as("common"))
      aa.select(col("ca"), col("cb"),
          r6(col("score")).as("adamic_adar"),
          col("common").as("common_neighbors"))
        .orderBy(col("adamic_adar").desc, col("ca"), col("cb"))
        .limit(20)
    },

    // Jaccard neighbor-overlap link prediction (Liben-Nowell &
    // Kleinberg 2003's similarity-based family — the NORMALIZED
    // common-neighbors score beside graph_link_prediction's
    // Adamic-Adar weighting: J = |Γa∩Γb| / |Γa∪Γb| rewards pairs
    // whose whole neighborhoods coincide, not just a large raw
    // overlap): same big-ticket customer→supplier bipartite graph.
    // Scale shape: the pair walk goes through shared suppliers with
    // the graph_katz_link HUB SUPPRESSION (suppliers of degree > 64
    // are excluded from the wedge join, so Σdeg² stays bounded; the
    // reported overlap counts NON-HUB shared suppliers — hub
    // co-purchase carries no discrimination signal anyway, the
    // standard IDF-style argument); per-customer degrees come from
    // one aggregation of the full edge set.
    q("graph_jaccard_link",
      """WITH e AS (SELECT DISTINCT 'c' || o_custkey c, 's' || l_suppkey s
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           WHERE l_quantity > 48),
        |sd AS (SELECT s, count(*) d FROM e GROUP BY 1),
        |cd AS (SELECT c, count(*)::BIGINT dc FROM e GROUP BY 1),
        |w AS (SELECT a.c ca, b.c cb
        |      FROM e a JOIN e b ON a.s = b.s
        |      JOIN sd ON a.s = sd.s
        |      WHERE a.c < b.c AND sd.d <= 64),
        |p AS (SELECT ca, cb, count(*)::BIGINT common FROM w
        |      GROUP BY 1, 2),
        |j AS (SELECT p.ca, p.cb, p.common, da.dc da, db.dc db,
        |        round(p.common * 1.0
        |              / (da.dc + db.dc - p.common) + 1e-9, 6) jac
        |      FROM p JOIN cd da ON p.ca = da.c
        |             JOIN cd db ON p.cb = db.c)
        |SELECT ca, cb, common AS common_neighbors, da AS deg_a,
        |  db AS deg_b, jac AS jaccard
        |FROM j ORDER BY jaccard DESC, ca, cb LIMIT 15""") { c =>
      val e = c.lineitem.filter(col("l_quantity") > 48)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .distinct()
      val sd = e.groupBy("s").agg(count(lit(1)).as("d"))
      val cd = e.groupBy("c").agg(count(lit(1)).as("dc"))
      val w = e.as("a")
        .join(e.as("b"), col("a.s") === col("b.s"))
        .join(sd.filter(col("d") <= 64)
            .select(col("s").as("sh")),
          col("a.s") === col("sh"))
        .filter(col("a.c") < col("b.c"))
        .select(col("a.c").as("ca"), col("b.c").as("cb"))
      val p = w.groupBy("ca", "cb").agg(count(lit(1)).as("common"))
      val j = p
        .join(cd.select(col("c"), col("dc").as("da")),
          col("ca") === col("c")).drop("c")
        .join(cd.select(col("c").as("c2"), col("dc").as("db")),
          col("cb") === col("c2")).drop("c2")
        .select(col("ca"), col("cb"), col("common"), col("da"),
          col("db"),
          r6(col("common") * lit(1.0) /
            (col("da") + col("db") - col("common"))).as("jac"))
      j.select(col("ca"), col("cb"),
          col("common").as("common_neighbors"), col("da").as("deg_a"),
          col("db").as("deg_b"), col("jac").as("jaccard"))
        .orderBy(col("jaccard").desc, col("ca"), col("cb"))
        .limit(15)
    },

    // HITS hubs & authorities (Kleinberg 1999; 2 pinned rounds,
    // L2-normalized each half-step) on the directed customer→supplier
    // purchase graph: authorities = suppliers many strong hubs buy
    // from, hubs = customers buying from many strong authorities —
    // the asymmetric-role ranking PageRank's single score collapses.
    // Each half-step is one equi-join + aggregation; the norm is a
    // 1-row broadcast scalar.
    q("graph_hits",
      """WITH e AS (SELECT DISTINCT 'c' || o_custkey c, 's' || l_suppkey s
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           WHERE l_quantity > 45),
        |a1 AS (SELECT s, count(*)::DOUBLE a FROM e GROUP BY 1),
        |a1n AS (SELECT s, a / sqrt((SELECT sum(a * a) FROM a1)) a
        |        FROM a1),
        |h1 AS (SELECT e.c, sum(a1n.a) h FROM e JOIN a1n USING (s)
        |       GROUP BY 1),
        |h1n AS (SELECT c, h / sqrt((SELECT sum(h * h) FROM h1)) h
        |        FROM h1),
        |a2 AS (SELECT e.s, sum(h1n.h) a FROM e JOIN h1n USING (c)
        |       GROUP BY 1),
        |a2n AS (SELECT s, a / sqrt((SELECT sum(a * a) FROM a2)) a
        |        FROM a2),
        |top AS (
        |  SELECT 'authority' AS role, s AS node, a AS score FROM a2n
        |  UNION ALL SELECT 'hub' AS role, c AS node, h AS score
        |  FROM h1n)
        |SELECT role, node, round(score + 1e-9, 6) AS score
        |FROM (SELECT top.*, row_number() OVER (PARTITION BY role
        |        ORDER BY round(score + 1e-9, 6) DESC, node) rn
        |      FROM top) z
        |WHERE rn <= 10 ORDER BY role, score DESC, node""") { c =>
      import org.apache.spark.sql.expressions.Window
      val e = c.lineitem.filter(col("l_quantity") > 45)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .distinct().persist()
      def normalized(df: org.apache.spark.sql.DataFrame, key: String,
          v: String) = {
        val nrm = df.agg(sqrt(sum(col(v) * col(v))).as("__n"))
        df.crossJoin(broadcast(nrm))
          .select(col(key), (col(v) / col("__n")).as(v))
      }
      val a1 = normalized(
        e.groupBy("s").agg(count(lit(1)).cast("double").as("a")),
        "s", "a")
      val h1 = normalized(
        e.join(a1, Seq("s")).groupBy("c").agg(sum(col("a")).as("h")),
        "c", "h")
      val a2 = normalized(
        e.join(h1, Seq("c")).groupBy("s").agg(sum(col("h")).as("a")),
        "s", "a")
      e.unpersist()
      val top = a2.select(lit("authority").as("role"),
          col("s").as("node"), col("a").as("score"))
        .unionByName(h1.select(lit("hub").as("role"),
          col("c").as("node"), col("h").as("score")))
        .select(col("role"), col("node"), r6(col("score")).as("score"))
      top.withColumn("rn", row_number().over(
          Window.partitionBy("role")
            .orderBy(col("score").desc, col("node"))))
        .filter(col("rn") <= 10)
        .select(col("role"), col("node"), col("score"))
        .orderBy(col("role"), col("score").desc, col("node"))
    },

    // Modularity profile (Newman-Girvan Q) of the nation partition over
    // the undirected customer–supplier purchase graph: per community c,
    // Q_c = e_c/m − (d_c/2m)² — how much denser the community is than a
    // degree-preserving random rewiring. Emitting the PER-COMMUNITY
    // contributions (not just ΣQ_c) keeps every output a closed form of
    // integer counts (no cross-community double sum to order) and is the
    // readout community-quality audits actually want. Shape: two
    // broadcast-joins to attach communities, one groupBy for degrees,
    // one for within-edges — no all-pairs work, 100 TB-sane.
    q("graph_modularity",
      """WITH e AS (SELECT DISTINCT o_custkey ck, l_suppkey sk
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           WHERE l_quantity > 45),
        |ec AS (SELECT c.c_nationkey cc, s.s_nationkey sc FROM e
        |       JOIN customer c ON e.ck = c.c_custkey
        |       JOIN supplier s ON e.sk = s.s_suppkey),
        |m AS (SELECT count(*) m FROM ec),
        |din AS (SELECT cc com, count(*) win FROM ec WHERE cc = sc
        |        GROUP BY 1),
        |degs AS (SELECT cc com, count(*) d FROM ec GROUP BY 1
        |         UNION ALL SELECT sc, count(*) FROM ec GROUP BY 1),
        |dc AS (SELECT com, sum(d)::BIGINT dsum FROM degs GROUP BY 1)
        |SELECT dc.com::BIGINT AS community,
        |       coalesce(din.win, 0)::BIGINT AS edges_within,
        |       dc.dsum AS degree_sum,
        |       round(coalesce(din.win, 0)::DOUBLE / m.m
        |             - (dc.dsum::DOUBLE / (2 * m.m))
        |               * (dc.dsum::DOUBLE / (2 * m.m)) + 1e-9, 6)
        |         AS q_contrib
        |FROM dc LEFT JOIN din USING (com), m
        |ORDER BY community""") { c =>
      val e = c.lineitem.filter(col("l_quantity") > 45)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val ec = e
        .join(broadcast(c.customer.select(col("c_custkey"),
          col("c_nationkey").as("cc"))), col("ck") === col("c_custkey"))
        .join(broadcast(c.supplier.select(col("s_suppkey"),
          col("s_nationkey").as("sc"))), col("sk") === col("s_suppkey"))
        .select(col("cc"), col("sc")).persist()
      val m = ec.agg(count(lit(1)).as("m"))
      val din = ec.filter(col("cc") === col("sc"))
        .groupBy(col("cc").as("com")).agg(count(lit(1)).as("win"))
      val dc = ec.select(col("cc").as("com"))
        .unionAll(ec.select(col("sc").as("com")))
        .groupBy("com").agg(count(lit(1)).as("dsum"))
      val out = dc.join(din, Seq("com"), "left")
        .crossJoin(broadcast(m))
        .select(col("com").cast("long").as("community"),
          coalesce(col("win"), lit(0L)).cast("long").as("edges_within"),
          col("dsum").cast("long").as("degree_sum"),
          r6(coalesce(col("win"), lit(0L)).cast("double") / col("m")
            - (col("dsum").cast("double") / (lit(2) * col("m")))
              * (col("dsum").cast("double") / (lit(2) * col("m"))))
            .as("q_contrib"))
        .orderBy("community")
      // materialize the community-count-sized result (≤ #nations rows)
      // while ec's cache is still warm, then release it — library-style
      // callers keep no cache entry behind (the SimPairs discipline)
      val outP = out.localCheckpoint(true)
      ec.unpersist(false)
      outP
    },

    // Deterministic random walks (the DeepWalk/node2vec sampling
    // primitive, Perozzi et al. 2014 — the step that feeds skip-gram
    // embedding training from a graph): 3-step walks from the top-10
    // degree nodes, where "random" next-hop = argmin of the PORTABLE
    // md5 hash h(node, step, neighbor) over the neighbor set — fully
    // deterministic, reproducible across engines and runs (the
    // rel_sample_det contract applied to walks). Ties (hash
    // collisions) break on neighbor id via the (h, v) window order.
    // Scale shape: one equi-join + per-source window per step, walk
    // length fixed — O(steps) joins partitioned on the frontier.
    q("graph_random_walk",
      """WITH e0 AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) u,
        |                   greatest(a.l_partkey, b.l_partkey) v
        |            FROM lineitem a JOIN lineitem b
        |              ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_partkey < b.l_partkey
        |              AND a.l_quantity > 40 AND b.l_quantity > 40),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |deg AS (SELECT u, count(*) d FROM e GROUP BY 1),
        |st AS (SELECT u s FROM deg ORDER BY d DESC, u LIMIT 10),
        |h1 AS (SELECT st.s, e.v,
        |         row_number() OVER (PARTITION BY st.s ORDER BY
        |           ('0x' || substr(md5(st.s || '-1-' || e.v), 1, 8))
        |             ::BIGINT, e.v) rn
        |       FROM st JOIN e ON st.s = e.u),
        |w1 AS (SELECT s, v n1 FROM h1 WHERE rn = 1),
        |h2 AS (SELECT w1.s, w1.n1, e.v,
        |         row_number() OVER (PARTITION BY w1.s ORDER BY
        |           ('0x' || substr(md5(w1.n1 || '-2-' || e.v), 1, 8))
        |             ::BIGINT, e.v) rn
        |       FROM w1 JOIN e ON w1.n1 = e.u),
        |w2 AS (SELECT s, n1, v n2 FROM h2 WHERE rn = 1),
        |h3 AS (SELECT w2.s, w2.n1, w2.n2, e.v,
        |         row_number() OVER (PARTITION BY w2.s ORDER BY
        |           ('0x' || substr(md5(w2.n2 || '-3-' || e.v), 1, 8))
        |             ::BIGINT, e.v) rn
        |       FROM w2 JOIN e ON w2.n2 = e.u)
        |SELECT s AS start, n1, n2, v AS n3 FROM h3 WHERE rn = 1
        |ORDER BY start""") { c =>
      val pick = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = pick.as("a")
        .join(pick.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint() // 3 walk steps re-join the same edge frame
      val st = e.groupBy("u").agg(count(lit(1)).as("d"))
        .orderBy(col("d").desc, col("u")).limit(10)
        .select(col("u").as("s"))
      def step(frontier: org.apache.spark.sql.DataFrame, cur: String,
          stepNo: Int, outCol: String) = {
        val h = conv(substring(md5(concat(col(cur).cast("string"),
          lit(s"-$stepNo-"), col("v").cast("string"))), 1, 8), 16, 10)
          .cast("long")
        val parts = frontier.columns.map(col).toSeq
        val w = Window.partitionBy(col("s")).orderBy(h, col("v"))
        frontier.join(e, frontier(cur) === e("u"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(parts :+ col("v").as(outCol): _*)
      }
      val w1 = step(st, "s", 1, "n1")
      val w2 = step(w1, "n1", 2, "n2")
      val w3 = step(w2, "n2", 3, "n3")
      w3.select(col("s").as("start"), col("n1"), col("n2"), col("n3"))
        .orderBy("start")
    },

    // Community conductance φ(c) = cut(c)/min(vol(c), vol(rest)) —
    // the partition-quality audit beside graph_modularity's Q_c (low
    // conductance = well-separated community; Kannan/Vempala/Vetta
    // 2004): same nation-community customer–supplier edge frame as
    // graph_modularity; cut = edges with exactly one endpoint in the
    // community, vol = degree sum — all exact integer counts, ONE
    // double division per community row. Scale shape: two broadcast
    // joins + two hash aggregates, no all-pairs work.
    q("graph_conductance",
      """WITH e AS (SELECT DISTINCT o_custkey ck, l_suppkey sk
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           WHERE l_quantity > 45),
        |ec AS (SELECT c.c_nationkey cc, s.s_nationkey sc FROM e
        |       JOIN customer c ON e.ck = c.c_custkey
        |       JOIN supplier s ON e.sk = s.s_suppkey),
        |m AS (SELECT count(*)::BIGINT m FROM ec),
        |cuts AS (SELECT com, sum(cut)::BIGINT cut FROM (
        |    SELECT cc com, CASE WHEN cc <> sc THEN 1 ELSE 0 END cut
        |    FROM ec
        |    UNION ALL
        |    SELECT sc, CASE WHEN cc <> sc THEN 1 ELSE 0 END FROM ec)
        |  GROUP BY 1),
        |degs AS (SELECT cc com, count(*) d FROM ec GROUP BY 1
        |         UNION ALL SELECT sc, count(*) FROM ec GROUP BY 1),
        |dc AS (SELECT com, sum(d)::BIGINT vol FROM degs GROUP BY 1)
        |SELECT dc.com::BIGINT AS community, cuts.cut, dc.vol,
        |       (2 * m.m - dc.vol)::BIGINT AS vol_rest,
        |       round(cuts.cut::DOUBLE
        |             / least(dc.vol, 2 * m.m - dc.vol) + 1e-9, 6)
        |         AS conductance
        |FROM dc JOIN cuts ON dc.com = cuts.com CROSS JOIN m
        |ORDER BY community""") { c =>
      val e = c.lineitem.filter(col("l_quantity") > 45)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val ec = e
        .join(c.customer, col("ck") === col("c_custkey"))
        .join(c.supplier, col("sk") === col("s_suppkey"))
        .select(col("c_nationkey").as("cc"), col("s_nationkey").as("sc"))
      val m = ec.agg(count(lit(1)).as("m"))
      val cutFlag = when(col("cc") =!= col("sc"), 1L).otherwise(0L)
      val cuts = ec.select(col("cc").as("com"), cutFlag.as("cut"))
        .union(ec.select(col("sc").as("com"), cutFlag.as("cut")))
        .groupBy("com").agg(sum(col("cut")).as("cut"))
      val dc = ec.select(col("cc").as("com"))
        .union(ec.select(col("sc").as("com")))
        .groupBy("com").agg(count(lit(1)).as("vol"))
      dc.join(cuts, "com").crossJoin(broadcast(m))
        .select(col("com").as("community"), col("cut"), col("vol"),
          (lit(2) * col("m") - col("vol")).as("vol_rest"),
          r6(col("cut").cast("double") /
            least(col("vol"), lit(2) * col("m") - col("vol")))
            .as("conductance"))
        .orderBy("community")
    },

    // Two-hop reach (friends-of-friends count — the classic social /
    // co-occurrence expansion feature and the cheapest link-prediction
    // candidate generator): per node of the heavy-co-purchase part
    // graph, the number of distinct nodes EXACTLY two hops away
    // (reachable via a shared neighbor, not a direct neighbor, not
    // self). Pure integer set logic: undirected edge list → one
    // self-join through the middle node → distinct → anti-join out
    // the 1-hop neighborhood. Top-20 by (reach DESC, node). Scale
    // shape: equi-joins partitioned on the middle node; the quantity
    // filter keeps the wedge fan-out hub-safe (the graph_triangles
    // construction).
    // BIPARTITE PROJECTION with a power-node cap (the co-occurrence
    // primitive behind "suppliers bought together" / item-item
    // recsys): project the customer–supplier graph onto
    // supplier–supplier edges weighted by shared customers. The
    // quadratic hazard lives in power customers, so the projection
    // CAPS fan-out — customers with more than 40 distinct suppliers
    // are dropped and REPORTED (n_capped), the standard honesty knob
    // in co-occurrence pipelines. Pair generation is a per-customer
    // self-join of capped lists; output is the top 15 weighted pairs.
    q("graph_bipartite_project",
      """WITH cs AS (SELECT DISTINCT o_custkey c, l_suppkey s
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (SELECT c, count(*) d FROM cs GROUP BY 1),
        |kept AS (SELECT cs.c, cs.s FROM cs JOIN deg ON cs.c = deg.c
        |         WHERE deg.d <= 40),
        |capped AS (SELECT count(*)::BIGINT n_capped FROM deg
        |           WHERE d > 40),
        |pr AS (SELECT a.s s1, b.s s2, count(*)::BIGINT w
        |       FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
        |       GROUP BY 1, 2),
        |top AS (SELECT s1, s2, w FROM pr
        |        ORDER BY w DESC, s1, s2 LIMIT 15)
        |SELECT top.s1, top.s2, top.w, capped.n_capped
        |FROM top, capped ORDER BY w DESC, s1, s2""") { c =>
      val cs = c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val deg = cs.groupBy("c").agg(count(lit(1)).as("d"))
      val kept = cs.join(deg, Seq("c")).filter(col("d") <= 40)
        .select(col("c"), col("s"))
      val capped = deg.filter(col("d") > 40)
        .agg(count(lit(1)).as("n_capped"))
      val pr = kept.as("a")
        .join(kept.as("b"),
          col("a.c") === col("b.c") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
        .agg(count(lit(1)).as("w"))
      pr.orderBy(col("w").desc, col("s1"), col("s2")).limit(15)
        .crossJoin(broadcast(capped))
        .orderBy(col("w").desc, col("s1"), col("s2"))
    },

    q("graph_two_hop",
      """WITH e0 AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) u,
        |                   greatest(a.l_partkey, b.l_partkey) v
        |            FROM lineitem a JOIN lineitem b
        |              ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_partkey < b.l_partkey
        |              AND a.l_quantity > 40 AND b.l_quantity > 40),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |h2 AS (SELECT DISTINCT e1.u a, e2.v c
        |       FROM e e1 JOIN e e2 ON e1.v = e2.u
        |       WHERE e2.v <> e1.u),
        |x AS (SELECT h2.a, h2.c FROM h2
        |      LEFT JOIN e ON h2.a = e.u AND h2.c = e.v
        |      WHERE e.u IS NULL),
        |r AS (SELECT a node, count(*)::BIGINT reach2 FROM x GROUP BY 1)
        |SELECT node, reach2 FROM r
        |ORDER BY reach2 DESC, node LIMIT 20""") { c =>
      val pick = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = pick.as("a")
        .join(pick.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      val h2 = e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .filter(col("e2.v") =!= col("e1.u"))
        .select(col("e1.u").as("a"), col("e2.v").as("c"))
        .distinct()
      val x = h2.join(e,
          h2("a") === e("u") && h2("c") === e("v"), "left_anti")
      x.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("reach2"))
        .orderBy(col("reach2").desc, col("node")).limit(20)
    },

    // Katz centrality (Katz 1953) — the attenuated WALK-count
    // centrality beside PageRank's normalized random walk and HITS'
    // mutual reinforcement: c(v) = Σ_k β^k · |walks of length k ending
    // at v|, truncated at k=3 with dyadic β = 1/4, so every term is an
    // exact integer walk count divided by a power of two — engine-
    // exact with zero iteration drift (the unrolled-iteration oracle
    // stance). Walk counts recurse as p_k(v) = Σ_{u→v} p_{k-1}(u) —
    // two equi-joins over the distinct nation-level edge projection
    // (the corpus is scanned ONCE to build the edges; everything after
    // runs on the ≤ nations² edge list).
    q("graph_katz",
      """WITH e AS (SELECT DISTINCT s.s_nationkey u, c.c_nationkey v
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer c ON o_custkey = c.c_custkey
        |  JOIN supplier s ON l_suppkey = s.s_suppkey
        |  WHERE l_quantity > 45),
        |p1 AS (SELECT v, count(*)::BIGINT p FROM e GROUP BY 1),
        |p2 AS (SELECT e.v, sum(p1.p)::BIGINT p FROM e
        |       JOIN p1 ON p1.v = e.u GROUP BY 1),
        |p3 AS (SELECT e.v, sum(p2.p)::BIGINT p FROM e
        |       JOIN p2 ON p2.v = e.u GROUP BY 1),
        |n AS (SELECT DISTINCT v FROM
        |      (SELECT u AS v FROM e UNION ALL SELECT v FROM e))
        |SELECT n.v::BIGINT AS node,
        |  coalesce(p1.p, 0)::BIGINT AS walks1,
        |  coalesce(p2.p, 0)::BIGINT AS walks2,
        |  coalesce(p3.p, 0)::BIGINT AS walks3,
        |  round(coalesce(p1.p, 0) / 4.0 + coalesce(p2.p, 0) / 16.0
        |        + coalesce(p3.p, 0) / 64.0 + 1e-9, 6) AS katz
        |FROM n LEFT JOIN p1 ON p1.v = n.v
        |LEFT JOIN p2 ON p2.v = n.v LEFT JOIN p3 ON p3.v = n.v
        |ORDER BY node""") { c =>
      val e = c.lineitem.filter(col("l_quantity") > 45)
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c.customer.select(col("c_custkey"),
          col("c_nationkey").as("v"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(c.supplier.select(col("s_suppkey"),
          col("s_nationkey").as("u"))), col("l_suppkey") === col("s_suppkey"))
        .select(col("u"), col("v")).distinct()
        .localCheckpoint() // three walk steps re-join the same edges
      val p1 = e.groupBy("v").agg(count(lit(1)).as("p"))
      val p2 = e.join(p1.select(col("v").as("u"), col("p")), Seq("u"))
        .groupBy("v").agg(sum(col("p")).as("p"))
      val p3 = e.join(p2.select(col("v").as("u"), col("p")), Seq("u"))
        .groupBy("v").agg(sum(col("p")).as("p"))
      val nodes = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node"))).distinct()
      nodes
        .join(p1.select(col("v").as("node"), col("p").as("w1")),
          Seq("node"), "left")
        .join(p2.select(col("v").as("node"), col("p").as("w2")),
          Seq("node"), "left")
        .join(p3.select(col("v").as("node"), col("p").as("w3")),
          Seq("node"), "left")
        .select(col("node").cast("long").as("node"),
          coalesce(col("w1"), lit(0L)).as("walks1"),
          coalesce(col("w2"), lit(0L)).as("walks2"),
          coalesce(col("w3"), lit(0L)).as("walks3"),
          r6(coalesce(col("w1"), lit(0L)) / lit(4.0) +
            coalesce(col("w2"), lit(0L)) / lit(16.0) +
            coalesce(col("w3"), lit(0L)) / lit(64.0)).as("katz"))
        .orderBy("node")
    },

    // Betweenness centrality — Brandes (2001) dependency accumulation,
    // made 100-TB-shaped by the two standard truncations: PIVOT
    // sources (Brandes & Pich 2007 — a deterministic 25% of nodes,
    // suppkey % 4 = 0) and BOUNDED distance k = 3 (k-betweenness,
    // Borgatti 2006), so the estimator's cost is pivots × bounded BFS
    // instead of n × full BFS. Forward pass: 3 frontier expansions of
    // exact integer path counts σ (anti-joins exclude earlier
    // levels); backward pass: δ_l(s,u) = Σ (σ_u/σ_v)(1+δ_{l+1}) over
    // (u→v) predecessor links — every per-group sum folds in pinned
    // successor/source order (the text_lm_ppl stance), so the doubles
    // are engine- and partition-exact. Graph: suppliers co-supplying
    // a part (one corpus scan builds the distinct edge list; every
    // later join runs on graph-sized relations).
    q("graph_betweenness",
      """WITH sp AS (SELECT DISTINCT l_partkey pk, l_suppkey sk
        |  FROM lineitem WHERE l_quantity > 49),
        |pdeg AS (SELECT pk, count(*) d FROM sp GROUP BY 1),
        |kept AS (SELECT sp.pk, sp.sk FROM sp JOIN pdeg
        |         ON sp.pk = pdeg.pk WHERE pdeg.d <= 40),
        |capped AS (SELECT count(*)::BIGINT n_capped FROM pdeg
        |           WHERE d > 40),
        |adj AS (SELECT DISTINCT a.sk u, b.sk v
        |        FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk <> b.sk),
        |nodes AS (SELECT DISTINCT u n FROM adj),
        |d1 AS (SELECT u s, v, 1::BIGINT sig FROM adj WHERE u % 4 = 0),
        |d2c AS (SELECT d1.s, adj.v, sum(d1.sig)::BIGINT sig
        |        FROM d1 JOIN adj ON adj.u = d1.v GROUP BY 1, 2),
        |d2 AS (SELECT c.* FROM d2c c WHERE c.v <> c.s
        |       AND NOT EXISTS (SELECT 1 FROM d1
        |                       WHERE d1.s = c.s AND d1.v = c.v)),
        |d3c AS (SELECT d2.s, adj.v, sum(d2.sig)::BIGINT sig
        |        FROM d2 JOIN adj ON adj.u = d2.v GROUP BY 1, 2),
        |d3 AS (SELECT c.* FROM d3c c WHERE c.v <> c.s
        |       AND NOT EXISTS (SELECT 1 FROM d1
        |                       WHERE d1.s = c.s AND d1.v = c.v)
        |       AND NOT EXISTS (SELECT 1 FROM d2
        |                       WHERE d2.s = c.s AND d2.v = c.v)),
        |del2 AS (SELECT d2.s, d2.v AS u,
        |    list_reduce(list(d2.sig::DOUBLE / d3.sig ORDER BY d3.v),
        |      (p2, q2) -> p2 + q2) dl
        |  FROM d2 JOIN adj ON adj.u = d2.v
        |  JOIN d3 ON d3.s = d2.s AND d3.v = adj.v
        |  GROUP BY 1, 2),
        |del1 AS (SELECT d1.s, d1.v AS u,
        |    list_reduce(list(d1.sig::DOUBLE / d2.sig
        |        * (1.0 + coalesce(del2.dl, 0.0)) ORDER BY d2.v),
        |      (p2, q2) -> p2 + q2) dl
        |  FROM d1 JOIN adj ON adj.u = d1.v
        |  JOIN d2 ON d2.s = d1.s AND d2.v = adj.v
        |  LEFT JOIN del2 ON del2.s = d2.s AND del2.u = d2.v
        |  GROUP BY 1, 2),
        |contrib AS (SELECT u AS v, s, dl FROM del1
        |            UNION ALL SELECT u, s, dl FROM del2),
        |b AS (SELECT v,
        |        list_reduce(list(dl ORDER BY s), (p2, q2) -> p2 + q2)
        |          / 2 bc
        |      FROM contrib GROUP BY v)
        |SELECT nodes.n::BIGINT AS node,
        |  round(coalesce(b.bc, 0.0) + 1e-9, 6) AS betweenness,
        |  capped.n_capped
        |FROM nodes LEFT JOIN b ON b.v = nodes.n, capped
        |ORDER BY node""") { c =>
      val sp = c.lineitem.filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      // Degree cap on the co-supply projection (the
      // graph_bipartite_project device, r10 verdict #2): adj = sp ⋈ sp
      // ON pk SQUARES on a hot part, so parts with more than 40
      // distinct suppliers are dropped from the projection and
      // REPORTED (n_capped). On TPC-H nothing is capped (the generator
      // fixes suppliers-per-part at 4), but the generic operator
      // carries the knob: a capped projection is a SAMPLED adjacency,
      // consistent with the pivot estimator's existing approximation
      // contract (25% sources, k=3 bounded distance).
      val pdeg = sp.groupBy("pk").agg(count(lit(1)).as("d"))
      val kept = sp.join(pdeg, Seq("pk")).filter(col("d") <= 40)
        .select(col("pk"), col("sk"))
      val capped = pdeg.filter(col("d") > 40)
        .agg(count(lit(1)).as("n_capped"))
      val adj = kept.as("a")
        .join(kept.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("u"), col("b.sk").as("v")).distinct()
        .localCheckpoint() // forward + backward passes re-join it
      val nodes = adj.select(col("u").as("n")).distinct()
      val d1 = adj.filter(col("u") % 4 === 0)
        .select(col("u").as("s"), col("v"), lit(1L).as("sig"))
      def expand(prev: org.apache.spark.sql.DataFrame) =
        prev.select(col("s"), col("v").as("u0"), col("sig"))
          .join(adj.select(col("u").as("u0"), col("v")), Seq("u0"))
          .groupBy("s", "v").agg(sum(col("sig")).as("sig"))
      val d2 = expand(d1).filter(col("v") =!= col("s"))
        .join(d1.select("s", "v"), Seq("s", "v"), "left_anti")
        .localCheckpoint()
      val d3 = expand(d2).filter(col("v") =!= col("s"))
        .join(d1.select("s", "v"), Seq("s", "v"), "left_anti")
        .join(d2.select("s", "v"), Seq("s", "v"), "left_anti")
      def pinnedSum(term: org.apache.spark.sql.Column) =
        aggregate(array_sort(collect_list(struct(col("w"),
          term.as("t")))), lit(0.0), (a, x) => a + x.getField("t"))
      val del2 = d2.select(col("s"), col("v").as("u"),
          col("sig").as("sig2"))
        .join(adj.select(col("u"), col("v").as("w")), Seq("u"))
        .join(d3.select(col("s"), col("v").as("w"),
          col("sig").as("sig3")), Seq("s", "w"))
        .groupBy("s", "u")
        .agg(pinnedSum(col("sig2").cast("double") / col("sig3"))
          .as("dl"))
      val del1 = d1.select(col("s"), col("v").as("u"),
          col("sig").as("sig1"))
        .join(adj.select(col("u"), col("v").as("w")), Seq("u"))
        .join(d2.select(col("s"), col("v").as("w"),
          col("sig").as("sig2")), Seq("s", "w"))
        .join(del2.select(col("s"), col("u").as("w"),
          col("dl").as("dl2")), Seq("s", "w"), "left")
        .groupBy("s", "u")
        .agg(pinnedSum((col("sig1").cast("double") / col("sig2")) *
          (lit(1.0) + coalesce(col("dl2"), lit(0.0)))).as("dl"))
      val contrib = del1.select(col("u").as("v"), col("s"), col("dl"))
        .unionAll(del2.select(col("u").as("v"), col("s"), col("dl")))
      val b = contrib.groupBy("v")
        .agg((aggregate(array_sort(collect_list(struct(col("s"),
            col("dl").as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")) / lit(2)).as("bc"))
      nodes.join(b, col("n") === col("v"), "left")
        .crossJoin(broadcast(capped)) // 1-row aggregate (bounded BNLJ)
        .select(col("n").cast("long").as("node"),
          r6(coalesce(col("bc"), lit(0.0))).as("betweenness"),
          col("n_capped"))
        .orderBy("node")
    },

    // Diameter lower bound by the double-BFS sweep (Magnien, Latapy &
    // Habib 2009; the iFUB initialization) — the standard cheap
    // estimator for "how wide is this graph": BFS from a deterministic
    // seed, take the farthest node u (ties: min id), BFS again from u;
    // ecc(u) is a provably-good diameter lower bound at the cost of
    // TWO BFS passes instead of n. Both sweeps are k-BOUNDED (4 hops,
    // the pivot-estimator stance — on this co-supply graph the true
    // diameter is far smaller, and a bounded sweep is a fixed serial
    // job-chain cost at any scale) and run as ops/Bfs layered frontier
    // expansions (node-keyed equi-joins, localCheckpoint per level,
    // nothing collects but two 1-row argmax picks). Same capped
    // projection as graph_betweenness; the oracle replays both sweeps
    // as depth-bounded recursive CTEs (UNION-deduped (node, dist)
    // pairs, min per node — the documented bounded-walk pattern).
    q("graph_diameter_2sweep",
      """WITH RECURSIVE sp AS (SELECT DISTINCT l_partkey pk,
        |    l_suppkey sk FROM lineitem WHERE l_quantity > 49),
        |pdeg AS (SELECT pk, count(*) d FROM sp GROUP BY 1),
        |kept AS (SELECT sp.pk, sp.sk FROM sp JOIN pdeg
        |         ON sp.pk = pdeg.pk WHERE pdeg.d <= 40),
        |e AS (SELECT DISTINCT a.sk u, b.sk v
        |      FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk <> b.sk),
        |seed AS (SELECT min(u) s FROM e),
        |r1(node, dist) AS (
        |  SELECT s, 0 FROM seed
        |  UNION
        |  SELECT e.v, r1.dist + 1 FROM r1 JOIN e ON e.u = r1.node
        |  WHERE r1.dist < 4),
        |d1 AS (SELECT node, min(dist) d FROM r1 GROUP BY 1),
        |per AS (SELECT node FROM d1 ORDER BY d DESC, node LIMIT 1),
        |r2(node, dist) AS (
        |  SELECT node, 0 FROM per
        |  UNION
        |  SELECT e.v, r2.dist + 1 FROM r2 JOIN e ON e.u = r2.node
        |  WHERE r2.dist < 4),
        |d2 AS (SELECT node, min(dist) d FROM r2 GROUP BY 1)
        |SELECT seed.s::BIGINT AS seed,
        |  (SELECT node FROM per)::BIGINT AS peripheral,
        |  (SELECT max(d) FROM d2)::BIGINT AS diameter_lb,
        |  (SELECT count(*) FROM d2)::BIGINT AS n_reached
        |FROM seed""") { c =>
      val sp = c.lineitem.filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val pdeg = sp.groupBy("pk").agg(count(lit(1)).as("d"))
      val kept = sp.join(pdeg, Seq("pk")).filter(col("d") <= 40)
        .select(col("pk"), col("sk"))
      val e = kept.as("a")
        .join(kept.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
        .localCheckpoint() // both sweeps re-join it
      val seed = e.agg(min(col("src")).as("node"))
      val d1 = graft.ops.Bfs.hops(e, seed.select(col("node")), 4)
      // 1-row argmax picks (driver-side by design: the sweep's pivot)
      val u = d1.orderBy(col("dist").desc, col("node")).limit(1)
        .select(col("node"))
      val d2 = graft.ops.Bfs.hops(e, u, 4)
      val agg2 = d2.agg(max(col("dist")).as("diameter_lb"),
        count(lit(1)).as("n_reached"))
      seed.select(col("node").cast("long").as("seed"))
        .crossJoin(broadcast(u.select(col("node").cast("long")
          .as("peripheral"))))
        .crossJoin(broadcast(agg2))
    },

    // Rich-club coefficient (Zhou & Mondragón 2004; Colizza et al.
    // 2006 for the normalization stance — raw φ reported here):
    // φ(k) = 2·E_k / (N_k·(N_k−1)) — among the nodes of degree > k,
    // what fraction of their possible mutual links exist? The
    // hub-interconnection profile a degree histogram cannot see.
    // Same capped co-supply projection as graph_betweenness (per-part
    // degree ≤ 40, n_capped reported — no uncapped corpus-scale
    // self-join key); degrees from ONE edge aggregation; each k of
    // the 3-value literal grid filters node and edge sets by
    // broadcast, so the sweep costs three filtered counts, never a
    // per-k rebuild.
    q("graph_rich_club",
      """WITH sp AS (SELECT DISTINCT l_partkey pk, l_suppkey sk
        |  FROM lineitem WHERE l_quantity > 49),
        |pdeg AS (SELECT pk, count(*) d FROM sp GROUP BY 1),
        |kept AS (SELECT sp.pk, sp.sk FROM sp JOIN pdeg
        |         ON sp.pk = pdeg.pk WHERE pdeg.d <= 40),
        |capped AS (SELECT count(*)::BIGINT n_capped FROM pdeg
        |           WHERE d > 40),
        |e AS (SELECT DISTINCT a.sk u, b.sk v
        |      FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk < b.sk),
        |deg AS (SELECT node, count(*)::BIGINT d FROM (
        |          SELECT u node FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |ks AS (SELECT unnest([2, 4, 8]) k),
        |nk AS (SELECT ks.k, count(*)::BIGINT n_nodes
        |       FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
        |ek AS (SELECT ks.k, count(*)::BIGINT n_edges
        |       FROM ks JOIN e ON TRUE
        |       JOIN deg du ON du.node = e.u AND du.d > ks.k
        |       JOIN deg dv ON dv.node = e.v AND dv.d > ks.k
        |       GROUP BY 1)
        |SELECT ks.k::INT AS k,
        |  coalesce(nk.n_nodes, 0)::BIGINT AS n_nodes,
        |  coalesce(ek.n_edges, 0)::BIGINT AS n_edges,
        |  CASE WHEN coalesce(nk.n_nodes, 0) > 1
        |       THEN round(2.0 * coalesce(ek.n_edges, 0)
        |            / (nk.n_nodes * (nk.n_nodes - 1)) + 1e-9, 6)
        |  END AS phi,
        |  capped.n_capped
        |FROM ks LEFT JOIN nk ON nk.k = ks.k
        |LEFT JOIN ek ON ek.k = ks.k, capped
        |ORDER BY k""") { c =>
      val sp = c.lineitem.filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val pdeg = sp.groupBy("pk").agg(count(lit(1)).as("d"))
      val kept = sp.join(pdeg, Seq("pk")).filter(col("d") <= 40)
        .select(col("pk"), col("sk"))
      val capped = pdeg.filter(col("d") > 40)
        .agg(count(lit(1)).as("n_capped"))
      val e = kept.as("a")
        .join(kept.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
        .select(col("a.sk").as("u"), col("b.sk").as("v")).distinct()
        .localCheckpoint() // degree pass + per-k edge counts re-read it
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val ks = c.spark.range(1)
        .select(explode(typedlit(Seq(2, 4, 8))).as("k"))
      val nk = ks.join(deg, col("d") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_nodes"))
      val ek = e
        .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
        .join(broadcast(ks), col("du") > col("k") && col("dv") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_edges"))
      ks.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
        .crossJoin(broadcast(capped)) // 1-row aggregate
        .select(col("k").cast("int").as("k"),
          coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          when(coalesce(col("n_nodes"), lit(0L)) > 1,
            r6(lit(2.0) * coalesce(col("n_edges"), lit(0L)) /
              (col("n_nodes") * (col("n_nodes") - 1)))).as("phi"),
          col("n_capped"))
        .orderBy("k")
    },

    // 4-truss peel, 3 pinned rounds (Cohen 2008, "Trusses: cohesive
    // subgraphs for social network analysis") — the EDGE-cohesion
    // sibling of graph_kcore's node peel: an edge survives a k-truss
    // round iff it closes ≥ k−2 triangles, which strips the
    // bridge/spam edges triangle counts alone can't localize. Rounds
    // are PINNED at 3 (the oracle unrolls them; a fixpoint loop would
    // be data-dependent) and each round reports the shrinking edge
    // census — the scale shape is per round one triangle enumeration
    // (two equi-joins over canonical u<v edges, the graph_triangles
    // pattern), a 2-column support aggregation, and a filtering join;
    // rounds persist so round r+1 reads cached edges, never replays
    // the whole peel history.
    q("graph_ktruss",
      """WITH e0 AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) u,
        |              greatest(a.l_partkey, b.l_partkey) v
        |            FROM lineitem a JOIN lineitem b
        |              ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_partkey < b.l_partkey
        |              AND a.l_quantity > 40 AND b.l_quantity > 40),
        |t1 AS (SELECT e1.u a, e1.v b, e2.v c FROM e0 e1
        |       JOIN e0 e2 ON e1.v = e2.u
        |       JOIN e0 e3 ON e1.u = e3.u AND e2.v = e3.v),
        |p1 AS (SELECT a u, b v FROM t1 UNION ALL SELECT b, c FROM t1
        |       UNION ALL SELECT a, c FROM t1),
        |s1 AS (SELECT u, v, count(*)::BIGINT s FROM p1 GROUP BY 1, 2),
        |e1 AS (SELECT e.u, e.v FROM e0 e LEFT JOIN s1
        |       ON e.u = s1.u AND e.v = s1.v
        |       WHERE coalesce(s1.s, 0) >= 2),
        |t2 AS (SELECT e1a.u a, e1a.v b, e2a.v c FROM e1 e1a
        |       JOIN e1 e2a ON e1a.v = e2a.u
        |       JOIN e1 e3a ON e1a.u = e3a.u AND e2a.v = e3a.v),
        |p2 AS (SELECT a u, b v FROM t2 UNION ALL SELECT b, c FROM t2
        |       UNION ALL SELECT a, c FROM t2),
        |s2 AS (SELECT u, v, count(*)::BIGINT s FROM p2 GROUP BY 1, 2),
        |e2 AS (SELECT e.u, e.v FROM e1 e LEFT JOIN s2
        |       ON e.u = s2.u AND e.v = s2.v
        |       WHERE coalesce(s2.s, 0) >= 2),
        |t3 AS (SELECT e1b.u a, e1b.v b, e2b.v c FROM e2 e1b
        |       JOIN e2 e2b ON e1b.v = e2b.u
        |       JOIN e2 e3b ON e1b.u = e3b.u AND e2b.v = e3b.v),
        |p3 AS (SELECT a u, b v FROM t3 UNION ALL SELECT b, c FROM t3
        |       UNION ALL SELECT a, c FROM t3),
        |s3 AS (SELECT u, v, count(*)::BIGINT s FROM p3 GROUP BY 1, 2),
        |e3 AS (SELECT e.u, e.v FROM e2 e LEFT JOIN s3
        |       ON e.u = s3.u AND e.v = s3.v
        |       WHERE coalesce(s3.s, 0) >= 2)
        |SELECT 1::BIGINT AS round, count(*)::BIGINT AS n_edges,
        |       min(u * 1000000 + v)::BIGINT AS min_edge,
        |       max(u * 1000000 + v)::BIGINT AS max_edge FROM e1
        |UNION ALL
        |SELECT 2::BIGINT, count(*)::BIGINT,
        |       min(u * 1000000 + v)::BIGINT,
        |       max(u * 1000000 + v)::BIGINT FROM e2
        |UNION ALL
        |SELECT 3::BIGINT, count(*)::BIGINT,
        |       min(u * 1000000 + v)::BIGINT,
        |       max(u * 1000000 + v)::BIGINT FROM e3
        |ORDER BY round""") { c =>
      val hi = c.lineitem.filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      // each round materializes behind an EAGER localCheckpoint leaf
      // (the SetSimJoin checkpointed-variant stance for one-shot
      // pipelines): with lazy persist markers, round r's logical plan
      // re-inlines round r−1's tree at ~4 reuse sites (3 triangle
      // aliases + the filter join), so analysis cost grew ~4^rounds —
      // the r12 gate tripwire caught the smoke-scale sweep spending
      // 91 s PLANNING this query. Checkpoint leaves keep every
      // round's plan O(1) deep; the peel is consumed once, so no warm
      // cache reuse is forfeited.
      val e0 = hi.as("a")
        .join(hi.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
        .localCheckpoint(true)
      def peel(e: org.apache.spark.sql.DataFrame) = {
        val tri = e.as("e1")
          .join(e.as("e2"), col("e1.v") === col("e2.u"))
          .join(e.as("e3"),
            col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
          .select(col("e1.u").as("a"), col("e1.v").as("b"),
            col("e2.v").as("cc"))
        val sup = tri.select(col("a").as("u"), col("b").as("v"))
          .union(tri.select(col("b").as("u"), col("cc").as("v")))
          .union(tri.select(col("a").as("u"), col("cc").as("v")))
          .groupBy("u", "v").agg(count(lit(1)).as("s"))
        e.join(sup, Seq("u", "v"), "left")
          .filter(coalesce(col("s"), lit(0L)) >= 2)
          .select("u", "v")
          .localCheckpoint(true)
      }
      val rounds = Iterator.iterate(e0)(peel).slice(1, 4).toSeq
      rounds.zipWithIndex.map { case (e, i) =>
        e.agg(count(lit(1)).as("n_edges"),
            min(col("u") * 1000000L + col("v")).as("min_edge"),
            max(col("u") * 1000000L + col("v")).as("max_edge"))
          .select(lit((i + 1).toLong).as("round"), col("n_edges"),
            col("min_edge"), col("max_edge"))
      }.reduce(_ union _)
        .orderBy("round")
    },

    // Harmonic closeness centrality (Marchiori & Latora 2000; Boldi &
    // Vigna 2014 argue it is THE principled closeness on disconnected
    // graphs — unreached nodes contribute 0, not a broken 1/inf) from a
    // pinned seed sample, hop-bounded at 6: h(u) = sum over reached
    // v != u of 1/d(u,v). Runs as ONE simultaneous labeled multi-source
    // BFS (ops/Bfs.hopsFrom — all seeds advance together, so 10 seeds
    // cost the same rounds as one; per-level localCheckpoint lineage
    // cuts; the edge relation partitions by src once). EXACT
    // arithmetic: with d <= 6 every 1/d is the integer 2520/d over the
    // common denominator 2520 = lcm(1..8), so the numerator sums as a
    // BIGINT and the single final division is the only FP op. Same
    // capped co-supply projection as graph_diameter_2sweep (per-part
    // degree <= 40 — no uncapped corpus-scale self-join key); seeds =
    // suppliers with sk % 10 = 0, the pinned-sample stance a 100 TB
    // closeness sweep needs (exact all-pairs closeness is O(n*E)).
    q("graph_harmonic_closeness",
      """WITH RECURSIVE sp AS (SELECT DISTINCT l_partkey pk,
        |    l_suppkey sk FROM lineitem WHERE l_quantity > 49),
        |pdeg AS (SELECT pk, count(*) d FROM sp GROUP BY 1),
        |kept AS (SELECT sp.pk, sp.sk FROM sp JOIN pdeg
        |         ON sp.pk = pdeg.pk WHERE pdeg.d <= 40),
        |e AS (SELECT DISTINCT a.sk u, b.sk v
        |      FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk <> b.sk),
        |seeds AS (SELECT DISTINCT u s FROM e WHERE u % 10 = 0),
        |walk(root, node, dist) AS (
        |  SELECT s, s, 0 FROM seeds
        |  UNION
        |  SELECT walk.root, e.v, walk.dist + 1
        |  FROM walk JOIN e ON e.u = walk.node
        |  WHERE walk.dist < 6),
        |d AS (SELECT root, node, min(dist) dist FROM walk GROUP BY 1, 2)
        |SELECT root::BIGINT AS root, count(*)::BIGINT AS n_reached,
        |       max(dist)::BIGINT AS ecc_lb,
        |       sum(2520 // dist)::BIGINT AS hnum,
        |       round(sum(2520 // dist) / 2520.0 + 1e-9, 6) AS harmonic
        |FROM d WHERE node <> root
        |GROUP BY 1 ORDER BY root""") { c =>
      val sp = c.lineitem.filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val pdeg = sp.groupBy("pk").agg(count(lit(1)).as("d"))
      val kept = sp.join(pdeg, Seq("pk")).filter(col("d") <= 40)
        .select(col("pk"), col("sk"))
      val e = kept.as("a")
        .join(kept.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
      val seeds = e.filter(col("src") % 10 === 0)
        .select(col("src").as("root")).distinct()
      val d = graft.ops.Bfs.hopsFrom(e, seeds, maxHops = 6)
      d.filter(col("node") =!= col("root"))
        .groupBy(col("root").cast("long").as("root"))
        .agg(count(lit(1)).as("n_reached"),
          max(col("dist")).as("ecc_lb"),
          sum(expr("2520 div dist")).as("hnum"),
          r6(sum(expr("2520 div dist")) / lit(2520.0)).as("harmonic"))
        .orderBy("root")
    },

    // EFFECTIVE diameter at the 90th percentile (Leskovec, Kleinberg &
    // Faloutsos 2005 — the graph-over-time statistic; the exact
    // diameter is outlier-driven, the 90%-quantile hop distance is the
    // robust "how far apart are nodes really" number) from the SAME
    // pinned seed sample and capped co-supply graph as
    // graph_harmonic_closeness: pool every sampled (root, node) hop
    // distance from ONE labeled multi-source BFS, histogram by
    // distance (<= 8 bins), and take the smallest d with
    // 10*cum >= 9*total — an exact integer rank, no FP percentile
    // call. Mean distance reported from the same exact sums.
    q("graph_effective_diameter",
      """WITH RECURSIVE sp AS (SELECT DISTINCT l_partkey pk,
        |    l_suppkey sk FROM lineitem WHERE l_quantity > 49),
        |pdeg AS (SELECT pk, count(*) d FROM sp GROUP BY 1),
        |kept AS (SELECT sp.pk, sp.sk FROM sp JOIN pdeg
        |         ON sp.pk = pdeg.pk WHERE pdeg.d <= 40),
        |e AS (SELECT DISTINCT a.sk u, b.sk v
        |      FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk <> b.sk),
        |seeds AS (SELECT DISTINCT u s FROM e WHERE u % 10 = 0),
        |walk(root, node, dist) AS (
        |  SELECT s, s, 0 FROM seeds
        |  UNION
        |  SELECT walk.root, e.v, walk.dist + 1
        |  FROM walk JOIN e ON e.u = walk.node
        |  WHERE walk.dist < 8),
        |dd AS (SELECT root, node, min(dist) dist FROM walk
        |       GROUP BY 1, 2),
        |p AS (SELECT dist FROM dd WHERE node <> root),
        |h AS (SELECT dist, count(*)::BIGINT cnt FROM p GROUP BY 1),
        |cu AS (SELECT dist, cnt, sum(cnt) OVER (ORDER BY dist) cum
        |       FROM h),
        |t AS (SELECT count(*)::BIGINT m, sum(dist)::BIGINT sd,
        |        max(dist)::BIGINT mx,
        |        (SELECT count(*) FROM seeds)::BIGINT ns FROM p),
        |ed AS (SELECT min(dist)::BIGINT d90 FROM cu, t
        |       WHERE 10 * cum >= 9 * m)
        |SELECT t.ns AS n_seeds, t.m AS n_pairs, t.mx AS max_dist,
        |  ed.d90 AS eff_diameter_90,
        |  round(t.sd * 1.0 / t.m + 1e-9, 6) AS mean_dist
        |FROM t, ed""") { c =>
      val sp = c.lineitem.filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val pdeg = sp.groupBy("pk").agg(count(lit(1)).as("d"))
      val kept = sp.join(pdeg, Seq("pk")).filter(col("d") <= 40)
        .select(col("pk"), col("sk"))
      val e = kept.as("a")
        .join(kept.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
      val seeds = e.filter(col("src") % 10 === 0)
        .select(col("src").as("root")).distinct()
      val nSeeds = seeds.agg(count(lit(1)).as("ns"))
      val p = graft.ops.Bfs.hopsFrom(e, seeds, maxHops = 8)
        .filter(col("node") =!= col("root")).select(col("dist"))
      val h = p.groupBy("dist").agg(count(lit(1)).as("cnt"))
      val cu = h.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy("dist")))
      val t = p.agg(count(lit(1)).as("m"), sum(col("dist")).as("sd"),
        max(col("dist")).as("mx"))
      val ed = cu.crossJoin(broadcast(t))
        .filter(lit(10) * col("cum") >= lit(9) * col("m"))
        .agg(min(col("dist")).as("d90"))
      broadcast(nSeeds).crossJoin(broadcast(t))
        .crossJoin(broadcast(ed))
        .select(col("ns").as("n_seeds"), col("m").as("n_pairs"),
          col("mx").as("max_dist"), col("d90").as("eff_diameter_90"),
          r6(col("sd") * 1.0 / col("m")).as("mean_dist"))
    },

    // Power-law degree-distribution fit (Clauset, Shalizi & Newman
    // 2009 — the continuous MLE α̂ = 1 + n·[Σ ln(d/(dmin−½))]⁻¹ with
    // dmin pinned at 2): is the co-supply graph heavy-tailed, and how
    // heavy? The diagnostic behind hub-aware partitioning decisions
    // (an α near 2 says skew-salt your joins; see graph_rich_club for
    // WHO the hubs are). Same capped co-supply projection as
    // graph_betweenness. The degree HISTOGRAM is exact integers; each
    // distinct degree contributes cnt·ln(d/1.5) with ln over an
    // identical double ratio on both engines (the adamic-adar device),
    // folded in PINNED degree order. Scale: the whole fit reads the
    // ≤40-row degree histogram after one edge aggregation.
    q("graph_powerlaw_mle",
      """WITH sp AS (SELECT DISTINCT l_partkey pk, l_suppkey sk
        |  FROM lineitem WHERE l_quantity > 49),
        |pdeg AS (SELECT pk, count(*) d FROM sp GROUP BY 1),
        |kept AS (SELECT sp.pk, sp.sk FROM sp JOIN pdeg
        |         ON sp.pk = pdeg.pk WHERE pdeg.d <= 40),
        |e AS (SELECT DISTINCT a.sk u, b.sk v
        |      FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk < b.sk),
        |deg AS (SELECT node, count(*)::BIGINT d FROM (
        |          SELECT u node FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |h AS (SELECT d, count(*)::BIGINT cnt FROM deg
        |      WHERE d >= 2 GROUP BY 1),
        |f AS (SELECT sum(cnt)::BIGINT n_tail, max(d)::BIGINT max_d,
        |        list_reduce(list(cnt * ln(d / 1.5) ORDER BY d),
        |          (a, x) -> a + x) sl
        |      FROM h)
        |SELECT 2 AS dmin, n_tail, max_d,
        |  round(1.0 + n_tail / sl + 1e-9, 6) AS alpha,
        |  round((1.0 + n_tail / sl - 1.0) / sqrt(n_tail) + 1e-9, 6)
        |    AS alpha_se
        |FROM f""") { c =>
      val sp2 = c.lineitem.filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val pdeg = sp2.groupBy("pk").agg(count(lit(1)).as("d"))
      val kept = sp2.join(pdeg, Seq("pk")).filter(col("d") <= 40)
        .select(col("pk"), col("sk"))
      val e = kept.as("a")
        .join(kept.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
        .select(col("a.sk").as("u"), col("b.sk").as("v")).distinct()
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val h = deg.filter(col("d") >= 2).groupBy("d")
        .agg(count(lit(1)).as("cnt"))
      val f = h.agg(sum(col("cnt")).as("n_tail"),
        max(col("d")).as("max_d"),
        aggregate(array_sort(collect_list(struct(col("d"),
            (col("cnt") * log(col("d") / lit(1.5))).as("tm")))),
          lit(0.0), (a, x) => a + x.getField("tm")).as("sl"))
      f.select(lit(2).as("dmin"), col("n_tail"), col("max_d"),
        r6(lit(1.0) + col("n_tail") / col("sl")).as("alpha"),
        r6((lit(1.0) + col("n_tail") / col("sl") - lit(1.0)) /
          sqrt(col("n_tail"))).as("alpha_se"))
    },
  )
}
