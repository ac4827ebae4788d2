package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed layered BFS (single/multi-source hop distances) over an
  * (src, dst) edge DataFrame — same "graphs are DataFrames" stance as
  * [[PageRank]] and [[Components]]: each level is one node-keyed
  * equi-join + distinct + anti-join, `localCheckpoint` cuts lineage per
  * level, and nothing ever collects to the driver. BFS level = exact
  * shortest hop distance, so a pinned `maxHops` run is SQL-replicable
  * with a bounded recursive CTE (`WHERE dist < maxHops` + min per
  * node), the reference-oracle pattern for iterative algorithms.
  *
  * Edges are treated as DIRECTED; symmetrize before calling for an
  * undirected graph. Nodes the BFS never reaches within `maxHops` are
  * absent from the output (matching the recursive-CTE oracle, which
  * also only materializes reached nodes).
  */
object Bfs {

  /** Conservative bytes/row of a frontier/dist row (node key + dist +
    * row overhead; node may be a string) for the broadcast estimate. */
  private val RowBytes = 48L

  /** Broadcast-hint a frontier/dist relation when its KNOWN row count
    * (maintained from the per-level counts the loop already takes)
    * fits the session broadcast threshold. The per-level relations are
    * localCheckpoint leaves with no size statistics, so the planner
    * was choosing SortMergeJoin for every frontier join and settled
    * anti-join — shuffling and sorting both sides each round (guide
    * §3.1). With the hint, a round's frontier join is a
    * BroadcastHashJoin that streams the src-partitioned edge relation
    * with NO exchange and no sort, and the anti-join builds the
    * settled set once. Scale-adaptive: a frontier or settled set
    * larger than the threshold (the 100 TB regime) keeps sort-merge. */
  private def maybeBroadcast(df: DataFrame, rows: Long): DataFrame = {
    val t = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (t > 0 && rows * RowBytes <= t) broadcast(df) else df
  }

  /** Hop distances from `sources` (a 1-column `node` DataFrame; any
    * orderable type matching the edge endpoints) after at most
    * `maxHops` expansion levels. Output columns: (node, dist). */
  def hops(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"bfs needs at least one hop, got $maxHops")
    // partition the (deduplicated) edges by src ONCE: the cached
    // InMemoryRelation keeps its HashPartitioning, so every round's
    // frontier join reuses it and only the (small) frontier side
    // shuffles — without this, all k rounds re-exchange the full edge
    // relation (the dominant cost of a short BFS on a big graph).
    // repartition BEFORE dropDuplicates: HashPartitioning(src) already
    // satisfies the dedup aggregate's (src, dst) clustering, so the
    // dedup rides the same exchange — distinct().repartition(src) paid
    // a second full shuffle of the edge relation for nothing (guide
    // §2.4; plan: 2 Exchange → 1).
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst").persist()
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    // row counts ride the actions the loop already takes (the level
    // emptiness check), so the broadcast decisions below are free
    var distN = dist.count()
    var frontier = dist.select(col("node"))
    var frontierN = distN
    var hop = 0
    var sinceCompact = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      // dist accumulates INCREMENTALLY as a union of per-level
      // localCheckpoint leaves — each (node) appears in exactly one
      // level, so the union is disjoint. Plan depth grows one union
      // node per round; every compactEvery rounds the accumulated
      // union is re-checkpointed into a single leaf, so plan size and
      // the anti-join's leaf count stay O(compactEvery) at ANY hop
      // bound (a flat re-checkpoint each round would re-materialize
      // all previous levels, O(levels²) rows copied — the compaction
      // cadence amortizes that to O(levels²/compactEvery) only when
      // maxHops is large, and to zero extra work for short sweeps).
      val fr = maybeBroadcast(frontier, frontierN)
      val next = e.join(fr, e("src") === fr("node"))
        .select(col("dst").as("node")).distinct()
        .join(maybeBroadcast(dist, distN), Seq("node"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint()
      val nextN = next.count()
      if (nextN == 0) exhausted = true
      else {
        sinceCompact += 1
        dist =
          if (sinceCompact >= compactEvery) {
            sinceCompact = 0
            dist.union(next).localCheckpoint()
          } else dist.union(next)
        distN += nextN
        frontier = next.select(col("node"))
        frontierN = nextN
      }
    }
    e.unpersist()
    dist
  }

  /** rounds between re-checkpoints of the accumulated distance
    * relation — bounds plan depth for deep sweeps without paying a
    * full re-materialization every round for shallow ones */
  private val compactEvery = 8

  /** Labeled multi-source hop distances: one simultaneous BFS per root
    * (all roots advance together, so k sources cost the same number of
    * rounds as one — the ref's batched-traversal stance re-expressed as
    * a (root, node)-keyed frontier join; ref python/xorq exposes graph
    * walks only through backend SQL, this is the Spark-native shape).
    * `sources` is a 1-column `root` DataFrame; every root starts at
    * itself with dist 0. Output columns: (root, node, dist) — exact
    * shortest hop distance per (root, node) pair, absent if unreached
    * within `maxHops`. The edge relation is partitioned by src once and
    * reused across rounds exactly as in [[hops]]; the frontier carries
    * the root label so the per-round state is O(Σ frontier sizes), and
    * per-level `localCheckpoint`s cut lineage the same way. */
  def hopsFrom(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"bfs needs at least one hop, got $maxHops")
    // one-exchange dedup+partition, exactly as in [[hops]]
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst").persist()
    var dist = sources.select(col("root")).distinct()
      .select(col("root"), col("root").as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var distN = dist.count()
    var frontier = dist.select(col("root"), col("node"))
    var frontierN = distN
    var hop = 0
    var sinceCompact = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      // same incremental-union + periodic-compaction accumulation and
      // count-driven broadcast decisions as [[hops]] — see there
      val fr = maybeBroadcast(frontier, frontierN)
      val next = e.join(fr, e("src") === fr("node"))
        .select(col("root"), col("dst").as("node")).distinct()
        .join(maybeBroadcast(dist, distN), Seq("root", "node"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint()
      val nextN = next.count()
      if (nextN == 0) exhausted = true
      else {
        sinceCompact += 1
        dist =
          if (sinceCompact >= compactEvery) {
            sinceCompact = 0
            dist.union(next).localCheckpoint()
          } else dist.union(next)
        distN += nextN
        frontier = next.select(col("root"), col("node"))
        frontierN = nextN
      }
    }
    e.unpersist()
    dist
  }
}
