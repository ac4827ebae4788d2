package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Count-driven broadcast decisions for iterative operators (guide
  * §3.1). The per-round relations of the iterative ops (BFS frontiers,
  * star-contraction min tables, PageRank rank/outdeg vectors, ALS
  * factor tables) are localCheckpoint/persist leaves with NO size
  * statistics, so the planner defaults every round's join to
  * SortMergeJoin — re-exchanging the big relation once per round. The
  * loops, however, usually KNOW the row count (from a convergence
  * action, a node count, or a bounded derivation), so the decision can
  * be made exactly, and scale-adaptively: a relation past the session
  * broadcast threshold (the 100 TB regime) keeps sort-merge, which is
  * the right strategy there.
  */
object JoinHints {

  /** Broadcast-hint `df` when `rows` at `rowBytes` apiece fits the
    * session autoBroadcastJoinThreshold; identity otherwise. The ONE
    * guarded implementation (rows < 0 = unknown = no hint) — Als, Bfs,
    * Components, KCore, LabelProp and PageRank all route here.
    *
    * `rowBytes` is the caller's estimate for its key type (40 for a
    * rank-2 factor row, 48 for (long, long) graph rows + overhead);
    * callers with wide string keys must pass a larger figure. A
    * plan-stats clamp is deliberately NOT applied: the relations this
    * hints are checkpoint/persisted leaves whose stats default to
    * spark.sql.defaultSizeInBytes (effectively infinite), so a stats
    * clamp would veto exactly the joins the hint exists to fix. */
  def maybeBroadcast(df: DataFrame, rows: Long, rowBytes: Long = 48L)
      : DataFrame = {
    val t = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (t > 0 && rows >= 0 && rows * rowBytes <= t) broadcast(df) else df
  }
}
