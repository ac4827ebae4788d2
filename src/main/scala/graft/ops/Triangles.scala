package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration by degree-ordered node iteration
  * (the compact-forward / Schank–Wagner construction; the same shape
  * MapReduce triangle counting uses — Suri & Vassilvitskii 2011).
  *
  * Scale shape (100 TB of edges):
  *  - Each undirected edge is ORIENTED from its (degree, id)-smaller
  *    endpoint to the larger. Every out-neighborhood then has size
  *    O(sqrt(m)), so the wedge join's per-key fan-out is bounded even
  *    on power-law graphs — the hub that would explode a naive
  *    neighbor join becomes the TARGET of its edges, never the pivot.
  *  - Wedges (a→b, a→c with b before c in the same total order) are a
  *    self-equi-join on the pivot a; closure is one more equi-join on
  *    (b, c). Three shuffles total, all AQE-re-plannable; no
  *    collect, no per-node adjacency materialization on the driver.
  *  - Each triangle is emitted exactly once (its vertices appear in
  *    total order), so counts need no de-duplication pass.
  */
object Triangles {

  /** All triangles of the undirected graph given by (src,dst) pairs —
    * one row (a, b, c) per triangle with a≺b≺c in the (degree, id)
    * total order. Self-loops dropped; parallel edges collapsed. */
  def enumerate(edges: DataFrame, src: String, dst: String): DataFrame = {
    Components.requireIntegralIds(edges, "Triangles.enumerate", src, dst)
    val e0 = edges
      .select(col(src).cast("long").as("x"), col(dst).cast("long").as("y"))
      .filter(col("x") =!= col("y") && col("x").isNotNull && col("y").isNotNull)
    val und = e0
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct()

    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))

    val wd = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    // orient small-(deg,id) → large; carry the head's degree so wedges
    // can order their two heads without re-joining degrees
    val oriented = wd.select(
      when(col("du") < col("dv") ||
           (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))

    val left = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val right = oriented.select(col("s"), col("t").as("c"), col("dt").as("dc"))
    val wedges = left.join(right, "s")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val closing = oriented.select(col("s").as("b"), col("t").as("c"))
    wedges.join(closing, Seq("b", "c"))
      .select(col("s").as("a"), col("b"), col("c"))
  }

  /** Per-node triangle participation counts. */
  def perNodeCounts(edges: DataFrame, src: String, dst: String): DataFrame =
    enumerate(edges, src, dst)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_n"))
}
