package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge (Kimball SCD2): apply a batch
  * of new attribute values to a versioned dimension, closing changed
  * rows and inserting new current versions, keeping full history.
  *
  * The reference engine reaches this through its warehouse backends'
  * MERGE INTO; here it is a first-class relational operator over plain
  * DataFrames so it composes with WAP publishing (ops/Wap.scala) for
  * the audit-then-swap deployment of the updated dimension.
  *
  * Scale shape: ONE key equi-join between the current slice and the
  * update batch (broadcast when the batch is small — the common case:
  * daily deltas against a huge dimension), then a per-row explode that
  * emits 0/1/2 output rows. History rows never enter the join. No
  * window, no global sort; the dimension can stay bucketed by key and
  * the join co-locates.
  */
object Scd2 {

  /** Merge `updates` (key + attr columns, one row per key) into `dim`
    * (key + attr + valid_from/valid_to DATE columns; valid_to IS NULL
    * marks current rows) as of `batchDate`.
    *
    *  - changed attrs → old current row closed (valid_to = batchDate),
    *    new current row inserted (valid_from = batchDate);
    *  - identical attrs → untouched (idempotent re-merge);
    *  - unknown key → new current row;
    *  - keys absent from the batch, and all history rows → untouched.
    */
  def merge(dim: DataFrame, updates: DataFrame,
            keyCols: Seq[String], attrCols: Seq[String],
            batchDate: Column,
            validFrom: String = "valid_from",
            validTo: String = "valid_to"): DataFrame = {
    val cur = dim.filter(col(validTo).isNull)
    val hist = dim.filter(col(validTo).isNotNull)

    val u = updates.select(
      keyCols.map(col) ++
        attrCols.map(a => col(a).as(s"__u_$a")) :+
        lit(true).as("__in_upd"): _*)
    val cmark = cur.withColumn("__in_cur", lit(true))
    val j = cmark.join(u, keyCols, "full_outer")

    val inCur = col("__in_cur").isNotNull
    val inUpd = col("__in_upd").isNotNull
    val changed = attrCols.map(a => !(col(a) <=> col(s"__u_$a")))
      .reduce(_ || _)
    val bd = batchDate.cast("date")
    val nullDate = lit(null).cast("date")

    def rec(attrs: String => Column, vf: Column, vt: Column): Column =
      named_struct(
        (keyCols.flatMap(k => Seq(lit(k), col(k))) ++
          attrCols.flatMap(a => Seq(lit(a), attrs(a))) ++
          Seq(lit(validFrom), vf, lit(validTo), vt)): _*)

    val keepRec   = rec(a => col(a), col(validFrom), nullDate)
    val closedRec = rec(a => col(a), col(validFrom), bd)
    val newRec    = rec(a => col(s"__u_$a"), bd, nullDate)

    val merged = j.select(explode(
      when(inCur && inUpd && changed, array(closedRec, newRec))
        .when(inCur, array(keepRec))
        .otherwise(array(newRec))).as("r"))
      .select(col("r.*"))

    merged.unionByName(
      hist.select(keyCols.map(col) ++ attrCols.map(col) :+
        col(validFrom) :+ col(validTo): _*))
  }
}
