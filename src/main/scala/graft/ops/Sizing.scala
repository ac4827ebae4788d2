package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Partition-sizing advisor — the capacity arithmetic an operator runs
  * before pointing a job at 100 TB, computed from the actual input
  * footprint instead of guessed: how many scan partitions the files
  * will split into, what `spark.sql.shuffle.partitions` should be so a
  * post-shuffle partition lands near the target size, and whether a
  * relation is safely broadcastable. Pure metadata pass — lists file
  * statuses, reads no data.
  *
  * Heuristics are the standard production ones: ~128 MiB compressed per
  * partition target, shuffle partitions ≥ cluster parallelism so no
  * core idles, a ceiling so the scheduler isn't drowned in empty tasks,
  * and broadcast only under the session's autoBroadcastJoinThreshold
  * with a safety factor for the decompressed in-memory relation.
  */
object Sizing {

  final case class Advice(
      inputBytes: Long,
      nFiles: Int,
      scanPartitions: Int,
      shufflePartitions: Int,
      maxPartitionBytes: Long,
      broadcastSafe: Boolean,
      notes: Seq[String])

  /** Total bytes + file count under `paths` (recursive). */
  def footprint(spark: SparkSession, paths: Seq[String]): (Long, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    var bytes = 0L
    var n = 0
    paths.foreach { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) {
        val it = fs.listFiles(path, true)
        while (it.hasNext) {
          val st = it.next()
          if (!st.getPath.getName.startsWith("_")) {
            bytes += st.getLen; n += 1
          }
        }
      }
    }
    (bytes, n)
  }

  def advise(spark: SparkSession, paths: Seq[String],
             targetPartitionBytes: Long = 128L << 20,
             shufflePartitionCeiling: Int = 200000): Advice = {
    require(targetPartitionBytes > 0, "targetPartitionBytes must be > 0")
    val (bytes, nFiles) = footprint(spark, paths)
    val parallelism = spark.sparkContext.defaultParallelism
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val scanParts = math.max(1,
      math.ceil(bytes.toDouble / maxPart).toInt)
    val wanted = math.ceil(bytes.toDouble / targetPartitionBytes).toInt
    val shuffleParts = math.min(shufflePartitionCeiling,
      math.max(parallelism, wanted))
    val bcThreshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    // decompressed row format typically 2-4x the parquet footprint
    val broadcastSafe = bcThreshold > 0 && bytes * 4 <= bcThreshold
    val notes = Seq.newBuilder[String]
    if (nFiles > 0 && bytes / math.max(nFiles, 1) < (8L << 20))
      notes += s"small-files: avg ${bytes / math.max(nFiles, 1) >> 20} MiB/" +
        s"file over $nFiles files — compact (coalesce/rewrite) before " +
        "heavy reuse"
    if (wanted > shufflePartitionCeiling)
      notes += s"input wants $wanted shuffle partitions (> ceiling " +
        s"$shufflePartitionCeiling) — raise the ceiling or the target size"
    if (shuffleParts > parallelism * 4)
      notes += "shuffle partitions far exceed parallelism — expect " +
        "multiple waves (fine; bounds per-task memory)"
    Advice(bytes, nFiles, scanParts, shuffleParts, maxPart,
      broadcastSafe, notes.result())
  }
}
