package graft.interop

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Distributed Arrow IPC directory source/sink — the interchange data
  * plane next to parquet (the reference moves every result as Arrow:
  * to_pyarrow_batches / Flight do_get, expr/api.py:590-678). Layout
  * mirrors a parquet directory: `part-NNNNN-<writeId>.arrow` stream
  * files plus `_SUCCESS`, each file written by its own partition — no
  * driver collect, no single-writer bottleneck, and any Arrow-native
  * reader (pyarrow.ipc, DuckDB, DataFusion) globbing `*.arrow`
  * consumes the files directly.
  *
  * Scale: write is one distributed pass (each task streams its
  * partition through a bounded record-batch buffer); read lists files
  * on the driver (metadata only) and decodes them across the cluster,
  * one task per file, preserving the write parallelism.
  */
object ArrowIpc {

  /** Write `df` as a directory of Arrow IPC stream files through the
    * [[ArrowDataSource]] DSv2 writer (staged attempt files + driver
    * commit — retry/speculation safe; `_SUCCESS` last, so a reader can
    * never observe a half-written directory). The target is removed
    * first: this helper's contract is "replace whatever was there",
    * including a schema change, which DSv2 overwrite-by-name
    * validation would otherwise reject. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) fs.delete(dir, true)
    df.write.format("arrow-ipc").mode("overwrite").save(path)
  }

  /** Read a directory of Arrow IPC stream files back as a DataFrame
    * through the [[ArrowDataSource]] DSv2 provider: a real BatchScan
    * (column pruning reaches the decoder), one partition per part
    * file, `_SUCCESS`-gated listing, streams decoded without a byte
    * array (no 2 GiB part cap), and off-heap buffers released via the
    * reader's task-managed close — LIMIT/early-abort safe. */
  def read(spark: SparkSession, path: String): DataFrame = {
    // eager gate: the provider's inferSchema is lenient about a
    // missing _SUCCESS (the WRITE path must see fresh/debris targets),
    // so enforce readability here where a read is unambiguous
    require(ArrowDataSource.isReadable(path,
      spark.sessionState.newHadoopConf()),
      s"$path has no _SUCCESS marker — incomplete or failed arrow write")
    spark.read.format("arrow-ipc").load(path)
  }

  /** Collect `df` into ONE in-memory IPC stream — the `to_pyarrow`
    * driver-side convenience (and the serve transport's inline data
    * plane). For big results use [[write]]; this materializes on the
    * driver by design. */
  def toBytes(df: DataFrame): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    ArrowCodec.encode(df.schema, df.toLocalIterator().asScala)
  }

  /** Parse one IPC stream into a (driver-local) DataFrame. */
  def fromBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val (schema, rows) = ArrowCodec.decode(bytes)
    fromRows(spark, schema, rows.toSeq)
  }

  private def fromRows(spark: SparkSession, schema: StructType,
      rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
}
