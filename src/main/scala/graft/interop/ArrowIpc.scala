package graft.interop

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Distributed Arrow IPC directory source/sink — the interchange data
  * plane next to parquet (the reference moves every result as Arrow:
  * to_pyarrow_batches / Flight do_get, expr/api.py:590-678). Layout
  * mirrors a parquet directory: `part-NNNNN.arrow` stream files plus
  * `_SUCCESS`, each file written by its own partition — no driver
  * collect, no single-writer bottleneck, and any Arrow-native reader
  * (pyarrow.ipc, DuckDB, DataFusion) consumes the files directly.
  *
  * Scale: write is one distributed pass (each task streams its
  * partition through a bounded record-batch buffer); read lists files
  * on the driver (metadata only) and decodes them across the cluster,
  * one task per file, preserving the write parallelism.
  */
object ArrowIpc {

  /** Write `df` as a directory of Arrow IPC stream files. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val dir = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(dir.toUri, conf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    // executors build a fresh Configuration (the session conf is not
    // serializable); fine for local/default-configured filesystems
    val pathStr = dir.toString
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val part = new Path(pathStr, f"part-$pid%05d.arrow")
      val pfs = FileSystem.get(part.toUri, new Configuration())
      val out = pfs.create(part, true)
      try ArrowCodec.encodeTo(schema, rows, out)
      finally out.close()
      Iterator.single(1)
    }.count()
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  /** Read a directory of Arrow IPC stream files back as a DataFrame
    * through the [[ArrowDataSource]] DSv2 provider: a real BatchScan
    * (column pruning reaches the decoder), one partition per part
    * file, `_SUCCESS`-gated listing, streams decoded without a byte
    * array (no 2 GiB part cap), and off-heap buffers released via the
    * reader's task-managed close — LIMIT/early-abort safe. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("arrow-ipc").load(path)

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
