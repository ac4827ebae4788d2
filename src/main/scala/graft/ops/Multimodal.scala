package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed decode.
  *
  * The reference treats non-tabular payloads as byte columns flowing
  * through table-in/table-out exchange functions (xorq flight UDXF,
  * expr/relations.py:580-823). The Spark-native shape is the same: a
  * `binary` column, decoded partition-by-partition by a typed function
  * with an explicit output schema — here `Dataset#mapPartitions` over a
  * case-class row, the Scala analogue of `mapInPandas` batches.
  *
  * The DECODE ITSELF IS A STUB (this container has no image/audio
  * codecs): `decodeStub` derives deterministic fake metadata from the
  * bytes. The Spark-side contract — binary column in, typed struct out,
  * partition-local, no shuffle, no driver collect — is the real,
  * tested part and is what survives a codec swap at 100 TB.
  */
object Multimodal {

  /** Decoded "media" metadata (fake). */
  final case class Decoded(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      head_csv: String)

  /** Attach an opaque binary payload column derived from text (stand-in
    * for a real image/audio column in the driver's synthetic data). */
  def withBinaryPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Partition-local stub decode: binary → typed metadata. Real decode
    * would call the codec here; everything around it (schema, encoder,
    * partitioning) is production-shaped. */
  def decodeStub(df: DataFrame, idCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        // a NULL payload is an empty medium, not a task-killing NPE
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        val n = bytes.length.toLong
        Decoded(
          doc_id = id,
          n_bytes = n,
          width = (n % 640L).toInt,
          height = (n % 480L).toInt,
          channels = 1 + (n % 3L).toInt,
          head_csv = bytes.take(3).map(b => (b & 0xff).toString)
            .mkString(","))
      })
  }
}
