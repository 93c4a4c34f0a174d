package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads ride as opaque `binary` columns with
  * typed metadata, and per-item decode/feature-extraction runs
  * partition-parallel over batches — the Scala shape of a
  * `mapInPandas`-style pipeline.
  *
  * NOTE: this container ships no image/audio codecs, so [[decodeStub]] is
  * a clearly-marked deterministic FAKE decoder. Everything around it —
  * schema, batching, partition parallelism, feature output shape — is the
  * real plumbing a codec would drop into.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, byteLen: Int,
      width: Int, height: Int, channels: Int, byteEntropyBucket: Int)

  /** STUB: stands in for a real image/audio decode (e.g. JPEG dims +
    * channel count). Deterministic in the payload bytes only.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val len = r.payload.length
    val b0 = if (len > 0) r.payload(0) & 0xff else 0
    val b1 = if (len > 1) r.payload(1) & 0xff else 0
    val hist = r.payload.foldLeft(0)((acc, b) => acc ^ (b & 0xff))
    MediaFeatures(r.doc_id, r.mime, len,
      width = b0 % 64 + 1, height = b1 % 64 + 1,
      channels = if (r.mime.startsWith("image")) 3 else 1,
      byteEntropyBucket = hist % 16)
  }

  /** Batch feature extraction: per-partition iterator (decoder state would
    * be initialized once per partition, amortized over the batch).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: open codec context here, reuse across the batch
      it.map(decodeStub)
    }
  }

  /** Adapter: documents table → media records (payload = UTF-8 bytes as a
    * stand-in blob; real datasets carry actual image/audio bytes).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        concat(lit("image/stub-"), col("source")).as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
