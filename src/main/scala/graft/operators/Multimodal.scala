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

  final case class ResizedMedia(
      doc_id: Long, mime: String, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: a real pipeline decodes + scales pixels here; the fake
    * keeps the byte budget proportional to the target area so output
    * sizing behaves like a resize. Deterministic in (payload, w, h);
    * partition-parallel with per-partition "codec" amortization.
    */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: init scaler context once per partition
      it.map { r =>
        val budget = math.max(1, math.min(r.payload.length, w * h / 16))
        ResizedMedia(r.doc_id, r.mime, w, h, r.payload.take(budget))
      }
    }
  }

  final case class Frame(doc_id: Long, frameIndex: Int, offsetBytes: Long, payload: Array[Byte])

  /** STUB frame sampling: emits `n` evenly spaced "frames" per media item
    * (byte slices standing in for decoded frames) — the 1→N explode shape
    * of a video pipeline, flatMap'd per partition so a real demuxer can
    * stream without materializing the whole file.
    */
  def frameSample(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val len = r.payload.length
        if (len == 0) Iterator.empty
        else {
          val k = math.min(n, len)
          (0 until k).iterator.map { i =>
            val off = i.toLong * len / k
            val end = math.min(len, off.toInt + math.max(1, len / k))
            Frame(r.doc_id, i, off, java.util.Arrays.copyOfRange(r.payload, off.toInt, end))
          }
        }
      }
    }
  }
}
