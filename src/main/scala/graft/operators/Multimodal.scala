package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal columns: media payloads ride as opaque `binary` columns with
  * typed metadata, and per-item decode/feature-extraction runs
  * partition-parallel over batches — the Scala shape of a
  * `mapInPandas`-style pipeline.
  *
  * Image decode and resize are REAL for the formats the JVM ships codecs
  * for (PNG/BMP/GIF/JPEG via `javax.imageio` — dispatched by payload
  * magic bytes, never by mime string). Payloads that aren't a decodable
  * image (e.g. the documents table's UTF-8 stand-in blobs) fall back to
  * [[decodeStub]], a clearly-marked deterministic FAKE, so the plumbing
  * stays exercisable on corpora without media bytes. Video frame
  * sampling stays a stub (no JVM demuxer).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, byteLen: Int,
      width: Int, height: Int, channels: Int, byteEntropyBucket: Int)

  /** PNG / JPEG / GIF / BMP magic bytes — the formats `javax.imageio`
    * decodes out of the box on any JDK.
    */
  def looksDecodableImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && {
      val b = payload
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M')
    }

  private def readImage(payload: Array[Byte]): Option[BufferedImage] =
    if (!looksDecodableImage(payload)) None
    else try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** REAL decode: exact dimensions and channel count from the decoded
    * image, plus a 16-way luminance-entropy bucket (Shannon entropy of
    * the 8-bit gray histogram, bits in [0,8], bucket = floor(2·H)) — the
    * kind of cheap quality signal an image-curation pipeline filters on.
    */
  def decodeImage(r: MediaRecord): Option[MediaFeatures] = readImage(r.payload).map { img =>
    val (w, h) = (img.getWidth, img.getHeight)
    val hist = new Array[Long](256)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist(lum) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; entropy -= p * math.log(p) / math.log(2.0) }
    }
    MediaFeatures(r.doc_id, r.mime, r.payload.length, w, h,
      channels = img.getColorModel.getNumComponents,
      byteEntropyBucket = math.min(15, (entropy * 2).toInt))
  }

  /** STUB: stands in for a decode of payloads with no JVM codec (audio,
    * video, or non-media blobs). Deterministic in the payload bytes only.
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

  /** Real image decode when the payload magic says the JVM can; stub
    * otherwise.
    */
  def decode(r: MediaRecord): MediaFeatures =
    decodeImage(r).getOrElse(decodeStub(r))

  /** Batch feature extraction: per-partition iterator (codec setup is
    * per-JVM — ImageIO's temp-file cache is disabled once per partition,
    * amortized over the batch).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false) // in-memory decode, no per-task temp files
      it.map(decode)
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

  /** REAL resize for decodable images: bilinear scale to (w, h), re-encoded
    * as PNG. Returns None when no JVM codec applies.
    */
  def resizeImage(r: MediaRecord, w: Int, h: Int): Option[ResizedMedia] =
    readImage(r.payload).map { img =>
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      try {
        gfx.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
      } finally gfx.dispose()
      val bytes = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bytes)
      ResizedMedia(r.doc_id, "image/png", w, h, bytes.toByteArray)
    }

  /** Resize: real pixels where a codec applies; for non-decodable
    * payloads the STUB keeps the byte budget proportional to the target
    * area so output sizing behaves like a resize. Deterministic in
    * (payload, w, h); partition-parallel.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        resizeImage(r, w, h).getOrElse {
          val budget = math.max(1, math.min(r.payload.length, w * h / 16))
          ResizedMedia(r.doc_id, r.mime, w, h, r.payload.take(budget))
        }
      }
    }
  }

  /** Back-compat alias for the documented stub path. */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] =
    resize(media, w, h)

  final case class Frame(doc_id: Long, frameIndex: Int, offsetBytes: Long, payload: Array[Byte])

  /** STUB frame sampling: emits `n` evenly spaced "frames" per media item
    * (byte slices standing in for decoded frames) — the 1→N explode shape
    * of a video pipeline, flatMap'd per partition so a real demuxer can
    * stream without materializing the whole file. Stays a stub: the JVM
    * ships no video demuxer.
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
