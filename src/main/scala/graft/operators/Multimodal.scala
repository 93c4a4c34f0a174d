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
  * stays exercisable on corpora without media bytes.
  *
  * Audio decode is REAL for WAV/PCM16 through the JDK's own
  * `javax.sound.sampled` ([[decodeWav]]), and video DEMUX is REAL for
  * three containers: MJPEG-in-AVI (a plain RIFF container walked by
  * [[demuxAvi]], whose frames are JPEGs the image path already decodes),
  * animated GIF (a flat block stream walked by [[demuxGif]], decoded by
  * `javax.imageio`'s multi-frame GIF reader) and ISO BMFF MP4/MOV
  * ([[demuxMp4]] — moov/trak/stbl walker recovering codec fourcc, dims,
  * timescale and every sample's true byte offset from the
  * stsc/stco/stsz tables; the samples stay codec-compressed since
  * H.264/HEVC have no pure-JVM decoder). Other payloads keep the
  * documented stub fallback.
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

  /** Block-mean perceptual hash (the aHash family's exact-arithmetic
    * variant): the image is cut into an 8×8 grid of pixel blocks
    * (integer floor boundaries `i·h/8`), each block's scaled-luma sum
    * (299r+587g+114b per pixel) is compared against the GLOBAL mean by
    * exact cross-multiplication — `blockSum·nTotal > totalSum·nBlock` —
    * so there is no division and no float anywhere, and two engines (or
    * a hand calculation) agree bit for bit. Bit `y·8+x` is set when the
    * block is strictly brighter than the image mean; returned as two
    * unsigned 32-bit halves in BIGINTs (bits 0-31, 32-63) so no sign
    * bit is ever touched. Near-duplicate images are then a Hamming
    * distance on 16 bytes — the image analog of `sim_hamming_topk`.
    */
  def imagePhash(r: MediaRecord): Option[(Long, Long)] = readImage(r.payload).map { img =>
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = Array.ofDim[Long](8, 8)
    val counts = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      val by = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val bx = math.min(7, x * 8 / w)
        val rgb = img.getRGB(x, y)
        sums(by)(bx) += (rgb >> 16 & 0xff) * 299L + (rgb >> 8 & 0xff) * 587L + (rgb & 0xff) * 114L
        counts(by)(bx) += 1L
        x += 1
      }
      y += 1
    }
    val totalSum = sums.map(_.sum).sum
    val nTotal = w.toLong * h
    // cross-multiplication stays in Long up to ~4 MP (sum ≤ n·255000,
    // product ≤ n²·255000/64 < 2^63 for n ≤ 2^22); larger images take
    // the BigInt path — still exact, just not the hot case
    val big = nTotal > (1L << 22)
    var lo = 0L; var hi = 0L
    for (by <- 0 until 8; bx <- 0 until 8) {
      // exact: blockMean > globalMean  ⟺  blockSum·nTotal > totalSum·nBlock
      val brighter =
        if (big) BigInt(sums(by)(bx)) * nTotal > BigInt(totalSum) * counts(by)(bx)
        else sums(by)(bx) * nTotal > totalSum * counts(by)(bx)
      if (brighter) {
        val bit = by * 8 + bx
        if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
      }
    }
    (lo, hi)
  }

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

  // ------------------------------------------------------------- audio

  final case class AudioFeatures(
      doc_id: Long, sampleRate: Int, channels: Int, nFrames: Long,
      sumSq: Long, zeroCrossings: Long)

  /** RIFF/WAVE magic: `RIFF....WAVE`. */
  def looksWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

  /** REAL audio decode for WAV payloads through the JDK's own codec
    * (`javax.sound.sampled.AudioSystem` — no external library): exact
    * frame count, sample rate and channel count from the stream format,
    * plus two integer-exact signal features every audio-curation pipeline
    * filters on — the energy `Σ s²` over ALL samples (all channels) and
    * the zero-crossing count of channel 0 (`s_i · s_{i-1} < 0`). 16-bit
    * PCM only (the interchange format); other encodings return None and
    * fall to the stub path.
    */
  def decodeWav(r: MediaRecord): Option[AudioFeatures] =
    if (!looksWav(r.payload)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val ch = fmt.getChannels
          val bytes = in.readAllBytes()
          val frameSize = fmt.getFrameSize // = 2 * ch for PCM16
          val nFrames = bytes.length.toLong / frameSize
          val big = fmt.isBigEndian
          def sampleAt(off: Int): Int = {
            val (b0, b1) = (bytes(off) & 0xff, bytes(off + 1) & 0xff)
            (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
          }
          var sumSq = 0L
          var zc = 0L
          var prev0 = 0
          var f = 0
          while (f < nFrames) {
            val base = f * frameSize
            var c = 0
            while (c < ch) {
              val s = sampleAt(base.toInt + 2 * c)
              sumSq += s.toLong * s
              if (c == 0) {
                if (f > 0 && s.toLong * prev0 < 0) zc += 1
                prev0 = s
              }
              c += 1
            }
            f += 1
          }
          Some(AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, ch, nFrames, sumSq, zc))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  final case class AudioWindowFeatures(
      doc_id: Long, window: Long, nFrames: Long,
      sumSq: Long, zeroCrossings: Long)

  /** Frame-WINDOWED audio features over the same real WAV decode — the
    * per-segment energy/ZCR sequence a speech-curation pipeline feeds to
    * VAD / silence trimming / segment selection (decodeWav's aggregates
    * tell you ABOUT a clip; the windowed sequence is what lets you CUT
    * it). Window w covers frames [w·win, min((w+1)·win, n)); sumSq spans
    * all channels in the window, zero crossings count channel-0 sign
    * flips between consecutive frames WITHIN the window (a flip whose
    * frame pair straddles a window boundary is DROPPED — neither window
    * counts it — hence Σ window zc ≤ decodeWav's global zc, equal when
    * no flip lands exactly on a boundary split). All outputs are
    * integer-exact, so closed-form oracles replay them (mm_audio_features).
    */
  def wavWindowFeatures(r: MediaRecord, windowFrames: Int): Seq[AudioWindowFeatures] =
    if (!looksWav(r.payload) || windowFrames <= 0) Seq.empty
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) Seq.empty
        else {
          val ch = fmt.getChannels
          val bytes = in.readAllBytes()
          val frameSize = fmt.getFrameSize
          val nFrames = bytes.length.toLong / frameSize
          val big = fmt.isBigEndian
          def sampleAt(off: Int): Int = {
            val (b0, b1) = (bytes(off) & 0xff, bytes(off + 1) & 0xff)
            (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindowFeatures]
          var w = 0L
          while (w * windowFrames < nFrames) {
            val a = w * windowFrames
            val b = math.min(a + windowFrames, nFrames)
            var sumSq = 0L
            var zc = 0L
            var prev0 = 0
            var f = a
            while (f < b) {
              val base = (f * frameSize).toInt
              var c = 0
              while (c < ch) {
                val s = sampleAt(base + 2 * c)
                sumSq += s.toLong * s
                if (c == 0) {
                  if (f > a && s.toLong * prev0 < 0) zc += 1
                  prev0 = s
                }
                c += 1
              }
              f += 1
            }
            out += AudioWindowFeatures(r.doc_id, w, b - a, sumSq, zc)
            w += 1
          }
          out.toSeq
        }
      } finally in.close()
    } catch { case _: Exception => Seq.empty }

  /** PCM16 → WAV bytes through the SAME JDK codec (round-trip partner of
    * [[decodeWav]]); `samples` is frame-interleaved when `channels` > 1.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Batch audio features: real for WAV payloads, stub-shaped zeros are
    * NOT silently substituted — non-audio payloads are dropped (a real
    * pipeline routes them to the image/stub branch instead).
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decodeWav))
  }

  // ------------------------------------------------------------- video

  /** Demuxed MJPEG video: container metadata plus each frame's byte
    * offset (of the chunk payload inside the AVI file) and JPEG bytes.
    */
  final case class VideoInfo(
      width: Int, height: Int, microSecPerFrame: Long,
      frames: IndexedSeq[(Long, Array[Byte])])

  /** RIFF/AVI magic: `RIFF....AVI `. */
  def looksAvi(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'A' && payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' '

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL video demux for MJPEG-in-AVI — AVI is a plain RIFF container
    * (chunk = fourCC + LE32 size + data, word-aligned; `LIST` chunks
    * nest), so a ~40-line walker recovers the stream without any native
    * demuxer: `avih` in `LIST hdrl` carries dims and frame timing
    * (dwMicroSecPerFrame at +0, dwWidth/dwHeight at +32/+36), and every
    * `??dc`/`??db` chunk inside `LIST movi` is one complete JPEG frame
    * that `javax.imageio` decodes like any other image. Codecs other than
    * MJPEG would need a real decoder — those payloads return None and
    * keep the stub path.
    */
  def demuxAvi(payload: Array[Byte]): Option[VideoInfo] =
    if (!looksAvi(payload)) None
    else try {
      var width, height = 0
      var usPerFrame = 0L
      val frames = IndexedSeq.newBuilder[(Long, Array[Byte])]
      // walk [from, to) as a sequence of chunks, descending into LISTs
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourCC(payload, p)
          val sz = le32(payload, p + 4).toInt
          val dataOff = p + 8
          val dataEnd = math.min(to, dataOff + sz)
          if (id == "LIST" && sz >= 4) {
            val listType = fourCC(payload, dataOff)
            walk(dataOff + 4, dataEnd, inMovi || listType == "movi")
          } else if (id == "avih" && sz >= 40) {
            usPerFrame = le32(payload, dataOff)
            width = le32(payload, dataOff + 32).toInt
            height = le32(payload, dataOff + 36).toInt
          } else if (inMovi && sz > 0 && id.length == 4 &&
                     (id.endsWith("dc") || id.endsWith("db"))) {
            frames += ((dataOff.toLong,
              java.util.Arrays.copyOfRange(payload, dataOff, dataEnd)))
          }
          p = dataOff + sz + (sz & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(payload.length, 8 + le32(payload, 4).toInt), inMovi = false)
      val fs = frames.result()
      if (fs.isEmpty) None else Some(VideoInfo(width, height, usPerFrame, fs))
    } catch { case _: Exception => None }

  /** GIF87a / GIF89a magic. */
  def looksGif(payload: Array[Byte]): Boolean =
    payload.length >= 6 &&
      payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') &&
      payload(5) == 'a'

  /** REAL multi-frame demux for animated GIF — the second genuine video
    * container next to [[demuxAvi]]. GIF is a flat block stream (logical
    * screen descriptor, then extensions `0x21`, image descriptors `0x2C`,
    * trailer `0x3B`; all variable-length data rides in length-prefixed
    * sub-blocks), so a short walker recovers every frame's true byte
    * offset and its raw descriptor+LZW-data slice without touching the
    * codec. Frame timing comes from the first Graphic Control Extension's
    * centisecond delay; decode of any frame goes through `javax.imageio`'s
    * stock multi-frame GIF reader (see the `mm_gif_frames` gate query).
    * Each returned slice starts at its `0x2C` image separator and carries
    * the per-frame dims at descriptor offsets 5/7 ([[gifFrameDims]]).
    */
  def demuxGif(payload: Array[Byte]): Option[VideoInfo] =
    if (!looksGif(payload) || payload.length < 14) None
    else try {
      val p = payload
      def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
      val width = le16(6)
      val height = le16(8)
      val packed = p(10) & 0xff
      var pos = 13
      if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
      var usPerFrame = 0L
      val frames = IndexedSeq.newBuilder[(Long, Array[Byte])]
      def skipSubBlocks(): Unit = {
        var len = p(pos) & 0xff; pos += 1
        while (len != 0) { pos += len; len = p(pos) & 0xff; pos += 1 }
      }
      var done = false
      while (!done && pos < p.length) {
        (p(pos) & 0xff) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: introducer, label, sub-blocks
            val extStart = pos
            val label = p(pos + 1) & 0xff
            pos += 2
            // GCE: size(4), packed, delay LE16 in 1/100 s, transp, 0x00
            if (label == 0xf9 && usPerFrame == 0L && (p(pos) & 0xff) >= 4)
              usPerFrame = le16(extStart + 4).toLong * 10000L
            skipSubBlocks()
          case 0x2c => // image descriptor: left, top, w, h (LE16), packed
            val start = pos
            val ipacked = p(pos + 9) & 0xff
            pos += 10
            if ((ipacked & 0x80) != 0) pos += 3 * (1 << ((ipacked & 7) + 1))
            pos += 1 // LZW minimum code size
            skipSubBlocks()
            frames += ((start.toLong, java.util.Arrays.copyOfRange(p, start, pos)))
          case _ => done = true // unknown block type — salvage what parsed
        }
      }
      val fs = frames.result()
      if (fs.isEmpty) None else Some(VideoInfo(width, height, usPerFrame, fs))
    } catch { case _: Exception => None }

  /** Per-frame dims straight from a [[demuxGif]] slice's image descriptor
    * (w/h LE16 at offsets 5/7 past the `0x2C` separator).
    */
  def gifFrameDims(frame: Array[Byte]): Option[(Int, Int)] =
    if (frame.length < 10 || (frame(0) & 0xff) != 0x2c) None
    else Some((
      (frame(5) & 0xff) | ((frame(6) & 0xff) << 8),
      (frame(7) & 0xff) | ((frame(8) & 0xff) << 8)))

  /** Minimal MJPEG/AVI muxer (the round-trip partner of [[demuxAvi]] for
    * tests and executor-generated fixtures): RIFF(`AVI `) → LIST hdrl
    * (avih + LIST strl(strh + strf)) → LIST movi (`00dc` JPEG chunks).
    */
  def muxAviMjpeg(width: Int, height: Int, microSecPerFrame: Long,
                  frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def struct(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(bb); bb.array()
    }
    val avih = struct(56) { bb =>
      bb.putInt(microSecPerFrame.toInt) // dwMicroSecPerFrame
      bb.putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, flags(HASINDEX off)
      bb.putInt(frames.size) // dwTotalFrames
      bb.putInt(0).putInt(1).putInt(0) // initialFrames, streams, suggestedBuf
      bb.putInt(width).putInt(height)
    }
    val strh = struct(56) { bb =>
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      bb.putInt(0).putInt(0).putInt(0) // flags, prio+lang, initialFrames
      bb.putInt(microSecPerFrame.toInt).putInt(1000000) // scale, rate → fps
      bb.putInt(0).putInt(frames.size) // start, length
    }
    val strf = struct(40) { bb => // BITMAPINFOHEADER
      bb.putInt(40).putInt(width).putInt(height)
      bb.putShort(1).putShort(24)
      bb.put("MJPG".getBytes("US-ASCII"))
      bb.putInt(width * height * 3)
    }
    def subChunk(b: ByteArrayOutputStream, id: String, body: Array[Byte]): Unit = {
      b.write(id.getBytes("US-ASCII"))
      val len = body.length
      b.write(len & 0xff); b.write((len >> 8) & 0xff)
      b.write((len >> 16) & 0xff); b.write((len >> 24) & 0xff)
      b.write(body)
      if ((len & 1) == 1) b.write(0)
    }
    // a LIST chunk's body is its list-type fourCC followed by sub-chunks
    def list(listType: String)(body: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(listType.getBytes("US-ASCII"))
      body(b)
      b.toByteArray
    }
    val strl = list("strl") { b => subChunk(b, "strh", strh); subChunk(b, "strf", strf) }
    val hdrl = list("hdrl") { b =>
      subChunk(b, "avih", avih)
      subChunk(b, "LIST", strl)
    }
    val movi = list("movi") { b => frames.foreach(f => subChunk(b, "00dc", f)) }
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    subChunk(riffBody, "LIST", hdrl)
    subChunk(riffBody, "LIST", movi)
    val body = riffBody.toByteArray
    tag("RIFF"); w32(body.length); out.write(body)
    out.toByteArray
  }

  // ------------------------------------------------------------ MP4/MOV

  /** Demuxed ISO BMFF (MP4/MOV) video track: codec fourcc + dims from the
    * `stsd` sample entry, `timescale` from `mdhd`, `sampleDelta` from the
    * first `stts` run, and every sample's TRUE byte position `(offset,
    * size)` reconstructed from the `stsc`/`stco`(/`co64`)/`stsz` tables.
    */
  final case class Mp4Video(
      codec: String, width: Int, height: Int,
      timescale: Long, sampleDelta: Long,
      frames: IndexedSeq[(Long, Long)])

  /** ISO BMFF magic: a `ftyp` box header at offset 4. */
  def looksMp4(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(4) == 'f' && payload(5) == 't' && payload(6) == 'y' && payload(7) == 'p'

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  /** REAL MP4/MOV demux — the AVI RIFF walker's ISO-BMFF sibling. MP4 is
    * a box tree (BE32 size + fourCC; size 1 → 64-bit largesize follows,
    * size 0 → to end of enclosure), so a pure-JVM walker descends
    * `moov/trak/mdia/minf/stbl` and rebuilds the video track: codec
    * fourcc + dims from the `stsd` VisualSampleEntry, timescale from
    * `mdhd` (v0 and v1), per-frame timing from `stts`, and every
    * sample's true byte offset+size by expanding `stsc` (sample→chunk
    * runs) against `stco`/`co64` chunk offsets and `stsz` sizes — the
    * exact tables a seeking player uses. Only the track whose `hdlr` is
    * `vide` is returned. Sample BYTES stay codec-compressed (H.264/HEVC
    * need a real decoder — the documented stub boundary); the demux
    * itself, like the reference's opaque media events
    * (client/src/main/java/io/pravega/client/stream/EventStreamWriter.java:75),
    * never inspects them.
    */
  def demuxMp4(payload: Array[Byte]): Option[Mp4Video] =
    if (!looksMp4(payload)) None
    else try {
      // generic box walk over [from, to): f(type, bodyStart, bodyEnd)
      def walk(from: Long, to: Long)(f: (String, Long, Long) => Unit): Unit = {
        var p = from
        while (p + 8 <= to) {
          val sz0 = be32(payload, p.toInt)
          val typ = fourCC(payload, p.toInt + 4)
          var body = p + 8
          val end = sz0 match {
            case 0 => to // box runs to the end of its enclosure
            case 1 => val l = be64(payload, p.toInt + 8); body = p + 16; p + l
            case s => p + s
          }
          if (end < body || end > to) return // corrupt size — stop this level
          f(typ, body, end)
          p = end
        }
      }
      var found: Option[Mp4Video] = None
      walk(0, payload.length) { (typ, moovS, moovE) =>
        if (typ == "moov") walk(moovS, moovE) { (t2, trakS, trakE) =>
          if (t2 == "trak" && found.isEmpty) {
            var handler = ""
            var timescale = 0L
            var codec = ""; var w = 0; var h = 0
            var sampleDelta = 0L
            var sizes: Array[Long] = Array.empty
            var chunkOffsets: Array[Long] = Array.empty
            var stscRuns: Array[(Long, Long)] = Array.empty // (firstChunk, samplesPerChunk)
            walk(trakS, trakE) { (t3, mdiaS, mdiaE) =>
              if (t3 == "mdia") walk(mdiaS, mdiaE) { (t4, bS, bE) =>
                t4 match {
                  case "mdhd" =>
                    val v = payload(bS.toInt) & 0xff
                    timescale = be32(payload, bS.toInt + (if (v == 1) 20 else 12))
                  case "hdlr" => handler = fourCC(payload, bS.toInt + 8)
                  case "minf" => walk(bS, bE) { (t5, minfS, minfE) =>
                    if (t5 == "stbl") walk(minfS, minfE) { (t6, sS, sE) =>
                      val b = sS.toInt
                      t6 match {
                        case "stsd" if be32(payload, b + 4) >= 1 =>
                          // first sample entry: size+fourcc header, then
                          // SampleEntry(8) + VisualSampleEntry pre(16),
                          // width/height BE16 at entry+32/34
                          val e = b + 8
                          codec = fourCC(payload, e + 4)
                          if (sE - e >= 36) {
                            w = ((payload(e + 32) & 0xff) << 8) | (payload(e + 33) & 0xff)
                            h = ((payload(e + 34) & 0xff) << 8) | (payload(e + 35) & 0xff)
                          }
                        case "stts" if be32(payload, b + 4) >= 1 =>
                          sampleDelta = be32(payload, b + 12) // first run's delta
                        case "stsz" =>
                          val fixed = be32(payload, b + 4)
                          val n = be32(payload, b + 8).toInt
                          sizes =
                            if (fixed != 0) Array.fill(n)(fixed)
                            else Array.tabulate(n)(i => be32(payload, b + 12 + 4 * i))
                        case "stco" =>
                          val n = be32(payload, b + 4).toInt
                          chunkOffsets = Array.tabulate(n)(i => be32(payload, b + 8 + 4 * i))
                        case "co64" =>
                          val n = be32(payload, b + 4).toInt
                          chunkOffsets = Array.tabulate(n)(i => be64(payload, b + 8 + 8 * i))
                        case "stsc" =>
                          val n = be32(payload, b + 4).toInt
                          stscRuns = Array.tabulate(n)(i =>
                            (be32(payload, b + 8 + 12 * i), be32(payload, b + 12 + 12 * i)))
                        case _ => ()
                      }
                    }
                  }
                  case _ => ()
                }
              }
            }
            if (handler == "vide" && sizes.nonEmpty && chunkOffsets.nonEmpty) {
              // expand sample→chunk runs against chunk offsets: samples
              // pack back to back inside each chunk
              val frames = IndexedSeq.newBuilder[(Long, Long)]
              var s = 0
              var run = 0
              var c = 0 // 0-based chunk index
              while (s < sizes.length && c < chunkOffsets.length) {
                while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= c + 1) run += 1
                val perChunk = math.max(1L, stscRuns.lift(run).map(_._2).getOrElse(1L)).toInt
                var off = chunkOffsets(c)
                var i = 0
                while (i < perChunk && s < sizes.length) {
                  frames += ((off, sizes(s)))
                  off += sizes(s)
                  s += 1; i += 1
                }
                c += 1
              }
              val fs = frames.result()
              if (fs.nonEmpty)
                found = Some(Mp4Video(codec, w, h, timescale, sampleDelta, fs))
            }
          }
        }
      }
      found
    } catch { case _: Exception => None }

  /** [[demuxMp4]] adapted to the [[frameSample]] contract: frame payload
    * = the raw (codec-compressed) sample bytes at its true offset.
    */
  def demuxMp4AsVideoInfo(payload: Array[Byte]): Option[VideoInfo] =
    demuxMp4(payload).map { v =>
      VideoInfo(v.width, v.height,
        if (v.timescale > 0) v.sampleDelta * 1000000L / v.timescale else 0L,
        v.frames.collect { case (off, len)
            if off >= 0 && off + len <= payload.length =>
          (off, java.util.Arrays.copyOfRange(payload, off.toInt, (off + len).toInt))
        })
    }

  /** Minimal ISO-BMFF muxer (the round-trip partner of [[demuxMp4]] for
    * tests and executor-generated fixtures): `ftyp` (24 bytes) → `mdat`
    * (samples packed in order, `samplesPerChunk` per chunk) → `moov`
    * with the full stbl (stsd/stts/stsc/stsz/stco or co64). mdat
    * PRECEDES moov, so sample offsets are closed-form in the inputs:
    * sample j starts at 32 + Σ sizes of samples before j — what lets an
    * external oracle re-derive the walker's offsets arithmetically.
    */
  def muxMp4Video(width: Int, height: Int, timescale: Long, sampleDelta: Long,
                  codec: String, frames: Seq[Array[Byte]],
                  samplesPerChunk: Int = Int.MaxValue,
                  useCo64: Boolean = false): Array[Byte] = {
    require(codec.length == 4, s"codec fourcc must be 4 chars: $codec")
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8L + body.map(_.length.toLong).sum
      val bb = java.nio.ByteBuffer.allocate(len.toInt)
      bb.putInt(len.toInt)
      bb.put(typ.getBytes("US-ASCII"))
      body.foreach(bb.put)
      bb.array()
    }
    def full(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n) // big-endian by default
      fill(bb); bb.array()
    }
    val ftyp = box("ftyp", full(16) { bb =>
      bb.put("isom".getBytes("US-ASCII")); bb.putInt(0x200)
      bb.put("isom".getBytes("US-ASCII")); bb.put("iso2".getBytes("US-ASCII"))
    })
    val mdat = box("mdat", frames.toArray: _*)
    val mdatDataStart = ftyp.length + 8L
    val n = frames.size
    val spc = math.max(1, math.min(samplesPerChunk, n))
    val chunks = frames.grouped(spc).toSeq
    // chunk c starts where its first sample lands in the packed mdat
    val chunkOffs = chunks.scanLeft(mdatDataStart)((o, ch) =>
      o + ch.map(_.length.toLong).sum).dropRight(1)
    val duration = sampleDelta * n
    val mvhd = box("mvhd", full(100) { bb =>
      bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(timescale.toInt); bb.putInt(duration.toInt)
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
      bb.putLong(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      (0 until 6).foreach(_ => bb.putInt(0))
      bb.putInt(2) // next track id
    })
    val tkhd = box("tkhd", full(84) { bb =>
      bb.putInt(7); bb.putInt(0); bb.putInt(0) // version/flags(enabled|inMovie), times
      bb.putInt(1); bb.putInt(0); bb.putInt(duration.toInt) // track id, reserved, duration
      bb.putLong(0); bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(width << 16); bb.putInt(height << 16) // fixed 16.16
    })
    val mdhd = box("mdhd", full(24) { bb =>
      bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(timescale.toInt); bb.putInt(duration.toInt)
      bb.putShort(0x55c4.toShort); bb.putShort(0) // language 'und'
    })
    val hdlr = box("hdlr", full(25) { bb =>
      bb.putInt(0); bb.putInt(0)
      bb.put("vide".getBytes("US-ASCII"))
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.put(0.toByte) // reserved + empty name
    })
    val vmhd = box("vmhd", full(12) { bb => bb.putInt(1); bb.putLong(0) })
    val dref = box("dref", full(8) { bb => bb.putInt(0); bb.putInt(1) },
      box("url ", full(4)(_.putInt(1)))) // self-contained
    val dinf = box("dinf", dref)
    val sampleEntry = box(codec, full(78) { bb =>
      bb.putInt(0); bb.putShort(0); bb.putShort(1) // reserved + data_ref_index
      (0 until 4).foreach(_ => bb.putInt(0)) // pre_defined/reserved
      bb.putShort(width.toShort); bb.putShort(height.toShort)
      bb.putInt(0x00480000); bb.putInt(0x00480000); bb.putInt(0) // 72 dpi, reserved
      bb.putShort(1) // frame_count
      (0 until 32).foreach(_ => bb.put(0.toByte)) // compressorname
      bb.putShort(24); bb.putShort(-1) // depth, pre_defined
    })
    val stsd = box("stsd", full(8) { bb => bb.putInt(0); bb.putInt(1) }, sampleEntry)
    val stts = box("stts", full(16) { bb =>
      bb.putInt(0); bb.putInt(1); bb.putInt(n); bb.putInt(sampleDelta.toInt)
    })
    // one stsc run per distinct samples-per-chunk value change (the last
    // chunk may be short): runs are (first_chunk, samples_per_chunk, sdi)
    val runs = chunks.zipWithIndex.foldLeft(Vector.empty[(Int, Int)]) {
      case (acc, (ch, i)) =>
        if (acc.nonEmpty && acc.last._2 == ch.size) acc
        else acc :+ ((i + 1, ch.size))
    }
    val stsc = box("stsc", full(8 + 12 * runs.size) { bb =>
      bb.putInt(0); bb.putInt(runs.size)
      runs.foreach { case (fc, s) => bb.putInt(fc); bb.putInt(s); bb.putInt(1) }
    })
    val stsz = box("stsz", full(12 + 4 * n) { bb =>
      bb.putInt(0); bb.putInt(0); bb.putInt(n)
      frames.foreach(f => bb.putInt(f.length))
    })
    val stcoBox =
      if (useCo64) box("co64", full(8 + 8 * chunkOffs.size) { bb =>
        bb.putInt(0); bb.putInt(chunkOffs.size); chunkOffs.foreach(bb.putLong)
      })
      else box("stco", full(8 + 4 * chunkOffs.size) { bb =>
        bb.putInt(0); bb.putInt(chunkOffs.size); chunkOffs.foreach(o => bb.putInt(o.toInt))
      })
    val stbl = box("stbl", stsd, stts, stsc, stsz, stcoBox)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }

  final case class Frame(doc_id: Long, frameIndex: Int, offsetBytes: Long, payload: Array[Byte])

  /** Frame sampling: REAL for MJPEG-in-AVI, animated-GIF and MP4/MOV
    * payloads — [[demuxAvi]] / [[demuxGif]] / [[demuxMp4]] walk the
    * container and `n` evenly spaced frames come back with their true
    * byte offsets (`offsetBytes` = the frame's position in the file;
    * payload = the JPEG chunk for AVI, the raw image-descriptor slice
    * for GIF, the codec-compressed sample for MP4). Payloads in none of
    * the containers keep the deterministic byte-slice STUB (the 1→N
    * explode shape without a codec), flatMap'd per partition either way
    * so a demuxer streams without materializing the corpus.
    */
  def frameSample(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        demuxAvi(r.payload).orElse(demuxGif(r.payload))
            .orElse(demuxMp4AsVideoInfo(r.payload)) match {
          case Some(v) =>
            val k = math.min(n, v.frames.size)
            (0 until k).iterator.map { i =>
              val src = i * v.frames.size / k
              val (off, bytes) = v.frames(src)
              Frame(r.doc_id, i, off, bytes)
            }
          case None =>
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
}
