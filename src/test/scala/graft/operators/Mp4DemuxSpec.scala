package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** ISO BMFF (MP4/MOV) demux specs — spec parity with the AVI RIFF
  * walker: true offsets from the stsc/stco/stsz expansion, metadata from
  * mdhd/stsd, co64 and run-to-end box edge cases, corrupt-input safety,
  * and routing through `frameSample`.
  */
class Mp4DemuxSpec extends AnyFunSuite {

  private def frames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate[Byte](50 + 7 * f)(i => ((f * 31 + i) % 256).toByte))

  /** Expected (offset, size) of every sample for the muxer's layout:
    * mdat data starts at ftyp(24) + mdat header(8) = 32, samples packed
    * in order regardless of chunking.
    */
  private def expected(fs: Seq[Array[Byte]]): Seq[(Long, Long)] =
    fs.scanLeft(32L)((o, f) => o + f.length).zip(fs.map(_.length.toLong))

  test("round trip recovers exact offsets, sizes and track metadata") {
    val fs = frames(10)
    val p = Multimodal.muxMp4Video(320, 240, 90000L, 3000L, "mp4v", fs, samplesPerChunk = 3)
    val v = Multimodal.demuxMp4(p).get
    assert(v.codec == "mp4v" && v.width == 320 && v.height == 240)
    assert(v.timescale == 90000L && v.sampleDelta == 3000L)
    assert(v.frames == expected(fs).toIndexedSeq)
  }

  test("one-sample-per-chunk and single-chunk layouts agree with packing") {
    val fs = frames(7)
    for (spc <- Seq(1, 100)) {
      val p = Multimodal.muxMp4Video(64, 48, 1000L, 40L, "mp4v", fs, samplesPerChunk = spc)
      assert(Multimodal.demuxMp4(p).get.frames == expected(fs).toIndexedSeq, s"spc=$spc")
    }
  }

  test("co64 64-bit chunk offsets demux identically to stco") {
    val fs = frames(6)
    val a = Multimodal.muxMp4Video(32, 24, 600L, 20L, "avc1", fs, samplesPerChunk = 2)
    val b = Multimodal.muxMp4Video(32, 24, 600L, 20L, "avc1", fs, samplesPerChunk = 2,
      useCo64 = true)
    assert(Multimodal.demuxMp4(a).get.frames == Multimodal.demuxMp4(b).get.frames)
    assert(Multimodal.demuxMp4(b).get.codec == "avc1")
  }

  test("size-0 (run to end) and largesize top-level boxes still walk") {
    val fs = frames(4)
    val p = Multimodal.muxMp4Video(16, 12, 100L, 4L, "mp4v", fs)
    // moov is the LAST top-level box: patching its 32-bit size to 0
    // (run-to-end-of-enclosure) must not change the result
    val moovStart = {
      // find moov by walking: ftyp(24) + mdat
      val mdatSize = ((p(24) & 0xff) << 24) | ((p(25) & 0xff) << 16) |
        ((p(26) & 0xff) << 8) | (p(27) & 0xff)
      24 + mdatSize
    }
    assert(new String(p, moovStart + 4, 4, "US-ASCII") == "moov")
    val zeroed = p.clone()
    zeroed(moovStart) = 0; zeroed(moovStart + 1) = 0
    zeroed(moovStart + 2) = 0; zeroed(moovStart + 3) = 0
    assert(Multimodal.demuxMp4(zeroed).get.frames == Multimodal.demuxMp4(p).get.frames)
    // largesize: rewrite moov as size=1 + 64-bit largesize (header grows
    // by 8, so the box body is byte-identical after a 16-byte header)
    val moov = java.util.Arrays.copyOfRange(p, moovStart, p.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write(p, 0, moovStart)
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putInt(1); bb.put("moov".getBytes("US-ASCII")); bb.putLong(moov.length + 8L)
    out.write(bb.array()); out.write(moov, 8, moov.length - 8)
    assert(Multimodal.demuxMp4(out.toByteArray).get.frames ==
      Multimodal.demuxMp4(p).get.frames)
  }

  test("corrupt, truncated and non-MP4 payloads return None, never throw") {
    val fs = frames(5)
    val p = Multimodal.muxMp4Video(16, 12, 100L, 4L, "mp4v", fs, samplesPerChunk = 2)
    assert(Multimodal.demuxMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.demuxMp4("RIFF....AVI ".getBytes("US-ASCII")).isEmpty)
    for (cut <- Seq(10, 40, p.length / 2, p.length - 3))
      Multimodal.demuxMp4(java.util.Arrays.copyOfRange(p, 0, cut)) // must not throw
    // audio-only track (hdlr != vide) yields no video
    val audioish = p.clone()
    val idx = {
      var i = -1
      var j = 0
      while (j < audioish.length - 12 && i < 0) {
        if (audioish(j) == 'h' && audioish(j + 1) == 'd' && audioish(j + 2) == 'l' &&
            audioish(j + 3) == 'r') i = j
        j += 1
      }
      i
    }
    assert(idx > 0)
    "soun".getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) =>
      audioish(idx + 12 + k) = b
    }
    assert(Multimodal.demuxMp4(audioish).isEmpty)
  }

  test("frameSample routes MP4 payloads through the real demuxer") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val fs = frames(9)
    val p = Multimodal.muxMp4Video(128, 96, 90000L, 3000L, "mp4v", fs, samplesPerChunk = 3)
    val media = spark.createDataset(Seq(Multimodal.MediaRecord(7L, "video/mp4", p)))
    val out = Multimodal.frameSample(media, 4).collect().sortBy(_.frameIndex)
    assert(out.length == 4)
    val exp = expected(fs)
    out.foreach { fr =>
      val src = fr.frameIndex * fs.size / 4
      assert(fr.offsetBytes == exp(src)._1, s"frame ${fr.frameIndex} offset")
      assert(fr.payload.toSeq == fs(src).toSeq, s"frame ${fr.frameIndex} bytes")
    }
  }
}
