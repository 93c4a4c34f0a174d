package graft.core

import graft.operators.Multimodal
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests for the engine's pure kernels — the invariants
  * that must hold for EVERY input, not just the fixtures: routing-hash
  * range/determinism/tiling, AVI mux→demux identity, WAV encode→decode
  * identity with reference-recomputed features. No SparkSession — these
  * run in milliseconds and fuzz the seams the example-based specs pin.
  */
class PropertySpec extends AnyFunSuite {

  // plain-scalacheck driver (no scalatestplus bridge on the classpath):
  // 200 cases per property, failures surface with the shrunk input
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("hashToRange: every string lands in [0,1), deterministically") {
    check(Prop.forAll { (s: String) =>
      val d = RoutingKeyHash.hashToRange(s)
      d >= 0.0 && d < 1.0 && d == RoutingKeyHash.hashToRange(s)
    })
  }

  test("even ranges tile [0,1): every key owned by exactly one bucket") {
    val gen = for {
      n <- Gen.choose(1, 64)
      key <- Gen.alphaNumStr
    } yield (n, key)
    check(Prop.forAll(gen) { case (n, key) =>
      val ranges = RoutingKeyHash.evenRanges(n)
      val d = RoutingKeyHash.hashToRange(key)
      ranges.count(_.contains(d)) == 1
    })
  }

  test("SegmentId pack/unpack round-trips every (epoch, number)") {
    check(Prop.forAll { (e: Int, n: Int) =>
      val id = SegmentId.pack(e, n)
      SegmentId.epoch(id) == e && SegmentId.number(id) == n
    })
  }

  test("winnow == naive min-per-window of the rolling gram hashes, any input") {
    import org.apache.spark.unsafe.types.UTF8String
    val gen = for {
      s <- Gen.asciiPrintableStr
      k <- Gen.choose(2, 10)
      w <- Gen.choose(1, 20)
    } yield (s, k, w)
    check(Prop.forAll(gen) { case (str, k, w) =>
      val u = UTF8String.fromString(str)
      val got = RollingHashCore.winnow(u, k, w).toSeq
      val n = u.numBytes()
      val naive: Seq[Long] =
        if (n < k) Seq.empty
        else {
          val pow = RollingHashCore.powers(k)
          val hs = (0 to n - k).map { i =>
            (0 until k).map(j => (u.getByte(i + j) & 0xffL) * pow(j)).sum %
              RollingHashCore.P
          }
          if (hs.size <= w) Seq(hs.min) else hs.sliding(w).map(_.min).toSeq
        }
      got == naive
    })
  }

  test("imagePhash: solid images hash to 0; any image hashes deterministically with <64 bits") {
    val gen = for {
      w <- Gen.choose(1, 64)
      h <- Gen.choose(1, 64)
      rgb <- Gen.choose(0, 0xffffff)
      solid <- Gen.oneOf(true, false)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (w, h, rgb, solid, seed)
    check(Prop.forAll(gen) { case (w, h, rgb, solid, seed) =>
      val rnd = new scala.util.Random(seed)
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        b.setRGB(x, y, if (solid) rgb else rnd.nextInt(0x1000000))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      val rec = Multimodal.MediaRecord(0L, "image/png", out.toByteArray)
      val got = Multimodal.imagePhash(rec)
      got.exists { case (lo, hi) =>
        val pop = java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi)
        // strictly-above-mean bits can never be all 64; solid images set none;
        // and the hash is a pure function of the bytes
        (!solid || (lo == 0L && hi == 0L)) && pop < 64 &&
          Multimodal.imagePhash(rec).contains((lo, hi))
      }
    })
  }

  test("AVI mux -> demux is the identity on frames, offsets and metadata") {
    val frameGen = Gen.choose(1, 400).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    val gen = for {
      w <- Gen.choose(1, 4096)
      h <- Gen.choose(1, 4096)
      us <- Gen.choose(1L, 1000000L)
      frames <- Gen.nonEmptyListOf(frameGen).map(_.take(12))
    } yield (w, h, us, frames)
    check(Prop.forAll(gen) { case (w, h, us, frames) =>
      val avi = Multimodal.muxAviMjpeg(w, h, us, frames)
      Multimodal.demuxAvi(avi).exists { v =>
        v.width == w && v.height == h && v.microSecPerFrame == us &&
        v.frames.size == frames.size &&
        v.frames.zip(frames).forall { case ((off, got), want) =>
          got.sameElements(want) &&
          avi.slice(off.toInt, off.toInt + got.length).sameElements(want)
        }
      }
    })
  }

  test("WAV encode -> decode recovers frames, rate, channels and features") {
    val gen = for {
      ch <- Gen.choose(1, 2)
      n <- Gen.choose(1, 2000)
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      samples <- Gen.containerOfN[Array, Short](n * ch,
        Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (ch, n, rate, samples)
    check(Prop.forAll(gen) { case (ch, n, rate, samples) =>
      val wav = Multimodal.encodeWavPcm16(rate, ch, samples)
      Multimodal.decodeWav(Multimodal.MediaRecord(0L, "audio/wav", wav)).exists { f =>
        // reference recomputation, straight from the PCM array
        val sumSq = samples.foldLeft(0L)((a, s) => a + s.toLong * s)
        val chan0 = (0 until n).map(i => samples(i * ch).toInt)
        val zc = chan0.sliding(2).count {
          case Seq(a, b) => a.toLong * b < 0
          case _         => false
        }
        f.nFrames == n && f.sampleRate == rate && f.channels == ch &&
        f.sumSq == sumSq && f.zeroCrossings == zc
      }
    })
  }
}
