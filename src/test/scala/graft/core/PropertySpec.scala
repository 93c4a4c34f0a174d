package graft.core

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style invariants (seeded random sampling) for the core model:
  * hashing, segment ids, EWMA — the algebra everything else leans on.
  */
class PropertySpec extends AnyFunSuite {
  private def rnd = new Random(42)

  test("SegmentId.pack/unpack is a bijection for all (epoch, number)") {
    val r = rnd
    (0 until 10000).foreach { _ =>
      val epoch = r.nextInt(Int.MaxValue)
      val number = r.nextInt()
      val id = SegmentId.pack(epoch, number)
      assert(SegmentId.epoch(id) == epoch)
      assert(SegmentId.number(id) == number)
    }
  }

  test("hashToRange maps arbitrary strings into [0,1) deterministically") {
    val r = rnd
    (0 until 5000).foreach { _ =>
      val s = r.nextString(r.nextInt(40)) // arbitrary unicode
      val d = RoutingKeyHash.hashToRange(s)
      assert(d >= 0.0 && d < 1.0, s"out of range for ${s.map(_.toInt)}")
      assert(d == RoutingKeyHash.hashToRange(s))
    }
  }

  test("bucketForKey agrees with segmentForKey on evenly tiled epochs") {
    val r = rnd
    (0 until 2000).foreach { _ =>
      val n = 1 + r.nextInt(32)
      val k = r.alphanumeric.take(1 + r.nextInt(20)).mkString
      val segs = RoutingKeyHash.evenRanges(n).zipWithIndex.map { case (rg, i) =>
        SegmentRecord(SegmentId.pack(0, i), rg.low, rg.high, 0, 0, isSealed = false, Nil, 0)
      }
      val sid = RoutingKeyHash.segmentForKey(k, segs)
      assert(SegmentId.number(sid) == RoutingKeyHash.bucketForKey(k, n))
    }
  }

  test("evenRanges always tiles [0,1) exactly") {
    (1 to 256).foreach { n =>
      val rs = RoutingKeyHash.evenRanges(n)
      assert(rs.size == n)
      assert(rs.head.low == 0.0 && rs.last.high == 1.0)
      rs.sliding(2).foreach { case Seq(a, b) => assert(a.high == b.low); case _ => }
    }
  }

  test("SegmentRates EWMA is non-negative and converges to the steady rate") {
    val r = rnd
    (0 until 200).foreach { _ =>
      val rows = 1L + r.nextInt(10000)
      val dt = 100L + r.nextInt(60000)
      var rates = SegmentRates()
      var now = 1704067200000L
      // simulate ≥ 5τ of the 2-minute horizon so the EWMA has converged
      val steps = math.max(10, (10 * 60 * 1000L / dt).toInt)
      (0 until steps).foreach { _ =>
        now += dt
        rates = rates.update(rows, now)
        assert(rates.twoMin >= 0 && rates.fiveMin >= 0 &&
          rates.tenMin >= 0 && rates.twentyMin >= 0)
      }
      val steady = rows.toDouble * 1000.0 / dt
      assert(math.abs(rates.twoMin - steady) / steady < 0.05,
        s"2-min EWMA ${rates.twoMin} should converge to $steady (dt=$dt)")
    }
  }

  test("StreamCut distance/advance algebra: monotone, clamped, additive") {
    val r = rnd
    (0 until 500).foreach { _ =>
      val nSegs = 1 + r.nextInt(8)
      val tails = (0 until nSegs).map(i => SegmentId.pack(0, i) -> (r.nextInt(100000).toLong)).toMap
      // advance from zero by per-segment share never exceeds tails
      val per = 1L + r.nextInt(5000)
      val advanced = tails.map { case (sid, t) => sid -> math.min(t, per) }
      advanced.foreach { case (sid, off) => assert(off <= tails(sid) && off >= 0) }
      // distance(head→advanced) + distance(advanced→tail) == distance(head→tail)
      val d1 = advanced.values.sum
      val d2 = tails.map { case (sid, t) => t - advanced(sid) }.sum
      assert(d1 + d2 == tails.values.sum)
    }
  }
}
