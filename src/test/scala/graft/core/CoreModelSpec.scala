package graft.core

import com.google.common.hash.Hashing
import org.scalatest.funsuite.AnyFunSuite

class CoreModelSpec extends AnyFunSuite {

  test("SegmentId packs epoch in upper 32 bits (NameUtils.java:572 semantics)") {
    val id = SegmentId.pack(3, 7)
    assert(id == (3L << 32 | 7L))
    assert(SegmentId.epoch(id) == 3)
    assert(SegmentId.number(id) == 7)
    // negative-looking segment numbers survive the round trip
    val id2 = SegmentId.pack(1, Int.MaxValue)
    assert(SegmentId.epoch(id2) == 1 && SegmentId.number(id2) == Int.MaxValue)
  }

  test("hashToRange matches seeded murmur3_128 reference semantics") {
    // independently recompute via Guava, mirroring HashHelper.java:117-149
    val hasher = Hashing.murmur3_128("EventRouter".hashCode)
    for (key <- Seq("a", "b", "routing-key-42", "", "ключ", "日本語")) {
      val long = hasher.hashUnencodedChars(key).asLong()
      val expected = java.lang.Double.longBitsToDouble(
        0x3ff0000000000000L + ((long >> 12) & 0x000fffffffffffffL)) - 1
      assert(RoutingKeyHash.hashToRange(key) == expected)
    }
  }

  test("hashToRange lands in [0,1) and is deterministic") {
    for (i <- 0 until 1000) {
      val d = RoutingKeyHash.hashToRange(s"key-$i")
      assert(d >= 0.0 && d < 1.0)
      assert(d == RoutingKeyHash.hashToRange(s"key-$i"))
    }
  }

  test("evenRanges tile [0,1) and segmentForKey picks the owner") {
    val ranges = RoutingKeyHash.evenRanges(4)
    assert(ranges.head.low == 0.0 && ranges.last.high == 1.0)
    ranges.sliding(2).foreach { case Seq(a, b) => assert(a.high == b.low) }
    val segs = ranges.zipWithIndex.map { case (r, i) =>
      SegmentRecord(SegmentId.pack(0, i), r.low, r.high, 0, 0, isSealed = false, Nil, 0)
    }
    for (i <- 0 until 200) {
      val k = s"k$i"
      val sid = RoutingKeyHash.segmentForKey(k, segs)
      val d = RoutingKeyHash.hashToRange(k)
      assert(segs.find(_.segmentId == sid).get.range.contains(d))
      assert(SegmentId.number(sid) == RoutingKeyHash.bucketForKey(k, 4))
    }
  }

  test("bucketForKey spreads keys across buckets") {
    val counts = (0 until 4000).groupBy(i => RoutingKeyHash.bucketForKey(s"user-$i", 8))
    assert(counts.size == 8)
    counts.values.foreach(c => assert(c.size > 300, "skewed bucket"))
  }
}
