package graft.core

import com.google.common.hash.Hashing

/** Routing-key → [0,1) hash with the exact semantics of the reference's
  * event router (common/.../hash/HashHelper.java:117-149 `hashToRange` +
  * `longToDoubleFraction`, seeded as in
  * client/.../stream/impl/StreamSegments.java:38): murmur3_128 seeded with
  * `"EventRouter".hashCode`, first 64 hash bits' leading 52 bits mapped
  * into the double mantissa. Events routed by our engine land in the same
  * key-range buckets a Pravega deployment would use.
  */
object RoutingKeyHash {
  private val LeadingBits = 0x3ff0000000000000L
  private val Mask = 0x000fffffffffffffL
  private val Hasher = Hashing.murmur3_128("EventRouter".hashCode)

  /** Uniform double in [0,1) for a routing key (hashes UTF-16 code units,
    * matching Guava `hashUnencodedChars`).
    */
  def hashToRange(key: String): Double = {
    val h = Hasher.hashUnencodedChars(key).asLong()
    longToDoubleFraction(h)
  }

  private def longToDoubleFraction(value: Long): Double = {
    val shifted = (value >> 12) & Mask
    java.lang.Double.longBitsToDouble(LeadingBits + shifted) - 1
  }

  /** Segment owning the key, given the current epoch's ranges: the segment
    * whose [low, high) contains hashToRange(key)
    * (client/.../stream/impl/SegmentSelector.java:87).
    */
  def segmentForKey(key: String, segments: Seq[SegmentRecord]): Long = {
    val d = hashToRange(key)
    segments.find(s => s.range.contains(d))
      .getOrElse(throw new GraftException(
        s"no open segment owns $d — ranges do not tile [0,1)"))
      .segmentId
  }

  /** Fixed-width variant for simple N-way streams: bucket = index of the
    * range [i/n, (i+1)/n) containing the hash.
    */
  def bucketForKey(key: String, numBuckets: Int): Int = {
    val d = hashToRange(key)
    math.min((d * numBuckets).toInt, numBuckets - 1)
  }

  /** Evenly tiled ranges for an epoch with n segments (the shape
    * StreamConfiguration produces for a fixed scaling policy).
    */
  def evenRanges(n: Int): Seq[KeyRange] =
    (0 until n).map(i => KeyRange(i.toDouble / n, if (i == n - 1) 1.0 else (i + 1).toDouble / n))
}
