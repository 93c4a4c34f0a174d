package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02): keep the
  * k smallest distinct 60-bit hashes of the values seen; if fewer than
  * k survive, the count is EXACT (the sketch is the distinct hash set);
  * otherwise estimate (k-1)·2^60 / h_k where h_k is the k-th smallest —
  * the uniform-order-statistics estimator, relative error ~1/√k.
  *
  * Why KMV instead of HLL here: the sketch CONTENT is a pure function
  * of the input SET — the k smallest hashes are the k smallest no
  * matter how the data was partitioned or merged — so both the sketch
  * and its estimate are bit-reproducible, merge-shape-independent, and
  * replayable by an external engine (the DuckDB oracle recomputes h_k
  * with the same md5-prefix hash and the same integer arithmetic).
  * HLL's register updates give none of that.
  *
  * Spark surface: a typed Aggregator — ObjectHashAggregate plans
  * map-side partial sketches, the shuffle carries ≤ k longs per group
  * per task regardless of the distinct-value count. Mergeable across
  * runs: persist `hashes` and `merge` unions days/shards.
  *
  * Hash: first 15 hex chars of md5 (60 bits, uniform) — the same
  * cross-engine-reproducible idiom as MinHashLSH's shingle hashes.
  */
object DistinctSketch {

  val HashBits: Int = 60
  val HashSpace: BigInt = BigInt(1) << HashBits

  final case class Kmv(k: Int, hashes: Seq[Long]) {
    require(k >= 2, s"k must be >= 2, was $k")

    def add(h: Long): Kmv =
      if (hashes.contains(h)) this
      else if (hashes.size < k) copy(hashes = (hashes :+ h).sorted)
      else if (h < hashes.last) copy(hashes = (hashes.init :+ h).sorted)
      else this

    def merge(other: Kmv): Kmv = {
      require(k == other.k, s"cannot merge KMV sketches of k $k and ${other.k}")
      copy(hashes = (hashes ++ other.hashes).distinct.sorted.take(k))
    }

    /** Exact when fewer than k distinct hashes were ever seen; the
      * order-statistics estimate otherwise. Integer-exact arithmetic
      * (BigInt), so the estimate is bit-stable across JVMs and
      * replayable in SQL HUGEINT math.
      */
    def estimate: Long =
      if (hashes.size < k) hashes.size.toLong
      else ((BigInt(k - 1) * HashSpace) / BigInt(hashes.last)).toLong

    def isExact: Boolean = hashes.size < k
  }

  object Kmv {
    def empty(k: Int): Kmv = Kmv(k, Vector.empty)
  }

  /** 60-bit md5-prefix hash of a string — identical to the oracle's
    * `CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT)`.
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + high nibble of the 8th
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Typed aggregator over pre-hashed values. The partial buffer rides
    * the ≤ k bound by construction — no amortization needed.
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Kmv, Kmv] {
    override def zero: Kmv = Kmv.empty(k)
    override def reduce(b: Kmv, h: Long): Kmv = b.add(h)
    override def merge(a: Kmv, b: Kmv): Kmv = a.merge(b)
    override def finish(r: Kmv): Kmv = r
    override def bufferEncoder: Encoder[Kmv] = Encoders.product[Kmv]
    override def outputEncoder: Encoder[Kmv] = Encoders.product[Kmv]
  }
}
