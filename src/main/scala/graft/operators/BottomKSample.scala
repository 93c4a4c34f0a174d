package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic mergeable uniform sample: keep the k rows with the
  * SMALLEST 60-bit md5 hashes of their identity ("bottom-k by hash
  * rank" — the mergeable formulation of reservoir sampling; the same
  * order statistics KMV uses for cardinality). Because the hash ranks
  * are a pure function of row identity, the sample is bit-identical
  * under any partitioning, merge shape, retry, or re-run — unlike an
  * RNG reservoir — and an external engine can replay it row for row.
  *
  * Uses: deterministic corpus subsampling (the `ds_stratified_sample`
  * idiom packaged as a partial-aggregable operator), and sample-based
  * quantiles whose answers are reproducible and oracle-checkable: the
  * rank-r element of the sampled values is deterministic, so quantile
  * estimates never flap between runs.
  *
  * This completes the engine's deterministic mergeable-summary family:
  * frequencies (FrequencySketch / Misra–Gries), cardinality
  * (DistinctSketch / KMV), samples + quantiles (here) — all three
  * shuffle O(k) per group regardless of input size, persist, and merge
  * across shards/days.
  */
object BottomKSample {

  /** (hash, value) pairs sorted ascending, ≤ k entries; ties on hash
    * broken by value so the content stays a pure set function.
    */
  final case class Sample(k: Int, pairs: Seq[(Long, Long)]) {
    require(k >= 1, s"k must be >= 1, was $k")

    def hashes: Seq[Long] = pairs.map(_._1)
    def values: Seq[Long] = pairs.map(_._2)

    def add(h: Long, v: Long): Sample = {
      val beatsLast = pairs.nonEmpty && {
        val (lh, lv) = pairs.last
        h < lh || (h == lh && v < lv)
      }
      if (pairs.size < k || beatsLast) {
        // incremental KMV-style insert: binary-search the slot, skip
        // exact duplicates, drop the new last when over k — identical
        // content to distinct+sorted+take(k) (the buffer is already
        // sorted and duplicate-free) without rebuilding/re-sorting a
        // k-element vector on every accepted row
        val e = (h, v)
        val i = lowerBound(e)
        if (i < pairs.size && pairs(i) == e) this
        else {
          val inserted = (pairs.take(i) :+ e) ++ pairs.drop(i)
          copy(pairs = if (inserted.size > k) inserted.dropRight(1) else inserted)
        }
      } else this
    }

    /** First index whose element is >= e in the (hash, value)-sorted
      * buffer (the buffer is small — ≤ k — and already sorted).
      */
    private def lowerBound(e: (Long, Long)): Int = {
      val ord = implicitly[Ordering[(Long, Long)]]
      var lo = 0; var hi = pairs.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(pairs(mid), e)) lo = mid + 1 else hi = mid
      }
      lo
    }

    def merge(other: Sample): Sample = {
      require(k == other.k, s"cannot merge samples of k $k and ${other.k}")
      copy(pairs = (pairs ++ other.pairs).distinct.sorted.take(k))
    }

    /** Deterministic rank-based quantile of the sampled values:
      * element at floor(q·(n-1)) of the value-sorted sample — exactly
      * replayable via ROW_NUMBER arithmetic in SQL.
      */
    def quantile(q: Double): Long = {
      require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0,1]")
      require(pairs.nonEmpty, "empty sample")
      val sorted = values.sorted
      sorted(math.floor(q * (sorted.size - 1)).toInt)
    }
  }

  object Sample {
    def empty(k: Int): Sample = Sample(k, Vector.empty)
  }

  /** Typed aggregator over (hash, value) rows; the partial buffer is
    * ≤ k by construction.
    */
  final class SampleAgg(k: Int) extends Aggregator[(Long, Long), Sample, Sample] {
    override def zero: Sample = Sample.empty(k)
    override def reduce(b: Sample, in: (Long, Long)): Sample = b.add(in._1, in._2)
    override def merge(a: Sample, b: Sample): Sample = a.merge(b)
    override def finish(r: Sample): Sample = r
    override def bufferEncoder: Encoder[Sample] = Encoders.product[Sample]
    override def outputEncoder: Encoder[Sample] = Encoders.product[Sample]
  }
}
