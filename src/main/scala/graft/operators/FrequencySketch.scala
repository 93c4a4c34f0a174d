package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable weighted heavy-hitters summary (Misra–Gries / Frequent,
  * the mergeable formulation of Agarwal et al., "Mergeable Summaries",
  * PODS'12): at most `capacity` counters; when a combine overflows, the
  * (capacity+1)-th largest count `t` is subtracted from every counter
  * (dropping the non-positive ones) and added to the sketch's error
  * budget. Invariants, independent of partitioning and merge order:
  *
  *  - lower bound: counter(k) ≤ true_count(k) for every tracked key;
  *  - upper bound: true_count(k) ≤ counter(k) + err (err covers
  *    untracked keys too: true_count ≤ err for any absent key);
  *  - err ≤ W / (capacity + 1) where W is the total stream weight —
  *    each compression removes ≥ t·(capacity+1) weight;
  *  - exactness domain: if the number of distinct keys never exceeds
  *    `capacity`, no compression fires, err = 0 and every count is
  *    exact (this is what the oracle row pins down).
  *
  * The Spark surface is a typed [[Aggregator]]: Catalyst plans it as an
  * ObjectHashAggregate with map-side partial sketches — each task ships
  * a ≤ `capacity`-entry map, so the shuffle is O(partitions·capacity)
  * no matter how many distinct keys the 100 TB stream holds. This is
  * the per-key analog of the reference's per-segment EVENT_COUNT
  * attribute rollups (segmentstore/.../Attributes.java:66): frequency
  * accounting without materializing the full key space.
  *
  * The reference analog for the *use*: hot-routing-key detection is
  * exactly what Pravega's auto-scaler cannot see (it rates whole
  * segments, AutoScaleProcessor.java:286) — a skewed-key report over an
  * event stream is the diagnostic a Pravega operator derives offline.
  */
object FrequencySketch {

  /** Compressed frequency state. `counters` holds lower-bound counts;
    * `err` is the cumulative subtracted offset (one-sided error).
    */
  final case class Sketch(capacity: Int, counters: Map[String, Long], err: Long) {

    def add(key: String, w: Long): Sketch = {
      require(w >= 0, s"negative weight $w")
      if (w == 0) this
      else compressIfNeeded(copy(counters = counters.updated(key, counters.getOrElse(key, 0L) + w)))
    }

    def merge(other: Sketch): Sketch = {
      require(capacity == other.capacity,
        s"cannot merge sketches of capacity $capacity and ${other.capacity}")
      val combined = other.counters.foldLeft(counters) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      compressIfNeeded(Sketch(capacity, combined, err + other.err))
    }

    /** Point estimate interval: (lower, upper] = (counter, counter + err). */
    def estimate(key: String): (Long, Long) = {
      val lo = counters.getOrElse(key, 0L)
      (lo, lo + err)
    }

    /** Keys whose lower bound already clears `threshold` — guaranteed
      * true heavy hitters (no false negatives above threshold + err).
      */
    def heavyHitters(threshold: Long): Seq[(String, Long)] =
      counters.toSeq.filter(_._2 >= threshold).sortBy { case (k, v) => (-v, k) }

    def topK(k: Int): Seq[(String, Long)] =
      counters.toSeq.sortBy { case (key, v) => (-v, key) }.take(k)

    /** Compress to ≤ capacity counters (no-op when already within). */
    private[FrequencySketch] def normalized: Sketch = compressIfNeeded(this)

    private def compressIfNeeded(s: Sketch): Sketch =
      if (s.counters.size <= s.capacity) s
      else {
        // t = (capacity+1)-th largest counter; ≥ capacity+1 counters are
        // ≥ t, so this removes ≥ t·(capacity+1) total weight → the
        // err ≤ W/(capacity+1) bound. One step always lands ≤ capacity:
        // survivors are the counters STRICTLY above t, of which there
        // are at most `capacity` no matter how large the input map.
        val t = s.counters.valuesIterator.toArray.sortBy(-_).apply(s.capacity)
        Sketch(s.capacity,
          s.counters.collect { case (k, v) if v > t => k -> (v - t) },
          s.err + t)
      }
  }

  object Sketch {
    def empty(capacity: Int): Sketch = {
      require(capacity >= 1, s"capacity must be >= 1, was $capacity")
      Sketch(capacity, Map.empty, 0L)
    }
  }

  /** Typed aggregator over (key, weight) rows. Buffer = the sketch
    * itself, so partial aggregation IS sketch compression.
    */
  final class SketchAgg(capacity: Int) extends Aggregator[(String, Long), Sketch, Sketch] {
    override def zero: Sketch = Sketch.empty(capacity)

    /** Amortized hot path: the partial buffer may grow to 2·capacity
      * before one compression lands it back at ≤ capacity — one
      * O(cap log cap) compression per `capacity` inserts, so the scan is
      * O(n log cap) instead of the per-row-compress O(n·cap·log cap).
      * The err bound is unchanged (each compression still subtracts the
      * (capacity+1)-th largest), the exactness domain is unchanged
      * (distinct ≤ capacity never reaches the 2·capacity trigger), and
      * merge/finish normalize to ≤ capacity so the shuffle and the
      * result keep the bounded size.
      */
    override def reduce(b: Sketch, in: (String, Long)): Sketch = {
      val (key, w) = in
      require(w >= 0, s"negative weight $w")
      if (w == 0) b
      else {
        val c = b.counters.updated(key, b.counters.getOrElse(key, 0L) + w)
        val grown = Sketch(b.capacity, c, b.err)
        if (c.size <= 2 * capacity) grown else grown.normalized
      }
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(r: Sketch): Sketch = r.normalized
    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  def sketchColumn(capacity: Int): Column =
    new SketchAgg(capacity).toColumn.asInstanceOf[Column]

  /** Heavy-hitters report: one distributed sketch pass, then the
    * bounded-size result unpacked to (key, count_lo, count_hi) rows.
    * `count_lo == count_hi` ⟺ the count is exact.
    */
  def topK(df: DataFrame, keyCol: String, weightCol: Column,
           k: Int, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sk = df
      .select(col(keyCol).cast("string"), weightCol.cast("long"))
      .as[(String, Long)]
      .select(sketchColumn(capacity).as[Sketch])
      .head()
    sk.topK(k)
      .map { case (key, lo) => (key, lo, lo + sk.err) }
      .toDF(keyCol, "count_lo", "count_hi")
  }
}
