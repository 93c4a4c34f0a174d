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

    private def compressIfNeeded(s: Sketch): Sketch =
      if (s.counters.size <= s.capacity) s
      else {
        // t = (capacity+1)-th largest counter; ≥ capacity+1 counters are
        // ≥ t, so this removes ≥ t·(capacity+1) total weight → the
        // err ≤ W/(capacity+1) bound.
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
    override def reduce(b: Sketch, in: (String, Long)): Sketch = b.add(in._1, in._2)
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(r: Sketch): Sketch = r
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
