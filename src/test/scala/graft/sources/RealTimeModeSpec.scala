package graft.sources

import graft.SparkTestSession
import graft.core._
import graft.storage.GraftStreams
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.concurrent.TrieMap

/** Spark 4 Real-Time Mode over the graft source: `Trigger.RealTime`
  * keeps one long-running task per segment that LONG-POLLS the manifest
  * tail (`GraftTailReader.nextWithTimeout`) — the engine analog of the
  * reference's Future read, where a ReadSegment past the tail parks
  * until an append arrives (FutureReadResultEntry,
  * reading/StreamSegmentReadIndex.java). Events written MID-TRIGGER must
  * surface within the running trigger — no micro-batch boundary between
  * append and delivery — and trigger handoff (mergeOffsets → next start
  * cut) must stay exactly-once.
  */
object RealTimeCollector {
  /** (streamKey, segmentId, offset, arrivalNanos) per delivered row. */
  val buffers: TrieMap[String, ConcurrentLinkedQueue[(String, Long, Long, Long)]] = TrieMap.empty
  def make(id: String): ConcurrentLinkedQueue[(String, Long, Long, Long)] = {
    val q = new ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    buffers.put(id, q)
    q
  }
}

/** Collects (segmentId, offset, arrivalNanos) per row into a static
  * buffer — ForeachWriterTable is on the real-time sink allowlist.
  */
final class CollectingWriter(id: String) extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(r: Row): Unit = {
    val stream =
      if (r.schema.fieldNames.contains("stream")) r.getAs[String]("stream") else ""
    RealTimeCollector.buffers(id).add(
      (stream, r.getAs[Long]("segmentId"), r.getAs[Long]("offset"), System.nanoTime()))
  }
  override def close(errorOrNull: Throwable): Unit = ()
}

class RealTimeModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(): (GraftStreams, String) = {
    val root = Files.createTempDirectory("graft-rt").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    (g, root)
  }

  private def batch(n: Int, base: Long): DataFrame =
    spark.range(n).select(
      concat(lit("u"), col("id") % 5).as("routingKey"),
      (lit(base) + col("id")).as("eventTime"),
      encode((lit(base) + col("id")).cast("string"), "UTF-8").as("payload"))

  private def awaitCount(q: ConcurrentLinkedQueue[_], n: Int, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (q.size < n && System.nanoTime() < deadline) Thread.sleep(10)
    q.size >= n
  }

  test("tail appends surface inside the running trigger, exactly-once across triggers") {
    val (g, root) = mk()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val id = java.util.UUID.randomUUID().toString
    val buf = RealTimeCollector.make(id)

    g.writeEvents("s", "ev", batch(20, 0))
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .writeStream
      .foreach(new CollectingWriter(id))
      .outputMode("update")
      .trigger(Trigger.RealTime("6 seconds"))
      .start()
    try {
      // backlog drains within the FIRST trigger
      assert(awaitCount(buf, 20, 30000), s"backlog not delivered: ${buf.size}/20")

      // mid-trigger append: must arrive with no batch boundary in
      // between — the long-poll tail pickup
      val t0 = System.nanoTime()
      g.writeEvents("s", "ev", batch(10, 1000))
      val tCommitted = System.nanoTime() // manifest CAS has landed
      assert(awaitCount(buf, 30, 30000), s"tail rows not delivered: ${buf.size}/30")
      val arrival = buf.toArray(Array.empty[(String, Long, Long, Long)])
        .map(_._4).sorted.drop(20).head
      val latencyMs = (arrival - t0) / 1000000.0
      val pollMs = (arrival - tCommitted) / 1000000.0
      info(f"append→delivery $latencyMs%.0f ms (incl. the write job); " +
        f"commit→delivery $pollMs%.0f ms (the long-poll pickup)")
      assert(latencyMs < 3000.0,
        f"tail append took $latencyMs%.0f ms to surface — not a tail read")
      assert(pollMs < 1500.0,
        f"manifest-commit→delivery took $pollMs%.0f ms — poll loop not picking up")

      // cross a trigger boundary, then append more: mergeOffsets must
      // hand the cut to the next trigger without loss or redelivery
      Thread.sleep(6500)
      g.writeEvents("s", "ev", batch(10, 2000))
      assert(awaitCount(buf, 40, 30000), s"post-boundary rows not delivered: ${buf.size}/40")
      val all = buf.toArray(Array.empty[(String, Long, Long, Long)])
      assert(all.length == 40, s"expected exactly 40 rows, got ${all.length}")
      val positions = all.map(t => (t._2, t._3))
      assert(positions.distinct.length == 40,
        "duplicate (segment, offset) delivered across triggers")
    } finally q.stop()
  }

  test("scale mid-stream: children join a later trigger, after their parents drain") {
    val (g, root) = mk()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val id = java.util.UUID.randomUUID().toString
    val buf = RealTimeCollector.make(id)

    g.writeEvents("s", "ev", batch(20, 0))
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .writeStream
      .foreach(new CollectingWriter(id))
      .outputMode("update")
      .trigger(Trigger.RealTime("2 seconds"))
      .start()
    try {
      assert(awaitCount(buf, 20, 30000), s"pre-scale rows not delivered: ${buf.size}/20")
      // epoch change: 2 parents seal, 6 children — MORE segments than
      // local[4] task slots, so the planner must multiplex several
      // segments per long-running task (the reader-group shape); an
      // unmultiplexed per-segment plan starves the excess partitions
      g.scaleStream("s", "ev", 6)
      g.writeEvents("s", "ev", batch(15, 1000))
      // children are planned only once a trigger STARTS from a cut with
      // the parents drained — within two trigger boundaries
      assert(awaitCount(buf, 35, 30000), s"post-scale rows not delivered: ${buf.size}/35")
      val all = buf.toArray(Array.empty[(String, Long, Long, Long)])
      assert(all.length == 35)
      assert(all.map(t => (t._2, t._3)).distinct.length == 35,
        "duplicate (segment, offset) across the epoch hand-off")
      val epochOf: Long => Long = sid => sid >> 32
      val parentArrivals = all.filter(t => epochOf(t._2) == 0).map(_._4)
      val childArrivals = all.filter(t => epochOf(t._2) > 0).map(_._4)
      assert(parentArrivals.length == 20 && childArrivals.length == 15)
      assert(parentArrivals.max < childArrivals.min,
        "child-epoch rows overtook parent-epoch rows — SegmentCompleted gate broken")
    } finally q.stop()
  }

  test("multi-stream subscription tails both streams in one real-time query") {
    val root = Files.createTempDirectory("graft-rtm").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "a", StreamConfig(initialSegments = 2))
    g.catalog.createStream("s", "b", StreamConfig(initialSegments = 2))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val id = java.util.UUID.randomUUID().toString
    val buf = RealTimeCollector.make(id)

    g.writeEvents("s", "a", batch(10, 0))
    g.writeEvents("s", "b", batch(10, 500))
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("streams", "a,b")
      .load()
      .writeStream
      .foreach(new CollectingWriter(id))
      .outputMode("update")
      .trigger(Trigger.RealTime("4 seconds"))
      .start()
    try {
      assert(awaitCount(buf, 20, 30000), s"backlog not delivered: ${buf.size}/20")
      g.writeEvents("s", "b", batch(5, 1000)) // tail append on ONE stream
      assert(awaitCount(buf, 25, 30000), s"tail rows not delivered: ${buf.size}/25")
      val all = buf.toArray(Array.empty[(String, Long, Long, Long)])
      assert(all.length == 25)
      assert(all.map(t => (t._1, t._2, t._3)).distinct.length == 25)
      assert(all.count(_._1 == "s/a") == 10 && all.count(_._1 == "s/b") == 15)
    } finally q.stop()
  }

  test("real-time restart: drained sealed segments keep their cut (no redelivery)") {
    val (g, root) = mk()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val ckpt = Files.createTempDirectory("graft-rt-ck2").toString
    def run(id: String) =
      s2.readStream.format("graft-stream")
        .option("rootDir", root).option("scope", "s").option("stream", "ev")
        .load()
        .writeStream
        .foreach(new CollectingWriter(id))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.RealTime("2 seconds"))
        .start()

    val id1 = java.util.UUID.randomUUID().toString
    val buf1 = RealTimeCollector.make(id1)
    g.writeEvents("s", "ev", batch(20, 0))
    val q1 = run(id1)
    try {
      assert(awaitCount(buf1, 20, 30000))
      Thread.sleep(2600) // commit at least one merged offset
    } finally { q1.stop(); q1.awaitTermination() }

    // seal the (fully drained) parents via a scale, then append to the
    // children while the query is DOWN
    g.scaleStream("s", "ev", 4)
    g.writeEvents("s", "ev", batch(12, 1000))

    val id2 = java.util.UUID.randomUUID().toString
    val buf2 = RealTimeCollector.make(id2)
    val q2 = run(id2)
    try {
      assert(awaitCount(buf2, 12, 30000), s"child rows not delivered: ${buf2.size}/12")
      // run past further trigger boundaries: a regressed parent cut
      // would re-plan the sealed parents and redeliver their 20 rows
      Thread.sleep(5000)
      val all = buf2.toArray(Array.empty[(String, Long, Long, Long)])
      assert(all.length == 12, s"redelivery after restart: ${all.length} rows, expected 12")
      assert(all.forall(t => (t._2 >> 32) > 0), "restart redelivered parent-epoch rows")
    } finally q2.stop()
  }

  test("real-time offsets interoperate: restart under a micro-batch trigger resumes the cut") {
    val (g, root) = mk()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val ckpt = Files.createTempDirectory("graft-rt-ck").toString
    val id = java.util.UUID.randomUUID().toString
    val buf = RealTimeCollector.make(id)

    g.writeEvents("s", "ev", batch(20, 0))
    val rt = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .writeStream
      .foreach(new CollectingWriter(id))
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.RealTime("2 seconds"))
      .start()
    try {
      assert(awaitCount(buf, 20, 30000), s"backlog not delivered: ${buf.size}/20")
      // let at least one trigger COMMIT its merged offset
      Thread.sleep(2600)
    } finally { rt.stop(); rt.awaitTermination() }

    // same checkpoint, micro-batch trigger: only NEW rows may arrive —
    // the real-time cut wrote a StreamCut offset any trigger can resume
    g.writeEvents("s", "ev", batch(10, 1000))
    val id2 = java.util.UUID.randomUUID().toString
    val buf2 = RealTimeCollector.make(id2)
    val mb = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .writeStream
      .foreach(new CollectingWriter(id2))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    mb.awaitTermination()
    val got = buf2.toArray(Array.empty[(String, Long, Long, Long)])
    assert(got.length == 10, s"micro-batch resume re-read the real-time range: ${got.length}")
  }

  test("soak: 32 segments on 4 slots, scale mid-trigger — no starvation, " +
       "one manifest read per stream per poll") {
    val root = Files.createTempDirectory("graft-rt-soak").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    // 8× over-subscription: 32 segments onto local[4]'s 4 task slots —
    // the realistic reader-group ratio; every long-running task must
    // multiplex ~8 cursors and starve none of them
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 32))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val id = java.util.UUID.randomUUID().toString
    val buf = RealTimeCollector.make(id)

    // 997 routing keys spread rows over all 32 segments
    def wide(n: Int, base: Long) = spark.range(n).select(
      concat(lit("u"), col("id") % 997).as("routingKey"),
      (lit(base) + col("id")).as("eventTime"),
      encode((lit(base) + col("id")).cast("string"), "UTF-8").as("payload"))

    g.writeEvents("s", "ev", wide(640, 0))
    val polls0 = GraftTailReader.pollCount.get()
    val reads0 = GraftTailReader.manifestReadCount.get()
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .writeStream
      .foreach(new CollectingWriter(id))
      .outputMode("update")
      .trigger(Trigger.RealTime("2 seconds"))
      .start()
    try {
      assert(awaitCount(buf, 640, 60000), s"backlog not delivered: ${buf.size}/640")
      val backlog = buf.toArray(Array.empty[(String, Long, Long, Long)])
      assert(backlog.map(_._2).distinct.length == 32,
        s"rows from only ${backlog.map(_._2).distinct.length}/32 segments — cursors starved")

      // concurrent scale MID-TRIGGER while the tail tasks are long-polling
      g.scaleStream("s", "ev", 40)
      g.writeEvents("s", "ev", wide(320, 10000))
      assert(awaitCount(buf, 960, 60000), s"post-scale rows not delivered: ${buf.size}/960")
      val all = buf.toArray(Array.empty[(String, Long, Long, Long)])
      assert(all.length == 960, s"expected exactly 960 rows, got ${all.length}")
      assert(all.map(t => (t._2, t._3)).distinct.length == 960,
        "duplicate (segment, offset) across the epoch hand-off")
      val epochOf: Long => Long = sid => sid >> 32
      val parents = all.filter(t => epochOf(t._2) == 0)
      val children = all.filter(t => epochOf(t._2) > 0)
      assert(parents.length == 640 && children.length == 320,
        s"${parents.length} parent-epoch + ${children.length} child-epoch rows")
      assert(parents.map(_._4).max < children.map(_._4).min,
        "child-epoch rows overtook parent-epoch rows — SegmentCompleted gate broken")
    } finally { q.stop(); q.awaitTermination() }
    // the poll-efficiency bound: ONE manifest read per owned stream per
    // poll, regardless of how many cursors a task multiplexes — a single
    // 1-stream query, so reads == polls exactly; a per-cursor poller
    // would read ~8× that
    val polls = GraftTailReader.pollCount.get() - polls0
    val reads = GraftTailReader.manifestReadCount.get() - reads0
    assert(polls > 0, "tail readers never polled")
    assert(reads == polls,
      s"$reads manifest reads over $polls polls — expected exactly one per stream per poll")
  }
}
