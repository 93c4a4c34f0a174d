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
  val buffers: TrieMap[String, ConcurrentLinkedQueue[(Long, Long, Long)]] = TrieMap.empty
  def make(id: String): ConcurrentLinkedQueue[(Long, Long, Long)] = {
    val q = new ConcurrentLinkedQueue[(Long, Long, Long)]()
    buffers.put(id, q)
    q
  }
}

/** Collects (segmentId, offset, arrivalNanos) per row into a static
  * buffer — ForeachWriterTable is on the real-time sink allowlist.
  */
final class CollectingWriter(id: String) extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(r: Row): Unit =
    RealTimeCollector.buffers(id).add(
      (r.getAs[Long]("segmentId"), r.getAs[Long]("offset"), System.nanoTime()))
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
      assert(awaitCount(buf, 30, 30000), s"tail rows not delivered: ${buf.size}/30")
      val arrival = buf.toArray(Array.empty[(Long, Long, Long)])
        .map(_._3).sorted.drop(20).head
      val latencyMs = (arrival - t0) / 1000000.0
      assert(latencyMs < 3000.0,
        f"tail append took $latencyMs%.0f ms to surface — not a tail read")

      // cross a trigger boundary, then append more: mergeOffsets must
      // hand the cut to the next trigger without loss or redelivery
      Thread.sleep(6500)
      g.writeEvents("s", "ev", batch(10, 2000))
      assert(awaitCount(buf, 40, 30000), s"post-boundary rows not delivered: ${buf.size}/40")
      val all = buf.toArray(Array.empty[(Long, Long, Long)])
      assert(all.length == 40, s"expected exactly 40 rows, got ${all.length}")
      val positions = all.map(t => (t._1, t._2))
      assert(positions.distinct.length == 40,
        "duplicate (segment, offset) delivered across triggers")
    } finally q.stop()
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
    val got = buf2.toArray(Array.empty[(Long, Long, Long)])
    assert(got.length == 10, s"micro-batch resume re-read the real-time range: ${got.length}")
  }
}
