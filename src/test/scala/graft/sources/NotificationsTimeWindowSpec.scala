package graft.sources

import graft.SparkTestSession
import graft.core.{StreamConfig, StreamCut}
import graft.storage.GraftStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

/** Reader-group notifications (EndOfDataNotifier / SegmentNotifier
  * analogs) + per-reader TimeWindow interpolation — SURVEY §2.8/§2.11
  * rows that were mapped on paper in round 2, now wired and observed.
  */
class NotificationsTimeWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def batch(n: Int, t0: Long): org.apache.spark.sql.DataFrame =
    spark.range(n).select(
      concat(lit("k"), col("id") % 8).as("routingKey"),
      (lit(t0) + col("id")).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))

  private def await(cond: => Boolean, ms: Long = 20000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    cond
  }

  test("listener observes end-of-data on AvailableNow drain and segment-count change on scale") {
    val root = Files.createTempDirectory("graft-notif").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    g.writeEvents("s", "ev", batch(200, 1000))

    val endOfData = new AtomicInteger(0)
    val segCounts = new AtomicReference[List[Int]](Nil)
    val listener = new GraftStreamListener(
      onEndOfData = () => { endOfData.incrementAndGet(); () },
      onSegmentCountChange = n => segCounts.updateAndGet(n :: _))
    spark.streams.addListener(listener)
    try {
      val ckpt = Files.createTempDirectory("graft-notif-ck").toString
      def drain(): Unit = {
        val q = spark.readStream.format("graft-stream")
          .option("rootDir", root).option("scope", "s").option("stream", "ev")
          .load()
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
        ()
      }
      drain()
      assert(await(endOfData.get() >= 1), "end-of-data must fire when AvailableNow drains")

      // scale 2 -> 5 and write more: the announced cut gains segments
      g.scaleStream("s", "ev", 5)
      g.writeEvents("s", "ev", batch(200, 2000))
      drain()
      assert(await(endOfData.get() >= 2))
      assert(await(segCounts.get().contains(7)), // 2 sealed + 5 open in the cut
        s"segment-count change not observed, saw ${segCounts.get()}")
    } finally spark.streams.removeListener(listener)
  }

  test("per-reader TimeWindow interpolates from watermark history at the reader's cut") {
    val root = Files.createTempDirectory("graft-tw").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))

    // writer advances in three chapters, noting time + emitting a
    // watermark after each — the _MARK stream history
    g.writeEvents("s", "ev", batch(100, 1000), writerId = Some("w"), batchId = Some(1),
      noteTimeFromBatch = true)
    val wm1 = g.emitWatermark("s", "ev").get
    val cutAfter1 = g.catalog.getStream("s", "ev").tailCut

    g.writeEvents("s", "ev", batch(100, 2000), writerId = Some("w"), batchId = Some(2),
      noteTimeFromBatch = true)
    val wm2 = g.emitWatermark("s", "ev").get
    val cutAfter2 = g.catalog.getStream("s", "ev").tailCut

    g.writeEvents("s", "ev", batch(100, 3000), writerId = Some("w"), batchId = Some(3),
      noteTimeFromBatch = true)
    val wm3 = g.emitWatermark("s", "ev").get

    assert(wm1.lowerTime < wm2.lowerTime && wm2.lowerTime < wm3.lowerTime)

    // a reader mid-replay (position = end of chapter 1) sees chapter-1
    // bounds, NOT the live watermark
    val (lo1, hi1) = g.timeWindowAt("s", "ev", cutAfter1)
    assert(lo1.contains(wm1.lowerTime), s"expected ${wm1.lowerTime}, got $lo1")
    assert(hi1.contains(wm2.upperTime), s"expected upper ${wm2.upperTime}, got $hi1")

    val (lo2, hi2) = g.timeWindowAt("s", "ev", cutAfter2)
    assert(lo2.contains(wm2.lowerTime))
    assert(hi2.contains(wm3.upperTime))

    // a reader at the very head has passed nothing: no lower bound yet
    val (lo0, hi0) = g.timeWindowAt("s", "ev", StreamCut(Map.empty))
    assert(lo0.isEmpty && hi0.contains(wm1.upperTime))

    // a reader at the tail has passed everything: no upper bound
    val (lo3, hi3) = g.timeWindowAt("s", "ev", g.catalog.getStream("s", "ev").tailCut)
    assert(lo3.contains(wm3.lowerTime) && hi3.isEmpty)

    // the streaming surface: a checkpoint offset JSON is the reader cut
    val json = org.json4s.jackson.Serialization.write(
      cutAfter1.positions.map { case (k, v) => k.toString -> v })(org.json4s.DefaultFormats)
    val (slo, shi) = GraftStreamSource.timeWindowFor(spark, root, "s", "ev", json)
    assert(slo == lo1 && shi == hi1)

    // ...and the multi-stream composite shape resolves the same window
    // through its per-stream key
    val nested = s"""{"s/ev":$json,"s/other":{"0":0}}"""
    val (nlo, nhi) = GraftStreamSource.timeWindowFor(spark, root, "s", "ev", nested)
    assert(nlo == lo1 && nhi == hi1)
  }
}
