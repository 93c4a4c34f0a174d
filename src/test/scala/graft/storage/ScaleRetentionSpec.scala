package graft.storage

import graft.SparkTestSession
import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Auto-scale (AutoScaleTest analog) + retention (RetentionTest analog) +
  * named cuts / checkpoint registry.
  */
class ScaleRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(cfg: StreamConfig): GraftStreams = {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-sr").toString)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "x", cfg)
    g
  }

  private def batch(n: Int, t0: Long = 1704067200000L, keys: Int = 16): DataFrame =
    spark.range(n).select(
      concat(lit("k"), col("id") % keys).as("routingKey"),
      (lit(t0) + col("id") * 1000).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))

  test("EWMA rates accumulate on write commits") {
    val g = mk(StreamConfig(initialSegments = 2, targetRatePerSegment = 10))
    g.writeEvents("s", "x", batch(1000))
    val rates = g.catalog.getStream("s", "x").segmentRates
    assert(rates.nonEmpty)
    assert(rates.values.exists(_.twoMin > 0.0))
  }

  test("auto-scale splits hot segments with lineage, respects cooldown") {
    val g = mk(StreamConfig(initialSegments = 2, targetRatePerSegment = 10))
    g.writeEvents("s", "x", batch(5000))
    val scaler = new AutoScaler(g, cooldownMillis = 600000L)
    val meta0 = g.catalog.getStream("s", "x")
    val base = meta0.createdAt

    // inside cooldown → no action even if hot
    assert(scaler.evaluate("s", "x", now = base + 1000).isEmpty)

    // fabricate hot rates on segment 0, cold-ish on segment 1
    val hot = meta0.openSegments.sortBy(_.keyLow).head.segmentId
    g.catalog.update("s", "x") { m =>
      m.copy(segmentRates = m.segmentRates +
        (hot -> SegmentRates(twoMin = 500, fiveMin = 300, tenMin = 100,
          twentyMin = 50, createdAt = base, lastUpdated = base)))
    }
    val after = scaler.evaluate("s", "x", now = base + 700000)
    assert(after.isDefined, "expected a scale-up")
    val m1 = after.get
    assert(m1.currentEpoch.epoch == 1)
    assert(m1.segment(hot).isSealed)
    val children = m1.openSegments.filter(_.parents.contains(hot))
    assert(children.size >= 2, s"hot segment should split, got $children")
    // untouched segment carried with its id
    val other = meta0.openSegments.sortBy(_.keyLow).last.segmentId
    assert(m1.currentEpoch.segmentIds.contains(other))
    assert(!m1.segment(other).isSealed)
    // key space still tiles [0,1)
    val ranges = m1.openSegments.sortBy(_.keyLow)
    assert(ranges.head.keyLow == 0.0 && ranges.last.keyHigh == 1.0)
    ranges.sliding(2).foreach { case Seq(a, b) => assert(a.keyHigh == b.keyLow) }

    // writes after scale land in open segments only; order still exactly-once
    g.writeEvents("s", "x", batch(1000))
    val all = g.readEventsOrdered("s", "x")
    assert(all.count() == 6000L)
    assert(all.groupBy($"segmentId", $"offset").count().filter($"count" > 1).count() == 0)
  }

  test("auto-scale merges adjacent cold segments down to minSegments") {
    val g = mk(StreamConfig(initialSegments = 4, targetRatePerSegment = 1000, minSegments = 2))
    g.writeEvents("s", "x", batch(100))
    val meta0 = g.catalog.getStream("s", "x")
    val base = meta0.createdAt
    // all four segments cold and old
    g.catalog.update("s", "x") { m =>
      m.copy(segmentRates = m.openSegments.map(s =>
        s.segmentId -> SegmentRates(1, 1, 1, 1, createdAt = base, lastUpdated = base)).toMap,
        segments = m.segments.map(_.copy(createdAt = base - 21 * 60 * 1000)))
    }
    val after = new AutoScaler(g, cooldownMillis = 0L).evaluate("s", "x", now = base + 30 * 60 * 1000)
    assert(after.isDefined, "expected scale-down")
    val m1 = after.get
    assert(m1.openSegments.size == 2, s"4 cold segments should merge to 2 (minSegments floor)")
    m1.openSegments.foreach(s => assert(s.parents.size == 2))
  }

  test("updateStream: auto-scaler obeys the NEW target on a live stream") {
    // start with auto-scale disabled (target 0) — evaluation is a no-op
    val g = mk(StreamConfig(initialSegments = 2, targetRatePerSegment = 0))
    g.writeEvents("s", "x", batch(5000))
    val meta0 = g.catalog.getStream("s", "x")
    val base = meta0.createdAt
    val hot = meta0.openSegments.sortBy(_.keyLow).head.segmentId
    g.catalog.update("s", "x") { m =>
      m.copy(segmentRates = m.segmentRates +
        (hot -> SegmentRates(twoMin = 500, fiveMin = 300, tenMin = 100,
          twentyMin = 50, createdAt = base, lastUpdated = base)))
    }
    val scaler = new AutoScaler(g, cooldownMillis = 0L)
    assert(scaler.evaluate("s", "x", now = base + 700000).isEmpty,
      "target 0 = fixed policy, no scale")

    // live policy update through the manifest CAS: enable target 10
    g.catalog.updateStream("s", "x", meta0.config.copy(targetRatePerSegment = 10))
    val after = scaler.evaluate("s", "x", now = base + 700000)
    assert(after.isDefined, "scaler must obey the updated target")
    assert(after.get.segment(hot).isSealed)

    // updating back to a huge target stops further scaling
    g.catalog.updateStream("s", "x", meta0.config.copy(targetRatePerSegment = 1000000))
    assert(new AutoScaler(g, cooldownMillis = 0L)
      .evaluate("s", "x", now = base + 1500000).isEmpty)
  }

  test("updateStream: retention policy change takes effect at next evaluation") {
    val g = mk(StreamConfig(initialSegments = 2)) // no retention at create
    g.writeEvents("s", "x", batch(1000))
    assert(new Retention(g).apply("s", "x").isEmpty, "infinite retention = no truncation")
    g.catalog.updateStream("s", "x",
      g.catalog.getStream("s", "x").config.copy(retentionMaxRows = 300))
    assert(new Retention(g).apply("s", "x").isDefined, "updated policy must apply")
    val remaining = g.readEvents("s", "x").count()
    assert(remaining <= 310 && remaining >= 290, s"kept $remaining, wanted ~300")
  }

  test("retention: size-based truncation trims oldest rows") {
    val g = mk(StreamConfig(initialSegments = 2, retentionMaxRows = 300))
    g.writeEvents("s", "x", batch(1000))
    val cut = new Retention(g).apply("s", "x")
    assert(cut.isDefined)
    val remaining = g.readEvents("s", "x").count()
    assert(remaining <= 310 && remaining >= 290, s"kept $remaining, wanted ~300")
  }

  test("retention: time-based truncation honors the slowest subscriber") {
    val t0 = 1704067200000L
    val g = mk(StreamConfig(initialSegments = 2, retentionMillis = 100 * 1000L))
    g.writeEvents("s", "x", batch(1000, t0)) // eventTimes t0 .. t0+999s

    // subscriber stuck near the head: positions = offset 50 per segment
    val meta = g.catalog.getStream("s", "x")
    val subCut = StreamCut(meta.segments.map(s => s.segmentId -> 50L).toMap)
    g.saveStreamCut("s", "x", "sub:groupA", Some(subCut))

    // policy alone would drop everything older than (t0+999s) - 100s
    val cut = new Retention(g).apply("s", "x", now = t0 + 999 * 1000L)
    assert(cut.isDefined)
    cut.get.positions.foreach { case (_, off) => assert(off <= 50L) }
    assert(g.readEvents("s", "x").count() == 1000L - cut.get.positions.values.sum)

    // remove the subscriber → policy takes full effect
    g.deleteStreamCut("s", "x", "sub:groupA")
    new Retention(g).apply("s", "x", now = t0 + 999 * 1000L)
    val left = g.readEvents("s", "x").count()
    assert(left <= 101L, s"time retention should keep ~100s of events, kept $left")
  }

  test("named cuts: checkpoint + resume from saved position") {
    val g = mk(StreamConfig(initialSegments = 2))
    g.writeEvents("s", "x", batch(400))
    val ckpt = g.saveStreamCut("s", "x", "checkpoint-1") // tail at 400
    g.writeEvents("s", "x", batch(600))
    val resumed = g.readEvents("s", "x", from = g.getStreamCut("s", "x", "checkpoint-1").get)
    assert(resumed.count() == 600L)
    assert(g.getStreamCut("s", "x", "nope").isEmpty)
    assert(ckpt.positions.values.sum == 400L)
  }
}
