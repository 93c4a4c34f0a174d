package graft.storage

import graft.SparkTestSession
import graft.core.StreamConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Right-to-be-forgotten redaction: offsets and row counts survive, the
  * forgotten payload bytes don't, untouched segments are never rewritten,
  * and the redaction is permanent across later compaction.
  */
class RedactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStream(): (GraftStreams, String) = {
    val work = java.nio.file.Files.createTempDirectory("graft-redact").toString
    val g = new GraftStreams(spark, work)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    val rows = (0 until 200).map(i => (s"k${i % 10}", i.toLong, s"payload-$i"))
      .toDF("routingKey", "eventTime", "pl")
      .select($"routingKey", $"eventTime", encode($"pl", "UTF-8").as("payload"))
    g.writeEvents("s", "ev", rows)
    (g, work)
  }

  test("redaction preserves offsets/rows, empties only the target key, prunes segments") {
    val (g, _) = freshStream()
    val before = g.readEvents("s", "ev")
      .select($"routingKey", $"segmentId", $"offset", decode($"payload", "UTF-8").as("pl"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._2, t._3))
    val metaBefore = g.catalog.getStream("s", "ev")
    val h = graft.core.RoutingKeyHash.hashToRange("k3")
    val coveringSegs = metaBefore.segments.filter(_.range.contains(h)).map(_.segmentId).toSet
    val untouched = metaBefore.files.filterNot(f => coveringSegs.contains(f.segmentId))
      .map(_.path).toSet
    assert(untouched.nonEmpty, "test needs a segment the key does not route to")

    val n = g.redactStream("s", "ev", "k3")
    assert(n === 20L)
    val metaAfter = g.catalog.getStream("s", "ev")
    assert(metaAfter.files.map(_.path).toSet.intersect(untouched) === untouched,
      "non-covering segment files must survive untouched (key-range pruning)")

    val after = g.readEvents("s", "ev")
      .select($"routingKey", $"segmentId", $"offset", decode($"payload", "UTF-8").as("pl"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._2, t._3))
    assert(after.length === before.length, "redaction must not drop rows")
    assert(after.map(t => (t._1, t._2, t._3)) sameElements before.map(t => (t._1, t._2, t._3)),
      "keys/segments/offsets must be identical after redaction")
    before.zip(after).foreach { case (b, a) =>
      if (b._1 == "k3") assert(a._4 === "", s"k3 payload not emptied at offset ${b._3}")
      else assert(a._4 === b._4, s"non-target payload changed at ${b._1}@${b._3}")
    }
  }

  test("redaction races a concurrent writer: CAS retries win, final scrub is total") {
    val (g, _) = freshStream()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val appended = new java.util.concurrent.atomic.AtomicLong(0L)
    val writer = new Thread(() => {
      var i = 0
      while (!stop.get() && i < 8) {
        val rows = (0 until 50).map(j => (s"k${j % 10}", (5000 + i * 50 + j).toLong, s"race-$i-$j"))
          .toDF("routingKey", "eventTime", "pl")
          .select($"routingKey", $"eventTime", encode($"pl", "UTF-8").as("payload"))
        g.writeEvents("s", "ev", rows)
        appended.addAndGet(50L)
        i += 1
      }
    })
    writer.start()
    // redact under contention: a concurrent append to a covered segment
    // fails the CAS revalidation loudly; the caller's retry loop wins
    var scrubbed = 0L
    var attempts = 0
    try {
      while (scrubbed == 0L && attempts < 50) {
        attempts += 1
        try scrubbed = g.redactStream("s", "ev", "k3")
        catch { case _: graft.core.ConditionalCheckFailedException => Thread.sleep(10) }
      }
    } finally { stop.set(true); writer.join() }
    assert(scrubbed > 0L, s"redaction never won in $attempts attempts")
    // the writer kept appending k3 rows after the successful scrub —
    // a final quiet-state pass must leave the key fully scrubbed
    g.redactStream("s", "ev", "k3")
    val all = g.readEvents("s", "ev")
    assert(all.count() === 200L + appended.get(), "no row lost under the race")
    assert(all.filter($"routingKey" === "k3")
      .filter(length($"payload") > 0).count() === 0L, "final scrub must be total")
    assert(all.filter($"routingKey" =!= "k3")
      .filter(length($"payload") === 0).count() === 0L, "only the target key scrubbed")
  }

  test("redacting an absent key is a no-op; redaction survives compaction") {
    val (g, _) = freshStream()
    val v0 = g.catalog.getStream("s", "ev").version
    assert(g.redactStream("s", "ev", "no-such-key") === 0L)
    assert(g.catalog.getStream("s", "ev").version === v0, "no-op must not commit")

    assert(g.redactStream("s", "ev", "k7") === 20L)
    // two more appends so compaction has multiple files to fold
    val extra = (0 until 20).map(i => (s"k${i % 10}", (1000 + i).toLong, s"late-$i"))
      .toDF("routingKey", "eventTime", "pl")
      .select($"routingKey", $"eventTime", encode($"pl", "UTF-8").as("payload"))
    g.writeEvents("s", "ev", extra)
    g.compactStream("s", "ev", minFilesPerSegment = 2)
    val redacted = g.readEvents("s", "ev")
      .filter($"routingKey" === "k7" && $"eventTime" < 1000)
      .select(length($"payload").as("len"))
    assert(redacted.filter($"len" > 0).count() === 0L,
      "compaction must carry redacted (empty) payloads through")
    assert(redacted.count() === 20L)
  }
}
