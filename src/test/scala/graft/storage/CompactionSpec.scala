package graft.storage

import graft.SparkTestSession
import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream small-file compaction: many micro-batch files fold into one per
  * segment with identical data, preserved offsets, working cuts.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tombstone GC: compacted/truncated files survive the reader grace, then sweep") {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-gc").toString)
    val hconf = spark.sessionState.newHadoopConf()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "gc", StreamConfig(initialSegments = 2))
    (0 until 3).foreach { i =>
      g.writeEvents("s", "gc", spark.range(60).select(
        concat(lit("k"), col("id") % 5).as("routingKey"),
        (lit(1704067200000L) + lit(i * 60L) + col("id")).as("eventTime"),
        encode(concat(lit(s"b$i-"), col("id")), "UTF-8").as("payload")))
    }
    // a reader plans its scan from the pre-compaction manifest
    val oldPlan = g.readEvents("s", "gc")
    g.compactStream("s", "gc")
    val meta = g.catalog.getStream("s", "gc")
    assert(meta.pendingDeletes.nonEmpty, "compaction should tombstone, not delete")
    // tombstoned files are still on disk → the old plan still reads fine
    meta.pendingDeletes.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p.path)
      assert(hp.getFileSystem(hconf).exists(hp), s"file deleted before grace: ${p.path}")
    }
    assert(oldPlan.count() == 180L, "pre-compaction reader broke")
    // grace not yet reached → sweep is a no-op
    assert(g.catalog.sweepDeletes("s", "gc").isEmpty)
    // force the deadline into the past (test-only manifest surgery)
    g.catalog.update("s", "gc") { m =>
      m.copy(pendingDeletes = m.pendingDeletes.map(_.copy(notBefore = 0L)))
    }
    val swept = g.catalog.sweepDeletes("s", "gc")
    assert(swept.nonEmpty)
    swept.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      assert(!hp.getFileSystem(hconf).exists(hp), s"sweep left $p behind")
    }
    assert(g.catalog.getStream("s", "gc").pendingDeletes.isEmpty)
    // current manifest still reads everything
    assert(g.readEvents("s", "gc").count() == 180L)
  }

  test("maintenance pass: txn sweep + retention + compaction + GC in one idempotent run") {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-maint").toString)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "m",
      StreamConfig(initialSegments = 2, retentionMaxRows = 150))
    (0 until 5).foreach { i =>
      g.writeEvents("s", "m", spark.range(60).select(
        concat(lit("k"), col("id") % 5).as("routingKey"),
        (lit(1704067200000L) + lit(i * 60L) + col("id")).as("eventTime"),
        encode(concat(lit(s"b$i-"), col("id")), "UTF-8").as("payload")))
    }
    val expired = g.beginTxn("s", "m", leaseMillis = 3000L)
    g.writeToTxn("s", "m", expired, spark.range(10).select(
      lit("kx").as("routingKey"), lit(0L).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload")))
    // force the lease into the past instead of sleeping it out
    g.catalog.update("s", "m") { m =>
      val cur = m.transactions(expired)
      m.copy(transactions = m.transactions + (expired -> cur.copy(createdAt = 0L, leaseMillis = 1L)))
    }

    val maint = new Maintenance(g, compactMinFiles = 2)
    val r1 = maint.run("s", "m")
    assert(r1.sweptTxns == Seq(expired))
    assert(r1.truncated, "size-based retention should have truncated")
    assert(r1.filesAfter >= 0 && r1.filesAfter <= r1.filesBefore)
    val liveRows = g.readEvents("s", "m").count()
    assert(liveRows <= 160L && liveRows > 0L, s"retention left $liveRows rows")
    // second run is a no-op-ish pass and must not lose data
    val r2 = maint.run("s", "m")
    assert(r2.sweptTxns.isEmpty)
    assert(g.readEvents("s", "m").count() == liveRows)
    // clear the grace and reclaim: tombstones go away, data intact
    g.catalog.update("s", "m")(m =>
      m.copy(pendingDeletes = m.pendingDeletes.map(_.copy(notBefore = 0L))))
    val r3 = maint.run("s", "m")
    assert(g.catalog.getStream("s", "m").pendingDeletes.isEmpty)
    assert(g.readEvents("s", "m").count() == liveRows)
  }

  test("maintenance applies manifestKeepVersions: floor advances across passes") {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-mgc").toString)
    g.catalog.createScope("s")
    // policy ON: keep 6 versions of manifest history behind the tip
    g.catalog.createStream("s", "m",
      StreamConfig(initialSegments = 1, manifestKeepVersions = 6))
    def commits(n: Int, tag: String): Unit = (0 until n).foreach { i =>
      g.writeEvents("s", "m", spark.range(20).select(
        concat(lit("k"), col("id") % 3).as("routingKey"),
        (lit(1704067200000L) + col("id")).as("eventTime"),
        encode(concat(lit(s"$tag$i-"), col("id")), "UTF-8").as("payload")))
    }
    // the floor lands on checkpoint-eligible versions (default interval
    // 16), so the chain must outgrow keep + interval before gc can act
    commits(24, "a")
    val maint = new Maintenance(g, compactMinFiles = 9999) // isolate log GC
    val r1 = maint.run("s", "m")
    assert(r1.retiredManifests.nonEmpty, "policy-driven gc retired nothing")
    val floor1 = g.catalog.manifestFloor("s", "m")
    assert(floor1 > 0L)
    // data reads are untouched by log retention
    assert(g.readEvents("s", "m").count() == 480L)
    // more commits → the NEXT pass advances the floor (periodic cadence)
    commits(24, "b")
    val r2 = maint.run("s", "m")
    assert(r2.retiredManifests.nonEmpty && r2.retiredManifests.head >= floor1)
    val floor2 = g.catalog.manifestFloor("s", "m")
    assert(floor2 > floor1, s"floor did not advance: $floor1 -> $floor2")
    // a FRESH engine instance reads through the floor's checkpoint base
    val g2 = new GraftStreams(spark, g.rootDir)
    assert(g2.readEvents("s", "m").count() == 960L)
    // policy OFF (the default) never gcs from the maintenance pass
    g.catalog.createStream("s", "off", StreamConfig(initialSegments = 1))
    (0 until 8).foreach { _ => g.catalog.update("s", "off")(m => m.copy(tags = m.tags)) }
    val rOff = maint.run("s", "off")
    assert(rOff.retiredManifests.isEmpty && g.catalog.manifestFloor("s", "off") == 0L)
    // KVT side: per-table persisted policy, applied by runKvTables
    g.catalog.createKeyValueTable("s", "kvgc",
      graft.catalog.KvTableConfig(partitionCount = 2, manifestKeepVersions = 3))
    val t = g.catalog.openKeyValueTable(spark, "s", "kvgc")
    (1 to 8).foreach(i => t.put(Seq((s"k$i", "", s"v$i".getBytes("UTF-8")))
      .toDF("pk", "sk", "value")))
    val kvRetired = maint.runKvTables("s")
    assert(kvRetired("kvgc") == (1L to 4L), s"kv retired ${kvRetired.get("kvgc")}")
    assert(t.manifestFloor == 5L && t.entries().count() == 8L)
  }

  test("compaction merges files, preserves rows/offsets/cuts, survives truncation") {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-comp").toString)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "x", StreamConfig(initialSegments = 2))
    (0 until 6).foreach { i =>
      g.writeEvents("s", "x", spark.range(100).select(
        concat(lit("k"), col("id") % 5).as("routingKey"),
        (lit(1704067200000L) + lit(i * 100L) + col("id")).as("eventTime"),
        encode(concat(lit(s"b$i-"), col("id")), "UTF-8").as("payload")))
    }
    val before = g.readEvents("s", "x")
      .select($"segmentId", $"offset", decode($"payload", "UTF-8").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val metaBefore = g.catalog.getStream("s", "x")
    assert(metaBefore.files.size == 12, "expected 6 files per segment")

    // truncate a little first: compaction must respect the head cut
    val cut = g.nextStreamCut("s", "x", metaBefore.headStreamCut, 50)
    g.catalog.truncateStream("s", "x", cut)
    val expectedAfterTrunc = g.readEvents("s", "x")
      .select($"segmentId", $"offset", decode($"payload", "UTF-8").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val (nBefore, nAfter) = g.compactStream("s", "x")
    assert(nAfter == 2, s"2 segments should compact to 2 files, got $nAfter (from $nBefore)")

    val after = g.readEvents("s", "x")
      .select($"segmentId", $"offset", decode($"payload", "UTF-8").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(after == expectedAfterTrunc, "compaction changed visible data")
    assert(expectedAfterTrunc.subsetOf(before))

    // appends and bounded reads keep working on the compacted stream
    g.writeEvents("s", "x", spark.range(10).select(
      concat(lit("k"), col("id") % 5).as("routingKey"),
      lit(9999999999L).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload")))
    assert(g.readEvents("s", "x").count() == after.size + 10L)
    // second compaction folds the new files in again
    val (_, n2) = g.compactStream("s", "x")
    assert(n2 == 2)
  }
}
