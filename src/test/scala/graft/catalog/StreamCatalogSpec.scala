package graft.catalog

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamCatalogSpec extends AnyFunSuite {
  private def freshCatalog(): StreamCatalog =
    new StreamCatalog(Files.createTempDirectory("graft-cat").toString)

  test("scope + stream DDL lifecycle") {
    val c = freshCatalog()
    assert(c.listScopes().isEmpty)
    c.createScope("s1")
    assert(c.scopeExists("s1") && c.listScopes() == Seq("s1"))

    val meta = c.createStream("s1", "st", StreamConfig(initialSegments = 4), tags = Set("hot"))
    assert(meta.segments.size == 4 && meta.currentEpoch.epoch == 0)
    assert(meta.segments.map(_.segmentId) == (0 until 4).map(SegmentId.pack(0, _)))
    assert(c.listStreams("s1") == Seq("st"))
    assert(c.listStreamsByTag("s1", "hot") == Seq("st"))
    assert(c.listStreamsByTag("s1", "cold").isEmpty)
    assertThrows[GraftException](c.createStream("s1", "st"))

    // delete requires seal first
    assertThrows[GraftException](c.deleteStream("s1", "st"))
    c.sealStream("s1", "st")
    assert(c.getStream("s1", "st").isSealed)
    c.deleteStream("s1", "st")
    assert(!c.streamExists("s1", "st"))

    // non-empty scope delete needs recursive
    c.createStream("s1", "st2")
    assertThrows[GraftException](c.deleteScope("s1"))
    c.deleteScope("s1", recursive = true)
    assert(!c.scopeExists("s1"))
  }

  test("updateStream: live policy update keeps layout, rejects sealed/invalid") {
    val c = freshCatalog()
    c.createScope("s")
    val created = c.createStream("s", "x",
      StreamConfig(initialSegments = 4, targetRatePerSegment = 0, retentionMaxRows = 0))

    val updated = c.updateStream("s", "x",
      created.config.copy(targetRatePerSegment = 100, retentionMaxRows = 5000, minSegments = 2))
    assert(updated.config.targetRatePerSegment == 100)
    assert(updated.config.retentionMaxRows == 5000)
    assert(updated.config.minSegments == 2)
    // creation-time layout is immutable: segment set and initialSegments stay
    assert(updated.config.initialSegments == 4)
    assert(updated.segments == created.segments)
    assert(updated.version > created.version)

    // tags update surface
    assert(c.updateStreamTags("s", "x", Set("prod")).tags == Set("prod"))

    assertThrows[IllegalArgumentException](
      c.updateStream("s", "x", created.config.copy(minSegments = 0)))
    c.sealStream("s", "x")
    assertThrows[GraftException](
      c.updateStream("s", "x", created.config.copy(targetRatePerSegment = 5)))
  }

  test("CAS update: concurrent writers conflict and retry (ConditionalAppend analog)") {
    val c = freshCatalog()
    c.createScope("s")
    c.createStream("s", "x")
    // two logical writers bump tags; both succeed via retry, versions strictly increase
    val r1 = c.update("s", "x")(m => m.copy(tags = m.tags + "a"))
    val r2 = c.update("s", "x")(m => m.copy(tags = m.tags + "b"))
    assert(r2.version == r1.version + 1)
    assert(c.getStream("s", "x").tags == Set("a", "b"))
  }

  test("truncate raises head cut monotonically") {
    val c = freshCatalog()
    c.createScope("s")
    c.createStream("s", "t", StreamConfig(initialSegments = 2))
    val s0 = SegmentId.pack(0, 0)
    c.truncateStream("s", "t", StreamCut(Map(s0 -> 5L)))
    assert(c.getStream("s", "t").headCut(s0) == 5L)
    // lower cut does not regress the head
    c.truncateStream("s", "t", StreamCut(Map(s0 -> 3L)))
    assert(c.getStream("s", "t").headCut(s0) == 5L)
  }

  test("getStream on missing stream raises NoSuchStream") {
    val c = freshCatalog()
    c.createScope("s")
    assertThrows[NoSuchStreamException](c.getStream("s", "nope"))
  }
}
