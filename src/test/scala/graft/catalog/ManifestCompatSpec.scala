package graft.catalog

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Manifest forward-compat: a manifest written before segmentRates /
  * namedCuts / lastScaleAt / attributes existed must still deserialize
  * with defaults — catalog schema evolution must never strand a stream.
  */
class ManifestCompatSpec extends AnyFunSuite {

  test("older manifest JSON without newer fields reads with defaults") {
    val root = Files.createTempDirectory("graft-compat")
    val metaDir = root.resolve("sc/old/_meta")
    Files.createDirectories(metaDir)
    val oldJson =
      """{"scope":"sc","name":"old",
        |"config":{"initialSegments":2,"targetRatePerSegment":0,"scaleFactor":2,
        |          "minSegments":1,"retentionMillis":0,"retentionMaxRows":0},
        |"version":0,"createdAt":1700000000000,"isSealed":false,"tags":[],
        |"epochs":[{"epoch":0,"segmentIds":[0,1],"createdAt":1700000000000}],
        |"segments":[
        |  {"segmentId":0,"keyLow":0.0,"keyHigh":0.5,"startOffset":0,"tailOffset":10,
        |   "isSealed":false,"parents":[],"createdAt":1700000000000},
        |  {"segmentId":1,"keyLow":0.5,"keyHigh":1.0,"startOffset":0,"tailOffset":5,
        |   "isSealed":false,"parents":[],"createdAt":1700000000000}],
        |"files":[],"headCut":{},"transactions":{},"writerMarks":{},"writerBatches":{}}
        |""".stripMargin.replace("\n", "")
    Files.write(metaDir.resolve("manifest-000000000000.json"),
      oldJson.getBytes(StandardCharsets.UTF_8))

    val cat = new StreamCatalog(root.toString)
    val meta = cat.getStream("sc", "old")
    assert(meta.segments.size == 2)
    assert(meta.segmentRates.isEmpty)
    assert(meta.namedCuts.isEmpty)
    assert(meta.lastScaleAt == 0L)
    assert(meta.segments.forall(_.attributes.isEmpty))
    assert(meta.tailCut.positions == Map(0L -> 10L, 1L -> 5L))
    // and it can be updated by current code
    val updated = cat.update("sc", "old")(m => m.copy(tags = m.tags + "migrated"))
    assert(updated.version == 1L && updated.tags == Set("migrated"))
  }
}
