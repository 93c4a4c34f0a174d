package graft.sources

import graft.SparkTestSession
import graft.core.{FileEntry, StreamConfig}
import graft.storage.GraftStreams
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Planning at the SCALING.md design point is MANIFEST-ONLY — proven by
  * construction: a synthetic 10,000-file manifest whose paths do not
  * exist on any filesystem. Every FileEntry records byteSize, so the
  * planner builds PartitionedFiles from manifest data alone; a single
  * getFileStatus would throw FileNotFoundException and fail these
  * tests. On top of that, the pushdown caps hold at this file count:
  * a time slice plans its share of files, a LIMIT plans a handful, a
  * count(*)-shaped aggregate plans zero.
  */
class PlanningScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val NFiles = 10000
  private val RowsPerFile = 1000L

  /** One segment, NFiles committed entries with disjoint offset spans
    * and disjoint per-file eventTime epochs, phantom paths, recorded
    * sizes.
    */
  private def mk(scope: String): (GraftStreams, String) = {
    val root = Files.createTempDirectory("graft-planscale").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope(scope)
    g.catalog.createStream(scope, "ev", StreamConfig(initialSegments = 1))
    g.catalog.update(scope, "ev") { m =>
      val sid = m.segments.head.segmentId
      val files = (0 until NFiles).map { i =>
        FileEntry(sid, s"/nonexistent/graft-plan-scale/$scope/f$i.parquet",
          startOffset = i * RowsPerFile, rowCount = RowsPerFile,
          minEventTime = i * 1000L, maxEventTime = i * 1000L + 999L,
          maxChunkCount = 1, byteSize = 64 * 1024L)
      }
      m.copy(files = files.toList,
        segments = m.segments.map(s =>
          s.copy(tailOffset = NFiles * RowsPerFile)))
    }
    (g, root)
  }

  private def scan(root: String, scope: String,
                   pushed: PushedPredicates = PushedPredicates.empty,
                   limit: Option[Int] = None): GraftScan =
    new GraftScan(GraftSourceConfig(root,
      Seq(StreamSub(scope, "ev", None, None)), None), pushed, null, limit)

  private def plannedFiles(s: GraftScan): Int =
    s.toBatch.planInputPartitions().map {
      case g: GraftInputPartition =>
        g.files.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition]
          .files.length
      case _ => 0
    }.sum

  test("a 10k-file manifest plans with zero filesystem access") {
    val (_, root) = mk("ps1")
    val t0 = System.nanoTime()
    val n = plannedFiles(scan(root, "ps1"))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(n === NFiles) // phantom paths: any stat would have thrown
    assert(ms < 30000, f"planning took $ms%.0f ms")
  }

  test("a time slice plans its share of 10k files") {
    val (_, root) = mk("ps2")
    // middle 1% of the time domain = 100 of 10,000 files
    val p = PushedPredicates.from(Array(
      GreaterThanOrEqual("eventTime", 5000 * 1000L),
      LessThan("eventTime", 5100 * 1000L)))
    val n = plannedFiles(scan(root, "ps2", p))
    assert(n >= 100 && n <= 101, s"planned $n")
  }

  test("LIMIT 10 plans one file of 10k") {
    val (_, root) = mk("ps3")
    assert(plannedFiles(scan(root, "ps3", limit = Some(10))) === 1)
    // a limit spanning several files plans just enough
    assert(plannedFiles(scan(root, "ps3",
      limit = Some((3 * RowsPerFile).toInt + 1))) === 4)
  }

  test("statistics come from the manifest, full and pruned") {
    val (_, root) = mk("ps4")
    val full = scan(root, "ps4").estimateStatistics()
    assert(full.numRows().getAsLong === NFiles * RowsPerFile)
    val p = PushedPredicates.from(Array(LessThan("eventTime", 1000 * 1000L)))
    val sliced = scan(root, "ps4", p).estimateStatistics()
    // strict bounds keep the boundary file (conservative): 1000 or 1001
    assert(sliced.numRows().getAsLong >= 1000 * RowsPerFile)
    assert(sliced.numRows().getAsLong <= 1001 * RowsPerFile)
  }
}
