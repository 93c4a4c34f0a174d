package graft.storage

import graft.SparkTestSession
import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ByteStreamTest + LargeEventTest analogs. */
class ByteStreamLargeEventSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("byte stream: append/read/seek/truncate round trip") {
    val bs = new ByteStreams(Files.createTempDirectory("graft-bs").toString)
    bs.create("s", "raw")
    bs.create("s", "raw") // idempotent
    val o1 = bs.append("s", "raw", "hello ".getBytes)
    val o2 = bs.append("s", "raw", "byte-stream world".getBytes)
    assert(o1 == 0L && o2 == 6L)
    assert(bs.tail("s", "raw") == 23L)
    assert(new String(bs.read("s", "raw", 0, 100)) == "hello byte-stream world")
    // seek mid-stream, crossing a chunk boundary
    assert(new String(bs.read("s", "raw", 4, 8)) == "o byte-s")
    // truncate: head rises, dead chunk dropped, old offsets fail
    bs.truncateBefore("s", "raw", 6L)
    assert(bs.head("s", "raw") == 6L)
    assertThrows[TruncatedDataException](bs.read("s", "raw", 0, 4))
    assert(new String(bs.read("s", "raw", 6, 100)) == "byte-stream world")
    // appends continue after truncation
    val o3 = bs.append("s", "raw", "!".getBytes)
    assert(o3 == 23L)
    assert(new String(bs.read("s", "raw", 6, 100)) == "byte-stream world!")
  }

  test("byte-stream chunks bulk-read through spark.read.format(binaryFile)") {
    // the SURVEY §2.1 mapping: raw byte-stream chunks are plain files, so
    // bulk processing rides Spark's binaryFile source with no custom code
    val root = Files.createTempDirectory("graft-binf").toString
    val bs = new ByteStreams(root)
    bs.create("s", "blob")
    val chunks = Seq("alpha", "beta-beta", "gamma!")
    chunks.foreach(c => bs.append("s", "blob", c.getBytes("UTF-8")))

    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "chunk-*")
      .load(s"$root/s/blob")
    assert(df.count() == 3L)
    val byPath = df.collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Array[Byte]]("content")))
      .sortBy(_._1).map(p => new String(p._2, "UTF-8")).toSeq
    assert(byPath == chunks, "chunk order by start-offset file name must replay appends")
    // offsets embedded in names line up with the committed tail
    assert(bs.tail("s", "blob") == chunks.map(_.length).sum.toLong)
  }

  test("large events: 1KiB..7.9MiB round-trip unchunked, >8MiB chunks transparently") {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-le").toString)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "big", StreamConfig(initialSegments = 2))

    val sizes = Seq(1024, 256 * 1024, (7.9 * 1024 * 1024).toInt)
    val big = spark.createDataFrame(sizes.zipWithIndex.map { case (n, i) =>
      (s"rk-$i", 1704067200000L + i, Array.fill[Byte](n)((i + 1).toByte))
    }).toDF("routingKey", "eventTime", "payload")
    g.writeEvents("s", "big", big)

    val back = g.readEvents("s", "big")
      .select($"routingKey", length($"payload").as("len"), $"payload")
      .collect().map(r => r.getAs[String]("routingKey") -> r.getAs[Int]("len")).toMap
    assert(back == sizes.zipWithIndex.map { case (n, i) => s"rk-$i" -> n }.toMap)
    // payload content integrity on the largest event
    val largest = g.readEvents("s", "big").filter($"routingKey" === "rk-2")
      .select($"payload").head().getAs[Array[Byte]](0)
    assert(largest.length == sizes(2) && largest.forall(_ == 3.toByte))

    // over-limit batch: accepted via the transparent large-event chunking
    // path (LargeEventWriter analog, see LargeEventSpec) — sub-limit rows
    // stay single rows, the oversized one reassembles byte-exactly
    val over = spark.createDataFrame(Seq(
      ("ok", 1L, Array.fill[Byte](10)(1)),
      ("too-big", 2L, Array.fill[Byte](8 * 1024 * 1024 + 1)(2))
    )).toDF("routingKey", "eventTime", "payload")
    g.writeEvents("s", "big", over)
    val after = g.readEvents("s", "big")
    assert(after.count() == 5L, "both rows of the mixed batch must be visible as whole events")
    val tooBig = after.filter($"routingKey" === "too-big").select($"payload")
      .head().getAs[Array[Byte]](0)
    assert(tooBig.length == 8 * 1024 * 1024 + 1 && tooBig.forall(_ == 2.toByte))
  }
}
