package graft.sources

import graft.SparkTestSession
import graft.core._
import graft.storage.GraftStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Reader groups over multiple streams (ReaderGroupConfig with several
  * stream cuts): in Spark, one query unioning several graft sources —
  * offsets checkpoint independently per source.
  */
class MultiStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("one query consumes two streams; per-source offsets checkpoint independently") {
    val root = Files.createTempDirectory("graft-ms").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "a", StreamConfig(initialSegments = 2))
    g.catalog.createStream("s", "b", StreamConfig(initialSegments = 3))

    def batch(tag: String, n: Int) = spark.range(n).select(
      concat(lit(tag), col("id") % 4).as("routingKey"),
      (lit(1704067200000L) + col("id")).as("eventTime"),
      encode(lit(tag), "UTF-8").as("payload"))

    g.writeEvents("s", "a", batch("a", 300))
    g.writeEvents("s", "b", batch("b", 500))

    def src(stream: String) = spark.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", stream)
      .load().withColumn("stream", lit(stream))

    val ckpt = Files.createTempDirectory("graft-ms-ck").toString
    val q = src("a").unionByName(src("b"))
      .writeStream.format("memory").queryName("multi").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val counts = spark.table("multi").groupBy($"stream").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("a" -> 300L, "b" -> 500L))
      // more data on only one stream → only that source advances
      g.writeEvents("s", "b", batch("b", 100))
      q.processAllAvailable()
      val counts2 = spark.table("multi").groupBy($"stream").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts2 == Map("a" -> 300L, "b" -> 600L))
    } finally q.stop()
  }
}
