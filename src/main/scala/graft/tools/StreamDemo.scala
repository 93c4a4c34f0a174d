package graft.tools

import graft.core._
import graft.storage.GraftStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the stream engine's public API: create →
  * write → bounded read → scale → truncate. Usage:
  * runMain graft.tools.StreamDemo [workDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = new GraftStreams(spark, work)
    g.catalog.createScope("demo")
    g.catalog.createStream("demo", "clicks", StreamConfig(initialSegments = 4))

    val events = spark.range(10000).select(
      concat(lit("user-"), col("id") % 50).as("routingKey"),
      (lit(1704067200000L) + col("id") * 250).as("eventTime"),
      encode(concat(lit("click-"), col("id")), "UTF-8").as("payload"))
    val tail = g.writeEvents("demo", "clicks", events, Some("demo-writer"), Some(1L))
    println(s"[demo] wrote 10000 events; tail cut = ${tail.positions.toSeq.sorted}")

    val total = g.readEvents("demo", "clicks").count()
    val head = g.catalog.getStream("demo", "clicks").headStreamCut
    val mid = g.nextStreamCut("demo", "clicks", head, 4000)
    val bounded = g.readEvents("demo", "clicks", head, mid).count()
    println(s"[demo] total=$total boundedBelowMid=$bounded distance=${g.distance("demo", "clicks", head, mid)}")

    g.scaleStream("demo", "clicks", 6)
    g.writeEvents("demo", "clicks", events, Some("demo-writer"), Some(2L))
    val afterScale = g.readEventsOrdered("demo", "clicks").count()
    val epochs = g.catalog.getStream("demo", "clicks").epochs.map(_.epoch)
    println(s"[demo] after scale: rows=$afterScale epochs=$epochs")

    g.catalog.truncateStream("demo", "clicks", mid)
    val afterTrunc = g.readEvents("demo", "clicks").count()
    println(s"[demo] after truncate at mid: rows=$afterTrunc (expected ${afterScale - bounded})")

    val probe = g.fetchEvent("demo", "clicks", EventPointer(SegmentId.pack(0, 0), head.positions.getOrElse(SegmentId.pack(0, 0), 0L) + bounded / 4))
      .select("routingKey", "offset").collect()
    println(s"[demo] fetchEvent → ${probe.mkString(",")}")
    println(s"[demo] OK workDir=$work")
    spark.stop()
  }
}
