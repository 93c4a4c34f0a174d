package graft.tools

import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the storage engine: N rows through the full write
  * path (route → offsets → files → manifest), then full and bounded
  * reads, then compaction. Prints rows/sec per stage.
  * Usage: runMain graft.tools.StressDemo [rows] [segments] [batches]
  */
object StressDemo {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val segments = args.lift(1).map(_.toInt).getOrElse(16)
    val batches = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val g = new GraftStreams(spark, work)
    g.catalog.createScope("x")
    g.catalog.createStream("x", "s", StreamConfig(initialSegments = segments))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val perBatch = rows / batches
    val (_, wSec) = time {
      (0 until batches).foreach { b =>
        g.writeEvents("x", "s", spark.range(perBatch).select(
          concat(lit("user-"), col("id") % 100000).as("routingKey"),
          (lit(1704067200000L) + col("id")).as("eventTime"),
          encode(concat(lit("payload-"), col("id")), "UTF-8").as("payload")),
          writerId = Some("stress"), batchId = Some(b.toLong))
      }
    }
    println(f"[stress] write: ${rows} rows in $wSec%.1fs = ${rows / wSec}%.0f rows/s ($batches batches, $segments segments)")

    val (n, rSec) = time(g.readEvents("x", "s").count())
    println(f"[stress] full read: $n rows in $rSec%.1fs = ${n / rSec}%.0f rows/s")

    val meta = g.catalog.getStream("x", "s")
    val mid = g.nextStreamCut("x", "s", meta.headStreamCut, rows / 10)
    val (bn, bSec) = time(g.readEvents("x", "s", meta.headStreamCut, mid).count())
    println(f"[stress] bounded read: $bn rows in $bSec%.1fs")

    val ((before, after), cSec) = time(g.compactStream("x", "s"))
    val (n2, r2Sec) = time(g.readEvents("x", "s").count())
    println(f"[stress] compaction: $before files -> $after in $cSec%.1fs; reread $n2 rows in $r2Sec%.1fs")
    assert(n == rows && n2 == rows, "row count mismatch!")
    println(s"[stress] OK")
    spark.stop()
  }
}
