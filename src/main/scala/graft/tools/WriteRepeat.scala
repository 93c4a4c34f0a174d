package graft.tools

import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Second attribution probe for the write path's last-decade growth:
  * writes ONE cached bounded batch N times sequentially into the same
  * stream and prints every per-batch wall. Distinguishes the two
  * remaining hypotheses cleanly:
  *   - flat per-batch walls → the 50M single-batch cost is a
  *     batch-SIZE effect (sort/spill/page-cache of one giant batch in
  *     one JVM) and sustained bounded-batch ingest is linear — the
  *     deployment shape (micro-batches on executors);
  *   - growing per-batch walls → a per-commit term that scales with
  *     accumulated manifest state (files list, tails), which would be a
  *     real design defect to fix.
  *
  * Usage: runMain graft.tools.WriteRepeat <sfDir> [copies=50] [n=10]
  */
object WriteRepeat {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 50
    val n = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = graft.Tables.events(spark, dir)
    val batch = events.repartition(cpus.toInt)
      .crossJoin(spark.range(copies).select($"id".as("rep")))
      .select(
        ($"user_id" + $"rep" * 1000000000L).cast("string").as("routingKey"),
        unix_millis($"ts".cast("timestamp")).as("eventTime"),
        encode(concat_ws("|", $"event_id", $"event_type", $"props"), "UTF-8").as("payload"))
      .cache()
    val rows = batch.count()

    val root = Files.createTempDirectory("graft-wrep").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("wb")
    g.catalog.createStream("wb", "ev", StreamConfig(initialSegments = 32))
    var total = 0.0
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      g.writeEvents("wb", "ev", batch)
      val s = (System.nanoTime() - t0) / 1e9
      total += s
      println(f"[writerepeat] batch=$i%2d rows=$rows wall=$s%6.2fs " +
        f"files=${g.catalog.getStream("wb", "ev").files.size}%5d")
    }
    println(f"[writerepeat] TOTAL rows=${rows * n} wall=$total%.2fs rows_per_s=${rows * n / total}%.0f")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
