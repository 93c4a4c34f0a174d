package graft.tools

import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Attribution probe for WriteBench's last-decade growth: is the 5M→50M
  * superlinear term in the write PATH (would indict the design) or in
  * the SIZE OF A SINGLE BATCH (a sort/spill/page-cache effect of pushing
  * one giant batch through one local JVM — irrelevant at deployment,
  * where ingest arrives as bounded micro-batches and a cluster runs the
  * per-batch work on executors with their own memory)?
  *
  * Writes the same 50M rows once as ONE writeEvents call and once as N
  * sequential bounded batches into a fresh stream. If N×(5M batch) ≈
  * N × the 50× point while 1×(50M batch) is ~2.4× that, the term is
  * batch size, not row count — and per-batch bounded ingest (the
  * streaming sink's shape) stays linear.
  *
  * Usage: runMain graft.tools.WriteBatched <sfDir> [copies=500] [batches=10]
  */
object WriteBatched {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 500
    val batches = if (args.length > 2) args(2).toInt else 10
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
    def volume(reps: Int, repOffset: Int): DataFrame =
      events.repartition(cpus.toInt)
        .crossJoin(spark.range(repOffset, repOffset + reps).select($"id".as("rep")))
        .select(
          ($"user_id" + $"rep" * 1000000000L).cast("string").as("routingKey"),
          unix_millis($"ts".cast("timestamp")).as("eventTime"),
          encode(concat_ws("|", $"event_id", $"event_type", $"props"), "UTF-8").as("payload"))

    val perBatch = copies / batches
    def freshStream(): (GraftStreams, String) = {
      val root = Files.createTempDirectory("graft-wbb").toString
      val g = new GraftStreams(spark, root)
      g.catalog.createScope("wb")
      g.catalog.createStream("wb", "ev", StreamConfig(initialSegments = 32))
      (g, root)
    }

    // N bounded batches, sequential (one writer), one manifest CAS each.
    // Only one 50M-row copy is cached at a time (slices released before
    // the single-batch copy is built) so both cells see the same memory.
    val slices = (0 until batches).map(i => volume(perBatch, i * perBatch).cache())
    val nBig = slices.map(_.count()).sum

    val (g1, r1) = freshStream()
    val t0 = System.nanoTime()
    slices.foreach(s => g1.writeEvents("wb", "ev", s))
    val tBatched = (System.nanoTime() - t0) / 1e9
    val n1 = g1.readEvents("wb", "ev").count()
    require(n1 == nBig, s"batched wrote $n1 of $nBig")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r1))
    slices.foreach(_.unpersist(true))

    val big = volume(copies, 0).cache()
    require(big.count() == nBig)
    val (g2, r2) = freshStream()
    val t1 = System.nanoTime()
    g2.writeEvents("wb", "ev", big)
    val tSingle = (System.nanoTime() - t1) / 1e9
    val n2 = g2.readEvents("wb", "ev").count()
    require(n2 == nBig, s"single wrote $n2 of $nBig")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r2))

    println(f"[writebatched] rows=$nBig batches=$batches per_batch=${nBig / batches} " +
      f"batched=$tBatched%.2fs single=$tSingle%.2fs ratio=${tSingle / tBatched}%.2fx " +
      f"batched_rows_per_s=${nBig / tBatched}%.0f")
    spark.stop()
  }
}
