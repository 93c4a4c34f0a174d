package graft.tools

import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Measures what the DSv2 scan pushdown layer actually buys on a
  * payload-heavy stream (payload is the data volume on an event stream;
  * these are the shapes SCALING.md claims go from O(stream bytes) to
  * O(row-index bytes) or O(manifest)):
  *
  *   full_payload_scan  — sum(length(payload)): must read every payload
  *                        byte; the baseline.
  *   col_pruned_scan    — the identical aggregate shape on routingKey:
  *                        same rows, payload column pruned from the
  *                        parquet read — the delta IS the payload bytes.
  *   time_slice_payload — payload sum over the middle time quarter:
  *                        manifest file pruning plans ~1/4 of the files.
  *   slice_batch_surface— same slice through readEvents(+filter): parquet
  *                        row-group pruning only, every file planned.
  *   manifest_count     — count/min/max(eventTime): aggregate pushdown,
  *                        zero file IO.
  *
  * Each cell runs three times (one warm-up + two timed); the min timed
  * wall is reported.
  * Usage: runMain graft.tools.ScanBench <sfDir> [padBytes=1024] [segments=8]
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pad = if (args.length > 1) args(1).toInt else 1024
    val segments = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = Files.createTempDirectory("graft-scanbench").toString
    val g = new GraftStreams(spark, work)
    g.catalog.createScope("b")
    g.catalog.createStream("b", "ev", StreamConfig(initialSegments = segments))

    // payload must be INCOMPRESSIBLE or parquet compression hides the
    // byte volume the payload-scan baseline is supposed to pay: pad/32
    // concatenated per-row md5 hex blocks ≈ `pad` high-entropy bytes
    val src = graft.Tables.events(spark, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode(expr(s"array_join(transform(sequence(0, ${math.max(1, pad / 32) - 1}), " +
        "i -> md5(concat(cast(event_id as string), '-', cast(i as string)))), '')"),
        "UTF-8").as("payload"))
    val b = src.agg(min($"eventTime"), max($"eventTime")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val cuts = (1 to 7).map(i => mn + i * ((mx - mn) / 8))
    (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2).foreach { case Seq(lo, hi) =>
      g.writeEvents("b", "ev", src.filter($"eventTime" >= lo && $"eventTime" < hi))
    }
    val meta = g.catalog.getStream("b", "ev")
    println(s"stream: ${meta.files.size} files, " +
      s"${meta.files.map(_.byteSize).sum / 1024 / 1024} MiB, " +
      s"${meta.files.map(_.rowCount).sum} rows")

    def dsv2 = spark.read.format("graft-stream")
      .option("rootDir", work).option("scope", "b").option("stream", "ev").load()

    val (qLo, qHi) = (mn + 2 * ((mx - mn) / 8), mn + 4 * ((mx - mn) / 8))
    var out = List.empty[String]
    def cell(name: String)(f: => Long): Unit = {
      f // warm-up run: plan compile + page cache
      val (s, v) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }.minBy(_._1)
      out ::= f""""$name":$s%.3f"""
      println(f"$name%-22s $s%7.3f s  (result $v)")
    }

    cell("full_payload_scan") {
      dsv2.agg(sum(length($"payload"))).head().getLong(0)
    }
    cell("col_pruned_scan") {
      // identical aggregate shape to full_payload_scan, payload column
      // pruned from the read — the delta IS the payload byte volume
      dsv2.agg(sum(length($"routingKey"))).head().getLong(0)
    }
    if (sys.env.contains("SCANBENCH_DEBUG")) {
      println(dsv2.agg(sum(length($"routingKey")))
        .queryExecution.executedPlan.toString)
      cell("raw_parquet_rk") {
        spark.read.schema(GraftStreams.storageSchema)
          .parquet(meta.files.map(_.path): _*)
          .agg(sum(length($"routingKey"))).head().getLong(0)
      }
    }
    cell("time_slice_payload") {
      dsv2.filter($"eventTime" >= qLo && $"eventTime" < qHi)
        .agg(sum(length($"payload"))).head().getLong(0)
    }
    cell("slice_batch_surface") {
      g.readEvents("b", "ev")
        .filter($"eventTime" >= qLo && $"eventTime" < qHi)
        .agg(sum(length($"payload"))).head().getLong(0)
    }
    cell("manifest_count") {
      dsv2.agg(count(lit(1)), min($"eventTime"), max($"eventTime")).head().getLong(0)
    }
    println(out.reverse.mkString("{", ",", "}"))
    spark.stop()
  }
}
