package graft.tools

import graft.core.{StreamConfig, StreamCut}
import graft.storage.GraftStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Engine write/read path scale growth — the half ScaleBench leaves out.
  *
  * ScaleBench measures the QUERY surface at two scale factors; the
  * engine-write queries are excluded there because each builds a
  * fixed-size stream per invocation. This tool measures the write path
  * itself: the same event batch at volume V and K×V is pushed through
  * `GraftStreams.writeEvents` (routing-hash CASE routing, per-segment
  * offset assignment, manifest CAS commit) into fresh streams, then read
  * back through (a) the manifest-planned batch scan and (b) the paced
  * DSv2 streaming source drained with AvailableNow. Ideal growth is K —
  * both tiers of the path are shuffle/scan-bound with per-batch constant
  * manifest work (one CAS per writeEvents call regardless of volume,
  * the design property that lets the sink scale to 1000 executors:
  * executors write files, the driver commits one manifest delta).
  *
  * Each (volume, surface) cell is run twice against fresh streams; the
  * second (warm) wall is reported, matching the Bench methodology.
  *
  * Usage: runMain graft.tools.WriteBench <sfDir> [k=10] [segments=32]
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val segments = if (args.length > 2) args(2).toInt else 32
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
    // K-replicated volume with RE-KEYED routing keys: replica i offsets
    // user_id by i*1e9 so the key population (and thus per-segment
    // routing spread) grows with the data — replaying identical keys
    // would only deepen per-key chains, not widen the key space.
    // range-crossJoin rather than a copies-way union: the multiset is
    // identical but the plan stays O(1) in `copies` (a 500x run would
    // otherwise pay a 500-branch union through analysis/codegen). The
    // events side is spread across the cores FIRST — sf0.1 arrives as a
    // handful of parquet files, and the crossJoin inherits the probe
    // side's partitioning, so without this the cached volume sits in ~4
    // fat partitions and the timed write path scans on 4 tasks.
    def volume(copies: Int): DataFrame =
      events.repartition(cpus.toInt)
        .crossJoin(spark.range(copies).select($"id".as("rep")))
        .select(
          ($"user_id" + $"rep" * 1000000000L).cast("string").as("routingKey"),
          unix_millis($"ts".cast("timestamp")).as("eventTime"),
          encode(concat_ws("|", $"event_id", $"event_type", $"props"), "UTF-8").as("payload"))

    val vBase = volume(1).cache(); val nBase = vBase.count()
    val vBig = volume(k).cache(); val nBig = vBig.count()

    def run(df: DataFrame, rows: Long): (Double, Double, Double) = {
      def once(): (Double, Double, Double) = {
        val rootPath = Files.createTempDirectory("graft-wb")
        val root = rootPath.toString
        val g = new GraftStreams(spark, root)
        g.catalog.createScope("wb")
        g.catalog.createStream("wb", "ev", StreamConfig(initialSegments = segments))
        val t0 = System.nanoTime()
        g.writeEvents("wb", "ev", df)
        val tWrite = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val got = g.readEvents("wb", "ev")
          .agg(count(lit(1)), sum(length($"payload"))).head()
        val tRead = (System.nanoTime() - t1) / 1e9
        require(got.getLong(0) == rows, s"read ${got.getLong(0)} of $rows rows")
        // streaming drain: paced pages through the DSv2 source
        val pace = math.max(1000L, rows / 4)
        val sink = s"wb_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val t2 = System.nanoTime()
        val q = spark.readStream.format("graft-stream")
          .option("rootDir", root).option("scope", "wb").option("stream", "ev")
          .option("maxRowsPerTrigger", pace.toString)
          .load()
          .groupBy($"segmentId").agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(sink).outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val tDrain = (System.nanoTime() - t2) / 1e9
        val drained = spark.table(sink).agg(sum($"n")).head().getLong(0)
        require(drained == rows, s"drained $drained of $rows rows")
        // reclaim the run's stream root (a k=50 invocation otherwise
        // leaves ~2(1+k) corpus copies of parquet in /tmp)
        org.apache.commons.io.FileUtils.deleteQuietly(rootPath.toFile)
        (tWrite, tRead, tDrain)
      }
      once() // cold: codegen + state-store init
      once()
    }

    val (wB, rB, dB) = run(vBase, nBase)
    val (wK, rK, dK) = run(vBig, nBig)
    vBase.unpersist(); vBig.unpersist()
    def fmt(v: Double): String = f"$v%.2f"
    def growth(a: Double, b: Double): String = fmt(b / math.max(a, 1e-9))
    println(f"[writebench] write  base=${fmt(wB)}s ${k}x=${fmt(wK)}s growth=${growth(wB, wK)}x (ideal $k)")
    println(f"[writebench] read   base=${fmt(rB)}s ${k}x=${fmt(rK)}s growth=${growth(rB, rK)}x")
    println(f"[writebench] drain  base=${fmt(dB)}s ${k}x=${fmt(dK)}s growth=${growth(dB, dK)}x")
    println(s"""{"metric":"write_path_growth","k":$k,"rows_base":$nBase,"rows_scaled":$nBig,""" +
      s""""segments":$segments,""" +
      s""""write":{"base":${fmt(wB)},"scaled":${fmt(wK)},"growth":${growth(wB, wK)}},""" +
      s""""read":{"base":${fmt(rB)},"scaled":${fmt(rK)},"growth":${growth(rB, rK)}},""" +
      s""""drain":{"base":${fmt(dB)},"scaled":${fmt(dK)},"growth":${growth(dB, dK)}},""" +
      s""""write_rows_per_s":{"base":${fmt(nBase / wB)},"scaled":${fmt(nBig / wK)}}}""")
    spark.stop()
  }
}
