package graft.sources

import graft.SparkTestSession
import graft.core._
import graft.storage.GraftStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Event-time windowed aggregation with watermarks and custom keyed state
  * (mapGroupsWithState) over the graft streaming source — SURVEY §2.11's
  * "free from Structured Streaming" surface, proven against the engine's
  * own source.
  */
class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(): (GraftStreams, String) = {
    val root = Files.createTempDirectory("graft-st").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    (g, root)
  }

  private def batch(n: Int, t0: Long): DataFrame =
    spark.range(n).select(
      concat(lit("u"), col("id") % 5).as("routingKey"),
      (lit(t0) + col("id") * 60000).as("eventTime"), // one event per minute
      encode(col("id").cast("string"), "UTF-8").as("payload"))

  test("watermarked tumbling-window aggregation over the graft source") {
    val (g, root) = mk()
    val t0 = 1704067200000L
    g.writeEvents("s", "ev", batch(120, t0)) // 2 hours of events

    val q = spark.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .withColumn("ts", timestamp_millis($"eventTime"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"routingKey")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("winagg").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only closed windows; write a late-ish batch to
      // push the watermark past the second hour, then a sentinel far ahead
      g.writeEvents("s", "ev", batch(1, t0 + 4 * 3600 * 1000L))
      q.processAllAvailable()
      val out = spark.table("winagg")
      // both full hours closed: 5 keys × 2 windows, 12 events each
      assert(out.count() == 10L)
      assert(out.agg(sum($"n")).head().getLong(0) == 120L)
      assert(out.select($"n").distinct().collect().map(_.getLong(0)).toSet == Set(12L))
    } finally q.stop()
  }

  test("session_window sessions close under the watermark over the graft source") {
    val (g, root) = mk()
    val t0 = 1704067200000L
    // per key: a burst of 10 events 1 min apart, a 2-hour gap, then a
    // second burst of 5 — two sessions per key under a 30-min gap
    val burst1 = spark.range(50).select(
      concat(lit("u"), col("id") % 5).as("routingKey"),
      (lit(t0) + expr("(id DIV 5) * 60000")).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))
    val burst2 = spark.range(25).select(
      concat(lit("u"), col("id") % 5).as("routingKey"),
      (lit(t0 + 2 * 3600 * 1000L) + expr("(id DIV 5) * 60000")).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))
    g.writeEvents("s", "ev", burst1)
    g.writeEvents("s", "ev", burst2)

    val q = spark.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .withColumn("ts", timestamp_millis($"eventTime"))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"routingKey")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("sesswin").outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinel far ahead closes the second session for every key
      g.writeEvents("s", "ev", batch(1, t0 + 8 * 3600 * 1000L))
      q.processAllAvailable()
      val out = spark.table("sesswin")
      // 5 keys × 2 sessions
      assert(out.count() == 10L)
      assert(out.agg(sum($"n")).head().getLong(0) == 75L)
      assert(out.select($"n").distinct().collect().map(_.getLong(0)).toSet == Set(10L, 5L))
    } finally q.stop()
  }

  test("stream-stream join: two graft streams joined on key within watermark bounds") {
    val root = Files.createTempDirectory("graft-ssj").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "left", StreamConfig(initialSegments = 2))
    g.catalog.createStream("s", "right", StreamConfig(initialSegments = 2))
    val t0 = 1704067200000L
    g.writeEvents("s", "left", batch(40, t0))
    // right side: same keys, shifted 30s — inside the 2-minute join window
    g.writeEvents("s", "right", batch(40, t0 + 30000L))

    def side(stream: String, pfx: String) =
      spark.readStream.format("graft-stream")
        .option("rootDir", root).option("scope", "s").option("stream", stream)
        .load()
        .select($"routingKey".as(s"${pfx}_key"),
          timestamp_millis($"eventTime").as(s"${pfx}_ts"),
          $"offset".as(s"${pfx}_off"))
        .withWatermark(s"${pfx}_ts", "10 minutes")

    val joined = side("left", "l").join(side("right", "r"),
      expr("l_key = r_key AND r_ts BETWEEN l_ts AND l_ts + interval 2 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("ssj")
      // each left event matches right events of the same key within
      // [l_ts, l_ts+2min]: keys repeat every 5 min (5 keys, 1/min), so
      // exactly the 30s-shifted twin (+ none else) → 40 matches
      assert(out.count() == 40L)
      assert(out.filter($"l_key" =!= $"r_key").count() == 0L)
    } finally q.stop()
  }

  test("streaming dedup: dropDuplicatesWithinWatermark drops redelivered events") {
    val (g, root) = mk()
    val t0 = 1704067200000L
    g.writeEvents("s", "ev", batch(30, t0))
    // redeliver the same 30 logical events (same routingKey+eventTime,
    // fresh offsets) — the at-least-once shape streaming dedup exists for
    g.writeEvents("s", "ev", batch(30, t0))

    val q = spark.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .select($"routingKey", timestamp_millis($"eventTime").as("ts"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("routingKey", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 30L,
        "duplicate deliveries survived dropDuplicatesWithinWatermark")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-key running state across micro-batches") {
    val (g, root) = mk()
    val t0 = 1704067200000L
    g.writeEvents("s", "ev", batch(50, t0))

    val updateFn: (String, Iterator[(String, Long)], GroupState[Long]) => (String, Long) =
      (key, rows, state) => {
        val total = state.getOption.getOrElse(0L) + rows.size
        state.update(total)
        (key, total)
      }

    val q = spark.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .option("maxRowsPerTrigger", "20") // force multiple micro-batches
      .load()
      .select($"routingKey", $"offset")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateFn)
      .toDF("key", "running")
      .writeStream.format("memory").queryName("state").outputMode("update").start()
    try {
      q.processAllAvailable()
      g.writeEvents("s", "ev", batch(25, t0 + 1))
      q.processAllAvailable()
      // last update per key must equal the total delivered for that key
      val last = spark.table("state")
        .groupBy($"key").agg(max($"running").as("running"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(last == Map("u0" -> 15L, "u1" -> 15L, "u2" -> 15L, "u3" -> 15L, "u4" -> 15L))
    } finally q.stop()
  }
}
