package graft.sources

import graft.SparkTestSession
import graft.core._
import graft.storage.GraftStreams
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Spark 4's transformWithState (the successor of mapGroupsWithState:
  * typed per-key state variables + timers on the RocksDB store) driven
  * through the graft streaming source. Two reference semantics map onto
  * it directly: the per-writer event-number attribute is a ValueState
  * (AppendProcessor.java:179-387), and the idle-writer exclusion that
  * watermark computation applies to writers silent past the aggregation
  * timeout (PeriodicWatermarking.java:192) is a processing-time timer.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(): (GraftStreams, String) = {
    val root = Files.createTempDirectory("graft-tws").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    (g, root)
  }

  private def rocksSession() = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2
  }

  private def batch(n: Int, t0: Long, keys: Int = 5): DataFrame =
    spark.range(n).select(
      concat(lit("u"), col("id") % keys).as("routingKey"),
      (lit(t0) + col("id") * 1000).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))

  test("ValueState keeps a per-key running count across micro-batches") {
    val (g, root) = mk()
    val t0 = 1704067200000L
    g.writeEvents("s", "ev", batch(50, t0))

    class CountProcessor extends StatefulProcessor[String, (String, Long), (String, Long)] {
      @transient private var count: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                   tv: TimerValues): Iterator[(String, Long)] = {
        val total = (if (count.exists()) count.get() else 0L) + rows.size
        count.update(total)
        Iterator.single((key, total))
      }
    }

    val s2 = rocksSession()
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .option("maxRowsPerTrigger", "20") // force multiple micro-batches
      .load()
      .select($"routingKey", $"offset")
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("key", "running")
      .writeStream.format("memory").queryName("tws_count").outputMode("update").start()
    try {
      q.processAllAvailable()
      g.writeEvents("s", "ev", batch(25, t0 + 60000))
      q.processAllAvailable()
      val last = s2.table("tws_count")
        .groupBy($"key").agg(max($"running").as("running"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(last == Map("u0" -> 15L, "u1" -> 15L, "u2" -> 15L, "u3" -> 15L, "u4" -> 15L))
    } finally q.stop()
  }

  test("event-time timer flags keys that went idle (idle-writer exclusion)") {
    val (g, root) = mk()
    val t0 = 1704067200000L
    // batch 1: keys u0..u4 up to ~t0+19s; batch 2: only u0/u1 continue
    g.writeEvents("s", "ev", batch(20, t0, keys = 5))

    // Each input batch (re)arms a timer 30 EVENT-time seconds past the
    // key's newest event; a key whose timer expires under the advancing
    // watermark is emitted as idle — PeriodicWatermarking.java:192's
    // idle-writer exclusion, expressed with event-time timers so firing
    // is deterministic (watermark only moves on data batches).
    class IdleProcessor extends StatefulProcessor[String, (String, Long), (String, String)] {
      @transient private var lastSeen: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                   tv: TimerValues): Iterator[(String, String)] = {
        val newest = rows.map(_._2).max
        lastSeen.update(newest)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(newest + 30000L)
        Iterator.single((key, "active"))
      }
      override def handleExpiredTimer(key: String, tv: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[(String, String)] =
        Iterator.single((key, "idle"))
    }

    val s2 = rocksSession()
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .load()
      .withColumn("ts", timestamp_millis($"eventTime"))
      .withWatermark("ts", "5 seconds")
      .select($"routingKey", $"eventTime")
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new IdleProcessor, TimeMode.EventTime(), OutputMode.Update())
      .toDF("key", "status")
      .writeStream.format("memory").queryName("tws_idle").outputMode("update").start()
    try {
      q.processAllAvailable()
      // u0/u1 continue at t0+60s..69s: their timers re-arm to ~t0+98s;
      // u2..u4 keep expiries ≤ t0+49s
      g.writeEvents("s", "ev", batch(10, t0 + 60000, keys = 2))
      q.processAllAvailable()
      // sentinel pushes the watermark to t0+75s: past the silent keys'
      // expiries, short of the active keys'
      g.writeEvents("s", "ev", batch(1, t0 + 80000, keys = 1))
      q.processAllAvailable()
      val out = s2.table("tws_idle")
      val idle = out.filter($"status" === "idle")
        .select($"key").distinct().collect().map(_.getString(0)).toSet
      assert(idle == Set("u2", "u3", "u4"),
        s"exactly the silent keys must be flagged idle: got $idle")
      val active = out.filter($"status" === "active")
        .select($"key").distinct().collect().map(_.getString(0)).toSet
      assert(active == Set("u0", "u1", "u2", "u3", "u4"))
    } finally q.stop()
  }
}
