package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end engine round trips surfaced in the driver-checked
  * inventory: the events table is pushed through the engine's own write
  * path (routing-hash partitioning, offset assignment, manifest commit)
  * and read back through manifest-planned scans; the DuckDB oracle
  * aggregates the source table directly. A hash match therefore proves
  * the storage engine loses nothing, duplicates nothing and preserves
  * payloads — the ReadWriteTest invariant, checked against an external
  * oracle.
  */
object StreamQueries {

  private def roundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-rtq").toString
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 8))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    g.readEvents("q", "ev")
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(decode($"payload", "UTF-8")).as("n_types"),
           min($"eventTime").as("first_time"),
           max($"eventTime").as("last_time"))
      .orderBy($"routingKey")
  }

  private val roundtripSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_time,
      |  epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_time
      |FROM events GROUP BY 1 ORDER BY routingKey""".stripMargin

  /** Transactional round trip: half the events go through a committed
    * transaction, a decoy batch through an aborted one; the oracle sees
    * only the source table — a match proves txn atomicity end to end.
    */
  private def txnRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-rtx").toString
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"event_id")
    g.writeEvents("q", "ev", src.filter($"event_id" % 2 === 0).drop("event_id"))
    val txn = g.beginTxn("q", "ev")
    g.writeToTxn("q", "ev", txn, src.filter($"event_id" % 2 === 1).drop("event_id"))
    val decoy = g.beginTxn("q", "ev")
    g.writeToTxn("q", "ev", decoy, src.limit(500).drop("event_id"))
    g.commitTxn("q", "ev", txn)
    g.abortTxn("q", "ev", decoy)
    g.readEvents("q", "ev")
      .groupBy(decode($"payload", "UTF-8").as("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  private val txnRoundtripSql =
    """SELECT event_type, COUNT(*) AS n FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Per-key total order, hash-checked externally across a SCALE event:
    * events are written in event_id order (half before, half after an
    * epoch change), read back, and each key's payload chain in engine
    * order (epoch-major, then offset — the reader drain rule) is md5'd.
    * The oracle chains the same ids in plain event_id order — a hash
    * match proves routing, offset assignment, sealing, the epoch
    * hand-off and manifest-planned reads all preserve the reference's
    * ordering guarantee (SegmentSelector.java:87 + ReaderGroupState
    * .java:966 SegmentCompleted).
    */
  private def orderChain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ord").toString
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir)
      .filter($"user_id" < 200)
      .select($"user_id", $"event_id")
      .orderBy($"event_id")
      .select(
        $"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"),
        $"event_id")
    val half = src.agg(expr("percentile(event_id, 0.5)")).head().getDouble(0)
    g.writeEvents("q", "ev", src.filter($"event_id" <= half).drop("event_id"))
    g.scaleStream("q", "ev", 7) // epoch change mid-stream
    g.writeEvents("q", "ev", src.filter($"event_id" > half).drop("event_id"))

    g.readEvents("q", "ev")
      .withColumn("epoch", shiftrightunsigned($"segmentId", 32))
      .select($"routingKey",
        struct($"epoch", $"segmentId", $"offset").as("pos"),
        decode($"payload", "UTF-8").as("pid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list(struct($"pos", $"pid"))),
          x => x.getField("pid")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val orderChainSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id < 200
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Large-event round trip (LargeEventWriter analog): payloads straddling
    * MAX_EVENT_SIZE — 100 B, exactly 8 MiB (one chunk), 8 MiB + 1 (the
    * reject→chunk boundary), and 12 MiB through a TRANSACTION — go through
    * writeEvents/writeToTxn and come back from readEvents reassembled. The
    * oracle recomputes byte length and md5 of each payload from the same
    * deterministic generators, so a hash match proves chunking + merge +
    * reassembly is byte-exact end to end.
    */
  private def largeEvent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-lrg").toString
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 2))
    // the repeat count rides the range's id column so ConstantFolding
    // cannot pre-materialize the multi-MiB payload into the plan (a
    // folded literal bloats every task binary by the payload size)
    def ev(key: String, unit: String, n: Long, extra: String = ""): DataFrame = {
      import org.apache.spark.sql.functions.{concat, encode, lit, repeat}
      s.range(1).select(lit(key).as("routingKey"), lit(1L).as("eventTime"),
        encode(concat(repeat(lit(unit), (col("id") + n).cast("int")), lit(extra)),
          "UTF-8").as("payload"))
    }
    g.writeEvents("q", "ev",
      ev("k1_small", "s", 100)
        .union(ev("k2_exact", "abcdefgh", 1048576))
        .union(ev("k3_plus1", "abcdefgh", 1048576, extra = "x")))
    val txn = g.beginTxn("q", "ev")
    g.writeToTxn("q", "ev", txn, ev("k4_txn12m", "0123456789abcdef", 786432))
    g.commitTxn("q", "ev", txn)
    g.readEvents("q", "ev")
      .select($"routingKey", length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("digest"))
      .orderBy($"routingKey")
  }

  private val largeEventSql =
    """SELECT routingKey, n_bytes, digest FROM (
      |  SELECT 'k1_small' AS routingKey, CAST(100 AS BIGINT) AS n_bytes,
      |         md5(repeat('s', 100)) AS digest
      |  UNION ALL
      |  SELECT 'k2_exact', CAST(8388608 AS BIGINT), md5(repeat('abcdefgh', 1048576))
      |  UNION ALL
      |  SELECT 'k3_plus1', CAST(8388609 AS BIGINT), md5(concat(repeat('abcdefgh', 1048576), 'x'))
      |  UNION ALL
      |  SELECT 'k4_txn12m', CAST(12582912 AS BIGINT), md5(repeat('0123456789abcdef', 786432))
      |) t ORDER BY routingKey""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("stream_roundtrip_agg", roundtrip _,    Some(roundtripSql)),
    ("stream_txn_roundtrip", txnRoundtrip _, Some(txnRoundtripSql)),
    ("stream_order_chain",   orderChain _,   Some(orderChainSql)),
    ("stream_large_event",   largeEvent _,   Some(largeEventSql)),
  )
}
