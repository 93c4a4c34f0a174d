package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import graft.core.{SegmentId, SegmentRates, StreamConfig, StreamCut}
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

  /** Trigger pacing for the AvailableNow streaming-state fixtures: exactly
    * TWO data micro-batches (`ceil(rows/2)`). Cross-trigger state is what
    * these fixtures exercise, and two triggers is the minimum that does;
    * r15's `rows/3` floor-division left a 1–2-row remainder page, so every
    * query paid FOUR micro-batches (r16 job profile: ~0.2 s of tasks plus
    * ~0.2 s of driver-side planning/WAL gap per batch — the family's
    * dominant fixed cost, guide §1/§2). Results are pacing-invariant by
    * construction (the oracle computes from the source table); `floor`
    * keeps the tiny-sf single-page behavior unchanged. Queries whose
    * trigger structure is itself the semantics (`ev_multistream` paging,
    * `ev_stream_join_late`'s 3-trigger watermark script,
    * `stream_pipe_resume`'s mid-stream restart) keep their own pacing.
    *
    * The admission control splits the row budget evenly across segments
    * (`latestOffset`: allowance = pace / segments), so the pace is sized
    * from the LARGEST segment — `segments × ceil(max_seg/2)` — or a
    * routing-hash-skewed segment still needs a third page.
    */
  private def twoTriggerPace(bySeg: Map[Long, Long], floor: Long = 500L): Long = {
    val maxSeg = if (bySeg.isEmpty) 0L else bySeg.values.max
    math.max(floor, bySeg.size.toLong * ((maxSeg + 1L) / 2L))
  }

  private def roundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-rtq")
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
    val work = graft.util.WorkDirs.temp("graft-rtx")
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
  private def orderChain(s: SparkSession, dir: String): DataFrame =
    chainAcrossScale(s, dir, initialSegments = 4, scaledSegments = 7)

  /** Shared body of `stream_order_chain` (scale UP mid-stream) and
    * `stream_merge_chain` (scale DOWN — children with multiple sealed
    * parents, ScaleOperationTask.java:65-173 merge case). Same invariant
    * either way: the per-key payload chain read back in epoch-major,
    * offset-minor order equals the source's event_id order.
    */
  private def chainAcrossScale(s: SparkSession, dir: String,
                               initialSegments: Int, scaledSegments: Int): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ord")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments))
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
    g.scaleStream("q", "ev", scaledSegments) // epoch change mid-stream
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

  /** Scale-DOWN merge through the driver gate: 6 segments merge to 2, so
    * every epoch-1 segment has MULTIPLE sealed parents; a chain match
    * proves per-key order and exactly-once delivery survive the merge.
    */
  private def mergeChain(s: SparkSession, dir: String): DataFrame =
    chainAcrossScale(s, dir, initialSegments = 6, scaledSegments = 2)

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
    val work = graft.util.WorkDirs.temp("graft-lrg")
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

  /** getNextStreamCut iteration (BatchClientFactory.java:123): a real
    * stream is loaded through the write path, then the cut is advanced
    * from the head in fixed approxRows steps until it clamps at the
    * tail; each step also reports unreadRows (ReaderGroupMetrics
    * analog). Single segment so the advance/clamp arithmetic — the same
    * code path any segment count takes per segment — is replayable by
    * the oracle as pure COUNT(*) arithmetic (the multi-segment split is
    * murmur3-routed, deliberately not oracle-replayable; multi-segment
    * behavior is spec-covered in GraftStreamsSpec).
    */
  private def nextCut(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-cut")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 1))
    val src = Tables.events(s, dir).filter($"user_id" < 50).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    var cut = g.catalog.getStream("q", "ev").headStreamCut
    val steps = (1 to 12).map { k =>
      cut = g.nextStreamCut("q", "ev", cut, approxRows = 500L)
      (k.toLong, cut.positions.values.sum, g.unreadRows("q", "ev", cut))
    }
    s.createDataFrame(steps).toDF("k", "position", "unread").orderBy($"k")
  }

  private val nextCutSql =
    """WITH n AS (SELECT COUNT(*) AS cnt FROM events WHERE user_id < 50),
      |k AS (SELECT UNNEST(generate_series(1, 12)) AS k)
      |SELECT k, LEAST(cnt, k * 500) AS position,
      |  cnt - LEAST(cnt, k * 500) AS unread
      |FROM k, n ORDER BY k""".stripMargin

  /** ByteStream seek/read/truncate round trip (ByteStreamReader.java:
    * 34-149 onSeek/read, ByteStreamWriter.java:58): 200 fixed-width
    * ASCII records append one at a time (single-writer contract), then
    * offset windows — including a chunk-straddling range, a seek to near
    * the tail, and a post-truncation read from the new head — come back
    * md5'd. The oracle rebuilds the identical byte string with
    * string_agg and slices the same windows, so a hash match proves
    * append offsets, chunk-boundary reads, seek and truncateBefore are
    * byte-exact.
    */
  private def byteStreamRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-bs")
    val bs = new graft.storage.ByteStreams(work)
    bs.create("q", "b")
    // 200 events * 8 ASCII bytes, appended in event_id order — bounded
    // driver loop by design: the reference's byte-stream API is a raw
    // single-writer OutputStream, not a relational surface
    val ids = Tables.events(s, dir).filter($"event_id" < 200)
      .select($"event_id").orderBy($"event_id").as[Long].collect()
    ids.foreach(id => bs.append("q", "b", f"$id%08d".getBytes("UTF-8")))
    val tail = bs.tail("q", "b")
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    def win(label: String, off: Long, len: Int) =
      (label, off, len.toLong, md5hex(bs.read("q", "b", off, len)))
    val pre = Seq(
      win("r1_head", 0L, 100),
      win("r2_mid", 123L, 457),
      win("r3_chunk_straddle", 795L, 10),
      win("r4_seek_tail", tail - 96L, 96))
    bs.truncateBefore("q", "b", 640L)
    val post = Seq(win("r5_after_truncate", bs.head("q", "b"), 160))
    (pre ++ post).toDF("label", "off", "n_bytes", "digest").orderBy($"label")
  }

  private val byteStreamRoundtripSql =
    """WITH f AS (
      |  SELECT string_agg(lpad(CAST(event_id AS VARCHAR), 8, '0'), ''
      |           ORDER BY event_id) AS s
      |  FROM events WHERE event_id < 200),
      |t AS (SELECT CAST(length(s) AS BIGINT) AS tail FROM f),
      |w AS (SELECT * FROM (VALUES
      |  ('r1_head', CAST(0 AS BIGINT), 100),
      |  ('r2_mid', CAST(123 AS BIGINT), 457),
      |  ('r3_chunk_straddle', CAST(795 AS BIGINT), 10),
      |  ('r4_seek_tail', CAST(NULL AS BIGINT), 96),
      |  ('r5_after_truncate', CAST(640 AS BIGINT), 160)) AS v(label, off0, len))
      |SELECT label, COALESCE(off0, tail - 96) AS off, CAST(len AS BIGINT) AS n_bytes,
      |  md5(substr(s, CAST(COALESCE(off0, tail - 96) AS INT) + 1, len)) AS digest
      |FROM w, f, t ORDER BY label""".stripMargin

  /** Multi-stream reader group end to end (ReaderGroupConfig.java:49-108):
    * the events table splits across TWO engine streams (even event_ids →
    * x with 2 segments, odd → y with 3), then ONE streaming query
    * subscribes to both (`streams` = "q/x,q/y"), drains them with
    * Trigger.AvailableNow in maxRowsPerTrigger pages through the DSv2
    * source, and the memory-sink result is aggregated per (stream,
    * event_type). The oracle recomputes the same split from the source
    * table — a hash match proves the composite offset advanced each
    * stream independently, pages were exactly-once, and the `stream`
    * identity column is correct.
    */
  private def multiStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-msq")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "x", StreamConfig(initialSegments = 2))
    g.catalog.createStream("q", "y", StreamConfig(initialSegments = 3))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"event_id")
    g.writeEvents("q", "x", src.filter($"event_id" % 2 === 0).drop("event_id"))
    g.writeEvents("q", "y", src.filter($"event_id" % 2 === 1).drop("event_id"))
    // page size scales with the corpus so the drain is ~5 pages at any
    // sf — paging semantics stay exercised without 50 micro-batches of
    // fixed trigger overhead dominating the wall time at bench scale
    val pace = math.max(2000L,
      g.unreadRows("q", "x", StreamCut(Map.empty)) +
        g.unreadRows("q", "y", StreamCut(Map.empty))) / 5L
    val sink = s"msq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("streams", "x,y")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
      .groupBy($"stream", decode($"payload", "UTF-8").as("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"stream", $"event_type")
  }

  private val multiStreamSql =
    """SELECT CASE WHEN event_id % 2 = 0 THEN 'q/x' ELSE 'q/y' END AS stream,
      |  event_type, COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY stream, event_type""".stripMargin

  /** Compaction equivalence vs the EXTERNAL oracle (TableCompactor /
    * chunk-defrag analog): the events table loads in FIVE separate
    * batches (5 files per segment), `compactStream` folds them to one
    * per segment, more data lands after, and a second compaction runs.
    * The read-back per-key payload chain in engine order must still
    * match the oracle's event_id-ordered chain — compaction preserved
    * every row, every payload and the per-key order, not just counts.
    */
  private def compactedRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-cpq")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir)
      .filter($"user_id" < 150)
      .orderBy($"event_id")
      .select(
        $"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"),
        $"event_id")
      // pin the sorted slice once: the 5 batch writes below otherwise
      // re-scan and re-SORT the source per commit (filter preserves the
      // checkpointed order, so every batch's content and arrival order —
      // and hence the engine chain — are unchanged) (r15)
      .localCheckpoint()
    for (i <- 0 until 4)
      g.writeEvents("q", "ev", src.filter($"event_id" % 5 === i).drop("event_id"))
    g.compactStream("q", "ev", minFilesPerSegment = 2)
    g.writeEvents("q", "ev", src.filter($"event_id" % 5 === 4).drop("event_id"))
    g.compactStream("q", "ev", minFilesPerSegment = 2)
    // chain in ENGINE order (per-key offset order — each key lives in
    // one segment here), which the oracle replays as the write
    // interleaving (batch i carried eids ≡ i mod 5, in eid order within
    // a batch): a compaction that scrambles row order inside a
    // rewritten file breaks the hash even when the multiset survives
    g.readEvents("q", "ev")
      .select($"routingKey", $"offset",
        decode($"payload", "UTF-8").cast("long").as("pid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list(struct($"offset", $"pid"))),
          x => x.getField("pid").cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val compactedRoundtripSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id % 5, event_id)) AS chain
      |FROM events WHERE user_id < 150
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Manifest-log retention through the driver gate: the events slice
    * lands in TWELVE separate commits (deep version chain — 12 exercises
    * exactly the same floor/replay logic as more would, at ~60% of the
    * fixture cost), the async checkpointer drains, `gcManifests` retires
    * everything below the floor (which lands on a checkpoint-eligible
    * version whose sidecar was verified), and a FRESH engine instance —
    * no tip cache, must plan from the floor's checkpoint base — reads
    * the whole stream back. The per-key payload chain in engine order
    * must match the oracle's write-interleaving replay: GC is
    * metadata-only, so one lost row, scrambled chain or wrong base
    * breaks the hash.
    */
  private def gcRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-gcq")
    val g = new GraftStreams(s, work, checkpointInterval = 8)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir)
      .filter($"user_id" < 150)
      .orderBy($"event_id")
      .select(
        $"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"),
        $"event_id")
      // one scan+sort for all 12 commits instead of 12 (see
      // compactedRoundtrip — order-preserving, chain unchanged) (r15)
      .localCheckpoint()
    for (i <- 0 until 12)
      g.writeEvents("q", "ev", src.filter($"event_id" % 12 === i).drop("event_id"))
    g.catalog.flushCheckpoints()
    val retired = g.catalog.gcManifests("q", "ev", keepVersions = 2)
    require(retired.nonEmpty, "stream_gc_read: GC retired nothing — version chain too short")
    val g2 = new GraftStreams(s, work, checkpointInterval = 8) // cold: replans from the GC floor's base
    g2.readEvents("q", "ev")
      .select($"routingKey", $"offset",
        decode($"payload", "UTF-8").cast("long").as("pid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list(struct($"offset", $"pid"))),
          x => x.getField("pid").cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val gcReadSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id % 12, event_id)) AS chain
      |FROM events WHERE user_id < 150
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** POLICY-driven manifest-log retention through the driver gate (the
    * reference runs retention as periodic controller bucket jobs,
    * controller/.../server/bucket/PeriodicRetention.java:51 — here the
    * `manifestKeepVersions` StreamConfig knob applied by the maintenance
    * pass): phase A lands in 8 commits, a maintenance pass retires
    * history under the policy, phase B lands in 4 more, a SECOND pass
    * advances the floor again, and a fresh engine instance reads the
    * whole stream back through the floor's checkpoint base. The result
    * carries the per-key payload chain (hash-matched against the
    * oracle's write-interleaving replay) plus the observed floor
    * progression as constant columns — floor monotonicity and both
    * retire events are part of the hash.
    */
  private def maintenanceGc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-mgcq")
    val g = new GraftStreams(s, work, checkpointInterval = 4)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev",
      StreamConfig(initialSegments = 4, manifestKeepVersions = 4))
    val src = Tables.events(s, dir)
      .filter($"user_id" < 150)
      .orderBy($"event_id")
      .select(
        $"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"),
        $"event_id")
      // one scan+sort for all 12 commits instead of 12 (see
      // compactedRoundtrip — order-preserving, chain unchanged) (r15)
      .localCheckpoint()
    val maint = new graft.storage.Maintenance(g, compactMinFiles = 9999)
    for (i <- 0 until 8)
      g.writeEvents("q", "ev", src.filter($"event_id" % 12 === i).drop("event_id"))
    val r1 = maint.run("q", "ev")
    val floor1 = g.catalog.manifestFloor("q", "ev")
    for (i <- 8 until 12)
      g.writeEvents("q", "ev", src.filter($"event_id" % 12 === i).drop("event_id"))
    val r2 = maint.run("q", "ev")
    val floor2 = g.catalog.manifestFloor("q", "ev")
    require(r1.retiredManifests.nonEmpty && r2.retiredManifests.nonEmpty,
      s"ev_maintenance_gc: policy retired nothing (${r1.retiredManifests.size}/${r2.retiredManifests.size})")
    val g2 = new GraftStreams(s, work, checkpointInterval = 4) // cold read through the floor base
    g2.readEvents("q", "ev")
      .select($"routingKey", $"offset",
        decode($"payload", "UTF-8").cast("long").as("pid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list(struct($"offset", $"pid"))),
          x => x.getField("pid").cast("string")))).as("chain"))
      .withColumn("retired_twice",
        lit(if (r1.retiredManifests.nonEmpty && r2.retiredManifests.nonEmpty) 1L else 0L))
      .withColumn("floor_advanced", lit(if (floor2 > floor1 && floor1 > 0L) 1L else 0L))
      .orderBy($"routingKey")
  }

  private val maintenanceGcSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id % 12, event_id)) AS chain,
      |  CAST(1 AS BIGINT) AS retired_twice, CAST(1 AS BIGINT) AS floor_advanced
      |FROM events WHERE user_id < 150
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Auto-scale policy arithmetic through the driver gate
    * (AutoScaleProcessor.java:286-302 thresholds + the epoch/lineage
    * model): a 6-segment stream gets hand-injected EWMA rates covering
    * every decision branch — a 6× hot segment (2-min rule), a 2× warm
    * one (5-min rule), an adjacent cold pair (merge), a busy survivor
    * and a lone cold segment (no adjacent partner) — then one
    * `AutoScaler.evaluate` pass runs. The output is the new epoch's
    * open layout in key order: id epoch (0 = carried, 1 = replaced) and
    * parent count per slot. The oracle is the hand-derived layout —
    * constants, like `ev_next_cut`'s arithmetic check.
    */
  private def autoscalePolicy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-asq")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    val t0 = 1700000000000L
    g.catalog.createStream("q", "ev",
      StreamConfig(initialSegments = 6, targetRatePerSegment = 100L, minSegments = 2))
    g.catalog.update("q", "ev") { m =>
      val ids = m.openSegments.sortBy(_.keyLow).map(_.segmentId)
      m.copy(
        createdAt = t0,
        segments = m.segments.map(_.copy(createdAt = t0)),
        epochs = m.epochs.map(_.copy(createdAt = t0)),
        segmentRates = Map(
          ids(0) -> SegmentRates(twoMin = 600.0, fiveMin = 80.0, tenMin = 80.0, twentyMin = 80.0),
          ids(1) -> SegmentRates(twoMin = 80.0, fiveMin = 250.0, tenMin = 80.0, twentyMin = 80.0),
          ids(2) -> SegmentRates(twoMin = 40.0, fiveMin = 40.0, tenMin = 40.0, twentyMin = 30.0),
          ids(3) -> SegmentRates(twoMin = 40.0, fiveMin = 40.0, tenMin = 40.0, twentyMin = 30.0),
          ids(4) -> SegmentRates(twoMin = 120.0, fiveMin = 150.0, tenMin = 90.0, twentyMin = 90.0),
          ids(5) -> SegmentRates(twoMin = 40.0, fiveMin = 40.0, tenMin = 40.0, twentyMin = 30.0)))
    }
    val scaler = new graft.storage.AutoScaler(g)
    val now = t0 + 21 * 60 * 1000L
    val scaled = scaler.evaluate("q", "ev", now)
    require(scaled.isDefined, "the injected rates must trigger a scale")
    // cooldown: an immediate second pass must be a no-op
    require(scaler.evaluate("q", "ev", now + 1000L).isEmpty, "cooldown ignored")
    val meta = g.catalog.getStream("q", "ev")
    val rows = meta.openSegments.sortBy(_.keyLow).zipWithIndex.map { case (seg, i) =>
      (i.toLong, SegmentId.epoch(seg.segmentId).toLong, seg.parents.size.toLong)
    }
    s.createDataFrame(rows).toDF("pos", "id_epoch", "n_parents").orderBy($"pos")
  }

  // seg0 (6x hot) -> 6 children; seg1 (2.5x on the 5-min rule) -> 2;
  // seg2+seg3 (adjacent cold) -> 1 merged child with 2 parents;
  // seg4 busy -> carried; seg5 cold but partnerless -> carried
  private val autoscalePolicySql =
    """SELECT CAST(pos AS BIGINT) AS pos, CAST(id_epoch AS BIGINT) AS id_epoch,
      |  CAST(n_parents AS BIGINT) AS n_parents
      |FROM (VALUES
      |  (0, 1, 1), (1, 1, 1), (2, 1, 1), (3, 1, 1), (4, 1, 1), (5, 1, 1),
      |  (6, 1, 1), (7, 1, 1),
      |  (8, 1, 2),
      |  (9, 0, 0),
      |  (10, 0, 0)) AS v(pos, id_epoch, n_parents)
      |ORDER BY pos""".stripMargin

  /** Retention-policy arithmetic through the driver gate
    * (StreamMetadataTasks.java:968-1154 + PeriodicRetention.java:51):
    * one ordered single-segment stream (so positions are
    * oracle-replayable row ranks, like `ev_next_cut`), THREE competing
    * policies in one pass — a time cut at eventTime 3000, a size cap of
    * 1000 live rows, and a slowest-subscriber named `sub:` cut at 70% —
    * and the applied truncation must leave exactly the oracle's
    * surviving id range: head = min(max(timeCut, sizeCut), subscriber).
    */
  private def retentionPolicy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-rtq")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    val now0 = 10000000L
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 1,
      retentionMillis = now0 - 3000L, retentionMaxRows = 1000L))
    val src = Tables.events(s, dir).filter($"user_id" < 80)
      .orderBy($"event_id")
      .select($"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    val meta = g.catalog.getStream("q", "ev")
    val sid = meta.segments.head.segmentId
    val n = meta.tailCut.positions(sid)
    g.saveStreamCut("q", "ev", "sub:grp", Some(StreamCut(Map(sid -> n * 7L / 10L))))
    new graft.storage.Retention(g).apply("q", "ev", now0)
    g.readEvents("q", "ev")
      .select(decode($"payload", "UTF-8").cast("long").as("id"))
      .agg(count(lit(1)).as("n_live"), min($"id").as("min_id"), max($"id").as("max_id"))
  }

  private val retentionPolicySql =
    """WITH e AS (SELECT event_id FROM events WHERE user_id < 80),
      |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(COUNT(*) FILTER (WHERE event_id < 3000) AS BIGINT) AS tcut
      |      FROM e),
      |h AS (SELECT n, LEAST(GREATEST(tcut, GREATEST(n - 1000, 0)), (n * 7) // 10) AS head
      |      FROM c),
      |r AS (SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS pos FROM e)
      |SELECT CAST(n - head AS BIGINT) AS n_live,
      |  CAST(MIN(CASE WHEN pos >= head THEN event_id END) AS BIGINT) AS min_id,
      |  CAST(MAX(event_id) AS BIGINT) AS max_id
      |FROM r, h GROUP BY n, head""".stripMargin

  /** The SQL write surface end to end: stream DDL + INSERT INTO through
    * the DSv2 TableCatalog (GraftCatalog + GraftWriteBuilder), read back
    * as a SQL table scan. The catalog plugin is cached per session, so
    * the engine root is fixed per JVM and each invocation gets a fresh
    * scope (the bench re-runs this).
    */
  private lazy val sqlRoot: String =
    graft.util.WorkDirs.temp("graft-sqlw")

  private def sqlInsertRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.catalog.gsql", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gsql.rootDir", sqlRoot)
    val scope = "q" + java.util.UUID.randomUUID().toString.replace("-", "").substring(0, 8)
    s.sql(s"CREATE NAMESPACE gsql.$scope")
    s.sql(s"CREATE TABLE gsql.$scope.ev TBLPROPERTIES ('initialSegments' = '4')")
    Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"event_id")
      .createOrReplaceTempView("sql_rt_src")
    // two appends: positional, then BY NAME with the columns reordered —
    // the two DSv2 write-resolution shapes
    s.sql(s"INSERT INTO gsql.$scope.ev SELECT routingKey, eventTime, payload " +
      "FROM sql_rt_src WHERE event_id % 2 = 0")
    s.sql(s"INSERT INTO gsql.$scope.ev BY NAME SELECT eventTime, payload, routingKey " +
      "FROM sql_rt_src WHERE event_id % 2 = 1")
    s.sql(
      s"""SELECT decode(payload, 'UTF-8') AS event_type, count(*) AS n,
         |  count(DISTINCT routingKey) AS n_users,
         |  min(eventTime) AS min_time, max(eventTime) AS max_time
         |FROM gsql.$scope.ev GROUP BY 1 ORDER BY event_type""".stripMargin)
  }

  private val sqlInsertRoundtripSql =
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_users,
      |  epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS min_time,
      |  epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS max_time
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** StateSynchronizer contention replay (StateSynchronizer.java:44 /
    * RevisionedStreamClient.java:78): 4 threads race 80 conditional
    * updates through the CAS-revision loop — losers refetch and retry —
    * folding (count, sum) over the first 80 event ids. The oracle
    * recomputes the fold from the source table: a match proves every
    * update landed exactly once (revision count == update count) and the
    * fold is order-independent, i.e. optimistic concurrency lost nothing.
    * Compaction then drops all but the last revision without changing
    * the observable state.
    */
  private def stateSyncFold(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ssf")
    val ids = Tables.events(s, dir).orderBy($"event_id").limit(80)
      .select($"event_id".cast("long")).as[Long].collect()
    val sync = new graft.kv.StateSynchronizer(work, "fold",
      s.sessionState.newHadoopConf())
    def apply(v: Long): Unit = sync.updateState({ cur =>
      val (n, sum) = cur.map(_.split(':')).map(a => (a(0).toLong, a(1).toLong))
        .getOrElse((0L, 0L))
      s"${n + 1}:${sum + v}"
    }, maxRetries = 1000)
    val threads = (0 until 4).map { t =>
      new Thread(() => ids.slice(t * 20, (t + 1) * 20).foreach(apply))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    sync.compact(keep = 1)
    val (rev, state) = sync.fetch()
    val Array(n, sum) = state.get.split(':').map(_.toLong)
    s.createDataFrame(Seq((rev + 1, n, sum)))
      .toDF("n_revisions", "n_applied", "sum_ids")
  }

  private val stateSyncFoldSql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_revisions,
      |  CAST(COUNT(*) AS BIGINT) AS n_applied,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_ids
      |FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 80)""".stripMargin

  /** One Maintenance.run pass over a prepared stream, its Report
    * arithmetic oracle-replayed (PeriodicRetention.java:51 +
    * AutoScaleProcessor + the txn lease sweep in one idempotent call):
    * 5 single-segment files of 200 ordered rows, one expired transaction,
    * a 600-row size-retention cap. The pass must sweep exactly that txn,
    * truncate to head = 400 (tombstoning the two fully-covered files),
    * compact the 3 surviving files to 1, and emit a watermark — and the
    * surviving rows must be exactly ranks (400, 1000] of the source.
    */
  private def maintenancePass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-mnt")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev",
      StreamConfig(initialSegments = 1, retentionMaxRows = 600L))
    val ids = Tables.events(s, dir).orderBy($"event_id").limit(1000)
      .select($"event_id".cast("long")).as[Long].collect()
    val ev = Tables.events(s, dir)
      .select($"user_id".cast("string").as("routingKey"),
        $"event_id".cast("long").as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"))
    // 5 files of 200 offset-ordered rows (one file per write on the
    // single segment), so the retention cut lands on a file boundary
    (0 until 5).foreach { k =>
      g.writeEvents("q", "ev", ev
        .filter($"eventTime".between(ids(k * 200), ids(k * 200 + 199)))
        .orderBy($"eventTime"))
    }
    // an open txn whose lease has expired by the time the pass runs
    val txn = g.beginTxn("q", "ev", leaseMillis = 250L)
    g.writeToTxn("q", "ev", txn, ev.filter($"eventTime" === ids(0)))
    g.noteTime("q", "ev", "w0", ids.last)
    // the staging job above already consumed most of the 250 ms lease;
    // the short sleep guarantees expiry without padding the benchmark
    Thread.sleep(300L)
    val rep = new graft.storage.Maintenance(g, compactMinFiles = 2).run("q", "ev")
    g.readEvents("q", "ev")
      .select(decode($"payload", "UTF-8").cast("long").as("id"))
      .agg(count(lit(1)).as("n_live"), min($"id").as("min_id"), max($"id").as("max_id"))
      .select(lit(rep.sweptTxns.size.toLong).as("swept_txns"),
        lit(if (rep.truncated) 1L else 0L).as("truncated"),
        $"n_live", $"min_id", $"max_id",
        lit(rep.filesBefore.toLong).as("files_before"),
        lit(rep.filesAfter.toLong).as("files_after"),
        lit(if (rep.watermarkEmitted) 1L else 0L).as("wm"))
  }

  private val maintenancePassSql =
    """WITH e AS (
      |  SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) AS rn
      |  FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 1000))
      |SELECT CAST(1 AS BIGINT) AS swept_txns, CAST(1 AS BIGINT) AS truncated,
      |  CAST(COUNT(*) FILTER (WHERE rn > 400) AS BIGINT) AS n_live,
      |  CAST(MIN(CASE WHEN rn > 400 THEN event_id END) AS BIGINT) AS min_id,
      |  CAST(MAX(event_id) AS BIGINT) AS max_id,
      |  CAST(3 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after,
      |  CAST(1 AS BIGINT) AS wm
      |FROM e""".stripMargin

  /** Checkpoint → resume through the driver gate: batch 1 (even user_id)
    * is written, `saveStreamCut` snapshots the tail (the
    * initiateCheckpoint surface, ReaderGroup.java:84), batch 2 (odd
    * user_id) lands after it, and the read resumes FROM the named cut —
    * the resetReaderGroup(fromStreamCuts) surface. A hash match on the
    * aggregate of what comes back proves the checkpoint splits the stream
    * exactly: no batch-1 replay, no batch-2 loss, per segment.
    */
  private def checkpointResume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ckp")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 6))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"user_id".cast("long").as("uid"))
    g.writeEvents("q", "ev", src.filter($"uid" % 2 === 0).drop("uid"))
    val ckpt = g.saveStreamCut("q", "ev", "ckpt")
    g.writeEvents("q", "ev", src.filter($"uid" % 2 === 1).drop("uid"))
    g.readEvents("q", "ev", from = g.getStreamCut("q", "ev", "ckpt").getOrElse(ckpt))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(decode($"payload", "UTF-8")).as("n_types"),
           min($"eventTime").as("first_time"),
           max($"eventTime").as("last_time"))
      .orderBy($"routingKey")
  }

  private val checkpointResumeSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_time,
      |  epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_time
      |FROM events WHERE user_id % 2 = 1
      |GROUP BY 1 ORDER BY routingKey""".stripMargin

  /** getSuccessors lineage through the driver gate (Controller.java:412
    * getSuccessors; ScaleOperationTask.java:65-173 assigns parents by
    * key-range overlap): a stream scales 4→7 (every child has 1-2
    * parents) then 7→3 (every child MERGES multiple parents), and every
    * pre-scale segment's successor set is read back through the public
    * lineage API. Segments tile [0,1) evenly at each epoch, so the
    * expected edge set is closed-form: parent i of n and child j of m
    * are linked iff their key intervals strictly overlap — which the
    * oracle computes from scratch with two interval-overlap joins.
    * Bounded driver loop by design: lineage is control-plane metadata,
    * one row per segment (11 parents here), same bound class as
    * segmentsAtTime.
    */
  private def successorLineage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-lin")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    g.scaleStream("q", "ev", 7)
    g.scaleStream("q", "ev", 3)
    val meta = g.catalog.getStream("q", "ev")
    val edges = meta.segments.map(_.segmentId).filter(id => SegmentId.epoch(id) < 2)
      .flatMap { pid =>
        g.successors("q", "ev", pid).map { cid =>
          (SegmentId.epoch(pid).toLong, SegmentId.number(pid).toLong,
            SegmentId.epoch(cid).toLong, SegmentId.number(cid).toLong)
        }
      }
    edges.toDF("parent_epoch", "parent_num", "child_epoch", "child_num")
      .orderBy($"parent_epoch", $"parent_num", $"child_num")
  }

  private val successorLineageSql =
    """WITH e01 AS (
      |  SELECT CAST(0 AS BIGINT) AS parent_epoch, CAST(p.i AS BIGINT) AS parent_num,
      |         CAST(1 AS BIGINT) AS child_epoch, CAST(c.j AS BIGINT) AS child_num
      |  FROM range(0, 4) p(i), range(0, 7) c(j)
      |  WHERE p.i / 4.0 < (c.j + 1) / 7.0 AND c.j / 7.0 < (p.i + 1) / 4.0),
      |e12 AS (
      |  SELECT CAST(1 AS BIGINT), CAST(p.i AS BIGINT),
      |         CAST(2 AS BIGINT), CAST(c.j AS BIGINT)
      |  FROM range(0, 7) p(i), range(0, 3) c(j)
      |  WHERE p.i / 7.0 < (c.j + 1) / 3.0 AND c.j / 3.0 < (p.i + 1) / 7.0)
      |SELECT * FROM (SELECT * FROM e01 UNION ALL SELECT * FROM e12)
      |ORDER BY parent_epoch, parent_num, child_num""".stripMargin

  /** Truncation on the DATA path (Controller.java:237 truncateStream +
    * head-cut enforcement): a single-segment stream is loaded in
    * event_id order, truncated at the 1000-row cut, and read back — the
    * surviving suffix (count, bounds, and the exact payload chain in
    * offset order) must equal the source rows ranked past the cut. Files
    * wholly below the head cut leave the manifest (the scan never opens
    * them); the partially-covered boundary file is trimmed by the
    * head-cut offset predicate. Single segment so the row-rank
    * arithmetic is oracle-replayable, exactly like ev_next_cut.
    */
  private def truncateRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-trn")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 1))
    val src = Tables.events(s, dir).filter($"user_id" < 50)
      .orderBy($"event_id")
      .select($"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    val cut = g.nextStreamCut("q", "ev",
      g.catalog.getStream("q", "ev").headStreamCut, approxRows = 1000L)
    g.catalog.truncateStream("q", "ev", cut)
    g.readEvents("q", "ev")
      .select($"offset", decode($"payload", "UTF-8").cast("long").as("eid"))
      .agg(count(lit(1)).as("n"),
        min($"eid").as("first_eid"), max($"eid").as("last_eid"),
        md5(concat_ws(",", transform(array_sort(collect_list(struct($"offset", $"eid"))),
          x => x.getField("eid").cast("string")))).as("chain"))
  }

  private val truncateReadSql =
    """WITH e AS (
      |  SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn,
      |         COUNT(*) OVER () AS cnt
      |  FROM events WHERE user_id < 50)
      |SELECT COUNT(*) AS n, MIN(event_id) AS first_eid, MAX(event_id) AS last_eid,
      |  md5(COALESCE(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id), ''))
      |    AS chain
      |FROM e WHERE rn > LEAST(cnt, 1000)""".stripMargin

  /** Stream-stream inner join through the engine's streaming source
    * (the two-reader-group join a Pravega app composes by hand; in this
    * engine it's Structured Streaming's symmetric hash join over two
    * graft streams): signups → stream a, purchases → stream b, one
    * streaming query joins them on user within a 1-hour event-time
    * bound and drains under Trigger.AvailableNow in paced pages. Both
    * sides carry real watermarks (400-day delay ≫ the 30-day corpus, so
    * nothing is evicted before its partner arrives and the drained
    * result equals the batch join, page-order-independent). The oracle
    * replays the join relationally; the md5 pair-chain per user proves
    * every pair was emitted exactly once across micro-batches.
    *
    * Scale: the join state is keyed by user and bounded by the
    * watermark horizon; each side shuffles once on the equality key —
    * the same plan a 1000-executor cluster runs, with state eviction
    * driven by the per-trigger global watermark.
    */
  private def streamJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ssj")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "a", StreamConfig(initialSegments = 2))
    g.catalog.createStream("q", "b", StreamConfig(initialSegments = 2))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload"),
      $"event_type")
    g.writeEvents("q", "a", src.filter($"event_type" === "signup").drop("event_type"))
    g.writeEvents("q", "b", src.filter($"event_type" === "purchase").drop("event_type"))
    // exactly 2 triggers: enough that pairs straddle micro-batches
    // (cross-batch state is the thing under test) without paying the
    // per-trigger stateful-join overhead more pages would cost at bench
    // scale — page-size paging itself is ev_multistream's job. The pace
    // is ceil(max(|a|,|b|)/2): r15 sized it from side a alone with floor
    // division, so the larger side took 3-4 micro-batches
    val pace = math.max(
      twoTriggerPace(g.unreadBySegment("q", "a", StreamCut(Map.empty))),
      twoTriggerPace(g.unreadBySegment("q", "b", StreamCut(Map.empty))))
    // the stateful join keeps one state store per shuffle partition per
    // side per trigger — at bench scale that fixed cost dwarfs the join
    // itself, so the streaming query runs in a cloned session with fewer
    // partitions (state sizing is a deployment knob, not a semantic)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    // the trailing no-data micro-batch only advances the watermark and
    // evicts join state — an INNER stream-stream join emits rows during
    // data batches only, so that batch cannot change output; skipping it
    // saves one full stateful trigger (plan + WAL + per-partition store
    // commits on both sides). ev_stream_join_late keeps the default: its
    // watermark/eviction script is the semantics under test.
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    def side(st: String, u: String, e: String, t: String) =
      s2.readStream.format("graft-stream")
        .option("rootDir", work).option("scope", "q").option("stream", st)
        .option("maxRowsPerTrigger", pace.toString)
        .load()
        .select($"routingKey".as(u),
          decode($"payload", "UTF-8").cast("long").as(e),
          timestamp_millis($"eventTime").as(t))
        .withWatermark(t, "400 days")
    val joined = side("a", "ua", "ea", "ta").join(side("b", "ub", "eb", "tb"),
      expr("ua = ub AND tb >= ta AND tb <= ta + interval 1 hour"))
    val sink = s"ssj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"ua".cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        md5(concat_ws(",", array_sort(collect_list(
          format_string("%08d:%08d", $"ea", $"eb"))))).as("chain"))
      .orderBy($"user_id")
  }

  private val streamJoinSql =
    """WITH a AS (
      |  SELECT user_id, event_id AS ea, epoch_ms(CAST(ts AS TIMESTAMP)) AS ta
      |  FROM events WHERE event_type = 'signup'),
      |b AS (
      |  SELECT user_id, event_id AS eb, epoch_ms(CAST(ts AS TIMESTAMP)) AS tb
      |  FROM events WHERE event_type = 'purchase'),
      |p AS (
      |  SELECT a.user_id, ea, eb FROM a JOIN b
      |  ON a.user_id = b.user_id AND tb >= ta AND tb <= ta + 3600000)
      |SELECT user_id, COUNT(*) AS n_pairs,
      |  md5(string_agg(format('{:08d}', ea) || ':' || format('{:08d}', eb),
      |    ',' ORDER BY ea, eb)) AS chain
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Join-STATE EVICTION through the real streaming source — the branch
    * `ev_stream_join`'s 400-day horizon deliberately never exercises
    * (PeriodicWatermarking.java:254 is the reference's analogous
    * watermark-driven state cutoff). Same symmetric hash join, but with a
    * 1-DAY watermark delay and deterministically-LATE input: purchases
    * from the corpus's first 9 days are written to stream b AFTER the
    * on-time suffix, and side b's `maxRowsPerTrigger` equals the on-time
    * row count, so trigger 1 consumes exactly the on-time purchases (plus
    * every signup) and drives the global watermark to ~(corpus end - 1
    * day). One filler trigger of join-less rows then lets that watermark
    * TAKE EFFECT — Spark's stateful operators filter late input with the
    * PREVIOUS batch's watermark and evict state only at batch end
    * (SPARK-40925's late-events/eviction split), so a late row landing in
    * the very next batch after the watermark jump would still join
    * not-yet-evicted state. Trigger 3 then delivers the early-window
    * purchases — all far below the now-effective watermark — and the
    * engine must DROP them: their signup partners' join state was evicted
    * at the end of trigger 2, and the late-input filter rejects them
    * outright. The oracle's expected set EXCLUDES those pairs, so if
    * eviction fails and the late pairs are emitted, the per-user chain
    * hashes break. A spec asserts the excluded set is nonempty (the row
    * is not vacuously equal to the full join).
    *
    * Scale: identical plan shape to ev_stream_join — one shuffle per
    * side on the equality key, state bounded by the (now short)
    * watermark horizon, which is exactly the property that keeps the
    * state store finite on an unbounded 100 TB stream.
    */
  private def streamJoinLate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ssjl")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "a", StreamConfig(initialSegments = 1))
    g.catalog.createStream("q", "b", StreamConfig(initialSegments = 1))
    val ev = Tables.events(s, dir)
    // one bounds scan instead of two (min and max ride one aggregate;
    // maxMs is consumed below for the filler rows)
    val bounds = ev.agg(min(unix_millis($"ts".cast("timestamp"))),
      max(unix_millis($"ts".cast("timestamp")))).head()
    val (minMs, maxMs) = (bounds.getLong(0), bounds.getLong(1))
    val lateBelowMs = minMs + 9L * 86400000L // first 9 days arrive late
    val src = ev.select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload"),
      $"event_type")
    g.writeEvents("q", "a", src.filter($"event_type" === "signup").drop("event_type"))
    // arrival order ≠ event-time order: the on-time suffix first, then the
    // early-window purchases redelivered late (second write), so trigger 2
    // carries only rows far below the post-trigger-1 watermark
    val purchases = src.filter($"event_type" === "purchase").drop("event_type")
    g.writeEvents("q", "b", purchases.filter($"eventTime" >= lateBelowMs))
    val onTimeRows = g.unreadRows("q", "b", StreamCut(Map.empty))
    // one full trigger of join-less filler (key "f" matches no signup,
    // event time at the corpus max so the watermark holds) — row count
    // EXACTLY one trigger budget, so the late group lands in trigger 3,
    // after the trigger-1 watermark has become the late-input filter
    g.writeEvents("q", "b", s.range(onTimeRows).select(
      lit("f").as("routingKey"), lit(maxMs).as("eventTime"),
      encode(lit("-1"), "UTF-8").as("payload")))
    g.writeEvents("q", "b", purchases.filter($"eventTime" < lateBelowMs))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    def side(st: String, u: String, e: String, t: String, pace: Option[Long]) = {
      val r = s2.readStream.format("graft-stream")
        .option("rootDir", work).option("scope", "q").option("stream", st)
      pace.foreach(p => r.option("maxRowsPerTrigger", p.toString))
      r.load()
        .select($"routingKey".as(u),
          decode($"payload", "UTF-8").cast("long").as(e),
          timestamp_millis($"eventTime").as(t))
        .withWatermark(t, "1 day")
    }
    val joined = side("a", "ua", "ea", "ta", None)
      .join(side("b", "ub", "eb", "tb", Some(onTimeRows)),
        expr("ua = ub AND tb >= ta AND tb <= ta + interval 1 hour"))
    val sink = s"ssjl_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"ua".cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        md5(concat_ws(",", array_sort(collect_list(
          format_string("%08d:%08d", $"ea", $"eb"))))).as("chain"))
      .orderBy($"user_id")
  }

  private val streamJoinLateSql =
    """WITH cut AS (
      |  SELECT epoch_ms(min(CAST(ts AS TIMESTAMP))) + 777600000 AS c FROM events),
      |a AS (
      |  SELECT user_id, event_id AS ea, epoch_ms(CAST(ts AS TIMESTAMP)) AS ta
      |  FROM events WHERE event_type = 'signup'),
      |b AS (
      |  SELECT user_id, event_id AS eb, epoch_ms(CAST(ts AS TIMESTAMP)) AS tb
      |  FROM events, cut WHERE event_type = 'purchase'
      |    AND epoch_ms(CAST(ts AS TIMESTAMP)) >= c),
      |p AS (
      |  SELECT a.user_id, ea, eb FROM a JOIN b
      |  ON a.user_id = b.user_id AND tb >= ta AND tb <= ta + 3600000)
      |SELECT user_id, COUNT(*) AS n_pairs,
      |  md5(string_agg(format('{:08d}', ea) || ':' || format('{:08d}', eb),
      |    ',' ORDER BY ea, eb)) AS chain
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin


  /** Full streaming data plane, read AND write: a paced streaming query
    * reads stream `src` through the DSv2 source, filters mid-pipe, and
    * lands the survivors in stream `dst` through the STREAMING_WRITE
    * sink (exactly-once epoch dedup, staged-dir commit) — the
    * stream-to-stream ETL every Pravega deployment runs as a separate
    * app. The dst read-back's per-key id chains vs the relational
    * oracle prove no event was lost, duplicated, or corrupted crossing
    * BOTH engine surfaces; exactly-once across micro-batch commits is
    * the property under test (order preservation on the direct write
    * path is stream_order_chain's job).
    *
    * Scale: each micro-batch is one route-shuffle + parquet write +
    * manifest CAS on the sink side — the same bounded plan per trigger
    * at any corpus size, with admission control pacing the read.
    */
  private def pipeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-pipe")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "src", StreamConfig(initialSegments = 2))
    g.catalog.createStream("q", "dst", StreamConfig(initialSegments = 2))
    g.writeEvents("q", "src", Tables.events(s, dir).filter($"user_id" < 150).select(
      $"user_id".cast("string").as("routingKey"),
      $"event_id".as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload")))
    val pace = twoTriggerPace(g.unreadBySegment("q", "src", StreamCut(Map.empty)))
    val ckpt = graft.util.WorkDirs.temp("graft-pipeck")
    val q = s.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "src")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .filter($"eventTime" % 3 =!= 0)
      .select($"routingKey", $"eventTime", $"payload")
      .writeStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "dst")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    g.readEvents("q", "dst")
      .select($"routingKey", decode($"payload", "UTF-8").cast("long").as("eid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list($"eid")),
          x => x.cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val pipeRoundtripSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id < 150 AND event_id % 3 <> 0
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Crash-resume across the REAL streaming sink: the same src→filter→dst
    * pipe as stream_pipe_roundtrip, but the query is STOPPED after its
    * first committed micro-batch and a second query restarts from the
    * same checkpoint to drain the rest. The stop can land mid-epoch —
    * killing the sink between its staging write and the manifest CAS —
    * so the restart exercises offset replay (the checkpointed composite
    * cut), epoch-id dedup on the sink (a replayed epoch that DID commit
    * must be a no-op; one that didn't must land exactly once), and
    * crashed-epoch staging cleanup. The dst read-back's per-key id
    * chains against the relational oracle prove exactly-once ACROSS the
    * restart — the ReaderGroup-checkpoint recovery contract
    * (ReaderGroup.java:171 initiateCheckpoint / resetReaderGroup) carried
    * through the write path too.
    *
    * Scale: restart cost is one checkpoint read + the normal per-trigger
    * plan; recovery work is O(one epoch), never O(history).
    */
  private def pipeResume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-piper")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "src", StreamConfig(initialSegments = 2))
    g.catalog.createStream("q", "dst", StreamConfig(initialSegments = 2))
    g.writeEvents("q", "src",
      Tables.events(s, dir).filter($"user_id" % 2 === 1).select(
        $"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode($"event_id".cast("string"), "UTF-8").as("payload")))
    // ≥4 paced triggers, so the first-stop always leaves work to resume
    val pace = math.max(400L, g.unreadRows("q", "src", StreamCut(Map.empty)) / 4L)
    val ckpt = graft.util.WorkDirs.temp("graft-piperck")
    def launch() = s.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "src")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .filter($"eventTime" % 3 =!= 0)
      .select($"routingKey", $"eventTime", $"payload")
      .writeStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "dst")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val q1 = launch()
    val deadline = System.currentTimeMillis() + 120000L
    while (q1.recentProgress.isEmpty && q1.isActive &&
           System.currentTimeMillis() < deadline) Thread.sleep(25L)
    q1.stop()
    try q1.awaitTermination() catch { case _: Exception => () } // stop mid-batch is the point
    val q2 = launch()
    q2.awaitTermination()
    g.readEvents("q", "dst")
      .select($"routingKey", decode($"payload", "UTF-8").cast("long").as("eid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list($"eid")),
          x => x.cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val pipeResumeSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id % 2 = 1 AND event_id % 3 <> 0
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** TWO writers appending concurrently to one stream — the multi-writer
    * contract (every Pravega stream is multi-writer by default; ordered
    * appends serialize through the segment store, here through manifest
    * CAS + [[GraftStreams.writeEventsWithRetry]]). Both threads write
    * through the full path at once; when they race, the loser's
    * tails-moved CAS failure drops its staged files and the retry
    * re-assigns offsets against fresh tails. The read-back
    * per-key id chains (sorted — interleaving order between writers is
    * intentionally unspecified, content exactness is the contract) must
    * equal the oracle's: nothing lost to a lost-update race, nothing
    * duplicated by a retry.
    *
    * Scale: writers contend only on the manifest pointer (one tiny CAS
    * per batch), never on data files — the same property that lets
    * thousands of producers share a stream in the reference.
    */
  private def concurrentWriters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ccw")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).filter($"user_id" < 180).select(
      $"user_id".cast("string").as("routingKey"),
      $"event_id".as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload"),
      $"event_id")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { w =>
      new Thread(() =>
        try g.writeEventsWithRetry("q", "ev",
          src.filter($"event_id" % 2 === w).drop("event_id"))
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (!errs.isEmpty) throw new IllegalStateException(
      s"concurrent writer failed: ${errs.peek()}", errs.peek())
    g.readEvents("q", "ev")
      .select($"routingKey", decode($"payload", "UTF-8").cast("long").as("eid"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list($"eid")),
          x => x.cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val concurrentWritersSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id < 180
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Seal semantics through the driver gate (StreamManager.sealStream,
    * controller SealStreamTask): after seal, appends are REJECTED with
    * the stream-sealed error and every already-written event remains
    * readable — the immutable-historical-stream contract batch jobs
    * depend on. The rejected-write probe rides the output as a flag so
    * the oracle checks both halves in one row set.
    */
  private def sealRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-seal")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 3))
    val src = Tables.events(s, dir).filter($"user_id" < 120).select(
      $"user_id".cast("string").as("routingKey"),
      $"event_id".as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    g.catalog.sealStream("q", "ev")
    val rejected =
      try { g.writeEvents("q", "ev", src.limit(10)); 0L }
      catch { case _: graft.core.StreamSealedException => 1L }
    g.readEvents("q", "ev")
      .select(decode($"payload", "UTF-8").cast("long").as("eid"))
      .agg(count(lit(1)).as("n"), min($"eid").as("min_id"), max($"eid").as("max_id"))
      .select(lit(rejected).as("write_rejected"), $"n", $"min_id", $"max_id")
  }

  private val sealReadSql =
    """SELECT CAST(1 AS BIGINT) AS write_rejected, COUNT(*) AS n,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM events WHERE user_id < 120""".stripMargin

  /** Watermark-driven window CLOSING through the real streaming source:
    * a paced streaming query aggregates 1-day event-time windows in
    * APPEND mode — a window emits exactly when the watermark passes its
    * end (PeriodicWatermarking.java:254's "readers may safely close up
    * to here" contract, realized by Spark's no-data batch after the
    * final page). The 2-day delay makes the emitted set deterministic
    * under paced reads: hash-uniform segments advance in near-lockstep,
    * so cross-trigger arrival skew is hours at most — far inside the
    * delay — and the final emitted set is exactly the windows whose end
    * ≤ max event time − 2 days. The oracle replays that exclusion
    * relationally — a match proves append-mode emission, watermark
    * advancement across micro-batches, late-row retention within the
    * delay, and the no-data flush batch all behave exactly to spec.
    *
    * Scale: one keyed streaming aggregation — state is (window × type),
    * bounded by the value domain, evicted as the watermark passes.
    */
  private def streamWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-swin")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 2))
    g.writeEvents("q", "ev", Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload")))
    val pace = twoTriggerPace(g.unreadBySegment("q", "ev", StreamCut(Map.empty)))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"swin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select(timestamp_millis($"eventTime").as("ts"),
        decode($"payload", "UTF-8").as("event_type"))
      .withWatermark("ts", "2 days")
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("day"), $"event_type", $"n")
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .select(date_format($"day", "yyyy-MM-dd").as("day"), $"event_type", $"n")
      .orderBy($"day", $"event_type")
  }

  private val streamWindowSql =
    """WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events)
      |SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |  event_type, COUNT(*) AS n
      |FROM events, mx
      |WHERE date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY <= m - INTERVAL 2 DAY
      |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** Consumer-side exactly-once under REDELIVERY: the same batch is
    * written twice (an at-least-once producer retrying a whole delivery
    * — EventStreamWriter's retry-on-connection-loss failure mode), and
    * the streaming consumer deduplicates by event id with
    * `dropDuplicatesWithinWatermark`. The delay is sized past the whole
    * redelivery horizon (35 days > the 30-day corpus), so no dedup
    * state expires mid-drain and the result is exactly the distinct
    * event set — which is what the oracle computes from the source
    * table. In production the delay bounds state by the real
    * redelivery window (seconds-to-minutes), same plan.
    */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-sdd")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 2))
    val src = Tables.events(s, dir).filter($"user_id" < 150).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    g.writeEvents("q", "ev", src) // the duplicate delivery
    val pace = twoTriggerPace(g.unreadBySegment("q", "ev", StreamCut(Map.empty)))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    // output-neutral trailing no-data batch skipped:
    // dropDuplicatesWithinWatermark emits each first-seen row in the data
    // batch it arrives; the 35-day delay exceeds the corpus horizon, so
    // the final watermark-advance batch is eviction-only
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val sink = s"sdd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey",
        timestamp_millis($"eventTime").as("ts"),
        decode($"payload", "UTF-8").cast("long").as("eid"))
      .withWatermark("ts", "35 days")
      .dropDuplicatesWithinWatermark("eid")
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list($"eid")),
          x => x.cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val streamDedupSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id < 150
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Right-to-be-forgotten through the driver gate: events land in the
    * engine stream, user 7's payloads are REDACTED
    * ([[GraftStreams.redactStream]] — rewrite-with-redaction, the only
    * deletion discipline an offset-addressed immutable log admits), and
    * the read-back proves the three contract halves at once: redacted
    * rows still EXIST with their offsets/counts (chains and StreamCuts
    * stay valid), their payload bytes are GONE (empty), and every other
    * key's payload chain is byte-identical to the source. The oracle
    * recomputes all three from the events table directly.
    */
  private def redactedRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-rgt")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 2))
    g.writeEvents("q", "ev", Tables.events(s, dir).filter($"user_id" < 150).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload")))
    val nRedacted = g.redactStream("q", "ev", "7")
    require(nRedacted > 0L, "redaction should match user 7's rows")
    g.readEvents("q", "ev")
      .select($"routingKey", decode($"payload", "UTF-8").as("pl"))
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(length($"pl") === 0, 1L).otherwise(0L)).as("n_redacted"),
        md5(concat_ws(",", array_sort(collect_list(
          when(length($"pl") > 0, $"pl"))))).as("chain"))
      .orderBy($"routingKey")
  }

  private val redactedReadSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(CASE WHEN user_id = 7 THEN COUNT(*) ELSE 0 END AS BIGINT) AS n_redacted,
      |  md5(COALESCE(string_agg(CASE WHEN user_id <> 7
      |        THEN CAST(event_id AS VARCHAR) END, ','
      |        ORDER BY CAST(event_id AS VARCHAR)), '')) AS chain
      |FROM events WHERE user_id < 150
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** STREAMING data-quality gate via Spark's `observe()` API — the
    * production mechanism for in-flight constraint metrics (observed
    * metrics ride each micro-batch's QueryProgress; dashboards and
    * circuit-breakers read them without a second pass over the data).
    * Events flow through the engine stream; the streaming query carries
    * two violation counters and a row counter as observed metrics; the
    * per-batch readings are summed off `recentProgress` after the
    * AvailableNow drain. Only batch-boundary-INVARIANT totals are
    * emitted (sums commute with any trigger pacing), which is what
    * makes the row oracle-hashable.
    *
    * Scale: observe() is a zero-shuffle agg folded into each batch's
    * existing plan — the metrics cost nothing beyond the scan the batch
    * already does; progress objects are O(metrics), not O(rows).
    */
  private def streamDq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-sdq")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 2))
    g.writeEvents("q", "ev", Tables.events(s, dir).filter($"user_id" < 150).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode(concat($"event_type", lit(":"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").cast("string")), "UTF-8")
        .as("payload")))
    val pace = twoTriggerPace(g.unreadBySegment("q", "ev", StreamCut(Map.empty)))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"sdq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select(split(decode($"payload", "UTF-8"), ":").as("p"))
      .select($"p".getItem(0).as("etype"), $"p".getItem(1).cast("long").as("cents"))
      .observe("dq",
        sum(when($"cents" > 40000L, 1L).otherwise(0L)).as("v_value_le_400"),
        sum(when($"etype" === "error", 1L).otherwise(0L)).as("v_no_error"),
        count(lit(1)).as("n_rows"))
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val totals = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("dq")))
      .map { r =>
        // an empty final batch reports null sums — count it as zero
        def l(f: String) = { val i = r.fieldIndex(f); if (r.isNullAt(i)) 0L else r.getLong(i) }
        (l("v_value_le_400"), l("v_no_error"), l("n_rows"))
      }
    require(totals.nonEmpty, "no observed metrics surfaced in query progress")
    // the memory sink registers a global temp table in the child session;
    // drop it so repeated runs in a long-lived driver don't accumulate
    // batch rows (the child session itself shares the SparkContext, so it
    // must NOT be stop()ped — it is plain garbage once unreferenced)
    s2.catalog.dropTempView(sink)
    val (v1, v2, n) = totals.foldLeft((0L, 0L, 0L)) {
      case ((a, b, c), (x, y, z)) => (a + x, b + y, c + z)
    }
    Seq(("no_error_events", v2, n), ("value_le_400", v1, n))
      .toDF("check_name", "n_violations", "n_rows")
      .withColumn("pass", $"n_violations" === 0L)
      .orderBy($"check_name")
  }

  private val streamDqSql =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE user_id < 150),
      |r AS (
      |  SELECT 'no_error_events' AS check_name,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM e
      |  UNION ALL
      |  SELECT 'value_le_400',
      |    CAST(SUM(CASE WHEN cents > 40000 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM e)
      |SELECT check_name, n_violations, n_rows, n_violations = 0 AS pass
      |FROM r ORDER BY check_name""".stripMargin

  /** Per-key batch input to the writer-sequence state machine. */
  case class SeqIn(routingKey: String, offset: Long, seq: Long, eid: Long)
  /** One long per key — the writer's last accepted event number
    * (Attributes.java event-number attribute; bounded state). */
  case class SeqState(lastSeq: Long)
  /** One row per delivered event: accepted (first occurrence of its
    * sequence number) or rejected as a duplicate redelivery. */
  case class SeqOut(routingKey: String, eid: Long, accepted: Int, gap: Long)

  /** Writer-sequence exactly-once via CUSTOM keyed state
    * (flatMapGroupsWithState): the producer stamps each event with a
    * per-key monotone sequence number (the reference's per-writer event
    * number, AppendProcessor.java:179-387), the whole delivery is
    * retried (at-least-once), and the consumer's state machine — one
    * long of state per key, exactly the server's writer attribute —
    * accepts each sequence number once and rejects regressions. Every
    * delivered event is emitted with its verdict, so the oracle checks
    * three invariants at once: accepted set = distinct source events
    * (exactly-once), rejected count = the full duplicate delivery
    * (duplicates were SEEN and dropped, not merely absent), and zero
    * sequence gaps (per-key order survived routing, pacing and the
    * epoch-major read rule). `ev_stream_dedup` proves the same contract
    * with Spark's built-in dropDuplicatesWithinWatermark; this row
    * proves the CUSTOM-state path a user takes when the dedup key is a
    * protocol-level sequence, not a column equality.
    *
    * Scale: state is one long per routing key, independent of history
    * length (vs. dropDuplicates' id-set within the watermark); per-key
    * per-trigger buffering is bounded by the source's pacing option.
    */
  private def streamStateDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val work = graft.util.WorkDirs.temp("graft-ssd2")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id")
    val src = Tables.events(s, dir).filter($"user_id" < 150)
      .select($"user_id", $"event_id", row_number().over(win).cast("long").as("seq"))
      .orderBy($"event_id") // per-key write order = increasing seq
      .select($"user_id".cast("string").as("routingKey"),
        $"event_id".as("eventTime"),
        encode(concat_ws(":", $"seq", $"event_id"), "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    g.writeEvents("q", "ev", src) // the retried whole delivery
    val pace = twoTriggerPace(g.unreadBySegment("q", "ev", StreamCut(Map.empty)))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"ssd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val fn = (key: String, it: Iterator[SeqIn], st: GroupState[SeqState]) => {
      // offset order within the trigger; triggers advance in offset
      // order per key, so the scan order is the engine read order
      val rows = it.toArray.sortBy(_.offset)
      var last = st.getOption.map(_.lastSeq).getOrElse(0L)
      val out = rows.map { r =>
        if (r.seq > last) {
          val gap = r.seq - last - 1; last = r.seq; SeqOut(key, r.eid, 1, gap)
        } else SeqOut(key, r.eid, 0, 0L)
      }
      st.update(SeqState(last))
      out.iterator
    }
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey", $"offset",
        split(decode($"payload", "UTF-8"), ":").getItem(0).cast("long").as("seq"),
        split(decode($"payload", "UTF-8"), ":").getItem(1).cast("long").as("eid"))
      .as[SeqIn]
      .groupByKey(_.routingKey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
      .toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"routingKey")
      .agg(sum(when($"accepted" === 1, 1L).otherwise(0L)).as("n_acc"),
        sum(when($"accepted" === 0, 1L).otherwise(0L)).as("n_dup"),
        sum($"gap").as("gap_total"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when($"accepted" === 1, $"eid"))),
          x => x.cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val streamStateDedupSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey,
      |  COUNT(*) AS n_acc, COUNT(*) AS n_dup, CAST(0 AS BIGINT) AS gap_total,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id < 150
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Holds rows delivered by the real-time foreach sink, keyed per
    * invocation. Driver-side by nature — the collector IS the test
    * consumer, like `state_sync_fold`'s CAS driver; bounded to the
    * `user_id < 60` slice.
    */
  object RtBuf {
    val sinks: scala.collection.concurrent.TrieMap[
      String, java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]] =
      scala.collection.concurrent.TrieMap.empty
  }

  /** Rows → static buffer; ForeachWriterTable is real-time-allowlisted. */
  final class RtCollect(id: String)
      extends org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(r: org.apache.spark.sql.Row): Unit =
      RtBuf.sinks(id).add((r.getAs[String]("routingKey"),
        new String(r.getAs[Array[Byte]]("payload"),
          java.nio.charset.StandardCharsets.UTF_8).toLong))
    override def close(errorOrNull: Throwable): Unit = ()
  }

  /** Tail reads through Spark 4 REAL-TIME mode, hash-checked: half the
    * slice is backlog (written before the query starts), half is a TAIL
    * APPEND landing mid-trigger — delivered by the long-poll readers
    * (`GraftTailReader`, the FutureReadResultEntry analog) with no
    * micro-batch boundary between append and delivery. The per-key
    * chains of everything the foreach sink saw must equal the source
    * slice exactly — backlog + tail, exactly once, per-key complete.
    *
    * Scale: the driver-side collector is the test consumer (bounded
    * slice); production consumers are ForeachWriter/Kafka sinks that
    * never collect. One long-poll task per segment; see SCALING.md.
    */
  private def realtimeTail(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-rtq")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).filter($"user_id" < 60).select(
      $"user_id".cast("string").as("routingKey"),
      $"event_id".as("eventTime"),
      encode($"event_id".cast("string"), "UTF-8").as("payload"),
      $"event_id")
    val nTotal = src.count()
    g.writeEvents("q", "ev", src.filter($"event_id" % 2 === 0).drop("event_id"))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.realTimeMode.minBatchDuration", "100")
    val id = java.util.UUID.randomUUID().toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    RtBuf.sinks.put(id, buf)
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .load()
      .writeStream
      .foreach(new RtCollect(id))
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.RealTime("2 seconds"))
      .start()
    try {
      // the tail half lands while the trigger is RUNNING
      g.writeEvents("q", "ev", src.filter($"event_id" % 2 === 1).drop("event_id"))
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (buf.size < nTotal && System.nanoTime() < deadline) Thread.sleep(20)
      require(buf.size == nTotal, s"real-time drain delivered ${buf.size} of $nTotal")
    } finally { q.stop(); RtBuf.sinks.remove(id) }
    val rows: Seq[(String, Long)] = buf.toArray(Array.empty[(String, Long)]).toSeq
    rows.toDF("routingKey", "eid")
      .groupBy($"routingKey")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",", transform(array_sort(collect_list($"eid")),
          x => x.cast("string")))).as("chain"))
      .orderBy($"routingKey")
  }

  private val realtimeTailSql =
    """SELECT CAST(user_id AS VARCHAR) AS routingKey, COUNT(*) AS n,
      |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS chain
      |FROM events WHERE user_id < 60
      |GROUP BY user_id ORDER BY routingKey""".stripMargin

  /** Stream-STATIC join through the real streaming source: events drain
    * from an engine stream in paced pages and join the broadcast
    * customer dimension INSIDE the streaming query (the per-batch
    * enrichment every consumer runs; the batch twin is
    * `ev_enrich_join`). Stateless — each micro-batch joins and emits,
    * so the drained union is batching-independent and the oracle is the
    * plain relational join.
    */
  private def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-sst")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 2))
    g.writeEvents("q", "ev", Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload")))
    val dim = broadcast(Tables.customer(s, dir)
      .select($"c_custkey".cast("string").as("routingKey"), $"c_mktsegment"))
    val pace = twoTriggerPace(g.unreadBySegment("q", "ev", StreamCut(Map.empty)))
    val sink = s"sst_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey", decode($"payload", "UTF-8").as("event_type"))
      .join(dim, Seq("routingKey"))
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"c_mktsegment", $"event_type")
  }

  private val streamStaticJoinSql =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin

  /** Predicate-pushdown scan: events land in four time-ordered commits
    * (disjoint per-file eventTime spans in the manifest), then a DSv2
    * read with an eventTime range predicate aggregates the middle half.
    * The planner prunes the out-of-range files from the MANIFEST before
    * any task runs (GraftScanBuilder / PushedPredicates;
    * ScanPushdownSpec gates the plan shape) — this row proves the
    * pruned read is value-exact against an oracle that never saw the
    * stream. The reference analog is reading between
    * `getStreamCut(time)` positions (controller watermark index,
    * controller/.../bucket/watermarks) generalized to arbitrary
    * time predicates.
    */
  private def scanPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-spr")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"))
    val b = src.agg(min($"eventTime"), max($"eventTime")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    // four commits in time order → per-file time spans are disjoint, so
    // the manifest can prove non-overlap for the pruned range
    val cuts = (1 to 3).map(i => mn + i * ((mx - mn) / 4))
    val slices = (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2).toSeq
    slices.foreach { case Seq(lo, hi) =>
      g.writeEvents("q", "ev", src.filter($"eventTime" >= lo && $"eventTime" < hi))
    }
    val (qLo, qHi) = (mn + (mx - mn) / 4, mn + 3 * ((mx - mn) / 4))
    s.read.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .load()
      .filter($"eventTime" >= qLo && $"eventTime" <= qHi)
      .groupBy(decode($"payload", "UTF-8").as("event_type"))
      .agg(count(lit(1)).as("n"),
           min($"eventTime").as("t_lo"),
           max($"eventTime").as("t_hi"))
      .orderBy($"event_type")
  }

  private val scanPruneSql =
    """WITH t AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS et, event_type FROM events),
      |     b AS (SELECT MIN(et) AS mn, MAX(et) AS mx FROM t)
      |SELECT event_type, COUNT(*) AS n, MIN(et) AS t_lo, MAX(et) AS t_hi
      |FROM t, b
      |WHERE et >= mn + (mx-mn)//4 AND et <= mn + 3*((mx-mn)//4)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Manifest-only aggregate pushdown: COUNT(*) / MIN / MAX(eventTime)
    * over the whole stream answers from the manifest with ZERO file IO
    * (GraftScanBuilder.pushAggregation → GraftAggScan; the engine analog
    * of the reference's per-segment EVENT_COUNT attribute,
    * segmentstore/contracts/.../Attributes.java). The oracle recomputes
    * from the source table — a match proves the manifest's row counts
    * and recorded time bounds agree with the data, end to end.
    */
  private def manifestCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-mct")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 8))
    g.writeEvents("q", "ev", Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload")))
    s.read.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .load()
      .agg(count(lit(1)).as("n_events"),
           min($"eventTime").as("t_min"),
           max($"eventTime").as("t_max"))
  }

  private val manifestCountSql =
    """SELECT COUNT(*) AS n_events,
      |  epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS t_min,
      |  epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS t_max
      |FROM events""".stripMargin

  /** Typed-event (Serializer<T>) round trip THROUGH the engine: rows
    * serialize to a JSON envelope (`to_json` — the JsonSerializer
    * analog, client/.../stream/Serializer.java:32), write as UTF-8
    * payloads, read back through the storage engine, and deserialize
    * schema-on-read with `from_json` + nested-JSON extraction — all
    * codegen'd expressions, no UDFs. The oracle aggregates the source
    * table directly: a match proves the serialize → store → scan →
    * deserialize pipeline is lossless, including a JSON string field
    * that itself contains JSON (escaping round trip).
    */
  private def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-jrt")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    g.writeEvents("q", "ev", Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode(to_json(struct($"event_id", $"event_type", $"props")), "UTF-8")
        .as("payload")))
    val envSchema = "event_id BIGINT, event_type STRING, props STRING"
    g.readEvents("q", "ev")
      .select(from_json(decode($"payload", "UTF-8"),
        org.apache.spark.sql.types.StructType.fromDDL(envSchema)).as("e"))
      .select($"e.event_id", $"e.event_type",
        get_json_object($"e.props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").cast("long").as("sum_k"),
           min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }

  private val jsonRoundtripSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  case class AvroIn(routingKey: String, eventTime: Long,
                    event_id: Long, event_type: String, micros: Long)
  case class AvroEv(routingKey: String, eventTime: Long, payload: Array[Byte])
  case class AvroOut(event_id: Long, event_type: String, micros: Long, src: String)

  private val avroWriterSchema =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"micros","type":"long"}]}""".stripMargin
  /** Reader schema ADDS a defaulted field — Avro reader/writer schema
    * resolution, the compatibility rule a schema registry enforces. */
  private val avroReaderSchema =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"micros","type":"long"},
      |{"name":"src","type":"string","default":"evt"}]}""".stripMargin

  /** Avro-binary payload round trip WITH schema evolution: events are
    * serialized per row with the raw Avro GenericDatumWriter (the codec
    * Pravega applications most commonly plug into Serializer<T> via the
    * schema-registry serializers; JavaSerializer/JSON analogs are
    * `ev_json_roundtrip`), pushed through the engine, and decoded with a
    * NEWER reader schema that adds a defaulted field — Avro's
    * reader/writer resolution, i.e. the backward-compatibility contract
    * a schema registry enforces. Codec stages are typed mapPartitions
    * (one Schema/writer per partition, streamed encoding — the only
    * correct placement for a third-party codec, like the image/audio
    * stages); everything around them stays declarative. The oracle
    * recomputes the aggregate from the source table: a match proves
    * serialize → store → scan → resolve-decode loses nothing, including
    * the evolved field's default.
    */
  private def avroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}
    val work = graft.util.WorkDirs.temp("graft-avro")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val wSchema = avroWriterSchema
    val rSchema = avroReaderSchema
    val micros = expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
    val src = Tables.events(s, dir).select(
        $"user_id".cast("string").as("routingKey"),
        unix_millis($"ts".cast("timestamp")).as("eventTime"),
        $"event_id", $"event_type", micros.as("micros"))
      .as[AvroIn]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(wSchema)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val bos = new java.io.ByteArrayOutputStream()
        var enc: org.apache.avro.io.BinaryEncoder = null
        it.map { r =>
          bos.reset()
          enc = EncoderFactory.get().binaryEncoder(bos, enc)
          val rec = new GenericData.Record(schema)
          rec.put("event_id", r.event_id)
          rec.put("event_type", r.event_type)
          rec.put("micros", r.micros)
          writer.write(rec, enc)
          enc.flush()
          AvroEv(r.routingKey, r.eventTime, bos.toByteArray)
        }
      }
    g.writeEvents("q", "ev", src.toDF())
    g.readEvents("q", "ev")
      .select($"payload").as[Array[Byte]]
      .mapPartitions { it =>
        val writerS = new Schema.Parser().parse(wSchema)
        val readerS = new Schema.Parser().parse(rSchema)
        val reader = new GenericDatumReader[GenericRecord](writerS, readerS)
        var dec: org.apache.avro.io.BinaryDecoder = null
        it.map { bytes =>
          dec = DecoderFactory.get().binaryDecoder(bytes, dec)
          val rec = reader.read(null, dec)
          AvroOut(rec.get("event_id").asInstanceOf[Long],
            rec.get("event_type").toString,
            rec.get("micros").asInstanceOf[Long],
            rec.get("src").toString)
        }
      }
      .groupBy($"event_type", $"src")
      .agg(count(lit(1)).as("n"), sum($"micros").as("sum_micros"),
        min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }

  private val avroRoundtripSql =
    """SELECT event_type, 'evt' AS src, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_micros,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Streaming curation at ingest — the training-data pipeline running
    * INSIDE the stream engine rather than as a batch afterthought:
    * documents flow as events (with injected exact duplicates), a
    * quality gate (length + whitespace-token floor) and exact
    * content-fingerprint dedup (`dropDuplicates` keyed on
    * (lang, md5(normalized text)) — cross-TRIGGER streaming state)
    * filter the flow, and survivors land in a second stream through the
    * real STREAMING_WRITE sink. The oracle recomputes the surviving
    * fingerprint set from the source table alone: a match proves the
    * stream pipeline dropped exactly the duplicates and low-quality
    * docs, across trigger boundaries, exactly once. At unbounded scale
    * the same pipeline swaps in `dropDuplicatesWithinWatermark` to
    * bound dedup state by the event-time horizon (`ev_stream_dedup`
    * gates that variant); this bounded AvailableNow run exercises the
    * cross-trigger state path.
    */
  private def streamCurate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-cur")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "raw", StreamConfig(initialSegments = 4))
    g.catalog.createStream("q", "clean", StreamConfig(initialSegments = 2))
    val docs = Tables.documents(s, dir)
    // inject exact duplicates: every 5th document replayed under a new
    // id — the stream must collapse them no matter which trigger each
    // copy lands in
    val feed = docs.unionByName(
        docs.filter($"doc_id" % 5 === 0).withColumn("doc_id", $"doc_id" + 10000000L))
      .select($"lang".as("routingKey"), $"doc_id".as("eventTime"),
        encode($"text", "UTF-8").as("payload"))
    g.writeEvents("q", "raw", feed)
    val pace = twoTriggerPace(g.unreadBySegment("q", "raw", StreamCut(Map.empty)), floor = 200L)
    val ckpt = graft.util.WorkDirs.temp("graft-curck")
    // dropDuplicates keeps one state store per shuffle partition per
    // trigger — run the streaming leg with fewer partitions (state
    // sizing is a deployment knob, not a semantic), like ev_stream_join
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "raw")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey", $"eventTime", decode($"payload", "UTF-8").as("text"))
      .filter(length($"text") >= 100 &&
        size(split(trim($"text"), "\\s+")) >= 20)
      .withColumn("fp", md5(lower(trim($"text"))))
      .dropDuplicates("routingKey", "fp")
      .select($"routingKey", $"eventTime", encode($"fp", "UTF-8").as("payload"))
      .writeStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "clean")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    g.readEvents("q", "clean")
      .select($"routingKey".as("lang"), decode($"payload", "UTF-8").as("fp"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_unique"),
        sum(conv(substring($"fp", 1, 12), 16, 10).cast("long")).cast("long").as("fp_sum"))
      .orderBy($"lang")
  }

  private val streamCurateSql =
    """WITH t AS (
      |  SELECT lang, md5(lower(trim(text))) AS fp FROM documents
      |  WHERE length(text) >= 100
      |    AND len(string_split_regex(trim(text), '\s+')) >= 20),
      |d AS (SELECT DISTINCT lang, fp FROM t)
      |SELECT lang, COUNT(*) AS n_unique,
      |  CAST(SUM(CAST(concat('0x', substring(fp, 1, 12)) AS BIGINT)) AS BIGINT) AS fp_sum
      |FROM d GROUP BY 1 ORDER BY lang""".stripMargin

  /** SQL time travel over a stream table (`VERSION AS OF` through the
    * DSv2 catalog): manifest versions are the commit history —
    * `getStreamAt(v)` pins the file list, cuts and truncation state to
    * the CAS that produced them, exactly the revisioned-metadata read
    * the reference's StreamCut + getSegments(from, to) surface offers,
    * but addressable by commit. Batch A is written, the version
    * captured, batch B appended; the query reads the SAME table
    * identifier at both the historical version and the live tail and
    * joins the two — the oracle recomputes each side from the source
    * table. A planner that leaked post-version files into the pinned
    * read (or vice versa) breaks the join counts. Historical tables
    * reject writes/streaming/truncate (spec'd in TimeTravelSpec).
    */
  private def timeTravel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Root-derived catalog name: Spark caches catalog INSTANCES by name
    // for the session's lifetime, so a shared name registered earlier
    // (possibly against another root — this query mixes direct engine
    // writes with SQL reads, which must agree on the root) would shadow
    // this root. Deriving the name from the root keeps it collision-free
    // AND stable across invocations: one cached instance, no per-run
    // conf-entry growth.
    val cat = "gtt" + org.apache.commons.codec.digest.DigestUtils
      .md5Hex(sqlRoot).substring(0, 8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.rootDir", sqlRoot)
    val g = new GraftStreams(s, sqlRoot)
    val scope = "q" + java.util.UUID.randomUUID().toString.replace("-", "").substring(0, 8)
    g.catalog.createScope(scope)
    g.catalog.createStream(scope, "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"event_id")
    g.writeEvents(scope, "ev", src.filter($"event_id" % 2 === 0).drop("event_id"))
    val vA = g.catalog.getStream(scope, "ev").version
    g.writeEvents(scope, "ev", src.filter($"event_id" % 2 === 1).drop("event_id"))
    val asof = s.sql(
      s"""SELECT decode(payload, 'UTF-8') AS event_type, count(*) AS n_asof
         |FROM $cat.$scope.ev VERSION AS OF $vA GROUP BY 1""".stripMargin)
    val now = s.sql(
      s"""SELECT decode(payload, 'UTF-8') AS event_type, count(*) AS n_now
         |FROM $cat.$scope.ev GROUP BY 1""".stripMargin)
    // LEFT join from the live side: an event type absent from the pinned
    // version must still appear with n_asof = 0, exactly as the oracle's
    // COUNT(*) FILTER computes it over every type.
    now.join(asof, Seq("event_type"), "left")
      .select($"event_type", coalesce($"n_asof", lit(0L)).as("n_asof"), $"n_now")
      .orderBy($"event_type")
  }

  private val timeTravelSql =
    """SELECT event_type,
      |  COUNT(*) FILTER (WHERE event_id % 2 = 0) AS n_asof,
      |  COUNT(*) AS n_now
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Version-diff read ("what changed between commit v1 and v2" — the
    * CDC/table_changes surface over the manifest history): three batches
    * commit as three manifest versions; the middle one is read back as
    * `(fromVersion=v1, toVersion=v2]` — internally the two manifest
    * tails become a cut pair and planning is pinned at v2, so later
    * commits (the decoy third batch) can never leak in. The oracle
    * recomputes the middle batch from the source table: a hash match
    * proves the version→cut resolution and the pinned planning window
    * are exact.
    */
  private def versionChanges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-vdiff")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"event_id")
    g.writeEvents("q", "ev", src.filter($"event_id" % 3 === 0).drop("event_id"))
    val v1 = g.catalog.getStream("q", "ev").version
    g.writeEvents("q", "ev", src.filter($"event_id" % 3 === 1).drop("event_id"))
    val v2 = g.catalog.getStream("q", "ev").version
    g.writeEvents("q", "ev", src.filter($"event_id" % 3 === 2).drop("event_id"))
    s.read.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("fromVersion", v1.toString).option("toVersion", v2.toString)
      .load()
      .groupBy(decode($"payload", "UTF-8").as("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct($"routingKey").as("n_users"),
        min($"eventTime").as("min_time"), max($"eventTime").as("max_time"))
      .orderBy($"event_type")
  }

  private val versionChangesSql =
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_users,
      |  epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS min_time,
      |  epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS max_time
      |FROM events WHERE event_id % 3 = 1
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** One event arriving at the hot-key monitor. */
  case class HotIn(part: Long, rk: String)
  /** Per-trigger hot-key report: seq = rows folded so far (monotone, so
    * the final state is the max-seq emission per partition). */
  case class HotOut(part: Long, seq: Long, rk: String, cnt: Long)

  /** Hot-ROUTING-KEY detection at ingest: the mergeable Misra–Gries
    * sketch (operators/FrequencySketch) lives INSIDE streaming keyed
    * state, folded across triggers — the diagnostic the reference's
    * auto-scaler cannot produce (AutoScaleProcessor.java:286 rates whole
    * segments; which KEY makes a segment hot is invisible to it). One
    * sketch per partition bucket; each trigger folds its rows and emits
    * the current top keys with a monotone row counter, so the final
    * index state is recoverable from append-mode emissions. The run is
    * pinned inside the sketch's exactness domain, so the oracle's plain
    * per-partition top-k (count desc, key asc) must match exactly —
    * gating the state-store serialization round trip of the sketch
    * (Encoders.product through the state store) and cross-trigger
    * merging at once. State per key is O(capacity), not O(distinct
    * routing keys) — the property that makes this viable on a 100 TB
    * ingest firehose.
    */
  private def streamHotKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.FrequencySketch.Sketch
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val work = graft.util.WorkDirs.temp("graft-hotk")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      $"event_id".as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)
    val pace = twoTriggerPace(g.unreadBySegment("q", "ev", StreamCut(Map.empty)))
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"hotk_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val cap = 4096 // >> distinct keys at every tested sf: exactness domain
    val fn = (part: Long, it: Iterator[HotIn], st: GroupState[Sketch]) => {
      var sk = st.getOption.getOrElse(Sketch.empty(cap))
      var folded = sk.counters.valuesIterator.sum + sk.err
      it.foreach { r => sk = sk.add(r.rk, 1L); folded += 1L }
      st.update(sk)
      sk.topK(3).iterator.map { case (rk, cnt) => HotOut(part, folded, rk, cnt) }
    }
    val q = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "ev")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select(($"routingKey".cast("long") % 8L).as("part"), $"routingKey".as("rk"))
      .as[HotIn]
      .groupByKey(_.part)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
      .toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val last = s2.table(sink)
      .withColumn("rnk", dense_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"part").orderBy($"seq".desc)))
      .filter($"rnk" === 1)
    last.select($"part", $"rk", $"cnt").orderBy($"part", $"cnt".desc, $"rk")
  }

  private val streamHotKeysSql =
    """WITH c AS (
      |  SELECT user_id % 8 AS part, CAST(user_id AS VARCHAR) AS rk,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT part, rk, cnt,
      |  ROW_NUMBER() OVER (PARTITION BY part ORDER BY cnt DESC, rk) AS rn
      |  FROM c)
      |SELECT part, rk, cnt FROM r WHERE rn <= 3
      |ORDER BY part, cnt DESC, rk""".stripMargin

  /** One (band, bsig) index entry arriving from the stream. */
  case class LshIn(band: Int, bsig: String, docId: Long)
  /** Per-bucket streaming state: member count + smallest doc id. */
  case class LshState(n: Long, minDoc: Long)
  /** Per-trigger bucket update emitted to the sink. */
  case class LshOut(band: Int, bsig: String, n: Long, minDoc: Long)

  /** STREAMING LSH index maintenance at ingest: documents flow through
    * the engine stream, each trigger computes the reproducible MinHash
    * band signatures (operators/MinHashLSH.bandSignatures — pure
    * codegen'd expressions, so the exact batch kernel runs inside the
    * streaming query) and folds them into keyed state per (band, bsig)
    * bucket: member count + smallest doc id. This is the near-dup
    * LSH index AS STREAMING STATE — the piece that turns the batch
    * dedup pipeline into dedup-at-ingest: a new document is a candidate
    * near-dup iff one of its 16 buckets already has a member, and the
    * keep/drop rule (drop iff any bucket's min_doc < doc_id) is a pure
    * function of the final index. State is O(corpus buckets), sharded
    * by the state-store over the (band, bsig) key — the same shuffle
    * key the batch candidate join uses.
    *
    * The oracle replays the WHOLE hash family in DuckDB (the
    * dedup_minhash_lsh CTE prefix) and recomputes every collision
    * bucket: a hash match proves the streaming path — engine write,
    * paced triggers, cross-trigger state accumulation, exactly-once
    * delivery — maintains the index the batch semantics define. Bucket
    * counts grow monotonically and minima shrink monotonically, so the
    * final state per key is recoverable from append-mode emissions via
    * max/min — no update-mode sink needed.
    */
  private def streamLshIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val work = graft.util.WorkDirs.temp("graft-lshix")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "docs", StreamConfig(initialSegments = 4))
    val src = Tables.documents(s, dir).select(
      $"doc_id".cast("string").as("routingKey"),
      $"doc_id".cast("long").as("eventTime"),
      encode($"text", "UTF-8").as("payload"))
    g.writeEvents("q", "docs", src)
    val pace = twoTriggerPace(g.unreadBySegment("q", "docs", StreamCut(Map.empty)), floor = 100L)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"lshix_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val fn = (key: (Int, String), it: Iterator[LshIn], st: GroupState[LshState]) => {
      var n = st.getOption.map(_.n).getOrElse(0L)
      var mn = st.getOption.map(_.minDoc).getOrElse(Long.MaxValue)
      it.foreach { r => n += 1; if (r.docId < mn) mn = r.docId }
      st.update(LshState(n, mn))
      Iterator.single(LshOut(key._1, key._2, n, mn))
    }
    val stream = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "docs")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey".cast("long").as("doc_id"),
        decode($"payload", "UTF-8").as("text"))
    val q = graft.operators.MinHashLSH
      .bandSignatures(stream, "doc_id", "text", numHashes = 64, bands = 16)
      .select($"band", $"bsig", $"id".as("docId")).as[LshIn]
      .groupByKey(r => (r.band, r.bsig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
      .toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"band", $"bsig")
      .agg(max($"n").as("n_docs"), min($"minDoc").as("min_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"band", $"bsig")
  }

  private val streamLshIndexSql = {
    val ctes = graft.operators.MinHashLSH.oracleBandsCtes("", numHashes = 64, bands = 16)
    s"""WITH $ctes
       |SELECT band, bsig, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
       |FROM bands GROUP BY band, bsig HAVING COUNT(*) >= 2
       |ORDER BY band, bsig""".stripMargin
  }

  /** One centroid assignment arriving from the stream. */
  case class IvfIn(cId: Long, vecId: Long)
  /** Per-centroid streaming state: member count + smallest vec id. */
  case class IvfState(n: Long, minVec: Long)
  /** Per-trigger inverted-list update emitted to the sink. */
  case class IvfOut(cId: Long, n: Long, minVec: Long)

  /** STREAMING IVF index maintenance at ingest — the ANN sibling of
    * [[streamLshIndex]]: embedding vectors flow through the engine
    * stream as float-text payloads (Float → string → float is an exact
    * round trip by the Java shortest-repr contract), each trigger runs
    * the SAME pure-projection assignment kernel the batch path uses
    * (`Similarity.ivfAssign` against the offline-trained centroid set —
    * centroids are a training artifact, assignment is the online work)
    * and folds the arrivals into keyed state per centroid: inverted-list
    * size + smallest member id. This is what keeps `sim_index_lookup`'s
    * serving index FRESH between index rebuilds. State is O(centroids);
    * counts grow and minima shrink monotonically, so the final index
    * state is recoverable from append-mode emissions via max/min.
    *
    * The oracle replays centroid selection AND every assignment in
    * DuckDB (the `sim_ann_ivf` CTE prefix) and aggregates per centroid:
    * a hash match proves the streamed index equals the batch-built one
    * — engine write, payload codec, paced triggers, cross-trigger state
    * and exactly-once delivery included.
    */
  private def streamIvfIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    // offline-trained artifact: the deterministic centroid set
    val centroids = Similarity.ivfCentroids(Similarity.ivfCentsDf(e))
    val work = graft.util.WorkDirs.temp("graft-ivfix")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "vecs", StreamConfig(initialSegments = 4))
    val src = e.select(
      $"vec_id".cast("string").as("routingKey"),
      $"vec_id".cast("long").as("eventTime"),
      encode(concat_ws(",", transform($"embedding", x => x.cast("string"))), "UTF-8")
        .as("payload"))
    g.writeEvents("q", "vecs", src)
    val pace = twoTriggerPace(g.unreadBySegment("q", "vecs", StreamCut(Map.empty)), floor = 100L)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"ivfix_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val fn = (key: Long, it: Iterator[IvfIn], st: GroupState[IvfState]) => {
      var n = st.getOption.map(_.n).getOrElse(0L)
      var mn = st.getOption.map(_.minVec).getOrElse(Long.MaxValue)
      it.foreach { r => n += 1; if (r.vecId < mn) mn = r.vecId }
      st.update(IvfState(n, mn))
      Iterator.single(IvfOut(key, n, mn))
    }
    val stream = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "vecs")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey".cast("long").as("vec_id"),
        transform(split(decode($"payload", "UTF-8"), ","), x => x.cast("float"))
          .as("embedding"))
    val q = Similarity.ivfAssign(stream, centroids)
      .select($"c_id".as("cId"), $"vec_id".as("vecId")).as[IvfIn]
      .groupByKey(_.cId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
      .toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"cId".as("c_id"))
      .agg(max($"n").as("n_vecs"), min($"minVec").as("min_vec"))
      .orderBy($"c_id")
  }

  private val streamIvfIndexSql =
    s"""WITH ${graft.operators.Similarity.ivfAssignedOracleCtes()}
       |SELECT c_id, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
       |FROM assigned GROUP BY c_id ORDER BY c_id""".stripMargin

  /** One scored assignment arriving from the stream. */
  case class DriftIn(cId: Long, cosFp: Long)
  /** Per-centroid health state: member count + Σ quantized assign-cos. */
  case class DriftState(n: Long, sumFp: Long)
  /** Per-trigger health update emitted to the sink. */
  case class DriftOut(cId: Long, n: Long, sumFp: Long)

  /** STREAMING index-health / drift monitor — the signal that tells an
    * IVF deployment WHEN to retrain: per centroid, the running count and
    * mean assignment cosine of everything ingested since the centroids
    * were trained. A distribution shift shows up as falling mean
    * assign-cos (new vectors sit far from every trained centroid) or as
    * lopsided counts (one centroid absorbs the new mode) — both visible
    * per trigger, long before batch recall evaluation would notice.
    * The cosine is quantized driver-side semantics-identically on both
    * engines (floor(cos·10⁶) of bit-identical doubles), so the state sum
    * is an exact BIGINT and the final mean is ONE double division.
    * State is O(centroids); emissions carry cumulative (n, Σ), so the
    * final state per key is the row with max n — append-mode
    * recoverable like the index row, no update-mode sink.
    */
  private def streamDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroids(Similarity.ivfCentsDf(e))
    val work = graft.util.WorkDirs.temp("graft-drift")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "vecs", StreamConfig(initialSegments = 4))
    val src = e.select(
      $"vec_id".cast("string").as("routingKey"),
      $"vec_id".cast("long").as("eventTime"),
      encode(concat_ws(",", transform($"embedding", x => x.cast("string"))), "UTF-8")
        .as("payload"))
    g.writeEvents("q", "vecs", src)
    val pace = twoTriggerPace(g.unreadBySegment("q", "vecs", StreamCut(Map.empty)), floor = 100L)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"drift_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val fn = (key: Long, it: Iterator[DriftIn], st: GroupState[DriftState]) => {
      var n = st.getOption.map(_.n).getOrElse(0L)
      var sm = st.getOption.map(_.sumFp).getOrElse(0L)
      it.foreach { r => n += 1; sm += r.cosFp }
      st.update(DriftState(n, sm))
      Iterator.single(DriftOut(key, n, sm))
    }
    val stream = s2.readStream.format("graft-stream")
      .option("rootDir", work).option("scope", "q").option("stream", "vecs")
      .option("maxRowsPerTrigger", pace.toString)
      .load()
      .select($"routingKey".cast("long").as("vec_id"),
        transform(split(decode($"payload", "UTF-8"), ","), x => x.cast("float"))
          .as("embedding"))
    val q = Similarity.ivfAssign(stream, centroids)
      .select($"c_id".as("cId"),
        floor($"assign_cos" * lit(1000000.0)).cast("long").as("cosFp")).as[DriftIn]
      .groupByKey(_.cId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
      .toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(sink)
      .groupBy($"cId".as("c_id"))
      .agg(max(struct($"n", $"sumFp")).as("fin"))
      .select($"c_id", $"fin.n".as("n_vecs"), $"fin.sumFp".as("sum_cos_fp"),
        ($"fin.sumFp".cast("double") / $"fin.n".cast("double")).as("mean_cos_fp"))
      .orderBy($"c_id")
  }

  private val streamDriftSql =
    s"""WITH ${graft.operators.Similarity.ivfAssignedOracleCtes()},
       |scored AS (
       |  SELECT a.c_id AS c_id,
       |    CAST(floor(list_sum(list_transform(list_zip(a.embedding, c.c_emb),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * c.c_nrm)
       |      * 1000000.0) AS BIGINT) AS cos_fp
       |  FROM assigned a JOIN cents c ON a.c_id = c.c_id)
       |SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(cos_fp) AS BIGINT) AS sum_cos_fp,
       |  CAST(SUM(cos_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cos_fp
       |FROM scored GROUP BY c_id ORDER BY c_id""".stripMargin

  /** Segment attributes with every AttributeUpdateType
    * (AttributeUpdateType.java:27-60; GetSegmentAttribute /
    * UpdateSegmentAttribute wire ops, WireCommands.java:1022,1078),
    * oracle-checked: events flow through the engine write path (payload =
    * value micros), then per segment a scripted update sequence runs —
    * split ACCUMULATE halves that must sum to the exact per-segment total,
    * a REPLACE_IF_GREATER time high-water chain, a REPLACE_IF_EQUALS CAS
    * generation counter (initial CAS against the NULL sentinel), plain
    * NONE/REPLACE, and a deliberately-failing batch whose ACCUMULATE must
    * NOT land (atomic abort, the all-or-nothing wire contract). The rollup
    * over segment attributes hash-matches the oracle's arithmetic over the
    * source table — any lost/dup accumulate, a non-atomic abort, or a CAS
    * drift breaks the match. The 4-row collect is bounded by segment
    * count (control-plane metadata, same pattern as segmentsAtTime).
    */
  private def attrUpdates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.core.{AttributeUpdate => AU, Attributes, ConditionalCheckFailedException}
    val work = graft.util.WorkDirs.temp("graft-attr")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val micros = expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode(micros.cast("string"), "UTF-8").as("payload"))
    g.writeEvents("q", "ev", src)

    // Per-segment facts from the engine's own read surface: the even/odd
    // offset split is arbitrary — the two ACCUMULATEs must recombine to
    // the exact total no matter how the writer batched them.
    val facts = g.readEvents("q", "ev")
      .select($"segmentId", $"offset", $"eventTime",
        decode($"payload", "UTF-8").cast("long").as("micros"))
      .groupBy($"segmentId")
      .agg(sum(when($"offset" % 2 === 0, $"micros").otherwise(0L)).as("evenSum"),
        sum(when($"offset" % 2 =!= 0, $"micros").otherwise(0L)).as("oddSum"),
        max($"eventTime").as("tmax"))
      .collect()

    val segIds = g.catalog.getStream("q", "ev").segments.map(_.segmentId)
    facts.foreach { r =>
      val sid = r.getLong(0); val even = r.getLong(1); val odd = r.getLong(2); val tmax = r.getLong(3)
      g.updateSegmentAttributes("q", "ev", sid, Seq(
        AU("SUM_MICROS", "ACCUMULATE", even),
        AU("MAX_TIME", "REPLACE_IF_GREATER", tmax - 1)))
      g.updateSegmentAttributes("q", "ev", sid, Seq(
        AU("SUM_MICROS", "ACCUMULATE", odd),
        AU("MAX_TIME", "REPLACE_IF_GREATER", tmax)))
      // Failing batch: IF_GREATER regresses, so the ACCUMULATE in the
      // same call must be rolled back with it.
      try {
        g.updateSegmentAttributes("q", "ev", sid, Seq(
          AU("SUM_MICROS", "ACCUMULATE", 999999999L),
          AU("MAX_TIME", "REPLACE_IF_GREATER", tmax - 5)))
        throw new IllegalStateException("regressing REPLACE_IF_GREATER must fail")
      } catch { case _: ConditionalCheckFailedException => () }
    }
    segIds.foreach { sid =>
      g.updateSegmentAttributes("q", "ev", sid, Seq(
        AU("GEN", "REPLACE_IF_EQUALS", 1L, Attributes.NullValue),
        AU("NOTE", "NONE", 3L)))
      g.updateSegmentAttributes("q", "ev", sid, Seq(
        AU("GEN", "REPLACE_IF_EQUALS", 2L, 1L),
        AU("NOTE", "REPLACE", 7L)))
      try {
        g.updateSegmentAttributes("q", "ev", sid,
          Seq(AU("GEN", "REPLACE_IF_EQUALS", 9L, 1L)))
        throw new IllegalStateException("stale REPLACE_IF_EQUALS CAS must fail")
      } catch { case _: ConditionalCheckFailedException => () }
    }

    def attr(sid: Long, k: String): Long = {
      val v = g.getSegmentAttribute("q", "ev", sid, k)
      if (v == Attributes.NullValue) 0L else v
    }
    val row = (segIds.size,
      segIds.map(attr(_, Attributes.EventCount)).sum,
      segIds.map(attr(_, "SUM_MICROS")).sum,
      segIds.map(attr(_, "MAX_TIME")).max,
      segIds.map(attr(_, "GEN")).sum,
      segIds.map(attr(_, "NOTE")).sum)
    Seq(row).toDF("n_segments", "total_count", "total_micros",
      "max_time", "gen_total", "note_total")
  }

  private val attrUpdatesSql =
    """SELECT 4 AS n_segments, COUNT(*) AS total_count,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS total_micros,
      |  epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS max_time,
      |  8 AS gen_total, 28 AS note_total
      |FROM events""".stripMargin

  /** Named StreamCuts as reader-group checkpoints
    * (ReaderGroup.java:84 initiateCheckpoint, :215 generateStreamCuts;
    * resetReaderGroup(ReaderGroupConfig.startFromStreamCut)): a cut is
    * saved mid-stream, a second after more writes, then the window
    * [ckpt1, ckpt2) is replayed twice — once immediately and once AFTER a
    * decoy append beyond ckpt2 and the named cuts' deletion (a held
    * Checkpoint object stays valid after deleteStreamCut, like the
    * reference's immutable Checkpoint handles). Both replays must see
    * exactly the second batch: n_first ≠ n_replay breaks determinism,
    * decoy rows leaking in breaks cut bounding.
    */
  private def checkpointCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.util.WorkDirs.temp("graft-ckcut")
    val g = new GraftStreams(s, work)
    g.catalog.createScope("q")
    g.catalog.createStream("q", "ev", StreamConfig(initialSegments = 4))
    val src = Tables.events(s, dir).select(
      $"user_id".cast("string").as("routingKey"),
      unix_millis($"ts".cast("timestamp")).as("eventTime"),
      encode($"event_type", "UTF-8").as("payload"),
      $"event_id")
    g.writeEvents("q", "ev", src.filter($"event_id" % 2 === 0).drop("event_id"))
    val c1 = g.saveStreamCut("q", "ev", "ckpt1")
    g.writeEvents("q", "ev", src.filter($"event_id" % 2 === 1).drop("event_id"))
    val c2 = g.saveStreamCut("q", "ev", "ckpt2")

    def window(): DataFrame = {
      val f = g.getStreamCut("q", "ev", "ckpt1").getOrElse(c1)
      val t = g.getStreamCut("q", "ev", "ckpt2").getOrElse(c2)
      g.readEvents("q", "ev", from = f, to = t)
        .groupBy(decode($"payload", "UTF-8").as("event_type"))
        .agg(count(lit(1)).as("n"))
    }
    val first = window()
    // Decoy append past ckpt2, then drop the named cuts: the replay must
    // be byte-identical to the first read.
    g.writeEvents("q", "ev", src.limit(500)
      .withColumn("payload", encode(lit("DECOY"), "UTF-8")).drop("event_id"))
    g.deleteStreamCut("q", "ev", "ckpt1")
    g.deleteStreamCut("q", "ev", "ckpt2")
    require(g.getStreamCut("q", "ev", "ckpt1").isEmpty, "ckpt1 must be deleted")
    val replay = window()
    first.as("a").join(replay.as("b"), "event_type")
      .select($"event_type", $"a.n".as("n_first"), $"b.n".as("n_replay"))
      .orderBy($"event_type")
  }

  private val checkpointCutsSql =
    """SELECT event_type, COUNT(*) AS n_first, COUNT(*) AS n_replay
      |FROM events WHERE event_id % 2 = 1
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("stream_roundtrip_agg", roundtrip _,    Some(roundtripSql)),
    ("ev_attr_updates",      attrUpdates _,  Some(attrUpdatesSql)),
    ("ev_checkpoint_cuts",   checkpointCuts _, Some(checkpointCutsSql)),
    ("ev_stream_lsh_index",  streamLshIndex _, Some(streamLshIndexSql)),
    ("ev_stream_ivf_index",  streamIvfIndex _, Some(streamIvfIndexSql)),
    ("ev_stream_drift",      streamDrift _,    Some(streamDriftSql)),
    ("ev_stream_hot_keys",   streamHotKeys _, Some(streamHotKeysSql)),
    ("ev_time_travel",       timeTravel _,   Some(timeTravelSql)),
    ("ev_version_changes",   versionChanges _, Some(versionChangesSql)),
    ("ev_scan_prune",        scanPrune _,    Some(scanPruneSql)),
    ("ev_manifest_count",    manifestCount _, Some(manifestCountSql)),
    ("ev_json_roundtrip",    jsonRoundtrip _, Some(jsonRoundtripSql)),
    ("ev_avro_roundtrip",    avroRoundtrip _, Some(avroRoundtripSql)),
    ("ev_stream_curate",     streamCurate _, Some(streamCurateSql)),
    ("ev_checkpoint_resume", checkpointResume _, Some(checkpointResumeSql)),
    ("ev_sql_insert_roundtrip", sqlInsertRoundtrip _, Some(sqlInsertRoundtripSql)),
    ("ev_multistream",       multiStream _,  Some(multiStreamSql)),
    ("stream_compacted_roundtrip", compactedRoundtrip _, Some(compactedRoundtripSql)),
    ("stream_gc_read", gcRead _, Some(gcReadSql)),
    ("ev_maintenance_gc", maintenanceGc _, Some(maintenanceGcSql)),
    ("ev_autoscale_policy",  autoscalePolicy _, Some(autoscalePolicySql)),
    ("ev_retention_policy",  retentionPolicy _, Some(retentionPolicySql)),
    ("stream_txn_roundtrip", txnRoundtrip _, Some(txnRoundtripSql)),
    ("stream_order_chain",   orderChain _,   Some(orderChainSql)),
    ("stream_merge_chain",   mergeChain _,   Some(orderChainSql)),
    ("stream_large_event",   largeEvent _,   Some(largeEventSql)),
    ("ev_next_cut",          nextCut _,      Some(nextCutSql)),
    ("bs_roundtrip",         byteStreamRoundtrip _, Some(byteStreamRoundtripSql)),
    ("state_sync_fold",      stateSyncFold _, Some(stateSyncFoldSql)),
    ("ev_maintenance_pass",  maintenancePass _, Some(maintenancePassSql)),
    ("ev_successor_lineage", successorLineage _, Some(successorLineageSql)),
    ("stream_truncate_read", truncateRead _, Some(truncateReadSql)),
    ("ev_stream_join",       streamJoin _,   Some(streamJoinSql)),
    ("stream_redacted_read", redactedRead _, Some(redactedReadSql)),
    ("ev_stream_dq",         streamDq _,     Some(streamDqSql)),
    ("ev_stream_join_late",  streamJoinLate _, Some(streamJoinLateSql)),
    ("stream_pipe_resume",   pipeResume _,   Some(pipeResumeSql)),
    ("stream_pipe_roundtrip", pipeRoundtrip _, Some(pipeRoundtripSql)),
    ("stream_concurrent_writers", concurrentWriters _, Some(concurrentWritersSql)),
    ("stream_seal_read",     sealRead _,     Some(sealReadSql)),
    ("ev_stream_window",     streamWindow _, Some(streamWindowSql)),
    ("ev_stream_dedup",      streamDedup _,  Some(streamDedupSql)),
    ("ev_stream_state_dedup", streamStateDedup _, Some(streamStateDedupSql)),
    ("ev_realtime_tail",     realtimeTail _, Some(realtimeTailSql)),
    ("ev_stream_static_join", streamStaticJoin _, Some(streamStaticJoinSql)),
  )
}
