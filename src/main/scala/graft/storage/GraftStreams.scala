package graft.storage

import graft.catalog.StreamCatalog
import graft.core._
import graft.functions.GraftFunctions.hash_to_range
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.util.UUID

/** Data plane for graft streams (SURVEY §3.1/§3.2 re-expressed for Spark).
  *
  * Write path (EventStreamWriter analog, client/.../EventStreamWriterImpl.java:122):
  *   route rows to the segment owning hash(routingKey) → one shuffle
  *   partitioned by segment → per-segment contiguous offsets assigned by a
  *   ranking window → one parquet file per (batch, segment) → a single
  *   manifest CAS makes everything visible atomically. No WAL: the object
  *   store plus the atomic manifest is both durability tiers.
  *
  * Read path (BatchClientFactory analog, client/.../BatchClientFactory.java:80):
  *   plan = manifest file entries overlapping [fromCut, toCut) — the exact
  *   StreamCut → byte-range pruning of the reference, here as file pruning
  *   plus parquet min/max stats on the (segmentId, offset) columns.
  *
  * Rows at rest use the canonical event schema (SURVEY §1.2):
  * (segmentId long, offset long, routingKey string, eventTime long,
  *  processingTime timestamp, payload binary).
  */
class GraftStreams(val spark: SparkSession, rootDir: String) {
  val catalog = new StreamCatalog(rootDir, spark.sessionState.newHadoopConf())

  import spark.implicits._

  // ------------------------------------------------------------------ write

  /** Append a batch of events. `df` must carry `routingKey` (string),
    * `eventTime` (long) and `payload` (binary) columns — the Encoder-side
    * Serializer<T> analog lives with the caller.
    *
    * `writerId`/`batchId` give per-writer idempotence: re-delivering an
    * already-committed batch is a no-op (the Spark translation of the
    * reference's writer-id event-number dedup, AppendProcessor.java:179-387).
    */
  def writeEvents(scope: String, stream: String, df: DataFrame,
                  writerId: Option[String] = None, batchId: Option[Long] = None): StreamCut = {
    val meta = catalog.getStream(scope, stream)
    if (meta.isSealed) throw new StreamSealedException(s"$scope/$stream is sealed")
    for (w <- writerId; b <- batchId)
      if (meta.writerBatches.get(w).exists(_ >= b)) return meta.tailCut

    val open = meta.openSegments.sortBy(_.keyLow)
    require(open.nonEmpty, "stream has no open segments")

    // Route: CASE over the epoch's key ranges (few segments → codegen'd
    // chain; the hash itself is a native expression).
    val h = hash_to_range(col("routingKey"))
    val segCol = open.init.foldRight(lit(open.last.segmentId): Column) { (s, rest) =>
      when(h < s.keyHigh, lit(s.segmentId)).otherwise(rest)
    }

    val baseBySeg = open.map(s => s.segmentId -> s.tailOffset).toMap
    val baseCol = open.foldRight(lit(0L): Column) { (s, rest) =>
      when(col("segmentId") === s.segmentId, lit(baseBySeg(s.segmentId))).otherwise(rest)
    }

    val batchDir = new Path(catalog.dataDir(scope, stream), s"batch-${UUID.randomUUID()}")
    val win = Window.partitionBy($"segmentId").orderBy($"arrivalSeq")
    val routed = df
      .withColumn("arrivalSeq", monotonically_increasing_id())
      .withColumn("segmentId", segCol)
      .repartition($"segmentId")
      .withColumn("offset", baseCol + row_number().over(win) - 1)
      .withColumn("processingTime", current_timestamp())
      .select($"segmentId", $"offset", $"routingKey", $"eventTime", $"processingTime", $"payload")
      .withColumn("segId", $"segmentId")
      .sortWithinPartitions($"segmentId", $"offset")

    routed.write.partitionBy("segId").parquet(batchDir.toString)

    // Per-file commit stats (production: collected from task commit
    // messages; here a cheap footer-sized second pass).
    val staged = spark.read.parquet(batchDir.toString)
    val entries = staged
      .groupBy(input_file_name().as("path"), $"segmentId")
      .agg(count(lit(1)).as("n"), min($"offset").as("lo"), max($"offset").as("hi"),
           min($"eventTime").as("tmin"), max($"eventTime").as("tmax"))
      .collect()
      .map(r => FileEntry(r.getAs[Long]("segmentId"), stripScheme(r.getAs[String]("path")),
        r.getAs[Long]("lo"), r.getAs[Long]("n"), r.getAs[Long]("tmin"), r.getAs[Long]("tmax")))
      .toSeq

    val updated = catalog.update(scope, stream) { m =>
      if (m.isSealed) throw new StreamSealedException(s"$scope/$stream sealed during write")
      // Offsets were assigned against `meta`'s tails; if another writer
      // advanced them meanwhile, this commit would interleave offsets —
      // fail the CAS instead (caller re-runs the batch).
      val moved = open.exists(s => m.segment(s.segmentId).tailOffset != baseBySeg(s.segmentId))
      if (moved) throw new ConditionalCheckFailedException(
        s"$scope/$stream tails moved during write of $batchDir")
      val newTails = entries.groupBy(_.segmentId).map { case (sid, fs) => sid -> fs.map(_.endOffset).max }
      m.copy(
        files = m.files ++ entries,
        segments = m.segments.map(s =>
          s.copy(tailOffset = newTails.getOrElse(s.segmentId, s.tailOffset))),
        writerBatches = (for (w <- writerId; b <- batchId) yield m.writerBatches + (w -> b))
          .getOrElse(m.writerBatches))
    }
    updated.tailCut
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new Path(p).toUri.getPath else p

  // ------------------------------------------------------------------- read

  /** Bounded batch read between two cuts, default [head, tail). Planning
    * never lists directories — only manifest entries overlapping the cut
    * range are scanned, and the per-row offset predicate rides parquet
    * stats.
    */
  def readEvents(scope: String, stream: String,
                 from: StreamCut = StreamCut.Unbounded,
                 to: StreamCut = StreamCut.Unbounded): DataFrame = {
    val meta = catalog.getStream(scope, stream)
    val head = meta.headStreamCut
    val lo: Long => Long = sid => from.positions.getOrElse(sid, head.positions.getOrElse(sid, 0L))
    val hi: Long => Long = sid => to.positions.getOrElse(sid, Long.MaxValue)

    from.positions.foreach { case (sid, off) =>
      val h = head.positions.getOrElse(sid, 0L)
      if (off < h) throw new TruncatedDataException(
        s"segment $sid offset $off is below head cut $h (truncated)")
    }

    val files = meta.files.filter(f => f.endOffset > lo(f.segmentId) && f.startOffset < hi(f.segmentId))
    if (files.isEmpty) return emptyEvents()

    val cond = meta.segments.map(_.segmentId).map { sid =>
      col("segmentId") === sid && col("offset") >= lo(sid) && col("offset") < hi(sid)
    }.reduce(_ || _)

    spark.read.schema(GraftStreams.eventSchema)
      .parquet(files.map(_.path).distinct: _*)
      .filter(cond)
  }

  /** Ordered per-key consumption view: epoch-major, offset-minor — parents
    * before successors, the reader-group drain rule
    * (client/.../stream/impl/ReaderGroupState.java:966 SegmentCompleted).
    */
  def readEventsOrdered(scope: String, stream: String): DataFrame =
    readEvents(scope, stream)
      .withColumn("epoch", shiftrightunsigned($"segmentId", 32))
      .orderBy($"epoch", $"segmentId", $"offset")
      .drop("epoch")

  /** fetchEvent(EventPointer) (EventStreamReader.java:82). */
  def fetchEvent(scope: String, stream: String, p: EventPointer): DataFrame = {
    val meta = catalog.getStream(scope, stream)
    val files = meta.files.filter(f =>
      f.segmentId == p.segmentId && p.offset >= f.startOffset && p.offset < f.endOffset)
    if (files.isEmpty) return emptyEvents()
    spark.read.schema(GraftStreams.eventSchema).parquet(files.map(_.path): _*)
      .filter($"segmentId" === p.segmentId && $"offset" === p.offset)
  }

  private def emptyEvents(): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      GraftStreams.eventSchema)

  // --------------------------------------------------------- cut arithmetic

  /** getNextStreamCut(cut, approxRows) (BatchClientFactory.java:123):
    * advance ~approxRows split across open segments, clamped to tails.
    */
  def nextStreamCut(scope: String, stream: String, cut: StreamCut, approxRows: Long): StreamCut = {
    val meta = catalog.getStream(scope, stream)
    val per = math.max(1L, approxRows / math.max(1, meta.segments.size))
    StreamCut(meta.segments.map { s =>
      val cur = cut.positions.getOrElse(s.segmentId, s.startOffset)
      s.segmentId -> math.min(s.tailOffset, cur + per)
    }.toMap)
  }

  /** getDistanceBetweenTwoStreamCuts (StreamManager.java:261), in rows. */
  def distance(scope: String, stream: String, from: StreamCut, to: StreamCut): Long = {
    val meta = catalog.getStream(scope, stream)
    meta.segments.map { s =>
      val a = from.positions.getOrElse(s.segmentId, s.startOffset)
      val b = to.positions.getOrElse(s.segmentId, s.tailOffset)
      math.max(0L, b - a)
    }.sum
  }

  /** getSegmentsAtTime (Controller.java:388): first live offset whose
    * eventTime ≥ t per segment; file-level eventTime stats prune the scan.
    */
  def segmentsAtTime(scope: String, stream: String, t: Long): StreamCut = {
    val meta = catalog.getStream(scope, stream)
    val candidates = meta.files.filter(_.maxEventTime >= t)
    val found: Map[Long, Long] =
      if (candidates.isEmpty) Map.empty
      else spark.read.schema(GraftStreams.eventSchema)
        .parquet(candidates.map(_.path).distinct: _*)
        .filter($"eventTime" >= t)
        .groupBy($"segmentId").agg(min($"offset").as("pos"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    StreamCut(meta.segments.map(s =>
      s.segmentId -> found.getOrElse(s.segmentId, s.tailOffset)).toMap)
  }

  // ------------------------------------------------------------------ scale

  /** Manual scale to `newCount` evenly tiled segments: seal the current
    * epoch, open epoch+1 with lineage to the overlapping parents
    * (ScaleOperationTask.java:65-173). Readers keep per-key order because
    * consumption is epoch-major (parents drain first).
    */
  def scaleStream(scope: String, stream: String, newCount: Int): StreamMetadata =
    catalog.update(scope, stream) { m =>
      val now = System.currentTimeMillis()
      val epoch = m.currentEpoch.epoch + 1
      val olds = m.openSegments
      val news = RoutingKeyHash.evenRanges(newCount).zipWithIndex.map { case (r, i) =>
        SegmentRecord(SegmentId.pack(epoch, i), r.low, r.high, 0L, 0L, isSealed = false,
          parents = olds.filter(_.range.overlaps(r)).map(_.segmentId), createdAt = now)
      }
      m.copy(
        segments = m.segments.map(s => if (s.isSealed) s else s.copy(isSealed = true)) ++ news,
        epochs = m.epochs :+ EpochRecord(epoch, news.map(_.segmentId), now))
    }

  /** Segment lineage (getSuccessors, Controller.java:412). */
  def successors(scope: String, stream: String, segmentId: Long): Seq[Long] = {
    val meta = catalog.getStream(scope, stream)
    meta.segments.filter(_.parents.contains(segmentId)).map(_.segmentId)
  }
}

object GraftStreams {
  import org.apache.spark.sql.types._
  /** Canonical at-rest event schema (SURVEY §1.2). */
  val eventSchema: StructType = StructType(Seq(
    StructField("segmentId", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("routingKey", StringType, nullable = false),
    StructField("eventTime", LongType, nullable = false),
    StructField("processingTime", TimestampType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))
}
