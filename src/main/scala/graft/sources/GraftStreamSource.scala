package graft.sources

import graft.core._
import graft.storage.GraftStreams
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Structured Streaming source over a graft stream (SURVEY §2.8/§3.2): one
  * streaming query plays the role of a reader group — Spark's offset log
  * replaces reader-group checkpoints, task scheduling replaces segment
  * rebalancing (ReaderGroupStateManager), and restart-from-checkpoint is
  * resetReaderGroup. Offsets ARE StreamCuts (JSON), so positions
  * interoperate with the batch API.
  *
  * Each micro-batch plans only the manifest files overlapping
  * (lastCut, nextCut] and reads them through the normal vectorized parquet
  * path — no per-row custom reader, full codegen. `maxRowsPerTrigger`
  * throttles like the reference's read pacing (getNextStreamCut,
  * BatchClientFactory.java:123).
  *
  * Large (> MaxEventSize) events arrive as their individual chunk rows in
  * offset order (byte-stream-style delivery); the batch API
  * (GraftStreams.readEvents) is the reassembling surface.
  */
class GraftStreamSource(
    sqlContext: SQLContext,
    rootDir: String,
    scope: String,
    stream: String,
    startCut: Option[StreamCut],
    maxRowsPerTrigger: Option[Long],
    metadataPath: String) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private implicit val fmts: Formats = DefaultFormats
  private val spark: SparkSession = sqlContext.sparkSession
  private val g = new GraftStreams(spark, rootDir)

  override def schema: StructType = GraftStreams.eventSchema

  private def initialCut: StreamCut =
    startCut.getOrElse(g.catalog.getStream(scope, stream).headStreamCut)

  // The last announced cut must survive query restarts: with every batch
  // committed, Spark calls getOffset without any prior getBatch, and a
  // throttled cut recomputed from `initialCut` would announce an offset
  // BELOW the checkpointed one — re-delivering processed rows. So the
  // highest announced cut is persisted inside the source's slice of the
  // checkpoint (`metadataPath`), the same trick Spark's FileStreamSource
  // plays with its own metadata log. Absent marker = genuinely fresh query.
  private val persistPath: Option[Path] =
    Option(metadataPath).filter(_.nonEmpty).map(p => new Path(p, "graft-last-cut"))

  /** Highest cut handed to Spark so far (monotonic). */
  private var lastEnd: Option[StreamCut] = loadPersistedCut()

  private def hfs(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())

  private def loadPersistedCut(): Option[StreamCut] = persistPath.flatMap { p =>
    val fs = hfs(p)
    def readCut(path: Path): Option[StreamCut] =
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        try {
          val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
          Some(GraftSourceOffset.fromJson(txt))
        } catch { case _: Exception => None }
        finally in.close()
      }
    // persistCut writes tmp → delete main → rename. A crash after writing
    // the tmp but BEFORE deleting the main leaves both files, with the tmp
    // holding the newer cut; a crash between delete and rename leaves only
    // the tmp. Cuts only ever advance, so the element-wise MAX of whatever
    // parses is always the highest announced cut — never prefer one file.
    val main = readCut(p)
    val tmp = readCut(new Path(p.getParent, s"${p.getName}.tmp"))
    (main, tmp) match {
      case (Some(a), Some(b)) =>
        Some(StreamCut((a.positions.keySet ++ b.positions.keySet).map { sid =>
          sid -> math.max(a.positions.getOrElse(sid, 0L), b.positions.getOrElse(sid, 0L))
        }.toMap))
      case _ => main.orElse(tmp)
    }
  }

  private def persistCut(cut: StreamCut): Unit = persistPath.foreach { p =>
    val fs = hfs(p)
    val tmp = new Path(p.getParent, s"${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(GraftSourceOffset(cut).json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    fs.rename(tmp, p)
  }

  private def advanceLastEnd(cut: StreamCut): Unit = {
    val changed = !lastEnd.contains(cut)
    lastEnd = Some(cut)
    if (changed) persistCut(cut)
  }

  // Trigger.AvailableNow: drain up to the tail captured at query start,
  // in maxRowsPerTrigger pages, then let Spark terminate the query.
  private var availableNowCap: Option[StreamCut] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(g.catalog.getStream(scope, stream).tailCut)

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxRowsPerTrigger
      .map(n => org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(n))
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  /** Admission-control offset announcement (replaces getOffset: Spark
    * calls this for every trigger once SupportsAdmissionControl is
    * implemented). `start` is the checkpointed previous end offset — so
    * after a restart the throttled cut is computed from the real position
    * even before any getBatch, independent of the persisted marker.
    */
  override def latestOffset(start: org.apache.spark.sql.connector.read.streaming.Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val meta = g.catalog.getStream(scope, stream)
    val tail0 = meta.tailCut
    // under AvailableNow, never announce past the captured cap; segments
    // born after the capture only hold post-start data → bound 0 (the
    // monotonic merge below still keeps anything Spark already passed)
    val tail = availableNowCap.map { cap =>
      StreamCut(tail0.positions.map { case (sid, off) =>
        sid -> math.min(off, cap.positions.getOrElse(sid, 0L))
      })
    }.getOrElse(tail0)
    val checkpointed = Option(start).map(GraftSourceOffset.anyToCut)
    val from = (checkpointed, lastEnd) match {
      case (Some(c), Some(l)) => StreamCut((c.positions.keySet ++ l.positions.keySet).map { sid =>
        sid -> math.max(c.positions.getOrElse(sid, 0L), l.positions.getOrElse(sid, 0L))
      }.toMap)
      case (Some(c), None) => c
      case (None, Some(l)) => l
      case (None, None) => initialCut
    }
    val maxRows = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => Some(m.maxRows())
      case _ => maxRowsPerTrigger
    }
    val next = maxRows match {
      case None => tail
      case Some(max) =>
        val segs = meta.segments.map(_.segmentId)
        val per = math.max(1L, max / math.max(1, segs.size))
        StreamCut(segs.map { sid =>
          val cur = from.positions.getOrElse(sid, 0L)
          val t = tail.positions.getOrElse(sid, cur)
          sid -> math.min(t, cur + per)
        }.toMap)
    }
    // monotonic merge: never regress below what we already announced
    val merged = StreamCut((next.positions.keySet ++ from.positions.keySet).map { sid =>
      sid -> math.max(next.positions.getOrElse(sid, 0L), from.positions.getOrElse(sid, 0L))
    }.toMap)
    advanceLastEnd(merged)
    GraftSourceOffset(merged)
  }

  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    GraftSourceOffset(g.catalog.getStream(scope, stream).tailCut)

  override def getOffset: Option[OffsetV1] =
    // Unreachable: Spark matches SupportsAdmissionControl before the v1
    // Source case, so every trigger goes through latestOffset (which owns
    // throttling and the AvailableNow cap). Throw rather than return an
    // unthrottled tail — a silent fallback here would bypass pacing.
    throw new IllegalStateException(
      "graft-stream: getOffset must not be called — admission control " +
        "(latestOffset) owns offset announcement for this source")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(GraftSourceOffset.toCut).getOrElse(initialCut)
    val to = GraftSourceOffset.toCut(end)
    // keep the monotonic floor: getBatch can replay an OLD batch on
    // restart while the persisted cut is already further ahead
    val floor = lastEnd.getOrElse(to)
    advanceLastEnd(StreamCut((to.positions.keySet ++ floor.positions.keySet).map { sid =>
      sid -> math.max(to.positions.getOrElse(sid, 0L), floor.positions.getOrElse(sid, 0L))
    }.toMap))

    val meta = g.catalog.getStream(scope, stream)
    val lo: Long => Long = sid => from.positions.getOrElse(sid, 0L)
    val hi: Long => Long = sid => to.positions.getOrElse(sid, 0L)
    val files = meta.files.filter(f => f.endOffset > lo(f.segmentId) && f.startOffset < hi(f.segmentId))
    if (files.isEmpty) return StreamingShim.emptyStreamingBatch(spark, schema)

    val cond = files.map(_.segmentId).distinct.map { sid =>
      col("segmentId") === sid && col("offset") >= lo(sid) && col("offset") < hi(sid)
    }.reduce(_ || _)
    StreamingShim.streamingParquet(spark, schema, files.map(_.path).distinct)
      .filter(cond)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = StreamCut JSON ({"segmentId": offset, ...}). */
case class GraftSourceOffset(cut: StreamCut) extends OffsetV1 {
  override val json: String =
    Serialization.write(cut.positions.map { case (k, v) => k.toString -> v })(DefaultFormats)
}

object GraftStreamSource {
  /** Per-reader getCurrentTimeWindow (EventStreamReader.java:134 /
    * WatermarkReaderImpl.java:139-152): a streaming query's checkpointed
    * offset JSON IS its StreamCut, so its TimeWindow interpolates from
    * the emitted watermark history at that exact position.
    */
  def timeWindowFor(spark: SparkSession, rootDir: String, scope: String,
                    stream: String, offsetJson: String): (Option[Long], Option[Long]) =
    new GraftStreams(spark, rootDir)
      .timeWindowAt(scope, stream, GraftSourceOffset.fromJson(offsetJson))
}

object GraftSourceOffset {
  private implicit val fmts: Formats = DefaultFormats
  def fromJson(s: String): StreamCut =
    StreamCut(Serialization.read[Map[String, Long]](s).map { case (k, v) => k.toLong -> v })
  def toCut(o: OffsetV1): StreamCut = o match {
    case g: GraftSourceOffset => g.cut
    case s: SerializedOffset => fromJson(s.json)
    case other => fromJson(other.json)
  }
  /** Same, for the connector-level Offset the admission-control API uses. */
  def anyToCut(o: org.apache.spark.sql.connector.read.streaming.Offset): StreamCut = o match {
    case g: GraftSourceOffset => g.cut
    case other => fromJson(other.json)
  }
}

/** format("graft-stream") provider. Options: rootDir, scope, stream,
  * fromStreamCut (JSON | "head"), maxRowsPerTrigger.
  */
class GraftStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-stream"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String, parameters: Map[String, String]) =
    (shortName(), GraftStreams.eventSchema)

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    def req(k: String) = parameters.getOrElse(k,
      throw new IllegalArgumentException(s"graft-stream source requires option '$k'"))
    val startCut = parameters.get("fromStreamCut").filter(_ != "head")
      .map(GraftSourceOffset.fromJson)
    new GraftStreamSource(ctx, req("rootDir"), req("scope"), req("stream"),
      startCut, parameters.get("maxRowsPerTrigger").map(_.toLong), metadataPath)
  }
}
