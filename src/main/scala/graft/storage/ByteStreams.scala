package graft.storage

import graft.core.{GraftException, TruncatedDataException}
import graft.kv.StateSynchronizer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Raw byte streams (SURVEY §1.1 ByteStream;
  * client/.../byteStream/ByteStreamReader.java:34-149, ByteStreamWriter
  * .java:58-130): a single-segment stream of bytes with append, offset
  * reads, seek and truncate-before. Deliberately driver-side and
  * non-relational — the reference's byte-stream API is a raw
  * InputStream/OutputStream per segment, and the Spark-side analog for
  * bulk processing is `spark.read.format("binaryFile")` over the chunk
  * files.
  *
  * Layout: `<root>/<scope>/<name>/chunk-<startOffset>` data files plus a
  * CAS'd head/tail record (StateSynchronizer), so truncation and appends
  * are atomic and readers below the head fail like TruncatedDataException.
  */
class ByteStreams(rootDir: String, hadoopConf: Configuration = new Configuration()) {

  private def dir(scope: String, name: String) = new Path(new Path(rootDir), s"$scope/$name")
  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)
  private def state(scope: String, name: String) =
    new StateSynchronizer(rootDir, s"bytestream-$scope-$name", hadoopConf)

  private def meta(scope: String, name: String): (Long, Long) =
    state(scope, name).fetch()._2 match {
      case Some(s) =>
        val Array(h, t) = s.split(","); (h.toLong, t.toLong)
      case None => throw new GraftException(s"byte stream $scope/$name does not exist")
    }

  def create(scope: String, name: String): Unit = {
    val d = dir(scope, name)
    fs(d).mkdirs(d)
    state(scope, name).updateState {
      case Some(existing) => existing // idempotent create
      case None => "0,0"
    }
  }

  /** Append bytes; returns the offset the chunk starts at.
    *
    * Byte streams are single-writer, like the reference's
    * ByteStreamWriter (client/.../byteStream/ByteStreamWriter.java:58 —
    * "only one writer at a time"). If the state CAS loses (e.g. a
    * concurrent truncateBefore bumped the revision) the closure re-runs
    * at the same tail offset; any chunk already present there is
    * necessarily this writer's own leftover from the failed attempt — the
    * committed tail never covered it — so it is deleted and rewritten
    * rather than wedging every future append on createExclusive.
    */
  def append(scope: String, name: String, data: Array[Byte]): Long = {
    var start = -1L
    state(scope, name).updateState {
      case None => throw new GraftException(s"byte stream $scope/$name does not exist")
      case Some(s) =>
        val Array(h, t) = s.split(",")
        start = t.toLong
        val chunk = new Path(dir(scope, name), f"chunk-$start%016d")
        val f = fs(chunk)
        if (f.exists(chunk)) {
          // chunk-<start> with start == committed tail is uncommitted by
          // definition: safe to drop (our own orphan, single-writer). But
          // re-verify against the LATEST committed state first — if a
          // concurrent writer (contract violation) advanced the tail past
          // this chunk between our fetch and now, the chunk holds
          // committed bytes: keep the loud failure instead of silently
          // replacing them.
          val (_, freshTail) = meta(scope, name)
          if (freshTail != start) throw new GraftException(
            s"byte stream $scope/$name: chunk-$start exists but committed tail is " +
              s"$freshTail — concurrent writer violates the single-writer contract")
          f.delete(chunk, false)
        }
        val out = graft.catalog.CasFiles.createExclusive(f, chunk)
        try out.write(data) finally out.close()
        s"$h,${start + data.length}"
    }
    start
  }

  def head(scope: String, name: String): Long = meta(scope, name)._1
  def tail(scope: String, name: String): Long = meta(scope, name)._2

  /** Read `length` bytes starting at `offset` (short read at tail). */
  def read(scope: String, name: String, offset: Long, length: Int): Array[Byte] = {
    val (h, t) = meta(scope, name)
    if (offset < h) throw new TruncatedDataException(
      s"byte stream $scope/$name offset $offset below head $h")
    val end = math.min(t, offset + length)
    if (end <= offset) return Array.empty
    val d = dir(scope, name)
    val chunks = fs(d).listStatus(d).map(_.getPath)
      .filter(_.getName.startsWith("chunk-"))
      .map(p => (p.getName.stripPrefix("chunk-").toLong, p))
      .sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream()
    var expected = offset
    chunks.foreach { case (cStart, p) =>
      val cLen = fs(p).getFileStatus(p).getLen
      val cEnd = cStart + cLen
      if (cEnd > offset && cStart < end) {
        // a silent gap would concatenate bytes at the wrong offsets —
        // fail loudly instead (chunks must tile the committed range)
        if (cStart > expected) throw new GraftException(
          s"byte stream $scope/$name: missing chunk covering [$expected,$cStart)")
        val from = math.max(offset, cStart) - cStart
        val n = (math.min(end, cEnd) - math.max(offset, cStart)).toInt
        val in = fs(p).open(p)
        try {
          in.seek(from)
          val buf = new Array[Byte](n)
          in.readFully(buf)
          out.write(buf)
        } finally in.close()
        expected = math.min(end, cEnd)
      }
    }
    if (expected < end) throw new GraftException(
      s"byte stream $scope/$name: missing chunk covering [$expected,$end)")
    out.toByteArray
  }

  /** truncateDataBefore(offset): raise the head, drop fully-dead chunks. */
  def truncateBefore(scope: String, name: String, offset: Long): Unit = {
    state(scope, name).updateState {
      case None => throw new GraftException(s"byte stream $scope/$name does not exist")
      case Some(s) =>
        val Array(h, t) = s.split(",")
        val newHead = math.max(h.toLong, math.min(offset, t.toLong))
        s"$newHead,$t"
    }
    val (h, _) = meta(scope, name)
    val d = dir(scope, name)
    fs(d).listStatus(d).map(_.getPath).filter(_.getName.startsWith("chunk-")).foreach { p =>
      val cStart = p.getName.stripPrefix("chunk-").toLong
      val cLen = fs(p).getFileStatus(p).getLen
      if (cStart + cLen <= h) fs(p).delete(p, false)
    }
  }

  /** Integrity audit, O(#chunks) metadata: the committed range
    * [head, tail) must be tiled by chunks with no gaps; anything at or
    * past the tail is a crashed writer's uncommitted leftover (the
    * committed state never covered it); anything ending at or below the
    * head is a dead chunk an interrupted truncate failed to delete.
    * Readers are immune to all three by construction (read() stops at
    * the tail, starts at the head, and fails loudly on a gap) — fsck
    * exists so the leaks are NAMED and `sweep` can reclaim them.
    */
  def fsck(scope: String, name: String): Seq[String] = {
    val (h, t) = meta(scope, name)
    val d = dir(scope, name)
    val issues = Seq.newBuilder[String]
    val chunks = fs(d).listStatus(d).map(_.getPath)
      .filter(_.getName.startsWith("chunk-"))
      .map(p => (p.getName.stripPrefix("chunk-").toLong,
        fs(p).getFileStatus(p).getLen, p))
      .sortBy(_._1)
    var expected = h
    chunks.foreach { case (start, len, p) =>
      val end = start + len
      if (end <= h)
        issues += s"dead-chunk: $p ends at $end <= head $h (interrupted truncate sweep)"
      else if (start >= t)
        issues += s"uncommitted-chunk: $p starts at $start >= committed tail $t (crashed writer leftover)"
      else {
        if (start > expected) issues += s"missing-range: [$expected,$start) uncovered"
        expected = math.max(expected, math.min(end, t))
      }
    }
    if (expected < t) issues += s"missing-range: [$expected,$t) uncovered"
    issues.result()
  }

  /** Reclaim the leaks `fsck` reports: dead chunks below the head
    * (always safe — truncation committed) and uncommitted chunks at or
    * past the tail older than `graceMillis` (grace shields an in-flight
    * append between its chunk write and its tail CAS; deploy with
    * grace > the longest append, the same contract as the stream and KV
    * orphan sweeps). Returns reclaimed paths.
    */
  def sweep(scope: String, name: String, graceMillis: Long = 3600000L): Seq[String] = {
    val (h, t) = meta(scope, name)
    val d = dir(scope, name)
    val f = fs(d)
    val cutoff = System.currentTimeMillis() - graceMillis
    val victims = f.listStatus(d)
      .filter(_.getPath.getName.startsWith("chunk-"))
      .filter { s =>
        val start = s.getPath.getName.stripPrefix("chunk-").toLong
        val end = start + s.getLen
        end <= h || (start >= t && s.getModificationTime <= cutoff)
      }
      .map(_.getPath).toSeq
    // only successfully-deleted chunks are reported reclaimed; failures
    // stay on disk for the next sweep (and fsck) to see
    victims.filter(p => scala.util.Try(f.delete(p, false)).getOrElse(false))
      .map(_.toString).sorted
  }
}
