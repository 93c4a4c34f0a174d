package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets

object FloorChain {
  /** Cap on the probe-forward walk before one LIST page takes over —
    * same rationale as the manifest tip walks: each probe is one
    * exists() GET, so an instance many floor advances behind should pay
    * one listing, not a serial round trip per advance.
    */
  val ProbeCap: Int = 32

  private val SeqPattern = "floor-(\\d+)\\.json".r

  private[catalog] val Empty = ManifestFloor(0L, "")
}

/** CAS-appended monotone floor register — a manifest log's GC retention
  * floor, stored as a DENSE chain of immutable records
  * `floor-<seq>.json` (seq from 1) instead of a single rewritten file.
  *
  * Why a chain: a single `floor.json` must be REPLACED on every floor
  * advance, and replace is delete+rename on stores without atomic
  * rename-overwrite — a check-then-act with two windows: (a) a
  * missing-marker instant where a fully lag-blinded reader reads
  * floor=0 and the gc × list-lag double-blind recovery has no base
  * (the silent-empty-state hazard), and (b) across JVMs, a slower
  * small-cut GC could land its marker AFTER a larger-cut GC's deletes,
  * regressing the floor below committed deletes. With exclusive-create
  * records ([[CasFiles.createExclusive]] — the same CAS primitive the
  * manifest chain itself commits through) no record is ever rewritten
  * or deleted, so neither window exists: appending `floor-(S+1)` is
  * atomic arbitration, losers re-read the new tip and either retry
  * above it or discover they are superseded. Floors are monotone by
  * construction across any number of instances and JVMs — no lock, no
  * deployment-ownership contract, no reasoned-about window.
  *
  * Read protocol mirrors the manifest chain's: probe exact keys forward
  * from a cached seq (read-after-write consistent on object stores —
  * list lag can never hide an advance from the probe), capped, with one
  * LIST page past the cap. Records are never pruned: one tiny record
  * lands per floor ADVANCE (each ≥ one checkpoint interval), so the
  * chain grows like GC passes, not like commits, and `floor-1` is a
  * permanent exact-key anchor a cold reader finds without any LIST —
  * the strong base the double-blind recovery rests on.
  */
final class FloorChain(fsf: () => FileSystem, dir: Path) {
  import FloorChain._

  private implicit val fmts: Formats = DefaultFormats

  /** Newest chain record this instance has seen: (seq, record). Only a
    * hint: full reads re-read the record at the final seq, and a seq
    * that vanished (the whole chain deleted and recreated under the
    * same path) falls back to a cold probe from 1 — never to a wrong
    * answer.
    */
  @volatile private var tip: (Long, ManifestFloor) = (0L, Empty)

  private def path(k: Long) = new Path(dir, f"floor-$k%012d.json")

  /** Records are immutable once written, so an unreadable record can
    * only be the chain TIP mid-write (created-but-unwritten by a racing
    * [[advance]]) — brief retry, then "not committed yet": the previous
    * record stays authoritative until the write lands (floors only
    * grow, so reading one advance late is always safe).
    */
  private def readRecord(k: Long): Option[ManifestFloor] = {
    val fs = fsf()
    for (_ <- 1 to 10) {
      try {
        val in = fs.open(path(k))
        try return Some(Serialization.read[ManifestFloor](
          new java.io.InputStreamReader(in, StandardCharsets.UTF_8)))
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => return None
        case _: Exception => Thread.sleep(5)
      }
    }
    None
  }

  private def listMaxSeq(fs: FileSystem): Long =
    try fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
      case SeqPattern(d) => d.toLong
    }.foldLeft(0L)(math.max)
    catch { case _: java.io.FileNotFoundException => 0L }

  /** Fast floor read for hot per-read gates (the getStream / latest
    * probe walks): one exists() miss when the chain has not advanced
    * past this instance's cache, zero record reads. Skips re-verifying
    * the cached record, so after a delete+recreate of the same path by
    * ANOTHER instance the value can be stale until the next full read —
    * callers' own identity validation (v0 incarnation checks, LIST-path
    * fallbacks) bounds that to a loud error or a fallback, never a
    * silent answer (the same trust model as the manifest tip caches).
    */
  def floorFast(): Long = readTip(verifyCache = false)._2.floor

  /** Authoritative floor read: re-reads the record at the resolved tip
    * seq, probes the chain forward with exact-key GETs (list lag can
    * never hide an advance), one LIST page past the cap.
    */
  def read(): ManifestFloor = readTip(verifyCache = true)._2

  def readWithSeq(): (Long, ManifestFloor) = readTip(verifyCache = true)

  private def readTip(verifyCache: Boolean): (Long, ManifestFloor) = {
    val fs = fsf()
    val (cachedSeq, cachedRec) = tip

    def resolveFrom(start: Long, allowRestart: Boolean): (Long, ManifestFloor) = {
      var seq = start
      var rounds = 0
      var walked = true
      while (walked) {
        var probes = 0
        while (probes < ProbeCap && fs.exists(path(seq + 1))) { seq += 1; probes += 1 }
        walked = false
        if (probes >= ProbeCap && rounds < 3) {
          // far behind: jump to the listed max, then resume probing PAST
          // it — list lag costs extra probes, never a stale answer
          val m = listMaxSeq(fs)
          if (m > seq) seq = m
          rounds += 1
          walked = true
        }
      }
      if (seq == 0L) (0L, Empty)
      else if (!verifyCache && seq == cachedSeq) (cachedSeq, cachedRec)
      else readRecord(seq) match {
        case Some(r) => (seq, r)
        case None if seq > math.max(start, 1L) =>
          // torn tip: the previous record is the floor until the write
          // lands (it is immutable and was readable to the prober)
          readRecord(seq - 1).map((seq - 1, _)).getOrElse((0L, Empty))
        case None if allowRestart && start > 0L =>
          // the cached seq itself is gone: the chain was deleted (and
          // possibly recreated) under this path — cold probe from 1
          resolveFrom(0L, allowRestart = false)
        case None => (0L, Empty)
      }
    }

    val out = resolveFrom(cachedSeq, allowRestart = true)
    if (out._1 > 0L) tip = out
    out
  }

  /** CAS-append `floor` if it advances the chain. Returns true iff THIS
    * call wrote the record; false = the chain is already at or above
    * `floor` (supersession — the concurrent winner owns the deletes, by
    * the same contract as the old pre-write re-check, now atomic).
    */
  def advance(floor: Long, incarnation: String): Boolean = {
    require(floor > 0L, s"floor must be positive, got $floor")
    val fs = fsf()
    var (seq, cur) = readTip(verifyCache = true)
    while (cur.floor < floor) {
      try {
        val out = CasFiles.createExclusive(fs, path(seq + 1))
        val rec = ManifestFloor(floor, incarnation)
        try out.write(Serialization.write(rec).getBytes(StandardCharsets.UTF_8))
        finally out.close()
        tip = (seq + 1, rec)
        return true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          // lost seq+1 to a concurrent gc: re-read and re-decide. The
          // winner's record may still be torn (created, bytes not yet
          // visible) — readTip reads that as not-yet-committed, so we
          // pause briefly and lose again until its write lands (ms).
          Thread.sleep(2)
          val again = readTip(verifyCache = true)
          seq = again._1; cur = again._2
      }
    }
    false
  }

  /** Drop the in-memory hint (the backing chain was deleted). */
  def invalidate(): Unit = tip = (0L, Empty)
}
