package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets

object FloorChain {
  /** Cap on any forward exists()-probe walk before one LIST page takes
    * over — same rationale as the manifest tip walks: an instance many
    * floor advances behind should pay one listing, not a serial round
    * trip per advance.
    */
  val ProbeCap: Int = 32

  /** Retained chain window: the winner of an advance prunes records
    * more than this many seqs behind its own, EXCEPT `floor-1` (the
    * permanent anchor). Without pruning the chain grows one object per
    * advancing GC pass — minutely maintenance against a busy stream is
    * ~5×10^5 objects/year back in the `_meta` listing, the disease
    * manifest GC exists to cure. 256 records keeps the on-disk set
    * trivial (a few hours of history at even a minutely cadence) while
    * guaranteeing the LIST fallback a wide runway of old-enough-to-be-
    * list-visible records: a lag-blinded reader only needs the listing
    * to surface ONE suffix record — the probe-forward walk covers the
    * rest with exact keys — so the window must span far more wall time
    * than any list-lag horizon even under pathological advance rates
    * (GcRaceSpec advances every few ms against a 150 ms lag).
    */
  val KeepRecords: Int = 256

  private val SeqPattern = "floor-(\\d+)\\.json".r

  private[catalog] val Empty = ManifestFloor(0L, "")
}

/** CAS-appended monotone floor register — a manifest log's GC retention
  * floor, stored as a chain of immutable records `floor-<seq>.json`
  * (seq from 1) instead of a single rewritten file.
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
  * manifest chain itself commits through) no record is ever rewritten,
  * so neither window exists: appending `floor-(S+1)` is atomic
  * arbitration, losers re-read the new tip and either retry above it
  * or discover they are superseded. Floors are monotone by
  * construction across any number of instances and JVMs — no lock, no
  * deployment-ownership contract, no reasoned-about window.
  *
  * On-disk shape: `{1} ∪ (tip − KeepRecords, tip]` — `floor-1` is the
  * PERMANENT ANCHOR (one exact-key GET, read-after-write consistent,
  * that list lag can never hide: its presence is strong proof the
  * chain was ever GC'd, which is what makes the double-blind recovery
  * base unlosable), and the retained window is a CONTIGUOUS SUFFIX
  * (pruning deletes ascending, so even a crashed prune leaves a
  * contiguous suffix — the invariant every probe walk relies on:
  * inside the suffix, a miss at seq+1 means seq IS the tip).
  *
  * Read protocol: probe exact keys forward from a cached seq; a walk
  * that sees no advance re-verifies its own record — present above the
  * anchor means genuinely at the tip (suffix contiguity), pruned-under
  * or sitting on the anchor means one LIST page resolves the retained
  * window, with a further probe-forward absorbing list lag. A reader
  * blinded by BOTH a pruned gap and total list lag still returns a
  * POSITIVE floor from the anchor — stale-low at worst, which every
  * consumer turns into a retry or a loud error, never a silent empty
  * answer (the one outcome the old rename-replace window allowed).
  */
final class FloorChain(fsf: () => FileSystem, dir: Path) {
  import FloorChain._

  private implicit val fmts: Formats = DefaultFormats

  /** Newest chain record this instance has seen: (seq, record). Only a
    * hint — full reads re-verify, and every degraded path falls back to
    * the LIST or the anchor, never to a silently wrong answer.
    */
  @volatile private var tip: (Long, ManifestFloor) = (0L, Empty)

  /** One-shot memo that the never-GC'd conclusion (anchor absent AND
    * nothing listed) was LIST-verified — the cold-read corruption check
    * below must not turn every floor read on a never-GC'd stream into a
    * directory listing. Safe to latch: the anchor is the FIRST record
    * any advance ever writes, so a later legitimate GC is discovered by
    * the `readRecord(1)` hit itself, never by re-listing.
    */
  @volatile private var neverGcVerified = false

  private def path(k: Long) = new Path(dir, f"floor-$k%012d.json")

  /** Records are immutable once written, so an unreadable-but-present
    * record can only be the chain TIP mid-write (created-but-unwritten
    * by a racing [[advance]]) — brief retry, then "not committed yet":
    * the previous record stays authoritative until the write lands
    * (floors only grow, so reading one advance late is always safe).
    *
    * `strict` (the ANCHOR reads whose None is treated as proof of
    * absence): only FileNotFoundException is actual proof — a
    * PERSISTENT IO error rethrows after the retries instead of reading
    * as absence, because "anchor absent" downstream means "never GC'd,
    * floor 0", and turning a failing store into that silently disables
    * the gc × list-lag recovery base (the exact silent-empty hazard
    * class the chain exists to close). Non-anchor reads keep
    * retry-then-None: there None only ever steps a walk back one
    * record or defers to the listing, never concludes absence.
    */
  private def readRecord(k: Long, strict: Boolean = false): Option[ManifestFloor] = {
    val fs = fsf()
    var lastErr: Exception = null
    for (_ <- 1 to 10) {
      try {
        val in = fs.open(path(k))
        try return Some(Serialization.read[ManifestFloor](
          new java.io.InputStreamReader(in, StandardCharsets.UTF_8)))
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => return None
        case e: Exception => lastErr = e; Thread.sleep(5)
      }
    }
    if (strict && lastErr != null) throw lastErr
    None
  }

  private def listMaxSeq(fs: FileSystem): Long =
    try fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
      case SeqPattern(d) => d.toLong
    }.foldLeft(0L)(math.max)
    catch { case _: java.io.FileNotFoundException => 0L }

  /** Exists-walk forward from `seq` (dense inside the retained suffix),
    * capped; past the cap one LIST page re-seeds the walk. Returns the
    * last seq whose record file exists.
    */
  private def walkForward(fs: FileSystem, start: Long): Long = {
    var seq = start
    var rounds = 0
    var walked = true
    while (walked) {
      var probes = 0
      while (probes < ProbeCap && fs.exists(path(seq + 1))) { seq += 1; probes += 1 }
      walked = false
      if (probes >= ProbeCap && rounds < 3) {
        val m = listMaxSeq(fs)
        if (m > seq) seq = m
        rounds += 1
        walked = true
      }
    }
    seq
  }

  /** Read the record at `seq`, absorbing a torn tip by stepping back one
    * (the predecessor is inside the retained suffix and immutable).
    */
  private def settle(seq: Long, floorOf: Long => Option[ManifestFloor]): Option[(Long, ManifestFloor)] =
    floorOf(seq).map((seq, _)).orElse(
      if (seq - 1 >= 1) floorOf(seq - 1).map((seq - 1, _)) else None)

  /** One LIST page resolves the retained window, then a probe-forward
    * absorbs list lag; `anchor` is the fallback when the listing is
    * fully blind (stale-low but positive — loud-bounded downstream).
    */
  private def listResolve(fs: FileSystem, anchor: Option[(Long, ManifestFloor)]): (Long, ManifestFloor) = {
    val m = listMaxSeq(fs)
    if (m > 0L) {
      val w = walkForward(fs, m)
      settle(w, readRecord(_)).orElse(anchor).getOrElse((0L, Empty))
    } else anchor.getOrElse {
      // LIST blind or empty: the anchor's exact key is the authority
      readRecord(1L, strict = true).map((1L, _)).getOrElse((0L, Empty))
    }
  }

  /** Corruption audit (Fsck's `gc-floor-anchor-lost`): suffix records
    * are listable while the PERMANENT anchor misses its exact-key read.
    * [[prune]] never deletes seq 1 and exact-key reads are
    * read-after-write consistent, so this state is unreachable through
    * the chain's own protocol — only hand surgery or storage corruption
    * produces it, and a fully lag-blinded cold reader in it would
    * conclude "never GC'd" (floor 0), disengaging the gc × list-lag
    * recovery base. The listing is consulted FIRST: lag hides records,
    * never fabricates them, so anything listed exists, and the anchor
    * re-read afterwards cannot race a first advance into a false
    * positive (the anchor IS the first record ever written).
    */
  def anchorLost(): Boolean = {
    val fs = fsf()
    listMaxSeq(fs) > 0L && readRecord(1L).isEmpty
  }

  /** One exact-key probe of the permanent anchor — ops introspection
    * (the `describe_retention` procedure). False on a never-GC'd chain.
    */
  def anchorPresent(): Boolean = readRecord(1L).isDefined

  /** Fast floor read for hot per-read gates (the getStream / latest
    * probe walks): one exists() miss when the chain has not advanced
    * past this instance's cache, zero record reads. Skips the
    * re-verification, so after a delete+recreate or a prune-under by
    * ANOTHER instance the value can be stale until the next full read —
    * callers' own identity validation (v0 incarnation checks, LIST-path
    * fallbacks) bounds that to a loud error or a fallback, never a
    * silent answer (the same trust model as the manifest tip caches).
    */
  def floorFast(): Long = readTip(verifyCache = false)._2.floor

  /** Authoritative floor read: probes forward, re-verifies the landing
    * record, and resolves pruned gaps through one LIST page.
    */
  def read(): ManifestFloor = readTip(verifyCache = true)._2

  def readWithSeq(): (Long, ManifestFloor) = readTip(verifyCache = true)

  private def readTip(verifyCache: Boolean): (Long, ManifestFloor) = {
    val fs = fsf()
    val (cs, cr) = tip
    val out: (Long, ManifestFloor) =
      if (cs > 0L) {
        val w = walkForward(fs, cs)
        if (w > cs) settle(w, readRecord(_)).getOrElse(listResolve(fs, None))
        else if (!verifyCache) (cs, cr)
        else readRecord(cs) match {
          // suffix contiguity: a live record above the anchor with no
          // successor IS the tip; the anchor itself may sit below a
          // pruned gap, so it resolves through the listing
          case Some(r) if cs > 1L => (cs, r)
          case Some(r)            => listResolve(fs, Some((1L, r)))
          // pruned under us (we idled past KeepRecords advances) or the
          // chain was deleted/recreated: the listing is the authority
          case None               => listResolve(fs, None)
        }
      } else readRecord(1L, strict = true) match {
        case None =>
          // Exact-key absence of the anchor is strong proof on a store
          // honoring the chain's protocol — but the protocol cannot rule
          // out hand surgery/corruption losing the anchor WHILE suffix
          // records survive, and concluding "never GC'd" there serves
          // floor 0 to a reader that should see a positive floor. A COLD
          // read (no cached seq) therefore pays one LIST page before
          // concluding: suffix present → recover a POSITIVE floor from
          // it (stale-low at worst — loud-bounded downstream; Fsck
          // classifies the state as gc-floor-anchor-lost); nothing
          // listed → memoize so steady-state reads on never-GC'd
          // streams stay one exact-key miss, never a listing.
          if (neverGcVerified) (0L, Empty)
          else {
            val m = listMaxSeq(fs)
            if (m > 0L) settle(walkForward(fs, m), readRecord(_)).getOrElse((0L, Empty))
            else { neverGcVerified = true; (0L, Empty) }
          }
        case Some(r1) =>
          // the chain may be pruned directly above the anchor: walk what
          // is dense, then let one LIST page reveal a retained window
          // beyond any gap (probe-forward absorbs lag past its max)
          val w = walkForward(fs, 1L)
          val dense = settle(w, readRecord(_)).getOrElse((1L, r1))
          val m = listMaxSeq(fs)
          if (m > dense._1) listResolve(fs, Some(dense)) else dense
      }
    if (out._1 > 0L) tip = out
    out
  }

  /** CAS-append `floor` if it advances the chain. Returns true iff THIS
    * call wrote the record (false = already at/above `floor`:
    * supersession — the concurrent winner owns the deletes, by the same
    * contract as the old pre-write re-check, now atomic). The winner
    * prunes records behind the retained window before returning.
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
        prune(fs, seq + 1)
        return true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          // lost seq+1 to a concurrent gc: re-read and re-decide. The
          // winner's record may still be torn (created, bytes not yet
          // visible): readTip reads that as not-yet-committed, so we
          // pause briefly and lose again until its write lands (ms).
          Thread.sleep(2)
          val again = readTip(verifyCache = true)
          seq = again._1; cur = again._2
      }
    }
    false
  }

  /** Retire records outside `{1} ∪ (tipSeq − KeepRecords, tipSeq]`.
    * Walk DOWN from the window edge to the first already-missing seq
    * (everything below was pruned by earlier passes — cost is one miss
    * plus one probe per record actually deleted), then delete ASCENDING
    * so a crash mid-prune always leaves the retained set a contiguous
    * suffix plus the anchor — the invariant every probe walk relies on.
    */
  private def prune(fs: FileSystem, tipSeq: Long): Unit = {
    val cut = tipSeq - KeepRecords
    if (cut < 2L) return
    try {
      var lo = cut
      while (lo - 1 >= 2L && fs.exists(path(lo - 1))) lo -= 1 // never seq 1: the anchor is permanent
      var k = lo
      while (k <= cut) {
        try { fs.delete(path(k), false); () } catch { case _: Exception => () }
        k += 1
      }
    } catch { case _: Exception => () } // best effort: the next pass finishes
  }

  /** Drop the in-memory hint (the backing chain was deleted). */
  def invalidate(): Unit = { tip = (0L, Empty); neverGcVerified = false }
}
