package graft.storage

import graft.core.GraftException
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Kill-point crash injection over the byte-stream chunk/CAS seams —
  * completing the crash matrix across all three storage primitives
  * (event streams, KV tables, byte streams). Invariants per kill-point:
  * (a) reads serve exactly the committed [head, tail) range, (b)
  * `fsck` names the leak, (c) `sweep` reclaims it (grace-shielded for
  * tail orphans), (d) the interrupted operation reruns exactly-once.
  * Reference analog: ByteStreamWriter's single-writer append contract
  * (client/.../byteStream/ByteStreamWriter.java:58) over conditional
  * segment appends.
  */
class ByteStreamKillPointsSpec extends AnyFunSuite {

  private def fresh(): (ByteStreams, String) = {
    val root = Files.createTempDirectory("graft-bskill").toString
    val bs = new ByteStreams(root)
    bs.create("s", "b")
    (bs, root)
  }

  private def injectChunk(root: String, start: Long, bytes: Array[Byte]): String = {
    val p = Paths.get(root, "s", "b", f"chunk-$start%016d")
    Files.write(p, bytes)
    p.toString
  }

  test("kill between chunk write and tail CAS: invisible, reported, reclaimed, rerun exactly-once") {
    val (bs, root) = fresh()
    bs.append("s", "b", "hello".getBytes)
    val tail = bs.tail("s", "b")
    injectChunk(root, tail, "GHOST".getBytes) // writer died before its CAS

    // (a) committed range only: the orphan past the tail is unreadable
    assert(new String(bs.read("s", "b", 0, 100)) == "hello")
    assert(bs.tail("s", "b") == tail)
    // (b) named
    val issues = bs.fsck("s", "b")
    assert(issues.size == 1 && issues.head.startsWith("uncommitted-chunk:"), issues.toString)
    // grace shields a possibly in-flight writer...
    assert(bs.sweep("s", "b", graceMillis = 3600000L).isEmpty)
    // ...zero grace reclaims the crashed one
    assert(bs.sweep("s", "b", graceMillis = 0L).size == 1)
    assert(bs.fsck("s", "b").isEmpty)
    // (d) the retried append lands at the same offset with the real bytes
    val off = bs.append("s", "b", " world".getBytes)
    assert(off == tail)
    assert(new String(bs.read("s", "b", 0, 100)) == "hello world")
  }

  test("writer retry over its own pre-CAS leftover self-heals without a sweep") {
    val (bs, root) = fresh()
    bs.append("s", "b", "abc".getBytes)
    injectChunk(root, 3L, "ZZZZZ".getBytes) // died mid-append at tail 3
    // the reference behavior: the single writer retries and replaces its
    // own uncommitted chunk in place
    val off = bs.append("s", "b", "def".getBytes)
    assert(off == 3L)
    assert(new String(bs.read("s", "b", 0, 10)) == "abcdef")
    assert(bs.fsck("s", "b").isEmpty)
  }

  test("kill between truncate CAS and chunk deletion: dead chunk reported and reclaimed") {
    val (bs, root) = fresh()
    bs.append("s", "b", "aaaa".getBytes)
    bs.append("s", "b", "bbbb".getBytes)
    bs.truncateBefore("s", "b", 4L) // deletes chunk-0...
    injectChunk(root, 0L, "aaaa".getBytes) // ...but the crash resurrected the pre-delete state

    assert(new String(bs.read("s", "b", 4, 10)) == "bbbb")
    assertThrows[graft.core.TruncatedDataException](bs.read("s", "b", 0, 4))
    val issues = bs.fsck("s", "b")
    assert(issues.size == 1 && issues.head.startsWith("dead-chunk:"), issues.toString)
    // dead chunks are unconditionally safe to reclaim — no grace needed
    assert(bs.sweep("s", "b", graceMillis = 3600000L).size == 1)
    assert(bs.fsck("s", "b").isEmpty)
    // truncation rerun is idempotent
    bs.truncateBefore("s", "b", 4L)
    assert(bs.head("s", "b") == 4L)
  }

  test("storage damage (missing chunk inside the committed range) is named; reads fail loudly") {
    val (bs, root) = fresh()
    bs.append("s", "b", "aaaa".getBytes)
    bs.append("s", "b", "bbbb".getBytes)
    Files.delete(Paths.get(root, "s", "b", f"chunk-${0L}%016d"))
    val issues = bs.fsck("s", "b")
    assert(issues.size == 1 && issues.head.startsWith("missing-range: [0,4)"), issues.toString)
    assertThrows[GraftException](bs.read("s", "b", 0, 8))
    // the undamaged suffix still reads
    assert(new String(bs.read("s", "b", 4, 4)) == "bbbb")
  }
}
