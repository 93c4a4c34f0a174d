package graft.tools

import graft.catalog.StreamCatalog
import graft.core.StreamConfig

import java.nio.file.Files

/** Version-chain growth vs manifest-log retention — the other axis of
  * control-plane scale next to ManifestBench's live-FILE axis: here the
  * file list stays tiny and the VERSION COUNT grows (a stream committing
  * once a second accumulates 86 400 manifest objects per day; a year is
  * 3×10^7 — the `_meta/` LIST itself becomes the bottleneck). Measures,
  * per version count N: cold read (fresh catalog: LIST + base + ≤interval
  * deltas), warm read, commit, and the `_meta` object count — then runs
  * `gcManifests(keep = 64)` and measures the same again. On a real object
  * store LIST pages at ~1000 keys/call, so the object count is the
  * dominant term the local-FS wall only hints at.
  *
  * Usage: runMain graft.tools.VersionsBench [n1 n2 ...]   (default 100 1000 10000)
  * One JSON line per size.
  */
object VersionsBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 1000, 10000)
    for (n <- sizes) {
      val work = Files.createTempDirectory("graft-vb").toString
      val cat = new StreamCatalog(work)
      cat.createScope("b")
      cat.createStream("b", "s", StreamConfig(initialSegments = 2))
      // small-field commits: the chain gets DEEP while every record (and
      // every checkpoint) stays tiny, isolating version-count cost
      for (i <- 1 to n)
        cat.update("b", "s")(m => m.copy(tags = Set(s"t$i")))
      cat.flushCheckpoints()
      def metaObjects: Int =
        new java.io.File(s"$work/b/s/_meta").listFiles().count(!_.getName.startsWith("."))
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      // sub-ms figures are JIT/scheduler-noisy in one shot (r13 saw the
      // same build swing 1.0-2.4 ms across runs) — report the MEDIAN of
      // 9 for the hot-path numbers; cold/stale stay single-shot (each
      // needs virgin instance state, and they are 100x the noise floor)
      def med9(f: => Unit): Double = {
        val xs = Array.fill(9) { timed(f) }.sorted
        xs(4)
      }
      def coldRead: Double = {
        val c2 = new StreamCatalog(work)
        timed(c2.getStream("b", "s"): Unit)
      }
      val (objs0, cold0, warm0) = (metaObjects, coldRead, med9(cat.getStream("b", "s"): Unit))
      val commit0 = med9(cat.update("b", "s")(m => m.copy(tags = Set("x"))): Unit)
      // STALE-CACHE read: an instance whose cached tip is the WHOLE CHAIN
      // behind (primed at v0, tip now n) — the capped probe walk must
      // abandon to the LIST path instead of paying one exists() GET per
      // missed version (one probe per version inverts the warm-path win:
      // ~n sequential round trips on an object store)
      val staleCat = {
        val c = new StreamCatalog(work)
        c.getStreamAt("b", "s", 0L): Unit // caches v0 as its tip
        c
      }
      val stale0 = timed(staleCat.getStream("b", "s"): Unit)
      // TIMESTAMP AS OF at half the chain: skew-banded bisection vs the
      // old full-chain scan (O(n) record GETs at depth n)
      val tMid = {
        val half = cat.getStreamAt("b", "s", n / 2L)
        if (half.committedAt != 0L) half.committedAt else System.currentTimeMillis()
      }
      val resolve0 = med9(cat.versionAtTime("b", "s", tMid): Unit)
      val retired = cat.gcManifests("b", "s", keepVersions = 64).size
      val (objs1, cold1, warm1) = (metaObjects, coldRead, med9(cat.getStream("b", "s"): Unit))
      val commit1 = med9(cat.update("b", "s")(m => m.copy(tags = Set("y"))): Unit)
      val resolve1 = med9(
        try cat.versionAtTime("b", "s", System.currentTimeMillis()): Unit
        catch { case _: graft.core.TruncatedDataException => () })
      def f(v: Double) = f"$v%.2f"
      println(s"""{"versions":$n,"meta_objects":$objs0,"cold_read_ms":${f(cold0)},""" +
        s""""warm_read_ms":${f(warm0)},"commit_ms":${f(commit0)},""" +
        s""""stale_cache_read_ms":${f(stale0)},"time_resolve_ms":${f(resolve0)},"gc_retired":$retired,""" +
        s""""meta_objects_after_gc":$objs1,"cold_read_ms_after_gc":${f(cold1)},""" +
        s""""warm_read_ms_after_gc":${f(warm1)},"commit_ms_after_gc":${f(commit1)},""" +
        s""""time_resolve_ms_after_gc":${f(resolve1)}}""")
      def rm(p: java.io.File): Unit = {
        val kids = p.listFiles(); if (kids != null) kids.foreach(rm); p.delete(): Unit
      }
      rm(new java.io.File(work))
    }
  }
}
