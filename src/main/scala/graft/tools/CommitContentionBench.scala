package graft.tools

import graft.catalog.StreamCatalog
import graft.core.StreamConfig

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicLong

/** Multi-writer CAS contention on ONE stream's manifest chain — the
  * engine's hottest serialization point. Every commit to a stream goes
  * through one optimistic CAS (read tip → transform → exclusive-create
  * tip+1); the reference instead serializes appends per SEGMENT
  * (segmentstore/.../AppendProcessor.java:302) and orders txn commits
  * centrally (CommitRequestHandler.java:247), so a stream with many
  * writers is exactly where this design could retry-storm: each CAS
  * round has one winner, every loser re-reads and re-CASes, so total
  * work per commit is O(writers) and total retries O(commits × writers)
  * unless the backoff spreads the herd.
  *
  * Measures, per writer count N (each writer an independent
  * StreamCatalog instance on the same root): sustained commits/sec over
  * a fixed window, CAS losses per commit (retry amplification), and
  * p50/p99 per-commit latency. `StreamCatalog.update` already backs off
  * with jitter (sleep U(1, 20·min(attempt,8)) ms), so the expected shape
  * is throughput holding near the single-writer ceiling with
  * retries/commit well below N — this bench is the evidence, and the
  * regression canary if the backoff is ever touched.
  *
  * Note on writeEvents vs update: DATA-plane appends batch many events
  * into ONE manifest commit (files land first, one CAS publishes them),
  * so N here models N independent committing PROCESSES (writers,
  * txn commits, scale/seal/truncate control ops), not N events/sec.
  *
  * Usage: runMain graft.tools.CommitContentionBench [seconds] [n1 n2 ...]
  *        (default 8 s per point; writers 1 4 16 64)
  * One JSON line per writer count.
  */
object CommitContentionBench {
  def main(args: Array[String]): Unit = {
    val windowSec = args.headOption.map(_.toInt).getOrElse(8)
    val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16, 64)
    for (n <- counts) {
      val work = Files.createTempDirectory("graft-ccb").toString
      val boot = new StreamCatalog(work)
      boot.createScope("b")
      boot.createStream("b", "s", StreamConfig(initialSegments = 2))
      val commits = new AtomicLong(0L)
      val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val errors = new AtomicLong(0L)
      @volatile var stop = false
      val barrier = new CyclicBarrier(n + 1)
      val lossStart = StreamCatalog.casLosses.sum()
      val threads = (1 to n).map { i =>
        val t = new Thread(() => {
          val cat = new StreamCatalog(work) // per-writer instance: no shared tip cache
          barrier.await()
          while (!stop) {
            val t0 = System.nanoTime()
            try {
              cat.update("b", "s")(m => m.copy(tags = Set(s"w$i-${m.version}")))
              commits.incrementAndGet()
              latencies.add(System.nanoTime() - t0)
            } catch { case _: Throwable => errors.incrementAndGet() }
          }
        }, s"committer-$i")
        t.start(); t
      }
      barrier.await()
      val t0 = System.nanoTime()
      Thread.sleep(windowSec * 1000L)
      stop = true
      threads.foreach(_.join(30000))
      val wallSec = (System.nanoTime() - t0) / 1e9
      val losses = StreamCatalog.casLosses.sum() - lossStart
      val done = commits.get()
      val lat = latencies.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double): Double =
        if (lat.isEmpty) -1 else lat(math.min(lat.length - 1, (p * lat.length).toInt)) / 1e6
      println(f"""{"writers":$n,"window_sec":$wallSec%.1f,"commits":$done,""" +
        f""""commits_per_sec":${done / wallSec}%.1f,""" +
        f""""cas_losses":$losses,"retries_per_commit":${if (done == 0) -1.0 else losses.toDouble / done}%.2f,""" +
        f""""p50_ms":${pct(0.5)}%.1f,"p99_ms":${pct(0.99)}%.1f,"errors":${errors.get()}}""")
    }
  }
}
