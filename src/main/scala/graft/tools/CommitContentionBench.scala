package graft.tools

import graft.catalog.StreamCatalog
import graft.core.StreamConfig
import graft.storage.LaggedObjectStoreFs

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
  * Measures, per (writer count N, simulated RTT): sustained commits/sec
  * over a fixed window, CAS losses per commit (retry amplification), and
  * p50/p99 per-commit latency. Each writer is an independent
  * StreamCatalog instance on the same root (no shared tip cache).
  *
  * TWO storage regimes, because the numbers differ by nature:
  *  - rtt=0 → local FS (kernel-atomic create, ~0.5 ms per CAS round):
  *    the backoff-tuning regime — r12 found the old U(1,20·attempt) ms
  *    backoff starving here and sized the full-jitter replacement.
  *  - rtt>0 → the `oscas://` object-store contract with
  *    [[LaggedObjectStoreFs.opLatencyMs]] charged per metadata op: the
  *    DEPLOYMENT regime. A commit is a handful of serial round trips
  *    (tip probe, record read, conditional put), so the per-stream
  *    ceiling is RTT-BOUND — the bench's job is to show throughput
  *    tracking ~1/RTT with retries/commit still O(1) and no backoff
  *    thrash (the sleep curve was sized against a 0.5 ms CAS; at 30 ms
  *    the natural rate-limiting of the round trips themselves
  *    dominates). The reference's analog ceiling is per-SEGMENT, not
  *    per-stream (appends serialize in AppendProcessor); data-plane
  *    events ride writeEvents batching, so N here models N committing
  *    PROCESSES (txn commits, scale/seal/truncate, independent
  *    writers), not N events/sec.
  *
  * TWO writer topologies, because the r15 group commit makes them
  * different machines:
  *  - mode `percat` (default, the r14-comparable curve): each writer is
  *    an independent StreamCatalog instance — the model of N committing
  *    PROCESSES. They contend on the raw CAS; per-stream throughput is
  *    the RTT-bound manifest-commit ceiling, writer-count-invariant.
  *  - mode `shared`: all writers share ONE catalog instance — the model
  *    of N committing THREADS in one JVM (a Spark driver's concurrent
  *    txn commits, the state-synchronizer's callers). These combine
  *    through [[graft.catalog.CommitCombiner]]: one leader CASes the
  *    whole queue as a single manifest version, so user-visible
  *    commits/s ≈ ceiling × batch size (≈ N at saturation) and BILLED
  *    store ops per user commit FALL ~1/N instead of growing O(N).
  *
  * Usage: runMain graft.tools.CommitContentionBench
  *          [seconds] [writersCsv] [rttMsCsv] [modeCsv]
  *        (defaults: 8 s per point; writers 1,4,16,64; rtt 0; percat)
  * One JSON line per (mode, writers, rtt) point.
  */
object CommitContentionBench {
  def main(args: Array[String]): Unit = {
    val windowSec = args.headOption.map(_.toInt).getOrElse(8)
    val counts = args.lift(1).map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16, 64))
    val rtts = args.lift(2).map(_.split(',').map(_.trim.toLong).toSeq)
      .getOrElse(Seq(0L))
    val modes = args.lift(3).map(_.split(',').map(_.trim).toSeq)
      .getOrElse(Seq("percat"))
    for (mode <- modes; rtt <- rtts; n <- counts) {
      val local = Files.createTempDirectory("graft-ccb").toString
      val conf = new org.apache.hadoop.conf.Configuration()
      val work =
        if (rtt <= 0L) local
        else {
          conf.set("fs.oscas.impl", classOf[LaggedObjectStoreFs].getName)
          "oscas://" + local
        }
      LaggedObjectStoreFs.opLatencyMs = math.max(0L, rtt)
      try {
        val boot = new StreamCatalog(work, conf)
        boot.createScope("b")
        boot.createStream("b", "s", StreamConfig(initialSegments = 2))
        val commits = new AtomicLong(0L)
        val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val errors = new AtomicLong(0L)
        @volatile var stop = false
        val barrier = new CyclicBarrier(n + 1)
        val lossStart = StreamCatalog.casLosses.sum()
        val opsStart = LaggedObjectStoreFs.opsCharged.sum()
        // shared mode: every thread commits through ONE instance (the
        // group-commit funnel); percat: per-writer instances, raw CAS
        val sharedCat = if (mode == "shared") new StreamCatalog(work, conf) else null
        val threads = (1 to n).map { i =>
          val t = new Thread(() => {
            val cat = if (sharedCat != null) sharedCat
                      else new StreamCatalog(work, conf) // per-writer instance: no shared tip cache
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
        // rate over the STEADY window only: threads still asleep in a
        // backoff (or mid-commit) drain after stop, and counting their
        // late commits against the longer wall under-reports the rate
        val steadyCommits = commits.get()
        val steadySec = (System.nanoTime() - t0) / 1e9
        threads.foreach(_.join(60000))
        val wallSec = (System.nanoTime() - t0) / 1e9
        val losses = StreamCatalog.casLosses.sum() - lossStart
        val done = commits.get()
        val lat = latencies.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
        def pct(p: Double): Double =
          if (lat.isEmpty) -1 else lat(math.min(lat.length - 1, (p * lat.length).toInt)) / 1e6
        // ops/commit: the serial-round-trip multiplier (rtt legs only) —
        // per-stream ceiling ≈ writers_effect × 1000 / (rtt × ops_per_commit)
        val ops = LaggedObjectStoreFs.opsCharged.sum() - opsStart
        val opsPer = if (rtt <= 0L || done == 0) -1.0 else ops.toDouble / done
        // shared mode: manifest versions actually minted — user commits
        // per manifest version is the measured batch (combine) factor
        val versions = boot.getStream("b", "s").version
        val batchFactor = if (versions == 0) -1.0 else done.toDouble / versions
        println(f"""{"mode":"$mode","writers":$n,"rtt_ms":$rtt,"window_sec":$wallSec%.1f,"commits":$done,""" +
          f""""manifest_versions":$versions,"commits_per_version":$batchFactor%.1f,""" +
          f""""commits_per_sec":${steadyCommits / steadySec}%.1f,""" +
          f""""cas_losses":$losses,"retries_per_commit":${if (done == 0) -1.0 else losses.toDouble / done}%.2f,""" +
          f""""ops_per_commit":$opsPer%.1f,""" +
          f""""p50_ms":${pct(0.5)}%.1f,"p99_ms":${pct(0.99)}%.1f,"errors":${errors.get()}}""")
      } finally LaggedObjectStoreFs.opLatencyMs = 0L
    }
  }
}
