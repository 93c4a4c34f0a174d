package graft.tools

import graft.catalog.StreamCatalog
import graft.core.{FileEntry, StreamConfig}

import java.nio.file.Files

/** Manifest COMMIT cost vs live-file count — the 100 TB control-plane
  * question (VERDICT r9 #1). At ~1 GB data files, 100 TB is ~10^5
  * manifest entries per stream; this tool synthesizes a manifest with N
  * file entries and measures what a single append-batch commit actually
  * costs as N grows: `update()` = read latest manifest + transform +
  * serialize + exclusive-create write, so with a full-list manifest the
  * per-commit wall is O(N) twice over (parse + serialize), and every CAS
  * retry pays it again.
  *
  * Reference analog: the controller's event-sourced metadata store
  * (controller/.../store/stream/PravegaTablesStreamMetadataStore.java)
  * never rewrites full state per op either — per-key table updates plus
  * history records. The engine's answer is the incremental manifest log
  * (delta records + periodic checkpoints, the Delta/Iceberg
  * log-plus-checkpoint shape) in `catalog/StreamCatalog.scala`.
  *
  * Pure control-plane: no SparkSession, local FS, wall-clock only.
  *
  * Usage: runMain graft.tools.ManifestBench [n1 n2 ...]
  * Prints one JSON line per size:
  *   {"n_files":N,"commit_ms_p50":…,"commit_ms_max":…,
  *    "cold_read_ms":…,"warm_read_ms":…,"tip_bytes":…}
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1000, 10000, 100000, 300000, 1000000)
    val commits = 24
    // GRAFT_MB_INTERVAL overrides the checkpoint cadence (e.g. a huge
    // value isolates pure-delta commit cost from checkpointer CPU/GC
    // interference; the default exercises the production cadence)
    val interval = sys.env.get("GRAFT_MB_INTERVAL").map(_.toInt)
      .getOrElse(StreamCatalog.DefaultCheckpointInterval)
    val verbose = sys.env.contains("GRAFT_MB_VERBOSE")
    for (n <- sizes) {
      val work = Files.createTempDirectory("graft-mb").toString
      val cat = new StreamCatalog(work, checkpointInterval = interval)
      cat.createScope("b")
      cat.createStream("b", "s", StreamConfig(initialSegments = 32))
      // install the N-file baseline in one untimed commit
      val seed = (0 until n).map { i =>
        FileEntry(i % 32, f"data/segId=${i % 32}/part-$i%08d.parquet",
          (i / 32).toLong * 1000L, 1000L, i.toLong, i.toLong + 999L,
          1, 4L << 20)
      }
      cat.update("b", "s")(m => m.copy(files = seed))
      // timed: single-file append commits — the writeEvents batch shape
      val rawWalls = (0 until commits).map { j =>
        val t0 = System.nanoTime()
        cat.update("b", "s") { m =>
          m.copy(files = m.files :+ FileEntry(j % 32,
            s"data/segId=${j % 32}/extra-$j.parquet",
            900000000L + j * 1000L, 1000L, 0L, 999L, 1, 4L << 20))
        }
        (System.nanoTime() - t0) / 1e6
      }
      if (verbose) println(rawWalls.map(w => f"$w%.1f").mkString("walls_ms=[", ",", "]"))
      val walls = rawWalls.sorted
      // steady state: let the out-of-band checkpointer drain before the
      // read measurements (commit timings above exclude it by design —
      // that asynchrony IS the feature under test)
      cat.flushCheckpoints()
      // cold read: a fresh catalog instance plans a scan from scratch
      val cold = {
        val c2 = new StreamCatalog(work)
        val t0 = System.nanoTime()
        val m = c2.getStream("b", "s")
        require(m.files.size == n + commits, s"lost files: ${m.files.size}")
        (System.nanoTime() - t0) / 1e6
      }
      // warm read: same instance, version unchanged
      val warm = {
        val t0 = System.nanoTime()
        cat.getStream("b", "s")
        (System.nanoTime() - t0) / 1e6
      }
      // bytes of the tip manifest file (checkpoint or delta)
      val metaDir = java.nio.file.Paths.get(work, "b", "s", "_meta")
      val tip = java.nio.file.Files.list(metaDir).iterator()
      var tipName = ""; var tipBytes = 0L
      while (tip.hasNext) {
        val p = tip.next()
        val nm = p.getFileName.toString
        if (nm > tipName) { tipName = nm; tipBytes = java.nio.file.Files.size(p) }
      }
      println(s"""{"n_files":$n,"commit_ms_p50":${walls(commits / 2)},""" +
        s""""commit_ms_max":${walls.last},"cold_read_ms":$cold,""" +
        s""""warm_read_ms":$warm,"tip_bytes":$tipBytes,"tip":"$tipName"}""")
      // best-effort cleanup (up to ~GBs of JSON at the top sizes)
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val it = java.nio.file.Files.list(p).iterator()
          while (it.hasNext) rm(it.next())
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(work))
    }
  }
}
