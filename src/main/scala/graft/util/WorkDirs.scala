package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

/** Process-lifetime temp workspaces for queries that stage data through
  * the engine (engine-write ingests, KVT index builds, …). The returned
  * DataFrames are lazy — callers may materialize them long after the
  * query function returns — so per-invocation deletion is unsafe; instead
  * every workspace is tracked and reclaimed by ONE JVM shutdown hook (and
  * [[drain]] lets a long-lived driver reclaim between runs, the same
  * after-myself cleanup `tools.ManifestBench` does inline). Without this,
  * repeated bench invocations in a long-lived driver leaked disk
  * unboundedly (one full corpus copy per `ds_pipeline_full` run).
  */
object WorkDirs {
  private val live = new ConcurrentLinkedQueue[Path]()
  private val hooked = new AtomicBoolean(false)

  /** Root for ephemeral scratch (fixture stream workspaces, staging,
    * checkpoints): `SPARK_GRAFT_SCRATCH` if set; else a RAM-backed
    * tmpfs (`/dev/shm`) when present with ≥32 GiB usable — scratch is
    * process-ephemeral by contract (reclaimed at JVM exit), so it
    * belongs on the fastest local media, exactly where a production
    * cluster points `spark.local.dir` (local NVMe); else
    * `java.io.tmpdir`. Measured on the r15 box: the root disk sustains
    * ~85 MB/s with heavy kernel time, and single bench queries stalled
    * 20–35 s on writeback flushes of exactly this scratch I/O
    * (OPTIMIZATION_r15.md "Scratch substrate").
    */
  lazy val scratchRoot: String =
    sys.env.get("SPARK_GRAFT_SCRATCH").filter(_.nonEmpty).getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite &&
          shm.getUsableSpace >= 32L * 1024 * 1024 * 1024)
        shm.getPath
      else System.getProperty("java.io.tmpdir")
    }

  /** Create a tracked temp directory under [[scratchRoot]]; reclaimed at
    * JVM exit.
    */
  def temp(prefix: String): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => drain(), "graft-workdirs"))
    val p = Files.createTempDirectory(
      java.nio.file.Paths.get(scratchRoot), prefix)
    live.add(p)
    p.toString
  }

  /** Delete every tracked workspace now. Only call between runs, when no
    * DataFrame planned over a workspace is still live.
    */
  def drain(): Unit = {
    var p = live.poll()
    while (p != null) { rm(p.toFile); p = live.poll() }
  }

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }
}
