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

  /** Create a tracked temp directory; reclaimed at JVM exit. */
  def temp(prefix: String): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => drain(), "graft-workdirs"))
    val p = Files.createTempDirectory(prefix)
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
