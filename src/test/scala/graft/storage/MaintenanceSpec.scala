package graft.storage

import graft.SparkTestSession
import graft.core.StreamConfig
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Scope-wide maintenance: bounded parallelism across streams (r15).
  * Per-stream passes are independent by construction (per-stream CAS +
  * floor chains), and on an object store each pass is RTT-bound — so a
  * serial loop over 10⁵ streams is hours of idle round-trip waiting.
  * These tests inject per-op latency through [[LaggedObjectStoreFs]] and
  * pin (a) a real ~width× wall-clock win and (b) byte-identical results
  * between the serial and parallel passes.
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("runScope: parallel pass returns the serial pass's results, much faster at RTT") {
    ObjectStoreFixture.install(spark)
    val root = "oscas://" + Files.createTempDirectory("graft-mpar").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    val streams = (1 to 8).map(i => s"st$i")
    streams.foreach(st =>
      g.catalog.createStream("s", st, StreamConfig(initialSegments = 1)))
    val maint = new Maintenance(g)
    val prev = LaggedObjectStoreFs.opLatencyMs
    LaggedObjectStoreFs.opLatencyMs = 10L
    try {
      val now = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val serial = maint.runScope("s", now, parallelism = 1)
      val serialSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val parallel = maint.runScope("s", now, parallelism = 8)
      val parallelSec = (System.nanoTime() - t1) / 1e9
      assert(serial.keySet == streams.toSet)
      assert(parallel == serial,
        "parallel pass must produce the serial pass's exact reports")
      // 8 independent RTT-bound passes on 8 threads: ideal is ~8×; even
      // a loaded CI box clears 2× with huge margin (the work is sleep,
      // not CPU)
      assert(parallelSec < serialSec / 2.0,
        f"no parallel speedup: serial $serialSec%.2fs vs parallel $parallelSec%.2fs")
    } finally LaggedObjectStoreFs.opLatencyMs = prev
  }

  test("runScope: one stream's failure still runs the rest, then rethrows with suppression") {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-mfail").toString)
    g.catalog.createScope("s")
    (1 to 4).foreach { i =>
      g.catalog.createStream("s", s"ok$i", StreamConfig(initialSegments = 1))
      // a due tombstone per healthy stream: the pass's sweepDeletes
      // clears it, which is the observable proof the pass RAN
      g.catalog.update("s", s"ok$i")(m => m.copy(pendingDeletes =
        Seq(graft.core.PendingDelete(s"$i-gone.parquet", 0L))))
    }
    // a stream whose whole manifest chain is corrupt fails its pass;
    // the scope pass must still maintain the healthy streams
    g.catalog.createStream("s", "broken", StreamConfig(initialSegments = 1))
    val fs = new org.apache.hadoop.fs.Path(g.rootDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new org.apache.hadoop.fs.Path(g.rootDir, "s/broken/_meta")
    fs.listStatus(metaDir).foreach { st =>
      val out = fs.create(st.getPath, true)
      out.write("not json {".getBytes("UTF-8")); out.close()
    }
    val maint = new Maintenance(g)
    val e = intercept[Exception](maint.runScope("s", parallelism = 4))
    // the healthy streams all completed their pass despite the failure:
    // every due tombstone was swept
    (1 to 4).foreach { i =>
      val m = g.catalog.getStream("s", s"ok$i")
      assert(m.pendingDeletes.isEmpty,
        s"ok$i never ran its pass (${e.getMessage})")
    }
  }
}
