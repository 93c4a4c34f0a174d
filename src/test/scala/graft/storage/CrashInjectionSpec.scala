package graft.storage

import graft.SparkTestSession
import graft.core.{StreamConfig, StreamCut, TxnState}
import graft.tools.Fsck
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Dynamic kill-point injection over every stage boundary of the manifest
  * CAS protocol (the no-WAL design's DurableLog.java recovery-invariant
  * analog): a writer is crashed between file staging and the CAS, between
  * the CAS and its cleanup, mid-compaction swap, mid-txn merge, and
  * before truncation's physical sweep. After every crash the same four
  * invariants must hold:
  *
  *   (a) readers never observe partial state,
  *   (b) Fsck names the leak,
  *   (c) the sweep reclaims it,
  *   (d) a re-run lands exactly once.
  *
  * Parameterized over BOTH filesystem contracts — local `file:` (kernel-
  * atomic CREATE_NEW) and the object-store shim ([[LaggedObjectStoreFs]]:
  * store-arbitrated conditional put + manifest list-after-write lag) —
  * the recovery invariants may not depend on local-FS strength.
  */
class CrashInjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private case class SimulatedCrash(point: String) extends RuntimeException(point)

  /** Run `op` with the named kill-point armed; it must die there. */
  private def crashAt[T](point: String)(op: => T): Unit = {
    GraftStreams.killPoint = Some(p => if (p == point) throw SimulatedCrash(point))
    try { val e = intercept[SimulatedCrash](op); assert(e.point === point) }
    finally GraftStreams.killPoint = None
    Thread.sleep(5) // ensure crashed dirs' mod-time is strictly in the past
  }

  private def mk(contract: String, tag: String): (String, GraftStreams) = {
    val root = contract match {
      case "local" => Files.createTempDirectory(s"graft-crash-$tag").toString
      case "objectstore" =>
        ObjectStoreFixture.install(spark)
        "oscas://" + Files.createTempDirectory(s"graft-oscrash-$tag").toString
    }
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    (root, g)
  }

  private def batch(from: Long, until: Long) =
    spark.range(from, until).select(
      concat(lit("k"), $"id" % 13).as("routingKey"),
      $"id".as("eventTime"),
      encode($"id".cast("string"), "UTF-8").as("payload"))

  private def readIds(g: GraftStreams): Seq[Long] =
    g.readEvents("s", "ev")
      .select(decode($"payload", "UTF-8").cast("long").as("id"))
      .as[Long].collect().toSeq.sorted

  private def orphansNamed(root: String, marker: String): Seq[Fsck.Issue] =
    Fsck.checkRoot(root).filter(i => i.kind == "orphan-data" && i.detail.contains(marker))

  for (contract <- Seq("local", "objectstore")) {

  test(s"[$contract] kill between batch staging and CAS: invisible, named, reclaimed, exactly-once rerun") {
    val (root, g) = mk(contract, "w")
    g.writeEvents("s", "ev", batch(0, 1000))
    crashAt("write.staged") {
      g.writeEvents("s", "ev", batch(1000, 2000), Some("w1"), Some(2L))
    }
    assert(readIds(g) === (0L until 1000L), "crashed batch must be invisible")
    assert(orphansNamed(root, "batch-").size === 1, "Fsck must name the leaked batch dir")
    assert(g.sweepOrphans("s", "ev", olderThanMillis = 0L).nonEmpty)
    assert(Fsck.checkRoot(root).isEmpty, "post-sweep root must be clean")
    // the crash happened before the CAS, so the writer's idempotence key
    // was never recorded — the re-delivery must land, exactly once
    g.writeEvents("s", "ev", batch(1000, 2000), Some("w1"), Some(2L))
    assert(readIds(g) === (0L until 2000L))
    g.writeEvents("s", "ev", batch(1000, 2000), Some("w1"), Some(2L)) // dup delivery
    assert(readIds(g) === (0L until 2000L), "batchId dedup must make the rerun a no-op")
  }

  test(s"[$contract] kill between txn merge and publish CAS: resumable, merged orphan reclaimed") {
    val (root, g) = mk(contract, "t")
    g.writeEvents("s", "ev", batch(0, 500))
    val txn = g.beginTxn("s", "ev")
    g.writeToTxn("s", "ev", txn, batch(500, 1000))
    crashAt("txn.merged") { g.commitTxn("s", "ev", txn) }
    val st = g.catalog.getStream("s", "ev").transactions(txn)
    assert(st.state === TxnState.Committing, "phase-1 CAS landed, publish did not")
    assert(readIds(g) === (0L until 500L), "unpublished merge must be invisible")
    assert(orphansNamed(root, "txncommit-").size === 1,
      "Fsck must name the abandoned merge dir")
    assert(Fsck.checkRoot(root).exists(_.kind == "txn-stuck-committing"),
      "Fsck must flag the stuck txn")
    // a COMMITTING txn can only go forward: re-driving the commit resumes
    g.commitTxn("s", "ev", txn)
    assert(g.catalog.getStream("s", "ev").transactions(txn).state === TxnState.Committed)
    assert(readIds(g) === (0L until 1000L), "resumed commit lands exactly once")
    g.commitTxn("s", "ev", txn) // idempotent re-drive
    assert(readIds(g) === (0L until 1000L))
    Thread.sleep(5)
    assert(g.sweepOrphans("s", "ev", olderThanMillis = 0L).nonEmpty,
      "the crashed attempt's merge dir is reclaimed")
    assert(Fsck.checkRoot(root).isEmpty)
  }

  test(s"[$contract] kill after publish CAS before staging cleanup: committed once, staging reclaimed") {
    val (root, g) = mk(contract, "p")
    g.writeEvents("s", "ev", batch(0, 500))
    val txn = g.beginTxn("s", "ev")
    g.writeToTxn("s", "ev", txn, batch(500, 1000))
    crashAt("txn.published") { g.commitTxn("s", "ev", txn) }
    assert(g.catalog.getStream("s", "ev").transactions(txn).state === TxnState.Committed)
    assert(readIds(g) === (0L until 1000L),
      "the publish CAS is the commit point — rows visible exactly once")
    val staging = g.catalog.txnDir("s", "ev", txn)
    val fsys = staging.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fsys.exists(staging), "crash left the staged txn dir behind")
    g.commitTxn("s", "ev", txn) // re-drive: COMMITTED is a no-op
    assert(readIds(g) === (0L until 1000L))
    assert(g.sweepOrphans("s", "ev", olderThanMillis = 0L)
      .exists(_.contains(s"txn-$txn")), "terminal txn staging is reclaimed")
    assert(!fsys.exists(staging))
    assert(Fsck.checkRoot(root).isEmpty)
  }

  test(s"[$contract] kill between compaction rewrite and swap CAS: data intact, rerun compacts") {
    val (root, g) = mk(contract, "c")
    g.writeEvents("s", "ev", batch(0, 600))
    g.writeEvents("s", "ev", batch(600, 1200))
    val filesBefore = g.catalog.getStream("s", "ev").files.map(_.path).toSet
    crashAt("compact.staged") { g.compactStream("s", "ev", minFilesPerSegment = 2) }
    assert(g.catalog.getStream("s", "ev").files.map(_.path).toSet === filesBefore,
      "the swap CAS never ran — manifest must still reference the old files")
    assert(readIds(g) === (0L until 1200L))
    assert(orphansNamed(root, "compact-").size === 1,
      "Fsck must name the leaked compaction dir")
    val (before, after) = g.compactStream("s", "ev", minFilesPerSegment = 2)
    assert(after < before, "the re-run compaction must land")
    assert(readIds(g) === (0L until 1200L), "compaction preserves every row")
    Thread.sleep(5)
    assert(g.sweepOrphans("s", "ev", olderThanMillis = 0L).nonEmpty)
    g.catalog.sweepDeletes("s", "ev") // grace 0 would still tombstone; default grace keeps them
    assert(orphansNamed(root, "compact-").isEmpty)
  }

  test(s"[$contract] kill between redaction rewrite and swap CAS: payloads intact, rerun scrubs") {
    val (root, g) = mk(contract, "r")
    g.writeEvents("s", "ev", batch(0, 600))
    val filesBefore = g.catalog.getStream("s", "ev").files.map(_.path).toSet
    crashAt("redact.staged") { g.redactStream("s", "ev", "k7") }
    assert(g.catalog.getStream("s", "ev").files.map(_.path).toSet === filesBefore,
      "the swap CAS never ran — manifest must still reference the old files")
    assert(g.readEvents("s", "ev").filter(length($"payload") === 0).count() === 0L,
      "no payload may appear scrubbed before the swap")
    assert(orphansNamed(root, "compact-").size === 1,
      "Fsck must name the leaked rewrite dir")
    assert(g.redactStream("s", "ev", "k7") > 0L, "the re-run redaction must land")
    assert(g.readEvents("s", "ev").filter($"routingKey" === "k7")
      .filter(length($"payload") > 0).count() === 0L)
    assert(g.readEvents("s", "ev").count() === 600L, "redaction preserves every row")
    val survivors = g.readEvents("s", "ev").filter(length($"payload") > 0)
      .select(decode($"payload", "UTF-8").cast("long").as("id"))
      .as[Long].collect().toSeq.sorted
    assert(survivors === (0L until 600L).filterNot(_ % 13 == 7),
      "non-target payloads must be byte-identical")
    Thread.sleep(5)
    assert(g.sweepOrphans("s", "ev", olderThanMillis = 0L).nonEmpty)
    assert(orphansNamed(root, "compact-").isEmpty)
  }

  test(s"[$contract] kill inside the streaming sink between engine write and epoch cleanup: " +
       "redelivered epoch collapses to a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val (root, g) = mk(contract, "sink")
    g.catalog.createStream("s", "dst", StreamConfig(initialSegments = 2))
    g.writeEvents("s", "ev", batch(0, 1200))
    val ckpt = Files.createTempDirectory("graft-crash-ck").toString
    def launch() = spark.readStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .option("maxRowsPerTrigger", "500")
      .load()
      .select($"routingKey", $"eventTime", $"payload")
      .writeStream.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "dst")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    // arm ONCE: the first epoch commit dies after the engine write landed
    // but before Spark records the batch — the epoch will be REDELIVERED
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    GraftStreams.killPoint = Some(p =>
      if (p == "sink.committed" && fired.compareAndSet(false, true))
        throw SimulatedCrash(p))
    try {
      val q1 = launch()
      val e = intercept[Exception](q1.awaitTermination())
      assert(e.toString.contains("SimulatedCrash") ||
        Option(e.getCause).exists(_.toString.contains("SimulatedCrash")), e.toString)
    } finally GraftStreams.killPoint = None
    // rows from the crashed-but-landed epoch are already in dst exactly once
    val afterCrash = g.readEvents("s", "dst").count()
    assert(afterCrash > 0, "the engine write committed before the crash")
    // restart: the same epoch is redelivered, must dedup to a no-op, and
    // the remaining epochs drain
    val q2 = launch()
    q2.awaitTermination()
    val ids = g.readEvents("s", "dst")
      .select(decode($"payload", "UTF-8").cast("long").as("id"))
      .as[Long].collect().toSeq.sorted
    assert(ids === (0L until 1200L), "exactly-once across the redelivered epoch")
    Thread.sleep(5)
    g.sweepOrphans("s", "dst", olderThanMillis = 0L) // crashed epoch's staging
    assert(Fsck.checkRoot(root).isEmpty)
  }

  test(s"[$contract] crash before truncation's physical sweep: tombstones hold, sweep is idempotent") {
    val (root, g) = mk(contract, "tr")
    // several small batches → several files per segment, so a 400-row cut
    // strands whole files below the head (tombstone candidates)
    (0 until 5).foreach(i => g.writeEvents("s", "ev", batch(i * 200L, (i + 1) * 200L)))
    val cut = g.nextStreamCut("s", "ev",
      g.catalog.getStream("s", "ev").headStreamCut, approxRows = 400L)
    // graceMillis = 0: the tombstones are due immediately, but the crash
    // (no sweepDeletes call) means nothing is physically deleted yet
    g.catalog.truncateStream("s", "ev", cut, graceMillis = 0L)
    val meta = g.catalog.getStream("s", "ev")
    assert(meta.pendingDeletes.nonEmpty, "dropped files must be tombstoned, not deleted")
    val fsys = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    meta.pendingDeletes.foreach(p =>
      assert(fsys.exists(new Path(p.path)), s"${p.path} must survive until the sweep"))
    val after = readIds(g)
    assert(after.size < 1000 && after.size > 0 && after === after.sorted &&
      after.last === 999L, "reads already honor the head cut")
    // re-running the truncation at the same cut is a metadata no-op
    g.catalog.truncateStream("s", "ev", cut, graceMillis = 0L)
    assert(readIds(g) === after)
    // the recovered sweep physically reclaims and clears the tombstones
    val swept = g.catalog.sweepDeletes("s", "ev")
    assert(swept.nonEmpty)
    swept.foreach(p => assert(!fsys.exists(new Path(p)), s"$p must be gone"))
    assert(g.catalog.getStream("s", "ev").pendingDeletes.isEmpty)
    assert(readIds(g) === after, "the sweep changes nothing a reader can see")
    // the file sweep leaves fully-drained batch dirs empty — Fsck flags
    // them and the orphan sweep (Maintenance's last step) reclaims them
    Thread.sleep(5)
    g.sweepOrphans("s", "ev", olderThanMillis = 0L)
    assert(Fsck.checkRoot(root).isEmpty)
  }

  } // contract loop
}
