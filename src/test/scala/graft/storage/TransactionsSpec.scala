package graft.storage

import graft.SparkTestSession
import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** txn-atomic fixture (FIXTURES.md) mirroring TransactionTest.java +
  * CommitRequestHandler.java:247: commit is all-or-nothing and contiguous,
  * abort leaves nothing, expired leases are swept.
  */
class TransactionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStreams(): GraftStreams =
    new GraftStreams(spark, Files.createTempDirectory("graft-txn").toString)

  private def batch(tag: String, n: Int): DataFrame =
    spark.range(n).select(
      concat(lit(s"$tag-"), col("id") % 7).as("routingKey"),
      (lit(1704067200000L) + col("id")).as("eventTime"),
      encode(concat(lit(tag), col("id")), "UTF-8").as("payload"))

  test("commit: staged events invisible until commit, then contiguous") {
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "t", StreamConfig(initialSegments = 2))
    g.writeEvents("s", "t", batch("base", 100))

    val txn = g.beginTxn("s", "t")
    g.writeToTxn("s", "t", txn, batch("tx", 500))
    g.writeToTxn("s", "t", txn, batch("tx2", 500))
    assert(g.readEvents("s", "t").count() == 100L, "staged rows leaked before commit")
    assert(g.txnStatus("s", "t", txn).state == TxnState.Open)

    g.commitTxn("s", "t", txn)
    assert(g.txnStatus("s", "t", txn).state == TxnState.Committed)
    val all = g.readEvents("s", "t").cache()
    assert(all.count() == 1100L)
    // contiguity: per segment, offsets are 0..n-1 with no holes or dups
    val spans = all.groupBy($"segmentId")
      .agg(min($"offset").as("lo"), max($"offset").as("hi"),
           countDistinct($"offset").as("d"), count(lit(1)).as("n")).collect()
    spans.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
    }
    all.unpersist()
  }

  test("abort: staged events never become visible and staging is dropped") {
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "a", StreamConfig(initialSegments = 2))
    val txn = g.beginTxn("s", "a")
    g.writeToTxn("s", "a", txn, batch("x", 300))
    g.abortTxn("s", "a", txn)
    assert(g.readEvents("s", "a").count() == 0L)
    assert(g.txnStatus("s", "a", txn).state == TxnState.Aborted)
    assertThrows[TxnFailedException](g.writeToTxn("s", "a", txn, batch("y", 10)))
    assertThrows[TxnFailedException](g.commitTxn("s", "a", txn))
  }

  test("listCompletedTxns: terminal records surface, open ones don't") {
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "lc", StreamConfig(initialSegments = 2))
    val committed = g.beginTxn("s", "lc")
    g.writeToTxn("s", "lc", committed, batch("x", 50))
    g.commitTxn("s", "lc", committed)
    val aborted = g.beginTxn("s", "lc")
    g.writeToTxn("s", "lc", aborted, batch("y", 10))
    g.abortTxn("s", "lc", aborted)
    val open = g.beginTxn("s", "lc")
    val done = g.listCompletedTxns("s", "lc")
    assert(done.map(_.id).toSet == Set(committed, aborted))
    assert(done.map(t => t.id -> t.state).toMap ==
      Map(committed -> TxnState.Committed, aborted -> TxnState.Aborted))
    assert(!done.exists(_.id == open))
  }

  test("lease expiry: sweep aborts, commit after expiry fails") {
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "l", StreamConfig(initialSegments = 1))
    val txn = g.beginTxn("s", "l", leaseMillis = 1L)
    Thread.sleep(20)
    assertThrows[TxnFailedException](g.writeToTxn("s", "l", txn, batch("z", 10)))
    assertThrows[TxnFailedException](g.commitTxn("s", "l", txn))
    val swept = g.sweepExpiredTxns("s", "l")
    assert(swept == Seq(txn))
    assert(g.txnStatus("s", "l", txn).state == TxnState.Aborted)
    // ping keeps a fresh txn alive
    val t2 = g.beginTxn("s", "l", leaseMillis = 50L)
    g.pingTxn("s", "l", t2, leaseMillis = 600000L)
    Thread.sleep(60)
    g.writeToTxn("s", "l", t2, batch("ok", 10))
    g.commitTxn("s", "l", t2)
    assert(g.readEvents("s", "l").count() == 10L)
  }

  test("rolling commit: scale mid-txn re-routes staged rows to the new epoch") {
    // CommitRequestHandler.java:290 rollTransactions analog: a txn begun
    // against epoch 0 still commits after the stream scales — its rows
    // land in the current epoch's open segments, per-key order preserved.
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "r", StreamConfig(initialSegments = 2))
    val txn = g.beginTxn("s", "r")
    g.writeToTxn("s", "r", txn, batch("tx", 300))
    g.scaleStream("s", "r", 4) // seals epoch-0 segments
    g.commitTxn("s", "r", txn)
    assert(g.txnStatus("s", "r", txn).state == TxnState.Committed)
    val all = g.readEvents("s", "r").cache()
    assert(all.count() == 300L)
    // every row is in an epoch-1 segment
    assert(all.filter(shiftrightunsigned($"segmentId", 32) === 0).count() == 0L,
      "rows committed into sealed epoch-0 segments")
    // per-key order: offsets within a routing key replay write order
    val byKey = all.select($"routingKey", $"offset",
        substring(decode($"payload", "UTF-8"), 3, 10).cast("long").as("n"))
      .collect().groupBy(_.getString(0))
    byKey.values.foreach { rs =>
      val ns = rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(ns == ns.sorted, s"per-key order broken after rolling commit: $ns")
    }
    all.unpersist()
    // commit is idempotent: a second call is a no-op
    g.commitTxn("s", "r", txn)
    assert(g.readEvents("s", "r").count() == 300L)
  }

  test("sweep re-drives a stuck COMMITTING txn to COMMITTED") {
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "c", StreamConfig(initialSegments = 1))
    val txn = g.beginTxn("s", "c", leaseMillis = 1L)
    // open the txn before the lease runs out, then simulate a driver that
    // entered COMMITTING and died: flip the state manually without merging
    g.catalog.update("s", "c") { m =>
      val cur = m.transactions(txn)
      m.copy(transactions = m.transactions + (txn -> cur.copy(state = TxnState.Committing)))
    }
    Thread.sleep(20)
    // abort must refuse — commit is the only legal outcome now
    assertThrows[TxnFailedException](g.abortTxn("s", "c", txn))
    val swept = g.sweepExpiredTxns("s", "c")
    assert(swept == Seq(txn))
    assert(g.txnStatus("s", "c", txn).state == TxnState.Committed)
  }

  test("interleaved txn and direct writes serialize without offset overlap") {
    val g = freshStreams()
    g.catalog.createScope("s")
    g.catalog.createStream("s", "i", StreamConfig(initialSegments = 2))
    val txn = g.beginTxn("s", "i")
    g.writeToTxn("s", "i", txn, batch("tx", 200))
    g.writeEvents("s", "i", batch("direct", 200)) // lands first
    g.commitTxn("s", "i", txn)                    // merges after, on fresh tails
    val all = g.readEvents("s", "i")
    assert(all.count() == 400L)
    assert(all.groupBy($"segmentId", $"offset").count().filter($"count" > 1).count() == 0)
  }
}
