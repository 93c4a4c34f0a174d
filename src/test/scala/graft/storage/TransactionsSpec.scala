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
