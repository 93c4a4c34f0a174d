package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r15 size-adaptive banded-signature cache: the persist decision
  * must never change WHAT nearDuplicates computes — only whether the
  * minhash kernel runs once (cached feed) or twice (r14's scale-safe
  * recompute). Pin pair-set equality across all three policies on the
  * same corpus, and that the auto policy flips with the size cap.
  */
class LshAutoPersistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = {
    // overlapping shingle runs → a real mix of near-dup and distinct docs
    spark.range(300).select(
      $"id".as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit(s"w$i"), ($"id" + i) % 9)): _*).as("text"))
  }

  private def pairs(): Set[(Long, Long)] =
    MinHashLSH.nearDuplicates(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.4)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pair set is identical with the cache forced on, forced off, and auto at both cap extremes") {
    val onOff = MinHashLSH.PersistSignaturesConf
    val cap = MinHashLSH.AutoPersistMaxBytesConf
    def withConf(k: String, v: String)(f: => Set[(Long, Long)]) = {
      spark.conf.set(k, v)
      try f finally spark.conf.unset(k)
    }
    val forcedOn = withConf(onOff, "true")(pairs())
    val forcedOff = withConf(onOff, "false")(pairs())
    val autoPersist = withConf(cap, Long.MaxValue.toString)(pairs()) // est always fits
    val autoRecompute = withConf(cap, "0")(pairs()) // est never fits
    assert(forcedOn.nonEmpty, "fixture must produce near-dup pairs")
    assert(forcedOff == forcedOn, "recompute path diverged from cached path")
    assert(autoPersist == forcedOn, "auto(persist) diverged")
    assert(autoRecompute == forcedOn, "auto(recompute) diverged")
  }
}
