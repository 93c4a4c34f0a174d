package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-scale checks for the connected-component labeller that
  * backs `dedup_clusters` / `dedup_keep_best`. The CORRECTNESS rows pin
  * the labels on the real corpus; these specs pin CONVERGENCE shape on
  * pathological graphs the corpus doesn't contain.
  */
class DedupOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("clusterLabels: 10k-node chain converges inside the 13-round cap") {
    // Worst case for plain min-label propagation: one path graph of
    // diameter 10k (labels creep one hop per round without pointer
    // jumping -> 10k rounds). With label-of-label jumping the reach
    // distance multiplies each round, and clusterLabels composes two
    // steps per materialized iteration, so 13 iterations cover any
    // diameter up to well past 2^13 — this spec is the proof that the
    // cap is a safety net, not a correctness bound.
    val n = 10000
    val pairs = spark.range(0, n - 1)
      .select($"id".as("a_id"), ($"id" + 1L).as("b_id"))
    val labels = DedupOps.clusterLabels(spark, pairs).cache()
    assert(labels.count() === n.toLong)
    // one component, rooted at the minimum id
    assert(labels.select($"lbl").distinct().count() === 1L)
    assert(labels.agg(org.apache.spark.sql.functions.max($"lbl"))
      .head().getLong(0) === 0L)
    labels.unpersist()
  }

  test("clusterLabels: two disjoint chains stay two components") {
    val pairs = spark.range(0, 499)
      .select($"id".as("a_id"), ($"id" + 1L).as("b_id"))
      .union(spark.range(1000, 1499)
        .select($"id".as("a_id"), ($"id" + 1L).as("b_id")))
    val labels = DedupOps.clusterLabels(spark, pairs)
    val byLbl = labels.groupBy($"lbl").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLbl === Map(0L -> 500L, 1000L -> 500L))
  }

  test("spanRemovalOf: shared k-token prefix is excised, unique tails survive") {
    // Vocabulary is disjoint per region so no accidental gram collisions:
    // docs 1/2 share exactly one 8-gram (the common prefix); doc 3 is
    // fully unique; docs 4/5 are identical but SHORTER than k, so the
    // k-gram granularity floor must keep them whole.
    val common = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$common a9 a10 a11 a12"),
      (2L, s"$common b9 b10 b11 b12"),
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")),
      (4L, "d1 d2 d3"),
      (5L, "d1 d2 d3")
    ).toDF("doc_id", "text")
    val out = DedupOps.spanRemovalOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((12L, 4L, md5Hex("a9 a10 a11 a12"))))
    assert(out(2L) === ((12L, 4L, md5Hex("b9 b10 b11 b12"))))
    assert(out(3L) === ((12L, 12L, md5Hex((1 to 12).map(i => s"u$i").mkString(" ")))))
    assert(out(4L) === ((3L, 3L, md5Hex("d1 d2 d3"))))
    assert(out(5L) === ((3L, 3L, md5Hex("d1 d2 d3"))))
  }

  test("spanRemovalOf: an exact duplicate pair is removed to nothing") {
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val out = DedupOps.spanRemovalOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // every position of both docs sits under some duplicated 8-gram
    assert(out(1L) === ((0L, md5Hex(""))))
    assert(out(2L) === ((0L, md5Hex(""))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
