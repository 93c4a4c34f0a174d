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
}
