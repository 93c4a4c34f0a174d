package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-5 analytics/curation additions: the bucketed
  * interval join's equivalence to the naive range join and its plan
  * shape, funnel semantics, quantization bounds, keep-best argmax and
  * OOV bounds — the invariants the oracle rows alone don't state.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("ev_interval_join equals the naive inequality join; no NLJ on the bucketed path") {
    val fast = SparkEntry.queries("ev_interval_join")(spark, sf)

    // naive range join (the O(n·m) shape the bucketing replaces)
    val ev = Tables.events(spark, sf)
      .withColumn("tus", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val errs = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"user_id".as("u"), $"tus".as("t0"))
    val naive = errs.join(ev,
        $"user_id" === $"u" && $"tus" > $"t0" && $"tus" <= $"t0" + 600000000L, "left")
      .groupBy($"err_id", $"u")
      .agg(count($"event_id").as("n_follow"),
           sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"))
      .select($"err_id", $"u".as("user_id"), $"n_follow",
        coalesce($"np", lit(0L)).as("n_purchase"))

    assert(fast.count() === errs.count())
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)

    // the production path must plan equi-joins only — the whole point of
    // the bucket explosion is avoiding BroadcastNestedLoopJoin at scale
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed interval join planned a nested-loop join:\n$plan")
  }

  test("ev_funnel: converted users have a purchase strictly after first signup") {
    val f = SparkEntry.queries("ev_funnel")(spark, sf).cache()
    assert(f.count() > 0)
    assert(f.filter($"converted" === 1L &&
      ($"first_purchase".isNull || $"first_purchase" <= $"first_signup")).count() === 0L)
    assert(f.filter($"converted" === 0L && $"first_purchase".isNotNull).count() === 0L)
    // us_to_convert is positive iff converted
    assert(f.filter($"converted" === 1L && $"us_to_convert" <= 0L).count() === 0L)
    f.unpersist()
  }

  test("emb_quantize: codes saturate at |127| and SSE is bounded by the step size") {
    val q = SparkEntry.queries("emb_quantize")(spark, sf).cache()
    val n = q.count()
    assert(n > 0)
    // reconstruction error per element is at most half a quantization
    // step (amax/127), so SSE <= dim * (amax/254)^2 (+ ulps)
    val dim = Tables.embeddings(spark, sf)
      .select(size($"embedding")).head().getInt(0)
    val bad = q.filter($"sse" >
      lit(dim.toDouble) * ($"amax" / 254.0) * ($"amax" / 254.0) * 1.0000001)
    assert(bad.isEmpty, s"SSE above the half-step bound: ${bad.head(3).mkString}")
    assert(q.filter($"n_sat" < 1L).count() === 0L,
      "every vector has at least one saturated code (its abs-max element)")
    q.unpersist()
  }

  test("dedup_keep_best: keeper is the longest member (ties to smallest id)") {
    val kb = SparkEntry.queries("dedup_keep_best")(spark, sf).cache()
    assert(kb.count() > 0)
    // every cluster has >= 2 members and the keeper accounts for the max
    assert(kb.filter($"n_docs" < 2L).count() === 0L)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val keeperChars = kb.join(docs, kb("keep_doc") === docs("doc_id"))
    assert(keeperChars.filter($"keep_chars" =!= $"n_chars").count() === 0L)
    assert(kb.filter($"dropped_chars" < $"keep_chars" * 0).count() === 0L) // non-negative
    kb.unpersist()
  }

  test("txt_oov_ratio: bounds and vocabulary coverage") {
    val o = SparkEntry.queries("txt_oov_ratio")(spark, sf).cache()
    assert(o.count() > 0)
    assert(o.filter($"n_oov" > $"n_toks" || $"n_oov" < 0L).count() === 0L)
    assert(o.filter($"oov_ratio" < 0.0 || $"oov_ratio" > 1.0).count() === 0L)
    // the top-100 vocab must cover SOMETHING: not every token is OOV
    assert(o.filter($"oov_ratio" < 1.0).count() > 0)
    o.unpersist()
  }
}
