package graft.operators

import graft.{SparkTestSession, SparkEntry, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the second-stage pipeline operators (PipelineOps): as-of
  * join semantics + plan shape, contamination/repetition invariants,
  * k-means iteration partitioning of the corpus.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("AsOfJoin matches the latest right row at-or-before each left time") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), // key 1
      (2L, 7L, "d")                                  // key 2: no prior right
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100L, 1.0),  // exactly at b=20? no — at t=10: visible to a (<=)
      (1L, 15L, 101L, 2.0),
      (3L, 1L, 102L, 3.0)    // other key, never matched
    ).toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("rid", "v"))
      .select($"tag", $"asof_rid", $"asof_v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out("a") === 100L, "t=10 left must see the t=10 right row (<= semantics)")
    assert(out("b") === 101L, "t=20 left must see the latest (t=15) right row")
    assert(out("c") === -1L, "t=5 left has no prior right row -> null")
    assert(out("d") === -1L, "key with no right rows -> null")
  }

  test("AsOfJoin returns the matched row's fields verbatim, including its NULLs") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq(
      (1L, 10L, 1L, Some(1.0)),
      (1L, 15L, 2L, None) // the matched row: its null v must NOT be
                          // backfilled from the older (t=10) row
    ).toDF("k", "t", "rid", "v")
    val row = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("rid", "v")).head()
    assert(row.getAs[Long]("asof_rid") === 2L)
    assert(row.isNullAt(row.fieldIndex("asof_v")),
      "a null field in the matched right row must stay null")
  }

  test("AsOfJoin rejects reserved/colliding column names up front") {
    val l1 = Seq((1L, 10L)).toDF("k", "__t")
    val l2 = Seq((1L, 10L, 0L)).toDF("k", "t", "asof_rid")
    val r = Seq((1L, 5L, 1L)).toDF("k", "t", "rid")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l1, r, "k", "__t", "t", Seq("rid"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l2, r, "k", "t", "t", Seq("rid"))
    }
  }

  test("AsOfJoin ties on (key, time) break deterministically by payload head") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 3L), (1L, 10L, 9L)).toDF("k", "t", "rid")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").head().getLong(0)
    assert(got === 9L, "the largest rid must win the (key,time) tie")
  }

  test("ev_asof_join plan: one key shuffle + window, no range-pair join") {
    val df = SparkEntry.queries("ev_asof_join")(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(!executed.contains("BroadcastNestedLoopJoin") &&
      !executed.contains("CartesianProduct"),
      "as-of must not materialize range pairs")
    assert(executed.contains("Window"), "expected the running-window formulation")
    // exactly the clicks survive, each once
    val n = df.count()
    val clicks = Tables.events(spark, sf).filter($"event_type" === "click").count()
    assert(n === clicks, s"every click appears exactly once ($n vs $clicks)")
  }

  test("emb_kmeans_iter: clusters partition the corpus; assignment stays a partial max_by") {
    val df = SparkEntry.queries("emb_kmeans_iter")(spark, sf)
    val rows = df.collect()
    df.queryExecution // force
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(rows.map(_.getAs[Long]("n_assigned")).sum === 500L,
      "every vector is assigned to exactly one cluster")
    assert(rows.length === 10, "k=10 clusters, none empty in the fixture")
    assert(plan.contains("max_by"), "assignment lost the max_by aggregate")
    assert(plan.linesIterator.count(_.contains("partial_max_by")) >= 1,
      "assignment max_by is not partially aggregated before the exchange")
  }

  test("txt_contamination: fractions bounded, split actually overlaps") {
    val rows = SparkEntry.queries("txt_contamination")(spark, sf).collect()
    assert(rows.length === 100, "eval split is doc_id % 10 >= 8 of 500 docs")
    assert(rows.forall { r =>
      val f = r.getAs[Double]("contam_frac"); f >= 0.0 && f <= 1.0
    })
    assert(rows.exists(_.getAs[Double]("contam_frac") > 0.0),
      "shared-vocabulary fixture must show some 5-gram contamination")
    assert(rows.forall(r => r.getAs[Long]("n_contam") <= r.getAs[Long]("n_grams")))
  }

  test("txt_rep_ngrams: repetition stats internally consistent") {
    val rows = SparkEntry.queries("txt_rep_ngrams")(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("top2_n") <= r.getAs[Long]("n2"))
      assert(r.getAs[Long]("dup3_n") <= r.getAs[Long]("n3"))
      val t = r.getAs[Double]("top2_frac"); assert(t > 0.0 && t <= 1.0)
      val d = r.getAs[Double]("dup3_frac"); assert(d >= 0.0 && d <= 1.0)
      // n2/n3 relate to token count: n3 = n2 - 1 for docs with >= 3 tokens
      assert(r.getAs[Long]("n3") === r.getAs[Long]("n2") - 1L)
    }
  }
}
