package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** N-pass perceptron convergence-stop specs (the generalization of the
  * oracle-gated 2-pass `txt_train_perceptron` row): on a linearly
  * separable fixture the loop must reach ZERO misclassified docs and
  * stop early; the cap must bind on a non-separable one.
  */
class PerceptronLoopSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("separable fixture converges to zero misclassified and stops early") {
    // classes live in disjoint bucket sets -> separable by construction
    val rows = (0 until 12).flatMap { d =>
      val y = if (d % 2 == 0) 1L else -1L
      val buckets = if (y > 0) Seq(1L, 2L, 3L) else Seq(10L, 11L, 12L)
      buckets.map(b => (d.toLong, y, b, 1L + (d % 3)))
    }
    val feats = rows.toDF("doc_id", "y", "b", "x")
    val (w, passes, wrong) = TextOps.trainPerceptronLoop(feats, maxPasses = 10)
    assert(wrong == 0L, s"still $wrong misclassified after $passes passes")
    assert(passes < 10, s"convergence should stop before the cap, ran $passes")
    // the learned weights really classify every fixture doc
    val scored = feats.join(w.withColumnRenamed("b", "wb"), $"b" === $"wb", "left")
      .groupBy($"doc_id", $"y")
      .agg(sum($"x" * coalesce($"w", lit(0L))).as("m"))
      .filter($"y" * $"m" <= 0)
    assert(scored.count() == 0L)
    // disjoint classes: positive buckets carry positive weight, negative negative
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(b => wm.getOrElse(b, 0L) > 0))
    assert(Seq(10L, 11L, 12L).forall(b => wm.getOrElse(b, 0L) < 0))
  }

  test("non-separable fixture stops at the pass cap with a truthful count") {
    // two docs with IDENTICAL features but opposite labels: impossible
    val feats = Seq(
      (0L, 1L, 5L, 2L), (0L, 1L, 6L, 1L),
      (1L, -1L, 5L, 2L), (1L, -1L, 6L, 1L)
    ).toDF("doc_id", "y", "b", "x")
    val (w, passes, wrong) = TextOps.trainPerceptronLoop(feats, maxPasses = 4)
    assert(passes == 4, s"cap must bind, ran $passes")
    assert(wrong >= 1L, "conflicting duplicates can never both classify")
    // the reported count is measured under the RETURNED weights
    val recount = feats.join(w.withColumnRenamed("b", "wb"), $"b" === $"wb", "left")
      .groupBy($"doc_id", $"y")
      .agg(sum($"x" * coalesce($"w", lit(0L))).as("m"))
      .filter($"y" * $"m" <= 0).count()
    assert(recount == wrong)
  }
}
