package graft.operators

import graft.SparkTestSession
import graft.operators.FrequencySketch.Sketch
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class FrequencySketchSpec extends AnyFunSuite {

  private def exact(items: Seq[(String, Long)]): Map[String, Long] =
    items.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  private def fold(items: Seq[(String, Long)], cap: Int): Sketch =
    items.foldLeft(Sketch.empty(cap)) { case (s, (k, w)) => s.add(k, w) }

  test("exactness domain: distinct keys <= capacity => err 0, exact counts") {
    val items = Seq.tabulate(5000)(i => (s"k${i % 7}", (i % 13) + 1L))
    val sk = fold(items, cap = 8)
    assert(sk.err == 0L)
    assert(sk.counters == exact(items))
  }

  test("bounds under compression: lower <= true <= lower + err, err <= W/(cap+1)") {
    val rnd = new Random(7)
    // Zipf-flavored stream: hot head + a long tail of distinct keys.
    val items = Seq.tabulate(20000) { i =>
      if (rnd.nextInt(100) < 30) (s"hot${rnd.nextInt(4)}", 1L)
      else (s"tail${rnd.nextInt(5000)}", 1L)
    }
    val cap = 32
    val sk = fold(items, cap)
    val truth = exact(items)
    val w = items.map(_._2).sum
    assert(sk.counters.size <= cap)
    assert(sk.err <= w / (cap + 1), s"err ${sk.err} exceeds W/(cap+1) ${w / (cap + 1)}")
    truth.foreach { case (k, t) =>
      val (lo, hi) = sk.estimate(k)
      assert(lo <= t && t <= hi, s"$k: true $t outside [$lo, $hi]")
    }
    // Every true heavy hitter above the error budget must be tracked.
    truth.filter(_._2 > sk.err).keys.foreach { k =>
      assert(sk.counters.contains(k), s"heavy key $k missing from sketch")
    }
  }

  test("merge order independence of the guarantees; exact domain merges exactly") {
    val items = Seq.tabulate(6000)(i => (s"k${i % 6}", 1L + (i % 3)))
    val cap = 8
    val chunks = items.grouped(500).map(fold(_, cap)).toSeq
    val leftFold = chunks.reduceLeft(_ merge _)
    val pairwise = chunks.grouped(2).map(_.reduce(_ merge _)).reduce(_ merge _)
    assert(leftFold.counters == exact(items) && leftFold.err == 0L)
    assert(pairwise.counters == exact(items) && pairwise.err == 0L)
  }

  test("merged compressed sketches keep the summed error budget honest") {
    val rnd = new Random(11)
    val a = Seq.fill(8000)((s"a${rnd.nextInt(900)}", 1L))
    val b = Seq.fill(8000)((s"b${rnd.nextInt(900)}", 1L)) ++ Seq.fill(3000)(("shared", 1L))
    val cap = 16
    val merged = fold(a, cap).merge(fold(b, cap))
    val truth = exact(a ++ b)
    val w = (a ++ b).map(_._2).sum
    assert(merged.err <= w / (cap + 1))
    truth.foreach { case (k, t) =>
      val (lo, hi) = merged.estimate(k)
      assert(lo <= t && t <= hi, s"$k: true $t outside [$lo, $hi]")
    }
    assert(merged.counters.contains("shared"))
  }

  test("weight validation: negative weight rejected, zero weight is a no-op") {
    val s0 = Sketch.empty(4).add("x", 0L)
    assert(s0.counters.isEmpty)
    intercept[IllegalArgumentException](Sketch.empty(4).add("x", -1L))
    intercept[IllegalArgumentException](Sketch.empty(4).merge(Sketch.empty(5)))
    intercept[IllegalArgumentException](Sketch.empty(0))
  }

  test("distributed Aggregator path: partial sketches honor the same bounds") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new Random(23)
    val items = Seq.tabulate(30000) { i =>
      if (i % 5 == 0) (s"hot${i % 3}", 2L) else (s"t${rnd.nextInt(4000)}", 1L)
    }
    val cap = 48
    val sk = items.toDF("k", "w").repartition(7)
      .as[(String, Long)]
      .select(FrequencySketch.sketchColumn(cap).as[Sketch])
      .head()
    val truth = exact(items)
    val w = items.map(_._2).sum
    assert(sk.counters.size <= cap && sk.err <= w / (cap + 1))
    truth.foreach { case (k, t) =>
      val (lo, hi) = sk.estimate(k)
      assert(lo <= t && t <= hi, s"$k: true $t outside [$lo, $hi]")
    }
    // The hot keys clear the error budget, so they are guaranteed present.
    Seq("hot0", "hot1", "hot2").foreach(k => assert(sk.counters.contains(k)))
  }

  test("plan gate: sketch aggregation is a two-phase ObjectHashAggregate (map-side partials)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (s"k$i", 1L)).toDF("k", "w").repartition(4)
      .as[(String, Long)]
      .select(FrequencySketch.sketchColumn(16).as[Sketch])
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
    // Partial + final phases: the shuffle moves ≤capacity-entry sketches,
    // never raw keys.
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial AND final aggregate phases:\n$plan")
  }

  test("topK report marks exact counts with count_lo == count_hi") {
    val spark = SparkTestSession.spark
    val df = spark.createDataFrame(
      Seq(("a", 5L), ("b", 3L), ("a", 2L), ("c", 1L))).toDF("k", "w")
    val out = FrequencySketch.topK(df, "k", org.apache.spark.sql.functions.col("w"),
      k = 2, capacity = 8).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 7L, 7L), ("b", 3L, 3L)))
  }
}
