package graft.operators

import graft.operators.FrequencySketch.Sketch
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the Misra–Gries sketch: the lower/upper-bound and
  * error-budget invariants must hold for EVERY stream, capacity and
  * partitioning — not just the fixture seeds. No SparkSession: the
  * merge law here is exactly what the Aggregator runs distributed.
  */
class FrequencySketchPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val streamGen: Gen[(Int, List[(String, Long)])] = for {
    cap <- Gen.choose(1, 24)
    n <- Gen.choose(0, 400)
    keys <- Gen.listOfN(n, Gen.choose(0, 60).map(i => s"k$i"))
    ws <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield (cap, keys.zip(ws))

  private def exact(items: Seq[(String, Long)]): Map[String, Long] =
    items.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  private def invariants(sk: Sketch, items: Seq[(String, Long)]): Prop = {
    val truth = exact(items)
    val w = items.map(_._2).sum
    Prop.all(
      Prop(sk.counters.size <= sk.capacity) :| "size <= capacity",
      Prop(sk.err <= (if (sk.capacity + 1 > 0) w / (sk.capacity + 1) else w)) :| s"err ${sk.err} <= W/(cap+1)",
      Prop(truth.forall { case (k, t) =>
        val (lo, hi) = sk.estimate(k); lo <= t && t <= hi
      }) :| "bounds contain truth",
      Prop(sk.counters.forall { case (k, c) => c <= truth.getOrElse(k, 0L) + sk.err }) :| "no phantom mass",
      Prop(truth.filter(_._2 > sk.err).keys.forall(sk.counters.contains)) :| "heavy keys present")
  }

  test("sequential fold: invariants hold for every stream and capacity") {
    check(Prop.forAll(streamGen) { case (cap, items) =>
      invariants(items.foldLeft(Sketch.empty(cap)) { case (s, (k, w)) => s.add(k, w) }, items)
    })
  }

  test("arbitrary partitioning + merge: same invariants, any chunking") {
    val gen = for {
      (cap, items) <- streamGen
      chunk <- Gen.choose(1, 50)
    } yield (cap, items, chunk)
    check(Prop.forAll(gen) { case (cap, items, chunk) =>
      val parts = items.grouped(chunk).toSeq
      val merged = parts.map(_.foldLeft(Sketch.empty(cap)) {
        case (s, (k, w)) => s.add(k, w)
      }).foldLeft(Sketch.empty(cap))(_ merge _)
      invariants(merged, items)
    })
  }

  test("exactness domain: distinct <= capacity is always exact, any merge shape") {
    val gen = for {
      cap <- Gen.choose(4, 32)
      n <- Gen.choose(0, 300)
      items <- Gen.listOfN(n, for {
        k <- Gen.choose(0, 3).map(i => s"k$i") // 4 distinct <= every cap
        w <- Gen.choose(1L, 9L)
      } yield (k, w))
      chunk <- Gen.choose(1, 40)
    } yield (cap, items, chunk)
    check(Prop.forAll(gen) { case (cap, items, chunk) =>
      val merged = items.grouped(chunk).toSeq
        .map(_.foldLeft(Sketch.empty(cap)) { case (s, (k, w)) => s.add(k, w) })
        .foldLeft(Sketch.empty(cap))(_ merge _)
      Prop(merged.err == 0L && merged.counters == exact(items)) :| "exact"
    })
  }
}
