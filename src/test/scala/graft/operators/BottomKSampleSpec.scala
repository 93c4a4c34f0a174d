package graft.operators

import graft.SparkTestSession
import graft.operators.BottomKSample.Sample
import graft.operators.DistinctSketch.hash60
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Bottom-k hash-rank sampling: the sample is a pure function of the
  * input SET (any partitioning, any merge shape, duplicates collapse),
  * quantiles from it are deterministic, and the distributed Aggregator
  * reproduces the sequential sketch bit for bit.
  */
class BottomKSampleSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def fold(items: Seq[(Long, Long)], k: Int): Sample =
    items.foldLeft(Sample.empty(k)) { case (s, (h, v)) => s.add(h, v) }

  test("sample content is the k smallest (hash, value) pairs, any merge shape") {
    val gen = for {
      k <- Gen.choose(1, 24)
      n <- Gen.choose(0, 300)
      items <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 150L)
        v <- Gen.choose(-50L, 50L)
      } yield (hash60(id.toString), v))
      chunk <- Gen.choose(1, 40)
    } yield (k, items, chunk)
    check(Prop.forAll(gen) { case (k, items, chunk) =>
      val expected = items.distinct.sorted.take(k)
      val seq = fold(items, k)
      val merged = items.grouped(chunk).toSeq.map(fold(_, k))
        .foldLeft(Sample.empty(k))(_ merge _)
      Prop(seq.hashes.zip(seq.values) == expected &&
        merged.hashes.zip(merged.values) == expected) :| "k smallest pairs"
    })
  }

  test("quantiles: rank-based, deterministic, exact when the sample holds everything") {
    val items = (0 until 40).map(i => (hash60(s"i$i"), i.toLong))
    val sk = fold(items, k = 64) // whole set sampled
    assert(sk.quantile(0.0) == 0L)
    assert(sk.quantile(1.0) == 39L)
    assert(sk.quantile(0.5) == math.floor(0.5 * 39).toLong)
    intercept[IllegalArgumentException](sk.quantile(1.5))
    intercept[IllegalArgumentException](Sample.empty(4).quantile(0.5))
  }

  test("distributed Aggregator path reproduces the sequential sample bit for bit") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val k = 32
    val items = (0 until 4000).map(i => (hash60(s"row$i"), (i % 997).toLong))
    val local = fold(items, k)
    val dist = items.toDF("h", "v").repartition(9)
      .as[(Long, Long)]
      .select(new BottomKSample.SampleAgg(k).toColumn)
      .head()
    assert(dist.hashes == local.hashes && dist.values == local.values)
    assert(dist.quantile(0.5) == local.quantile(0.5))
  }

  test("validation: k >= 1, mismatched-k merge rejected") {
    intercept[IllegalArgumentException](Sample.empty(0))
    intercept[IllegalArgumentException](Sample.empty(2).merge(Sample.empty(3)))
  }
}
