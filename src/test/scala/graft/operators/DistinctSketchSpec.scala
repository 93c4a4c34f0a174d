package graft.operators

import graft.SparkTestSession
import graft.operators.DistinctSketch.{Kmv, hash60}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-count sketch: content determinism (the k smallest are
  * the k smallest under ANY partitioning — the property that makes the
  * estimate oracle-replayable), exactness below k, estimator accuracy,
  * hash60 ≡ the SQL md5-prefix idiom, and the distributed Aggregator
  * path.
  */
class DistinctSketchSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def fold(hs: Seq[Long], k: Int): Kmv =
    hs.foldLeft(Kmv.empty(k))(_ add _)

  test("hash60 equals parsing the first 15 md5 hex chars as a 60-bit integer") {
    check(Prop.forAll { (s: String) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15)
      hash60(s) == java.lang.Long.parseLong(hex, 16) && hash60(s) >= 0
    })
  }

  test("sketch content is a pure function of the distinct set, any merge shape") {
    val gen = for {
      k <- Gen.choose(2, 32)
      n <- Gen.choose(0, 300)
      vals <- Gen.listOfN(n, Gen.choose(0L, 200L))
      chunk <- Gen.choose(1, 40)
    } yield (k, vals.map(v => hash60(v.toString)), chunk)
    check(Prop.forAll(gen) { case (k, hs, chunk) =>
      val seq = fold(hs, k)
      val merged = hs.grouped(chunk).toSeq.map(fold(_, k))
        .foldLeft(Kmv.empty(k))(_ merge _)
      val expected = hs.distinct.sorted.take(k)
      Prop(seq.hashes == expected && merged.hashes == expected) :| "k smallest"
    })
  }

  test("exact below k: estimate == true distinct, flagged exact") {
    check(Prop.forAll(Gen.choose(2, 64), Gen.listOf(Gen.choose(0L, 30L))) { (k, vals) =>
      val hs = vals.map(v => hash60(v.toString))
      val sk = fold(hs, k)
      val d = hs.distinct.size
      (d >= k) || (sk.isExact && sk.estimate == d)
    })
  }

  test("estimator accuracy: within 3/sqrt(k) of truth on seeded uniform data") {
    val rnd = new scala.util.Random(42)
    val k = 256
    val truth = 20000
    val hs = (0 until truth).map(i => hash60(s"v$i-${rnd.nextInt()}"))
    val sk = fold(hs, k)
    assert(!sk.isExact)
    val err = math.abs(sk.estimate.toDouble - truth) / truth
    assert(err < 3.0 / math.sqrt(k), s"relative error $err vs bound ${3.0 / math.sqrt(k)}")
  }

  test("distributed Aggregator path matches the sequential sketch") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val k = 64
    val vals = (0 until 5000).map(i => s"u${i % 777}")
    val local = fold(vals.map(hash60), k)
    val dist = vals.toDF("v").repartition(7)
      .select(org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .as[Long]
      .select(new DistinctSketch.KmvAgg(k).toColumn)
      .head()
    assert(dist.hashes == local.hashes, "distributed sketch content must match sequential")
    assert(dist.estimate == local.estimate)
  }

  test("validation: k >= 2, mismatched-k merge rejected") {
    intercept[IllegalArgumentException](Kmv.empty(1))
    intercept[IllegalArgumentException](Kmv.empty(4).merge(Kmv.empty(8)))
  }
}
