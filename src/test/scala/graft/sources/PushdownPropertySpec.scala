package graft.sources

import graft.core.{FileEntry, KeyRange, RoutingKeyHash, SegmentRecord}
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the manifest pruning predicate
  * (PushedPredicates): for EVERY generated manifest + filter set, a file
  * containing at least one row matching the conjunction of recognized
  * filters must be KEPT (`keepFile`) — pruning may only ever be
  * conservative. Rows are simulated explicitly (segmentId, routingKey,
  * eventTime triples inside the file's recorded bounds), the filters
  * evaluated brute-force, and the two answers compared. No SparkSession.
  */
class PushdownPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private case class Row(segmentId: Long, routingKey: String, eventTime: Long)

  private def eval(f: Filter, r: Row): Boolean = f match {
    case And(a, b) => eval(a, r) && eval(b, r)
    case EqualTo("eventTime", v: Long) => r.eventTime == v
    case In("eventTime", vs) => vs.contains(r.eventTime: Any)
    case GreaterThan("eventTime", v: Long) => r.eventTime > v
    case GreaterThanOrEqual("eventTime", v: Long) => r.eventTime >= v
    case LessThan("eventTime", v: Long) => r.eventTime < v
    case LessThanOrEqual("eventTime", v: Long) => r.eventTime <= v
    case EqualTo("segmentId", v: Long) => r.segmentId == v
    case In("segmentId", vs) => vs.contains(r.segmentId)
    case EqualTo("routingKey", v: String) => r.routingKey == v
    case In("routingKey", vs) => vs.contains(r.routingKey: Any)
    case _ => true // unrecognized shapes never contribute to pruning
  }

  private val keyGen: Gen[String] = Gen.chooseNum(0, 30).map(i => s"k$i")

  // a 4-segment epoch tiling [0,1)
  private val segments: Seq[SegmentRecord] = (0 until 4).map { i =>
    SegmentRecord(i.toLong, i / 4.0, (i + 1) / 4.0, 0L, 1000L,
      isSealed = false, parents = Nil, createdAt = 0L)
  }
  private def segOf(key: String): SegmentRecord = {
    val d = RoutingKeyHash.hashToRange(key)
    segments.find(s => KeyRange(s.keyLow, s.keyHigh).contains(d)).get
  }

  private val filterGen: Gen[Filter] = {
    val t = Gen.chooseNum(-100L, 1100L)
    Gen.oneOf[Filter](
      t.map(GreaterThan("eventTime", _)),
      t.map(GreaterThanOrEqual("eventTime", _)),
      t.map(LessThan("eventTime", _)),
      t.map(LessThanOrEqual("eventTime", _)),
      t.map(EqualTo("eventTime", _)),
      Gen.listOfN(3, t).map(vs => In("eventTime", vs.toArray[Any])),
      Gen.chooseNum(0L, 4L).map(EqualTo("segmentId", _)),
      Gen.listOfN(2, Gen.chooseNum(0L, 4L)).map(vs => In("segmentId", vs.toArray[Any])),
      keyGen.map(EqualTo("routingKey", _)),
      Gen.listOfN(3, keyGen).map(ks => In("routingKey", ks.toArray[Any])),
      // shapes the pruner must ignore (keep everything they alone match)
      keyGen.map(k => Not(EqualTo("routingKey", k))),
      Gen.const(IsNotNull("payload")))
  }

  test("keepFile never prunes a file holding a matching row") {
    val caseGen = for {
      filters <- Gen.listOf(filterGen).map(_.take(4))
      nRows <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(nRows, for {
        key <- keyGen
        et <- Gen.chooseNum(0L, 1000L)
      } yield (key, et))
    } yield (filters, rows)

    check(Prop.forAll(caseGen) { case (filters, rowSpecs) =>
      val pushed = PushedPredicates.from(filters.toArray)
      // group simulated rows into per-segment files with EXACT recorded
      // time bounds, the way commitFiles derives them from footers
      val rows = rowSpecs.map { case (k, et) => Row(segOf(k).segmentId, k, et) }
      rows.groupBy(_.segmentId).forall { case (sid, rs) =>
        val f = FileEntry(sid, s"f$sid", 0L, rs.size.toLong,
          rs.map(_.eventTime).min, rs.map(_.eventTime).max)
        val hasMatch = rs.exists(r => filters.forall(eval(_, r)))
        val kept = pushed.keepFile(f, segments.find(_.segmentId == sid))
        // conservative: a match forces keep; no constraint the other way
        !hasMatch || kept
      }
    })
  }

  test("and() composition stays conservative") {
    val caseGen = for {
      fa <- Gen.listOf(filterGen).map(_.take(3))
      fb <- Gen.listOf(filterGen).map(_.take(3))
      key <- keyGen
      et <- Gen.chooseNum(0L, 1000L)
    } yield (fa, fb, key, et)

    check(Prop.forAll(caseGen) { case (fa, fb, key, et) =>
      val row = Row(segOf(key).segmentId, key, et)
      val matches = (fa ++ fb).forall(eval(_, row))
      val f = FileEntry(row.segmentId, "f", 0L, 1L, et, et)
      val kept = PushedPredicates.from(fa.toArray).and(PushedPredicates.from(fb.toArray))
        .keepFile(f, segments.find(_.segmentId == row.segmentId))
      !matches || kept
    })
  }

  test("keepStream honors only stream filters, conservatively") {
    val gen = for {
      keys <- Gen.listOfN(2, Gen.oneOf("s/a", "s/b", "s/c"))
      probe <- Gen.oneOf("s/a", "s/b", "s/c")
    } yield (keys, probe)
    check(Prop.forAll(gen) { case (keys, probe) =>
      val p = PushedPredicates.from(Array[Filter](In("stream", keys.toArray[Any])))
      p.keepStream(probe) == keys.contains(probe)
    })
  }
}
