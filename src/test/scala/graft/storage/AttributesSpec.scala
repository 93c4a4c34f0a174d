package graft.storage

import graft.SparkTestSession
import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Segment-attribute semantics (AttributesTests analog): the five
  * conditional update types, atomic batch behavior, auto-maintained
  * EVENT_COUNT.
  */
class AttributesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(): (GraftStreams, Long) = {
    val g = new GraftStreams(spark, Files.createTempDirectory("graft-attr").toString)
    g.catalog.createScope("s")
    val meta = g.catalog.createStream("s", "x", StreamConfig(initialSegments = 2))
    (g, meta.segments.head.segmentId)
  }

  test("update types: replace, accumulate, if-greater, if-equals CAS") {
    val (g, sid) = mk()
    assert(g.getSegmentAttribute("s", "x", sid, "a") == Attributes.NullValue)

    g.updateSegmentAttributes("s", "x", sid, Seq(AttributeUpdate("a", "REPLACE", 5)))
    assert(g.getSegmentAttribute("s", "x", sid, "a") == 5L)

    g.updateSegmentAttributes("s", "x", sid, Seq(AttributeUpdate("a", "ACCUMULATE", 3)))
    assert(g.getSegmentAttribute("s", "x", sid, "a") == 8L)

    g.updateSegmentAttributes("s", "x", sid, Seq(AttributeUpdate("a", "REPLACE_IF_GREATER", 10)))
    assert(g.getSegmentAttribute("s", "x", sid, "a") == 10L)
    assertThrows[ConditionalCheckFailedException] {
      g.updateSegmentAttributes("s", "x", sid, Seq(AttributeUpdate("a", "REPLACE_IF_GREATER", 7)))
    }
    assert(g.getSegmentAttribute("s", "x", sid, "a") == 10L)

    g.updateSegmentAttributes("s", "x", sid,
      Seq(AttributeUpdate("a", "REPLACE_IF_EQUALS", 42, comparisonValue = 10)))
    assert(g.getSegmentAttribute("s", "x", sid, "a") == 42L)
    assertThrows[ConditionalCheckFailedException] {
      g.updateSegmentAttributes("s", "x", sid,
        Seq(AttributeUpdate("a", "REPLACE_IF_EQUALS", 0, comparisonValue = 10)))
    }
    // REPLACE_IF_EQUALS against missing attribute uses the null sentinel
    g.updateSegmentAttributes("s", "x", sid,
      Seq(AttributeUpdate("fresh", "REPLACE_IF_EQUALS", 1, comparisonValue = Attributes.NullValue)))
    assert(g.getSegmentAttribute("s", "x", sid, "fresh") == 1L)
  }

  test("a failed condition aborts the whole atomic batch") {
    val (g, sid) = mk()
    g.updateSegmentAttributes("s", "x", sid, Seq(AttributeUpdate("x", "REPLACE", 1)))
    assertThrows[ConditionalCheckFailedException] {
      g.updateSegmentAttributes("s", "x", sid, Seq(
        AttributeUpdate("y", "REPLACE", 100),
        AttributeUpdate("x", "REPLACE_IF_GREATER", 0))) // fails
    }
    assert(g.getSegmentAttribute("s", "x", sid, "y") == Attributes.NullValue,
      "partial batch leaked")
  }

  test("EVENT_COUNT accumulates with every write commit") {
    val (g, _) = mk()
    def batch(n: Int) = spark.range(n).select(
      concat(lit("k"), col("id") % 7).as("routingKey"),
      (lit(1704067200000L) + col("id")).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))
    g.writeEvents("s", "x", batch(300))
    g.writeEvents("s", "x", batch(200))
    val meta = g.catalog.getStream("s", "x")
    val counts = meta.segments.map(s =>
      s.attributes.getOrElse(Attributes.EventCount, 0L))
    assert(counts.sum == 500L)
    meta.segments.foreach(s =>
      assert(s.attributes.getOrElse(Attributes.EventCount, 0L) == s.tailOffset,
        "EVENT_COUNT must equal rows appended (== tail offset here)"))
  }
}
