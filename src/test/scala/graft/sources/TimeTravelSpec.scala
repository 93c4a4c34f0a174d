package graft.sources

import graft.SparkTestSession
import graft.core.{StreamConfig, NoSuchStreamException}
import graft.storage.GraftStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Time travel over stream tables: `asOfVersion` pins a batch read to
  * one committed manifest (the CAS history as a queryable dimension),
  * through both the DataFrame option and the SQL catalog's
  * VERSION AS OF / TIMESTAMP AS OF. Historical tables are immutable:
  * writes, streaming reads and TRUNCATE are rejected at plan time.
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(): (GraftStreams, String, Long, Long) = {
    val root = Files.createTempDirectory("graft-tt").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    def batch(tag: String, n: Int) =
      (0 until n).map(i => (s"k${i % 5}", i.toLong, s"$tag-$i"))
        .toDF("routingKey", "eventTime", "p")
        .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload"))
    g.writeEvents("s", "ev", batch("a", 40))
    val vA = g.catalog.getStream("s", "ev").version
    Thread.sleep(30) // separate manifest commit times for TIMESTAMP AS OF
    val tMid = System.currentTimeMillis()
    Thread.sleep(30)
    g.writeEvents("s", "ev", batch("b", 25))
    (g, root, vA, tMid)
  }

  private def readAt(root: String, v: Long) =
    spark.read.format("graft-stream")
      .option("rootDir", root).option("scope", "s").option("stream", "ev")
      .option("asOfVersion", v.toString).load()

  test("asOfVersion option pins the read to the historical manifest") {
    val (g, root, vA, _) = fixture()
    assert(readAt(root, vA).count() == 40)
    assert(readAt(root, g.catalog.getStream("s", "ev").version).count() == 65)
    // the live read still sees everything
    assert(g.readEvents("s", "ev").count() == 65)
  }

  test("pinned version survives later appends between plan and action") {
    val (g, root, vA, _) = fixture()
    val df = readAt(root, vA) // plan now...
    g.writeEvents("s", "ev", Seq(("k9", 99L, "c"))
      .toDF("routingKey", "eventTime", "p")
      .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload")))
    assert(df.count() == 40) // ...act after another commit
  }

  test("TIMESTAMP AS OF resolves by manifest commit time through the SQL catalog") {
    val (_, root, _, tMid) = fixture()
    spark.conf.set("spark.sql.catalog.gtt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt.rootDir", root)
    val ts = new java.sql.Timestamp(tMid)
    assert(spark.sql(s"SELECT count(*) FROM gtt.s.ev TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 40)
    assert(spark.sql("SELECT count(*) FROM gtt.s.ev").head().getLong(0) == 65)
  }

  test("a nonexistent version fails at resolution, naming the available history") {
    val (_, root, _, _) = fixture()
    spark.conf.set("spark.sql.catalog.gtt2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt2.rootDir", root)
    val e = intercept[Exception](spark.sql("SELECT * FROM gtt2.s.ev VERSION AS OF 9999").collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[NoSuchStreamException]), e.toString)
  }

  test("version-diff read: (fromVersion, toVersion] is exactly the rows of the commits between") {
    val (g, root, vA, _) = fixture() // v(A)=40 rows, then +25
    val vB = g.catalog.getStream("s", "ev").version
    g.writeEvents("s", "ev", Seq(("k1", 7L, "c-0"))
      .toDF("routingKey", "eventTime", "p")
      .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload")))
    def changes(opts: Map[String, String]) = {
      val r = spark.read.format("graft-stream")
        .option("rootDir", root).option("scope", "s").option("stream", "ev")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load()
    }
    val mid = changes(Map("fromVersion" -> vA.toString, "toVersion" -> vB.toString))
    assert(mid.count() == 25)
    assert(mid.select(decode($"payload", "UTF-8")).as[String].collect().forall(_.startsWith("b-")))
    // open-ended: changes since vA = everything after it, tracking the live tail
    assert(changes(Map("fromVersion" -> vA.toString)).count() == 26)
    // degenerate: empty window
    assert(changes(Map("fromVersion" -> vA.toString, "toVersion" -> vA.toString)).count() == 0)
    // conflicts are rejected at option parsing
    intercept[IllegalArgumentException](
      changes(Map("fromVersion" -> vB.toString, "toVersion" -> vA.toString)).count())
    intercept[IllegalArgumentException](
      changes(Map("fromVersion" -> vA.toString, "fromStreamCut" -> "{}")).count())
  }

  test("multi-stream reads pin PER STREAM via asOfVersion.<scope/stream>") {
    val root = Files.createTempDirectory("graft-ttm").toString
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    def batch(st: String, n: Int) = {
      g.catalog.createStream("s", st, StreamConfig(initialSegments = 2))
      (0 until n).map(i => (s"k$i", i.toLong, st))
        .toDF("routingKey", "eventTime", "p")
        .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload"))
    }
    g.writeEvents("s", "a", batch("a", 10))
    val vA = g.catalog.getStream("s", "a").version
    g.writeEvents("s", "a", batch2(g, "a", 5))
    g.writeEvents("s", "b", batch("b", 20))
    val vB = g.catalog.getStream("s", "b").version
    g.writeEvents("s", "b", batch2(g, "b", 7))
    val df = spark.read.format("graft-stream")
      .option("rootDir", root).option("streams", "s/a,s/b")
      .option("asOfVersion.s/a", vA.toString)
      .option("asOfVersion.s/b", vB.toString)
      .load()
    val counts = df.groupBy($"stream").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s/a" -> 10L, "s/b" -> 20L), counts.toString)
    // per-sub pins also reject streaming reads
    intercept[Exception] {
      spark.readStream.format("graft-stream")
        .option("rootDir", root).option("streams", "s/a,s/b")
        .option("asOfVersion.s/a", vA.toString)
        .load()
        .writeStream.format("memory").queryName("ttm_no").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
  }

  private def batch2(g: GraftStreams, st: String, n: Int) = {
    (0 until n).map(i => (s"x$i", 100L + i, s"$st-late"))
      .toDF("routingKey", "eventTime", "p")
      .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload"))
  }

  test("catalog-table reads honor per-read pacing and version options (whitelist overlay)") {
    val (g, root, vA, _) = fixture()
    spark.conf.set("spark.sql.catalog.gtt3", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt3.rootDir", root)
    // version option through the catalog table's read overlay
    assert(spark.read.option("asOfVersion", vA.toString).table("gtt3.s.ev").count() == 40)
    // byte pacing through readStream.table: must reach the source config
    val q = spark.readStream.option("maxBytesPerTrigger", "256").table("gtt3.s.ev")
      .writeStream.format("memory").queryName("ttcat").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ttcat").count() == 65)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 2, s"byte cap must pace the catalog-table stream, got $batches")
    } finally q.stop()
  }

  test("historical tables reject writes, streaming reads and pushdown stays active") {
    val (_, root, vA, _) = fixture()
    val err = intercept[Exception] {
      Seq(("k", 1L, Array[Byte](1))).toDF("routingKey", "eventTime", "payload")
        .write.format("graft-stream")
        .option("rootDir", root).option("scope", "s").option("stream", "ev")
        .option("asOfVersion", vA.toString).mode("append").save()
    }
    assert(err.getMessage.contains("time-travel") ||
      Option(err.getCause).exists(_.getMessage.contains("time-travel")), err.toString)
    val serr = intercept[Exception] {
      spark.readStream.format("graft-stream")
        .option("rootDir", root).option("scope", "s").option("stream", "ev")
        .option("asOfVersion", vA.toString).load()
        .writeStream.format("memory").queryName("tt_no").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(serr).exists(c =>
      Option(c.getMessage).exists(_.contains("batch-read surface"))), serr.toString)
    // predicate pushdown works on the historical scan too
    val pruned = readAt(root, vA).filter($"eventTime" >= 20)
    assert(pruned.count() == 20)
  }
}
