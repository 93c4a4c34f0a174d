package graft.sources

import graft.SparkTestSession
import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL stored procedures (`CALL cat.system.<proc>`) over the engine's
  * maintenance plane: every call runs through Spark's ProcedureCatalog
  * binding (argument coercion included) and returns its outcome as a
  * relation; engine effects are verified against the manifest.
  */
class GraftProceduresSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Spark caches catalog instances by name, so each fixture registers
    * a FRESH catalog name pointing at its own root.
    */
  private def fixture(): (GraftStreams, String) = {
    val root = Files.createTempDirectory("graft-proc").toString
    val cat = s"gproc${n.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.rootDir", root)
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s")
    g.catalog.createStream("s", "ev", StreamConfig(initialSegments = 2))
    (0 until 3).foreach { i =>
      g.writeEvents("s", "ev", (0 until 100)
        .map(j => (s"k$j", j.toLong, s"b$i-$j")).toDF("routingKey", "eventTime", "p")
        .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload")))
    }
    (g, cat)
  }

  test("redact scrubs one routing key's payloads through SQL") {
    val (g, cat) = fixture()
    val row = spark.sql(s"CALL $cat.system.redact('s', 'ev', 'k5')").head()
    assert(row.getLong(0) === 3L) // one row per write batch
    val k5 = g.readEvents("s", "ev").filter($"routingKey" === "k5")
    assert(k5.count() === 3L, "redacted rows must survive with their offsets")
    assert(k5.filter(length($"payload") > 0).count() === 0L)
    assert(g.readEvents("s", "ev").filter(length($"payload") === 0).count() === 3L,
      "only the target key may be scrubbed")
  }

  test("gc_manifests retires stream log history through SQL") {
    val (g, cat) = fixture() // 3 write batches → tip v3
    (3 until 20).foreach { i =>
      g.writeEvents("s", "ev", Seq((s"k$i", i.toLong, s"b$i")).toDF("routingKey", "eventTime", "p")
        .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload")))
    }
    val tip = g.catalog.getStream("s", "ev").version
    g.catalog.flushCheckpoints()
    val row = spark.sql(s"CALL $cat.system.gc_manifests('s', 'ev', 2)").head()
    val floor = row.getLong(1)
    assert(row.getLong(0) > 0L && floor > 0L && floor <= tip - 2)
    assert(floor % 16 == 0L, "floor must land on a checkpoint-eligible version")
    // data reads unaffected; as-of below the floor fails loudly
    assert(g.readEvents("s", "ev").count() == 300L + 17L)
    intercept[Exception](g.catalog.getStreamAt("s", "ev", 1L))
    assert(spark.sql(s"CALL $cat.system.fsck('s')")
      .select("kind").as[String].head() == "clean")
  }

  test("kv_gc_manifests retires kv history through SQL") {
    val (g, cat) = fixture()
    g.catalog.createKeyValueTable("s", "kt", graft.catalog.KvTableConfig(partitionCount = 4))
    val t = g.catalog.openKeyValueTable(spark, "s", "kt")
    for (i <- 1 to 6)
      t.put(Seq((s"k$i", "", s"v$i")).toDF("pk", "sk", "v")
        .select($"pk", $"sk", encode($"v", "UTF-8").as("value")))
    val row = spark.sql(s"CALL $cat.system.kv_gc_manifests('s', 'kt', 2)").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 4L) // 1..3 retired, floor 4
    assert(t.entries().count() == 6L)
    assert(spark.sql(s"CALL $cat.system.kv_fsck('s', 'kt')").as[String].head() == "clean")
  }

  test("describe_retention: the ops-loop twin of fsck, before and after gc") {
    val (g, cat) = fixture() // 3 write batches → tip v3
    // never-GC'd: floor 0, no anchor, whole chain retained, base trivially ok
    val pre = spark.sql(s"CALL $cat.system.describe_retention('s', 'ev')").head()
    assert(pre.getLong(0) == 0L && pre.getLong(1) == 0L)
    assert(!pre.getBoolean(4) && pre.getBoolean(7))
    val tip0 = g.catalog.getStream("s", "ev").version
    assert(pre.getLong(5) == tip0 && pre.getLong(6) == tip0 + 1L) // v0 rides along
    (3 until 20).foreach { i =>
      g.writeEvents("s", "ev", Seq((s"k$i", i.toLong, s"b$i")).toDF("routingKey", "eventTime", "p")
        .select($"routingKey", $"eventTime", encode($"p", "UTF-8").as("payload")))
    }
    g.catalog.flushCheckpoints()
    assert(spark.sql(s"CALL $cat.system.gc_manifests('s', 'ev', 2)").head().getLong(0) > 0L)
    val row = spark.sql(s"CALL $cat.system.describe_retention('s', 'ev')").head()
    val floor = g.catalog.manifestFloor("s", "ev")
    val tip = g.catalog.getStream("s", "ev")
    assert(row.getLong(0) == floor && floor > 0L)
    assert(row.getLong(1) == 1L, "first advance = chain seq 1")
    assert(row.getString(2) == tip.incarnation && row.getString(3) == tip.incarnation,
      "the floor must be stamped by the live incarnation")
    assert(row.getBoolean(4), "anchor present after the first gc")
    assert(row.getLong(5) == tip.version)
    assert(row.getLong(6) == tip.version - floor + 2L)
    assert(row.getBoolean(7), "checkpoint base must reconstruct")

    // KVT twin
    g.catalog.createKeyValueTable("s", "kt", graft.catalog.KvTableConfig(partitionCount = 4))
    val t = g.catalog.openKeyValueTable(spark, "s", "kt")
    for (i <- 1 to 6)
      t.put(Seq((s"k$i", "", s"v$i")).toDF("pk", "sk", "v")
        .select($"pk", $"sk", encode($"v", "UTF-8").as("value")))
    spark.sql(s"CALL $cat.system.kv_gc_manifests('s', 'kt', 2)").head()
    val kv = spark.sql(s"CALL $cat.system.kv_describe_retention('s', 'kt')").head()
    assert(kv.getLong(0) == 4L && kv.getLong(1) == 1L)
    assert(kv.getString(2) == t.incarnation && kv.getString(3) == t.incarnation)
    assert(kv.getBoolean(4) && kv.getLong(5) == 6L && kv.getLong(6) == 3L)
  }

  test("compact folds the manifest and reports before/after file counts") {
    val (g, cat) = fixture()
    val before = g.catalog.getStream("s", "ev").files.size
    val row = spark.sql(s"CALL $cat.system.compact('s', 'ev')").head()
    assert(row.getLong(0) == before && row.getLong(1) < before)
    assert(g.readEvents("s", "ev").count() == 300)
  }

  test("truncate_at raises the head and returns the cut") {
    val (g, cat) = fixture()
    val cut = spark.sql(s"CALL $cat.system.truncate_at('s', 'ev', 100)").head().getString(0)
    assert(cut.nonEmpty && cut.contains(":"))
    val head = g.catalog.getStream("s", "ev").headStreamCut
    assert(head.positions.values.sum >= 100)
    assert(g.readEvents("s", "ev").count() == 300 - head.positions.values.sum)
  }

  test("scale_to changes the open-segment count") {
    val (g, cat) = fixture()
    val row = spark.sql(s"CALL $cat.system.scale_to('s', 'ev', 5)").head()
    assert(row.getInt(0) == 2 && row.getInt(1) == 5)
    assert(g.catalog.getStream("s", "ev").segments.count(!_.isSealed) == 5)
  }

  test("save_cut registers a named cut; maintenance and sweep run clean") {
    val (g, cat) = fixture()
    spark.sql(s"CALL $cat.system.save_cut('s', 'ev', 'ck')").collect()
    assert(g.getStreamCut("s", "ev", "ck").nonEmpty)
    val m = spark.sql(s"CALL $cat.system.maintenance('s', 'ev')").head()
    assert(m.getInt(0) >= 0)
    val swept = spark.sql(s"CALL $cat.system.sweep('s', 'ev', 0)").collect()
    assert(swept.nonEmpty) // at least the "none" row
  }

  test("fsck returns clean for an intact scope; seal closes the stream") {
    val (g, cat) = fixture()
    val rows = spark.sql(s"CALL $cat.system.fsck('s')").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "clean", rows.mkString(";"))
    assert(spark.sql(s"CALL $cat.system.seal('s', 'ev')").head().getBoolean(0))
    assert(g.catalog.getStream("s", "ev").isSealed)
  }

  test("KV-table procedures: compact, sweep, fsck over a catalog-created table") {
    val (g, cat) = fixture()
    g.catalog.createKeyValueTable("s", "kt")
    val t = g.catalog.openKeyValueTable(spark, "s", "kt")
    t.put(Seq(("a", "", "1"), ("b", "", "2")).toDF("pk", "sk", "v")
      .select($"pk", $"sk", encode($"v", "UTF-8").as("value")))
    t.put(Seq(("a", "", "3")).toDF("pk", "sk", "v")
      .select($"pk", $"sk", encode($"v", "UTF-8").as("value")))
    assert(spark.sql(s"CALL $cat.system.kv_compact('s', 'kt')").head().getLong(0) == 2L)
    val sw = spark.sql(s"CALL $cat.system.kv_sweep('s', 'kt', 0)").head()
    assert(sw.getInt(0) >= 0 && sw.getInt(1) >= 0)
    val fs = spark.sql(s"CALL $cat.system.kv_fsck('s', 'kt')").collect()
    assert(fs.length == 1 && fs.head.getString(0) == "clean", fs.mkString(";"))
    assert(t.get("a").map(p => new String(p._1)) == Some("3"))
  }

  test("byte-stream procedures: bs_fsck names a crashed-writer leak, bs_sweep reclaims it") {
    val (g, cat) = fixture()
    val bs = new graft.storage.ByteStreams(g.rootDir)
    bs.create("s", "bytes")
    bs.append("s", "bytes", Array.fill[Byte](64)(1))
    // '' = default to this catalog's root
    assert(spark.sql(s"CALL $cat.system.bs_fsck('', 's', 'bytes')")
      .head().getString(0) == "clean")
    // crashed-writer leftover: an uncommitted chunk past the committed tail
    val leak = new java.io.File(s"${g.rootDir}/s/bytes/chunk-0000000000000100")
    java.nio.file.Files.write(leak.toPath, Array.fill[Byte](8)(9))
    val issues = spark.sql(s"CALL $cat.system.bs_fsck('', 's', 'bytes')")
      .collect().map(_.getString(0))
    assert(issues.exists(_.startsWith("uncommitted-chunk")), issues.mkString(";"))
    val swept = spark.sql(s"CALL $cat.system.bs_sweep('', 's', 'bytes', 0)")
      .collect().map(_.getString(0))
    assert(swept.exists(_.contains("chunk-0000000000000100")), swept.mkString(";"))
    assert(!leak.exists)
    assert(spark.sql(s"CALL $cat.system.bs_fsck('', 's', 'bytes')")
      .head().getString(0) == "clean")
    // explicit-root form: byte streams outside the catalog root are
    // reachable too (they carry no catalog identity)
    val other = Files.createTempDirectory("graft-bs-proc").toString
    val bs2 = new graft.storage.ByteStreams(other)
    bs2.create("sc", "b2")
    bs2.append("sc", "b2", Array.fill[Byte](32)(2))
    assert(spark.sql(s"CALL $cat.system.bs_fsck('$other', 'sc', 'b2')")
      .head().getString(0) == "clean")
    assert(spark.sql(s"CALL $cat.system.bs_sweep('$other', 'sc', 'b2', 0)")
      .head().getString(0) == "none")
  }

  test("unknown procedure and wrong namespace fail loudly") {
    val (_, cat) = fixture()
    intercept[Exception](spark.sql(s"CALL $cat.system.nope('s')").collect())
    intercept[Exception](spark.sql(s"CALL $cat.other.compact('s', 'ev')").collect())
  }
}
