package graft.sources

import graft.SparkTestSession
import graft.core.StreamConfig
import graft.storage.GraftStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL control-plane surface: the DSv2 TableCatalog maps scopes to
  * namespaces and streams to tables, so stream DDL and reads run as
  * plain SQL (`StreamManager` semantics through `spark.sql`).
  */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-cat-sql").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.rootDir", dir)
    dir
  }

  test("namespace + table DDL and SQL reads over a live stream") {
    val g = new GraftStreams(spark, root)
    spark.sql("CREATE NAMESPACE graft.s1")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).contains("s1"))

    // CREATE TABLE with engine properties; columns omitted = event schema
    spark.sql("CREATE TABLE graft.s1.ev TBLPROPERTIES ('initialSegments' = '2')")
    assert(spark.sql("SHOW TABLES IN graft.s1").collect().map(_.getString(1)).contains("ev"))
    assert(g.catalog.getStream("s1", "ev").config.initialSegments == 2)

    g.writeEvents("s1", "ev", spark.range(400).select(
      concat(lit("k"), col("id") % 4).as("routingKey"),
      col("id").as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload")))

    assert(spark.sql("SELECT count(*) AS n FROM graft.s1.ev").head().getLong(0) === 400L)
    val perKey = spark.sql(
      """SELECT routingKey, count(*) AS n FROM graft.s1.ev
        |GROUP BY routingKey ORDER BY routingKey""".stripMargin).collect()
    assert(perKey.length === 4 && perKey.forall(_.getLong(1) == 100L))

    // catalog table + per-read cut option through the DataFrame reader
    val tail = g.catalog.getStream("s1", "ev").tailCut
    g.writeEvents("s1", "ev", spark.range(100).select(
      concat(lit("k"), col("id") % 4).as("routingKey"),
      (col("id") + 400L).as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload")))
    val cutJson = tail.positions.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val tailOnly = spark.read.option("fromStreamCut", cutJson).table("graft.s1.ev")
    assert(tailOnly.count() === 100L)

    // DROP TABLE = seal + delete; namespace cleanup cascades
    spark.sql("DROP TABLE graft.s1.ev")
    assert(!g.catalog.streamExists("s1", "ev"))
    spark.sql("DROP NAMESPACE graft.s1")
    assert(!g.catalog.scopeExists("s1"))
  }

  test("streaming read through the catalog table is a reader group") {
    val g = new GraftStreams(spark, root)
    g.catalog.createScope("s2")
    g.catalog.createStream("s2", "live", StreamConfig(initialSegments = 2))
    g.writeEvents("s2", "live", spark.range(250).select(
      concat(lit("k"), col("id") % 4).as("routingKey"),
      col("id").as("eventTime"),
      encode(col("id").cast("string"), "UTF-8").as("payload")))
    val q = spark.readStream.table("graft.s2.live")
      .writeStream.format("memory").queryName("cat_live").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-cat-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_live").count() === 250L)
      g.writeEvents("s2", "live", spark.range(50).select(
        concat(lit("k"), col("id") % 4).as("routingKey"),
        (col("id") + 250L).as("eventTime"),
        encode(col("id").cast("string"), "UTF-8").as("payload")))
      q.processAllAvailable()
      assert(spark.table("cat_live").count() === 300L)
    } finally q.stop()
  }

  test("fixed event schema is enforced on CREATE TABLE with columns") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.s3")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.s3.bad (wrong STRING, shape BIGINT)")
    }
    assert(spark.sql("SHOW TABLES IN graft.s3").collect().isEmpty)
  }
}
