package graft.queries

import graft.SparkEntry
import graft.kv.KeyValueTable
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The model registry inherits the KVT lifecycle: registering a new
  * model version supersedes the old at `entries()`, while `entriesAt`
  * still serves the superseded version — model rollback without any
  * registry-specific code. Plus invariants of the registered
  * `txt_model_registry` row beyond the oracle hash.
  */
class ModelRegistrySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def weightsDf(name: String, ws: Seq[(Long, Long)]) = {
    import spark.implicits._
    ws.toDF("b", "w").select(lit(name).as("pk"),
      format_string("%05d", $"b").as("sk"),
      encode($"w".cast("string"), "UTF-8").as("value"))
  }

  private def readWeights(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    import spark.implicits._
    df.select($"sk".cast("long"), decode($"value", "UTF-8").cast("long"))
      .as[(Long, Long)].collect().toMap
  }

  test("model rollback: entriesAt serves the superseded version after an update") {
    val work = java.nio.file.Files.createTempDirectory("graft-modelreg").toString
    val reg = new KeyValueTable(spark, work, "models", partitionCount = 4)
    val v1 = reg.put(weightsDf("m", Seq(1L -> 10L, 2L -> -7L, 3L -> 4L)))
    reg.put(weightsDf("m", Seq(1L -> 11L, 2L -> -9L))) // retrain touches buckets 1-2
    assert(readWeights(reg.entries()) === Map(1L -> 11L, 2L -> -9L, 3L -> 4L),
      "latest = v2 weights upserted per key over v1")
    assert(readWeights(reg.entriesAt(v1)) === Map(1L -> 10L, 2L -> -7L, 3L -> 4L),
      "rollback read must serve exactly the v1 model")
  }

  test("txt_model_registry: confusion cells carry sign-consistent margins, cover the corpus") {
    val rows = SparkEntry.queries("txt_model_registry")(spark, sf).collect()
    assert(rows.length >= 2, "at least two (pred, lang) cells expected")
    rows.foreach { r =>
      val (pred, n, sum) = (r.getString(0), r.getLong(2), r.getLong(3))
      assert(n >= 1L)
      if (pred == "en") assert(sum > 0L, s"en×${r.getString(1)} must carry positive margin sum")
      else assert(sum <= 0L, s"other×${r.getString(1)} holds non-positive margins")
    }
    val corpus = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === corpus, "every doc scored exactly once")
  }
}
