package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: every native kernel is callable from plain
  * SQL (SparkSessionExtensions at construction, or registerAll on a live
  * session), with results identical to the Column API / core helpers.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.registerAll(s)
    s
  }

  test("native kernels are callable from SQL and match the core helpers") {
    val s = spark
    import s.implicits._
    Seq(("alpha beta gamma delta epsilon", "k1")).toDF("text", "key")
      .createOrReplaceTempView("gx_t")

    val row = s.sql(
      """SELECT hash_to_range(key) AS h,
        |  range_bucket(key, 8) AS b,
        |  sorted_intersect_size(array(1L, 3L, 7L), array(3L, 5L, 7L)) AS i,
        |  seq_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |          array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |  size(minhash_signature(array(11L, 22L, 33L, 44L), 3, 16)) AS msz,
        |  size(affine_minhash(array(11L, 22L, 33L), 32)) AS asz,
        |  size(winnowed_fingerprints(text, 8, 4)) AS wsz
        |FROM gx_t""".stripMargin).head()

    assert(row.getAs[Double]("h") == graft.core.RoutingKeyHash.hashToRange("k1"))
    assert(row.getAs[Int]("b") == graft.core.RoutingKeyHash.bucketForKey("k1", 8))
    assert(row.getAs[Int]("i") == 2)
    assert(row.getAs[Double]("d") == 1.5 * 2.0 + 2.0 * 0.5)
    assert(row.getAs[Int]("msz") == 16)
    assert(row.getAs[Int]("asz") == 32)
    assert(row.getAs[Int]("wsz") > 0)
  }

  test("non-literal size arguments are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), CAST(rand()*4 AS INT), 16)").head()
    }
    assert(e.getMessage.contains("INT literal"))
  }
}
