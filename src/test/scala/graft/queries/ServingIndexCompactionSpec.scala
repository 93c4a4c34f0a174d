package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The serving tier inherits the KVT storage lifecycle: compacting the
  * stored index between build and serve must not change a single served
  * row — for the IVF ANN index and the lexical postings index alike.
  */
class ServingIndexCompactionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def assertSame(before: Array[org.apache.spark.sql.Row],
                         after: Array[org.apache.spark.sql.Row]): Unit = {
    assert(before.nonEmpty && before.length === after.length)
    before.zip(after).foreach { case (a, b) => assert(a === b) }
  }

  test("IVF ANN lookups are identical across index compaction") {
    val ix = SimilarityOps.buildIvfIndex(spark, sf)
    val before = SimilarityOps.serveIvf(spark, sf, ix).collect()
    ix.compact()
    val after = SimilarityOps.serveIvf(spark, sf, ix).collect()
    assertSame(before, after)
  }

  test("lexical search lookups are identical across index compaction") {
    val ix = TextOps.buildSearchIndex(spark, sf)
    val before = TextOps.serveSearch(spark, ix).collect()
    ix.compact()
    val after = TextOps.serveSearch(spark, ix).collect()
    assertSame(before, after)
  }
}
