package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** The KVT-served lexical search path must reproduce the batch BM25
  * path bit for bit through the index-build → store → bucket-read →
  * score round trip (both run the same integer arithmetic; the serving
  * pass derives df from the bucket it read and N/T from the meta row).
  */
class SearchLookupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("served top-k equals the batch BM25 top-k bit for bit") {
    val served = SparkEntry.queries("txt_search_lookup")(spark, sf).collect()
    val batch = SparkEntry.queries("txt_bm25_topk")(spark, sf).collect()
    assert(served.nonEmpty)
    assert(served.length === batch.length)
    served.zip(batch).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0), "doc_id order differs")
      assert(a.getLong(1) === b.getLong(1), s"n_terms differs at doc ${a.getLong(0)}")
      assert(a.getLong(2) === b.getLong(2), s"score_fp differs at doc ${a.getLong(0)}")
    }
  }
}
