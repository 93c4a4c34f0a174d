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

  test("deleting a doc's postings removes it from served results, others keep rank order") {
    import spark.implicits._
    val ix = TextOps.buildSearchIndex(spark, sf)
    val before = TextOps.serveSearch(spark, ix).collect()
    val victim = before.head.getLong(0) // current top-ranked doc
    // the takedown path: remove every posting of one doc (pk = term
    // buckets are unknown to the caller — an sk-predicate scan finds
    // them; value-less keys shape, same as the index build)
    val victimKeys = ix.entries()
      .filter($"sk" === f"$victim%020d" && $"pk" =!= "\tmeta")
      .select($"pk", $"sk")
    ix.remove(victimKeys)
    val after = TextOps.serveSearch(spark, ix).collect()
    assert(!after.exists(_.getLong(0) == victim), "deleted doc still served")
    // the delete is immediately visible to MEMBERSHIP, and because this
    // serving design derives df from the bucket it reads, the victim
    // also leaves the corpus statistics at once (idf shifts for its
    // terms) — so assert the set-level contract, not score identity
    assert(after.length === before.length, "top-k should refill after the delete")
    assert(after.forall(r => r.getLong(1) >= 1L && r.getLong(2) > 0L))
  }
}
