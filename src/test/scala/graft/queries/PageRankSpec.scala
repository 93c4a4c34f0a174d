package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the integer PageRank beyond the oracle
  * hash: the teleport floor, rank accrual to linked hosts, and the
  * fixture's known connectivity asymmetry (ads hosts co-occur with many
  * site hosts; each site host links only its doc's ads host).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("teleport floor, accrual, and ads-over-site dominance") {
    val rows = SparkEntry.queries("txt_host_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // every host holds at least the teleport mass
    assert(ranks.values.forall(_ >= 150000L))
    // linked hosts accrue above the floor
    val ads = ranks.filter(_._1.startsWith("ads."))
    val sites = ranks.filter(_._1.startsWith("www.site"))
    assert(ads.nonEmpty && sites.nonEmpty)
    assert(ads.values.forall(_ > 150000L), "every ads host has in-links")
    // the hub side of the bipartite fixture outranks the spoke side
    assert(ads.values.min > sites.values.max,
      "ads hosts (many in-links) must outrank site hosts (one link source)")
    // output is sorted (rank desc, host asc)
    val key = rows.map(r => (-r.getLong(1), r.getString(0)))
    assert(key.sameElements(key.sorted))
  }
}
