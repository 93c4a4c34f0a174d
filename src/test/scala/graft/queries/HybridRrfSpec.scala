package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the hybrid-RRF fusion row beyond the oracle
  * hash: the integer fusion arithmetic is self-consistent with the rank
  * columns the row itself reports, membership requires at least one arm,
  * and fusion rewards dual-arm membership.
  */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rrfOf(rank: Option[Long]): Long =
    rank.map(r => 1000000L / (60L + r)).getOrElse(0L)

  test("rrf_fp equals the reciprocal-rank sum of its own rank columns") {
    val rows = SparkEntry.queries("sim_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vec = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.isDefined || vec.isDefined, s"doc ${r.getLong(0)} in neither arm")
      assert(r.getLong(3) === rrfOf(lex) + rrfOf(vec),
        s"doc ${r.getLong(0)}: rrf_fp mismatch")
      lex.foreach(v => assert(v >= 1 && v <= 50))
      vec.foreach(v => assert(v >= 1 && v <= 50))
    }
    // sorted by (rrf desc, doc_id asc)
    val key = rows.map(r => (-r.getLong(3), r.getLong(0)))
    assert(key.sameElements(key.sorted))
  }

  test("dual-arm members outrank the best single-arm member of equal arm rank") {
    val rows = SparkEntry.queries("sim_hybrid_rrf")(spark, sf).collect()
    val dual = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    // fixture-independent weak form: any dual member with BOTH ranks <= r
    // beats any single member whose one rank is >= r
    for (d <- dual; s <- single) {
      val dMax = math.max(d.getLong(1), d.getLong(2))
      val sRank = if (s.isNullAt(1)) s.getLong(2) else s.getLong(1)
      if (dMax <= sRank)
        assert(d.getLong(3) > s.getLong(3),
          s"dual doc ${d.getLong(0)} (ranks <= $dMax) must outscore " +
            s"single doc ${s.getLong(0)} (rank $sRank)")
    }
  }
}
