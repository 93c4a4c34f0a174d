package graft.queries

import graft.SparkEntry
import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Closed-form checks of `Similarity.rankingMetrics` on handcrafted
  * rankings (perfect / reversed / empty system), plus invariants of the
  * registered `sim_ndcg_mrr` row beyond the oracle hash, and the
  * KVT-served `sim_index_lookup` reproducing the direct IVF path bit for
  * bit.
  */
class RankingMetricsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val disc = Similarity.discountPpm(3)

  private def truthDf(q: Long) = {
    import spark.implicits._
    // graded truth: cands 101..103 with gains 3,2,1 in ideal order
    Seq((q, 101L, 1, 3L), (q, 102L, 2, 2L), (q, 103L, 3, 1L))
      .toDF("query_id", "cand_id", "rank", "gain")
  }

  test("perfect ranking scores ndcg 1.0 and rr 1e6") {
    import spark.implicits._
    val sys = Seq((7L, 101L, 1), (7L, 102L, 2), (7L, 103L, 3))
      .toDF("query_id", "cand_id", "rank")
    val r = Similarity.rankingMetrics(sys, truthDf(7L), kMax = 3).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 1000000L)               // rr_ppm
    assert(r(0).getLong(2) === r(0).getLong(3))        // dcg == idcg
    assert(r(0).getDouble(4) === 1.0)                  // ndcg exactly 1.0
  }

  test("reversed ranking matches the hand-computed integer dcg") {
    import spark.implicits._
    val sys = Seq((7L, 103L, 1), (7L, 102L, 2), (7L, 101L, 3))
      .toDF("query_id", "cand_id", "rank")
    val r = Similarity.rankingMetrics(sys, truthDf(7L), kMax = 3).collect()(0)
    val expDcg = 1L * disc(0) + 2L * disc(1) + 3L * disc(2)
    val expIdcg = 3L * disc(0) + 2L * disc(1) + 1L * disc(2)
    assert(r.getLong(1) === 1000000L)                  // first hit at rank 1
    assert(r.getLong(2) === expDcg)
    assert(r.getLong(3) === expIdcg)
    assert(r.getDouble(4) === expDcg.toDouble / expIdcg.toDouble)
    assert(r.getDouble(4) < 1.0)
  }

  test("a system with no relevant results scores 0, not absence") {
    import spark.implicits._
    val sys = Seq((7L, 999L, 1)).toDF("query_id", "cand_id", "rank")
    val r = Similarity.rankingMetrics(sys, truthDf(7L), kMax = 3).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 0L && r(0).getLong(2) === 0L)
    assert(r(0).getDouble(4) === 0.0)
  }

  test("sim_ndcg_mrr: one row per truth query, metrics internally consistent") {
    val rows = SparkEntry.queries("sim_ndcg_mrr")(spark, sf).collect()
    assert(rows.length === 10) // probe queries vec_id < 10 all have truth
    rows.foreach { r =>
      val (rr, dcg, idcg, ndcg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(dcg >= 0 && dcg <= idcg, s"q ${r.getLong(0)}: dcg outside [0, idcg]")
      assert(ndcg === dcg.toDouble / idcg.toDouble)
      assert(rr >= 0 && rr <= 1000000L)
      // rr and dcg are zero together (both mean "no relevant hit")
      assert((rr == 0L) === (dcg == 0L))
    }
    // the LSH index is not useless on this fixture
    assert(rows.exists(_.getLong(2) > 0L), "every query missed — index broken")
  }

  test("sim_index_lookup reproduces the direct IVF path bit for bit") {
    import spark.implicits._
    val served = SparkEntry.queries("sim_index_lookup")(spark, sf).collect()
    val e = graft.Tables.embeddings(spark, sf)
    val direct = Similarity.ivfTopK(e, e.filter($"vec_id" < 10), k = 5)
      .select($"query_id", $"cand_id", $"rank", $"cos")
      .orderBy($"query_id", $"rank").collect()
    assert(served.nonEmpty)
    assert(served.length === direct.length)
    served.zip(direct).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0) && a.getLong(1) === b.getLong(1))
      assert(a.getInt(2) === b.getInt(2))
      assert(a.getDouble(3) === b.getDouble(3), s"cos differs at ${a.getLong(0)}/${a.getLong(1)}")
    }
  }
}
