package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataQuality on a synthetic dirty table with KNOWN defect counts — the
  * oracle row (`ds_dq_report`) pins the clean-corpus report; this pins the
  * violation arithmetic itself.
  */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dirty = Seq(
    // (id, v, s): ids 1,1 duplicated; v=-5 and v=999 out of [0, 100]; two null s
    (1L, 10.0, "ok"), (1L, 20.0, "ok"), (2L, -5.0, null),
    (3L, 999.0, "ok"), (4L, 50.0, null), (5L, 60.0, "ok"))
    .toDF("id", "v", "s")

  test("row-level report: exact violation counts, one row per check") {
    val r = DataQuality.report(dirty, Seq(
      DataQuality.Check("s_not_null", $"s".isNull),
      DataQuality.Check("v_in_range", $"v" < 0.0 || $"v" > 100.0),
      DataQuality.Check("never_fails", lit(false))))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    assert(r("s_not_null") === ((2L, 6L, false)))
    assert(r("v_in_range") === ((2L, 6L, false)))
    assert(r("never_fails") === ((0L, 6L, true)))
  }

  test("uniqueness and referential rows") {
    val u = DataQuality.uniquenessRow(dirty, "unique_id", $"id").head()
    assert((u.getLong(1), u.getBoolean(3)) === ((1L, false)))
    val dim = Seq(1L, 2L, 3L).toDF("pk") // ids 4, 5 are orphans
    val ref = DataQuality.referentialRow(dirty, "id_in_dim", $"id", dim, $"pk").head()
    assert((ref.getLong(1), ref.getLong(2), ref.getBoolean(3)) === ((2L, 6L, false)))
    // non-distinct dim keys must not fan the count out
    val dupDim = Seq(1L, 1L, 2L, 3L, 3L).toDF("pk")
    val ref2 = DataQuality.referentialRow(dirty, "id_in_dim", $"id", dupDim, $"pk").head()
    assert((ref2.getLong(1), ref2.getLong(2)) === ((2L, 6L)))
  }
}
