package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r16 driver-result-bounded centroid prefix: the hash pre-filter
  * must never change WHICH rows the deterministic (h, vec_id) top-kFine
  * selects — only how many rows the TakeOrdered ships to the driver.
  * Pin row-identity between the filtered and direct paths, including
  * the undershoot fallback.
  */
class SemDedupCentroidPrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hashed = {
    val e = spark.range(3000).select(
      $"id".as("vec_id"),
      array((0 until 4).map(i => (($"id" + i) % 7).cast("float")): _*).as("embedding"),
      lit(1.0).as("nrm"))
    e.withColumn("h",
      conv(substring(md5($"vec_id".cast("string")), 1, 8), 16, 10).cast("long"))
  }

  private def prefix(gate: Long, kFine: Int): Seq[Long] =
    SimilarityOps.centroidPrefix(hashed, 3000L, kFine, gate)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq

  test("pre-filtered prefix selects exactly the rows of the direct sort") {
    val direct = prefix(gate = Long.MaxValue, kFine = 50) // never filters
    val filtered = prefix(gate = 0L, kFine = 50)          // always filters
    assert(direct.size == 50)
    assert(filtered == direct, "hash pre-filter changed the selected centroid prefix")
  }

  test("undershoot falls back to the unfiltered sort (kFine near n)") {
    // kFine ~ n/2 forces hCut past the uniform range's coverage for a
    // 4x overshoot only if the hash were skewed; with kFine close to n
    // the filter either keeps >= kFine rows (superset) or falls back —
    // both must reproduce the direct prefix exactly
    val direct = prefix(gate = Long.MaxValue, kFine = 1500)
    val filtered = prefix(gate = 0L, kFine = 1500)
    assert(filtered == direct)
  }
}
