package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC-driven index maintenance: an index seeded from the commit-1 state
  * and then fed ONLY `deltaSince(1)` must serve exactly the entries a
  * full rebuild from the resolved table would — stale retractions and
  * lost inserts both diverge the entry sets.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("incremental maintenance from the delta equals a full rebuild") {
    val work = java.nio.file.Files.createTempDirectory("graft-imnt").toString
    // replay the shared mutation history on a private table
    val t = new graft.kv.KeyValueTable(spark, work, "cust", partitionCount = 4)
    val c = Tables.customer(spark, sf).select(
      format_string("%08d", $"c_custkey").as("pk"), lit("").as("sk"),
      $"c_custkey", $"c_acctbal")
    t.put(c.select($"pk", $"sk", encode($"c_acctbal".cast("string"), "UTF-8").as("value")))
    t.put(c.filter($"c_custkey" % 3 === 0)
      .select($"pk", $"sk",
        encode(concat(lit("upd:"), $"c_acctbal".cast("string")), "UTF-8").as("value")))
    t.remove(c.filter($"c_custkey" % 7 === 0).select($"pk", $"sk"))

    // incremental: seed with the commit-1 categories, then apply the feed
    val inc = new graft.kv.KeyValueTable(spark,
      java.nio.file.Files.createTempDirectory("graft-iminc").toString, "ix", 4)
    inc.put(c.select(concat(lit("bas:"), $"pk").as("pk"), $"sk",
      encode(lit(""), "UTF-8").as("value")))
    KvQueries.maintainIndex(inc, t.deltaSince(1L))

    // rebuild: categories straight from the resolved table
    val rebuilt = t.entries()
      .select(concat(KvQueries.ixCat(decode($"value", "UTF-8")),
        lit(":"), $"pk").as("ixpk"))
    val served = inc.entries().select($"pk".as("ixpk"))
    assert(served.exceptAll(rebuilt).isEmpty,
      s"stale index entries: ${served.exceptAll(rebuilt).head(5).mkString("; ")}")
    assert(rebuilt.exceptAll(served).isEmpty,
      s"lost index entries: ${rebuilt.exceptAll(served).head(5).mkString("; ")}")
    // churn really happened: some upd entries exist, their bas twins don't
    assert(inc.entries().filter($"pk".startsWith("upd:")).count() > 0)
  }
}
