package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join equivalence: for any skewed input the salted plan must
  * return EXACTLY the rows of the plain equi-join (inner and
  * left-outer), while actually spreading the hot key across salts.
  */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of fact rows on key 0; dim covers only even keys → unmatched rows
  // exist; every 997th key is NULL → the no-match-but-survives-outer path
  private lazy val fact = spark.range(0, 20000).select(
    when($"id" % 997 === 0, lit(null).cast("long"))
      .when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 101).as("k"),
    $"id".as("fid"))
  private lazy val dim = spark.range(0, 51).select(
    ($"id" * 2).as("k"), concat(lit("d"), $"id").as("dv"))

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.select(coalesce($"k", lit(-1L)), $"fid", coalesce($"dv", lit("NULL")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("inner salted join == plain inner join, row for row") {
    val plain = canon(fact.join(dim, Seq("k")))
    val salted = canon(SaltedJoin.join(fact, dim, "k", saltCount = 8))
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("left-outer salted join == plain left-outer join, incl. unmatched rows") {
    val plain = canon(fact.join(dim, Seq("k"), "left_outer"))
    val salted = canon(SaltedJoin.join(fact, dim, "k", saltCount = 8, "left_outer"))
    assert(salted == plain)
    // the odd keys really are unmatched — the null path is exercised
    assert(plain.exists(_._3 == "NULL"))
  }

  test("the hot key actually spreads across salts") {
    val salts = fact.withColumn("__salt", pmod(hash(fact.columns.map(col): _*), lit(8)))
      .filter($"k" === 0).select($"__salt").distinct().count()
    assert(salts >= 6, s"hot key landed on only $salts of 8 salts")
  }

  test("saltCount = 1 degenerates to the plain join") {
    assert(canon(SaltedJoin.join(fact, dim, "k", 1)) == canon(fact.join(dim, Seq("k"))))
  }
}
