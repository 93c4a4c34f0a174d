package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** BM25 invariants the oracle row alone doesn't state, on a fixture
  * corpus with controlled term frequencies and document lengths. The
  * query terms are TextOps.Bm25Terms = (spark, stream, hash, window).
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("graft-bm25").toString
    // doc 1: "spark" x4 in 8 tokens   — high tf, short
    // doc 2: "spark" x1 in 8 tokens   — low tf, same length
    // doc 3: "spark" x1 in 24 tokens  — low tf, long (length-normalized down)
    // doc 4: no query terms           — must not appear
    // doc 5: all four query terms     — multi-term accumulation
    val rows = Seq(
      (1L, "spark spark spark spark pad pad pad pad"),
      (2L, "spark pad pad pad pad pad pad pad"),
      (3L, "spark " + Seq.fill(23)("pad").mkString(" ")),
      (4L, Seq.fill(8)("pad").mkString(" ")),
      (5L, "spark stream hash window pad pad pad pad"))
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25: tf monotone, length-normalized, non-matching docs absent") {
    val dir = fixtureDir()
    val out = SparkEntry.queries("txt_bm25_topk")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(4L), "doc with no query terms must not score")
    assert(out.contains(1L) && out.contains(2L) && out.contains(3L) && out.contains(5L))
    val score = out.view.mapValues(_._2).toMap
    assert(score(1L) > score(2L), s"higher tf must outrank: ${score(1L)} vs ${score(2L)}")
    assert(score(2L) > score(3L),
      s"same tf, shorter doc must outrank: ${score(2L)} vs ${score(3L)}")
    assert(out(5L)._1 === 4L, "doc 5 matches all four query terms")
    // multi-term accumulation: doc 5's four rarer terms (df=1 for three of
    // them) must outrank doc 2's single common-term hit
    assert(score(5L) > score(2L))
  }

  test("bm25: scores are positive and the result is capped at top-20") {
    val dir = fixtureDir()
    val rows = SparkEntry.queries("txt_bm25_topk")(spark, dir).collect()
    assert(rows.length <= 20)
    assert(rows.forall(_.getLong(2) > 0L), "quantized BM25 scores must stay positive")
    // sorted by (score desc, doc_id asc)
    val scores = rows.map(r => (r.getLong(2), r.getLong(0)))
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
  }
}
