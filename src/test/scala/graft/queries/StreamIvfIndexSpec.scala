package graft.queries

import graft.SparkEntry
import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The streamed IVF index (engine write → paced triggers → assignment
  * kernel → keyed state) must equal the batch-built inverted file
  * exactly, and every corpus vector must be indexed exactly once.
  */
class StreamIvfIndexSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed inverted file equals the batch assignment, covers the corpus") {
    val streamed = SparkEntry.queries("ev_stream_ivf_index")(spark, sf).collect()
    val e = graft.Tables.embeddings(spark, sf)
    val batch = Similarity.ivfAssign(e, Similarity.ivfCentroids(Similarity.ivfCentsDf(e)))
      .groupBy(col("c_id"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("c_id")).collect()
    assert(streamed.nonEmpty && streamed.length === batch.length)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0) && a.getLong(1) === b.getLong(1) &&
        a.getLong(2) === b.getLong(2), s"centroid ${a.getLong(0)} differs")
    }
    assert(streamed.map(_.getLong(1)).sum === e.count(), "index must cover every vector once")
  }

  test("drift monitor: per-centroid mean is exactly sum/n, bounded by cos range") {
    val rows = SparkEntry.queries("ev_stream_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum, mean) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n >= 1L)
      assert(mean === sum.toDouble / n.toDouble)
      assert(mean >= -1000000.0 && mean <= 1000000.0, "quantized cosine out of range")
    }
    val e = graft.Tables.embeddings(spark, sf)
    assert(rows.map(_.getLong(1)).sum === e.count(), "every ingested vector scored once")
  }
}
