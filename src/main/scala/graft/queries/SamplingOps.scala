package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-splitting operators — the last mile
  * of a training-data pipeline. Both are hash-based (md5, identical in
  * DuckDB), so assignments are reproducible across engines, runs and
  * cluster sizes: no RNG state, no driver coordination, one map-side
  * projection plus the demo aggregation.
  */
object SamplingOps {

  /** 80/10/10 train/val/test split by content-independent key hash:
    * bucket = first 8 md5 hex chars of the doc id as int mod 100.
    * Per-(source, split) counts are the checked output.
    */
  private def trainSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long") % 100)
      .withColumn("split",
        when($"bucket" < 80, "train").when($"bucket" < 90, "val").otherwise("test"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n"))
      .orderBy($"source", $"split")
  }

  private val trainSplitSql =
    """SELECT source,
      |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n
      |FROM (
      |  SELECT source,
      |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      |  FROM documents) t
      |GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  /** Stratified sample: the 5 smallest hash-ranked docs per (source,
    * lang) stratum — reproducible uniform-without-replacement sampling
    * as a ranking window over the hash order.
    */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"source", $"lang")
      .orderBy($"h", $"doc_id")
    Tables.documents(s, dir)
      .withColumn("h", md5($"doc_id".cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"source", $"lang", $"rk".cast("long").as("rk"), $"doc_id")
      .orderBy($"source", $"lang", $"rk")
  }

  private val stratifiedSampleSql =
    """SELECT source, lang, rk, doc_id FROM (
      |  SELECT source, lang, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source, lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM documents) t
      |WHERE rk <= 5
      |ORDER BY source, lang, rk""".stripMargin

  /** Deterministic source interleave: each source's docs are hash-ranked
    * (reproducible shuffle), then round-robined across the 20 sources —
    * the data-mixing schedule that feeds heterogeneous sources into a
    * training run at fixed proportions. `pos = (rank-1)·20 + src_idx`
    * is a total order; the first 3 rounds are the checked output.
    *
    * Scale: one rank window per source (range-partitioned sort at real
    * scale) and a map-side projection — no cross-source coordination.
    */
  private def interleave(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(s, dir)
      .withColumn("h", md5($"doc_id".cast("string")))
      .withColumn("rk", row_number().over(w))
      .withColumn("src_idx", regexp_extract($"source", "(\\d+)", 1).cast("long"))
      .withColumn("pos", ($"rk".cast("long") - 1L) * 20L + $"src_idx")
      .filter($"pos" < 60)
      .select($"pos", $"doc_id", $"source")
      .orderBy($"pos")
  }

  private val interleaveSql =
    """SELECT pos, doc_id, source FROM (
      |  SELECT doc_id, source,
      |    (CAST(ROW_NUMBER() OVER (PARTITION BY source
      |       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) - 1) * 20
      |      + CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) AS pos
      |  FROM documents) t
      |WHERE pos < 60 ORDER BY pos""".stripMargin



  /** Power-of-two token-length histogram per source — the batch-shaping
    * statistic behind context-length planning (how much of each source
    * fits a given window). `bucket` = floor(log2(n_tok)) computed as
    * minimal-binary-digit count minus one: pure integer arithmetic, no
    * libm log whose last-ulp could flip a floor at exact powers of two.
    */
  private def lengthBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tok"))
      .withColumn("bucket", (length(bin($"n_tok")) - 1).cast("long"))
      .groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .orderBy($"source", $"bucket")
  }

  private val lengthBucketsSql =
    """SELECT source, CAST(length(bin(n_tok)) - 1 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents) t
      |GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("ds_train_split",      trainSplit _,       Some(trainSplitSql)),
    ("ds_stratified_sample", stratifiedSample _, Some(stratifiedSampleSql)),
    ("ds_interleave",       interleave _,       Some(interleaveSql)),
    ("ds_length_buckets",   lengthBuckets _,    Some(lengthBucketsSql)),
  )
}
