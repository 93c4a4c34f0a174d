package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import graft.operators.{AsOfJoin, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-stage training-data pipeline operators: as-of enrichment,
  * train/eval contamination detection, repetition-based quality
  * filtering (Gopher-style), and a k-means (Lloyd) iteration over the
  * embedding corpus.
  *
  * Oracle parity notes: every fraction is a single double division of
  * two exact integers, and the k-means centroid update accumulates in
  * fixed-point (floor(x·10⁶) as BIGINT) so the group sums are
  * associative — bit-identical across engines regardless of aggregation
  * order, which a plain double sum would not be.
  */
object PipelineOps {

  // ---------------------------------------------------------------- asof

  /** Each click enriched with the user's most recent prior view — the
    * as-of join surface. One key shuffle, no range-pair blow-up (see
    * [[graft.operators.AsOfJoin]]).
    */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    AsOfJoin.asOf(clicks, views, key = "user_id",
        leftTime = "ts", rightTime = "ts",
        payload = Seq("event_id", "ts", "value"))
      .select($"click_id", $"user_id",
        $"asof_event_id".as("view_id"), $"asof_value".as("view_value"),
        expr("timestampdiff(MICROSECOND, asof_ts, ts)").as("gap_us"))
      .orderBy($"click_id")
  }

  /** DuckDB's native ASOF LEFT JOIN — an independent implementation of
    * the same semantics ((user_id, ts) is unique in the fixture, so the
    * tie-break never engages).
    */
  private val asofJoinSql =
    """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
      |           WHERE event_type = 'click'),
      |v AS (SELECT event_id, user_id, ts, value FROM events
      |      WHERE event_type = 'view')
      |SELECT c.click_id AS click_id, c.user_id AS user_id,
      |  v.event_id AS view_id, v.value AS view_value,
      |  datediff('microseconds', v.ts, c.ts) AS gap_us
      |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY click_id""".stripMargin

  // ------------------------------------------------------- contamination

  /** Train/eval contamination check: fraction of each eval document's
    * distinct word 5-grams that also appear anywhere in the train split
    * (deterministic doc_id % 10 split). The shape every
    * benchmark-decontamination pass uses. Scale: the train side is a
    * map-combined `distinct` on the gram, the probe is one equi-join on
    * the gram — at 100 TB the gram string would be xxhash64'd first
    * (same plan, 8-byte keys); kept as text here so the oracle replays
    * byte-identical keys.
    */
  private def contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val train = GramStage.explodeGrams(docs, 5)
      .filter($"doc_id" % 10 < 8).select($"g").distinct()
    val evalGrams = GramStage.explodeGrams(docs, 5, distinctPerDoc = true)
      .filter($"doc_id" % 10 >= 8)
    evalGrams.join(train.withColumn("hit", lit(1L)), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum($"hit"), lit(0L)).as("n_contam"))
      .withColumn("contam_frac",
        $"n_contam".cast("double") / $"n_grams".cast("double"))
      .orderBy($"doc_id")
  }

  private val contaminationSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 5
      |      THEN list_transform(range(1, len(toks) - 3),
      |                          i -> array_to_string(toks[i:i+4], ' '))
      |      ELSE [] END AS gs
      |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |        FROM documents)),
      |train AS (SELECT DISTINCT unnest(gs) AS g FROM t WHERE doc_id % 10 < 8),
      |ev AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM t
      |       WHERE doc_id % 10 >= 8)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN train.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam,
      |  CAST(SUM(CASE WHEN train.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS contam_frac
      |FROM ev LEFT JOIN train USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- repetition

  /** Gopher-style repetition quality: per document, the fraction of all
    * word 2-grams taken by the single most frequent 2-gram, and the
    * fraction of 3-gram occurrences that are repeats. Pure keyed
    * aggregations (doc_id, gram) → doc_id — map-side combine keeps the
    * shuffle at distinct-gram width.
    */
  private def repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = GramStage.tokensOf(Tables.documents(s, dir))
    def counts(k: Int) = base.filter(size($"tk") >= k)
      .select($"doc_id", explode(GramStage.grams(k)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
    val a2 = counts(2).groupBy($"doc_id")
      .agg(sum($"cnt").as("n2"), max($"cnt").as("top2_n"))
    val a3 = counts(3).groupBy($"doc_id")
      .agg(sum($"cnt").as("n3"),
        sum(when($"cnt" > 1, $"cnt").otherwise(lit(0L))).as("dup3_n"))
    a2.join(a3, Seq("doc_id"))
      .select($"doc_id", $"n2", $"top2_n",
        ($"top2_n".cast("double") / $"n2".cast("double")).as("top2_frac"),
        $"n3", $"dup3_n",
        ($"dup3_n".cast("double") / $"n3".cast("double")).as("dup3_frac"))
      .orderBy($"doc_id")
  }

  private val repetitionSql =
    """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM (
      |         SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |           i -> array_to_string(toks[i:i+1], ' '))) AS g
      |         FROM t WHERE len(toks) >= 2) g2 GROUP BY doc_id, g),
      |c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM (
      |         SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
      |           i -> array_to_string(toks[i:i+2], ' '))) AS g
      |         FROM t WHERE len(toks) >= 3) g3 GROUP BY doc_id, g),
      |a2 AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n2,
      |         CAST(MAX(cnt) AS BIGINT) AS top2_n FROM c2 GROUP BY doc_id),
      |a3 AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n3,
      |         CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup3_n
      |       FROM c3 GROUP BY doc_id)
      |SELECT doc_id, n2, top2_n,
      |  CAST(top2_n AS DOUBLE) / CAST(n2 AS DOUBLE) AS top2_frac,
      |  n3, dup3_n,
      |  CAST(dup3_n AS DOUBLE) / CAST(n3 AS DOUBLE) AS dup3_frac
      |FROM a2 JOIN a3 USING (doc_id) ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- kmeans

  /** One Lloyd iteration of k-means over the embedding corpus: assign
    * every vector to its nearest of k=10 seed centroids (the first 10
    * vectors — deterministic rule), then recompute the centroid means.
    *
    * Scale shape: assignment is corpus × broadcast(centroids) folded
    * map-side by `max_by` (one row per vector crosses the exchange —
    * same gate as IVF, no window over the N×C product); the update is a
    * (cluster, dim) keyed sum with map-side partials. The means
    * accumulate in fixed-point (floor(x·10⁶) BIGINT) so the result is
    * exact integers + one final double division — associative, hence
    * reproducible under any partitioning and in the oracle.
    */
  private def kmeansIter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val cents = e.filter($"vec_id" < 10)
      .select($"vec_id".as("c_id"), $"embedding".as("c_emb"))
    val assigned = e.as("v").join(broadcast(cents), col("c_id").isNotNull)
      .select($"v.vec_id".as("vec_id"), $"v.embedding".as("embedding"), $"c_id",
        Similarity.cosine($"v.embedding", $"c_emb").as("ccos"))
      .groupBy($"vec_id")
      .agg(first($"embedding").as("embedding"),
        max_by($"c_id", struct($"ccos", -$"c_id")).as("c_id"))
    val fp = assigned
      .select($"c_id", posexplode($"embedding").as(Seq("pos", "x")))
      .select($"c_id", $"pos",
        floor($"x".cast("double") * lit(1000000.0)).cast("long").as("q"))
      .groupBy($"c_id", $"pos")
      .agg(sum($"q").as("sq"), count(lit(1)).as("n"))
    // norm2 accumulates in DECIMAL: sq ~ n·10⁶ per (cluster, dim), so
    // sq² overflows Long near n ≈ 3e6 vectors/cluster. decimal(19,0)
    // holds EVERY Long exactly (|Long| < 9.3e18 < 1e19) so the per-row
    // cast can never NULL in non-ANSI mode; the product tops out at
    // ~8.5e37 < 1e38, inside decimal(38,0), and the sum stays exact.
    fp.groupBy($"c_id")
      .agg(max($"n").as("n_assigned"),
        sum(when($"pos" === 0, $"sq").otherwise(lit(0L))).as("q0"),
        sum($"sq".cast("decimal(19,0)") * $"sq".cast("decimal(19,0)"))
          .cast("double").as("norm2_fp"))
      .withColumn("mean0",
        $"q0".cast("double") / ($"n_assigned".cast("double") * lit(1000000.0)))
      .orderBy($"c_id")
  }

  private val kmeansIterSql =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
      |          FROM n WHERE vec_id < 10),
      |assigned AS (
      |  SELECT vec_id, embedding, c_id FROM (
      |    SELECT v.vec_id, v.embedding, c.c_id,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(v.embedding, c.c_emb),
      |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |          / (v.nrm * c.c_nrm) DESC, c.c_id) AS r
      |    FROM n v CROSS JOIN cents c) t
      |  WHERE r = 1),
      |fp AS (
      |  SELECT c_id, pos, CAST(SUM(q) AS BIGINT) AS sq, COUNT(*) AS n FROM (
      |    SELECT c_id,
      |      unnest(range(1, len(embedding) + 1)) AS pos,
      |      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
      |    FROM assigned) u
      |  GROUP BY c_id, pos)
      |SELECT c_id, CAST(MAX(n) AS BIGINT) AS n_assigned,
      |  CAST(SUM(CASE WHEN pos = 1 THEN sq ELSE 0 END) AS BIGINT) AS q0,
      |  CAST(SUM(CAST(sq AS DECIMAL(18,0)) * CAST(sq AS DECIMAL(18,0))) AS DOUBLE) AS norm2_fp,
      |  CAST(SUM(CASE WHEN pos = 1 THEN sq ELSE 0 END) AS DOUBLE)
      |    / (CAST(MAX(n) AS DOUBLE) * 1000000.0) AS mean0
      |FROM fp GROUP BY c_id ORDER BY c_id""".stripMargin

  // ----------------------------------------------------- bigram LM score

  /** Bigram language-model scoring of the eval split against a model
    * trained on the train split (add-1 smoothing over the context
    * vocabulary): per document, the summed and per-bigram negative log
    * likelihood — the perplexity-style quality filter every pretraining
    * pipeline runs.
    *
    * Scale: counts are two keyed aggregations over train bigrams; the
    * scorer is two equi-joins (bigram, context) + a 1-row broadcast
    * vocabulary size. Log-likelihoods quantize to floor(ln·10⁴) BIGINT
    * per bigram BEFORE the per-doc sum, so the aggregate is associative
    * integer math (ln's last-ulp libm variance is ~10⁻¹¹ away from any
    * floor boundary — same accepted risk as `txt_zipf_slope`).
    */
  private def bigramScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val trainB = GramStage.explodeGrams(docs, 2).filter($"doc_id" % 10 < 8)
    val c12 = trainB.groupBy($"g").agg(count(lit(1)).as("c12"))
    val c1 = c12.withColumn("w1", split($"g", " ").getItem(0))
      .groupBy($"w1").agg(sum($"c12").as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    val evalB = GramStage.explodeGrams(docs, 2).filter($"doc_id" % 10 >= 8)
      .withColumn("w1", split($"g", " ").getItem(0))
    evalB
      .join(c12, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("lp",
        floor(log((coalesce($"c12", lit(0L)) + 1L).cast("double") /
                  (coalesce($"c1", lit(0L)) + $"v").cast("double")) * lit(10000.0))
          .cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lp").as("sum_lp"))
      .withColumn("nll",
        -$"sum_lp".cast("double") / ($"n_bigrams".cast("double") * lit(10000.0)))
      .orderBy($"doc_id")
  }

  private val bigramScoreSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(tk)),
      |      i -> array_to_string(tk[i:i+1], ' '))) AS g
      |  FROM t WHERE len(tk) >= 2),
      |c12 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c12 FROM b
      |        WHERE doc_id % 10 < 8 GROUP BY g),
      |c1 AS (SELECT string_split(g, ' ')[1] AS w1, CAST(SUM(c12) AS BIGINT) AS c1
      |       FROM c12 GROUP BY 1),
      |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
      |ev AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM b
      |       WHERE doc_id % 10 >= 8),
      |lp AS (
      |  SELECT doc_id,
      |    CAST(floor(ln(CAST(COALESCE(c12, 0) + 1 AS DOUBLE) /
      |                  CAST(COALESCE(c1, 0) + v AS DOUBLE)) * 10000.0) AS BIGINT) AS lp
      |  FROM ev LEFT JOIN c12 USING (g) LEFT JOIN c1 USING (w1) CROSS JOIN v)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(lp) AS BIGINT) AS sum_lp,
      |  -CAST(SUM(lp) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10000.0) AS nll
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("ev_asof_join",      asofJoin _,      Some(asofJoinSql)),
    ("txt_contamination", contamination _, Some(contaminationSql)),
    ("txt_rep_ngrams",    repetition _,    Some(repetitionSql)),
    ("emb_kmeans_iter",   kmeansIter _,    Some(kmeansIterSql)),
    ("txt_bigram_nll",    bigramScore _,   Some(bigramScoreSql)),
  )
}
