package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-corpus statistics: norm profiles per label and one
  * matrix-free PCA power-iteration step — the covariance-direction
  * probe run before choosing projection/whitening for an embedding
  * table.
  *
  * Oracle parity: per-element values quantize to fixed-point BIGINT
  * (floor(x·10⁶)) before any cross-row sum, so every aggregate is
  * associative integer math (same convention as `emb_kmeans_iter`);
  * doubles appear only in per-row norms (bit-exact sequential ops, as
  * `sim_cosine_pairs` establishes) and in single final divisions.
  */
object EmbeddingOps {

  // -------------------------------------------------------- norm stats

  /** Per-label embedding-norm profile: count, exact min/max norm, and
    * the fixed-point mean norm. One keyed aggregation, map-side
    * partials; min/max are selections (no cross-row float arithmetic),
    * the mean accumulates quantized integers.
    */
  private def normStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label".cast("long").as("label"),
        Similarity.norm($"embedding").as("nrm"))
      .withColumn("nq", floor($"nrm" * lit(1000000.0)).cast("long"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        min($"nrm").as("min_norm"), max($"nrm").as("max_norm"),
        sum($"nq").as("sum_fp"))
      .select($"label", $"n", $"min_norm", $"max_norm",
        ($"sum_fp".cast("double") / ($"n".cast("double") * lit(1000000.0)))
          .as("avg_norm"))
      .orderBy($"label")
  }

  private val normStatsSql =
    """WITH n AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
      |  CAST(SUM(CAST(floor(nrm * 1000000.0) AS BIGINT)) AS DOUBLE)
      |    / (CAST(COUNT(*) AS BIGINT) * 1000000.0) AS avg_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------- PCA power iterate

  /** One power-iteration step toward the top principal direction:
    * w = Σᵥ (v·1) v over the (uncentered) corpus, v₀ = the all-ones
    * vector. Matrix-free: per-vector coefficient c = Σⱼ xqⱼ (exact
    * integer after quantization), then a (pos)-keyed sum of c·xq —
    * map-side partial aggregation, shuffle width = the embedding
    * dimension. The per-(pos) products stay within long (|x| < 1 ⇒
    * |c·xq| < d·10¹²); cross-row sums accumulate in DECIMAL, exact at
    * any corpus size up to ~10²⁴ rows.
    */
  private def pcaPower(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xq = Tables.embeddings(s, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "x")))
      .select($"vec_id", $"pos".cast("long").as("pos"),
        floor($"x".cast("double") * lit(1000000.0)).cast("long").as("xq"))
    val c = xq.groupBy($"vec_id").agg(sum($"xq").as("c"))
    xq.join(c, Seq("vec_id"))
      .select($"pos", ($"xq" * $"c").as("q"))
      .groupBy($"pos")
      .agg(count(lit(1)).as("n_vecs"),
        sum($"q".cast("decimal(20,0)")).cast("double").as("w_fp"))
      .orderBy($"pos")
  }

  private val pcaPowerSql =
    """WITH xq AS (
      |  SELECT vec_id,
      |    CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
      |  FROM embeddings),
      |c AS (SELECT vec_id, CAST(SUM(xq) AS BIGINT) AS c FROM xq GROUP BY vec_id)
      |SELECT pos, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  CAST(SUM(CAST(xq * c AS DECIMAL(20,0))) AS DOUBLE) AS w_fp
      |FROM xq JOIN c USING (vec_id)
      |GROUP BY pos ORDER BY pos""".stripMargin

  // ---------------------------------------------- centroid similarity

  /** Inter-label centroid cosine matrix: how close the per-label mean
    * embeddings are — the class-separability probe behind label audits
    * and cluster merging.
    *
    * The centroid is kept UNNORMALIZED (the per-(label, pos) sum of
    * quantized elements): cosine is scale-invariant, so dividing by the
    * count would only introduce a non-associative division. All dot /
    * norm terms multiply as DECIMAL(18)² and sum exactly; headroom:
    * |sq| < n·10⁶ means overflow needs ~10¹² vectors per label, and the
    * DECIMAL(38) sums hold to d·(10¹⁸)² ≈ 10³⁸ — documented bound, same
    * convention as `emb_kmeans_iter`. The label-pair join carries
    * k·d rows (k labels, d dims) — broadcast-sized for any real k.
    */
  private def centroidDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xq = Tables.embeddings(s, dir)
      .select($"label".cast("long").as("label"), posexplode($"embedding").as(Seq("pos", "x")))
      .select($"label", $"pos", floor($"x".cast("double") * lit(1000000.0)).cast("long").as("xq"))
    val cent = xq.groupBy($"label", $"pos").agg(sum($"xq").as("sq"))
    val dots = cent.select($"label".as("la"), $"pos", $"sq".as("sa"))
      .join(cent.select($"label".as("lb"), $"pos", $"sq".as("sb")), Seq("pos"))
      .filter($"la" < $"lb")
      .groupBy($"la", $"lb")
      .agg(sum($"sa".cast("decimal(18,0)") * $"sb".cast("decimal(18,0)")).as("dot"))
    val norms = cent.groupBy($"label")
      .agg(sum($"sq".cast("decimal(18,0)") * $"sq".cast("decimal(18,0)")).as("nn"))
    dots
      .join(norms.select($"label".as("la"), $"nn".as("na")), Seq("la"))
      .join(norms.select($"label".as("lb"), $"nn".as("nb")), Seq("lb"))
      .select($"la", $"lb",
        ($"dot".cast("double") / sqrt($"na".cast("double") * $"nb".cast("double"))).as("cos"))
      .orderBy($"la", $"lb")
  }

  private val centroidDistSql =
    """WITH xq AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
      |  FROM embeddings),
      |cent AS (SELECT label, pos, CAST(SUM(xq) AS BIGINT) AS sq
      |         FROM xq GROUP BY 1, 2),
      |dots AS (
      |  SELECT a.label AS la, b.label AS lb,
      |    SUM(CAST(a.sq AS DECIMAL(18,0)) * CAST(b.sq AS DECIMAL(18,0))) AS dot
      |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      |  GROUP BY 1, 2),
      |norms AS (SELECT label, SUM(CAST(sq AS DECIMAL(18,0)) * CAST(sq AS DECIMAL(18,0))) AS nn
      |          FROM cent GROUP BY 1)
      |SELECT la, lb,
      |  CAST(dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cos
      |FROM dots JOIN norms na ON la = na.label JOIN norms nb ON lb = nb.label
      |ORDER BY la, lb""".stripMargin

  /** Product-quantization code assignment — the compression half of the
    * IVF-PQ ANN architecture (the IVF half is
    * [[graft.operators.Similarity]]): the 64-dim space splits into m=4
    * 16-dim subspaces, each with a k=16-entry codebook (seeded from the
    * first 16 vectors' subvectors — deterministic, so the oracle can
    * rebuild the identical codebook; production would k-means these, the
    * assignment path under test is the same). Every vector maps to 4
    * code indices by nearest-centroid L2 in fixed-point, plus its total
    * quantized reconstruction SSE. 64 dims → 4 bytes: a 100-TB float
    * corpus becomes a ~1.5-TB code table that fits executor memory for
    * re-ranking.
    *
    * Scale: one generator explode to (vec, pos) rows, an equi-join
    * against the BROADCAST codebook (k·d rows — tiny by construction),
    * two keyed aggregations (distance sum, argmin via min(struct)), one
    * conditional-agg pivot. No pairwise vector join anywhere.
    */
  /** Fixed-point (vec_id, sub, pos, xq) element rows — the shared input
    * of the PQ encode and ADC search paths.
    */
  private def pqElems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "x")))
      .select($"vec_id", ($"pos" / 16).cast("int").as("sub"), $"pos",
        floor($"x".cast("double") * lit(1000000.0)).cast("long").as("xq"))
  }

  /** Seeded per-subspace codebook: the first 16 vectors' subvectors. */
  private def pqCodebook(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cid"), $"sub", $"pos", $"xq".as("cq"))
  }

  /** Nearest-centroid assignment per (vector, subspace): one broadcast
    * equi-join + distance sum + argmin via min(struct).
    */
  private def pqAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.join(broadcast(cents), Seq("sub", "pos"))
      .groupBy($"vec_id", $"sub", $"cid")
      .agg(sum(($"xq" - $"cq") * ($"xq" - $"cq")).as("d"))
      .groupBy($"vec_id", $"sub")
      .agg(min(struct($"d", $"cid")).as("m"))
      .select($"vec_id", $"sub", $"m.cid".as("cid"), $"m.d".as("d"))
  }

  private def pqCodes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = pqElems(s, dir)
    val won = pqAssign(e, pqCodebook(e))
    won.groupBy($"vec_id")
      .agg(max(when($"sub" === 0, $"cid")).as("c0"),
        max(when($"sub" === 1, $"cid")).as("c1"),
        max(when($"sub" === 2, $"cid")).as("c2"),
        max(when($"sub" === 3, $"cid")).as("c3"),
        sum($"d").as("sse_fp"))
      .orderBy($"vec_id")
  }

  /** Shared oracle CTEs: quantized elements, seeded codebook, per-
    * (vector, subspace, centroid) distances, rank-1 assignment.
    */
  private val pqCtes =
    """WITH e AS (
      |  SELECT vec_id, CAST((u.i - 1) // 16 AS INTEGER) AS sub,
      |    u.i - 1 AS pos,
      |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
      |  FROM embeddings, UNNEST(range(1, 65)) AS u(i)),
      |c AS (SELECT CAST(vec_id AS INTEGER) AS cid, sub, pos, xq AS cq
      |      FROM e WHERE vec_id < 16),
      |d AS (SELECT e.vec_id, e.sub, c.cid,
      |        SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d
      |      FROM e JOIN c ON e.sub = c.sub AND e.pos = c.pos
      |      GROUP BY 1, 2, 3),
      |a AS (SELECT vec_id, sub, cid, d,
      |        row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rk
      |      FROM d)""".stripMargin

  private val pqCodesSql = pqCtes +
    """
      |SELECT vec_id,
      |  MAX(CASE WHEN sub = 0 THEN cid END) AS c0,
      |  MAX(CASE WHEN sub = 1 THEN cid END) AS c1,
      |  MAX(CASE WHEN sub = 2 THEN cid END) AS c2,
      |  MAX(CASE WHEN sub = 3 THEN cid END) AS c3,
      |  CAST(SUM(d) AS BIGINT) AS sse_fp
      |FROM a WHERE rk = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** ADC (asymmetric-distance) top-k search over the PQ codes — the
    * memory-bound trick that makes PQ an ANN index, not just
    * compression: at query time the corpus is touched ONLY through its
    * 4-byte codes. Each query precomputes a 4×16 lookup table (exact
    * distance from its subvector to every codebook centroid), and a
    * candidate's score is four table lookups summed — no raw corpus
    * vector is ever read. Top-5 per query, ascending quantized ADC.
    *
    * Scale: the LUT is (queries × m × k) rows — broadcast by
    * construction; scoring is one equi-join of the code table against
    * it plus a keyed sum; the per-query top-k is a rank-partitioned
    * window that WindowGroupLimit trims map-side. The raw embedding
    * table is scanned exactly once (to build codes), which at 100 TB is
    * the entire point.
    */
  private def adcSearch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val e = pqElems(s, dir)
    val cents = pqCodebook(e)
    val codes = pqAssign(e, cents).select($"vec_id", $"sub", $"cid")
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"sub", $"pos", $"xq")
    val lut = q.join(broadcast(cents), Seq("sub", "pos"))
      .groupBy($"qid", $"sub", $"cid")
      .agg(sum(($"xq" - $"cq") * ($"xq" - $"cq")).as("l"))
    val scored = codes.join(broadcast(lut), Seq("sub", "cid"))
      .filter($"vec_id" =!= $"qid")
      .groupBy($"qid", $"vec_id").agg(sum($"l").as("adc"))
    val w = Window.partitionBy($"qid").orderBy($"adc", $"vec_id")
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"qid".as("query_id"), $"vec_id".as("cand_id"),
        $"adc".as("adc_fp"), $"rank")
      .orderBy($"query_id", $"rank")
  }

  private val adcSearchSql = pqCtes +
    """,
      |codes AS (SELECT vec_id, sub, cid FROM a WHERE rk = 1),
      |q AS (SELECT vec_id AS qid, sub, pos, xq FROM e WHERE vec_id < 10),
      |lut AS (SELECT q.qid, q.sub, c.cid,
      |          SUM((q.xq - c.cq) * (q.xq - c.cq)) AS l
      |        FROM q JOIN c ON q.sub = c.sub AND q.pos = c.pos
      |        GROUP BY 1, 2, 3),
      |sc AS (SELECT lut.qid, codes.vec_id, SUM(lut.l) AS adc
      |       FROM codes JOIN lut ON codes.sub = lut.sub AND codes.cid = lut.cid
      |       WHERE codes.vec_id <> lut.qid
      |       GROUP BY 1, 2),
      |r AS (SELECT qid, vec_id, adc,
      |        row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rank
      |      FROM sc)
      |SELECT qid AS query_id, vec_id AS cand_id, CAST(adc AS BIGINT) AS adc_fp, rank
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Johnson–Lindenstrauss RANDOM PROJECTION to 8 dims with a ±1
    * (Achlioptas) sign matrix derived from md5(pos:j) — the cheap
    * dimensionality reduction that precedes LSH/clustering when PCA's
    * data-dependent basis is overkill. The projection matrix is never
    * materialized (each sign is a pure function of its coordinates, the
    * hashing-trick analog for projections), inputs quantize to the
    * family's fixed-point longs, and each output component is an exact
    * integer sum — so the oracle replays the full matrix multiply.
    *
    * Scale: one generator explode (dims × k per row, k = 8) + one keyed
    * sum — shuffle carries vecs·k longs; no matrix broadcast, no
    * per-row allocation beyond the generator.
    */
  private def randomProj(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir).filter($"vec_id" < 50)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "x")))
      .select($"vec_id", $"pos".cast("long").as("pos"),
        floor($"x".cast("double") * lit(1000000.0)).cast("long").as("xq"))
      .select($"vec_id", $"pos", $"xq", explode(expr("sequence(0L, 7L)")).as("j"))
      .withColumn("sgn",
        (conv(substring(md5(concat($"pos".cast("string"), lit(":"),
          $"j".cast("string"))), 1, 15), 16, 10).cast("long") % 2L) * 2L - 1L)
      .groupBy($"vec_id", $"j")
      .agg(sum($"xq" * $"sgn").as("p"))
      .orderBy($"vec_id", $"j")
  }

  private val randomProjSql =
    """WITH xq AS (
      |  SELECT vec_id,
      |    CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
      |  FROM embeddings WHERE vec_id < 50),
      |e AS (
      |  SELECT vec_id, pos, xq, CAST(j AS BIGINT) AS j
      |  FROM xq CROSS JOIN (SELECT unnest(range(8)) AS j) r)
      |SELECT vec_id, j,
      |  CAST(SUM(xq * ((CAST(concat('0x', substring(md5(
      |    concat(CAST(pos AS VARCHAR), ':', CAST(j AS VARCHAR))), 1, 15)) AS BIGINT)
      |    % 2) * 2 - 1)) AS BIGINT) AS p
      |FROM e GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("emb_random_proj",   randomProj _,   Some(randomProjSql)),
    ("emb_norm_stats",    normStats _,    Some(normStatsSql)),
    ("emb_pca_power",     pcaPower _,     Some(pcaPowerSql)),
    ("emb_centroid_dist", centroidDist _, Some(centroidDistSql)),
    ("emb_pq_codes",      pqCodes _,      Some(pqCodesSql)),
    ("sim_adc_search",    adcSearch _,    Some(adcSearchSql)),
  )
}
