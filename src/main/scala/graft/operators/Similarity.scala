package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity primitives over `array<float>` columns, all as
  * codegen'd higher-order functions: element-wise products accumulate
  * left-to-right in double, matching DuckDB's list_sum/list_transform
  * order so oracle results are bit-identical.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, sequential accumulation — the native `seq_dot`
    * expression (identical arithmetic order to the HOF formulation and
    * the DuckDB oracle, but one codegen'd loop with no boxing).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.seq_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k neighbors for each query vector: one broadcast of
    * the (small) query set against the full corpus, ranked per query —
    * the exact baseline ANN variants are measured against. Corpus-side
    * scan is embarrassingly parallel; only the final per-query top-k
    * window shuffles k rows per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.as("c").join(broadcast(queries.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("cand_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH (SimHash-for-vectors): `nbits` fixed seeded
    * hyperplanes → signature → candidates share a bucket → exact re-rank
    * inside buckets. Queries multi-probe neighboring buckets (hamming ≤ 1)
    * to trade a little candidate volume for recall. The scale path: the
    * corpus is scanned once to signatures, then only bucket-local pairs
    * are scored.
    */
  /** Fixed seeded hyperplanes shared by the Spark plan and the generated
    * oracle SQL (the oracle embeds the same constants as literals).
    */
  def planes(nbits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nbits: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes: Array[Array[Double]] = this.planes(nbits, dim, seed)

    def sig(v: Column): Column =
      (0 until nbits).map { b =>
        val plane = lit(planes(b)) // array<double> literal
        when(aggregate(zip_with(v, plane, (x, p) => x.cast("double") * p),
          lit(0.0), (acc, x) => acc + x) > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)

    val cSig = corpus.withColumn("bucket", sig(col("embedding")))
    // multi-probe: the exact bucket plus every single-bit flip
    val probeFlips = lit((0L +: (0 until nbits).map(b => 1L << b)).toArray)
    val qSig = queries.withColumn("sig", sig(col("embedding")))
      .select(col("*"), explode(transform(probeFlips, f => col("sig").bitwiseXOR(f))).as("bucket"))
    val scored = cSig.as("c").join(broadcast(qSig.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("cand_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style ANN — the other 100 TB scale path next to LSH: a small
    * deterministic centroid set, corpus vectors assigned once to their
    * nearest centroid (an inverted file), queries probe the `nprobe`
    * nearest centroids and re-rank exactly inside those lists. At scale
    * the assignment is one broadcast pass and searches touch
    * ~nprobe/centroids of the corpus.
    *
    * The centroid COUNT is a fixed deployment knob (`centroidsTarget` —
    * the nlist of a production IVF index), NOT a fixed sampling stride:
    * the round-9 sf10 sweep measured the old `vec_id % 40` rule going
    * quadratic (assignment = N × N/40 cosines, 65× per decade at 100×
    * data) because the centroid set itself grew with the corpus.
    * Selection is bottom-k by id HASH (md5-prefix, the repo's
    * cross-engine uniform-hash idiom; vec_id tie-break): exactly
    * min(N, centroidsTarget) uniform survivors for ANY id distribution
    * at ANY scale — the hash kills arithmetic structure in id spaces
    * (the sf100 sweep caught a raw-modulo rule resonating with ScaleGen
    * replica ids), and bottom-k needs no corpus COUNT at all, so the
    * whole selection is ONE TakeOrderedAndProject pass (per-partition
    * partial top-k, no shuffle, no separate count job — the earlier
    * hash-mod rule derived its stride from an extra COUNT(*) job). The
    * ORACLE replays the same ORDER BY hash LIMIT k rule, so the two
    * engines pick identical centroids at every scale factor.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              centroidsTarget: Int = 50, nprobe: Int = 2): DataFrame = {
    val cents = ivfCentsDf(corpus, centroidsTarget)
    val centroids = ivfCentroids(cents)
    val assigned = ivfAssign(corpus, centroids)
    val probes = ivfProbes(queries, cents, nprobe)
    ivfRank(assigned, probes, k)
  }

  /** The deterministic centroid SET (c_id, c_emb): the `centroidsTarget`
    * smallest id hashes (vec_id tie-break), i.e. a uniform fixed-size
    * sample regardless of id distribution — one TakeOrderedAndProject
    * pass, no count job.
    */
  def ivfCentsDf(corpus: DataFrame, centroidsTarget: Int = 50): DataFrame = {
    val idHash = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10).cast("long")
    corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        idHash.as("h"))
      .orderBy(col("h"), col("c_id")).limit(centroidsTarget)
      .select(col("c_id"), col("c_emb"))
  }

  /** Collects the (tiny by construction) centroid set to the driver with
    * norms precomputed — the same left-to-right double accumulation as
    * `seq_dot`, so literal-inlined cosines stay bit-identical to the
    * oracle's. Fails loudly on an empty selection.
    */
  def ivfCentroids(cents: DataFrame): Array[(Long, Array[Float], Double)] = {
    val centroids = cents.select(col("c_id"), col("c_emb")).collect().map { r =>
      val emb = r.getSeq[Float](1).toArray
      val nrm = math.sqrt(emb.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (r.getLong(0), emb, nrm)
    }
    require(centroids.nonEmpty,
      "IVF centroid selection picked zero rows — empty corpus")
    centroids
  }

  /** The inverted file: nearest centroid per corpus vector, as a PURE
    * PROJECTION. The centroid set is tiny by construction
    * (~centroidsTarget rows), so it inlines as one array-of-struct
    * literal (ConstantFolding collapses it to a single Literal); each
    * corpus row scores all C centroids inside whole-stage codegen and
    * takes the argmax as array_max over struct(ccos, -c_id) — the same
    * (ccos DESC, c_id ASC) tie-break the earlier max_by formulation
    * encoded. No join, no N×C row explosion, and crucially NO
    * full-corpus shuffle: the round-9 sf10 sweep measured the previous
    * broadcast-join + groupBy(vec_id) shape going superlinear at 100×
    * (N embedding-carrying rows through a million-group hash aggregate).
    */
  def ivfAssign(corpus: DataFrame,
                centroids: Array[(Long, Array[Float], Double)]): DataFrame = {
    val centsLit = array(centroids.map { case (id, emb, nrm) =>
      struct(lit(id).as("c_id"), lit(emb).as("c_emb"), lit(nrm).as("c_nrm"))
    }.toIndexedSeq: _*)
    corpus
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("best", array_max(transform(centsLit, c =>
        struct((dot(col("embedding"), c.getField("c_emb")) /
            (col("nrm") * c.getField("c_nrm"))).as("ccos"),
          (-c.getField("c_id")).as("neg")))))
      .select(col("vec_id"), col("embedding"), (-col("best.neg")).as("c_id"),
        col("best.ccos").as("assign_cos"))
  }

  /** Query probes: the `nprobe` nearest centroids per query — one
    * broadcast join against the centroid set (collect_list is bounded by
    * the centroid count, which is small by construction); array_sort on
    * struct(-qcos, c_id) replays the (qcos DESC, c_id ASC) probe order
    * without a window sort. Returns (qid, q_emb, c_id).
    */
  def ivfProbes(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame =
    queries.as("q").join(broadcast(cents), col("c_id").isNotNull)
      .select(col("q.vec_id").as("qid"), col("q.embedding").as("q_emb"),
        col("c_id"), cosine(col("q.embedding"), col("c_emb")).as("qcos"))
      .groupBy(col("qid"))
      .agg(first(col("q_emb")).as("q_emb"),
        slice(array_sort(collect_list(struct((-col("qcos")).as("negcos"), col("c_id")))),
          1, nprobe).as("top"))
      .select(col("qid"), col("q_emb"), explode(col("top")).as("t"))
      .select(col("qid"), col("q_emb"), col("t.c_id").as("c_id"))

  /** Exact re-rank inside the probed lists: candidates = assigned rows
    * sharing a probed centroid, cosine-scored against the query, top-k
    * per query.
    */
  def ivfRank(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    assigned.join(broadcast(probes), Seq("c_id"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid").as("query_id"), col("vec_id").as("cand_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-rank DCG discount table in millionths: round(10⁶ / log₂(r+1))
    * for r = 1..kMax, computed ONCE on the driver and inlined as integer
    * literals into BOTH engines' plans — transcendental functions never
    * cross an engine boundary, so the metrics below are integer-exact.
    */
  def discountPpm(kMax: Int): IndexedSeq[Long] =
    (1 to kMax).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Ranking-quality metrics (MRR + NDCG@kMax) of a retrieval system
    * against graded ground truth — the evaluation loop every retrieval /
    * ANN index ships with. `truth` carries (query_id, cand_id, rank,
    * gain): gain is the graded relevance and truth's OWN rank order is
    * the ideal ranking (true for any top-k truth built by sorting on
    * relevance). `sys` carries (query_id, cand_id, rank). All sums are
    * integer (gain × discount in millionths), so results are
    * bit-reproducible under any partitioning; the single double division
    * dcg/idcg happens once per row. Queries are driven from TRUTH: a
    * system returning nothing for a query scores 0, not absence.
    *
    * Scale: both inputs are top-k relations (k rows per query), so every
    * stage is O(queries · k) regardless of corpus size.
    */
  def rankingMetrics(sys: DataFrame, truth: DataFrame, kMax: Int): DataFrame = {
    val disc = lit(discountPpm(kMax).toArray)
    def discAt(rank: Column): Column = element_at(disc, rank.cast("int"))
    val hits = sys.join(truth.select(col("query_id"), col("cand_id"),
          col("gain")), Seq("query_id", "cand_id"))
      .groupBy(col("query_id"))
      .agg(sum(col("gain") * discAt(col("rank"))).as("dcg_ppm"),
        min(col("rank")).as("first_rel"))
    val ideal = truth.groupBy(col("query_id"))
      .agg(sum(col("gain") * discAt(col("rank"))).as("idcg_ppm"))
    ideal.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(expr("1000000L DIV first_rel"), lit(0L)).as("rr_ppm"),
        coalesce(col("dcg_ppm"), lit(0L)).as("dcg_ppm"),
        col("idcg_ppm"),
        (coalesce(col("dcg_ppm"), lit(0L)).cast("double") /
          col("idcg_ppm").cast("double")).as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** DuckDB SQL replaying [[ivfTopK]] (same centroid rule, assignment,
    * probes and ranking).
    */
  /** The centroid-selection + inverted-file CTE block (`n`, `m`,
    * `cents`, `assigned`) shared by the direct top-k oracle and the
    * streaming index-maintenance oracle.
    */
  def ivfAssignedOracleCtes(centroidsTarget: Int = 50): String =
    s"""n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM n ORDER BY CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
       |    AS BIGINT), vec_id LIMIT $centroidsTarget),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, c_id FROM (
       |    SELECT v.vec_id, v.embedding, v.nrm, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
       |        list_sum(list_transform(list_zip(v.embedding, c.c_emb),
       |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (v.nrm * c.c_nrm) DESC,
       |        c.c_id) AS arank
       |    FROM n v CROSS JOIN cents c) t
       |  WHERE arank = 1)""".stripMargin

  /** `candJoinSql` optionally appends extra joins/predicates to the
    * scored CTE's candidate side (alias `a`) — the filtered-ANN oracle
    * injects its metadata predicate there, exactly where the Spark plan
    * applies it (on candidates, after bucket probing, before ranking).
    */
  def ivfTopKOracleSql(queryMaxVecId: Int, k: Int,
                       centroidsTarget: Int = 50, nprobe: Int = 2,
                       candJoinSql: String = ""): String =
    s"""WITH ${ivfAssignedOracleCtes(centroidsTarget)},
       |probes AS (
       |  SELECT qid, q_emb, q_nrm, c_id FROM (
       |    SELECT q.vec_id AS qid, q.embedding AS q_emb, q.nrm AS q_nrm, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_sum(list_transform(list_zip(q.embedding, c.c_emb),
       |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (q.nrm * c.c_nrm) DESC,
       |        c.c_id) AS prank
       |    FROM n q CROSS JOIN cents c
       |    WHERE q.vec_id < $queryMaxVecId) t
       |  WHERE prank <= $nprobe),
       |scored AS (
       |  SELECT DISTINCT p.qid AS query_id, a.vec_id AS cand_id,
       |    list_sum(list_transform(list_zip(p.q_emb, a.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (p.q_nrm * a.nrm) AS cos
       |  FROM probes p JOIN assigned a ON p.c_id = a.c_id AND p.qid <> a.vec_id
       |  $candJoinSql)
       |SELECT query_id, cand_id, rank, cos FROM (
       |  SELECT query_id, cand_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB SQL replaying [[lshTopK]] exactly: the same hyperplane
    * constants are inlined as double literals (shortest round-trip repr →
    * identical doubles), dot products accumulate in the same order, and
    * the multi-probe/rank logic mirrors the Spark plan — so the LSH
    * bucketing itself is hash-checked, not just its recall.
    */
  def lshTopKOracleSql(queryMaxVecId: Int, k: Int,
                       nbits: Int = 12, dim: Int = 64, seed: Long = 42L): String = {
    val ps = planes(nbits, dim, seed)
    def planeLit(b: Int): String = ps(b).map(java.lang.Double.toString).mkString("[", ", ", "]")
    val sigExpr = (0 until nbits).map { b =>
      s"""(CASE WHEN list_sum(list_transform(list_zip(embedding, ${planeLit(b)}),
         |      x -> CAST(x[1] AS DOUBLE) * x[2])) > 0
         |    THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)""".stripMargin
    }.mkString(" +\n    ")
    val flips = (0L +: (0 until nbits).map(b => 1L << b)).mkString("[", ", ", "]")
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
       |    $sigExpr AS sig
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id, embedding, nrm, xor(sig, f.f) AS bucket
       |  FROM n, (SELECT unnest($flips) AS f) f
       |  WHERE vec_id < $queryMaxVecId),
       |scored AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    list_sum(list_transform(list_zip(q.embedding, c.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (q.nrm * c.nrm) AS cos
       |  FROM q JOIN n c ON q.bucket = c.sig AND q.vec_id <> c.vec_id)
       |SELECT query_id, cand_id, rank, cos FROM (
       |  SELECT query_id, cand_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }
}
