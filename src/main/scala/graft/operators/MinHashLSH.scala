package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection, entirely in codegen'd
  * array expressions (no UDFs, no driver-side state):
  *
  *   tokens → k-token shingles → xxhash64 per shingle → `numHashes`
  *   affine min-hashes → `bands` band signatures → shuffle on
  *   (band, signature) → candidate pairs → exact Jaccard verification.
  *
  * At 100 TB the only shuffles are the band-bucket exchange (width =
  * numHashes longs per doc, not the text) and the pair verification join;
  * identical-document floods land in one bucket but are bounded by
  * per-bucket pair expansion, which AQE skew-split handles.
  */
object MinHashLSH {

  /** Per-document MinHash signature as an array<bigint> column. */
  def signature(tokens: Column, shingleSize: Int, numHashes: Int): Column = {
    val shingles = array_distinct(
      when(size(tokens) >= shingleSize,
        transform(sequence(lit(0), size(tokens) - shingleSize),
          i => concat_ws(" ", slice(tokens, i + 1, lit(shingleSize)))))
        .otherwise(array(concat_ws(" ", tokens))))
    val hs = transform(shingles, s => xxhash64(s))
    // hash family h_j(x) = murmur3(x, j): j acts as the seed column, no
    // overflow under ANSI mode, still a fixed pseudo-random map per j
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(hs, h => hash(h, j))))
  }

  /** Candidate near-duplicate pairs with exact-Jaccard verification.
    * Input needs `idCol` (long) and `textCol` (string); output:
    * (a_id, b_id, jaccard) for verified pairs ≥ threshold.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
                     threshold: Double = 0.35): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands

    // tokenization feeds signatures AND the verification joins, and the
    // banded view self-joins — persist both so the text is tokenized once
    // and signatures are computed once, not per join side.
    // repartition: the corpus often arrives as few large files; signature
    // hashing is the CPU hot spot and must spread across all cores.
    val toks = docs.select(
      col(idCol).as("id"),
      array_distinct(split(lower(trim(col(textCol))), "\\s+")).as("toks"))
      .repartition(col("id"))
      .persist()

    // signatures via explode + numHashes partial-aggregated mins: a
    // vectorized aggregation over (doc, shingleHash) rows beats nested
    // per-doc array transforms (no array allocation churn)
    val shingles = toks.select(col("id"),
      explode(array_distinct(
        when(size(col("toks")) >= shingleSize,
          transform(sequence(lit(0), size(col("toks")) - shingleSize),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(shingleSize)))))
          .otherwise(array(concat_ws(" ", col("toks")))))).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
    val minCols = (0 until numHashes).map(j => min(hash(col("h"), lit(j))).as(s"m$j"))
    val sigs = shingles.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numHashes).map(j => col(s"m$j")): _*).as("sig"))

    val banded = sigs.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), hash(b, slice(col("sig"), b * rows + 1, lit(rows))).as("bsig"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
      .persist()

    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()

    val a = toks.select(col("id").as("a_id"), col("toks").as("a_toks"))
    val b = toks.select(col("id").as("b_id"), col("toks").as("b_toks"))
    candidates.join(a, "a_id").join(b, "b_id")
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
