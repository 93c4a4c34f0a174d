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
    import graft.functions.GraftFunctions.{minhash_signature, sorted_intersect_size}
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands

    // One map-side pass computes BOTH the verification token set (sorted
    // 64-bit interned hashes → zero-allocation merge intersection) and the
    // MinHash signature via the native kernel — no shuffle, no N-column
    // codegen'd aggregate, no interpreted higher-order functions in the
    // hot loop. The raw text is repartitioned FIRST so tokenization and
    // hashing spread across all cores even when the corpus arrives as one
    // file; persist because the base feeds the banding once and the
    // verification join twice.
    val base = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
      .repartition(col("id"))
      .select(col("id"),
        transform(split(lower(trim(col("txt"))), "\\s+"), x => xxhash64(x)).as("th"))
      .select(col("id"),
        array_sort(array_distinct(col("th"))).as("toks"),
        minhash_signature(col("th"), shingleSize, numHashes).as("sig"))
      .persist()

    val banded = base.select(col("id"),
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

    val a = base.select(col("id").as("a_id"), col("toks").as("a_toks"))
    val b = base.select(col("id").as("b_id"), col("toks").as("b_toks"))
    candidates.join(a, "a_id").join(b, "b_id")
      .withColumn("inter", sorted_intersect_size(col("a_toks"), col("b_toks")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
