package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 60-bit SimHash document signatures built from cross-engine-reproducible
  * token hashes (first 15 hex chars of md5 → bigint), so the DuckDB oracle
  * can recompute identical signatures. Bit i of the signature is the sign
  * of Σ_tokens (±1 depending on bit i of the token hash) — the classic
  * Charikar construction.
  *
  * Shape at scale: explode(tokens) → single partial-aggregated groupBy
  * doc — one shuffle keyed by doc id, state is 60 longs per doc.
  */
object SimHash {
  val Bits = 60

  /** Per-token reproducible 60-bit hash (Spark side; oracle's
    * `CAST(concat('0x', substring(md5(tok),1,15)) AS BIGINT)`).
    */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** Kernel for the `simhash60` expression: the complete Charikar
    * signature of a distinct-token array in one pass — md5 per token
    * (first 15 hex chars = 60 bits, identical to [[tokenHash]]), ±1 bit
    * counts, sign → signature. Replaces an explode → 60-column groupBy
    * (a full shuffle of every token) with a pure map-side projection.
    */
  def signatureOf(tokens: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val h = v >>> 4 // value of the first 15 hex digits
      var bit = 0
      while (bit < Bits) {
        if (((h >> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < Bits) { if (counts(bit) > 0) sig |= 1L << bit; bit += 1 }
    sig
  }

  /** (doc_id, simhash) for every document in `docs(idCol, textCol)` — one
    * codegen'd kernel call per document, no explode, no shuffle.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.GraftFunctions.simhash60(
        array_distinct(split(lower(trim(col(textCol))), "\\s+"))).as("simhash"))

  /** Near-duplicate pairs: hamming(simhashA, simhashB) ≤ maxDistance,
    * blocked on 4 × 15-bit sub-bands (a pair within distance ≤ 3 shares at
    * least one exact band — pigeonhole), so the join is an equi-join on
    * (band, chunk), never a full cross product.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxDistance: Int = 3): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    val chunks = sigs
      .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("chunk", expr("shiftright(simhash, band * 15) & 32767"))
    chunks.as("x").join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** DuckDB SQL computing identical signatures (the oracle text is
    * generated from the same bit loop as the Spark plan).
    */
  def oracleSignatureSql(limitDocs: Int): String = {
    val bitSums = (0 until Bits).map(i =>
      s"SUM(CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n      ")
    val sig = (0 until Bits).map(i =>
      s"(CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)").mkString(" + ")
    s"""SELECT doc_id, $sig AS simhash FROM (
       |  SELECT doc_id,
       |      $bitSums
       |  FROM (
       |    SELECT doc_id,
       |      CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) AS h
       |    FROM (
       |      SELECT doc_id, unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tok
       |      FROM documents WHERE doc_id < $limitDocs) a) b
       |  GROUP BY doc_id) c
       |ORDER BY doc_id""".stripMargin
  }
}
