package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared word-k-gram stage for the text-pipeline operators.
  *
  * Two Spark-4 performance traps shape this helper (both measured 8-20x
  * on the bench corpus):
  *
  *  1. Higher-order functions (`transform`) have no codegen — they run
  *     interpreted, and an inline `slice(split(text), i, k)` re-runs the
  *     regex split once per gram position. So the token array is
  *     materialized as its OWN projection and the lambda reads the bound
  *     `tk` attribute (CollapseProject keeps the boundary because `tk`
  *     is referenced more than once).
  *  2. Exploding a materialized gram-array COLUMN invites
  *     InferFiltersFromGenerate + predicate pushdown to substitute the
  *     whole transform into `size(gs) > 0 AND isnotnull(gs)` filters —
  *     the gram array is then built ~3x per row, interpreted. So the
  *     transform sits DIRECTLY in generator position (`explode(transform
  *     (...))`), which evaluates it exactly once per row.
  */
private[queries] object GramStage {

  /** `(doc_id, tk)` with `tk` = whitespace tokens of lower(trim(text)). */
  def tokensOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("tk"))

  /** Sliding k-grams over the materialized `tk` column, single-space
    * joined. REQUIRES a `size(tk) >= k` filter upstream (shorter docs
    * would make `sequence` descend); dropping them is equivalent to the
    * empty-gram-array form since every consumer inner-explodes.
    */
  def grams(k: Int): Column =
    transform(sequence(lit(1), size(col("tk")) - (k - 1)),
      i => concat_ws(" ", slice(col("tk"), i, lit(k))))

  /** `(doc_id, g)` — one row per k-gram occurrence (`distinctPerDoc`:
    * per occurrence of a doc-distinct gram). Docs under k tokens yield
    * no rows.
    */
  def explodeGrams(df: DataFrame, k: Int, distinctPerDoc: Boolean = false): DataFrame = {
    val g = if (distinctPerDoc) array_distinct(grams(k)) else grams(k)
    tokensOf(df).filter(size(col("tk")) >= k)
      .select(col("doc_id"), explode(g).as("g"))
  }
}
