package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Z-ORDER (Morton-curve) clustering — the multi-dimensional data-skipping
  * layout (Delta/Iceberg `ZORDER BY`): interleaving the bits of two
  * order-preserving dimensions gives a 1-D sort key under which every
  * contiguous file range covers a bounded HYPER-RECTANGLE of the original
  * dimensions, so parquet min/max footer stats prune files for predicates
  * on EITHER dimension (a single-column sort only ever prunes its own
  * column; at 100 TB the second dimension's full-scan is the difference).
  *
  * The interleave is plain integer arithmetic — `((x DIV 2^i) % 2) ·
  * 2^(2i+1)` — rather than bit intrinsics, for two reasons: it stays
  * inside whole-stage codegen as ordinary arithmetic, and the SAME
  * expression text replays in DuckDB (`//` for `DIV`), which is how the
  * `ds_zorder_layout` oracle row hash-checks the curve. Inputs MUST be
  * non-negative and below 2^bits (clamp upstream); both engines then agree
  * exactly (truncating vs flooring division coincide on non-negatives).
  *
  * Scale: [[clusteredWrite]] is ONE range shuffle on z (Spark samples
  * range bounds — no driver pass) + an in-partition sort; the curve value
  * itself is a per-row projection. This is the write-amortized layout
  * pass a lakehouse table runs at compaction time, not per query.
  */
object ZOrderLayout {

  /** The interleave expression for SQL engine `divOp` ("DIV" = Spark,
    * "//" = DuckDB): z = Σᵢ xᵢ·2^(2i+1) + yᵢ·2^(2i) over `bits` bits.
    */
  def zExprText(x: String, y: String, bits: Int, divOp: String): String = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      s"((($x) $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}" +
        s" + ((($y) $divOp ${1L << i}) % 2) * ${1L << (2 * i)}"
    }.mkString("(", ") + (", ")")
  }

  /** Morton value of two named non-negative integer columns. */
  def zValue(x: String, y: String, bits: Int = 16): Column =
    expr(zExprText(x, y, bits, "DIV"))

  /** Z-clustered parquet layout: range-partition on the curve value into
    * `numFiles` contiguous curve slices, sort inside each, write one file
    * per slice — every file's (x, y) min/max footer stats then bound a
    * tight rectangle (ZOrderSpec measures the pruning this buys).
    */
  def clusteredWrite(df: DataFrame, z: Column, path: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
}
