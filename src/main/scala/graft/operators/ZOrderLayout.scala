package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, call_function, element_at, expr, least, lit}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

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
  * Scale: [[clusteredWrite]] is ONE hash shuffle on a DETERMINISTIC curve
  * slice (no boundary sampling — the curve is a bounded integer, so slice
  * `numFiles` equal-width bins of it) + an in-partition sort; the curve
  * value itself is a per-row projection. Determinism matters operationally:
  * the same data always yields the same file rectangles, so the layout's
  * pruning behavior is reproducible and auditable — `repartitionByRange`
  * would sample boundaries with an RDD-id-derived seed, shifting file
  * rectangles run to run. This is the write-amortized layout pass a
  * lakehouse table runs at compaction time, not per query.
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

  /** Z-clustered parquet layout: slice the curve's value range `[0, zSpan)`
    * into `numFiles` equal-width contiguous bins, shuffle each bin to its
    * own partition, sort inside each, write one file per bin — every file's
    * (x, y) min/max footer stats then bound a tight rectangle (ZOrderSpec
    * measures the pruning this buys). `zSpan` is `4^bits` for a 2-D
    * `bits`-bit interleave.
    *
    * The bin → partition mapping must be DETERMINISTIC (same data → same
    * file rectangles). `repartition(n, col)` is hash partitioning
    * (`pmod(murmur3(col), n)`), so we remap each bin id to a precomputed
    * integer whose Murmur3 hash lands it alone in its own partition — a
    * driver-side O(numFiles) search, then a plain codegen'd projection.
    */
  def clusteredWrite(df: DataFrame, z: Column, path: String, numFiles: Int,
                     zSpan: Long): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    require(zSpan >= numFiles, s"zSpan $zSpan smaller than numFiles $numFiles")
    val binW = (zSpan + numFiles - 1) / numFiles
    // z < zSpan (doc contract) => bin <= (zSpan-1)/binW <= numFiles-1;
    // least() clamps defensively for out-of-contract values. INTEGRAL
    // division (`div`, the same IntegralDivide the interleave uses):
    // `/` coerces to double, and past 2^52 (bits > 26 for the 2-D
    // interleave) double precision can misplace boundary rows into the
    // neighboring bin, breaking the equal-width file-rectangle guarantee.
    val bin = least(
      call_function("div", z.cast("long"), lit(binW)).cast("int"),
      lit(numFiles - 1))
    // Invert Spark's partitioner: smallest non-negative int per target
    // partition with pmod(murmur3(v, 42), numFiles) == partition. Seed 42
    // and hashInt match Catalyst's Murmur3Hash over IntegerType.
    val reps = new Array[Int](numFiles)
    val seen = new Array[Boolean](numFiles)
    var v = 0
    var found = 0
    while (found < numFiles) {
      val h = Murmur3_x86_32.hashInt(v, 42)
      val b = ((h % numFiles) + numFiles) % numFiles
      if (!seen(b)) { seen(b) = true; reps(b) = v; found += 1 }
      v += 1
    }
    val mapped = element_at(array(reps.map(lit(_)): _*), bin + lit(1))
    df.repartition(numFiles, mapped)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
