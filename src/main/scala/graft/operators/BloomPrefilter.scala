package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Distributed Bloom-filter build + probe, the standard pre-filter for
  * membership-style pipeline stages (train/eval decontamination, URL
  * de-listing, seen-before checks) at corpus scale.
  *
  * Why not a join: an exact membership check is an equi-join whose
  * probe side is the ENTIRE corpus — at 100 TB every gram/url crosses
  * the shuffle. The Bloom pattern builds one small sketch over the
  * reference set (distributed aggregation with map-side partial
  * sketches, merged once), ships it to every task as a literal, and
  * lets the exact join see only the survivors — the shuffle shrinks to
  * (true-hit rate + false-positive rate) of the corpus. Because a Bloom
  * filter has no false negatives, a final exact verify join restores
  * exact semantics; only its input size changes.
  *
  * Implementation rides Spark's own runtime-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.*`): values are
  * XxHash64'd to longs on both the build and probe sides, so the two
  * sides agree on the hash family by construction. The collected sketch
  * is a few hundred KiB — the one driver-side value in the pattern, and
  * exactly what `DataFrameStatFunctions.bloomFilter` would also pull.
  */
object BloomPrefilter {

  /** Aggregate `items[col]` into one serialized Bloom filter.
    *
    * @param estimatedItems expected distinct count (sets hash count k)
    * @param numBits        sketch width in bits (default 2^23 = 1 MiB)
    */
  def build(items: DataFrame, col: Column,
            estimatedItems: Long = 1L << 20, numBits: Long = 1L << 23): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(ColumnShim.expression(col)), 42L),
      Literal(estimatedItems), Literal(numBits))
    val row = items.select(
      ColumnShim.column(agg.toAggregateExpression()).as("bf")).head()
    require(!row.isNullAt(0),
      "BloomPrefilter.build: empty input produced no sketch")
    row.getAs[Array[Byte]](0)
  }

  /** Predicate: `col` may be in the set `bloom` was built over.
    * False ⇒ definitely absent; true ⇒ verify exactly downstream.
    */
  def mightContain(bloom: Array[Byte], col: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(ColumnShim.expression(col)), 42L)))
}
