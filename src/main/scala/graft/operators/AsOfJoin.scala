package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row is matched to the single
  * latest right row with `right.time <= left.time` on the same key — the
  * enrich-with-most-recent-state operator behind CDC snapshot lookups,
  * market-data alignment and feature-store reads. Pravega applications
  * express this as "state at event time" over an indexed stream
  * (reference: readers positioned by `getSegmentsAtTime`,
  * `controller/../stream/records/StreamSegmentRecord.java` time-indexed
  * epochs); SQL engines call it ASOF JOIN.
  *
  * Spark-first design: Catalyst executes an inequality join as a
  * broadcast-nested-loop or a sort-merge over a range — both blow up at
  * scale (every left row pairs with every earlier right row before the
  * per-key max is taken). Instead we tag both sides, union them, and
  * carry the right payload forward with `last(_, ignoreNulls)` over one
  * (key, time, side) running window. That is a single hash shuffle on
  * the key plus one per-partition sort — no pair materialization,
  * O(n log n) per key — the same plan shape at 100 TB as at 60k rows.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto matched left rows
    *                (surfaced as `asof_<name>`; null when no right row
    *                precedes the left row). `payload.head` should be a
    *                unique right-row id: it is the deterministic
    *                tie-break when several right rows share one (key,
    *                time) — ill-defined in any as-of engine, pinned here.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    require(payload.distinct == payload,
      s"payload names must be distinct (duplicates would make the __p struct " +
        s"field extraction ambiguous): ${payload.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val rSchema = right.schema
    val reserved = Set("__k", "__t", "__side", "__p")
    val clashes = leftCols.filter(reserved) ++
      leftCols.toSet.intersect(payload.map("asof_" + _).toSet)
    require(clashes.isEmpty,
      s"asOf reserves column names __k/__t/__side/__p and asof_<payload>; " +
        s"rename clashing left columns: ${clashes.distinct.mkString(", ")}")

    // Unified layout: left columns (null on right rows) ++ __k/__t/__side
    // ++ one __p struct of every payload column (null on left rows). A
    // single struct — never-null on right rows even when individual
    // payload fields are null — makes one last(ignoreNulls) carry the
    // whole matched row, so a null field in the matched right row stays
    // null instead of being backfilled from an older row.
    val pType = org.apache.spark.sql.types.StructType(payload.map(c => rSchema(c)))
    val lSide = left.select(
      leftCols.map(col) ++
        Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(pType).as("__p")): _*)
    val rSide = right.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
          struct(payload.map(c => col(c).as(c)): _*).as("__p")): _*)

    // side 0 sorts before side 1 at equal time, so a right row AT the
    // left row's timestamp is visible (<= semantics, DuckDB/ASOF default).
    // Tie-break among right rows sharing (key, time): highest payload.head
    // (the unique right-row id) — pinned, engine-independent.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__p")(payload.head))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p")(c).as(s"asof_$c")): _*)
  }
}
