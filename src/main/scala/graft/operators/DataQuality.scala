package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint engine (the Deequ-style validation
  * pass a training-data pipeline runs before accepting a drop): row-level
  * constraints compile into ONE aggregate over the table — every check is
  * a `sum(violation)` column in the same projection, so N checks cost one
  * scan and a single 1-row shuffle regardless of table size — then unpivot
  * to the per-check report. Set-level checks (uniqueness, referential
  * integrity) need their own aggregate/anti-join by nature; callers union
  * those rows in (see `ds_dq_report`).
  *
  * Violation counts are exact BIGINTs, so the report is oracle-hashable —
  * no sampled or approximate metrics.
  */
object DataQuality {

  /** A row-level constraint: `violation` is the predicate that marks a
    * BAD row. Names must be SQL-literal-safe (no quotes).
    */
  final case class Check(name: String, violation: Column)

  /** One row per check: (check_name, n_violations, n_rows, pass). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    // names are interpolated into a stack() SQL expression and v_<name>
    // aliases — anything beyond identifier characters yields confusing
    // parse/analysis failures downstream, so reject it here
    require(checks.forall(c => c.name.matches("[A-Za-z0-9_]+")),
      s"check names must match [A-Za-z0-9_]+; got: " +
        checks.map(_.name).filterNot(_.matches("[A-Za-z0-9_]+")).mkString(", "))
    val aggs = checks.map(c =>
      sum(when(c.violation, 1L).otherwise(0L)).as(s"v_${c.name}")) :+
      count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map(c => s"'${c.name}', v_${c.name}").mkString(", ")
    row.select(
        expr(s"stack(${checks.size}, $stacked) AS (check_name, n_violations)"),
        col("n_rows"))
      .select(col("check_name"), col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** The uniqueness row: violations = duplicate occurrences of `key`. */
  def uniquenessRow(df: DataFrame, name: String, key: Column): DataFrame =
    df.agg((count(lit(1)) - countDistinct(key)).as("n_violations"),
        count(lit(1)).as("n_rows"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("pass"))

  /** The referential-integrity row: violations = rows of `df` whose
    * `fk` has no match in `dim`'s `pk` (left anti join — at scale the
    * dim side broadcasts or the join shuffles on the key, either way
    * one pass).
    */
  def referentialRow(df: DataFrame, name: String, fk: Column,
                     dim: DataFrame, pk: Column): DataFrame =
    df.select(fk.as("__fk"))
      .join(dim.select(pk.as("__pk")).distinct(), // distinct: no fan-out
        col("__fk") === col("__pk"), "left")
      .agg(sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_rows"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("pass"))
}
