package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in [[queries]] is one operator from SURVEY.md §2; keys present
  * in [[oracleSql]] are hash-checked against DuckDB on the same parquet
  * tables, the rest get a rows>0 check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Q.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
