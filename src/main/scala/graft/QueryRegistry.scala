package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Central registry assembling the operator inventory (SURVEY.md §2) from
  * the per-area query modules. SparkEntry delegates here.
  */
object QueryRegistry {
  type Q = (SparkSession, String) => DataFrame

  /** name -> (query, Some(oracleSql) | None). */
  val registered: Map[String, (Q, Option[String])] = Map(
    "q1_agg" -> ((Q.Relational.q1Agg _, Some(Q.Relational.q1AggSql)))
  )

  def queries: Map[String, Q] = registered.map { case (k, (q, _)) => k -> q }

  def oracleSql: Map[String, String] =
    registered.collect { case (k, (_, Some(sql))) => k -> sql }
}
