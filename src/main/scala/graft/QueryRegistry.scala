package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Central registry assembling the operator inventory (SURVEY.md §2) from
  * the per-area query modules. SparkEntry delegates here.
  */
object QueryRegistry {
  type Qf = (SparkSession, String) => DataFrame

  /** (name, query, Some(oracleSql) | None — None → driver rows-only check). */
  def contributions: Seq[(String, Qf, Option[String])] =
    Q.Relational.defs ++ Q.Relational2.defs ++ Q.EventsStream.defs ++
      Q.TextOps.defs ++ Q.DedupOps.defs ++ Q.SimilarityOps.defs ++
      Q.KvQueries.defs ++ Q.StreamQueries.defs ++ Q.SamplingOps.defs ++
      Q.PipelineOps.defs ++ Q.CurationOps.defs ++ Q.EventAnalytics.defs ++
      Q.AnalyticsOps.defs ++ Q.EmbeddingOps.defs

  def queries: Map[String, Qf] =
    contributions.map { case (k, q, _) => k -> q }.toMap

  def oracleSql: Map[String, String] =
    contributions.collect { case (k, _, Some(sql)) => k -> sql }.toMap
}
