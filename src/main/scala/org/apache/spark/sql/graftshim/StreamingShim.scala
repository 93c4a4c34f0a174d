package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** A V1 streaming Source's getBatch must return a DataFrame whose logical
  * plan is tagged isStreaming=true (MicroBatchExecution asserts it). The
  * builders for that live behind private[sql]; this shim exposes the two
  * the graft source needs: a streaming-tagged parquet relation (so each
  * micro-batch rides the vectorized parquet reader + codegen) and an empty
  * streaming batch.
  */
object StreamingShim {

  def streamingParquet(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    val classic = spark.asInstanceOf[ClassicSession]
    val relation = DataSource(
      sparkSession = classic,
      paths = paths,
      userSpecifiedSchema = Some(schema),
      className = "parquet").resolveRelation(checkFilesExist = false)
    val plan = LogicalRelation(relation).copy(isStreaming = true)
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
  }

  def emptyStreamingBatch(spark: SparkSession, schema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[ClassicSession]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }
}
