package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The graft streaming source is a DSv2 `MicroBatchStream` that plans its
  * own `FilePartition`s straight from stream manifests, but delegates the
  * actual reading to Spark's parquet connector so every micro-batch rides
  * the vectorized columnar reader with all session parquet conf applied.
  * The three builders that make that possible live behind `private[sql]`;
  * this shim re-exports exactly them. (Unlike the retired V1
  * `StreamingShim`, nothing here fakes streaming plan internals — it only
  * reuses the stock parquet reader factory as a library.)
  */
object ParquetShim {

  /** A serializable, conf-primed parquet PartitionReaderFactory for files
    * of `dataSchema`, reading only `readDataSchema` (column pruning —
    * parquet skips the byte streams of unrequested columns entirely) and
    * appending `partitionSchema` columns from each PartitionedFile's
    * partitionValues. `filters` reach parquet's row-group/page-level
    * stats pruning (they must reference only `readDataSchema` columns).
    * Built by constructing a stock ParquetScan (over an empty index —
    * createReaderFactory never touches the index) so Hadoop-conf priming
    * stays Spark's own code.
    */
  def parquetReaderFactory(spark: SparkSession, dataSchema: StructType,
                           partitionSchema: StructType,
                           readDataSchema: StructType = null,
                           filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
      : PartitionReaderFactory = {
    val classic = spark.asInstanceOf[ClassicSession]
    val emptyIndex = new InMemoryFileIndex(classic, Nil, Map.empty, Some(dataSchema))
    ParquetScan(classic, classic.sessionState.newHadoopConf(), emptyIndex,
      dataSchema, Option(readDataSchema).getOrElse(dataSchema), partitionSchema,
      filters, CaseInsensitiveStringMap.empty()).createReaderFactory()
  }

  def partitionedFile(partitionValues: InternalRow, st: FileStatus): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPath(st.getPath), 0L, st.getLen,
      Array.empty, st.getModificationTime, st.getLen)

  /** Build a PartitionedFile from a path + known length, with no
    * getFileStatus round trip — the tail reader's hot path, where the
    * manifest already records the committed file's byte size.
    */
  def partitionedFileAt(partitionValues: InternalRow,
      path: org.apache.hadoop.fs.Path, len: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPath(path), 0L, len,
      Array.empty, 0L, len)

  /** Bin-pack PartitionedFiles into FilePartitions with Spark's own
    * size-aware packing (maxSplitBytes from session conf + open cost).
    */
  def pack(spark: SparkSession, files: Seq[PartitionedFile]): Seq[FilePartition] = {
    val classic = spark.asInstanceOf[ClassicSession]
    val openCost = classic.sessionState.conf.filesOpenCostInBytes
    val maxSplit = FilePartition.maxSplitBytes(classic,
      files.map(_.length + openCost).sum)
    FilePartition.getFilePartitions(classic, files, maxSplit)
  }

  /** One whole file as one FilePartition — used executor-side by the
    * real-time tail reader, which discovers files one at a time as the
    * manifest grows and cannot go through driver-side packing.
    */
  def singlePartition(pf: PartitionedFile): FilePartition =
    FilePartition(0, Array(pf))
}
