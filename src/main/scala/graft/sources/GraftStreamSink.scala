package graft.sources

import graft.storage.GraftStreams
import org.apache.spark.sql.DataFrame

/** Exactly-once streaming sink: `writeStream.foreachBatch(writer(...))`.
  * Batches commit through the manifest CAS keyed by (queryName, batchId),
  * so Spark's at-least-once batch redelivery collapses to exactly-once —
  * the engine-side analog of the reference's per-writer event-number dedup
  * (AppendProcessor.java:179-387). Optionally notes the batch's max
  * eventTime as the writer's time mark (auto noteTime,
  * EventStreamWriterImpl.java:117).
  */
object GraftStreamSink {

  def writer(g: GraftStreams, scope: String, stream: String, queryName: String,
             autoNoteTime: Boolean = true): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => {
      // the time mark rides the same manifest CAS as the data (computed
      // from the parquet footers) — no second pass over the batch
      g.writeEvents(scope, stream, df, writerId = Some(queryName), batchId = Some(batchId),
        noteTimeFromBatch = autoNoteTime)
    }
}
