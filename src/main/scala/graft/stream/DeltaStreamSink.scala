package graft.stream

import graft.delta.DeltaWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming → Delta sink with exactly-once delivery.
  *
  * `foreachBatch` alone is at-least-once: after a crash between "data
  * written" and "offsets committed", the restarted query re-delivers the
  * last micro-batch. Committing the batch's data together with a
  * `SetTransaction(appId, batchId)` watermark in ONE atomic log entry
  * ([[DeltaWriter.writeIdempotent]]) upgrades that to exactly-once — the
  * retried batch sees its own watermark and skips. This is the public Delta
  * protocol's `txn` mechanism, the same design Delta's own streaming sink
  * uses.
  *
  * Scale notes: each micro-batch is one distributed parquet write + one
  * O(1) log append; the sink never rewrites existing data, so ingest cost
  * is ∝ batch size regardless of table size. Pair with
  * [[DeltaWriter.optimize]] for small-file compaction and
  * [[graft.delta.DeltaSnapshotReader.changes]] for downstream incremental
  * consumption.
  */
object DeltaStreamSink {

  /** Start writing `stream` into the Delta table at `tablePath`.
    * `appId` identifies this writer for idempotency — restarts MUST reuse
    * the same appId (and checkpoint location) to dedup retried batches. */
  def start(stream: DataFrame, tablePath: String, partitionBy: Seq[String],
            appId: String, checkpointLocation: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .queryName(s"graft-delta-sink-$appId")
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DeltaWriter.writeIdempotent(batch, tablePath, partitionBy, appId, batchId)
        ()
      }
      .start()
}
