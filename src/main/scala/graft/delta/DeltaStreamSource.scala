package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming SOURCE over a Delta table: the stream tails the
  * transaction log, delivering the current snapshot as the first
  * micro-batch and, from then on, exactly the rows added by each new
  * commit ([[DeltaSnapshotReader.changes]]) — the same contract Delta's
  * own streaming source provides, here on the V1 `Source` API where a
  * micro-batch IS a DataFrame.
  *
  * Offsets are log versions (monotonic, durable in the query checkpoint),
  * so restarts resume from the last committed version without re-reading
  * the snapshot. Combined with [[graft.stream.DeltaStreamSink]] this
  * closes the loop: Delta → stream transforms → Delta, exactly-once on
  * both ends.
  *
  * Scale notes: `getOffset` is one directory listing; each batch reads
  * only the files the commit range added (no snapshot replay, no
  * full-table rescans as the table grows).
  */
final class DeltaStreamSource(sqlContext: SQLContext, tablePath: String)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession
  private val initialSnapshot = DeltaSnapshotReader.snapshot(spark, tablePath)

  /** Trigger.AvailableNow: the run drains up to the version seen at query
    * start, then stops — even if writers keep committing. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(DeltaSnapshotReader.latestVersion(spark, tablePath))

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  override def schema: StructType = initialSnapshot.schema

  override def getOffset: Option[Offset] = {
    val live = DeltaSnapshotReader.latestVersion(spark, tablePath)
    Some(LongOffset(availableNowCap.fold(live)(math.min(live, _))))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = version(end)
    val batch = start match {
      case None =>
        // first batch: the whole snapshot as of the end version
        DeltaFileIndex.relation(spark,
          DeltaSnapshotReader.snapshotAt(spark, tablePath, Some(endV)))
      case Some(s) =>
        DeltaSnapshotReader.changes(spark, tablePath, version(s), Some(endV))
    }
    org.apache.spark.sql.graft.StreamingDataFrame.asStreaming(batch)
  }

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaStreamSource[$tablePath]"
}
