package org.apache.spark.sql.graft

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Visibility bridge for the one `private[sql]` call a V1 streaming Source
  * needs: re-tagging a batch DataFrame as streaming. `Source.getBatch` must
  * return a plan with `isStreaming=true`, and the only constructor for that
  * is `SparkSession.internalCreateDataFrame(..., isStreaming = true)` — the
  * exact call Spark's own FileStreamSource makes (FileStreamSource.scala,
  * "dataPlan ... isStreaming = true"). No behavior is reimplemented here;
  * this object only lives in the `org.apache.spark.sql` namespace to
  * satisfy the access qualifier — the standard pattern for out-of-tree V1
  * connectors. */
object StreamingDataFrame {

  /** The same logical result as `df`, tagged as a streaming batch. The
    * input plan keeps its pushdown/pruning; `toRdd` defers execution. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cdf.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}

/** Visibility bridge for the two `private[sql]`/`protected[sql]` helpers a
  * DataSource V2 scan builder needs: Catalyst-expression → `sources.Filter`
  * translation (what every file source's pushdown calls) and the v1→v2
  * `Predicate` view the `pushedFilters` contract reports. Translation-only
  * — no behavior is reimplemented. */
object FilterBridge {

  def translate(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  def toV2(f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.connector.expressions.filter.Predicate = f.toV2
}

/** Arrow interchange (the reference's OUTPUT CONTRACT is Arrow `Block`s —
  * DeltaRecordHandler.scala:4,150): serialize a DataFrame's partitions as
  * Arrow IPC record-batch payloads without collecting rows on the driver,
  * and rebuild a DataFrame from such payloads. Uses Spark's own
  * `ArrowConverters` (the machinery behind `toPandas`/SparkR) via the
  * namespace bridge — no re-implementation of the columnar encoding. */
object ArrowInterop {

  /** One Arrow IPC record-batch payload per ≤`maxRecordsPerBatch` rows,
    * produced DISTRIBUTED (an `RDD[Array[Byte]]` — each partition encodes
    * its own rows; nothing is driver-collected until the caller decides
    * to). The plan keeps its pushdown/pruning through `toRdd`. */
  def toArrowBatches(df: DataFrame, maxRecordsPerBatch: Long = 10000L): RDD[Array[Byte]] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val schema = cdf.schema
    val tz = cdf.sparkSession.sessionState.conf.sessionLocalTimeZone
    cdf.queryExecution.toRdd.mapPartitions { it =>
      ArrowConverters.toBatchIterator(it, schema, maxRecordsPerBatch, tz,
        true, false, TaskContext.get())
    }
  }

  /** Rebuild a DataFrame from Arrow IPC record-batch payloads (the inverse
    * of [[toArrowBatches]] — e.g. blocks received from an external Arrow
    * producer). Decoding runs distributed over the payload partitions. */
  def fromArrowBatches(spark: SparkSession, batches: RDD[Array[Byte]],
                       schema: StructType): DataFrame = {
    val cspark = spark.asInstanceOf[classic.SparkSession]
    val tz = cspark.sessionState.conf.sessionLocalTimeZone
    val rows = batches.mapPartitions { it =>
      ArrowConverters.fromBatchIterator(it, schema, tz, true, false,
        TaskContext.get()).map(_.copy())
    }
    cspark.internalCreateDataFrame(rows, schema)
  }
}
