package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

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
