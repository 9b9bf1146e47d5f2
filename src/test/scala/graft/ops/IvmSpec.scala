package graft.ops

import graft.{Det, SparkSpec}
import graft.delta.DeltaSnapshotReader
import org.apache.spark.sql.functions._

/** Incremental view maintenance: the CDF-maintained aggregate must equal a
  * from-scratch aggregate of the final base state BIT FOR BIT (the decimal
  * running sum makes incremental addition exact, not approximate). */
class IvmSpec extends SparkSpec {

  test("delta_ivm equals full recompute over the final base snapshot") {
    val out = DmlOps.deltaIvm(spark, sf).collect().toSeq
    val base = DmlOps.cdfFixture(spark, sf)
    val full = DeltaSnapshotReader.load(spark, base)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
      .collect().toSeq
    assert(out == full)
    assert(out.nonEmpty)
  }

  test("stream_ivm: the stream-maintained rollup equals the batch IVM") {
    val batch = DmlOps.deltaIvm(spark, sf).collect().toSeq
    val streamed = graft.stream.EventOps.streamIvm(spark, sf).collect().toSeq
    assert(streamed == batch)
  }
}
