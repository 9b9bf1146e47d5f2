package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrowInterop

/** Arrow interchange: DataFrame partitions serialize to Arrow IPC
  * record-batch payloads without driver collection and deserialize back
  * loss-free — the engine-boundary contract the reference serves its
  * results over (Arrow Blocks). */
class ArrowInteropSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip preserves rows, types and nulls") {
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_custkey")).as("cust"),
        split(col("o_orderpriority"), "-").as("prio_parts"))
      .limit(500)
    val batches = ArrowInterop.toArrowBatches(df, maxRecordsPerBatch = 64L)
    val back = ArrowInterop.fromArrowBatches(spark, batches, df.schema)
    assert(back.schema == df.schema)
    val a = df.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b), s"round-trip diverged: ${a.length} vs ${b.length} rows")
  }

  test("payloads are bounded record batches produced per partition") {
    val df = spark.range(0L, 1000L, 1L, 4).selectExpr("id", "id * 2 AS twice")
    val rdd = ArrowInterop.toArrowBatches(df, maxRecordsPerBatch = 100L)
    assert(rdd.getNumPartitions == 4, "encoding must not repartition")
    val sizes = rdd.map(_.length).collect()
    assert(sizes.length >= 10, s"1000 rows / 100-row batches: got ${sizes.length}")
    assert(sizes.forall(_ > 0))
  }
}
