package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.File

/** `typeWidening` table feature: metadata-only column type widening; old
  * narrow parquet files upcast at scan, new appends write wide. */
class TypeWideningSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val d = new File(sys.props("java.io.tmpdir"), s"graft_typewide_$tag")
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    if (d.exists()) rm(d)
    DeltaSnapshotReader.invalidate(d.toString)
    d.toString
  }

  test("int->long: old files upcast, wide appends land, filters still prune") {
    val t = fresh("intlong")
    DeltaWriter.write(
      spark.range(0, 100).select(col("id").cast("int").as("k"), col("id").as("tag")),
      t, Nil, "overwrite")
    DeltaWriter.widenColumnType(spark, t, "k", LongType)
    // append values that cannot fit in int — the point of widening
    DeltaWriter.write(
      spark.range(0, 5).select((col("id") + 10000000000L).as("k"), col("id").as("tag")),
      t, Nil, "append")
    DeltaSnapshotReader.invalidate(t)
    val df = DeltaSnapshotReader.load(spark, t)
    assert(df.schema("k").dataType == LongType)
    assert(df.count() == 105)
    assert(df.agg(max(col("k"))).collect().head.getLong(0) == 10000000004L)
    // predicate over the widened column across BOTH file generations
    assert(df.filter(col("k") >= 50 && col("k") < 60).count() == 10)
    assert(df.filter(col("k") > 9999999999L).count() == 5)
    // provenance metadata recorded
    val meta = DeltaSnapshotReader.snapshot(spark, t).schema("k").metadata
    assert(meta.contains("delta.typeChanges"))
    val tc = meta.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc.head.getString("fromType") == "integer"
      && tc.head.getString("toType") == "long")
    // protocol carries the reader-writer feature on both lists
    val p = DeltaSnapshotReader.snapshot(spark, t).protocol.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.get.contains("typeWidening"))
    assert(p.writerFeatures.get.contains("typeWidening"))
  }

  test("float->double and decimal precision growth widen; stats-based reads stay exact") {
    val t = fresh("fd")
    DeltaWriter.write(
      spark.range(0, 50).select(
        col("id").cast("float").as("f"),
        col("id").cast("decimal(6,2)").as("d")),
      t, Nil, "overwrite")
    DeltaWriter.widenColumnType(spark, t, "f", DoubleType)
    DeltaWriter.widenColumnType(spark, t, "d", DecimalType(14, 2))
    DeltaWriter.write(
      spark.range(0, 3).select(
        (col("id") + 0.5).cast("double").as("f"),
        (col("id") + 123456789012L).cast("decimal(14,2)").as("d")),
      t, Nil, "append")
    DeltaSnapshotReader.invalidate(t)
    val df = DeltaSnapshotReader.load(spark, t)
    assert(df.schema("f").dataType == DoubleType)
    assert(df.schema("d").dataType == DecimalType(14, 2))
    assert(df.count() == 53)
    assert(df.filter(col("f") === 2.5).count() == 1)
    assert(df.filter(col("d") > new java.math.BigDecimal(100000000000L)).count() == 3)
  }

  test("narrowing and non-numeric changes refuse; partition columns refuse") {
    val t = fresh("refuse")
    DeltaWriter.write(
      spark.range(0, 10).select(col("id").as("k"),
        (col("id") % 2).cast("int").as("part")),
      t, Seq("part"), "overwrite")
    assert(intercept[IllegalArgumentException] {
      DeltaWriter.widenColumnType(spark, t, "k", IntegerType)
    }.getMessage.contains("unsupported type change"))
    assert(intercept[IllegalArgumentException] {
      DeltaWriter.widenColumnType(spark, t, "k", StringType)
    }.getMessage.contains("unsupported type change"))
    assert(intercept[IllegalArgumentException] {
      DeltaWriter.widenColumnType(spark, t, "part", LongType)
    }.getMessage.contains("partition column"))
    assert(intercept[IllegalArgumentException] {
      DeltaWriter.widenColumnType(spark, t, "nope", LongType)
    }.getMessage.contains("no such column"))
  }

  test("DML and OPTIMIZE after widening operate on the mixed-generation table") {
    val t = fresh("dml")
    DeltaWriter.write(
      spark.range(0, 40).select(col("id").cast("int").as("k"), col("id").as("v")),
      t, Nil, "overwrite")
    DeltaWriter.widenColumnType(spark, t, "k", LongType)
    DeltaWriter.write(
      spark.range(40, 60).select(col("id").as("k"), col("id").as("v")), t, Nil, "append")
    DeltaWriter.delete(spark, t, col("k") % 10 === 0)  // hits old AND new files
    DeltaWriter.optimize(spark, t)
    DeltaSnapshotReader.invalidate(t)
    val ks = DeltaSnapshotReader.load(spark, t).select("k").collect().map(_.getLong(0)).sorted
    assert(ks.toSeq == (0L until 60L).filterNot(_ % 10 == 0))
  }
}
