package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** ALTER TABLE ADD COLUMNS: metadata-only append of nullable columns —
  * no data file is touched, old rows read null, later appends carry the
  * column; on a column-mapped table new fields draw fresh ids and col-uuid
  * physical names above `delta.columnMapping.maxColumnId`. */
class AddColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_addcol").toString + "/tbl"

  test("metadata-only: files untouched, old rows null, appends carry the column") {
    val t = newTable()
    DeltaWriter.write(spark.range(0, 10).toDF("id"), t, Nil, "overwrite")
    val filesBefore = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    val v = DeltaWriter.addColumns(spark, t, Seq(StructField("note", StringType)))
    assert(v == 1L)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "note"))
    assert(snap.schema("note").nullable)
    assert(snap.files.map(_.path).toSet == filesBefore, "ADD COLUMNS rewrote data files")
    assert(DeltaSnapshotReader.load(spark, t).filter(col("note").isNull).count() == 10)
    DeltaWriter.write(Seq((100L, "x")).toDF("id", "note"), t, Nil, "append")
    val got = DeltaSnapshotReader.load(spark, t)
    assert(got.count() == 11)
    assert(got.filter(col("note") === "x").select("id").as[Long].head() == 100L)
    // an existing name (any case) refuses; so do duplicates within the call
    intercept[IllegalArgumentException](
      DeltaWriter.addColumns(spark, t, Seq(StructField("ID", IntegerType))))
    intercept[IllegalArgumentException](
      DeltaWriter.addColumns(spark, t,
        Seq(StructField("a", IntegerType), StructField("A", LongType))))
  }

  test("column-mapped table: fresh id + col-uuid physical name, maxColumnId bumped") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, Nil, "overwrite")
    DeltaWriter.enableColumnMapping(spark, t)
    val maxBefore = DeltaSnapshotReader.snapshot(spark, t)
      .configuration("delta.columnMapping.maxColumnId").toLong
    DeltaWriter.addColumns(spark, t, Seq(StructField("extra", LongType)))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val f = snap.schema("extra")
    assert(f.metadata.getLong(ColumnMapping.ColumnIdKey) == maxBefore + 1)
    assert(f.metadata.getString(ColumnMapping.PhysicalNameKey).startsWith("col-"))
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong == maxBefore + 1)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("extra").isNull).count() == 2)
    // a write through the mapped physical translation round-trips the column
    DeltaWriter.write(Seq((3L, "c", 30L)).toDF("id", "s", "extra"), t, Nil, "append")
    val got = DeltaSnapshotReader.load(spark, t).orderBy("id")
      .select("id", "s", "extra").as[(Long, String, Option[Long])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
  }
}
