package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** REPLACE WHERE (predicate-scoped overwrite): exactly the matching rows
  * are replaced, the incoming batch must stay inside the region, files
  * outside the region are untouched, and row tracking / CDF thread
  * through. */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val t = Files.createTempDirectory("graft_rw").toString + "/tbl"
    // two partitions, one file each
    DeltaWriter.write(Seq((1L, "p1", 10.0), (2L, "p1", 20.0))
      .toDF("id", "p", "v").coalesce(1), t, Seq("p"))
    DeltaWriter.write(Seq((3L, "p2", 30.0), (4L, "p2", 40.0))
      .toDF("id", "p", "v").coalesce(1), t, Seq("p"))
    t
  }

  test("replaces exactly the matching region; other files untouched") {
    val t = mkTable()
    val before = DeltaSnapshotReader.snapshot(spark, t)
      .files.filter(_.partitionValues("p") == "p2").map(_.path).toSet
    DeltaWriter.replaceWhere(spark, t,
      Seq((10L, "p1", 99.0)).toDF("id", "p", "v"), col("p") === "p1")
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((10L, 99.0), (3L, 30.0), (4L, 40.0)), got.toString)
    // the p2 file was not rewritten
    val after = DeltaSnapshotReader.snapshot(spark, t)
      .files.filter(_.partitionValues("p") == "p2").map(_.path).toSet
    assert(after == before, "untouched partition's files must not move")
  }

  test("incoming rows outside the predicate refuse") {
    val t = mkTable()
    val e = intercept[IllegalArgumentException](
      DeltaWriter.replaceWhere(spark, t,
        Seq((10L, "p2", 99.0)).toDF("id", "p", "v"), col("p") === "p1"))
    assert(e.getMessage.contains("NOT matching"), e.getMessage)
  }

  test("non-partition predicate: survivors in affected files are kept") {
    val t = mkTable()
    DeltaWriter.replaceWhere(spark, t,
      Seq((20L, "p1", 15.0)).toDF("id", "p", "v"), col("v") < 16.0)
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    // id 1 (v=10) replaced by 20; 2,3,4 survive
    assert(got == Seq(2L, 3L, 4L, 20L), got.toString)
  }

  test("row-tracked table: survivors keep ids, replacements mint fresh") {
    val t = mkTable()
    DeltaWriter.enableRowTracking(spark, t)
    val before = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    DeltaWriter.replaceWhere(spark, t,
      Seq((10L, "p1", 99.0)).toDF("id", "p", "v"), col("p") === "p1")
    val after = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after(3L) == before(3L) && after(4L) == before(4L))
    assert(after(10L) > before.values.max, s"replacement must mint a fresh id: $after")
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("CDF: replaced rows feed delete, incoming rows feed insert") {
    val t = mkTable()
    DeltaWriter.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = DeltaSnapshotReader.snapshot(spark, t).version
    DeltaWriter.replaceWhere(spark, t,
      Seq((10L, "p1", 99.0)).toDF("id", "p", "v"), col("p") === "p1")
    val feed = ChangeDataFeed.read(spark, t, fromVersion = v0 + 1)
      .select(col("id"), col(ChangeDataFeed.ChangeTypeCol).as("ct"))
      .as[(Long, String)].collect().toSet
    assert(feed == Set((1L, "delete"), (2L, "delete"), (10L, "insert")), feed.toString)
  }
}
