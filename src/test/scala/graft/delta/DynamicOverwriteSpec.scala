package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DYNAMIC PARTITION OVERWRITE: partitions present in the batch are wholly
  * replaced (rows absent from the batch included), untouched partitions'
  * files never move, unpartitioned targets and empty batches refuse. */
class DynamicOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val t = Files.createTempDirectory("graft_dpo").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "p1", 10.0), (2L, "p1", 20.0))
      .toDF("id", "p", "v").coalesce(1), t, Seq("p"))
    DeltaWriter.write(Seq((3L, "p2", 30.0), (4L, "p2", 40.0))
      .toDF("id", "p", "v").coalesce(1), t, Seq("p"))
    DeltaWriter.write(Seq((5L, "p3", 50.0)).toDF("id", "p", "v").coalesce(1),
      t, Seq("p"), "append")
    t
  }

  test("batch partitions wholly replaced, others' files untouched") {
    val t = mkTable()
    val before = DeltaSnapshotReader.snapshot(spark, t)
      .files.filter(_.partitionValues("p") == "p3").map(_.path).toSet
    // the p1 batch has ONE row — p1's other row must disappear (the
    // semantics that distinguish dynamic overwrite from an upsert)
    DeltaWriter.overwriteDynamic(spark, t,
      Seq((10L, "p1", 99.0), (11L, "p2", 88.0), (12L, "p2", 77.0))
        .toDF("id", "p", "v"))
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((10L, 99.0), (11L, 88.0), (12L, 77.0), (5L, 50.0)), got.toString)
    val after = DeltaSnapshotReader.snapshot(spark, t)
      .files.filter(_.partitionValues("p") == "p3").map(_.path).toSet
    assert(after == before, "untouched partition's files must not move")
  }

  test("unpartitioned table and empty batch refuse") {
    val flat = Files.createTempDirectory("graft_dpo_flat").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), flat)
    val e1 = intercept[IllegalArgumentException](
      DeltaWriter.overwriteDynamic(spark, flat, Seq((2L, "b")).toDF("id", "s")))
    assert(e1.getMessage.contains("unpartitioned"), e1.getMessage)
    val t = mkTable()
    val e2 = intercept[IllegalArgumentException](
      DeltaWriter.overwriteDynamic(spark, t,
        Seq((1L, "p1", 1.0)).toDF("id", "p", "v").filter(col("id") < 0)))
    assert(e2.getMessage.contains("empty batch"), e2.getMessage)
  }

  test("history records the overwrite scoped to the touched partitions") {
    val t = mkTable()
    DeltaWriter.overwriteDynamic(spark, t, Seq((9L, "p2", 1.0)).toDF("id", "p", "v"))
    val top = DeltaSnapshotReader.history(spark, t).collect().head
    assert(top.getString(2) == "WRITE", top.toString)
    // predicate mentions only the touched partition value
    val pred = top.getAs[Map[String, String]]("operationParameters")
      .getOrElse("replaceWhere", "")
    assert(pred.contains("p2") && !pred.contains("p1"), pred)
  }
}
