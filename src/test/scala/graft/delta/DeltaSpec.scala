package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Golden-path specs for the from-scratch Delta log reader/writer
  * (SURVEY.md §5.2, FIXTURES.md "Delta-log fixtures"). */
class DeltaSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_delta_spec").toString + "/tbl"

  test("(a) JSON-only log: write then read back") {
    val t = tmpTable()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    DeltaWriter.write(df, t)
    val back = DeltaSnapshotReader.load(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("(b) remove actions: overwrite drops previous files") {
    val t = tmpTable()
    DeltaWriter.write(Seq((1L, "old")).toDF("id", "s"), t)
    DeltaWriter.write(Seq((2L, "new"), (3L, "newer")).toDF("id", "s"), t, mode = "overwrite")
    val back = DeltaSnapshotReader.load(spark, t)
    assert(back.as[(Long, String)].collect().toSet == Set((2L, "new"), (3L, "newer")))
    // v0 still visible via time travel
    val v0 = DeltaSnapshotReader.load(spark, t, versionAsOf = Some(0L))
    assert(v0.as[(Long, String)].collect().toSet == Set((1L, "old")))
  }

  test("(c) checkpoint + trailing JSON commits") {
    val t = tmpTable()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)
    DeltaWriter.checkpoint(spark, t)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "s"), t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.version == 2L)
    val back = DeltaSnapshotReader.load(spark, t)
    assert(back.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // reader must work from the checkpoint even with pre-checkpoint
    // JSON commits deleted (vacuumed) — checkpoint is authoritative
    val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(t, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new org.apache.hadoop.fs.Path(t, "_delta_log/00000000000000000001.json"), false)
    DeltaSnapshotReader.invalidate(t)
    val back2 = DeltaSnapshotReader.load(spark, t)
    assert(back2.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("(d) partitioned table: injection types + pruning reads fewer files") {
    val t = tmpTable()
    val df = Seq((1L, 1995, "x"), (2L, 1995, "y"), (3L, 1996, "z"), (4L, 1997, "w"))
      .toDF("id", "yr", "s")
    DeltaWriter.write(df, t, partitionBy = Seq("yr"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.partitionColumns == Seq("yr"))
    assert(snap.files.forall(f => f.partitionValues.contains("yr")))

    val back = DeltaSnapshotReader.load(spark, t)
    assert(back.schema("yr").dataType == org.apache.spark.sql.types.IntegerType)
    assert(back.select("id", "yr", "s").as[(Long, Int, String)].collect().toSet ==
      Set((1L, 1995, "x"), (2L, 1995, "y"), (3L, 1996, "z"), (4L, 1997, "w")))

    val pruned = DeltaSnapshotReader.prunedFiles(spark, snap, col("yr") >= 1996)
    assert(pruned.nonEmpty && pruned.size < snap.files.size)
    assert(pruned.forall(_.partitionValues("yr").toInt >= 1996))
    val prunedDf = DeltaSnapshotReader.loadWhere(spark, t, col("yr") >= 1996)
    assert(prunedDf.select("id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("(e) snapshot caching: same object, invalidated on write") {
    val t = tmpTable()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    val s1 = DeltaSnapshotReader.snapshot(spark, t)
    val s2 = DeltaSnapshotReader.snapshot(spark, t)
    assert(s1 eq s2, "snapshot must be cached per (table, version)")
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)
    val s3 = DeltaSnapshotReader.snapshot(spark, t)
    assert(s3.version == 1L)
  }

  test("split planner packs by size with open cost") {
    val files = (1 to 10).map(i => AddFile(s"f$i", Map.empty, 100L * 1024, 0L))
    val splits = SplitPlanner.plan(files, maxSplitBytes = 256 * 1024, openCost = 16 * 1024)
    assert(splits.map(_.files.size).sum == 10)
    assert(splits.forall(_.files.size <= 2), "116KB-cost files: ≤2 per 256KB split")
    val one = SplitPlanner.plan(files, maxSplitBytes = 128L * 1024 * 1024)
    assert(one.size == 1)
  }
}
