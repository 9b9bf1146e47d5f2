package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Shallow clone (absolute-path adds) + commit history. */
class DeltaCloneSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("graft_clone").toString

  test("shallow clone reads identically, prunes partitions, and mutates independently") {
    val base = newDir()
    val src = s"$base/src"
    val df = (0L until 100L).map(i => (i, (i % 4).toInt, s"r$i")).toDF("id", "p", "s")
    DeltaWriter.write(df.withColumn("p", col("p")), src, Seq("p"), "overwrite")
    DeltaWriter.write((100L until 120L).map(i => (i, (i % 4).toInt, s"r$i")).toDF("id", "p", "s"), src, Seq("p"))
    val dst = s"$base/dst"
    DeltaWriter.shallowClone(spark, src, dst)
    // no data files under the clone root
    assert(!Files.list(java.nio.file.Paths.get(dst)).toArray.map(_.toString)
      .exists(p => p.endsWith(".parquet")))
    val got = DeltaSnapshotReader.load(spark, dst).select("id").as[Long].collect().toSet
    assert(got == (0L until 120L).toSet)
    // partition pruning works via the cloned partitionValues
    val snap = DeltaSnapshotReader.snapshot(spark, dst)
    val pruned = DeltaSnapshotReader.prunedFiles(spark, snap, col("p") === 2)
    assert(pruned.nonEmpty && pruned.size < snap.files.size)
    assert(DeltaSnapshotReader.load(spark, dst).filter(col("p") === 2).count() ==
      (0L until 120L).count(_ % 4 == 2))
    // mutating the clone leaves the source untouched. Predicate chosen to
    // hit every file PARTIALLY (id%10<3 mixes within each task×partition
    // file), so the copy-on-write rewrite genuinely runs — with p = id%4,
    // parity- or range-based predicates delete whole partitions/files and
    // the delete degenerates to remove-only.
    DeltaWriter.delete(spark, dst, col("id") % 10 < 3)
    assert(DeltaSnapshotReader.load(spark, dst).count() == 120L - 36L)
    assert(DeltaSnapshotReader.load(spark, src).count() == 120L)
    // and the clone's rewrite landed under the CLONE root
    assert(Files.walk(java.nio.file.Paths.get(dst)).toArray.map(_.toString)
      .exists(p => p.endsWith(".parquet")))
  }

  test("clone of a DV table carries the deletion vectors as absolute descriptors") {
    val base = newDir()
    val src = s"$base/src"
    DeltaWriter.write((0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), src)
    DeltaWriter.deleteWithDV(spark, src, col("id").isin(2L, 4L))
    val dst = s"$base/dst"
    DeltaWriter.shallowClone(spark, src, dst)
    val snap = DeltaSnapshotReader.snapshot(spark, dst)
    assert(snap.files.exists(_.deletionVector.exists(_.storageType == "p")))
    assert(DeltaSnapshotReader.load(spark, dst).select("id").as[Long].collect().toSet ==
      (0L until 10L).toSet -- Set(2L, 4L))
  }

  test("deep clone is self-contained: survives source overwrite + vacuum(0)") {
    val s = newDir()
    DeltaWriter.write(Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "s", "p"),
      s, Seq("p"))
    val t = newDir()
    DeltaWriter.deepClone(spark, s, t)
    // clone reads identically, hive layout preserved (partition pruning)
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    val pruned = DeltaSnapshotReader.prunedFiles(spark,
      DeltaSnapshotReader.snapshot(spark, t), col("p") === "p1")
    assert(pruned.size == 1)
    // destroy the source's original files: overwrite, then vacuum(0)
    DeltaWriter.write(Seq((9L, "z", "p1")).toDF("id", "s", "p"), s, Seq("p"), "overwrite")
    DeltaWriter.vacuum(spark, s, retentionMs = 0L)
    // a SHALLOW clone of the old snapshot would now be broken; deep reads on
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    // and the clone mutates independently
    DeltaWriter.delete(spark, t, col("id") === 1L)
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long]
      .collect().toSeq == Seq(2L))
  }

  test("deep clone of a row-tracked source carries stable ids verbatim") {
    val s = newDir()
    DeltaWriter.write((0L until 10L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(1).sortWithinPartitions("id"), s)
    DeltaWriter.enableRowTracking(spark, s)
    val srcIds = RowTracking.readWithRowIds(spark, s)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    val t = newDir()
    DeltaWriter.deepClone(spark, s, t)
    val cloneIds = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(cloneIds == srcIds, s"ids diverged: $cloneIds vs $srcIds")
    // the clone keeps minting above the carried high-water mark
    DeltaWriter.write(Seq((100L, "new")).toDF("id", "v"), t)
    val after = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after(100L) > srcIds.values.max)
  }

  test("deep clone of a DV table copies the bins; masks stay independent") {
    val s = newDir()
    DeltaWriter.write((0L until 30L).map(i => (i, s"r$i")).toDF("id", "v")
      .coalesce(1), s)
    DeltaWriter.deleteWithDV(spark, s, col("id") < 3L)
    val t = newDir()
    DeltaWriter.deepClone(spark, s, t)
    // the clone masks the same rows through its OWN copied bin
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long]
      .collect().toSet == (3L until 30L).toSet)
    assert(DeltaSnapshotReader.snapshot(spark, t).fileSet.dvFiles.nonEmpty)
    // independence: purge + vacuum the SOURCE (removes its DV bins) — the
    // clone keeps reading its masked view from its own copies
    DeltaWriter.reorgPurge(spark, s)
    spark.conf.set("spark.graft.retentionDurationCheck.enabled", "false")
    try DeltaWriter.vacuum(spark, s, retentionMs = 0L)
    finally spark.conf.unset("spark.graft.retentionDurationCheck.enabled")
    DeltaSnapshotReader.invalidate(t)
    graft.delta.DeletionVectors.clearCache()
    assert(DeltaSnapshotReader.load(spark, t).count() == 27L)
    // further masking on the clone never touches the source
    DeltaWriter.deleteWithDV(spark, t, col("id") === 5L)
    assert(DeltaSnapshotReader.load(spark, t).count() == 26L)
    assert(DeltaSnapshotReader.load(spark, s).count() == 27L)
  }

  test("history reports per-commit operations, newest first") {
    val t = newDir() + "/t"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t, Nil, "overwrite")
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)
    DeltaWriter.delete(spark, t, col("id") === 1L)
    DeltaWriter.setProperties(spark, t, Map("k" -> "v"))
    val h = DeltaSnapshotReader.history(spark, t).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L, 0L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("SET TBLPROPERTIES", "DELETE", "WRITE", "WRITE"))
    assert(h.forall(r => !r.isNullAt(1) && r.getString(4) == "graft"))
    // a foreign commit without commitInfo still appears (nulls)
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "_delta_log", f"${4L}%020d.json"),
      """{"txn":{"appId":"x","version":1}}""".getBytes("UTF-8"))
    val h2 = DeltaSnapshotReader.history(spark, t).collect()
    assert(h2.length == 5 && h2.head.getLong(0) == 4L && h2.head.isNullAt(2))
  }
}
