package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Row tracking: stable row ids from `add.baseRowId + row_index`, the
  * high-water mark in the `delta.rowTracking` metadata domain, preservation
  * through DV deletes / restore / clone / checkpoints, and the loud refusal
  * of id-renumbering rewrites. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_rowtrk").toString + "/tbl"

  /** ids 0-9 (file A) then 10-19 (file B), row-tracked from v2. */
  private def mkTracked(): String = {
    val t = newTable()
    DeltaWriter.write((0L until 10L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(1).sortWithinPartitions("id"), t)
    DeltaWriter.write((10L until 20L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(1).sortWithinPartitions("id"), t)
    DeltaWriter.enableRowTracking(spark, t)
    t
  }

  private def idsOf(t: String): Map[Long, Long] =
    RowTracking.readWithRowIds(spark, t).select("id", "_row_id")
      .as[(Long, Long)].collect().toMap

  test("enable backfills contiguous ids in path order; protocol + domain recorded") {
    val t = mkTracked()
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val p = snap.protocol.get
    assert(p.minWriterVersion == 7)
    assert(p.writerFeatures.get.contains("rowTracking"))
    assert(p.writerFeatures.get.contains("domainMetadata"))
    assert(RowTracking.isEnabled(snap.configuration))
    assert(RowTracking.highWaterMark(snap) == 19L)
    // every active file got a range; 20 ids total, no gaps, no dups
    val ids = idsOf(t).values.toSeq
    assert(ids.sorted == (0L until 20L))
    // rows of one file are consecutive: id k and k+1 of the same file
    // differ by their row_index delta (files were written sorted by id)
    val byFile = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().sortBy(_._1)
    byFile.sliding(2).foreach { case Array((i1, r1), (i2, r2)) =>
      if (i2 == i1 + 1 && i1 % 10 != 9) assert(r2 == r1 + 1, s"ids $i1,$i2 rows $r1,$r2")
    }
  }

  test("appends mint fresh ranges above the mark; commit version stamped") {
    val t = mkTracked()
    DeltaWriter.write((20L until 25L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(1).sortWithinPartitions("id"), t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(RowTracking.highWaterMark(snap) == 24L)
    val rows = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id", "_row_commit_version")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._2).toSeq.sorted == (0L until 25L))
    // backfilled rows carry the enable commit (2); the append carries 3
    assert(rows.filter(_._1 < 20).forall(_._3 == 2L))
    assert(rows.filter(_._1 >= 20).forall(_._3 == 3L))
  }

  test("DV delete preserves surviving ids; deleted ids never reused") {
    val t = mkTracked()
    val before = idsOf(t)
    DeltaWriter.deleteWithDV(spark, t, col("id").isin(3L, 11L))
    val after = idsOf(t)
    assert(after.keySet == before.keySet -- Set(3L, 11L))
    after.foreach { case (id, rid) => assert(rid == before(id), s"id $id moved") }
    // next append starts above the old mark — the freed ids are not recycled
    DeltaWriter.write(Seq((100L, "x")).toDF("id", "s"), t)
    assert(idsOf(t)(100L) == 20L)
  }

  test("DV update and DV merge preserve every id; merge inserts mint fresh above the mark") {
    val t = mkTracked()
    val before = idsOf(t)
    val vUpd = DeltaWriter.updateWithDV(spark, t, col("id").isin(3L, 11L), Map("s" -> lit("u")))
    val after = idsOf(t)
    assert(after == before, "a DV update must not move any id — replaced rows " +
      "carry theirs into the replacement file via the materialized columns")
    val vers = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_commit_version").as[(Long, Long)].collect().toMap
    assert(vers(3L) == vUpd && vers(11L) == vUpd, "replaced rows carry the update commit")
    assert(vers(4L) == 2L && vers(12L) == 2L, "untouched rows keep their version")
    // DV merge: the matched row keeps its id, the insert mints fresh
    val vMrg = DeltaWriter.mergeWithDV(spark, t, Seq((5L, "m"), (100L, "new")).toDF("id", "s"), Seq("id"))
    val after2 = idsOf(t)
    assert((after2 - 100L) == before, "merge moved a matched/untouched id")
    assert(after2(100L) > 19L && !before.values.toSet.contains(after2(100L)),
      s"insert id ${after2(100L)} must be fresh above the original mark")
    val vers2 = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_commit_version").as[(Long, Long)].collect().toMap
    assert(vers2(5L) == vMrg && vers2(100L) == vMrg && vers2(7L) == 2L)
  }

  test("high-water mark and baseRowId survive a checkpoint") {
    val t = mkTracked()
    DeltaWriter.checkpoint(spark, t)
    DeltaWriter.cleanupLog(spark, t, retainMs = -1) // force bootstrap from cp
    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(RowTracking.highWaterMark(snap) == 19L)
    assert(idsOf(t).values.toSeq.sorted == (0L until 20L))
    DeltaWriter.write(Seq((100L, "x")).toDF("id", "s"), t)
    assert(idsOf(t)(100L) == 20L)
  }

  test("restore and clone carry ids verbatim") {
    val t = mkTracked()
    val before = idsOf(t)
    val c = newTable()
    DeltaWriter.shallowClone(spark, t, c)
    assert(idsOf(c) == before)
    // clone keeps minting above the source's mark
    DeltaWriter.write(Seq((100L, "x")).toDF("id", "s"), c)
    assert(idsOf(c)(100L) == 20L)
    // restore back over an append: the re-added state keeps its old ids
    val vBefore = DeltaSnapshotReader.snapshot(spark, t).version
    DeltaWriter.write(Seq((200L, "y")).toDF("id", "s"), t)
    DeltaWriter.restore(spark, t, vBefore)
    assert(idsOf(t) == before)
  }

  test("OPTIMIZE preserves ids by materializing them into compacted files") {
    val t = mkTracked()
    val before = idsOf(t)
    assert(DeltaSnapshotReader.snapshot(spark, t).files.size == 2)
    val v = DeltaWriter.optimize(spark, t, targetBytes = 1L << 30)
    assert(v.isDefined, "2 small files should compact")
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.size == 1, "compaction should produce one file")
    // every id survives the rewrite bit-exact (read through the
    // materialized columns, not baseRowId + row_index)
    assert(idsOf(t) == before)
    // the compacted add still carries a FRESH default range above the mark
    assert(snap.files.head.baseRowId.contains(20L))
    assert(RowTracking.highWaterMark(snap) == 39L)
    // appends after compaction mint above the advanced mark
    DeltaWriter.write(Seq((100L, "x")).toDF("id", "s"), t)
    assert(idsOf(t)(100L) == 40L)
    // a SECOND compaction keeps the materialized ids (coalesce path)
    DeltaWriter.optimize(spark, t, targetBytes = 1L << 30).foreach { _ =>
      assert(idsOf(t).view.filterKeys(_ != 100L).toMap == before)
    }
  }

  test("ZORDER preserves ids through the curve shuffle") {
    val t = mkTracked()
    val before = idsOf(t)
    DeltaWriter.zorder(spark, t, Seq("id"), bits = 4)
    assert(idsOf(t) == before, "zorder renumbered row ids")
    // clustered adds still carry fresh default ranges above the mark
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(RowTracking.highWaterMark(snap) >= 39L)
    snap.files.foreach(f => assert(f.baseRowId.exists(_ >= 20L)))
  }

  test("UPDATE keeps every id; modified rows get the updating commit version") {
    val t = mkTracked()
    val before = idsOf(t)
    val v = DeltaWriter.update(spark, t, col("id") < 3L, Map("s" -> lit("upd")))
    assert(idsOf(t) == before, "update renumbered row ids")
    val rows = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_commit_version").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(i => assert(rows(i) == v, s"row $i not stamped with $v"))
    assert(rows(5L) == 2L, "untouched row lost its original commit version")
  }

  test("CoW DELETE keeps survivor ids; MERGE: matched inherit, inserts mint") {
    val t = mkTracked()
    val before = idsOf(t)
    DeltaWriter.delete(spark, t, col("id") === 4L)
    val afterDel = idsOf(t)
    assert(afterDel == before - 4L, "CoW delete disturbed survivor ids")
    val src = Seq((7L, "merged"), (100L, "new")).toDF("id", "s")
    DeltaWriter.merge(spark, t, src, on = Seq("id"))
    val afterMerge = idsOf(t)
    assert(afterMerge(7L) == before(7L), "matched merge row lost its id")
    assert((afterMerge - 100L - 7L) == (afterDel - 7L), "merge disturbed other ids")
    assert(afterMerge(100L) > RowTracking.highWaterMark(
      DeltaSnapshotReader.snapshotAt(spark, t, Some(2L))), "insert id not fresh")
    assert(afterMerge.values.toSeq.distinct.size == afterMerge.size, "duplicate ids")
  }

  test("REORG PURGE materializes DVs without moving ids; direct toggle refused") {
    val t = mkTracked()
    DeltaWriter.deleteWithDV(spark, t, col("id").isin(2L, 13L))
    val before = idsOf(t)
    assert(DeltaWriter.reorgPurge(spark, t).isDefined)
    assert(DeltaSnapshotReader.snapshot(spark, t).fileSet.dvFiles.isEmpty)
    assert(idsOf(t) == before, "purge disturbed ids")
    intercept[IllegalArgumentException] {
      DeltaWriter.setProperties(spark, newTableWithData(),
        Map(RowTracking.EnableKey -> "true"))
    }
  }

  private def newTableWithData(): String = {
    val t = newTable()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    t
  }

  test("foreign reader view: adds carry the fields through replay") {
    val t = mkTracked()
    val files = DeltaSnapshotReader.snapshot(spark, t).files.sortBy(_.path)
    assert(files.flatMap(_.baseRowId).sorted == Seq(0L, 10L))
    assert(files.forall(_.defaultRowCommitVersion.contains(2L)))
  }

  test("foreign append without baseRowId refuses loudly instead of dropping rows") {
    import java.nio.file.{Files, Paths}
    val t = mkTracked()
    // simulate a FOREIGN writer appending a file with NO baseRowId stamp:
    // copy an existing data file, log a bare add action
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val src = Paths.get(t, snap.files.head.path)
    val foreign = Paths.get(t, "foreign.parquet")
    Files.copy(src, foreign)
    Files.write(Paths.get(t, "_delta_log").resolve(f"${snap.version + 1}%020d.json"),
      (s"""{"add":{"path":"foreign.parquet","partitionValues":{},"size":${Files.size(foreign)},"modificationTime":1700000000000,"dataChange":true}}""" + "\n")
        .getBytes("UTF-8"))
    DeltaSnapshotReader.invalidate(t)
    val e = intercept[IllegalStateException](idsOf(t))
    assert(e.getMessage.contains("baseRowId") && e.getMessage.contains("foreign.parquet"),
      e.getMessage)
  }

  test("column mapping on a row-tracked table refuses (ids would renumber on rewrite)") {
    val t = mkTracked()
    val e = intercept[IllegalArgumentException](DeltaWriter.enableColumnMapping(spark, t))
    assert(e.getMessage.contains("row-tracked"), e.getMessage)
  }
}
