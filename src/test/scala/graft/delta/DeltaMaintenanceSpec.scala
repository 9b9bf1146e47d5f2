package graft.delta

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Round-2 maintenance/correctness fixes:
  *   - string stats compared in UTF-8 binary order (Spark min/max order),
  *     not UTF-16 code-unit order;
  *   - float literals normalized via shortest-decimal (Float.toString), the
  *     same rendering the stats writer used;
  *   - hive partition-path unescape is the exact inverse of partitionBy's
  *     escaping ('+' must survive);
  *   - checkpoints retain remove tombstones + txn watermarks;
  *   - VACUUM deletes unreferenced files only past retention.
  */
class DeltaMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("string skipping uses UTF-8 binary order (supplementary chars)") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    // Spark min/max order these by UTF-8 bytes: "￿" (EF BF BF) sorts
    // BELOW U+1F600 (F0 9F 98 80); UTF-16 compareTo says the opposite.
    val emoji = new String(Character.toChars(0x1F600))
    val stats = DataSkipping.FileStats(Some(2L),
      mins = Map("s" -> "￿"), maxs = Map("s" -> emoji))
    val s = AttributeReference("s", StringType)()
    assert(DataSkipping.mayContain(stats,
      EqualTo(s, Literal.create(emoji, StringType))),
      "file containing the emoji row must not be skipped")
    // and a genuinely-outside probe still skips
    assert(!DataSkipping.mayContain(stats,
      EqualTo(s, Literal.create("a", StringType))))
  }

  test("float equality predicate does not skip the file holding the value") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.FloatType
    val t = Files.createTempDirectory("graft_m").toString + "/tbl"
    DeltaWriter.write(Seq(0.1f, 0.2f).toDF("x"), t)
    val index = new DeltaFileIndex(spark, DeltaSnapshotReader.snapshot(spark, t))
    val x = AttributeReference("x", FloatType)()
    val listed = index.listFiles(Nil, Seq(EqualTo(x, Literal(0.1f)))).flatMap(_.files)
    assert(listed.nonEmpty, "0.1f row's file was wrongly skipped")
    // NaN/Inf literals never prove anything (kept conservatively)
    val nan = index.listFiles(Nil, Seq(EqualTo(x, Literal(Float.NaN)))).flatMap(_.files)
    assert(nan.nonEmpty)
  }

  test("partition values with '+' and '%' round-trip through the hive path") {
    val t = Files.createTempDirectory("graft_m").toString + "/tbl"
    val df = Seq(("a+b", 1L), ("c%20d", 2L), ("plain", 3L)).toDF("k", "v")
    DeltaWriter.write(df, t, partitionBy = Seq("k"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.map(_.partitionValues("k")).toSet == Set("a+b", "c%20d", "plain"))
    val got = DeltaSnapshotReader.load(spark, t)
      .filter(col("k") === "a+b").select("v").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("auto-checkpoint fires on the delta.checkpointInterval cadence") {
    val t = Files.createTempDirectory("graft_mac").toString + "/tbl"
    def ckExists(v: Long): Boolean =
      Files.exists(java.nio.file.Paths.get(t, "_delta_log", f"$v%020d.checkpoint.parquet"))
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)               // v0
    DeltaWriter.setProperties(spark, t,
      Map("delta.checkpointInterval" -> "2"))                          // v1
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)               // v2 → ck
    assert(ckExists(2L), "commit at the interval must auto-checkpoint")
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "s"), t)               // v3
    assert(!ckExists(3L))
    DeltaWriter.delete(spark, t, col("id") === 1L)                     // v4 → ck (DML path)
    assert(ckExists(4L), "rewrite commits must auto-checkpoint too")
    // the checkpointed table reads correctly even with early JSON gone
    DeltaWriter.cleanupLog(spark, t, retainMs = -1)
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("checkpoint retains remove tombstones and txn watermarks") {
    val t = Files.createTempDirectory("graft_m").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t) // v0
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "s"), t, mode = "overwrite") // v1: removes v0 files
    // foreign streaming writer records an idempotency watermark in v2
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(t, "_delta_log/00000000000000000002.json"), true)
    out.write("""{"txn":{"appId":"streamA","version":7,"lastUpdated":1700000000000}}""".getBytes("UTF-8"))
    out.close()
    DeltaSnapshotReader.invalidate(t)

    val before = DeltaSnapshotReader.snapshot(spark, t)
    assert(before.tombstones.nonEmpty, "overwrite must produce tombstones")
    assert(before.txns == Seq(SetTransaction("streamA", 7L, Some(1700000000000L))))
    // materialize the lazy distributed file set NOW: its replay plan reads
    // the JSON commits this test is about to delete (a truncated log
    // invalidates pre-truncation snapshot handles, same as delta-spark)
    val beforeFiles = before.files

    DeltaWriter.checkpoint(spark, t)
    // drop every JSON commit: the snapshot must rebuild from the checkpoint
    fs.listStatus(new Path(t, "_delta_log")).map(_.getPath)
      .filter(_.getName.endsWith(".json")).foreach(p => fs.delete(p, false))
    DeltaSnapshotReader.invalidate(t)

    val after = DeltaSnapshotReader.snapshot(spark, t)
    assert(after.files.map(_.path).toSet == beforeFiles.map(_.path).toSet)
    assert(after.tombstones.map(_.path).toSet == before.tombstones.map(_.path).toSet,
      "checkpoint lost remove tombstones")
    assert(after.txns == before.txns, "checkpoint lost txn watermarks")
    val rows = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(rows == Set((3L, "c")))
  }

  test("vacuum deletes unreferenced files past retention, keeps active ones") {
    val t = Files.createTempDirectory("graft_m").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t, mode = "overwrite")
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.tombstones.nonEmpty)

    // default retention: the just-removed file is still protected
    assert(DeltaWriter.vacuum(spark, t).isEmpty)
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    assert(snap.tombstones.forall(ts => fs.exists(new Path(t, ts.path))))

    // zero/negative retention: tombstoned file is physically deleted
    val deleted = DeltaWriter.vacuum(spark, t, retentionMs = -60000L)
    assert(deleted.toSet == snap.tombstones.map(_.path).toSet)
    assert(snap.tombstones.forall(ts => !fs.exists(new Path(t, ts.path))))
    // table still reads correctly
    val rows = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(rows == Set((2L, "b")))
  }

  test("restore reverts data and schema as a forward commit") {
    val t = Files.createTempDirectory("graft_rst").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), t) // v0
    DeltaWriter.delete(spark, t, col("id") === 2L)                             // v1
    DeltaWriter.write(Seq((4L, "d", 1.0)).toDF("id", "s", "x"), t, Nil,
      "append", mergeSchema = true)                                            // v2 (evolved)

    val v = DeltaWriter.restore(spark, t, 0L)                                  // v3
    assert(v == 3L)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "s"), "schema must revert")
    assert(DeltaSnapshotReader.load(spark, t)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // history preserved: the pre-restore state is still time-travelable
    assert(DeltaSnapshotReader.load(spark, t, versionAsOf = Some(2L)).count() == 3L) // (1,3,4)
    // restoring to the current version is a no-op
    assert(DeltaWriter.restore(spark, t, 3L) == 3L)
    // restore of a vacuumed version must refuse, not corrupt
    DeltaWriter.restore(spark, t, 2L) // forward again to the evolved state (v4)
    DeltaWriter.vacuum(spark, t, retentionMs = -60000L) // v3 dropped v2's extra file? ensure deletable gone
    val vacuumedTargets = DeltaSnapshotReader.snapshotAt(spark, t, Some(3L)).files
      .map(_.path).toSet -- DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    if (vacuumedTargets.nonEmpty)
      assertThrows[IllegalArgumentException] { DeltaWriter.restore(spark, t, 3L) }
  }

  test("multi-part checkpoint round-trips; cleanupLog truncates history safely") {
    val t = Files.createTempDirectory("graft_mcp").toString + "/tbl"
    (0 until 5).foreach(i => DeltaWriter.write(Seq((i.toLong, s"r$i")).toDF("id", "s"), t))
    DeltaWriter.checkpoint(spark, t, parts = 3)
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(t, "_delta_log")
    val cpParts = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
    assert(cpParts.length == 3, cpParts.mkString(","))

    // replay from the multi-part checkpoint alone must reconstruct the table
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t)
      .as[(Long, String)].collect().toSet == (0 until 5).map(i => (i.toLong, s"r$i")).toSet)

    // retention guard: young log entries survive
    assert(DeltaWriter.cleanupLog(spark, t).isEmpty)
    // aged out: pre-checkpoint commits go, snapshot still reads
    val deleted = DeltaWriter.cleanupLog(spark, t, retainMs = -60000L)
    assert(deleted.count(_.endsWith(".json")) == 4) // commits 0-3 (< cp version 4)
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 5L)
    // a later commit on the truncated log still lands and reads
    DeltaWriter.write(Seq((9L, "r9")).toDF("id", "s"), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 6L)
    // time travel below the checkpoint is (correctly) no longer possible
    assertThrows[Exception] {
      DeltaSnapshotReader.load(spark, t, versionAsOf = Some(1L)).count()
    }
  }

  test("GENERATE manifest: per-partition files, refresh on regenerate, DV refusal") {
    val t = Files.createTempDirectory("graft_manifest").toString + "/tbl"
    DeltaWriter.write(
      (0L until 20L).map(i => (i, i % 2)).toDF("id", "p"), t, Seq("p"), "overwrite")
    assert(DeltaWriter.generateManifest(spark, t) == 2L) // one per partition
    def listed(p: Long): Seq[String] = scala.io.Source.fromFile(
      s"$t/_symlink_format_manifest/p=$p/manifest").getLines().toSeq
    // every listed URI is an existing parquet file of that partition
    (0L to 1L).foreach { p =>
      val ls = listed(p)
      assert(ls.nonEmpty)
      ls.foreach { u =>
        assert(u.contains(s"p=$p/") && u.endsWith(".parquet"), u)
        assert(new java.io.File(new java.net.URI(u)).exists(), s"missing $u")
      }
    }
    // reading exactly the manifest union reproduces the table
    val all = (0L to 1L).flatMap(listed)
    assert(spark.read.parquet(all: _*).count() == 20L)
    // OPTIMIZE + regenerate: the manifest lists the NEW files only
    DeltaWriter.optimize(spark, t, targetBytes = 1L << 30)
    DeltaWriter.generateManifest(spark, t)
    val after = (0L to 1L).flatMap(listed)
    assert(after.toSet.intersect(all.toSet).isEmpty, "stale pre-OPTIMIZE files listed")
    assert(spark.read.parquet(after: _*).count() == 20L)
    // DV tables refuse: a manifest reader would resurrect deleted rows
    DeltaWriter.deleteWithDV(spark, t, col("id") === 3L)
    val e = intercept[IllegalArgumentException](DeltaWriter.generateManifest(spark, t))
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
  }

  test("GENERATE manifest: vanished partitions swept AFTER the new set lands") {
    val t = Files.createTempDirectory("graft_manifest2").toString + "/tbl"
    DeltaWriter.write(
      (0L until 20L).map(i => (i, i % 4)).toDF("id", "p"), t, Seq("p"), "overwrite")
    assert(DeltaWriter.generateManifest(spark, t) == 4L)
    // overwrite drops partitions 2 and 3 from the snapshot
    DeltaWriter.write(
      (0L until 10L).map(i => (i, i % 2)).toDF("id", "p"), t, Seq("p"), "overwrite")
    assert(DeltaWriter.generateManifest(spark, t) == 2L)
    val root = new java.io.File(s"$t/_symlink_format_manifest")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("p=0", "p=1"), s"stale partition dirs not swept: $dirs")
    // the surviving manifests list only live files
    val uris = dirs.flatMap(d => scala.io.Source.fromFile(
      s"$t/_symlink_format_manifest/$d/manifest").getLines())
    assert(spark.read.parquet(uris: _*).count() == 10L)
  }
}
