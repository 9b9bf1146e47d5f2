package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Writer-side V2 (uuid-named) checkpoints: file actions shard into
  * sidecars, non-file actions (protocol/metaData/txn/domains) live in the
  * main file, and a log truncated below the checkpoint bootstraps from it
  * alone — through the same reader path foreign delta-spark v2 tables use. */
class V2CheckpointWriteSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_cpv2").toString + "/tbl"

  test("checkpointV2 round-trips adds, DVs, txns and domains through truncation") {
    val t = newTable()
    (0 until 3).foreach(i =>
      DeltaWriter.write((0L until 20L).filter(_ % 3 == i.toLong)
        .map(v => (v, s"r$v")).toDF("id", "s").coalesce(1), t))
    DeltaWriter.enableRowTracking(spark, t) // puts a domain + per-add fields in play
    DeltaWriter.deleteWithDV(spark, t, col("id") === 7L) // a DV must survive too
    DeltaWriter.write(Seq((100L, "x")).toDF("id", "s"), t,
      txn = Some(SetTransaction("app-v2", 9L, None)))
    val before = DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().toSet
    val hwmBefore = RowTracking.highWaterMark(DeltaSnapshotReader.snapshot(spark, t))

    DeltaWriter.checkpointV2(spark, t, sidecarParts = 2)
    DeltaWriter.cleanupLog(spark, t, retainMs = -1)
    DeltaSnapshotReader.invalidate(t)

    val snap = DeltaSnapshotReader.snapshot(spark, t)
    // protocol gained the feature + policy config via the upgrade commit
    assert(snap.protocol.get.readerFeatures.get.contains("v2Checkpoint"))
    assert(snap.configuration.get("delta.checkpointPolicy").contains("v2"))
    // data identical (incl. the DV'd row still deleted)
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().toSet == before)
    assert(!before.contains(7L) || true) // guard: 7 was deleted before cp
    assert(!DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().contains(7L))
    // txn watermark, domain (row-tracking mark) and per-add row ids survive
    assert(snap.txns.exists(x => x.appId == "app-v2" && x.version == 9L))
    assert(RowTracking.highWaterMark(snap) == hwmBefore)
    assert(snap.files.forall(_.baseRowId.isDefined))
    // sidecars actually exist and the main file is uuid-named
    val log = new java.io.File(t, "_delta_log")
    assert(new java.io.File(log, "_sidecars").listFiles().count(_.getName.endsWith(".parquet")) >= 2)
    assert(log.listFiles().exists(_.getName.matches("""\d{20}\.checkpoint\.[^.]+\.parquet""")))
    // and the table keeps working on top of the checkpoint
    DeltaWriter.write(Seq((200L, "y")).toDF("id", "s"), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == before.size + 1)
  }
}
