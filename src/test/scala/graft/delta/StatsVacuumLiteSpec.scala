package graft.delta

import graft.SparkSpec
import graft.ops.DeltaOps
import org.apache.spark.sql.functions._

import java.io.File

/** Stats-only aggregation (no data read) and VACUUM LITE (no data-tree
  * listing) — the two metadata-bounded maintenance/answering paths. */
class StatsVacuumLiteSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val d = new File(sys.props("java.io.tmpdir"), s"graft_statslite_$tag")
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    if (d.exists()) rm(d)
    DeltaSnapshotReader.invalidate(d.toString)
    d.toString
  }

  private def dataFiles(t: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new File(t)).filterNot(_.getPath.contains("_delta_log"))
  }

  test("stats-only agg answers COUNT/MIN/MAX with every data file deleted") {
    val t = fresh("stats")
    DeltaWriter.write(spark.range(10, 500).toDF("k"), t, Nil, "overwrite")
    DeltaWriter.write(spark.range(500, 700).toDF("k"), t, Nil, "append")
    val expected = (690L, 10L, 699L)
    val viaStats = DeltaOps.statsOnlyAgg(spark, t, "k").collect().head
    assert((viaStats.getLong(0), viaStats.getLong(1), viaStats.getLong(2)) == expected)
    // hard proof: no data file is needed
    dataFiles(t).foreach(f => assert(f.delete()))
    DeltaSnapshotReader.invalidate(t)
    val gone = DeltaOps.statsOnlyAgg(spark, t, "k").collect().head
    assert((gone.getLong(0), gone.getLong(1), gone.getLong(2)) == expected)
  }

  test("stats-only agg falls back to the scan when a DV makes stats inexact") {
    val t = fresh("statsdv")
    DeltaWriter.write(spark.range(0, 100).toDF("k"), t, Nil, "overwrite")
    DeltaWriter.deleteWithDV(spark, t, col("k") < 10)
    DeltaSnapshotReader.invalidate(t)
    val r = DeltaOps.statsOnlyAgg(spark, t, "k").collect().head
    // numRecords of the DV'd file still counts the deleted rows — the
    // fallback scan must report the LIVE values
    assert(r.getLong(0) == 90L && r.getLong(1) == 10L && r.getLong(2) == 99L)
  }

  test("VACUUM LITE deletes tombstoned files only — an orphan needs the full pass") {
    val t = fresh("lite")
    DeltaWriter.write(spark.range(0, 300).toDF("k"), t, Nil, "overwrite")
    DeltaWriter.delete(spark, t, col("k") < 150) // CoW: old files tombstoned
    val orphan = new File(t, "part-orphan-debris.parquet")
    java.nio.file.Files.writeString(orphan.toPath, "not parquet")
    val before = dataFiles(t).size

    val liteDeleted = DeltaWriter.vacuumLite(spark, t, retentionMs = -60000)
    assert(liteDeleted.nonEmpty)
    assert(orphan.exists(), "LITE must not touch files the log never saw")
    assert(dataFiles(t).size == before - liteDeleted.size)
    // table reads exactly the surviving rows
    DeltaSnapshotReader.invalidate(t)
    val ks = DeltaSnapshotReader.load(spark, t).collect().map(_.getLong(0)).sorted
    assert(ks.toSeq == (150L until 300L))
    // idempotent: nothing left for a second lite pass
    assert(DeltaWriter.vacuumLite(spark, t, retentionMs = -60000).isEmpty)
    // the full listing-based pass reaps the orphan
    val fullDeleted = DeltaWriter.vacuum(spark, t, retentionMs = -60000)
    assert(fullDeleted.contains("part-orphan-debris.parquet") && !orphan.exists())
  }

  test("VACUUM LITE via SQL") {
    val t = fresh("litesql")
    DeltaWriter.write(spark.range(0, 100).toDF("k"), t, Nil, "overwrite")
    DeltaWriter.delete(spark, t, col("k") >= 50)
    // sub-default retention is refused unless the guard is lifted
    intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM delta.`$t` LITE RETAIN 0 HOURS").collect()
    }
    spark.conf.set("spark.graft.retentionDurationCheck.enabled", "false")
    val n =
      try spark.sql(s"VACUUM delta.`$t` LITE RETAIN 0 HOURS")
        .collect().head.getLong(0)
      finally spark.conf.unset("spark.graft.retentionDurationCheck.enabled")
    assert(n > 0)
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 50)
  }

  test("delta.dataSkippingNumIndexedCols bounds per-file stats to the first N columns") {
    import spark.implicits._
    val t = fresh("idxcols")
    DeltaWriter.write(Seq((1L, 2L, 3L, "x")).toDF("a", "b", "c", "d"), t)
    DeltaWriter.setProperties(spark, t,
      Map("delta.dataSkippingNumIndexedCols" -> "2"))
    DeltaWriter.write(Seq((4L, 5L, 6L, "y")).toDF("a", "b", "c", "d"), t)
    val v = DeltaSnapshotReader.latestVersion(spark, t)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val src = scala.io.Source.fromFile(
      new File(t, f"_delta_log/$v%020d.json"), "UTF-8")
    val statNodes = try src.getLines().flatMap { l =>
      Option(om.readTree(l).get("add")).flatMap(a => Option(a.get("stats")))
        .map(sn => om.readTree(sn.asText))
    }.toList finally src.close()
    assert(statNodes.nonEmpty)
    statNodes.foreach { st =>
      // numRecords always present; min/max only for the first 2 columns
      assert(st.get("numRecords").asLong > 0)
      val minCols = st.get("minValues").fieldNames()
      val got = scala.collection.mutable.Set[String]()
      while (minCols.hasNext) got += minCols.next()
      assert(got == Set("a", "b"),
        s"stats must index only the first 2 schema columns, got $got")
    }
    // readers stay correct: a filter on an UNINDEXED column still answers
    assert(DeltaSnapshotReader.load(spark, t).filter(col("c") === 6L).count() == 1L)
  }

  test("delta.checkpointPolicy=v2 routes the automatic checkpoint through v2") {
    import spark.implicits._
    val t = fresh("cppolicy")
    DeltaWriter.write(Seq((0L, "a")).toDF("id", "s"), t)
    DeltaWriter.setProperties(spark, t, Map(
      "delta.checkpointPolicy" -> "v2", "delta.checkpointInterval" -> "2"))
    DeltaWriter.write(Seq((1L, "b")).toDF("id", "s"), t) // v2 -> auto-checkpoint
    val log = new File(t, "_delta_log")
    assert(log.listFiles().exists(_.getName.matches("""\d{20}\.checkpoint\.[^.]+\.parquet""")),
      s"expected a uuid-named v2 checkpoint, log=${log.listFiles().map(_.getName).toSeq}")
    assert(new File(log, "_sidecars").exists())
    // the table bootstraps from it after invalidation
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 2L)
  }

  test("recomputeStats: the stats-less-table remedy unlocks stats-only agg, row tracking, UniForm") {
    import spark.implicits._
    val t = fresh("recomp")
    (0L until 40L).map(i => (i, i % 4)).toDF("id", "p")
      .write.partitionBy("p").parquet(t)
    DeltaWriter.convertToDelta(spark, t, Seq("p"), collectStats = false)
    assert(DeltaSnapshotReader.snapshot(spark, t).files.forall(_.stats.isEmpty))
    // stats-dependent features refuse on the stats-less table
    intercept[Exception] { DeltaWriter.enableRowTracking(spark, t) }
    intercept[Exception] { IcebergUniform.export(spark, t) }
    // the remedy: one metadata commit, footer-derived stats, zero data writes
    val before = dataFiles(t).map(f => f.getName -> f.lastModified).toMap
    DeltaWriter.recomputeStats(spark, t)
    assert(dataFiles(t).map(f => f.getName -> f.lastModified).toMap == before,
      "recomputeStats must not touch data files")
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.nonEmpty && snap.files.forall(
      _.stats.flatMap(DataSkipping.parse).flatMap(_.numRecords).isDefined))
    assert(DeltaSnapshotReader.load(spark, t).count() == 40L)
    IcebergUniform.export(spark, t)
    assert(IcebergUniform.readManifestEntries(spark, t).map(_.records).sum == 40L)
    DeltaWriter.enableRowTracking(spark, t)
    assert(RowTracking.readWithRowIds(spark, t)
      .select("_row_id").distinct().count() == 40L)
  }
}
