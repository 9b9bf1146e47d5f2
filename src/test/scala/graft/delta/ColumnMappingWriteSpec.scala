package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Column-mapping WRITE lifecycle: upgrade an existing table
  * (metadata-only), write/DML under physical names, zero-rewrite
  * RENAME/DROP COLUMN, and the interplay with partitions, checkpoints,
  * OPTIMIZE and the change data feed. */
class ColumnMappingWriteSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_cmw").toString + "/tbl"

  /** Partitioned unmapped table: ids 0-9 across p∈{0,1}. */
  private def mkTable(): String = {
    val t = newTable()
    DeltaWriter.write((0L until 10L).map(i => (i, s"r$i", i % 2)).toDF("id", "s", "p"),
      t, partitionBy = Seq("p"))
    t
  }

  test("enableColumnMapping is metadata-only: same files, physicalName = old name, protocol 2/5") {
    val t = mkTable()
    val before = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    DeltaWriter.enableColumnMapping(spark, t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.map(_.path).toSet == before, "upgrade must not rewrite data")
    assert(snap.physicalSchema.isDefined)
    assert(snap.physicalFieldName("id") == "id") // existing columns keep their names
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    val p = snap.protocol.get
    assert(p.minReaderVersion >= 2 && p.minWriterVersion >= 5, p.toString)
    assert(DeltaSnapshotReader.load(spark, t).count() == 10)
    intercept[IllegalArgumentException](DeltaWriter.enableColumnMapping(spark, t))
  }

  test("RENAME COLUMN is zero-rewrite; reads, appends and DML use the new name") {
    val t = mkTable()
    DeltaWriter.enableColumnMapping(spark, t)
    val filesBefore = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    DeltaWriter.renameColumn(spark, t, "s", "label")
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.map(_.path).toSet == filesBefore)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "label", "p"))
    assert(snap.physicalFieldName("label") == "s") // physical name unchanged
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("id") === 3L).select("label").as[String].head() == "r3")
    // appends speak the NEW logical name, land under the OLD physical name
    DeltaWriter.write(Seq((10L, "r10", 0L)).toDF("id", "label", "p"), t, Seq("p"))
    DeltaWriter.update(spark, t, col("id") === 10L, Map("label" -> lit("upd")))
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("id") === 10L).select("label").as[String].head() == "upd")
    // renaming a PARTITION column: logical rename, hive dirs stay physical
    DeltaWriter.renameColumn(spark, t, "p", "part")
    assert(DeltaSnapshotReader.load(spark, t).filter(col("part") === 1L).count() == 5)
    DeltaWriter.write(Seq((11L, "r11", 1L)).toDF("id", "label", "part"), t, Seq("part"))
    assert(DeltaSnapshotReader.load(spark, t).filter(col("part") === 1L).count() == 6)
  }

  test("DROP COLUMN hides the data without touching files; guards hold") {
    val t = mkTable()
    intercept[IllegalArgumentException](DeltaWriter.renameColumn(spark, t, "s", "z"))
    DeltaWriter.enableColumnMapping(spark, t)
    val filesBefore = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    DeltaWriter.dropColumn(spark, t, "s")
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.map(_.path).toSet == filesBefore)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "p"))
    assert(DeltaSnapshotReader.load(spark, t).columns.toSeq == Seq("id", "p"))
    intercept[IllegalArgumentException](DeltaWriter.dropColumn(spark, t, "p")) // partition col
    intercept[IllegalArgumentException](DeltaWriter.renameColumn(spark, t, "id", "p"))
    // a column referenced by a CHECK constraint can be neither renamed nor dropped
    DeltaWriter.setProperties(spark, t, Map("delta.constraints.idpos" -> "id >= 0"))
    val e = intercept[IllegalArgumentException](DeltaWriter.dropColumn(spark, t, "id"))
    assert(e.getMessage.contains("constraint"))
  }

  test("OPTIMIZE, checkpoint and MERGE keep a mapped partitioned table intact") {
    val t = newTable()
    (0 until 3).foreach { i =>
      DeltaWriter.write((i * 4 until i * 4 + 4).map(j => (j.toLong, s"r$j", j % 2))
        .toDF("id", "s", "p").repartition(2), t, Seq("p"), if (i == 0) "overwrite" else "append")
    }
    DeltaWriter.enableColumnMapping(spark, t)
    DeltaWriter.renameColumn(spark, t, "p", "bucket")
    DeltaWriter.merge(spark, t,
      Seq((0L, "merged", 0), (100L, "new", 1)).toDF("id", "s", "bucket"), Seq("id"))
    DeltaWriter.optimize(spark, t, targetBytes = 1L << 30)
    DeltaWriter.checkpoint(spark, t)
    DeltaWriter.cleanupLog(spark, t, retainMs = 0L)
    DeltaSnapshotReader.invalidate(t)
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "s", "bucket").as[(Long, String, Long)].collect().toSet
    val exp = (0 until 12).map(j => (j.toLong, if (j == 0) "merged" else s"r$j", (j % 2).toLong))
      .toSet + ((100L, "new", 1L))
    assert(got == exp)
    // partition pruning still works through the checkpoint's physical keys
    // (ids 0,2,4,6,8,10 — the merge's insert went to bucket 1)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("bucket") === 0L).count() == 6)
  }

  test("stats skipping keeps working after upgrade + rename (physical stats keys)") {
    val t = newTable()
    // two files with disjoint id ranges, written pre-upgrade (stats keyed
    // by the original = physical name) and one written post-rename (stats
    // keyed by the physical name too, per the spec)
    DeltaWriter.write((0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaWriter.write((100L until 110L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaWriter.enableColumnMapping(spark, t)
    DeltaWriter.renameColumn(spark, t, "id", "key")
    DeltaWriter.write((200L until 210L).map(i => (i, s"r$i")).toDF("key", "s").coalesce(1), t)
    val index = new DeltaFileIndex(spark, DeltaSnapshotReader.snapshot(spark, t))
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThan, Literal}
    import org.apache.spark.sql.types.LongType
    // the LOGICAL filter (key > 150) must still skip down to one file
    val listed = index.listFiles(Nil,
      Seq(GreaterThan(AttributeReference("key", LongType)(), Literal(150L)))).flatMap(_.files)
    assert(listed.size == 1, s"expected 1 file after skipping, got ${listed.size}")
  }

  test("change data feed on a mapped table: cdc files physical, feed logical") {
    val t = mkTable()
    DeltaWriter.enableColumnMapping(spark, t)
    DeltaWriter.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWriter.renameColumn(spark, t, "s", "label")
    DeltaWriter.delete(spark, t, col("id").isin(2L, 3L))
    val feed = ChangeDataFeed.read(spark, t, 4L)
      .select(col("id"), col("label"), col("p"), col("_change_type"))
      .as[(Long, String, Long, String)].collect().toSet
    assert(feed == Set((2L, "r2", 0L, "delete"), (3L, "r3", 1L, "delete")))
  }

  test("foreign id-mode table: our writes carry parquet field IDs and read back by id") {
    // fixture shaped like DeltaForeignLogSpec's id-mode table: physical
    // names differ from parquet names; matching is by field id
    import org.apache.spark.sql.types._
    def meta(id: Int, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id.toLong)
      .putString("delta.columnMapping.physicalName", phys).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, meta(1, "col-x1")),
      StructField("s", StringType, nullable = true, meta(2, "col-y2"))))
    val t = newTable()
    val dir = java.nio.file.Paths.get(t, "_delta_log")
    Files.createDirectories(dir)
    val sj = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.write(dir.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m-id5","format":{"provider":"parquet","options":{}},"schemaString":"$sj","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"},"createdTime":1}}"""
    ).mkString("", "\n", "\n").getBytes("UTF-8"))
    DeltaWriter.write(Seq((7L, "seven")).toDF("id", "s"), t)
    assert(DeltaSnapshotReader.load(spark, t).select("id", "s")
      .as[(Long, String)].collect().toSeq == Seq((7L, "seven")))
    DeltaWriter.update(spark, t, col("id") === 7L, Map("s" -> lit("SEVEN")))
    assert(DeltaSnapshotReader.load(spark, t).select("s").as[String].head() == "SEVEN")
  }

  test("createColumnMapped(id): fresh col-uuid physical names + field IDs; full lifecycle") {
    val t = newTable()
    DeltaWriter.createColumnMapped(
      (0L until 10L).map(i => (i, s"r$i", i % 2)).toDF("id", "s", "p"),
      t, mode = "id", partitionBy = Seq("p"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.configuration("delta.columnMapping.mode") == "id")
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    // physical names are uuid-fresh — never the logical names
    Seq("id", "s", "p").foreach { c =>
      assert(snap.physicalFieldName(c).startsWith("col-"), snap.physicalFieldName(c))
    }
    // the parquet footer stores the PHYSICAL names (no logical name on disk)
    val dataFile = snap.files.head.path
    val footer = spark.read.parquet(
      new org.apache.hadoop.fs.Path(t, dataFile).toString).schema.fieldNames.toSeq
    assert(footer.forall(_.startsWith("col-")), footer.mkString(","))
    // hive partition dirs use the physical partition name
    assert(dataFile.contains(snap.physicalFieldName("p") + "="), dataFile)
    assert(DeltaSnapshotReader.load(spark, t).select("id", "s", "p")
      .as[(Long, String, Long)].collect().toSet ==
      (0L until 10L).map(i => (i, s"r$i", i % 2)).toSet)
    // rename + DML + append all resolve through the mapping
    DeltaWriter.renameColumn(spark, t, "s", "label")
    DeltaWriter.update(spark, t, col("id") === 3L, Map("label" -> lit("upd")))
    DeltaWriter.write(Seq((10L, "r10", 0L)).toDF("id", "label", "p"), t, Seq("p"))
    val got = DeltaSnapshotReader.load(spark, t)
    assert(got.filter(col("id") === 3L).select("label").as[String].head() == "upd")
    assert(got.count() == 11)
    // partition pruning still works through the physical hive dirs
    assert(got.filter(col("p") === 0L).count() == 6)
    // creating over an existing table refuses
    intercept[IllegalArgumentException](
      DeltaWriter.createColumnMapped(Seq((1L, "x", 0L)).toDF("id", "s", "p"), t, "id"))
  }

  test("remove actions on mapped tables carry PHYSICAL partition keys (ADVICE r13)") {
    // in-memory AddFile.partitionValues are LOGICAL; everything rendered
    // back to the log must be physical — adds always did this, removes
    // with extendedFileMetadata:true must too, or a foreign checkpoint
    // writer consuming them mis-keys the partition map
    val t = newTable()
    DeltaWriter.createColumnMapped(
      (0L until 10L).map(i => (i, s"r$i", i % 2)).toDF("id", "s", "p"),
      t, mode = "id", partitionBy = Seq("p"))
    val physP = DeltaSnapshotReader.snapshot(spark, t).physicalFieldName("p")
    assert(physP != "p", "id-mode physical names must diverge from logical")
    DeltaWriter.delete(spark, t, col("id") < 4) // CoW: removes in both partitions
    val v = DeltaSnapshotReader.latestVersion(spark, t)
    import scala.jdk.CollectionConverters._
    val removes = Files.readAllLines(Paths.get(t, "_delta_log", f"$v%020d.json"))
      .asScala.filter(_.contains("\"remove\""))
    assert(removes.nonEmpty, "the delete must have produced remove actions")
    removes.foreach { l =>
      assert(l.contains("\"" + physP + "\""),
        s"remove partitionValues must be keyed by the physical name $physP:\n$l")
      assert(!l.contains("\"p\":"), s"remove must not carry the logical key:\n$l")
    }
  }
}
