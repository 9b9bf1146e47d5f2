package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** UniForm-lite (Iceberg metadata export, VERDICT r14 #8): the export is
  * verified STRUCTURALLY — no Iceberg runtime exists offline, so the spec
  * re-reads the full chain (version-hint → metadata.json → manifest-list
  * avro → manifest avro) with the plain Avro reader and pins the
  * recovered file set against the Delta snapshot, plus schema/partition
  * conversion and the loud refusals at the lite boundaries. r16 adds:
  * auto-export on commit (VERDICT r15 #3), nested-type conversion
  * (VERDICT r15 #8), date-typed partition round-trip (ADVICE r15), and
  * the monotonic v<version+1> metadata chain. */
class UniformSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_uniform").toString + "/tbl"

  private def currentMetadata(t: String): com.fasterxml.jackson.databind.JsonNode = {
    val hint = new String(Files.readAllBytes(
      Paths.get(t, "metadata", "version-hint.text")), "UTF-8").trim
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(new String(
      Files.readAllBytes(Paths.get(t, "metadata", s"v$hint.metadata.json")), "UTF-8"))
  }

  test("export + read-back: the Iceberg chain recovers exactly the Delta snapshot's file set") {
    val t = newTable()
    val rows = (0L until 200L).map(i => (i, s"r$i", (1995 + i % 3).toInt))
      .toDF("id", "s", "year")
    DeltaWriter.write(rows.repartition(3), t, Seq("year"), "overwrite")
    DeltaWriter.write((200L until 260L).map(i => (i, s"r$i", 1998)).toDF("id", "s", "year"),
      t, Seq("year"))
    val snapId = IcebergUniform.export(spark, t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snapId == snap.version)

    // files: path/partition/size/record_count all recovered
    val got = IcebergUniform.readManifestEntries(spark, t)
    val root = snap.qualifiedTableRoot
    val expect = snap.fileSet.collected.map { f =>
      (DeltaActions.normAbsolute(root, f.path), f.partitionValues("year"),
        f.size, f.stats.flatMap(DataSkipping.parse).flatMap(_.numRecords).get)
    }.toSet
    assert(got.map(u => (u.path, u.partitionValues("year"), u.size, u.records)).toSet
      == expect, s"recovered set diverged:\n got=$got\n expect=$expect")
    assert(got.map(_.records).sum == 260L)

    // metadata JSON: schema conversion field-for-field, identity spec,
    // version-hint names v<deltaVersion+1> (monotonic with the log)
    val hint = new String(Files.readAllBytes(
      Paths.get(t, "metadata", "version-hint.text")), "UTF-8").trim
    assert(hint == (snap.version + 1).toString,
      s"metadata version $hint should be deltaVersion+1=${snap.version + 1}")
    val meta = currentMetadata(t)
    assert(meta.get("format-version").asInt == 2)
    import scala.jdk.CollectionConverters._
    val fields = meta.get("schemas").get(0).get("fields").elements().asScala.toSeq
    assert(fields.map(f => (f.get("name").asText, f.get("type").asText)) ==
      Seq(("id", "long"), ("s", "string"), ("year", "int")))
    val spec0 = meta.get("partition-specs").get(0).get("fields").get(0)
    assert(spec0.get("name").asText == "year" &&
      spec0.get("transform").asText == "identity" &&
      spec0.get("source-id").asInt == 3)

    // partitioned table → one manifest per partition-value group
    assert(got.map(_.partitionValues("year")).toSet ==
      Set("1995", "1996", "1997", "1998"))
    val manifestFiles = new java.io.File(t, "metadata").listFiles()
      .map(_.getName).filter(n => n.contains("-m-") && n.endsWith(".avro"))
    assert(manifestFiles.length == 4,
      s"expected one manifest per partition group, got ${manifestFiles.toSeq}")

    // idempotent: re-export replaces, read-back unchanged
    IcebergUniform.export(spark, t)
    assert(IcebergUniform.readManifestEntries(spark, t).toSet == got.toSet)

    // the export tracks the CURRENT snapshot: append, re-export, one more file set
    DeltaWriter.write(Seq((300L, "x", 1999)).toDF("id", "s", "year"), t, Seq("year"))
    IcebergUniform.export(spark, t)
    val got2 = IcebergUniform.readManifestEntries(spark, t)
    assert(got2.map(_.records).sum == 261L)
    assert(got2.exists(_.partitionValues("year") == "1999"))
  }

  test("auto-export on commit: enabledFormats=iceberg re-exports without an explicit call") {
    val t = newTable()
    DeltaWriter.write((0L until 30L).map(i => (i, i % 3)).toDF("id", "p"), t, Seq("p"))
    DeltaWriter.setProperties(spark, t,
      Map("delta.universalFormat.enabledFormats" -> "iceberg"))
    // the property is table STATE in force from the next commit on: this
    // append must export v<version+1> metadata with NO explicit export call
    DeltaWriter.write(Seq((100L, 7L)).toDF("id", "p"), t, Seq("p"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val hint = new String(Files.readAllBytes(
      Paths.get(t, "metadata", "version-hint.text")), "UTF-8").trim
    assert(hint == (snap.version + 1).toString,
      s"auto-export should have written v${snap.version + 1}, hint=$hint")
    val got = IcebergUniform.readManifestEntries(spark, t)
    assert(got.map(_.records).sum == 31L)
    assert(got.exists(_.partitionValues("p") == "7"))
    // a second data-changing commit re-exports again — the foreign reader
    // never sees a stale snapshot
    DeltaWriter.write(Seq((101L, 8L)).toDF("id", "p"), t, Seq("p"))
    val got2 = IcebergUniform.readManifestEntries(spark, t)
    assert(got2.map(_.records).sum == 32L)
    assert(got2.exists(_.partitionValues("p") == "8"))
    // the property round-trips like any other config: still enabled after
    // a checkpoint + fresh replay
    DeltaWriter.checkpoint(spark, t)
    DeltaSnapshotReader.invalidate(t)
    val cfg = DeltaSnapshotReader.snapshot(spark, t).configuration
    assert(IcebergUniform.enablesIceberg(cfg))
  }

  test("nested struct/array/map columns convert with depth-first unique field ids") {
    val t = newTable()
    val df = Seq((1L, (2L, "x"), Seq(1, 2, 3), Map("k" -> 1.5)))
      .toDF("id", "nested", "arr", "m")
    DeltaWriter.write(df, t)
    IcebergUniform.export(spark, t)
    assert(IcebergUniform.readManifestEntries(spark, t).map(_.records).sum == 1L)
    val meta = currentMetadata(t)
    import scala.jdk.CollectionConverters._
    val fields = meta.get("schemas").get(0).get("fields").elements().asScala.toSeq
    assert(fields.map(_.get("name").asText) == Seq("id", "nested", "arr", "m"))
    val nested = fields(1).get("type")
    assert(nested.get("type").asText == "struct")
    val nf = nested.get("fields").elements().asScala.toSeq
    assert(nf.map(_.get("type").asText) == Seq("long", "string"))
    val arr = fields(2).get("type")
    assert(arr.get("type").asText == "list" && arr.get("element").asText == "int")
    val m = fields(3).get("type")
    assert(m.get("type").asText == "map" && m.get("key").asText == "string"
      && m.get("value").asText == "double")
    // ids unique across the whole schema; last-column-id is the max
    val ids = scala.collection.mutable.ArrayBuffer[Int]()
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (n.has("id")) ids += n.get("id").asInt
      Seq("fields").foreach(f => Option(n.get(f))
        .foreach(_.elements().asScala.foreach(walk)))
      Seq("element-id", "key-id", "value-id").foreach(f =>
        Option(n.get(f)).foreach(v => ids += v.asInt))
      Seq("type", "element", "key", "value").foreach(f =>
        Option(n.get(f)).filter(_.isObject).foreach(walk))
    }
    fields.foreach(walk)
    assert(ids.distinct.size == ids.size, s"duplicate field ids: $ids")
    assert(meta.get("last-column-id").asInt == ids.max)
  }

  test("date-typed partition column: Avro date logical type, ISO string round-trip") {
    val t = newTable()
    val df = Seq((1L, "2024-01-15"), (2L, "2024-01-15"), (3L, "2024-02-01"))
      .toDF("id", "ds").select(col("id"), to_date(col("ds")).as("d"))
    DeltaWriter.write(df, t, Seq("d"))
    IcebergUniform.export(spark, t)
    val got = IcebergUniform.readManifestEntries(spark, t)
    assert(got.map(_.partitionValues("d")).toSet == Set("2024-01-15", "2024-02-01"),
      s"date partition values must map back to ISO strings, got $got")
  }

  test("column-mapped table: Delta mapping ids become Iceberg field ids, physical names ride the name-mapping") {
    val t = newTable()
    DeltaWriter.write((0L until 30L).map(i => (i, s"r$i", (i % 3).toInt))
      .toDF("id", "s", "p"), t, Seq("p"))
    DeltaWriter.enableColumnMapping(spark, t)
    DeltaWriter.renameColumn(spark, t, "s", "txt") // logical rename; physical stays "s"
    IcebergUniform.export(spark, t)
    val got = IcebergUniform.readManifestEntries(spark, t)
    assert(got.map(_.records).sum == 30L)
    assert(got.map(_.partitionValues("p")).toSet == Set("0", "1", "2"))
    val meta = currentMetadata(t)
    import scala.jdk.CollectionConverters._
    val fields = meta.get("schemas").get(0).get("fields").elements().asScala.toSeq
    assert(fields.map(_.get("name").asText) == Seq("id", "txt", "p"))
    // iceberg ids == the Delta column-mapping ids (the real-UniForm pairing)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val expectIds = snap.schema.fields.map(
      _.metadata.getLong(ColumnMapping.ColumnIdKey).toInt).toSeq
    assert(fields.map(_.get("id").asInt) == expectIds)
    // the name-mapping maps each id to its PHYSICAL parquet name: the
    // renamed column still reads from physical "s"
    val nm = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(meta.get("properties").get("schema.name-mapping.default").asText)
    val byId = nm.elements().asScala.map(e =>
      e.get("field-id").asInt -> e.get("names").get(0).asText).toMap
    val txtId = fields.find(_.get("name").asText == "txt").get.get("id").asInt
    assert(byId(txtId) == "s", s"name-mapping must carry the physical name, got $byId")
    // partition spec source-id follows the mapped id
    val spec0 = meta.get("partition-specs").get(0).get("fields").get(0)
    assert(spec0.get("name").asText == "p" &&
      spec0.get("source-id").asInt ==
        fields.find(_.get("name").asText == "p").get.get("id").asInt)
  }

  test("DV-carrying export emits Iceberg v2 position deletes (no purge needed)") {
    val t = newTable()
    DeltaWriter.write((0L until 40L).map(i => (i, s"r$i", (i % 2).toInt))
      .toDF("id", "s", "p").coalesce(2), t, Seq("p"), "overwrite")
    DeltaWriter.deleteWithDV(spark, t, col("id").isin(3L, 5L, 8L))
    IcebergUniform.export(spark, t)
    // data entries keep the FULL per-file record counts (deletes subtract)
    assert(IcebergUniform.readManifestEntries(spark, t).map(_.records).sum == 40L)
    // delete entries: content=1 manifest rows, counts = masked rows
    val delEntries = IcebergUniform.readDeleteEntries(spark, t)
    assert(delEntries.map(_.records).sum == 3L, delEntries.toString)
    // the delete parquet carries the EXACT (file_path, pos) the DV masks,
    // sorted, and every file_path matches a data entry's file_path
    val dataPaths = IcebergUniform.readManifestEntries(spark, t).map(_.path).toSet
    val rowsByDeleteFile = IcebergUniform.readPositionDeletes(spark, t)
      .withColumn("__src", org.apache.spark.sql.functions.input_file_name())
      .collect().map(r => (r.getString(2), (r.getString(0), r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rows = rowsByDeleteFile.values.flatten.toSeq
    assert(rows.length == 3)
    assert(rows.forall { case (fp, _) => dataPaths.contains(fp) },
      s"delete file_path not among data paths: $rows vs $dataPaths")
    // the spec's sort is (file_path, pos) WITHIN each delete file
    rowsByDeleteFile.foreach { case (src, rs) =>
      assert(rs.sortBy(identity) == rs, s"positions not sorted in $src")
    }
    // a v2 reader's view (data minus position deletes) equals the Delta view
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val deltaLive = DeltaSnapshotReader.load(spark, t).count()
    assert(IcebergUniform.readManifestEntries(spark, t).map(_.records).sum -
      rows.length == deltaLive)
    assert(deltaLive == 37L)
    // the manifest list records the delete manifest with content=1 and the
    // snapshot summary carries the totals
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "metadata", "version-hint.text"))).trim
    val meta = om.readTree(new java.io.File(s"$t/metadata/v$hint.metadata.json"))
    val summary = meta.get("snapshots").get(0).get("summary")
    assert(summary.get("total-position-deletes").asText == "3")
    assert(summary.get("total-delete-files").asText.toInt >= 1)
    // purging afterwards still works and drops the delete entries
    DeltaWriter.reorgPurge(spark, t)
    IcebergUniform.export(spark, t)
    assert(IcebergUniform.readDeleteEntries(spark, t).isEmpty)
    assert(IcebergUniform.readManifestEntries(spark, t).map(_.records).sum == 37L)
  }
}
