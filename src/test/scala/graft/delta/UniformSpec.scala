package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** UniForm-lite (Iceberg metadata export, VERDICT r14 #8): the export is
  * verified STRUCTURALLY — no Iceberg runtime exists offline, so the spec
  * re-reads the full chain (version-hint → metadata.json → manifest-list
  * avro → manifest avro) with the plain Avro reader and pins the
  * recovered file set against the Delta snapshot, plus schema/partition
  * conversion and the loud refusals at the lite boundaries. */
class UniformSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_uniform").toString + "/tbl"

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

    // metadata JSON: schema conversion field-for-field, identity spec
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.readTree(new String(Files.readAllBytes(
      java.nio.file.Paths.get(t, "metadata", "v1.metadata.json")), "UTF-8"))
    assert(meta.get("format-version").asInt == 2)
    import scala.jdk.CollectionConverters._
    val fields = meta.get("schemas").get(0).get("fields").elements().asScala.toSeq
    assert(fields.map(f => (f.get("name").asText, f.get("type").asText)) ==
      Seq(("id", "long"), ("s", "string"), ("year", "int")))
    val spec0 = meta.get("partition-specs").get(0).get("fields").get(0)
    assert(spec0.get("name").asText == "year" &&
      spec0.get("transform").asText == "identity" &&
      spec0.get("source-id").asInt == 3)

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

  test("lite boundaries refuse loudly: deletion vectors, column mapping, nested fields, missing stats") {
    val t = newTable()
    DeltaWriter.write((0L until 20L).map(i => (i, s"r$i")).toDF("id", "s"), t)
    DeltaWriter.deleteWithDV(spark, t, col("id") === 3L)
    val e = intercept[DeltaUnsupportedFeatureException] {
      IcebergUniform.export(spark, t)
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // REORG PURGE clears the DVs → export proceeds
    DeltaWriter.reorgPurge(spark, t)
    IcebergUniform.export(spark, t)
    assert(IcebergUniform.readManifestEntries(spark, t).map(_.records).sum == 19L)
    // nested fields out of scope
    val t2 = newTable()
    DeltaWriter.write(Seq((1L, (2L, "x"))).toDF("id", "nested"), t2)
    val e2 = intercept[DeltaUnsupportedFeatureException] {
      IcebergUniform.export(spark, t2)
    }
    assert(e2.getMessage.contains("primitive"), e2.getMessage)
  }
}
