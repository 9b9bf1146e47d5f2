package graft.delta

import graft.SparkSpec

import java.nio.file.Files

/** Writer guard rails: schema/partitioning enforcement and commit-conflict
  * detection. */
class DeltaWriterGuardSpec extends SparkSpec {
  import spark.implicits._

  test("append with mismatched schema is rejected") {
    val t = Files.createTempDirectory("graft_guard").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((2L, 3.14)).toDF("id", "price"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // table unchanged
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 0L)
  }

  test("append with mismatched partitioning is rejected") {
    val t = Files.createTempDirectory("graft_guard").toString + "/tbl"
    DeltaWriter.write(Seq((1L, 1995, "a")).toDF("id", "yr", "s"), t, partitionBy = Seq("yr"))
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((2L, 1996, "b")).toDF("id", "yr", "s"), t)
    }
    assert(e.getMessage.contains("partitioning mismatch"))
  }

  // --- writer-side protocol gate: the Delta spec requires a writer to
  // REFUSE tables whose protocol demands features it does not implement;
  // writing anyway would silently corrupt (e.g. logical-named parquet into
  // a column-mapped table reads back all-null) ---

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def foreignTable(protocolJson: String, config: String = "{}",
                           schemaJson: Option[String] = None): String = {
    val t = Files.createTempDirectory("graft_gate").toString + "/tbl"
    val dir = java.nio.file.Paths.get(t, "_delta_log")
    Files.createDirectories(dir)
    val sj = schemaJson.getOrElse(esc(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))).json))
    Files.write(dir.resolve(f"${0L}%020d.json"), Seq(
      protocolJson,
      s"""{"metaData":{"id":"m-gate","format":{"provider":"parquet","options":{}},"schemaString":"$sj","partitionColumns":[],"configuration":$config,"createdTime":1}}"""
    ).mkString("", "\n", "\n").getBytes("UTF-8"))
    t
  }

  private def cmSchemaJson: String = {
    import org.apache.spark.sql.types._
    def meta(id: Int, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id.toLong)
      .putString("delta.columnMapping.physicalName", phys).build()
    esc(StructType(Seq(
      StructField("id", LongType, nullable = true, meta(1, "col-aa11")),
      StructField("s", StringType, nullable = true, meta(2, "col-bb22")))).json)
  }

  test("write to a column-mapped table lands under PHYSICAL names; DML reads back logical") {
    val t = foreignTable(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
      """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"}""",
      Some(cmSchemaJson))
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    // the parquet on disk must use the mapping's physical names
    val files = DeltaSnapshotReader.snapshot(spark, t).files
    val raw = spark.read.parquet(
      DeltaSnapshotReader.snapshot(spark, t).absolutePath(files.head))
    assert(raw.schema.fieldNames.toSet == Set("col-aa11", "col-bb22"), raw.schema.simpleString)
    // reads and DML stay logical
    assert(DeltaSnapshotReader.load(spark, t).select("id", "s")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    DeltaWriter.delete(spark, t, org.apache.spark.sql.functions.col("id") === 1L)
    assert(DeltaSnapshotReader.load(spark, t).select("id", "s")
      .as[(Long, String)].collect().toSet == Set((2L, "b")))
    // unsupported on mapped tables: schema evolution (needs id assignment)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((3L, "c", 1.0)).toDF("id", "s", "x"), t, mergeSchema = true)
    }
    assert(e.getMessage.contains("mergeSchema"))
  }

  test("unknown writerFeatures are refused; fully-supported feature sets are not") {
    val t = foreignTable(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","icebergCompatV2"]}}""")
    val e = intercept[DeltaUnsupportedFeatureException] {
      DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    }
    assert(e.getMessage.contains("icebergCompatV2"))

    val ok = foreignTable(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","checkConstraints"]}}""")
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), ok)
    assert(DeltaSnapshotReader.load(spark, ok).count() == 1L)
  }

  test("legacy minWriterVersion above the implemented ladder is refused") {
    // the legacy ladder ends at 6 (identity columns, implemented);
    // a bare 7 without writerFeatures is malformed and must refuse
    val t = foreignTable("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7}}""")
    val e = intercept[DeltaUnsupportedFeatureException] {
      DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    }
    assert(e.getMessage.contains("minWriterVersion"))
  }

  test("foreign commit landing first advances the version; next write builds on it") {
    val t = Files.createTempDirectory("graft_guard").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    // a concurrent writer lands version 1 (no-op commit) before our write
    val race = java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.json")
    java.nio.file.Files.write(race, "{\"commitInfo\":{\"operation\":\"NOOP\"}}\n".getBytes)
    val v = DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)
    assert(v == 2L, "writer must commit ABOVE the foreign version, never overwrite it")
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
