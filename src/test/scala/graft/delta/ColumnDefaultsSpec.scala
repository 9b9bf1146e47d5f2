package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Column DEFAULT values (`allowColumnDefaults` writer feature): SET/DROP
  * DEFAULT, omitted-column fills on append, protocol gating, and the
  * refusals that keep value ownership unambiguous. */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_defs").toString + "/tbl"

  test("SET DEFAULT gates the protocol; omitted column fills; present column wins") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v"), t)
    DeltaWriter.setColumnDefault(spark, t, "s", "'dflt'")
    val p = DeltaSnapshotReader.snapshot(spark, t).protocol.get
    assert(p.minWriterVersion == 7 && p.writerFeatures.get.contains("allowColumnDefaults"))
    // batch omitting s → filled with the default
    DeltaWriter.write(Seq((3L, 30.0)).toDF("id", "v"), t)
    // batch carrying s → its values win
    DeltaWriter.write(Seq((4L, "x", 40.0)).toDF("id", "s", "v"), t)
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "s").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "dflt", 4L -> "x"), got.toString)
  }

  test("defaults can be expressions; DROP DEFAULT restores the omission error") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, 5L)).toDF("id", "n"), t)
    DeltaWriter.setColumnDefault(spark, t, "n", "CAST(6 * 7 AS LONG)")
    DeltaWriter.write(Seq(2L).toDF("id"), t)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("id") === 2L)
      .select("n").as[Long].head() == 42L)
    DeltaWriter.dropColumnDefault(spark, t, "n")
    intercept[IllegalArgumentException](DeltaWriter.write(Seq(3L).toDF("id"), t))
  }

  test("creation-time declared defaults gate the protocol at v0") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType, nullable = true,
        new MetadataBuilder().putString(ColumnDefaults.CurrentKey, "'c'").build())))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "a")), schema)
    DeltaWriter.write(df, t)
    val p = DeltaSnapshotReader.snapshot(spark, t).protocol.get
    assert(p.minWriterVersion == 7 && p.writerFeatures.get.contains("allowColumnDefaults"))
    DeltaWriter.write(Seq(2L).toDF("id"), t)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("id") === 2L)
      .select("s").as[String].head() == "c")
  }

  test("feature-bump on a v7 table appends ONLY allowColumnDefaults") {
    import org.apache.spark.sql.types._
    val t = newTable()
    // creation-time default → protocol (1, 7, [allowColumnDefaults])
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType, nullable = true,
        new MetadataBuilder().putString(ColumnDefaults.CurrentKey, "'c'").build())))
    DeltaWriter.write(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "a")), schema), t)
    // a second SET DEFAULT on the already-feature-gated table must not drag
    // in the rest of the legacy ladder (identityColumns, columnMapping,
    // changeDataFeed, ...) — v7 tables list their features explicitly, so
    // the feature set must be UNCHANGED from creation
    val before = DeltaSnapshotReader.snapshot(spark, t).protocol.get.writerFeatures.get
    DeltaWriter.setColumnDefault(spark, t, "id", "0")
    val p = DeltaSnapshotReader.snapshot(spark, t).protocol.get
    assert(p.writerFeatures.get.sorted == before.sorted,
      s"${before.mkString(",")} -> ${p.writerFeatures.get.mkString(",")}")
    assert(Seq("identityColumns", "columnMapping", "changeDataFeed", "generatedColumns")
      .forall(f => !p.writerFeatures.get.contains(f)), p.writerFeatures.get.mkString(","))
    assert(DeltaWriter.legacyWriterFeatures(7).isEmpty)
  }

  test("prepare re-validates: a foreign non-self-contained default refuses, not fills") {
    import org.apache.spark.sql.types._
    // a foreign writer declared `id + 1` as a default — resolvable against
    // the incoming batch, so without re-validation it would silently write
    // per-row values instead of failing
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n", LongType, nullable = true,
        new MetadataBuilder().putString(ColumnDefaults.CurrentKey, "id + 1").build())))
    val e = intercept[IllegalArgumentException](
      ColumnDefaults.prepare(Seq(5L).toDF("id"), schema))
    assert(e.getMessage.contains("self-contained"), e.getMessage)
  }

  test("refusals: unknown column, column references, nondeterminism, identity/generated") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    intercept[IllegalArgumentException](
      DeltaWriter.setColumnDefault(spark, t, "zzz", "'x'"))
    intercept[IllegalArgumentException](
      DeltaWriter.setColumnDefault(spark, t, "s", "id || '!'")) // column ref
    intercept[IllegalArgumentException](
      DeltaWriter.setColumnDefault(spark, t, "s", "CAST(rand() AS STRING)"))
    val ti = newTable()
    DeltaWriter.write(Seq("a").toDF("s"), ti,
      identity = Seq(IdentityColumns.Spec("rid")))
    intercept[IllegalArgumentException](
      DeltaWriter.setColumnDefault(spark, ti, "rid", "7"))
  }
}
