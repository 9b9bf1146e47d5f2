package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Identity columns (legacy writer protocol 6): creation-time declaration,
  * writer-assigned unique monotone values, water-mark tracking in the
  * metaData action, GENERATED ALWAYS vs BY DEFAULT semantics, and the DML
  * guard rails. */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_idn").toString + "/tbl"

  test("creation assigns start+k*step; appends continue above the water mark") {
    val t = newTable()
    DeltaWriter.write(Seq("a", "b", "c").toDF("s").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid", start = 10L, step = 5L)))
    assert(DeltaSnapshotReader.snapshot(spark, t).protocol.get.minWriterVersion == 6)
    val v0 = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid").as[(String, Long)].collect().toMap
    assert(v0.values.toSet == Set(10L, 15L, 20L))
    // water mark recorded in the schema metadata
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.schema("rid").metadata.getLong(IdentityColumns.WatermarkKey) == 20L)
    // next batch continues strictly above, never reusing values
    DeltaWriter.write(Seq("d", "e").toDF("s").coalesce(1), t)
    val all = DeltaSnapshotReader.load(spark, t).select("rid").as[Long].collect().toSet
    assert(all == Set(10L, 15L, 20L, 25L, 30L))
    assert(DeltaSnapshotReader.snapshot(spark, t)
      .schema("rid").metadata.getLong(IdentityColumns.WatermarkKey) == 30L)
  }

  test("multi-partition batches stay unique; values survive DELETE without reuse") {
    val t = newTable()
    DeltaWriter.write((0 until 100).map(i => s"r$i").toDF("s").repartition(8), t,
      identity = Seq(IdentityColumns.Spec("rid")))
    val ids = DeltaSnapshotReader.load(spark, t).select("rid").as[Long].collect()
    assert(ids.length == 100 && ids.distinct.length == 100)
    assert(ids.min == 1L && ids.max == 100L)
    DeltaWriter.delete(spark, t, col("rid") > 50L)
    DeltaWriter.write(Seq("x").toDF("s"), t)
    // the deleted range is NOT reused — the mark only moves forward
    val after = DeltaSnapshotReader.load(spark, t).select("rid").as[Long].collect()
    assert(after.max == 101L, s"expected fresh id 101, got ${after.max}")
  }

  test("GENERATED ALWAYS refuses explicit values; BY DEFAULT accepts and syncs the mark") {
    val t = newTable()
    DeltaWriter.write(Seq("a").toDF("s"), t,
      identity = Seq(IdentityColumns.Spec("rid")))
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq(("b", 99L)).toDF("s", "rid"), t)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))

    val t2 = newTable()
    DeltaWriter.write(Seq("a").toDF("s"), t2,
      identity = Seq(IdentityColumns.Spec("rid", allowExplicit = true)))
    DeltaWriter.write(Seq(("b", 99L)).toDF("s", "rid"), t2) // explicit, legal
    DeltaWriter.write(Seq("c").toDF("s"), t2)               // generated above 99
    val got = DeltaSnapshotReader.load(spark, t2)
      .select("s", "rid").as[(String, Long)].collect().toMap
    assert(got("a") == 1L && got("b") == 99L && got("c") == 100L, got.toString)
  }

  test("UPDATE of the identity column and MERGE into an identity table refuse") {
    val t = newTable()
    DeltaWriter.write(Seq("a").toDF("s"), t, identity = Seq(IdentityColumns.Spec("rid")))
    intercept[IllegalArgumentException](
      DeltaWriter.update(spark, t, col("s") === "a", Map("rid" -> lit(7L))))
    intercept[IllegalArgumentException](
      DeltaWriter.merge(spark, t, Seq(("a", 1L)).toDF("s", "rid"), Seq("s")))
    // updating OTHER columns is fine
    DeltaWriter.update(spark, t, col("s") === "a", Map("s" -> lit("z")))
    assert(DeltaSnapshotReader.load(spark, t).select("s").as[String].head() == "z")
  }
}
