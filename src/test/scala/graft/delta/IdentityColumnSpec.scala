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

  test("GENERATED ALWAYS: UPDATE SET and MERGE-supplied values refuse; other columns fine") {
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

  test("MERGE with omitted identity: matched rows keep their id, inserts draw fresh, mark monotone") {
    val t = newTable()
    DeltaWriter.write(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("s", "v").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid")))
    def mark(): Long = DeltaSnapshotReader.snapshot(spark, t)
      .schema("rid").metadata.getLong(IdentityColumns.WatermarkKey)
    val before = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid").as[(String, Long)].collect().toMap
    val m0 = mark()
    // CDC-upsert shape: source has no rid column; b is matched, d/e inserted
    DeltaWriter.merge(spark, t,
      Seq(("b", 20), ("d", 4), ("e", 5)).toDF("s", "v"), Seq("s"))
    val after = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid", "v").as[(String, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(after("b") == (before("b"), 20), s"matched row must keep its id: $after")
    assert(after("a")._1 == before("a") && after("c")._1 == before("c"))
    // inserts strictly above the pre-merge mark, unique
    val insertIds = Seq(after("d")._1, after("e")._1)
    assert(insertIds.forall(_ > m0) && insertIds.distinct.size == 2, after.toString)
    assert(mark() > m0, "value-assigning MERGE must advance the water mark")
    // ids globally unique and the mark covers the extremum
    val all = after.values.map(_._1).toSeq
    assert(all.distinct.size == all.size && mark() >= all.max)
    // second merge continues above the new mark — monotone across commits
    val m1 = mark()
    DeltaWriter.merge(spark, t, Seq(("f", 6)).toDF("s", "v"), Seq("s"))
    val fId = DeltaSnapshotReader.load(spark, t).filter(col("s") === "f")
      .select("rid").as[Long].head()
    assert(fId > m1 && mark() >= fId)
  }

  test("MERGE source supplying a BY DEFAULT identity syncs the mark; merge key on omitted identity refuses") {
    val t = newTable()
    DeltaWriter.write(Seq(("a", 1)).toDF("s", "v").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid", allowExplicit = true)))
    // explicit rid=50 on the insert: legal (BY DEFAULT), syncs the mark
    DeltaWriter.merge(spark, t, Seq(("b", 2, 50L)).toDF("s", "v", "rid"), Seq("s"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.schema("rid").metadata.getLong(IdentityColumns.WatermarkKey) >= 50L)
    // matched row keeps the TARGET id even when the source supplies one
    DeltaWriter.merge(spark, t, Seq(("a", 9, 777L)).toDF("s", "v", "rid"), Seq("s"))
    val aId = DeltaSnapshotReader.load(spark, t).filter(col("s") === "a")
      .select("rid").as[Long].head()
    assert(aId == 1L, s"matched row must keep target id, got $aId")
    // generated continue above the sync point
    DeltaWriter.write(Seq(("c", 3)).toDF("s", "v"), t)
    val cId = DeltaSnapshotReader.load(spark, t).filter(col("s") === "c")
      .select("rid").as[Long].head()
    assert(cId > 50L)
    // merging ON an identity column the source omits cannot work
    intercept[IllegalArgumentException](
      DeltaWriter.merge(spark, t, Seq(("x", 1)).toDF("s", "v"), Seq("rid")))
  }

  test("UPDATE SET on a BY DEFAULT identity column syncs the mark forward") {
    val t = newTable()
    DeltaWriter.write(Seq(("a", 1), ("b", 2)).toDF("s", "v").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid", allowExplicit = true)))
    DeltaWriter.update(spark, t, col("s") === "a", Map("rid" -> lit(40L)))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.schema("rid").metadata.getLong(IdentityColumns.WatermarkKey) == 40L)
    // a backwards explicit value does NOT regress the mark
    DeltaWriter.update(spark, t, col("s") === "b", Map("rid" -> lit(5L)))
    assert(DeltaSnapshotReader.snapshot(spark, t)
      .schema("rid").metadata.getLong(IdentityColumns.WatermarkKey) == 40L)
    // generated values continue above the synced mark
    DeltaWriter.write(Seq(("c", 3)).toDF("s", "v"), t)
    val cId = DeltaSnapshotReader.load(spark, t).filter(col("s") === "c")
      .select("rid").as[Long].head()
    assert(cId == 41L, s"expected 41 above the synced mark, got $cId")
  }

  test("MERGE multi-match source refuses (ambiguous matched row / duplicate ids)") {
    val t = newTable()
    DeltaWriter.write(Seq(("a", 1)).toDF("s", "v").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid")))
    val e = intercept[IllegalArgumentException](
      DeltaWriter.merge(spark, t, Seq(("a", 2), ("a", 3)).toDF("s", "v"), Seq("s")))
    assert(e.getMessage.contains("multiple rows"), e.getMessage)
  }
}
