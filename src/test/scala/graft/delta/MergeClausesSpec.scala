package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Multi-clause MERGE (delta-spark's full surface): conditional WHEN
  * MATCHED UPDATE/DELETE in order, conditional NOT MATCHED INSERT, and NOT
  * MATCHED BY SOURCE UPDATE/DELETE — first applicable clause wins per row.
  * Conditions and SET expressions address the two sides as col("t.x") /
  * col("s.x"). */
class MergeClausesSpec extends SparkSpec {
  import DeltaWriter._
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_mergec").toString + "/tbl"

  private def mkTable(): String = {
    val t = newTable()
    DeltaWriter.write(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "s", "v").coalesce(1), t)
    t
  }

  test("conditional matched update/delete, conditional insert, bySource delete") {
    val t = mkTable()
    // source matches 1,2; brings 5,6 as candidates; 3,4 unmatched-by-source
    val src = Seq((1L, "A", 11.0), (2L, "B", 21.0), (5L, "E", 50.0), (6L, "F", 5.0))
      .toDF("id", "s", "v")
    DeltaWriter.mergeClauses(spark, t, src, Seq("id"), Seq(
      // matched with small target value → delete; else take the source row
      MatchedDelete(Some(col("t.v") < 15.0)),
      MatchedUpdateAll(),
      // insert only substantial source rows
      NotMatchedInsertAll(Some(col("s.v") > 10.0)),
      // unmatched target rows with v >= 40 are retired
      NotMatchedBySourceDelete(Some(col("t.v") >= 40.0))))
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "s", "v").as[(Long, String, Double)].collect().toSet
    // 1 deleted (v=10<15); 2 updated to (B,21); 3 kept; 4 bySource-deleted;
    // 5 inserted (50>10); 6 dropped (5<=10)
    assert(got == Set((2L, "B", 21.0), (3L, "c", 30.0), (5L, "E", 50.0)), got.toString)
  }

  test("MatchedUpdate SET expressions mix both sides; bySource update flags stale rows") {
    val t = mkTable()
    val src = Seq((1L, "x", 100.0), (3L, "y", 300.0)).toDF("id", "s", "v")
    DeltaWriter.mergeClauses(spark, t, src, Seq("id"), Seq(
      MatchedUpdate(Map(
        "v" -> (col("t.v") + col("s.v")),
        "s" -> concat(col("t.s"), lit("+"), col("s.s")))),
      NotMatchedBySourceUpdate(Map("s" -> lit("stale")),
        Some(col("t.v") <= 20.0))))
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "s", "v").as[(Long, String, Double)].collect().toSet
    // 1: v=10+100, s=a+x; 3: v=30+300, s=c+y; 2 (v=20) flagged stale; 4 kept
    assert(got == Set((1L, "a+x", 110.0), (2L, "stale", 20.0),
      (3L, "c+y", 330.0), (4L, "d", 40.0)), got.toString)
  }

  test("clause order decides: first applicable wins") {
    val t = mkTable()
    val src = Seq((1L, "z", 99.0)).toDF("id", "s", "v")
    // both clauses applicable to the match; UPDATE listed first must win
    DeltaWriter.mergeClauses(spark, t, src, Seq("id"), Seq(
      MatchedUpdateAll(),
      MatchedDelete()))
    assert(DeltaSnapshotReader.load(spark, t).filter(col("id") === 1L)
      .select("s").as[String].head() == "z")
  }

  test("row-tracked table: kept/updated rows keep ids, inserts mint above the mark") {
    val t = mkTable()
    DeltaWriter.enableRowTracking(spark, t)
    val before = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    val src = Seq((2L, "B", 21.0), (9L, "I", 90.0)).toDF("id", "s", "v")
    DeltaWriter.mergeClauses(spark, t, src, Seq("id"), Seq(
      MatchedUpdateAll(),
      NotMatchedInsertAll(),
      NotMatchedBySourceDelete(Some(col("t.id") === 4L))))
    val after = RowTracking.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after(2L) == before(2L), "updated row must keep its stable id")
    assert(after(1L) == before(1L) && after(3L) == before(3L))
    assert(!after.contains(4L))
    assert(after(9L) > before.values.max, s"insert must mint above the mark: $after")
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("CDF: clause merge emits delete, update pre/post and insert change rows") {
    val t = mkTable()
    DeltaWriter.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = DeltaSnapshotReader.snapshot(spark, t).version
    val src = Seq((1L, "A", 11.0), (2L, "B", 21.0), (5L, "E", 50.0)).toDF("id", "s", "v")
    DeltaWriter.mergeClauses(spark, t, src, Seq("id"), Seq(
      MatchedDelete(Some(col("t.id") === 1L)),
      MatchedUpdateAll(),
      NotMatchedInsertAll()))
    val feed = ChangeDataFeed.read(spark, t, fromVersion = v0 + 1)
      .select(col("id"), col(ChangeDataFeed.ChangeTypeCol).as("ct"))
      .as[(Long, String)].collect().toSet
    assert(feed == Set((1L, "delete"), (2L, "update_preimage"),
      (2L, "update_postimage"), (5L, "insert")), feed.toString)
  }

  test("identity + CDF clause merge: the feed's insert rows carry the minted ids") {
    val t = newTable()
    DeltaWriter.write(Seq("a", "b").toDF("s").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid", start = 1L, step = 1L)))
    DeltaWriter.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = DeltaSnapshotReader.snapshot(spark, t).version
    DeltaWriter.mergeClauses(spark, t, Seq("a", "x", "y").toDF("s"), Seq("s"), Seq(
      MatchedUpdateAll(), NotMatchedInsertAll()))
    val table = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid").as[(String, Long)].collect().toMap
    val feedInserts = ChangeDataFeed.read(spark, t, fromVersion = v0 + 1)
      .filter(col(ChangeDataFeed.ChangeTypeCol) === "insert")
      .select("s", "rid").as[(String, Long)].collect().toMap
    // the assignment must be IDENTICAL in the data files and the change
    // rows (the persisted raw-insert frame is what guarantees it)
    assert(feedInserts.keySet == Set("x", "y"))
    feedInserts.foreach { case (s, rid) =>
      assert(table(s) == rid, s"CDF insert id $rid diverged from table ${table(s)} for $s")
    }
  }

  test("validation: empty clauses, multi-match source, GENERATED ALWAYS identity guards") {
    val t = mkTable()
    intercept[IllegalArgumentException](
      DeltaWriter.mergeClauses(spark, t, Seq((1L, "x", 1.0)).toDF("id", "s", "v"),
        Seq("id"), Nil))
    // a typo'd SET column must refuse, not silently update nothing
    val eSet = intercept[IllegalArgumentException](
      DeltaWriter.mergeClauses(spark, t, Seq((1L, "x", 1.0)).toDF("id", "s", "v"),
        Seq("id"), Seq(MatchedUpdate(Map("vee" -> lit(0.0))))))
    assert(eSet.getMessage.contains("unknown SET column vee"), eSet.getMessage)
    intercept[IllegalArgumentException](
      DeltaWriter.mergeClauses(spark, t,
        Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "s", "v"),
        Seq("id"), Seq(MatchedUpdateAll())))
    val ti = newTable()
    DeltaWriter.write(Seq("a").toDF("s"), ti,
      identity = Seq(IdentityColumns.Spec("rid")))
    // GENERATED ALWAYS: explicit source values refuse …
    val eExpl = intercept[IllegalArgumentException](
      DeltaWriter.mergeClauses(spark, ti, Seq(("a", 1L)).toDF("s", "rid"),
        Seq("s"), Seq(MatchedUpdateAll())))
    assert(eExpl.getMessage.contains("GENERATED ALWAYS"), eExpl.getMessage)
    // … and so does SET on the identity column
    val eSetId = intercept[IllegalArgumentException](
      DeltaWriter.mergeClauses(spark, ti, Seq("a").toDF("s"),
        Seq("s"), Seq(MatchedUpdate(Map("rid" -> lit(99L))))))
    assert(eSetId.getMessage.contains("GENERATED ALWAYS"), eSetId.getMessage)
  }

  test("identity table: clause merge keeps matched/by-source ids, mints inserts above the mark") {
    val t = newTable()
    DeltaWriter.write(Seq("a", "b", "c").toDF("s").coalesce(1), t,
      identity = Seq(IdentityColumns.Spec("rid", start = 10L, step = 5L)))
    val before = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid").as[(String, Long)].collect().toMap
    DeltaWriter.mergeClauses(spark, t, Seq("a", "x", "y").toDF("s"), Seq("s"), Seq(
      MatchedUpdateAll(),
      NotMatchedInsertAll(),
      NotMatchedBySourceUpdate(Map("s" -> concat(col("t.s"), lit("!"))))))
    val after = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid").as[(String, Long)].collect().toMap
    // matched keeps its value even under UPDATE SET * (stable identity)
    assert(after("a") == before("a"))
    // BY SOURCE updates keep their identity through the rewrite
    assert(after("b!") == before("b") && after("c!") == before("c"))
    // inserts mint fresh distinct values above the mark (20)
    val minted = Set(after("x"), after("y"))
    assert(minted.size == 2 && minted.forall(_ > 20L), s"minted=$minted")
    val mark = DeltaSnapshotReader.snapshot(spark, t)
      .schema("rid").metadata.getLong(IdentityColumns.WatermarkKey)
    assert(mark == minted.max, s"water mark $mark should be ${minted.max}")
    // the DV clause leg follows the same identity rules
    DeltaWriter.setProperties(spark, t, Map("delta.enableDeletionVectors" -> "true"))
    DeltaWriter.mergeClauses(spark, t, Seq("x", "z").toDF("s"), Seq("s"), Seq(
      MatchedDelete(), NotMatchedInsertAll()))
    val after2 = DeltaSnapshotReader.load(spark, t)
      .select("s", "rid").as[(String, Long)].collect().toMap
    assert(!after2.contains("x"))
    assert(after2("a") == before("a") && after2("b!") == before("b"))
    assert(after2("z") > mark, s"DV-leg insert ${after2("z")} must mint above $mark")
  }
}
