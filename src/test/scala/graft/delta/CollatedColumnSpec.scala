package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Collated string columns in Delta metadata (`collations-preview`, the
  * public collated-string RFC): creation gates the WRITER feature only
  * (the data is plain strings — readers that predate collations get
  * correct bytes with binary comparison semantics, so the reader version
  * is never raised), the collation rides the schema's `__COLLATIONS`
  * field metadata through the log JSON, the loaded table compares with
  * the declared collation end-to-end, stats skip collated columns (a
  * binary min/max bound is unsound under a non-binary comparator), and
  * un-gated schema evolution refuses. */
class CollatedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val t = Files.createTempDirectory("graft_collate").toString + "/tbl"
    DeltaWriter.write(
      Seq((1L, "Alpha", "x"), (2L, "ALPHA", "y"), (3L, "beta", "z"))
        .toDF("id", "name", "plain")
        .select(col("id"),
          expr("collate(name, 'UTF8_LCASE')").as("name"), col("plain")), t)
    t
  }

  test("creation gates collations-preview (writer only) and the collation round-trips") {
    val t = mkTable()
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val p = snap.protocol.get
    assert(p.writerFeatures.exists(_.contains("collations-preview")), p.toString)
    // writer-only: no reader-version raise, no reader feature
    assert(!p.readerFeatures.exists(_.contains("collations-preview")), p.toString)
    // the log's metaData carries the __COLLATIONS field metadata
    val v0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.json")), "UTF-8")
    assert(v0.contains("__COLLATIONS") && v0.contains("UTF8_LCASE"),
      "schema JSON must carry the collation metadata")
    // replayed schema restores the collated type on `name` but not `plain`
    assert(snap.schema("name").dataType !=
      org.apache.spark.sql.types.StringType, snap.schema("name").toString)
    assert(snap.schema("plain").dataType ==
      org.apache.spark.sql.types.StringType)
    // END-TO-END semantics: grouping on the loaded column merges case
    // variants — the collation survived log replay into the scan schema
    val groups = DeltaSnapshotReader.load(spark, t)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0).toLowerCase -> r.getLong(1)).toMap
    assert(groups == Map("alpha" -> 2L, "beta" -> 1L), groups.toString)
  }

  test("stats omit the collated column but keep plain strings") {
    val t = mkTable()
    val stats = DeltaSnapshotReader.snapshot(spark, t).files
      .flatMap(_.stats.flatMap(DataSkipping.parse))
    assert(stats.nonEmpty)
    stats.foreach { st =>
      assert(!st.mins.contains("name") && !st.maxs.contains("name"),
        s"binary bounds on a collated column are unsound: $st")
      assert(st.mins.contains("plain") && st.mins.contains("id"), st.toString)
    }
  }

  test("DML rewrites and appends carry the collation; un-gated evolution refuses") {
    val t = mkTable()
    DeltaWriter.delete(spark, t, col("id") === 3L)
    val left = DeltaSnapshotReader.load(spark, t)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0).toLowerCase -> r.getLong(1)).toMap
    assert(left == Map("alpha" -> 2L), left.toString)
    DeltaWriter.write(
      Seq((4L, "BETA", "w")).toDF("id", "name", "plain")
        .select(col("id"),
          expr("collate(name, 'UTF8_LCASE')").as("name"), col("plain")), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 3)
    // evolving a collated column ONTO an un-gated table refuses loudly
    val t2 = Files.createTempDirectory("graft_collate2").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), t2)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(
        Seq((2L, "b", "C")).toDF("id", "v", "cname")
          .select(col("id"), col("v"),
            expr("collate(cname, 'UTF8_LCASE')").as("cname")),
        t2, mergeSchema = true)
    }
    assert(e.getMessage.contains("collations-preview"), e.getMessage)
  }
}
