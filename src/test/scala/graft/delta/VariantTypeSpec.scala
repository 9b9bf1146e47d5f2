package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** VARIANT (`variantType` reader+writer feature): creation gates the
  * protocol, the binary-encoded values round-trip through Delta parquet,
  * typed `variant_get` access works over the loaded table, DML rewrites
  * carry the column, and stats collection skips it (no min/max lies on an
  * opaque binary encoding). */
class VariantTypeSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val t = Files.createTempDirectory("graft_variant").toString + "/tbl"
    DeltaWriter.write(
      Seq((1L, """{"a": 1, "s": "x"}"""), (2L, """{"a": 2, "s": "y"}"""),
        (3L, """{"a": 30, "nested": {"b": 7}}"""))
        .toDF("id", "js")
        .select(col("id"), parse_json(col("js")).as("v")), t)
    t
  }

  test("creation with a variant column gates the protocol and round-trips values") {
    val t = mkTable()
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val p = snap.protocol.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.get.contains("variantType"))
    assert(p.writerFeatures.get.contains("variantType"))
    assert(snap.schema("v").dataType == org.apache.spark.sql.types.VariantType)
    // typed path access over the round-tripped binary encoding
    val got = DeltaSnapshotReader.load(spark, t)
      .select(col("id"), expr("variant_get(v, '$.a', 'int')").as("a"),
        expr("variant_get(v, '$.nested.b', 'int')").as("b"))
      .as[(Long, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((Some(1), None)), 2L -> ((Some(2), None)),
      3L -> ((Some(30), Some(7)))), got.toString)
    // appends to the feature-gated table keep working
    DeltaWriter.write(Seq((4L, """{"a": 4}"""))
      .toDF("id", "js").select(col("id"), parse_json(col("js")).as("v")), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 4)
  }

  test("DML rewrite carries the variant column; stats omit it") {
    val t = mkTable()
    // stats never claim min/max on the opaque column
    DeltaSnapshotReader.snapshot(spark, t).files
      .flatMap(_.stats.flatMap(DataSkipping.parse)).foreach { st =>
        assert(!st.mins.contains("v") && !st.maxs.contains("v"), st.toString)
      }
    // CoW DELETE reads and rewrites files holding the variant binary
    DeltaWriter.delete(spark, t, col("id") === 2L)
    val left = DeltaSnapshotReader.load(spark, t)
      .select(col("id"), expr("variant_get(v, '$.a', 'int')").as("a"))
      .as[(Long, Int)].collect().toMap
    assert(left == Map(1L -> 1, 3L -> 30), left.toString)
  }

  test("SQL over the variant table: filter + aggregate through variant_get") {
    val t = mkTable()
    DeltaSnapshotReader.load(spark, t).createOrReplaceTempView("variant_tbl")
    val n = spark.sql(
      "SELECT sum(variant_get(v, '$.a', 'long')) AS s FROM variant_tbl " +
        "WHERE variant_get(v, '$.a', 'int') >= 2")
      .as[Long].head()
    assert(n == 32L)
  }
}
