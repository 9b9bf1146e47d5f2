package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.time.LocalDateTime

/** TIMESTAMP WITHOUT TIME ZONE (`timestampNtz` feature): creation gates the
  * protocol, values round-trip wall-clock-exact regardless of session
  * zone, and the reader accepts foreign tables declaring the feature. */
class TimestampNtzSpec extends SparkSpec {
  import spark.implicits._

  test("creation with an NTZ column gates the protocol and round-trips values") {
    val t = Files.createTempDirectory("graft_ntz").toString + "/tbl"
    val vals = Seq(
      (1L, LocalDateTime.of(2024, 3, 10, 2, 30, 0)), // inside a DST gap in many zones
      (2L, LocalDateTime.of(1999, 12, 31, 23, 59, 59)),
      (3L, LocalDateTime.of(2024, 7, 1, 12, 0, 0)))
    DeltaWriter.write(vals.toDF("id", "ts"), t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val p = snap.protocol.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.get.contains("timestampNtz"))
    assert(p.writerFeatures.get.contains("timestampNtz"))
    assert(snap.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    // wall-clock identity: NTZ never shifts with the session zone
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
      val got = DeltaSnapshotReader.load(spark, t)
        .select("id", "ts").as[(Long, LocalDateTime)].collect().toMap
      assert(got == vals.toMap)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
    // appends to the feature-gated table keep working
    DeltaWriter.write(Seq((4L, LocalDateTime.of(2025, 1, 1, 0, 0, 0))).toDF("id", "ts"), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 4)
  }

  test("NTZ stats are omitted; filters still work (no skipping lies)") {
    val t = Files.createTempDirectory("graft_ntz2").toString + "/tbl"
    DeltaWriter.write((0 until 10).map(i =>
      (i.toLong, LocalDateTime.of(2024, 1, 1 + i, 0, 0, 0))).toDF("id", "ts"), t)
    val n = DeltaSnapshotReader.load(spark, t)
      .filter(col("ts") >= lit(LocalDateTime.of(2024, 1, 5, 0, 0, 0))).count()
    assert(n == 6)
  }
}
