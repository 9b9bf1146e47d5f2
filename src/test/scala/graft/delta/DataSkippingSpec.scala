package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Data skipping end-to-end: files with disjoint value ranges, predicates
  * that should prove most of them empty, identical results either way. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: String = {
    val t = Files.createTempDirectory("graft_skip").toString + "/tbl"
    // 4 files with disjoint id ranges (range partitioning by id)
    val df = (0L until 400L).map(i => (i, s"name_$i", (i % 7).toDouble))
      .toDF("id", "name", "score")
      .repartitionByRange(4, col("id"))
    DeltaWriter.write(df, t)
    t
  }

  test("writer records min/max stats per file") {
    val snap = DeltaSnapshotReader.snapshot(spark, table)
    assert(snap.files.size == 4)
    assert(snap.files.forall(_.stats.isDefined))
    val parsed = snap.files.flatMap(f => DataSkipping.parse(f.stats.get))
    assert(parsed.map(_.numRecords.get).sum == 400L)
    assert(parsed.forall(s => s.mins.contains("id") && s.maxs.contains("name")))
  }

  test("range predicate lists only the covering files") {
    val snap = DeltaSnapshotReader.snapshot(spark, table)
    val index = new DeltaFileIndex(spark, snap)
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    val idAttr = AttributeReference("id", LongType)()
    // id > 350 lives in exactly one of the four range files
    val listed = index.listFiles(Nil,
      Seq(GreaterThan(idAttr, Literal(350L)))).flatMap(_.files)
    assert(listed.size == 1, s"expected 1 file, got ${listed.size}")
    // equality probe
    val eq = index.listFiles(Nil, Seq(EqualTo(idAttr, Literal(10L)))).flatMap(_.files)
    assert(eq.size == 1)
    // impossible predicate → nothing listed
    val none = index.listFiles(Nil, Seq(GreaterThan(idAttr, Literal(999L)))).flatMap(_.files)
    assert(none.isEmpty)
    // IsNotNull on a null-free column prunes nothing (nullCount = 0 < n)
    val all = index.listFiles(Nil, Seq(IsNotNull(idAttr))).flatMap(_.files)
    assert(all.size == 4)
  }

  test("null-count and prefix pruning") {
    val t = Files.createTempDirectory("graft_skip_np").toString + "/tbl"
    // file 1: v all null, names a*-b*; file 2: v non-null, names x*-z*
    DeltaWriter.write(Seq(("apple", Option.empty[java.lang.Double]),
      ("banana", Option.empty[java.lang.Double]))
      .toDF("name", "v").repartition(1), t, Nil, "overwrite")
    DeltaWriter.write(Seq(("xray", Some(1.0): Option[java.lang.Double]),
      ("zebra", Some(2.0): Option[java.lang.Double]))
      .toDF("name", "v").repartition(1), t, Nil)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.size == 2)
    val index = new DeltaFileIndex(spark, snap)
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, StringType}
    val v = AttributeReference("v", DoubleType)()
    val name = AttributeReference("name", StringType)()
    // IsNotNull(v) prunes the all-null file; IsNull(v) prunes the full file
    assert(index.listFiles(Nil, Seq(IsNotNull(v))).flatMap(_.files).size == 1)
    assert(index.listFiles(Nil, Seq(IsNull(v))).flatMap(_.files).size == 1)
    // prefix pruning on the string range
    def starts(p: String) = index.listFiles(Nil,
      Seq(StartsWith(name, Literal(p)))).flatMap(_.files).size
    assert(starts("app") == 1) // only the a-b file
    assert(starts("y") == 1)   // only the x-z file
    assert(starts("m") == 0)   // between the ranges: nothing
    // and the reader agrees with brute force
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("name").startsWith("app")).count() == 1L)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("v").isNotNull).count() == 2L)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("v").isNull).count() == 2L)
  }

  test("query through the native reader returns exact results with skipping") {
    val df = DeltaSnapshotReader.load(spark, table).filter(col("id") > 350)
    assert(df.count() == 49)
    assert(df.agg(sum(col("id"))).head().getLong(0) == (351L to 399L).sum)
    // string-range skipping
    val byName = DeltaSnapshotReader.load(spark, table)
      .filter(col("name") === "name_5").count()
    assert(byName == 1)
  }

  test("date column skipping: disjoint date-range files pruned, results exact") {
    val t = Files.createTempDirectory("graft_skip_dt").toString + "/tbl"
    def day(s: String) = java.sql.Date.valueOf(s)
    // two commits with disjoint date ranges
    DeltaWriter.write(Seq((1L, day("1995-01-01")), (2L, day("1995-06-30")))
      .toDF("id", "dt").repartition(1), t, Nil, "overwrite")
    DeltaWriter.write(Seq((3L, day("1998-02-01")), (4L, day("1998-12-31")))
      .toDF("id", "dt").repartition(1), t, Nil)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.size == 2)
    // stats carry ISO date strings
    val parsed = snap.files.flatMap(f => DataSkipping.parse(f.stats.get))
    assert(parsed.forall(_.mins.get("dt").exists(_ == "1995-01-01") ||
      parsed.forall(_.mins.contains("dt"))))
    val index = new DeltaFileIndex(spark, snap)
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.DateType
    val dt = AttributeReference("dt", DateType)()
    def litDay(s: String) = Literal(java.time.LocalDate.parse(s).toEpochDay.toInt, DateType)
    assert(index.listFiles(Nil, Seq(GreaterThan(dt, litDay("1997-01-01")))).flatMap(_.files).size == 1)
    assert(index.listFiles(Nil, Seq(LessThan(dt, litDay("1995-03-01")))).flatMap(_.files).size == 1)
    assert(index.listFiles(Nil, Seq(EqualTo(dt, litDay("1996-06-01")))).flatMap(_.files).isEmpty)
    // and results stay exact through the reader
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("dt") > lit(day("1997-01-01"))).count() == 2L)
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("dt") === lit(day("1995-06-30"))).count() == 1L)
  }

  test("stats survive checkpoint round-trip") {
    DeltaWriter.checkpoint(spark, table)
    DeltaSnapshotReader.invalidate(table)
    val snap = DeltaSnapshotReader.snapshot(spark, table)
    assert(snap.files.forall(_.stats.isDefined))
  }
}
