package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DataSource V2 provider (`graftdelta2`): scan correctness vs the v1
  * reader, and the three pushdowns the connector contract makes explicit —
  * partition pruning (consumed filters + pruned input partitions), column
  * pruning (narrowed read schema), data-filter pushdown (parquet +
  * stats). */
class GraftDeltaV2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val table: String = {
    val t = Files.createTempDirectory("graft_v2").toString + "/tbl"
    val df = (1L to 300L).map(i => (i, s"r$i", (i % 3).toInt, i * 1.5))
      .toDF("id", "s", "p", "v")
    DeltaWriter.write(df.repartition(4), t, Seq("p"), "overwrite")  // v0
    DeltaWriter.write(Seq((301L, "x", 0, 451.5)).toDF("id", "s", "p", "v"), t, Seq("p")) // v1
    t
  }

  private def v2(options: (String, String)*) = {
    val r = spark.read.format("graftdelta2")
    options.foldLeft(r)((r, o) => r.option(o._1, o._2)).load(table)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): GraftDeltaScan = {
    df.collect() // finalize any adaptive plan
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n${df.queryExecution.executedPlan}")
    scans.head.scan.asInstanceOf[GraftDeltaScan]
  }

  test("full v2 read equals the v1 log reader, in logical column order") {
    val got = v2().orderBy("id").collect().map(_.toSeq).toSeq
    val want = DeltaSnapshotReader.load(spark, table)
      .select("id", "s", "p", "v").orderBy("id").collect().map(_.toSeq).toSeq
    assert(v2().columns.toSeq == Seq("id", "s", "p", "v"))
    assert(got == want)
  }

  test("partition filters are consumed and prune input partitions") {
    val df = v2().filter(col("p") === 1 && col("v") > 0.0)
    assert(df.count() == 100L)
    val scan = scanOf(df)
    assert(scan.partitionFilters.nonEmpty, "partition filter not consumed")
    val files = scan.planInputPartitions().flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString)
    }
    assert(files.nonEmpty && files.forall(_.contains("p=1")),
      s"unpruned files: ${files.mkString(", ")}")
  }

  test("column pruning narrows the read schema; partition col injected last") {
    val df = v2().select("s", "p")
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("s", "p"), scan.readSchema())
    assert(scan.readDataSchema.fieldNames.toSeq == Seq("s"))
    assert(scan.readPartitionSchema.fieldNames.toSeq == Seq("p"))
    assert(df.distinct().count() == 301L)
  }

  test("data filters push to parquet and remain post-scan residuals") {
    val df = v2().filter(col("id") <= 10L).select("id", "v")
    assert(df.count() == 10L)
    val scan = scanOf(df)
    assert(scan.dataFilters.nonEmpty, "data filter lost")
    assert(scan.description().contains("LessThanOrEqual(id,10)"), scan.description())
    // residual: the executed plan still re-checks the predicate for exactness
    assert(df.queryExecution.executedPlan.toString.contains("Filter"),
      df.queryExecution.executedPlan.toString)
  }

  test("stats-based skipping drops files the predicate disproves") {
    // id is clustered per file only loosely (repartition(4)), but v1's file
    // (id=301) is provably outside id<=10 by min/max stats; at minimum the
    // pruned listing must be strictly smaller than the full one
    val all = scanOf(v2()).planInputPartitions().flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files
    }.length
    val pruned = scanOf(v2().filter(col("id") > 300L)).planInputPartitions().flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files
    }.length
    assert(pruned < all, s"skipping pruned nothing: $pruned vs $all")
  }

  test("time travel options resolve through the shared v1 path") {
    assert(v2("versionAsOf" -> "0").count() == 300L)
    assert(v2().count() == 301L)
  }

  test("DV-carrying tables read live rows via the engine-read substitution") {
    val t = Files.createTempDirectory("graft_v2dv").toString + "/tbl"
    DeltaWriter.write((1L to 50L).toDF("id"), t, Nil, "overwrite")
    DeltaWriter.deleteWithDV(spark, t, col("id") <= 5L)
    // session carries GraftExtensions → GraftDeltaEngineReadRule rewrites
    // the v2 relation into the DV-aware engine plan: masked rows are gone
    val df = spark.read.format("graftdelta2").load(t)
    assert(df.count() == 45L)
    assert(df.agg(org.apache.spark.sql.functions.min(col("id"))).head.getLong(0) == 6L)
  }

  test("DV-carrying tables refuse at scan build when the rule is absent") {
    val t = Files.createTempDirectory("graft_v2dv_bare").toString + "/tbl"
    // one multi-row file: a partial DV delete must leave a real DV behind
    // (single-row files would fully-delete into plain removes)
    DeltaWriter.write((1L to 20L).toDF("id").coalesce(1), t, Nil, "overwrite")
    DeltaWriter.deleteWithDV(spark, t, col("id") <= 5L)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val tbl = new GraftDeltaTable(spark, snap)
    val e = intercept[DeltaUnsupportedFeatureException](
      tbl.newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", t))))
    assert(e.getMessage.contains("GraftExtensions"), e.getMessage)
  }
}
