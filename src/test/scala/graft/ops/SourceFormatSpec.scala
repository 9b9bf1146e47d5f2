package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Locks for the derived source-format keys (Scan.scala): CSV/JSON
  * round-trip fidelity and partition pruning on the partitioned sink. */
class SourceFormatSpec extends SparkSpec {

  test("scan_csv: text round-trip loses nothing (doubles, longs, strings)") {
    val viaCsv = Scan.scanCsv(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .filter(col("user_id") % 3 === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type")).collect()
    assert(viaCsv.map(_.toString).sameElements(direct.map(_.toString)),
      "CSV round-trip must be value-exact")
  }

  test("scan_json: nested struct round-trip is value-exact") {
    val viaJson = Scan.scanJson(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .filter(col("user_id") % 3 === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type")).collect()
    assert(viaJson.map(_.toString).sameElements(direct.map(_.toString)))
  }

  test("scan_merge_schema: old files null-fill the evolved column per file") {
    val rows = Scan.scanMergeSchema(spark, sf).collect()
    val byV = rows.groupBy(_.getAs[Long]("v"))
    assert(byV.keySet == Set(1L, 2L))
    // generation 1 predates o_margin: every group has zero non-null margins
    byV(1L).foreach { r =>
      assert(r.getAs[Long]("n_with_margin") == 0L, s"v=1 leaked margins: $r")
      assert(r.isNullAt(r.fieldIndex("sum_margin")), s"v=1 sum not null: $r")
    }
    // generation 2 carries it for every row
    byV(2L).foreach { r =>
      assert(r.getAs[Long]("n_with_margin") == r.getAs[Long]("n"), s"$r")
      assert(!r.isNullAt(r.fieldIndex("sum_margin")))
    }
    // the merged read schema contains the evolved column; a v=1-only read
    // does NOT (the fill is per-file at read time, not baked into storage)
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_src_msch1_" + sf.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val merged = spark.read.option("mergeSchema", "true").parquet(root + "/data")
    assert(merged.schema.fieldNames.contains("o_margin"))
    val oldOnly = spark.read.parquet(root + "/data/v=1")
    assert(!oldOnly.schema.fieldNames.contains("o_margin"))
  }

  test("sink_sorted: files carry disjoint o_orderdate ranges (stats-prunable)") {
    Scan.sinkSorted(spark, sf).collect() // write the clustered copy
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_sink_sorted_" + sf.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(unix_micros(min(col("o_orderdate")).cast("timestamp")).as("lo"),
        unix_micros(max(col("o_orderdate")).cast("timestamp")).as("hi"))
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1, "range repartition should produce several files")
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"file date ranges overlap: hi=$hi lo2=$lo2")
    }
    // row set preserved
    val n = spark.read.parquet(out).count()
    assert(n == Tables.orders(spark, sf).count())
  }

  test("join_null_safe: planner keeps an equi hash/merge join (no nested loop)") {
    val df = Joins.joinNullSafe(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"null-safe equality fell back to a non-equi join:\n$p")
    // NULL keys must pair with each other (the semantic the operator exists for)
    val k = df.collect().find(_.isNullAt(0))
    assert(k.nonEmpty && k.get.getAs[Long]("n_pairs") > 0,
      "null-key group missing from the null-safe join result")
  }

  test("sink_partitioned: the pruned read touches ONLY the filtered partition") {
    Scan.sinkPartitioned(spark, sf).collect() // ensure staged
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_src_psink1_" + sf.replaceAll("[^A-Za-z0-9.]", "_")).toString + "/data"
    val pruned = spark.read.parquet(out).filter(col("o_year") === 1997)
      .select(col("o_orderkey"))
    pruned.collect()
    // o_year must reach the scan as a PartitionFilter (directory pruning),
    // not survive as a post-scan Filter over every partition
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("o_year")),
      s"o_year not a partition filter:\n$p")
    // and no residual o_year Filter node should remain above the scan
    assert(!p.linesIterator.exists(l =>
        l.trim.startsWith("+- Filter") && l.contains("o_year")),
      s"o_year survived as a post-scan filter:\n$p")
    // layout sanity: one directory per year present in the data
    val years = Tables.orders(spark, sf)
      .select(year(col("o_orderdate"))).distinct().count()
    val dirs = new java.io.File(out).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("o_year="))
    assert(dirs == years)
  }
}
