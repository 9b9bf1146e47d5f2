package graft.ops

import graft.SparkSpec

/** Physical-plan audits (builder prompt: "explain the plan and iterate
  * until it's the plan you'd want"). These lock in the scale-critical plan
  * properties so a regression (lost pushdown, wrong join strategy, dead
  * codegen) fails CI rather than silently costing 100x at 100 TB. */
class PlanSpec extends SparkSpec {

  private def plan(key: String): String = {
    val df = graft.SparkEntry.queries(key)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("filter_pushdown pushes predicates into the parquet scan") {
    val p = plan("filter_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"filters not pushed:\n$p")
  }

  test("project_select prunes the read schema to selected columns") {
    val p = plan("project_select")
    assert(p.contains("ReadSchema"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("c_custkey") && !read.contains("c_mktsegment"),
      s"column pruning failed: $read")
  }

  test("join_broadcast plans BroadcastHashJoin, no shuffle of the fact side") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dim join degenerated to SMJ:\n$p")
  }

  test("join hints select the intended physical strategies") {
    assert(plan("join_shuffle_hash").contains("ShuffledHashJoin"))
    assert(plan("join_sort_merge").contains("SortMergeJoin"))
  }

  test("agg_hash uses partial hash aggregation and whole-stage codegen") {
    val df = graft.SparkEntry.queries("agg_hash")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages are visible
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    assert(p.contains("*("), s"no whole-stage-codegen stage markers:\n$p")
  }

  test("limit_topk plans TakeOrderedAndProject (no global sort)") {
    val p = plan("limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("delta partition pruning opens only matching files") {
    val t = DeltaOps.ensureDemoTable(spark, sf)
    val snap = graft.delta.DeltaSnapshotReader.snapshot(spark, t)
    val pruned = graft.delta.DeltaSnapshotReader.prunedFiles(
      spark, snap, org.apache.spark.sql.functions.col("o_year") === 1996)
    assert(pruned.map(_.partitionValues("o_year")).distinct == Seq("1996"))
    assert(pruned.size < snap.files.size)
  }
}
