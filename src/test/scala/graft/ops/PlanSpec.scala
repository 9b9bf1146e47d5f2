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

  test("bucketed join runs with zero Exchange (co-located, no shuffle)") {
    val df = graft.SparkEntry.queries("join_bucketed")(spark, sf)
    val joinPlan = df.queryExecution.executedPlan.toString
    val joinSection = joinPlan.split("HashAggregate").last // below the agg
    assert(joinSection.contains("SortMergeJoin"), joinPlan)
    assert(!joinSection.contains("Exchange"),
      s"bucketed join still shuffles:\n$joinPlan")
  }

  test("salted skew join equals the plain join result") {
    val salted = ScalePatterns.joinSkewSalted(spark, sf).collect().map(_.toSeq)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = Seq(("A", "returned"), ("N", "kept"), ("R", "refunded"))
      .toDF("flag", "disposition")
    val plain = graft.Tables.lineitem(spark, sf)
      .join(dim, col("l_returnflag") === col("flag"))
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n_items"), graft.Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("disposition")).collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
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
