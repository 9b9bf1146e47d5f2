package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan

/** Plan locks for the graph/time-series/stats wave: the scaladoc claims
  * about shuffle structure ("one user_id exchange feeds both window
  * passes", "map-side combine", "broadcast back") are asserted here so a
  * regression that silently doubles the shuffles fails the suite, not the
  * 100 TB run. */
class GraphStatsPlanSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def countShuffles(p: SparkPlan): Int = {
    var n = 0
    def walk(x: SparkPlan): Unit = {
      x match {
        case _: ShuffleExchangeLike => n += 1
        case _ =>
      }
      x.children.foreach(walk)
      x.subqueries.foreach(walk)
      // descend into reused/adaptive wrappers
      x match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
    }
    walk(p)
    n
  }

  test("events_markov: window and pair-count share ONE user_id exchange") {
    val p = executed(GraphOps.eventsMarkov(spark, sf))
    val s = p.toString
    // one shuffle for the user window; the (from,to) agg and the
    // per-source window run over the tiny pair space (their exchanges are
    // bounded by |types|², not data) — the DATA-scale shuffle count is 1,
    // proven by only one exchange appearing below the parquet scan side
    assert(s.contains("WindowExec") || s.contains("Window"),
      s"missing window pass:\n$s")
    assert(countShuffles(p) <= 4, s"shuffle explosion (expected <=4):\n$s")
  }

  test("events_streaks: one window pass + one aggregation, reused exchange") {
    val p = executed(GraphOps.eventsStreaks(spark, sf))
    // distinct (user,day) + window + group-by-run: the window and the
    // run aggregation both hash on user_id — at most 3 exchanges total
    // (distinct, user_id, final sort), none of them doubled
    assert(countShuffles(p) <= 3,
      s"expected <=3 exchanges:\n${p.toString}")
  }

  test("agg_histogram: partial (map-side) aggregation before the exchange") {
    val p = executed(StatsOps.aggHistogram(spark, sf))
    val s = p.toString
    // two HashAggregates around one shuffle = partial+final
    assert(countShuffles(p) <= 2, s"histogram must be one agg exchange:\n$s")
    assert(s.contains("HashAggregate"), s)
  }

  test("ts_anomaly: the stats frame joins back via broadcast, not shuffle") {
    val p = executed(StatsOps.tsAnomaly(spark, sf))
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      s"per-type stats should broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("graph_pagerank: edge frame is cached once and reused per iteration") {
    val df = GraphOps.graphPagerank(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // under AQE the cached edge frame appears as TableCacheQueryStage /
    // InMemoryTableScan; three iterations must each read the cache
    val cachedReads = s.linesIterator.count(l =>
      l.contains("InMemoryTableScan") || l.contains("TableCacheQueryStage"))
    assert(cachedReads >= 3,
      s"iterations must read the CACHED edge frame (got $cachedReads cache reads):\n$s")
  }

  test("graph_triangles: equi-joins only, oriented edges cached and reused") {
    val df = GraphOps.graphTriangles(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the path join and the closing semi-join must both be hash EQUI-joins
    // — a nested-loop there is the O(n·m) plan that dies at scale. (The
    // four 1-row census scalars may combine via BroadcastNestedLoopJoin
    // Cross — constant-size, irrelevant.) So: the semi-join is a hash
    // join, and every nested-loop in the plan is one of the scalar crosses.
    assert(!s.contains("CartesianProduct"), s)
    val semiLine = s.linesIterator.find(_.contains("LeftSemi"))
    assert(semiLine.exists(l => l.contains("HashJoin")),
      s"closing semi-join must be a hash join:\n$s")
    val bnlj = s.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj.forall(_.contains("Cross")),
      s"non-scalar nested-loop join in the triangle path:\n$s")
    // the oriented edge frame is persisted and read back for e1/e2/e3
    val cachedReads = s.linesIterator.count(l =>
      l.contains("InMemoryTableScan") || l.contains("TableCacheQueryStage"))
    assert(cachedReads >= 3,
      s"e1/e2/e3 must read the CACHED oriented edges (got $cachedReads):\n$s")
  }

  test("ts_interpolate: both neighbour windows share one event_type exchange") {
    val p = executed(StatsOps.tsInterpolate(spark, sf))
    val s = p.toString
    // forward and backward ignore-nulls passes sort on the same
    // (event_type, day) — Catalyst must not re-shuffle between them
    assert(countShuffles(p) <= 5, s"shuffle explosion (expected <=5):\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("sample_reservoir: the hash pre-filter runs below the rank window") {
    val p = executed(Rel2.sampleReservoir(spark, sf))
    val s = p.toString
    // the md5-prefix filter must sit under the exchange feeding the window
    // (that's the whole scale point: the window sorts ~25% of each group);
    // FilterExec above WindowExec would mean we ranked the full table
    val lines = s.linesIterator.toVector
    val winIdx = lines.indexWhere(l => l.contains("Window"))
    val fltIdx = lines.lastIndexWhere(l => l.contains("Filter") && l.contains("md5"))
    assert(winIdx >= 0 && fltIdx > winIdx,
      s"md5 pre-filter must be BELOW the rank window:\n$s")
  }

  test("sim_threshold_sweep: sample side is broadcast (no all-pairs shuffle)") {
    val p = executed(graft.sim.SimOps.thresholdSweep(spark, sf))
    val s = p.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"bounded sample must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // the r12 invariant: the broadcast side must be bounded by an ABSOLUTE
    // limit (k-smallest-hash TakeOrdered), not a fraction of the corpus —
    // a fractional sample re-grows the pair pass to O((n/c)²) at scale
    assert(s.contains("TakeOrderedAndProject") || s.contains("GlobalLimit"),
      s"sample must be capped by an absolute-size limit:\n$s")
  }

  test("text_tfidf: the DF join carries no forced broadcast hint") {
    // the DF frame is vocabulary-sized; a forced hint is a driver OOM on a
    // web corpus. The ANALYZED plan must contain no ResolvedHint — AQE may
    // still pick broadcast at runtime when the vocabulary fits, which is
    // exactly the wanted behavior (decided from stats, not forced).
    val df = graft.text.TextOps.tfidf(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"tfidf must not force-broadcast the vocabulary-sized DF table:\n$analyzed")
    assert(df.count() > 0)
  }

  test("graph_triangles: closing semi-join falls back to a partitioned join past the BYTES gate") {
    // the gate is a memory budget (m × 56 B vs broadcastBudgetBytes —
    // resident HashedRelation bytes per edge, ADVICE r13): the
    // partitioned path must engage exactly at the
    // threshold — the 100 TB form. AQE may still locally convert tiny
    // shuffles at sf0.001, so lock on the presence/ABSENCE of the forced
    // hint in the analyzed plan (EliminateResolvedHint runs later).
    import org.apache.spark.sql.functions.col
    val ip = graft.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = ip.as("x").join(ip.as("y"), col("x.l_orderkey") === col("y.l_orderkey"))
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b")).distinct()
    val m = e.count()
    // one byte under the edge set's estimated footprint: partitioned path
    val (_, triGated) = GraphOps.orientedTriangles(e,
      broadcastBudgetBytes = m * 56L - 1)
    val analyzed = triGated.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"gate must drop the hint:\n$analyzed")
    // exactly at the footprint: broadcast admitted
    val (_, triAt) = GraphOps.orientedTriangles(e, broadcastBudgetBytes = m * 56L)
    assert(triAt.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "budget == m*56B must still admit the broadcast")
    // and the gated census still matches the broadcast census exactly
    val (_, triHinted) = GraphOps.orientedTriangles(e)
    assert(triGated.count() == triHinted.count())
  }

  test("graph_triangles: a caller-supplied edge estimate gates without running a job") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b")).distinct()
    // estimate says the edges bust the budget → hint dropped, even though
    // the REAL count is tiny: proves the estimate alone decides (and the
    // construction path that uses it never needs o.count())
    val (_, tri) = GraphOps.orientedTriangles(e,
      broadcastBudgetBytes = 256L * 1024 * 1024,
      edgeCount = Some(1L << 40))
    assert(!tri.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val (_, tri2) = GraphOps.orientedTriangles(e, edgeCount = Some(10L))
    assert(tri2.queryExecution.analyzed.toString.contains("ResolvedHint"))
  }
}
