package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariant locks for the graph / time-series / statistics wave
  * (GraphOps.scala, StatsOps.scala). The DuckDB driver hash is the
  * engine-vs-engine gate; these specs pin the SEMANTIC invariants a hash
  * can't articulate (probability mass, calendar density, quantile laws). */
class GraphStatsSpec extends SparkSpec {

  test("graph_pagerank: top-20 ranks are a proper distribution slice") {
    val rows = GraphOps.graphPagerank(spark, sf).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(r => r > 0 && r < 1))
    // output is sorted by rank desc
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // full rank vector must sum to ~1 (damped PageRank conserves mass when
    // the graph has no dangling nodes — ours is symmetric by construction)
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val fwd = pairs.select(concat(lit("P"), col("l_partkey")).as("src"),
      concat(lit("S"), col("l_suppkey")).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val n = edges.select(col("src")).distinct().count()
    // re-run without the limit by checking top-20 of an n-node graph is
    // bounded below by uniform mass / 10 (sanity, not exactness)
    assert(ranks.head > 1.0 / (10.0 * n))
  }

  test("events_markov: transition probabilities sum to 1 per source type") {
    val rows = GraphOps.eventsMarkov(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("event_type"))
    bySrc.foreach { case (src, rs) =>
      val mass = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$src transition mass $mass")
    }
    // transition counts equal total events minus one per active user
    val nPairs = rows.map(_.getAs[Long]("n")).sum
    val e = Tables.events(spark, sf)
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(nPairs == expected)
  }

  test("events_streaks: streaks partition each user's active days") {
    val streaks = GraphOps.eventsStreaks(spark, sf).collect()
    assert(streaks.nonEmpty)
    val dayTotal = streaks.map(_.getAs[Long]("len")).sum
    val expected = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(dayTotal == expected, "streak lengths must cover every active day once")
    // each streak's span equals its length (contiguity)
    streaks.foreach { r =>
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(r.getAs[String]("streak_start")),
        java.time.LocalDate.parse(r.getAs[String]("streak_end"))) + 1
      assert(span == r.getAs[Long]("len"), s"non-contiguous streak: $r")
    }
  }

  test("ts_resample: gap-filled calendar is dense per user and carries values") {
    val rows = StatsOps.tsResample(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(r => java.time.LocalDate.parse(r.getAs[String]("day"))).sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1
      assert(span == days.length, "calendar must be gap-free after resample")
    }
    // every row (observed or filled) carries a value; first row is observed
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("value_filled"))))
    byUser.foreach { case (_, rs) =>
      assert(rs.minBy(_.getAs[String]("day")).getAs[Boolean]("observed"))
    }
  }

  test("ts_anomaly: flagged days are extreme vs their type's distribution") {
    val rows = StatsOps.tsAnomaly(spark, sf).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) >= 2.0, s"sub-threshold row: $r")
    }
  }

  test("agg_mode: mode is the argmax count and median splits the mass") {
    val li = Tables.lineitem(spark, sf)
    StatsOps.aggMode(spark, sf).collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val grp = li.filter(col("l_returnflag") === flag)
      val counts = grp.groupBy(col("l_quantity")).count().collect()
        .map(x => (x.getAs[Double]("l_quantity"), x.getAs[Long]("count"))).toMap
      val maxN = counts.values.max
      assert(counts(r.getAs[Double]("mode_qty")) == maxN)
      val med = r.getAs[Double]("median_lo")
      val n = grp.count()
      val below = grp.filter(col("l_quantity") < med).count()
      val atOrBelow = grp.filter(col("l_quantity") <= med).count()
      assert(below * 2 < n && atOrBelow * 2 >= n, s"$flag lower-median law")
    }
  }

  test("agg_weighted_median: half the weight lies at or below the answer") {
    val li = Tables.lineitem(spark, sf)
    StatsOps.aggWeightedMedian(spark, sf).collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val m = r.getAs[Double]("wmedian_price")
      val grp = li.filter(col("l_returnflag") === flag)
      val tot = grp.agg(sum(col("l_quantity"))).head.getDouble(0)
      val lower = grp.filter(col("l_extendedprice") <= m)
        .agg(sum(col("l_quantity"))).head.getDouble(0)
      val strictly = grp.filter(col("l_extendedprice") < m)
        .agg(sum(col("l_quantity"))).head.getDouble(0)
      assert(lower * 2 >= tot && strictly * 2 < tot, s"$flag weighted-median law")
    }
  }

  test("events_paths: path counts are trigram-consistent with the event log") {
    val rows = GraphOps.eventsPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach(r => assert(r.getAs[String]("path").split(">").length == 3))
    // counts are descending (top-k contract)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("sql_recursive_cte: recursion reproduces the window running total") {
    val rec = GraphOps.sqlRecursiveCte(spark, sf)
    // the recursive walk must equal the declarative window cumsum
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = Tables.orders(spark, sf).filter(col("o_custkey") < 200)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
      .withColumn("run_total",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("decimal(18,2)").cast("double"))
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("run_total"))
    assert(rec.count() == win.count())
    assert(rec.exceptAll(win).isEmpty && win.exceptAll(rec).isEmpty,
      "recursive CTE result must equal the window-cumsum formulation")
  }

  test("agg_histogram: buckets tile the domain and counts total the table") {
    val rows = StatsOps.aggHistogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("hi") - r.getAs[Double]("lo") == 25000.0)
      assert(r.getAs[Double]("lo") == r.getAs[Int]("bucket") * 25000.0)
    }
  }

  test("agg_kmv_intersect: sketch estimates honour their accuracy contract") {
    val r = StatsOps.aggKmvIntersect(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    // the hash-checked contract: accuracy booleans must be TRUE
    assert(row.getAs[Boolean]("union_within_10pct"))
    assert(row.getAs[Boolean]("inter_within_25pct"))
    // exact counts agree with a direct computation
    val o = Tables.orders(spark, sf)
    def keys(p: String) = o.filter(col("o_orderpriority") === p)
      .select(col("o_custkey")).distinct()
    assert(row.getAs[Long]("n_a") == keys("1-URGENT").count())
    assert(row.getAs[Long]("n_inter") ==
      keys("1-URGENT").join(keys("5-LOW"), "o_custkey").count())
  }

  test("kmv sketch: merge is order-independent and bounded") {
    val full = (1L to 2000L).map(h => KmvSketchAgg.reduce(KmvSketchAgg.zero, h))
      .reduce(KmvSketchAgg.merge)
    assert(full.hs.size == KmvSketchAgg.K)
    assert(full.hs == (1L to KmvSketchAgg.K.toLong))
    val shuffled = scala.util.Random.shuffle((1L to 2000L).toVector)
      .foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce)
    assert(shuffled.hs == full.hs, "sketch must not depend on arrival order")
    // duplicates must not double-count
    val dup = Seq(5L, 5L, 7L, 7L).foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce)
    assert(dup.hs == Seq(5L, 7L))
  }

  test("events_rfm: quintile scores are balanced and metrics faithful") {
    val rows = GraphOps.eventsRfm(spark, sf).collect()
    assert(rows.nonEmpty)
    // ntile(5) balance: bucket sizes differ by at most 1
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Int](c)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$c unbalanced: $sizes")
      assert(rows.map(_.getAs[Int](c)).toSet.subsetOf((1 to 5).toSet))
    }
    // frequency totals = purchase count
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("frequency")).sum == purchases)
  }

  test("events_attribution: purchase credits partition the attributable purchases") {
    val rows = GraphOps.eventsAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("attr_type") != "purchase"))
    assert(rows.forall(_.getAs[Double]("avg_gap_us") > 0))
    // attributed purchases ≤ total purchases (first-event purchases lack credit)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val credited = rows.map(_.getAs[Long]("n_purchases")).sum
    assert(credited <= purchases && credited > 0)
  }

  test("agg_skew_kurtosis: near-uniform discounts match the analytic moments") {
    // l_discount is ~uniform on the 11-point grid {0.00..0.10}: discrete
    // uniform has skewness 0 and excess kurtosis 3(n²-1)... use loose laws:
    val rows = StatsOps.aggSkewKurtosis(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("skewness")) < 0.2)
      val k = r.getAs[Double]("kurtosis")
      // discrete-uniform excess kurtosis ≈ -1.22; allow sampling noise
      assert(k > -1.5 && k < -0.8, s"kurtosis out of uniform range: $k")
    }
  }

  test("sql_pivot: pivoted cells re-sum to the unpivoted totals") {
    val rows = StatsOps.sqlPivot(spark, sf).collect()
    val n = rows.map(r => r.getAs[Long]("f_n") + r.getAs[Long]("o_n") +
      r.getAs[Long]("p_n")).sum
    assert(n == Tables.orders(spark, sf).count())
  }

  test("agg_approx_topk: sketch output equals the exact top-k here") {
    val rows = StatsOps.aggApproxTopK(spark, sf).collect()
    assert(rows.length == 3)
    val exact = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      .sortBy { case (t, n) => (-n, t) }.take(3)
    assert(rows.map(r => r.getAs[String]("item") -> r.getAs[Long]("cnt"))
      .sameElements(exact))
  }

  test("events_ab_test: one row per unordered type pair, sane statistics") {
    val rows = StatsOps.eventsAbTest(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val dof = r.getAs[Double]("dof")
      assert(dof > 1, s"dof $dof")
      // same-distribution samples: t should be unremarkable
      assert(math.abs(r.getAs[Double]("t_stat")) < 10)
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(r.getAs[Double]("t_stat")) > 1.96))
    }
  }

  test("sim_threshold_sweep: histogram covers every sampled pair exactly once") {
    val rows = graft.sim.SimOps.thresholdSweep(spark, sf).collect()
    val n = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == n * (n - 1) / 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("hi") - r.getAs[Double]("lo") - 0.1) < 1e-9)
      val b = r.getAs[Int]("bucket")
      assert(b >= -10 && b <= 10)
    }
  }

  test("profile_columns: one row per orders column with faithful counts") {
    val rows = StatsOps.profileColumns(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
    assert(rows.map(_.getAs[String]("col")).sorted.sameElements(
      orders.schema.fieldNames.sorted))
    val byCol = rows.map(r => r.getAs[String]("col") -> r).toMap
    val n = orders.count()
    assert(byCol("o_orderkey").getAs[Long]("n_nonnull") == n)
    assert(byCol("o_orderkey").getAs[Long]("n_distinct") == n)
    val statuses = orders.select(col("o_orderstatus")).distinct().count()
    assert(byCol("o_orderstatus").getAs[Long]("n_distinct") == statuses)
    // canonical min/max strings parse back into the column's domain
    assert(byCol("o_orderdate").getAs[String]("vmin").matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(byCol("o_totalprice").getAs[String]("vmax").matches("\\d+\\.\\d{2}"))
  }
}
