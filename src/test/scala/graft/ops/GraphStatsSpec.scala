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
    assert(full.hs.length == KmvSketchAgg.K)
    assert(full.hs.toSeq == (1L to KmvSketchAgg.K.toLong))
    val shuffled = scala.util.Random.shuffle((1L to 2000L).toVector)
      .foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce)
    assert(shuffled.hs.toSeq == full.hs.toSeq,
      "sketch must not depend on arrival order")
    // duplicates must not double-count
    val dup = Seq(5L, 5L, 7L, 7L).foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce)
    assert(dup.hs.toSeq == Seq(5L, 7L))
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
    // absolute-size k-smallest-hash sample: n = min(k, corpus)
    val n = math.min(graft.sim.SimOps.sweepSampleK.toLong,
      Tables.embeddings(spark, sf).count())
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == n * (n - 1) / 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("hi") - r.getAs[Double]("lo") - 0.1) < 1e-9)
      val b = r.getAs[Int]("bucket")
      assert(b >= -10 && b <= 10)
    }
  }

  test("graph_triangles: census matches an independent id-oriented recount") {
    val r = GraphOps.graphTriangles(spark, sf).collect().head
    val (nodes, edges, wedges, tris) = (r.getAs[Long]("n_nodes"),
      r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"))
    // independent recount with the OTHER orientation (a<b instead of
    // degree-ordered): any consistent orientation yields the same census
    val ip = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = ip.as("x").join(ip.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct().persist()
    assert(edges == e.count())
    val recount = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("pa"), col("e2.b").as("pc"))
      .join(e.as("e3"),
        col("pa") === col("e3.a") && col("pc") === col("e3.b"), "left_semi")
      .count()
    assert(tris == recount, "degree-ordered census must equal id-ordered")
    // structural laws: cc = 3T/W in (0,1]; every triangle closes 3 wedges
    assert(wedges >= 3 * tris)
    val cc = r.getAs[Double]("global_cc")
    assert(cc == 3.0 * tris / wedges && cc > 0 && cc <= 1)
    assert(nodes > 0 && edges > 0)
    e.unpersist()
  }

  test("ts_interpolate: gaps fill on the chord between observed neighbours") {
    val rows = StatsOps.tsInterpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val days = rs.map(r => java.time.LocalDate.parse(r.getAs[String]("day")))
      assert(java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) + 1
        == days.length, s"$t spine must be gap-free")
      // endpoints are observed (spine spans observed min..max)
      val sorted = rs.sortBy(_.getAs[String]("day"))
      assert(sorted.head.getAs[Boolean]("observed"))
      assert(sorted.last.getAs[Boolean]("observed"))
      // every interpolated value lies between its observed neighbours
      val vs = sorted.map(_.getAs[Double]("value"))
      val obsIdx = sorted.zipWithIndex
        .filter(_._1.getAs[Boolean]("observed")).map(_._2)
      obsIdx.zip(obsIdx.tail).foreach { case (i, j) =>
        val (lo, hi) = (math.min(vs(i), vs(j)), math.max(vs(i), vs(j)))
        ((i + 1) until j).foreach { k =>
          assert(vs(k) >= lo && vs(k) <= hi,
            s"$t day ${sorted(k).getAs[String]("day")} off the chord")
        }
      }
    }
    // observed rows reproduce the direct downsampled daily aggregate
    val direct = Tables.events(spark, sf)
      .filter(col("event_id") % 97 === 0)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .agg(graft.Det.dfin(sum(graft.Det.dec(col("value")))).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val observed = rows.filter(_.getAs[Boolean]("observed"))
    assert(observed.length == direct.size)
    observed.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      assert(r.getAs[Double]("value") == direct(k), s"observed mismatch at $k")
    }
  }

  test("sample_reservoir: picks exactly the k smallest hashes per group") {
    val rows = Rel2.sampleReservoir(spark, sf).collect()
    assert(rows.nonEmpty)
    // NEVER-SHORT invariant (ADVICE r10): every event_type in the fixture
    // must contribute exactly min(k, |group|) rows — the adaptive
    // pre-filter fallback guarantees a group with < k prefix survivors
    // (e.g. 'view' at sf0.001, 48 survivors) still yields its full top-k
    // instead of a silently short non-reservoir sample.
    val groupSizes = Tables.events(spark, sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    val outSizes = rows.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.length.toLong }
    groupSizes.foreach { case (t, n) =>
      assert(outSizes.getOrElse(t, 0L) == math.min(50L, n),
        s"group '$t' returned ${outSizes.getOrElse(t, 0L)} rows, " +
          s"expected min(50, $n)")
    }
    // ranks are dense from 1 within each group
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length), t)
      assert(rs.length <= 50)
    }
    // the chosen ids equal the k smallest md5 hashes computed WITHOUT the
    // prefix pre-filter — proving the filter is a pure optimization here
    val full = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        md5(col("event_id").cast("string")).as("hk"))
      .collect().groupBy(_.getAs[String]("event_type"))
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val expect = full(t).sortBy(r => (r.getAs[String]("hk"),
        r.getAs[Long]("event_id"))).take(rs.length).map(_.getAs[Long]("event_id"))
      val got = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("event_id"))
      assert(got.sameElements(expect), s"$t sample is not the hash-order top-k")
    }
  }

  test("agg_corr_matrix: matches Spark's built-in corr and the corr laws") {
    val rows = Analytics.aggCorrMatrix(spark, sf).collect()
    // 6 unordered pairs per return flag, each correlation in [-1, 1]
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    assert(rows.length == flags.length * 6)
    rows.foreach { r =>
      assert(r.getAs[String]("var_a") < r.getAs[String]("var_b"))
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
    }
    // independent recomputation: Spark's single-pass co-moment corr (a
    // DIFFERENT algorithm — streaming doubles, not exact decimal sums)
    // must agree to well past the rounded precision
    val li = Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val ref = li.filter(col("l_returnflag") === r.getAs[String]("l_returnflag"))
        .agg(corr(col(r.getAs[String]("var_a")), col(r.getAs[String]("var_b"))))
        .head.getDouble(0)
      assert(math.abs(r.getAs[Double]("corr") - ref) < 1e-6,
        s"disagrees with built-in corr: $r vs $ref")
    }
  }

  test("ts_rolling_slope: frames agree with built-in regr_slope") {
    val rows = StatsOps.tsRollingSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute each type's LAST frame independently via regr_slope over
    // the trailing 14 daily totals (different algorithm: streaming
    // co-moments over doubles)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("y"))
      .withColumn("x", datediff(col("day"), lit("2024-01-01").cast("date")))
    val dailyRows = daily.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Int]("x").toDouble, r.getAs[Double]("y")))
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val lastRow = rs.maxBy(_.getAs[String]("day"))
      val d = lastRow.getAs[String]("day")
      // trailing 14 OBSERVATIONS (the frame is row-based, not calendar)
      val frame = dailyRows.filter(r => r._1 == t && r._2 <= d)
        .sortBy(_._2).takeRight(14)
      assert(frame.length == 14)
      val n = frame.length.toDouble
      val sx = frame.map(_._3).sum; val sy = frame.map(_._4).sum
      val sxy = frame.map(r => r._3 * r._4).sum
      val sxx = frame.map(r => r._3 * r._3).sum
      val ref = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(lastRow.getAs[Double]("slope") - ref) < 1e-4,
        s"$t @ $d: ${lastRow.getAs[Double]("slope")} vs recomputed $ref")
    }
    // no partial frames: first emitted day is ≥ the type's 14th active day
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val firstEmitted = rs.map(_.getAs[String]("day")).min
      val day14 = daily.filter(col("event_type") === t)
        .orderBy(col("day")).collect().map(_.getAs[java.sql.Date]("day"))
      assert(day14.length >= 14 && firstEmitted == day14(13).toString)
    }
  }

  test("ts_anomaly_mad: flags exactly the >3-MAD days, robustly") {
    val flagged = StatsOps.tsAnomalyMad(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Double]("mad_score")).toMap
    // independent Scala recomputation of median/MAD per type
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .agg(sum(col("value")).as("tot")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Double]("tot")))
    def lowerMedian(xs: Seq[Double]): Double =
      xs.sorted.apply((xs.length + 1) / 2 - 1)
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val med = lowerMedian(rs.map(_._3).toSeq)
      val devs = rs.map(r => (r._2, math.abs(r._3 - med)))
      val mad = lowerMedian(devs.map(_._2).toSeq)
      devs.filter(d => mad > 0 && d._2 > 3 * mad).map(d => (t, d._1)).toSeq
    }.toSet
    assert(flagged.keySet == expect,
      s"flag sets differ: got ${flagged.keySet}, want $expect")
    assert(flagged.values.forall(_ > 3.0))
  }

  test("events_forecast_baseline: backtest laws (MAE dominates bias, full cover)") {
    val rows = StatsOps.eventsForecastBaseline(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mae, bias) = (r.getAs[Double]("mae"), r.getAs[Double]("bias"))
      assert(mae > 0 && mae >= math.abs(bias) - 1e-9,
        s"MAE must dominate |bias|: $r")
    }
    // every post-cutoff day with events is backtested (train covers all 7
    // dows, so the seasonal join drops nothing)
    val testDays = Tables.events(spark, sf)
      .filter(to_date(col("ts")) >= lit("2024-01-22"))
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_test") ==
        testDays(r.getAs[String]("event_type")), s"dropped test days: $r")
    }
  }

  test("text_ngram_stats: dense top-10 ranks and faithful bigram counts") {
    val rows = graft.text.TextOps.ngramStats(spark, sf).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length), l)
      val ns = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"$l not sorted")
    }
    // recount the top bigram of one language straight from the text
    val top = rows.filter(_.getAs[Int]("rk") == 1).head
    val (lang, bg) = (top.getAs[String]("lang"), top.getAs[String]("bigram"))
    val recount = Tables.documents(spark, sf)
      .filter(col("lang") === lang).collect().map { r =>
        val ws = r.getAs[String]("text").toLowerCase(java.util.Locale.ROOT)
          .trim.split("\\s+")
        ws.sliding(2).count(p => p.length == 2 && s"${p(0)} ${p(1)}" == bg)
      }.sum
    assert(top.getAs[Long]("n") == recount.toLong,
      s"$lang '$bg': ${top.getAs[Long]("n")} vs $recount")
  }

  test("events_ltv_curve: monotone, cohort-faithful lifetime values") {
    val rows = Analytics.eventsLtvCurve(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-user cumulative spend can't shrink, so the average is
    // non-decreasing WHILE THE COHORT IS CONSTANT — under right-censoring
    // (a high-spend late-cohort user aging out) the average may legally
    // dip, so the law is only asserted between consecutive tenures with
    // equal n_users
    val sorted = rows.sortBy(_.getAs[Long]("k"))
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      if (a.getAs[Long]("n_users") == b.getAs[Long]("n_users"))
        assert(b.getAs[Double]("avg_ltv") >= a.getAs[Double]("avg_ltv") - 1e-9,
          s"LTV dipped without censoring: $a -> $b")
    }
    // cohort size at k=0 equals the purchasing-user count
    val buyers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(rows.minBy(_.getAs[Long]("k")).getAs[Long]("n_users") == buyers)
    // LTV(0) = average first-day spend, recomputed independently
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("spend")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Double]("spend")))
    val firstDay = p.groupBy(_._1).values.map(_.minBy(_._2)._3).sum / buyers
    val ltv0 = rows.find(_.getAs[Long]("k") == 0L).get.getAs[Double]("avg_ltv")
    assert(math.abs(ltv0 - firstDay) < 1e-6, s"$ltv0 vs $firstDay")
  }

  test("win_pareto: concentration laws and a brute-force recount") {
    val rows = Windows.winPareto(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h, p) = (r.getAs[Long]("n_orders"), r.getAs[Long]("n_half"),
        r.getAs[Long]("n_p80"))
      assert(1 <= h && h <= p && p <= n, s"ordering law broken: $r")
      // 50% of revenue never needs more than 50% of (uniformly-positive)
      // orders when sorted descending
      assert(h <= (n + 1) / 2 + 1, s"top-half count implausible: $r")
    }
    // brute-force one priority
    val pr = rows.head.getAs[String]("o_orderpriority")
    val vs = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === pr)
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
      .sortBy(-_)
    val tot = BigDecimal(vs.map(BigDecimal(_)).sum.toString)
    var cum = BigDecimal(0); var cnt = 0L
    val it = vs.iterator
    while (cum < tot * 0.5 && it.hasNext) { cum += BigDecimal(it.next()); cnt += 1 }
    assert(rows.head.getAs[Long]("n_half") == cnt, s"$pr: got $cnt")
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
