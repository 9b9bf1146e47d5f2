package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics locks for the Analytics family (sessionize / retention /
  * fuzzy join / HLL sketch) against independently computed expectations
  * on sf0.001 — the driver's DuckDB hash check covers sf0.01. */
class AnalyticsSpec extends SparkSpec {

  test("events_sessionize: sessions partition each user's events; gaps respected") {
    val out = Analytics.eventsSessionize(spark, sf).collect()
    // every user's event total equals their raw event count
    val perUser = out.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    val raw = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser == raw)
    // session ids are 1..k contiguous per user
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("session_id")).sorted
      assert(ids.head == 1 && ids.last == ids.length.toLong)
    }
    // within one user, consecutive sessions are separated by > 1h
    // (end of session n to start of session n+1)
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val byId = rows.sortBy(_.getAs[Long]("session_id"))
      byId.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > 3600L * 1000000L)
        case _ =>
      }
    }
  }

  test("events_retention: cohort week_no 0 row counts every user once") {
    val out = Analytics.eventsRetention(spark, sf).collect()
    val week0 = out.filter(_.getAs[Int]("week_no") == 0)
      .map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(week0 == users)
    // retention never exceeds the cohort size
    val cohortSize = week0Sizes(out)
    out.foreach { r =>
      assert(r.getAs[Long]("n_users") <= cohortSize(r.getAs[String]("cohort_week")))
    }
  }

  private def week0Sizes(rows: Array[Row]): Map[String, Long] =
    rows.filter(_.getAs[Int]("week_no") == 0)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_users")).toMap

  test("join_fuzzy: deletion-neighborhood blocking equals brute-force lev<=1") {
    val out = Analytics.joinFuzzy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sub = Tables.customer(spark, sf).filter(col("c_acctbal") > 8000)
      .select(col("c_custkey"), col("c_name"))
    val brute = sub.as("a").crossJoin(sub.as("b"))
      .filter(col("a.c_custkey") < col("b.c_custkey")
        && levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .select(col("a.c_custkey"), col("b.c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == brute)
    assert(out.nonEmpty, "fixture should contain distance-1 name pairs")
  }

  test("events_active_users: WAU bounds DAU and matches a brute-force window") {
    val rows = Analytics.eventsActiveUsers(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (dau, wau) => assert(wau >= dau && dau > 0) }
    // brute force over the collected (day, user) pairs
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)) -> r.getLong(1))
    val expect = du.map(_._1).distinct.map { d =>
      val dau = du.count(_._1 == d)
      val wau = du.filter { case (x, _) =>
        !x.isAfter(d) && !x.isBefore(d.minusDays(6))
      }.map(_._2).distinct.size
      d.toString -> (dau.toLong, wau.toLong)
    }.toMap
    assert(rows == expect)
  }

  test("agg_regression: slope/intercept/r2 match a driver-side least squares") {
    val got = Analytics.aggRegression(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
    raw.foreach { case (flag, rs) =>
      val xs = rs.map(_.getDouble(1)); val ys = rs.map(_.getDouble(2))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gs, gi, gr) = got(flag)
      assert(math.abs(gs - slope) < 1e-3, s"$flag slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-2, s"$flag intercept $gi vs $intercept")
      assert(math.abs(gr - r2) < 1e-3 && gr >= 0 && gr <= 1, s"$flag r2 $gr vs $r2")
    }
  }

  test("agg_hll_sketch: union of per-group sketches lands within tolerance") {
    val row = Analytics.aggHllSketch(spark, sf).collect().head
    assert(row.getAs[Boolean]("union_within_5pct"))
    val exact = Tables.customer(spark, sf).select(col("c_custkey")).distinct().count()
    assert(row.getAs[Long]("n_exact") == exact)
  }
}
