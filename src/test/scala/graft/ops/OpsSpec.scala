package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  test("agg_approx_distinct within 5% of exact") {
    // the key's own output: exact count + in-tolerance boolean (hash-checked
    // by the driver against DuckDB's exact count and literal TRUE)
    val rows = AggExt.aggApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: HLL estimate outside 5% of exact=${r.getLong(1)}")
    }
    // and the raw estimate values, independent of the emitted boolean
    val approx = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("agg_approx_percentile sketch lands within the hashed tolerance") {
    val rows = AggExt.aggApproxPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: GK estimate more than 1.0 from exact ${r.getDouble(1)}")
    }
  }

  test("join_range bucket rewrite equals naive range join") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val naive = ev.as("a").join(ev.as("b"),
        col("a.event_type") === col("b.event_type") &&
        col("b.us") > col("a.us") && col("b.us") <= col("a.us") + 60000000L)
      .groupBy(col("a.event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = Joins.joinRange(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
  }

  test("udaf weighted avg equals plain-SQL formula") {
    val got = Fns.udafTyped(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") * round(col("l_quantity")).cast("long"))
        .cast("double") / 100.0 / sum(round(col("l_quantity")).cast("long")).cast("double")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == exp)
  }

  test("split planner + snapshot caching survive partition pruning calls") {
    val t = DeltaOps.ensureDemoTable(spark, sf)
    val snap = graft.delta.DeltaSnapshotReader.snapshot(spark, t)
    val all = graft.delta.SplitPlanner.plan(snap.files)
    assert(all.map(_.files.size).sum == snap.files.size)
  }
}
