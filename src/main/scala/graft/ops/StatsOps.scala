package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series and statistical operators: calendar resampling with
  * forward-fill, z-score anomaly detection on daily metric totals,
  * deterministic mode / median, weighted median, and a generic one-pass
  * column profiler.
  *
  * Determinism notes (SURVEY.md §5.1): every reduction that feeds a float
  * result goes through exact DECIMAL sums (`Det`); mode and median are the
  * engine-neutral forms — mode breaks count ties by value, median is the
  * lower-median (no interpolation), so no engine-specific tie or
  * interpolation rule can diverge.
  */
object StatsOps {
  import Det._

  /** Daily per-user resample of `events.value` with gap-filling: aggregate
    * to (user, day), explode each user's [min_day, max_day] calendar with
    * `sequence`, left-join observations back and forward-fill misses via
    * `last(ignoreNulls)`. All three passes shuffle on `user_id` only — the
    * calendar explode is narrow, so resampling a 100 TB event log costs one
    * exchange plus output size, never a global sort. */
  def tsResample(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("user_id") % 7 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec(col("value"))).as("v"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day").cast("string").as("day"),
        col("v").isNotNull.as("observed"), dfin(col("filled")).as("value_filled"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Linear interpolation over a daily calendar spine: the events stream is
    * deterministically downsampled (event_id % 97) so the per-type daily
    * series has real gaps, then every missing day is filled with the
    * straight line between its nearest observed neighbours. The neighbour
    * lookup is two window passes over the SAME event_type shuffle (running
    * `last ignoreNulls` forward for the previous observation, `first
    * ignoreNulls` over the following frame for the next); no self-join, so
    * interpolating a 100 TB log is one exchange plus the narrow calendar
    * explode. Spine endpoints are per-type min/max observed days, so every
    * gap has both neighbours by construction.
    *
    * Float discipline: observed dailies are exact decimal sums (`Det`);
    * the interpolation `pv + (nv-pv) * (Δd / span)` is then pure
    * correctly-rounded IEEE double (+ - * /) evaluated in the identical
    * tree shape on both engines — no libm, no rounding step. */
  def tsInterpolate(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .filter(col("event_id") % 97 === 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dfin(sum(dec(col("value")))).as("v"))
    val spine = obs.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    val wp = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(obs, Seq("event_type", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wn))
      .select(col("event_type"), col("day").cast("string").as("day"),
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
             datediff(col("nd"), col("pd")).cast("double"))).as("value"),
        col("v").isNotNull.as("observed"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Z-score anomaly detection over daily per-type metric totals: flag days
    * whose total deviates ≥2σ from the type's mean. Sufficient statistics
    * (n, Σx, Σx²) are EXACT decimal sums per type — the same
    * order-independent trick as `agg_regression` (Analytics.scala) — and the
    * per-type stats frame is |types| rows, broadcast back onto the dailies. */
  def tsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val x = dec(col("tot"))
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dfin(sum(dec(col("value")))).as("tot"))
    val st = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        dfin(sum(x)).as("sx"),
        sum(x * x).cast(DecimalType(38, 4)).cast("double").as("sxx"))
    val z = (col("tot") - col("sx") / col("n")) /
      sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
    daily.join(broadcast(st), "event_type")
      .filter(abs(z) >= 2)
      .select(col("event_type"), col("day").cast("string").as("day"),
        round(z, 6).as("z"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Rolling 14-day OLS trend: per event type, the least-squares slope of
    * daily value totals over each trailing 14-observation frame — the
    * "is this metric drifting" primitive of monitoring pipelines. All five
    * sufficient statistics are WINDOWED EXACT sums (day ordinals are longs;
    * totals and cross-products decimal), so one event_type exchange feeds
    * every frame and the slope is closed-form per row — no self-join of
    * the series against itself, which is the shape that dies first when
    * the series count explodes. Partial leading frames are dropped (the
    * n<14 denominator degenerates at n=1 and the short-window slope is
    * statistically meaningless anyway). */
  def tsRollingSlope(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      // daily totals re-narrowed to (18,6) so the x·y product stays inside
      // DECIMAL(38) on BOTH engines (DuckDB errors past 38 on multiply)
      .agg(sum(dec(col("value"))).cast(DecimalType(18, 6)).as("y"))
      .withColumn("x", datediff(col("day"), lit("2024-01-01").cast("date"))
        .cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-13, Window.currentRow)
    val wn = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val xy = (col("x").cast(DecimalType(10, 0)) * col("y"))
      .cast(DecimalType(38, 6))
    val framed = daily
      .withColumn("rn", row_number().over(wn))
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum(col("x")).over(w).cast("double"))
      .withColumn("sy", sum(col("y")).over(w).cast(DecimalType(38, 4))
        .cast("double"))
      .withColumn("sxy", sum(xy).over(w).cast(DecimalType(38, 4))
        .cast("double"))
      .withColumn("sxx", sum(col("x") * col("x")).over(w).cast("double"))
    framed.filter(col("rn") >= 14)
      .select(col("event_type"), col("day").cast("string").as("day"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Robust (median/MAD) anomaly detection over daily per-type totals —
    * the heavy-tail-safe complement to `ts_anomaly`'s z-score: a single
    * wild day inflates the mean AND the stddev (masking itself), but not
    * the median or the median absolute deviation. Both medians are the
    * deterministic LOWER median (an order statistic — no interpolation
    * rule to diverge between engines, same trick as `agg_mode`). Only the
    * daily aggregation touches raw data; both median passes run windows
    * over the |types|·|days|-bounded frame. */
  def tsAnomalyMad(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dfin(sum(dec(col("value")))).as("tot"))
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col(value), col("day"))
      val wc = Window.partitionBy(col("event_type"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("c", count(lit(1)).over(wc))
        .filter(col("rn") === expr("(c + 1) div 2"))
        .select(col("event_type"), col(value).as(out))
    }
    val med = lowerMedian(daily, "tot", "med")
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("tot") - col("med")))
    val mad = lowerMedian(dev.select(col("event_type"), col("day"),
      col("dev").as("tot")), "tot", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0 && col("dev") > lit(3.0) * col("mad"))
      .select(col("event_type"), col("day").cast("string").as("day"),
        round(col("dev") / col("mad"), 6).as("mad_score"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Seasonal-naive forecast backtest: train a per-(type, day-of-week)
    * mean on the first three weeks, forecast the remaining days, and audit
    * MAE and signed bias per type — the baseline every fancier forecaster
    * must beat, plus the backtest harness that proves it. Exact-sum
    * discipline end to end: the seasonal means, and the error aggregates,
    * quantize each IEEE-double term to DECIMAL(18,6) before the
    * order-independent exact sum (one double division at the very end).
    * Two map-side-combining shuffles over bounded frames (daily, then
    * (type,dow)); raw events are touched once. */
  def eventsForecastBaseline(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-22").cast("date")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dfin(sum(dec(col("value")))).as("tot"))
      .withColumn("dow", dayofweek(col("day")))
    val seas = daily.filter(col("day") < cutoff)
      .groupBy(col("event_type"), col("dow"))
      .agg((dfin(sum(dec(col("tot")))) /
        count(lit(1)).cast("double")).as("fc"))
    val test = daily.filter(col("day") >= cutoff)
      .join(broadcast(seas), Seq("event_type", "dow"))
      .withColumn("err", col("tot") - col("fc"))
    test.groupBy(col("event_type"))
      // no final round, and the error sums leave decimal at the LOSSLESS
      // (38,6) scale: quantized err terms carry full 6-decimal precision,
      // so a (38,4) rescale lands exactly on .00005 ties where Spark
      // (HALF_UP) and DuckDB (HALF_EVEN) disagree; at scale 6 nothing is
      // rounded at all and the unscaled value stays far below 2^53, so the
      // double cast is exact on both engines (see FIXTURES.md)
      .agg(count(lit(1)).as("n_test"),
        (sum(dec(abs(col("err")))).cast(DecimalType(38, 6)).cast("double") /
          count(lit(1)).cast("double")).as("mae"),
        (sum(dec(col("err"))).cast(DecimalType(38, 6)).cast("double") /
          count(lit(1)).cast("double")).as("bias"))
      .orderBy(col("event_type"))
  }

  /** Deterministic mode and (lower) median of `l_quantity` per return flag,
    * both derived from ONE value-count aggregation: mode = rank-1 by
    * (count desc, value), median = first value whose cumulative count
    * reaches half the total. The grouped count is the only full-data
    * shuffle; the windows run over |distinct values| rows per group. */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
    val wm = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_quantity"))
    val mode = cnt.withColumn("rk", row_number().over(wm))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
    val wcum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = cnt
      .withColumn("cum", sum(col("n")).over(wcum))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("l_returnflag"))))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag")).agg(min(col("l_quantity")).as("median_lo"))
    mode.join(med, "l_returnflag").orderBy(col("l_returnflag"))
  }

  /** Weighted median price per return flag (weights = quantities): exact
    * decimal cumulative weights over the per-price pre-aggregation, first
    * price whose cumulative weight reaches half the total. Pre-aggregating
    * to (flag, price) before the window bounds the window input by distinct
    * prices, not raw rows. */
  def aggWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val pp = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
      .agg(sum(dec(col("l_quantity"))).as("w"))
    val wcum = Window.partitionBy(col("l_returnflag")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pp.withColumn("cw", sum(col("w")).over(wcum))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("l_returnflag"))))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("l_returnflag")).agg(min(col("price")).as("wmedian_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Generic column profiler over `orders`: per column, non-null count,
    * distinct count, and canonical min/max strings — the schema-driven
    * shape a data catalog computes per table. One single-row aggregation
    * PER COLUMN, unioned: the branches share the scan (cheap columnar
    * re-reads) and run as parallel stages, which measured ~7× faster here
    * than the single multi-distinct aggregation (Spark plans N distinct
    * aggregates via an N-way expand — row count × N through the exchange).
    * At 100 TB the exact distincts swap for `approx_count_distinct`
    * partials. Min/max are canonicalized by dtype (doubles via
    * DECIMAL(18,2), timestamps via DATE) so the strings are engine-neutral. */
  def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val df = Tables.orders(s, dir)
    def canon(a: Column, dt: DataType): Column = dt match {
      case DoubleType => a.cast(DecimalType(18, 2)).cast("string")
      case TimestampType | TimestampNTZType => a.cast("date").cast("string")
      case _ => a.cast("string")
    }
    df.schema.fields.map { f =>
      val c = col(f.name)
      df.agg(count(c).as("n_nonnull"), count_distinct(c).as("n_distinct"),
          canon(min(c), f.dataType).as("vmin"), canon(max(c), f.dataType).as("vmax"))
        .select(lit(f.name).as("col"), col("n_nonnull"), col("n_distinct"),
          col("vmin"), col("vmax"))
    }.reduce(_ unionByName _).orderBy(col("col"))
  }

  /** Equi-width histogram of order totals per priority class: the bucket id
    * is a pure projection (`floor(x / width)`), so the whole histogram is
    * one map-side-combining aggregation over a space bounded by
    * |priorities| × |buckets| — the profile-grade shape that never sorts
    * or windows raw rows. */
  def aggHistogram(s: SparkSession, dir: String): DataFrame = {
    val width = 25000.0
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"),
        floor(col("o_totalprice") / width).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("o_orderpriority"), col("bucket"),
        (col("bucket") * width).as("lo"),
        ((col("bucket") + 1) * width).as("hi"), col("n"))
      .orderBy(col("o_orderpriority"), col("bucket"))
  }

  /** KMV (k-minimum-values) sketch set intersection: the mergeable sketch
    * family for DISTINCT set algebra that HLL can't do (HLL unions but
    * never intersects). Each side aggregates the k smallest xxhash64
    * values — a bounded, order-independent, mergeable partial (the same
    * contract as Spark's own partial aggregation, so a 100 TB rollup stores
    * per-partition sketches and merges on demand). The union sketch is the
    * k smallest of the merged pair; Jaccard = fraction of union-sketch
    * hashes present in both sides; |A∩B| ≈ J · |A∪B|. Hash-checked columns
    * are the EXACT counts plus accuracy booleans (oracle emits TRUE) — the
    * estimate is implementation-defined, its accuracy contract is not
    * (same pattern as `agg_approx_distinct` / `agg_hll_sketch`). */
  def aggKmvIntersect(s: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(KmvSketchAgg)
    val o = Tables.orders(s, dir)
    // each side feeds THREE consumers (its sketch, its exact count, the
    // exact intersection join) — persist the bounded distinct-key frames so
    // the fact scan and distinct shuffle run once per side, not three times
    // (cache-manager plan dedup bounds this to one materialization/session)
    def side(p: String) = o.filter(col("o_orderpriority") === p)
      .select(col("o_custkey")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = side("1-URGENT")
    val b = side("5-LOW")
    graft.CachedFrames.track("agg_kmv_intersect", dir, a, b)
    val skA = a.agg(kmv(xxhash64(col("o_custkey"))).as("ah"))
    val skB = b.agg(kmv(xxhash64(col("o_custkey"))).as("bh"))
    val exact = a.agg(count(lit(1)).as("n_a")).crossJoin(
        b.agg(count(lit(1)).as("n_b"))).crossJoin(
        a.join(b, "o_custkey").agg(count(lit(1)).as("n_inter")))
    val est = udf((ah: Seq[Long], bh: Seq[Long]) => {
      val k = KmvSketchAgg.K
      def u(h: Long): Double =
        math.max(h.toDouble / 1.8446744073709552e19 + 0.5, 1e-12)
      val un = (ah ++ bh).distinct.sorted.take(k)
      val estU = if (un.size < k) un.size.toDouble else (k - 1) / u(un.last)
      val aset = ah.toSet; val bset = bh.toSet
      val j = un.count(h => aset(h) && bset(h)).toDouble / un.size
      Seq(estU, j * estU)
    })
    // three 1-row frames; the sketch UDAF did all the data-scale work
    exact.crossJoin(skA).crossJoin(skB)
      .withColumn("e", est(col("ah"), col("bh")))
      .select(col("n_a"), col("n_b"), col("n_inter"),
        (abs(col("e")(0) - (col("n_a") + col("n_b") - col("n_inter")))
          <= (col("n_a") + col("n_b") - col("n_inter")) * 0.1)
          .as("union_within_10pct"),
        (abs(col("e")(1) - col("n_inter")) <= col("n_inter") * 0.25)
          .as("inter_within_25pct"))
  }

  /** Skewness and excess kurtosis per return flag from EXACT decimal power
    * sums (Σx, Σx², Σx³, Σx⁴) — the same sufficient-statistics discipline as
    * `agg_regression` (Analytics.scala): the built-in skewness/kurtosis
    * accumulate doubles (merge-order-dependent, can't hash cross-engine);
    * here only the closed-form moment arithmetic runs in IEEE double.
    * Intermediate powers re-cast to DECIMAL(18,12) keep every product
    * inside both engines' exact decimal range (l_discount ≤ 0.1, so all
    * power values carry ≤ 8 significant decimals — the casts are lossless). */
  def aggSkewKurtosis(s: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_discount"))
    val x2 = (x * x).cast(DecimalType(18, 12))
    val x3 = (x2 * x).cast(DecimalType(18, 12))
    val x4 = (x2 * x2).cast(DecimalType(18, 12))
    // scale-8 rescale, NOT dfin's scale 4: x³/x⁴ of the 2-decimal discount
    // grid carry 6-8 decimals, so a scale-4 rescale lands exactly on .5
    // ties where Spark rounds HALF_UP but DuckDB HALF_EVEN — scale 8 keeps
    // the true value (no rounding anywhere) and its unscaled int ≪ 2^53
    val d8 = (c: org.apache.spark.sql.Column) =>
      c.cast(DecimalType(38, 8)).cast("double")
    val m = Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        d8(sum(x)).as("s1"), d8(sum(x2)).as("s2"),
        d8(sum(x3)).as("s3"), d8(sum(x4)).as("s4"))
    val mean = col("s1") / col("n")
    // variance powers via * and sqrt only: both are correctly-rounded IEEE
    // ops on both engines, unlike libm `pow`
    val v = col("s2") / col("n") - mean * mean
    val sk = (col("s3") / col("n") - lit(3) * mean * (col("s2") / col("n"))
        + lit(2) * mean * mean * mean) / (v * sqrt(v))
    val ku = (col("s4") / col("n") - lit(4) * mean * (col("s3") / col("n"))
        + lit(6) * mean * mean * (col("s2") / col("n"))
        - lit(3) * mean * mean * mean * mean) / (v * v) - lit(3)
    m.select(col("l_returnflag"), round(sk, 6).as("skewness"),
        round(ku, 6).as("kurtosis"))
      .orderBy(col("l_returnflag"))
  }

  /** SQL-text PIVOT: status columns spread with BOTH a count and an exact
    * decimal total per cell — the reshape an Athena analyst writes as SQL
    * (the DataFrame `pivot_status` key covers the API form). One hash
    * aggregation over |priorities| × |statuses| cells. */
  def sqlPivot(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_pivot_src")
    s.sql(
      """SELECT o_orderpriority,
        |  f_n, CAST(CAST(f_tot AS DECIMAL(38,4)) AS DOUBLE) AS f_tot,
        |  o_n, CAST(CAST(o_tot AS DECIMAL(38,4)) AS DOUBLE) AS o_tot,
        |  p_n, CAST(CAST(p_tot AS DECIMAL(38,4)) AS DOUBLE) AS p_tot
        |FROM (SELECT o_orderpriority, o_orderstatus,
        |        CAST(o_totalprice AS DECIMAL(18,6)) AS v
        |      FROM orders_pivot_src)
        |PIVOT (COUNT(v) AS n, SUM(v) AS tot
        |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Built-in `approx_top_k` frequent-items sketch (bounded, mergeable
    * state — the heavy-hitters form a 100 TB GROUP BY ALL can't afford).
    * The tracked-item budget exceeds this column's cardinality, so the
    * sketch is exact here and the oracle is the exact top-k; on a
    * high-cardinality column the contract would weaken to the
    * tolerance-boolean pattern (`agg_kmv_intersect`). */
  def aggApproxTopK(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .agg(expr("approx_top_k(event_type, 3, 100)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** Welch's two-sample t-test between every pair of event types (the A/B
    * readout): per-type sufficient statistics (n, Σx, Σx²) are exact
    * decimal sums (x is 2-decimal, so x² is 4-decimal — the scale-4
    * rescale is lossless); the t statistic, Welch–Satterthwaite dof and
    * the |t| > 1.96 flag are closed-form IEEE arithmetic over the 5-row
    * stats frame self-joined — data-scale work is ONE aggregation. */
  def eventsAbTest(s: SparkSession, dir: String): DataFrame = {
    val x = dec(col("value"))
    val st = Tables.events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        dfin(sum(x)).as("s1"),
        sum(x * x).cast(DecimalType(38, 4)).cast("double").as("s2"))
    def v(p: String) = (col(s"${p}_s2") - col(s"${p}_s1") * col(s"${p}_s1") / col(s"${p}_n")) /
      (col(s"${p}_n") - 1)
    val a = st.select(col("event_type").as("type_a"), col("n").as("a_n"),
      col("s1").as("a_s1"), col("s2").as("a_s2"))
    val b = st.select(col("event_type").as("type_b"), col("n").as("b_n"),
      col("s1").as("b_s1"), col("s2").as("b_s2"))
    val se2 = v("a") / col("a_n") + v("b") / col("b_n")
    val t = (col("a_s1") / col("a_n") - col("b_s1") / col("b_n")) / sqrt(se2)
    val dof = (se2 * se2) /
      ((v("a") / col("a_n")) * (v("a") / col("a_n")) / (col("a_n") - 1) +
       (v("b") / col("b_n")) * (v("b") / col("b_n")) / (col("b_n") - 1))
    a.crossJoin(b).filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        round(t, 6).as("t_stat"), round(dof, 2).as("dof"),
        (abs(t) > 1.96).as("significant"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_ab_test" -> (eventsAbTest _),
    "agg_skew_kurtosis" -> (aggSkewKurtosis _),
    "sql_pivot" -> (sqlPivot _),
    "agg_approx_topk" -> (aggApproxTopK _),
    "ts_resample" -> (tsResample _),
    "ts_interpolate" -> (tsInterpolate _),
    "ts_rolling_slope" -> (tsRollingSlope _),
    "ts_anomaly" -> (tsAnomaly _),
    "ts_anomaly_mad" -> (tsAnomalyMad _),
    "events_forecast_baseline" -> (eventsForecastBaseline _),
    "agg_mode" -> (aggMode _),
    "agg_weighted_median" -> (aggWeightedMedian _),
    "agg_histogram" -> (aggHistogram _),
    "agg_kmv_intersect" -> (aggKmvIntersect _),
    "profile_columns" -> (profileColumns _)
  )

  val oracle: Map[String, String] = Map(
    "events_forecast_baseline" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS tot,
        |    dayofweek(CAST(ts AS DATE)) + 1 AS dow
        |  FROM events GROUP BY 1, 2, 4),
        |seas AS (
        |  SELECT event_type, dow,
        |    CAST(CAST(SUM(CAST(tot AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fc
        |  FROM daily WHERE day < DATE '2024-01-22' GROUP BY 1, 2),
        |test AS (
        |  SELECT d.event_type, d.tot - s.fc AS err
        |  FROM daily d JOIN seas s
        |    ON d.event_type = s.event_type AND d.dow = s.dow
        |  WHERE d.day >= DATE '2024-01-22')
        |SELECT event_type, COUNT(*) AS n_test,
        |  CAST(CAST(SUM(CAST(abs(err) AS DECIMAL(18,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae,
        |  CAST(CAST(SUM(CAST(err AS DECIMAL(18,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS bias
        |FROM test GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ts_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS tot
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, tot AS med FROM (
        |    SELECT event_type, tot,
        |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tot, day)
        |        AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS c
        |    FROM daily) WHERE rn = (c + 1) // 2),
        |dv AS (
        |  SELECT d.event_type, d.day, d.tot, abs(d.tot - m.med) AS dev
        |  FROM daily d JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev, day,
        |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, day)
        |        AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS c
        |    FROM dv) WHERE rn = (c + 1) // 2)
        |SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
        |  round(d.dev / m.mad, 6) AS mad_score
        |FROM dv d JOIN mad m USING (event_type)
        |WHERE m.mad > 0 AND d.dev > 3.0 * m.mad
        |ORDER BY d.event_type, d.day""".stripMargin,
    "ts_rolling_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
        |  FROM events GROUP BY 1, 2),
        |d2 AS (
        |  SELECT event_type, day, y,
        |    CAST(day - DATE '2024-01-01' AS BIGINT) AS x
        |  FROM daily),
        |f AS (
        |  SELECT event_type, day,
        |    ROW_NUMBER() OVER wo AS rn,
        |    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(y) OVER w AS DECIMAL(38,4)) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(10,0)) * y AS DECIMAL(38,6)))
        |      OVER w AS DECIMAL(38,4)) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx
        |  FROM d2
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |         w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, CAST(day AS VARCHAR) AS day,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
        |FROM f WHERE rn >= 14 ORDER BY event_type, day""".stripMargin,
    "ts_interpolate" ->
      """WITH obs AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS v
        |  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        |      FROM obs GROUP BY 1),
        |spine AS (
        |  SELECT event_type,
        |    CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |j AS (SELECT s.event_type, s.day, o.v FROM spine s
        |      LEFT JOIN obs o ON o.event_type = s.event_type AND o.day = s.day),
        |f AS (
        |  SELECT event_type, day, v,
        |    LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wp AS pd,
        |    FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wn AS nd
        |  FROM j
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       wn AS (PARTITION BY event_type ORDER BY day
        |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(day AS VARCHAR) AS day,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv + (nv - pv) *
        |         (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END
        |    AS value,
        |  (v IS NOT NULL) AS observed
        |FROM f ORDER BY event_type, day""".stripMargin,
    "ts_resample" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS v
        |  FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2),
        |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
        |cal AS (SELECT user_id,
        |    CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |j AS (SELECT c.user_id, c.day, d.v FROM cal c LEFT JOIN daily d
        |      ON c.user_id = d.user_id AND c.day = d.day),
        |f AS (SELECT user_id, day, v,
        |    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM j)
        |SELECT user_id, CAST(day AS VARCHAR) AS day, v IS NOT NULL AS observed,
        |  CAST(CAST(filled AS DECIMAL(38,4)) AS DOUBLE) AS value_filled
        |FROM f ORDER BY user_id, day""".stripMargin,
    "ts_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS tot
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(tot AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS sx,
        |    -- (24,6)x(14,6): p1+p2=38 forces DuckDB's exact int128 multiply
        |    -- path (same coupling as agg_regression, Analytics.scala)
        |    CAST(CAST(SUM(CAST(tot AS DECIMAL(24,6)) * CAST(tot AS DECIMAL(14,6)))
        |      AS DECIMAL(38,4)) AS DOUBLE) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
        |  round((d.tot - st.sx / st.n)
        |    / sqrt((st.sxx - st.sx * st.sx / st.n) / (st.n - 1)), 6) AS z
        |FROM daily d JOIN st USING (event_type)
        |WHERE abs((d.tot - st.sx / st.n)
        |    / sqrt((st.sxx - st.sx * st.sx / st.n) / (st.n - 1))) >= 2
        |ORDER BY event_type, day""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n
        |           FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_returnflag, l_quantity AS mode_qty,
        |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                           ORDER BY n DESC, l_quantity) AS rk
        |      FROM c),
        |cum AS (SELECT l_returnflag, l_quantity,
        |    SUM(n) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(n) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM c),
        |med AS (SELECT l_returnflag, MIN(l_quantity) AS median_lo
        |        FROM cum WHERE cum * 2 >= tot GROUP BY 1)
        |SELECT m.l_returnflag, m.mode_qty, med.median_lo
        |FROM m JOIN med USING (l_returnflag) WHERE m.rk = 1
        |ORDER BY 1""".stripMargin,
    "agg_weighted_median" ->
      """WITH pp AS (SELECT l_returnflag, l_extendedprice AS price,
        |       SUM(CAST(l_quantity AS DECIMAL(18,6))) AS w
        |     FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT l_returnflag, price,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM pp)
        |SELECT l_returnflag, MIN(price) AS wmedian_price
        |FROM cum WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_ab_test" ->
      """WITH st AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(24,6)) * CAST(value AS DECIMAL(14,6)))
        |      AS DECIMAL(38,4)) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.n AS an, a.s1 AS as1, a.s2 AS as2,
        |    b.n AS bn, b.s1 AS bs1, b.s2 AS bs2
        |  FROM st a JOIN st b ON a.event_type < b.event_type),
        |c AS (
        |  SELECT *,
        |    ((as2 - as1 * as1 / an) / (an - 1)) AS va,
        |    ((bs2 - bs1 * bs1 / bn) / (bn - 1)) AS vb
        |  FROM p),
        |d AS (SELECT *, (va / an + vb / bn) AS se2 FROM c)
        |SELECT type_a, type_b,
        |  round((as1 / an - bs1 / bn) / sqrt(se2), 6) AS t_stat,
        |  round((se2 * se2) / ((va / an) * (va / an) / (an - 1)
        |    + (vb / bn) * (vb / bn) / (bn - 1)), 2) AS dof,
        |  abs((as1 / an - bs1 / bn) / sqrt(se2)) > CAST(1.96 AS DOUBLE)
        |    AS significant
        |FROM d ORDER BY type_a, type_b""".stripMargin,
    "agg_skew_kurtosis" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,8))
        |      AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,6))
        |        * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,12)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS s2,
        |    CAST(CAST(SUM(CAST(CAST(CAST(l_discount AS DECIMAL(18,6))
        |          * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,12))
        |        * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,12)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS s3,
        |    CAST(CAST(SUM(CAST(CAST(CAST(l_discount AS DECIMAL(18,6))
        |          * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,12))
        |        * CAST(CAST(l_discount AS DECIMAL(18,6))
        |          * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,12))
        |        AS DECIMAL(18,12)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |v AS (SELECT *, s2/n - (s1/n)*(s1/n) AS var FROM m)
        |SELECT l_returnflag,
        |  round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
        |    / (var * sqrt(var)), 6) AS skewness,
        |  round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
        |      - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
        |    / (var * var) - 3, 6) AS kurtosis
        |FROM v ORDER BY l_returnflag""".stripMargin,
    "sql_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
        |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,4))
        |    AS DOUBLE) AS f_tot,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
        |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,4))
        |    AS DOUBLE) AS o_tot,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n,
        |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |      THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,4))
        |    AS DOUBLE) AS p_tot
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_approx_topk" ->
      """SELECT event_type AS item, COUNT(*) AS cnt FROM events
        |GROUP BY 1 ORDER BY cnt DESC, item LIMIT 3""".stripMargin,
    "agg_histogram" ->
      """SELECT o_orderpriority,
        |  CAST(FLOOR(o_totalprice / CAST(25000 AS DOUBLE)) AS INTEGER) AS bucket,
        |  CAST(FLOOR(o_totalprice / CAST(25000 AS DOUBLE)) AS INTEGER)
        |    * CAST(25000 AS DOUBLE) AS lo,
        |  (CAST(FLOOR(o_totalprice / CAST(25000 AS DOUBLE)) AS INTEGER) + 1)
        |    * CAST(25000 AS DOUBLE) AS hi,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2, 3, 4
        |ORDER BY o_orderpriority, bucket""".stripMargin,
    "agg_kmv_intersect" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority = '5-LOW')
        |SELECT (SELECT COUNT(*) FROM a) AS n_a,
        |  (SELECT COUNT(*) FROM b) AS n_b,
        |  (SELECT COUNT(*) FROM a JOIN b USING (o_custkey)) AS n_inter,
        |  TRUE AS union_within_10pct, TRUE AS inter_within_25pct""".stripMargin,
    "profile_columns" ->
      """SELECT 'o_orderkey' AS col, COUNT(o_orderkey) AS n_nonnull,
        |  COUNT(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS vmin,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS vmax
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', COUNT(o_custkey), COUNT(DISTINCT o_custkey),
        |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
        |  MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
        |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
        |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
        |  CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
        |  CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', COUNT(o_orderpriority),
        |  COUNT(DISTINCT o_orderpriority),
        |  MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
        |ORDER BY col""".stripMargin
  )
}

/** KMV sketch buffer: the K smallest DISTINCT hash values seen, as a sorted
  * ascending Array[Long]. Bounded (≤K longs), order-independent, mergeable —
  * safe as a Spark partial-aggregation buffer at any scale. The array form
  * keeps the per-row hot path at one binary search + one bounded arraycopy
  * (the Vector form paid an O(K) linear scan plus three persistent-tree
  * copies per accepted row — ADVICE r10). */
final case class KmvBuf(hs: Array[Long])

object KmvSketchAgg
    extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, Seq[Long]] {
  val K = 512

  private def insert(hs: Array[Long], h: Long): Array[Long] = {
    val n = hs.length
    if (n >= K && h >= hs(n - 1)) hs
    else {
      val i = java.util.Arrays.binarySearch(hs, h)
      if (i >= 0) hs // distinct-only
      else {
        val at = -(i + 1)
        val outLen = math.min(n + 1, K)
        val out = new Array[Long](outLen)
        System.arraycopy(hs, 0, out, 0, at)
        out(at) = h
        if (outLen - at - 1 > 0) System.arraycopy(hs, at, out, at + 1, outLen - at - 1)
        out
      }
    }
  }

  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)
  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val out = insert(b.hs, h)
    if (out eq b.hs) b else KmvBuf(out)
  }
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    // both sides sorted-distinct: one linear two-pointer merge, stop at K
    val x = a.hs; val y = b.hs
    val out = new Array[Long](math.min(x.length + y.length, K))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length) { val t = x(i); i += 1; t }
        else if (i >= x.length) { val t = y(j); j += 1; t }
        else if (x(i) < y(j)) { val t = x(i); i += 1; t }
        else if (y(j) < x(i)) { val t = y(j); j += 1; t }
        else { val t = x(i); i += 1; j += 1; t } // equal head: consume both
      out(o) = v; o += 1
    }
    KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }
  override def finish(b: KmvBuf): Seq[Long] = b.hs.toSeq
  override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
    org.apache.spark.sql.Encoders.product[KmvBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
