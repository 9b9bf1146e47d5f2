package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics and approximate-matching operators over the `events` /
  * `customer` tables: batch gap sessionization, cohort retention, fuzzy
  * (edit-distance) joins via deletion-neighborhood blocking, and mergeable
  * Datasketches-HLL distinct counting.
  *
  * In the reference these shapes would be hand-written Athena SQL over the
  * connector's scan (reference README.md:37-38 "Do some queries !"); here
  * each is a declarative Spark plan whose shuffle structure survives 100 TB:
  * sessionization and retention shuffle once on `user_id`, the fuzzy join
  * replaces the O(n²) all-pairs edit-distance scan with an equi-join on
  * O(len) deletion keys, and the HLL sketches are merged per-group partials
  * (the same pattern as Spark's partial aggregation — no raw-row re-shuffle).
  */
object Analytics {
  import Det._

  private val SessionGapUs = 3600L * 1000000L // 1 hour

  /** Batch gap-based sessionization: a new session starts when a user is
    * idle for more than one hour. One shuffle on `user_id` feeds both window
    * passes and the final per-session aggregation (same partitioning, so
    * Catalyst reuses the exchange). Ties on `ts` are broken by `event_id`
    * for a fully deterministic session assignment. */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val brk = e.withColumn("brk",
      when(lag(col("us"), 1).over(w).isNull
        || col("us") - lag(col("us"), 1).over(w) > SessionGapUs, 1).otherwise(0))
    brk.withColumn("session_id", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Weekly cohort retention: each user's cohort is their first active week
    * (Monday-truncated); output counts distinct users per (cohort, weeks
    * since cohort). The distinct user-week set is the only wide state —
    * bounded by users × weeks, not by raw events. */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort"), (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_no"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .select(col("cohort").cast("string").as("cohort_week"), col("week_no"), col("n_users"))
      .orderBy(col("cohort_week"), col("week_no"))
  }

  /** Fuzzy self-join (edit distance ≤ 1) via deletion-neighborhood blocking:
    * each name emits its identity key plus every single-character-deletion
    * variant; two strings within one edit share at least one key, so an
    * equi-join on the O(len)-sized key set finds every candidate pair and
    * `levenshtein` verifies only those — never the O(n²) cross product.
    * Candidates are deduped BEFORE the verify so a pair sharing several
    * keys pays for one distance computation. */
  def joinFuzzy(s: SparkSession, dir: String): DataFrame = {
    val sub = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 8000)
      .select(col("c_custkey"), col("c_name"))
    val keyed = sub.select(col("c_custkey"), col("c_name"),
      explode(expr(
        """array_union(
          |  array(c_name),
          |  transform(sequence(1, length(c_name)),
          |    i -> concat(substring(c_name, 1, i-1),
          |                substring(c_name, i+1, length(c_name)))))""".stripMargin)).as("k"))
    val a = keyed.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"), col("k"))
    val b = keyed.select(col("c_custkey").as("b_key"), col("c_name").as("b_name"), col("k"))
    a.join(b, "k")
      .filter(col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"))
      .distinct()
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
      .select(col("a_key"), col("b_key"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** Mergeable Datasketches-HLL distinct count: per-nation sketches unioned
    * into a global estimate — the re-aggregatable form a 100 TB rollup needs
    * (store per-partition sketches, merge on demand; never re-scan raw keys).
    * The hash-checked columns are the exact values plus a tolerance boolean,
    * same contract as `agg_approx_distinct` (AggExt.scala): the estimate
    * itself is implementation-defined, its 5%-accuracy is not. */
  def aggHllSketch(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val perNation = c.groupBy(col("c_nationkey"))
      .agg(hll_sketch_agg(col("c_custkey"), lit(14)).as("sk"))
    val unioned = perNation.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"),
      count(lit(1)).as("n_groups"))
    val exact = c.agg(count_distinct(col("c_custkey")).as("n_exact"))
    unioned.crossJoin(exact)
      .select(col("n_exact"), col("n_groups"),
        (abs(col("est") - col("n_exact")) <= col("n_exact").cast("double") * 0.05)
          .as("union_within_5pct"))
  }

  /** Rolling active users (the DAU/WAU dashboard rollup): per day, the
    * distinct users active that day AND in the trailing 7-day window.
    * The rolling distinct is NOT a window count-distinct (unsupported and
    * would hold per-frame sets): each (day, user) contribution row is
    * replicated to the ≤7 target days it serves — a bounded narrow
    * explode — and the count is one hash aggregation per target day.
    * Cost ∝ active-pairs × window/step; the standard exact form at scale
    * (HLL partials replace it when approximate is acceptable —
    * `agg_hll_sketch`). */
  def eventsActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = du.groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("dau"))
    val wau = du
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("day"),
        col("user_id"))
      .distinct()
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("wau"))
    // joining back to dau keeps only days with actual activity (the
    // explode also manufactures the 6 days after the corpus ends)
    dau.join(wau, Seq("day"))
      .select(col("day").cast("string").as("day"), col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  /** Linear-regression aggregates (REGR_SLOPE/INTERCEPT/R2 semantics) in
    * the engine-deterministic form: all five sufficient statistics are
    * EXACT decimal sums (order-independent), cast to double only for the
    * final closed-form arithmetic — the built-in regr_* aggregates
    * accumulate doubles and are merge-order-dependent, which can't
    * hash-match across engines. One map-side-combining aggregation. */
  def aggRegression(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    val sums = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        dfin(sum(x)).as("sx"), dfin(sum(y)).as("sy"),
        sum(x * y).cast(DecimalType(38, 4)).cast("double").as("sxy"),
        sum(x * x).cast(DecimalType(38, 4)).cast("double").as("sxx"),
        sum(y * y).cast(DecimalType(38, 4)).cast("double").as("syy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val r2num = (col("n") * col("sxy") - col("sx") * col("sy")) *
      (col("n") * col("sxy") - col("sx") * col("sy"))
    val r2den = (col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy"))
    sums.select(col("l_returnflag"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
        round(r2num / r2den, 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Cohort LTV curve: average cumulative spend by days-since-first-
    * purchase (tenure 0..14) — the revenue-side twin of `events_retention`.
    * Per-user daily spend reduces once (the only raw-data shuffle); each
    * user's dense tenure spine is a narrow `sequence` explode bounded at
    * 15 rows/user; the cumulative sum is an exact decimal window on the
    * user exchange; the curve aggregation reduces |tenure| groups. The
    * corpus-end bound joins as a broadcast 1-row frame — no driver
    * collect. */
  def eventsLtvCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec(col("value"))).as("spend"))
    val u = p.groupBy(col("user_id")).agg(min(col("day")).as("f"))
    val bounds = ev.agg(max(to_date(col("ts"))).as("endd"))
    val spine = u.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("f"), explode(expr(
        "sequence(0L, least(CAST(datediff(endd, f) AS BIGINT), 14L))")).as("k"))
    val daily = spine.as("s").join(p.as("p"),
        col("p.user_id") === col("s.user_id") &&
        col("p.day") === expr("date_add(s.f, CAST(s.k AS INT))"), "left")
      .select(col("s.user_id").as("user_id"), col("k"),
        coalesce(col("p.spend"), lit(0).cast(DecimalType(18, 6))).as("spend"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum",
        sum(col("spend")).over(w).cast(DecimalType(18, 6)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_users"), davg(col("cum")).as("avg_ltv"))
      .orderBy(col("k"))
  }

  /** Pairwise Pearson correlation matrix (long form) of the four lineitem
    * measures, per return flag — the feature-correlation screen every ML
    * pipeline runs before training. ONE aggregation pass computes every
    * sufficient statistic (4 sums + 10 exact-decimal product sums); the six
    * correlations are then closed-form scalar arithmetic over the 3-row
    * stats frame, so the data-scale cost is a single map-side-combining
    * shuffle regardless of how many measure pairs are screened.
    *
    * Float discipline: all Σx and Σxy are EXACT decimal sums (`Det`, same
    * coupling as `agg_regression`); the corr formula
    * `(n·sxy − sx·sy) / (sqrt(n·sxx − sx²) · sqrt(n·syy − sy²))` uses only
    * + - * / sqrt in an identical tree on both engines. */
  def aggCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ms = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    def p(a: String, b: String) = s"p_${a}_$b"
    val prodAggs = for { i <- ms.indices; j <- i until ms.length } yield
      sum(dec(col(ms(i))) * dec(col(ms(j))))
        .cast(DecimalType(38, 4)).cast("double").as(p(ms(i), ms(j)))
    val sumAggs = ms.map(m => dfin(sum(dec(col(m)))).as(s"s_$m"))
    // the 14 exact-decimal sums (4 plain + 10 products) are CPU-bound
    // (128-bit decimal
    // arithmetic); the sf0.1 parquet yields only 3 input partitions, which
    // serializes the partial aggregation on 3 of 32 cores. Re-spread small
    // scans so the map-side combine parallelizes; a production scan already
    // has >> cores partitions and skips this (exact sums are
    // order-independent, so the answer cannot change — that's the point of
    // the decimal discipline).
    val li0 = Tables.lineitem(s, dir)
    val li = if (li0.rdd.getNumPartitions < 16) li0.repartition(32) else li0
    val stats = li
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        (sumAggs ++ prodAggs): _*)
    def corr(a: String, b: String) =
      (col("n") * col(p(a, b)) - col(s"s_$a") * col(s"s_$b")) /
        (sqrt(col("n") * col(p(a, a)) - col(s"s_$a") * col(s"s_$a")) *
         sqrt(col("n") * col(p(b, b)) - col(s"s_$b") * col(s"s_$b")))
    val pairs = for { i <- ms.indices; j <- (i + 1) until ms.length } yield
      struct(lit(ms(i)).as("var_a"), lit(ms(j)).as("var_b"),
        round(corr(ms(i), ms(j)), 6).as("corr"))
    stats.select(col("l_returnflag"), explode(array(pairs: _*)).as("e"))
      .select(col("l_returnflag"), col("e.var_a").as("var_a"),
        col("e.var_b").as("var_b"), col("e.corr").as("corr"))
      .orderBy(col("l_returnflag"), col("var_a"), col("var_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_corr_matrix" -> (aggCorrMatrix _),
    "events_ltv_curve" -> (eventsLtvCurve _),
    "events_sessionize" -> (eventsSessionize _),
    "events_retention" -> (eventsRetention _),
    "events_active_users" -> (eventsActiveUsers _),
    "join_fuzzy" -> (joinFuzzy _),
    "agg_regression" -> (aggRegression _),
    "agg_hll_sketch" -> (aggHllSketch _)
  )

  /** Generated mirror of `aggCorrMatrix`: identical sufficient-stat decimal
    * casts ((24,6)×(14,6) products — the int128 coupling, see
    * `agg_regression`) and the identical corr expression tree. */
  private val corrMatrixSql: String = {
    val ms = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    def p(a: String, b: String) = s"p_${a}_$b"
    val prods = (for { i <- ms.indices; j <- i until ms.length } yield
      s"""CAST(CAST(SUM(CAST(${ms(i)} AS DECIMAL(24,6)) * CAST(${ms(j)} AS DECIMAL(14,6)))
         |      AS DECIMAL(38,4)) AS DOUBLE) AS ${p(ms(i), ms(j))}""".stripMargin)
    val sums = ms.map(m => s"${sqlDsum(m)} AS s_$m")
    def corr(a: String, b: String) =
      s"(n * ${p(a, b)} - s_$a * s_$b) / " +
        s"(sqrt(n * ${p(a, a)} - s_$a * s_$a) * sqrt(n * ${p(b, b)} - s_$b * s_$b))"
    val branches = for { i <- ms.indices; j <- (i + 1) until ms.length } yield
      s"""SELECT l_returnflag, '${ms(i)}' AS var_a, '${ms(j)}' AS var_b,
         |  round(${corr(ms(i), ms(j))}, 6) AS corr FROM stats""".stripMargin
    s"""WITH stats AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${(sums ++ prods).mkString(",\n    ")}
       |  FROM lineitem GROUP BY l_returnflag)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY l_returnflag, var_a, var_b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "agg_corr_matrix" -> corrMatrixSql,
    "events_ltv_curve" ->
      """WITH p AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS spend
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |u AS (SELECT user_id, MIN(day) AS f FROM p GROUP BY 1),
        |bounds AS (SELECT MAX(CAST(ts AS DATE)) AS endd FROM events),
        |spine AS (
        |  SELECT u.user_id, u.f, UNNEST(generate_series(0,
        |    LEAST(CAST((SELECT endd FROM bounds) - u.f AS BIGINT), 14)))
        |    AS k
        |  FROM u),
        |daily AS (
        |  SELECT s.user_id, s.k,
        |    COALESCE(p.spend, CAST(0 AS DECIMAL(18,6))) AS spend
        |  FROM spine s LEFT JOIN p
        |    ON p.user_id = s.user_id
        |   AND p.day = s.f + CAST(s.k AS INTEGER)),
        |cum AS (
        |  SELECT user_id, k,
        |    CAST(SUM(spend) OVER (PARTITION BY user_id ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(18,6)) AS cum
        |  FROM daily)
        |SELECT k, COUNT(*) AS n_users,
        |  CAST(CAST(SUM(CAST(cum AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_ltv
        |FROM cum GROUP BY k ORDER BY k""".stripMargin,
    "events_active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
        |wau AS (
        |  SELECT d2.day AS day, COUNT(DISTINCT d1.user_id) AS wau
        |  FROM du d1 JOIN (SELECT DISTINCT day FROM du) d2
        |    ON d1.day BETWEEN d2.day - 6 AND d2.day
        |  GROUP BY d2.day)
        |SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau
        |FROM dau JOIN wau ON dau.day = wau.day ORDER BY day""".stripMargin,
    "agg_regression" ->
      s"""WITH sums AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${sqlDsum("l_quantity")} AS sx,
         |    ${sqlDsum("l_extendedprice")} AS sy,
         |    -- one operand DECIMAL(24,6): p1+p2=38 forces DuckDB's int128
         |    -- multiply path (narrower pairs raise a DECIMAL(18) overflow)
         |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_extendedprice AS DECIMAL(14,6)))
         |      AS DECIMAL(38,4)) AS DOUBLE) AS sxy,
         |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(14,6)))
         |      AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
         |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(l_extendedprice AS DECIMAL(14,6)))
         |      AS DECIMAL(38,4)) AS DOUBLE) AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         |    AS intercept,
         |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
         |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
         |FROM sums ORDER BY l_returnflag""".stripMargin,
    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |b AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 3600000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM b)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us,
        |  MAX(us) - MIN(us) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY user_id)
        |SELECT CAST(c.cohort AS VARCHAR) AS cohort_week,
        |  CAST((uw.wk - c.cohort) / 7 AS INTEGER) AS week_no,
        |  COUNT(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "join_fuzzy" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1
        |WHERE a.c_acctbal > 8000 AND b.c_acctbal > 8000
        |ORDER BY a_key, b_key""".stripMargin,
    "agg_hll_sketch" ->
      """SELECT COUNT(DISTINCT c_custkey) AS n_exact,
        |  COUNT(DISTINCT c_nationkey) AS n_groups,
        |  TRUE AS union_within_5pct
        |FROM customer""".stripMargin
  )
}
