package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B "Window functions"). One shuffle
  * on the partition key per window spec; all orderings carry a unique
  * tiebreak column so frames are total-ordered and engine-neutral. */
object Windows {
  import Det._

  /** rank / dense_rank / row_number / ntile, top-5 per segment. */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rn") <= 5)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** lag / lead / first_value / last_value per user timeline. */
  def winAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_value"))
      .orderBy(col("event_id"))
  }

  /** ROWS frame: running sum + moving 3-row average per user. */
  def winFrameRows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = w.rowsBetween(-2, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        dfin(sum(dec(col("value"))).over(running)).as("running_value"),
        count(lit(1)).over(last3).as("n_last3"),
        dfin(sum(dec(col("value"))).over(last3)).as("sum_last3"))
      .orderBy(col("event_id"))
  }

  /** RANGE frame over a numeric ordering key (acctbal ± 100 window). */
  def winFrameRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
      .rangeBetween(-100, 0)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        count(lit(1)).over(w).as("n_within_100"))
      .orderBy(col("c_custkey"))
  }

  /** TIME-interval RANGE frame: per-user trailing-10-minute event count
    * and exact value sum, ordered by event time — the sliding-lookback
    * frame rate-limiting / rolling-metric queries use. Interval bounds
    * only exist in the SQL frame syntax (the DSL rangeBetween is
    * numeric), hence expr(); peers at the same timestamp are all in
    * frame, so no tiebreak is needed for determinism. */
  def winFrameTime(s: SparkSession, dir: String): DataFrame = {
    val frame = "OVER (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)"
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr(s"count(*) $frame").as("n_10m"),
        expr(s"CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) $frame " +
          "AS DECIMAL(38,4)) AS DOUBLE)").as("sum_10m"))
      .orderBy(col("event_id"))
  }

  /** Forward fill (gap fill): `last_value IGNORE NULLS` over a running
    * frame carries the most recent non-null reading forward — the standard
    * sensor/telemetry repair. Error events null their reading first, so the
    * fill is exercised on real gaps. One shuffle on `user_id`. */
  def winFillForward(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reading = when(col("event_type") === "error", lit(null)).otherwise(col("value"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), reading.as("reading"),
        last(reading, ignoreNulls = true).over(w).as("filled"))
      .orderBy(col("event_id"))
  }

  /** Running DISTINCT count per user over time ("how many event types has
    * this user seen so far") — window COUNT(DISTINCT) is unsupported (it
    * would hold a set per frame), so the scalable form marks each (user,
    * value)'s FIRST occurrence with one row_number pass and running-sums
    * the marks: two window passes, both on the same `user_id` shuffle,
    * state O(1) per row. */
  def winRunningDistinct(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val firstW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val runW = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("first_seen",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("first_seen")).over(runW))
      .select(col("user_id"), col("event_id"), col("n_types_seen"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** Revenue concentration (Pareto): per order priority, how many of the
    * largest orders cover 50% / 80% of the group's revenue. One
    * partitioned sort feeds the exact-decimal running total AND the group
    * total (two frames on the same exchange); the thresholds are exact
    * decimal comparisons (0.5·total and 0.8·total are lossless decimal
    * products), so the output is pure integers — no float rounding
    * anywhere. The final reduce is |priorities| groups. */
  def winPareto(s: SparkSession, dir: String): DataFrame = {
    import graft.Det._
    import org.apache.spark.sql.types.DecimalType
    val wRun = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("v").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("o_orderpriority"))
    val half = lit(0.5).cast(DecimalType(2, 1))
    val p80 = lit(0.8).cast(DecimalType(2, 1))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        dec(col("o_totalprice")).as("v"))
      .withColumn("cum", sum(col("v")).over(wRun))
      .withColumn("tot", sum(col("v")).over(wAll))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(when(col("cum") < col("tot") * half, 1L).otherwise(0L)) + 1L)
          .as("n_half"),
        (sum(when(col("cum") < col("tot") * p80, 1L).otherwise(0L)) + 1L)
          .as("n_p80"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_pareto" -> (winPareto _),
    "win_running_distinct" -> (winRunningDistinct _),
    "win_rank" -> (winRank _),
    "win_analytic" -> (winAnalytic _),
    "win_frame_rows" -> (winFrameRows _),
    "win_frame_range" -> (winFrameRange _),
    "win_frame_time" -> (winFrameTime _),
    "win_fill_forward" -> (winFillForward _)
  )

  val oracle: Map[String, String] = Map(
    "win_pareto" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS v
        |  FROM orders),
        |w AS (
        |  SELECT o_orderpriority,
        |    SUM(v) OVER (PARTITION BY o_orderpriority
        |      ORDER BY v DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(v) OVER (PARTITION BY o_orderpriority) AS tot
        |  FROM t)
        |SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN cum < tot * CAST(0.5 AS DECIMAL(2,1))
        |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_half,
        |  CAST(SUM(CASE WHEN cum < tot * CAST(0.8 AS DECIMAL(2,1))
        |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_p80
        |FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "win_running_distinct" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE user_id < 20),
        |m AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY us, event_id) = 1
        |         THEN 1 ELSE 0 END AS first_seen
        |  FROM e)
        |SELECT user_id, event_id,
        |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
        |FROM m ORDER BY user_id, us, event_id""".stripMargin,
    "win_rank" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER w AS rn,
        |    rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk,
        |    ntile(4) OVER w AS quartile
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,
    "win_analytic" ->
      """SELECT event_id, user_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_frame_rows" ->
      """SELECT event_id, user_id,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER running AS DECIMAL(38,4)) AS DOUBLE) AS running_value,
        |  COUNT(*) OVER last3 AS n_last3,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER last3 AS DECIMAL(38,4)) AS DOUBLE) AS sum_last3
        |FROM events
        |WINDOW
        |  running AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  last3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_frame_range" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
        |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_within_100
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_frame_time" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_10m,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w
        |    AS DECIMAL(38,4)) AS DOUBLE) AS sum_10m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_fill_forward" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS reading,
        |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
        |             IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin
  )
}
