package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2B "Joins") — in the reference system all joins
  * run in Athena/Presto above the connector scan; here each strategy is
  * exercised natively with the physical plan it should pick at 100 TB:
  * broadcast for small dims, shuffle-hash/sort-merge for fact-fact,
  * bucketed-equi-join rewrites for range/as-of instead of O(n²) loops. */
object Joins {
  import Det._

  /** Fact ⋈ three broadcast dims (supplier→nation→region), revenue rollup.
    * At any scale the dim side stays KB-sized → BroadcastHashJoinExec, no
    * shuffle of the fact table at all. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Fact ⋈ fact with SHUFFLE_HASH hint → ShuffledHashJoinExec (no sort). */
  def joinShuffleHash(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).hint("SHUFFLE_HASH")
    val ord = Tables.orders(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** MERGE hint → SortMergeJoinExec (the safe default for two big sides). */
  def joinSortMerge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).hint("MERGE")
    val pt = Tables.part(s, dir)
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  /** Non-equi theta join (only viable as nested-loop; sides kept small). */
  def joinThetaNl(s: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(s, dir)
    val nat = Tables.nation(s, dir)
    reg.join(nat, nat("n_regionkey") > reg("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("r_name"))
  }

  /** Range join (event pairs within 60s, same type). Implemented as a
    * bucketed EQUI-join — each right row is exploded into the two 60s
    * buckets it can match, the join is hash on (type, bucket), and the
    * range predicate is a residual filter. Shuffle-bound at any scale;
    * never a cartesian. */
  def joinRange(s: SparkSession, dir: String): DataFrame = {
    val bucketUs = 60000000L // 60s in µs
    val ev = Tables.events(s, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val left = ev.withColumn("bucket", floor(col("us") / bucketUs))
    val right = ev.select(col("event_type").as("event_type_r"), col("us").as("us2"))
      .withColumn("bucket",
        explode(array(floor(col("us2") / bucketUs), floor(col("us2") / bucketUs) - 1)))
    left.join(right,
        left("event_type") === right("event_type_r") && left("bucket") === right("bucket") &&
        col("us2") > col("us") && col("us2") <= col("us") + bucketUs)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"))
  }

  /** As-of join: for every event, the latest same-user purchase at or
    * before it. Implemented as a running window max over the time-sorted
    * union — one shuffle on the key, no point-in-time loop. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("last_purchase_us",
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))).over(w))
      .select(col("event_id"), col("user_id"), col("last_purchase_us"))
      .orderBy(col("event_id"))
  }

  /** As-of join with a staleness TOLERANCE — the feature-store contract:
    * each event sees its user's most recent prior purchase value, but only
    * if that purchase is at most 6 hours old; staler features surface as
    * NULL instead of silently serving ancient state. Same single-shuffle
    * union-window shape as `join_asof` (both inputs share the `user_id`
    * exchange; no range self-join), with the tolerance applied as a narrow
    * post-window predicate — at 100 TB the bound also CAPS state retention
    * in the streaming analog. */
  def joinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .withColumn("p_us",
        last(when(col("event_type") === "purchase", col("us")),
          ignoreNulls = true).over(w))
      .withColumn("p_val",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"),
        when(col("us") - col("p_us") <= tolUs, col("p_val"))
          .as("fresh_purchase_value"),
        when(col("us") - col("p_us") <= tolUs,
          col("us") - col("p_us")).as("age_us"))
      .orderBy(col("event_id"))
  }

  /** LEFT OUTER: every customer, order count possibly 0. */
  def joinLeft(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** RIGHT OUTER: mirror of `joinLeft` with the sides flipped — the fact
    * table on the left, every customer preserved from the RIGHT side.
    * Catalyst plans this as the same shuffled hash/sort-merge with build
    * sides swapped; the point of the key is the null-extension semantics
    * on the opposite side. */
  def joinRight(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    ord.join(cust, ord("o_custkey") === cust("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** FULL OUTER with unmatched rows possible on both sides. */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val custSmall = Tables.customer(s, dir)
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"))
    val bigOrders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
    custSmall.join(bigOrders, custSmall("c_custkey") === bigOrders("o_custkey"), "full")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("key"),
        col("c_custkey").isNotNull.as("in_left"),
        coalesce(col("n_big"), lit(0L)).as("n_big"))
      .orderBy(col("key"))
  }

  /** LEFT SEMI (EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** LEFT ANTI (NOT EXISTS). */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Cartesian product (bounded sides only). */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other — still an EQUI join for the planner (hash/sort-merge
    * capable, no nested loop), with null rows co-shuffled like any key. */
  def joinNullSafe(s: SparkSession, dir: String): DataFrame = {
    def side(lo: Int, hi: Int, out: String) = Tables.customer(s, dir)
      .filter(col("c_custkey") % 4 >= lo && col("c_custkey") % 4 < hi)
      .select(col("c_custkey").as(out),
        nullif(col("c_nationkey") % 5, lit(0)).as("k"))
    val a = side(0, 2, "a_key")
    val b = side(2, 4, "b_key")
    a.join(b, a("k") <=> b("k"))
      .groupBy(a("k").as("k"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("k").asc_nulls_first)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_null_safe" -> (joinNullSafe _),
    "join_broadcast" -> (joinBroadcast _),
    "join_shuffle_hash" -> (joinShuffleHash _),
    "join_sort_merge" -> (joinSortMerge _),
    "join_theta_nl" -> (joinThetaNl _),
    "join_range" -> (joinRange _),
    "join_asof" -> (joinAsof _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_left" -> (joinLeft _),
    "join_right" -> (joinRight _),
    "join_full" -> (joinFull _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_cross" -> (joinCross _)
  )

  val oracle: Map[String, String] = Map(
    "join_null_safe" ->
      """WITH a AS (
        |  SELECT c_custkey AS a_key, NULLIF(c_nationkey % 5, 0) AS k
        |  FROM customer WHERE c_custkey % 4 >= 0 AND c_custkey % 4 < 2),
        |b AS (
        |  SELECT c_custkey AS b_key, NULLIF(c_nationkey % 5, 0) AS k
        |  FROM customer WHERE c_custkey % 4 >= 2 AND c_custkey % 4 < 4)
        |SELECT a.k AS k, COUNT(*) AS n_pairs
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY a.k ORDER BY k NULLS FIRST""".stripMargin,
    "join_broadcast" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_items,
         |  ${sqlDsum("l_extendedprice")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_shuffle_hash" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_items,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_sort_merge" ->
      s"""SELECT p_brand, COUNT(*) AS n_items, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_theta_nl" ->
      """SELECT r_name, COUNT(*) AS n_pairs
        |FROM region JOIN nation ON n_regionkey > r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_range" ->
      """SELECT a.event_type, COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.event_type = b.event_type
        | AND epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin,
    "join_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, us, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN us END
        |      IGNORE NULLS) OVER win AS p_us,
        |    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
        |      IGNORE NULLS) OVER win AS p_val
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id,
        |  CASE WHEN us - p_us <= 21600000000 THEN p_val END
        |    AS fresh_purchase_value,
        |  CASE WHEN us - p_us <= 21600000000 THEN us - p_us END AS age_us
        |FROM w WHERE event_type <> 'purchase' ORDER BY event_id""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id,
        |  MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_us
        |FROM events ORDER BY event_id""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_right" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS key,
        |  c.c_custkey IS NOT NULL AS in_left,
        |  COALESCE(o.n_big, 0) AS n_big
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 100) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |           WHERE o_totalprice > 450000 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY key""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin
  )
}
