package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational wave: subqueries, pivot/unpivot, FILTER-clause
  * aggregates, min_by/max_by, ordered collect, sequence generation,
  * bitwise ops, deterministic hash sampling, distribution windows
  * (SURVEY.md §2B stretch surface). */
object Rel2 {
  import Det._

  /** Scalar subquery: orders above the global average price. */
  def subScalar(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgP = o.agg(davg(col("o_totalprice")).as("avg_price"))
    o.crossJoin(broadcast(avgP))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("o_orderstatus"))
  }

  /** IN subquery (decorrelated to a semi join). */
  def subIn(s: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 8000)
      .select(col("c_custkey"))
    val o = Tables.orders(s, dir)
    o.join(rich, o("o_custkey") === rich("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Correlated EXISTS with an extra correlated predicate. */
  /** Correlated LATERAL table subquery — top-2 lines by price PER order,
    * written the way an analyst writes it (`, LATERAL (… ORDER BY … LIMIT
    * 2)`). Catalyst decorrelates the per-row subquery into one
    * rank-over-partition pass on the join key: no per-outer-row re-scan
    * exists in the physical plan, so the shape is one shuffle of each
    * side, same as the hand-written window form — at 100 TB the
    * decorrelation IS the operator. */
  def joinLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).filter(col("o_orderkey") % 50 === 0)
      .createOrReplaceTempView("graft_lat_ord")
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_lat_li")
    s.sql(
      """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM graft_lat_ord o,
        |LATERAL (SELECT l_linenumber, l_extendedprice FROM graft_lat_li
        |         WHERE l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin)
  }

  /** EXISTS in the PROJECTION (not the filter) — Catalyst's ExistenceJoin:
    * the subquery becomes a boolean column via a semi-join variant that
    * marks instead of filters, one shuffle each side, never a row
    * multiplication. The third member of the semi/anti family. */
  def joinExistence(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_ex_cust")
    Tables.orders(s, dir).createOrReplaceTempView("graft_ex_ord")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  EXISTS (SELECT 1 FROM graft_ex_ord o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND year(o.o_orderdate) = 1997) AS bought_1997
        |FROM graft_ex_cust c ORDER BY c_custkey""".stripMargin)
  }

  def subCorrelated(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o97 = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1997)
    c.join(o97, c("c_custkey") === o97("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** PIVOT: linestatus values to columns. */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .na.fill(0.0)
      .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
      .orderBy(col("l_returnflag"))

  /** UNPIVOT/melt: wide metric columns back to rows. */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /** FILTER-clause aggregates (conditional aggregation). */
  def aggFilterClause(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_total"),
        count_if(col("o_totalprice") > 300000).as("n_big"),
        dfin(sum(when(col("o_orderpriority") === "1-URGENT", dec(col("o_totalprice")))))
          .as("urgent_price"))
      .orderBy(col("o_orderstatus"))

  /** min_by / max_by with a collision-free ordering value. */
  def aggMinmaxBy(s: SparkSession, dir: String): DataFrame = {
    // price*1e6 + orderkey is unique (orderkey unique) → ties impossible
    val ord = col("o_totalprice") * 1000000d + col("o_orderkey").cast("double")
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), ord).as("priciest_order"),
        min_by(col("o_orderkey"), ord).as("cheapest_order"))
      .orderBy(col("o_orderstatus"))
  }

  /** Ordered collect: per-status sorted key list (bounded groups only —
    * collect is the one op here that must NOT run on unbounded groups). */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000)
      .groupBy(col("o_orderstatus"))
      .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("keys_csv"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Sequence generation + explode (generator expressions). */
  def fnSequence(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir)
      .select(col("r_regionkey"),
        explode(sequence(lit(1), col("r_regionkey") + 1)).as("step"))
      .orderBy(col("r_regionkey"), col("step"))

  /** Bitwise operator family. */
  def fnBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(255)).as("and8"),
        (col("l_orderkey").bitwiseOR(16)).as("or16"),
        (col("l_orderkey").bitwiseXOR(col("l_linenumber"))).as("xorln"),
        shiftleft(col("l_linenumber"), 3).as("shl3"),
        bit_count(col("l_orderkey")).as("popcnt"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Deterministic hash sampling (md5 prefix) — the engine-neutral,
    * reproducible alternative to TABLESAMPLE for pipeline subsetting. */
  def sampleHash(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "14")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  /** Deterministic per-group k-sample — the reproducible, engine-neutral
    * reservoir: the k events with the smallest md5(event_id) per type ARE a
    * uniform k-without-replacement draw (a random hash order is a random
    * permutation). The hash-prefix pre-filter (< '40', keeps ~25%) discards
    * the bulk of each group BEFORE the rank window — answer-preserving
    * exactly while ≥k rows per group survive (rows below the prefix bound
    * are the smallest hashes). The filter is ADAPTIVE per group: a
    * group-cardinality-sized survivor count decides, per event_type,
    * whether to window the filtered quarter or fall back to the group's
    * full rows — so a rare group can never silently return a short,
    * non-reservoir sample (ADVICE r10; at sf0.001 `view` has only 48
    * survivors and takes the fallback). At 100 TB: narrow filter + tiny
    * broadcast of the qualifying group list, then a top-k window over the
    * surviving quarter; tighten the prefix toward k/|group| to make the
    * window input arbitrarily small. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame = {
    val hk = md5(col("event_id").cast("string"))
    val pref = substring(col("hk"), 1, 2) < "40"
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("user_id"),
        hk.as("hk"))
    val okTypes = ev.filter(pref).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_surv")).filter(col("n_surv") >= 50)
      .select(col("event_type"), lit(1).as("ok"))
    val inp = ev.join(broadcast(okTypes), Seq("event_type"), "left")
      .filter(col("ok").isNull || pref)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("hk"), col("event_id"))
    inp.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .select(col("event_type"), col("rk"), col("event_id"), col("user_id"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** Distribution window functions: percent_rank / cume_dist / ntile. */
  def winDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sub_scalar" -> (subScalar _),
    "sub_in" -> (subIn _),
    "sub_correlated" -> (subCorrelated _),
    "join_lateral" -> (joinLateral _),
    "join_existence" -> (joinExistence _),
    "pivot_status" -> (pivotStatus _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "agg_filter_clause" -> (aggFilterClause _),
    "agg_minmax_by" -> (aggMinmaxBy _),
    "agg_collect" -> (aggCollect _),
    "fn_sequence" -> (fnSequence _),
    "fn_bitwise" -> (fnBitwise _),
    "sample_hash" -> (sampleHash _),
    "sample_reservoir" -> (sampleReservoir _),
    "win_distribution" -> (winDistribution _)
  )

  val oracle: Map[String, String] = Map(
    "sub_scalar" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_above FROM orders
         |WHERE o_totalprice > (SELECT ${sqlDavg("o_totalprice")} FROM orders)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sub_in" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sub_correlated" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND year(o_orderdate) = 1997)
        |ORDER BY c_custkey""".stripMargin,
    "join_existence" ->
      """SELECT c_custkey, c_mktsegment,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND year(o.o_orderdate) = 1997) AS bought_1997
        |FROM customer c ORDER BY c_custkey""".stripMargin,
    "join_lateral" ->
      """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM (SELECT * FROM orders WHERE o_orderkey % 50 = 0) o,
        |LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem
        |         WHERE l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin,
    "pivot_status" ->
      s"""SELECT l_returnflag,
         |  COALESCE(${sqlDfin("SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END)")}, 0) AS qty_f,
         |  COALESCE(${sqlDfin("SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END)")}, 0) AS qty_o
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "unpivot_metrics" ->
      s"""WITH wide AS (
         |  SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_qty,
         |    ${sqlDsum("l_extendedprice")} AS sum_price
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
         |ORDER BY l_returnflag, metric""".stripMargin,
    "agg_filter_clause" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_total,
         |  COUNT(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
         |  ${sqlDfin("SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderpriority = '1-URGENT')")} AS urgent_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_minmax_by" ->
      """SELECT o_orderstatus,
        |  arg_max(o_orderkey, o_totalprice * 1000000 + CAST(o_orderkey AS DOUBLE)) AS priciest_order,
        |  arg_min(o_orderkey, o_totalprice * 1000000 + CAST(o_orderkey AS DOUBLE)) AS cheapest_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_collect" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS keys_csv,
        |  COUNT(*) AS n
        |FROM orders WHERE o_totalprice > 450000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "fn_sequence" ->
      """SELECT r_regionkey, unnest(generate_series(1, r_regionkey + 1)) AS step
        |FROM region ORDER BY r_regionkey, step""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS and8,
        |  l_orderkey | 16 AS or16,
        |  xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS xorln,
        |  CAST(l_linenumber AS INTEGER) << 3 AS shl3,
        |  CAST(bit_count(l_orderkey) AS INTEGER) AS popcnt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "sample_hash" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '14'
        |ORDER BY o_orderkey""".stripMargin,
    "sample_reservoir" ->
      """WITH h AS (
        |  SELECT event_type, event_id, user_id,
        |    md5(CAST(event_id AS VARCHAR)) AS hk
        |  FROM events),
        |surv AS (
        |  SELECT event_type, count(*) AS n_surv FROM h
        |  WHERE substring(hk, 1, 2) < '40' GROUP BY event_type),
        |inp AS (
        |  SELECT h.* FROM h LEFT JOIN surv USING (event_type)
        |  WHERE substring(h.hk, 1, 2) < '40'
        |     OR coalesce(surv.n_surv, 0) < 50),
        |r AS (
        |  SELECT event_type, event_id, user_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hk, event_id)
        |      AS rk
        |  FROM inp)
        |SELECT event_type, rk, event_id, user_id FROM r WHERE rk <= 50
        |ORDER BY event_type, rk""".stripMargin,
    "win_distribution" ->
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
