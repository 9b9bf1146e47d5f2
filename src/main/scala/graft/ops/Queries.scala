package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite analytic queries — full TPC-H-shaped plans (the workload an
  * Athena user runs through the reference connector, reference
  * README.md:37-38) adapted to the fixture's columns. Each stresses a
  * different optimizer decision chain end to end: multi-way join ordering
  * with broadcast dims (Q5), outer-join aggregation (Q13), conditional
  * aggregation over a broadcast join (Q14), a decorrelated per-key average
  * subquery (Q17), having-filtered semi-join back-joins (Q18), and anti-join
  * + scalar subquery (Q22). `agg_hash` (Agg.scala) is the Q1 shape and
  * `SparkEntry.entry` the Q3 shape. All money math uses the exact-decimal
  * determinism helpers (Det.scala) so results hash-match DuckDB bit-for-bit.
  */
object Queries {
  import Det._

  private val one = lit(1).cast(DecimalType(18, 6))

  /** Q5 — local supplier volume: six-way join where the customer's and the
    * supplier's nation must match. Nation and region are broadcast; the
    * orders date filter prunes before the fact-fact shuffle. */
  def volumeAsia(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey")
        && cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dfin(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))))
        .as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Q13 — customer order distribution: outer join so zero-order customers
    * survive, then a distribution over the per-customer counts. */
  def custDist(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(cust("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("c_count").desc)
  }

  /** Q14 — promo revenue share: conditional aggregation over a broadcast
    * part join; the ratio is computed from two exact decimal sums so the
    * final double is deterministic. */
  def promoShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
    val part = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    val disc = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        (lit(100.0)
          * dfin(sum(when(col("p_type") === "PROMO", disc).otherwise(dec(lit(0)))))
          / dfin(sum(disc))).as("promo_revenue"))
  }

  /** Q17 — small-quantity-order revenue: the correlated per-part average
    * subquery decorrelated into one aggregation over the brand-restricted
    * lineitem subset (semantically identical: the average only ever feeds
    * rows of the same part). Parts are broadcast; lineitem shuffles once on
    * `l_partkey` and the aggregate side reuses that exchange. */
  def smallQtyRev(s: SparkSession, dir: String): DataFrame = {
    val partSel = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val liB = Tables.lineitem(s, dir)
      .join(broadcast(partSel), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQ = liB.groupBy(col("l_partkey")).agg(davg(col("l_quantity")).as("avg_qty"))
    liB.join(avgQ, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** Q18 — large-volume customers: HAVING on an exact quantity sum selects
    * the big orders, which then join back to orders and customer. The big
    * set is tiny after the filter, so both back-joins broadcast under AQE. */
  def topCustomers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q22 shape — sales opportunity: customers with above-average positive
    * balance and no recent orders (the fixture has no order-less customers,
    * so "dormant since 2001" replaces the original's no-orders-at-all
    * predicate). Scalar subquery broadcast + anti join on the distinct
    * recent-customer set. */
  def salesOpp(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgPos = cust.filter(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .select(col("o_custkey")).distinct()
    cust.crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Q10 — returned-item revenue: which customers returned the most money
    * in a quarter. Fact-fact shuffle between the returnflag-filtered
    * lineitem and the date-filtered orders, customer joined after the
    * reduction, nation broadcast, top-20 via TakeOrderedAndProject. */
  def returnedRev(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-07-01") && col("o_orderdate") < lit("1997-10-01"))
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val nat = Tables.nation(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dfin(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q4 — order priority checking: orders in a quarter having at least one
    * line shipped after the order date, counted by priority. The EXISTS is
    * a left-semi join with a non-equi residual — one shuffle each side,
    * never a row multiplication. */
  def priorityCount(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))
    val li = Tables.lineitem(s, dir)
    ord.join(li, ord("o_orderkey") === li("l_orderkey")
        && li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q19 — discounted revenue under disjunctive brand/size/quantity terms:
    * Catalyst splits the mixed condition into the `l_partkey = p_partkey`
    * equi key (broadcast hash join) plus the OR-of-ANDs residual, and pushes
    * the derivable `p_brand IN (...)` / quantity bounds to both scans. */
  def disjunctRev(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val part = Tables.part(s, dir)
    val cond = li("l_partkey") === part("p_partkey") && (
      (part("p_brand") === "Brand#12" && part("p_size").between(1, 15)
        && li("l_quantity").between(1, 11)) ||
      (part("p_brand") === "Brand#23" && part("p_size").between(16, 30)
        && li("l_quantity").between(10, 20)) ||
      (part("p_brand") === "Brand#3" && part("p_size").between(31, 50)
        && li("l_quantity").between(20, 30)))
    li.join(broadcast(part), cond)
      .agg(dfin(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))))
        .as("revenue"))
  }

  /** Q15 — top supplier by quarterly revenue: the revenue CTE is computed
    * once, its max arrives as a broadcast scalar, and the winning row(s)
    * join back to supplier. Exact-decimal totals make the double equality
    * against the max deterministic on both engines. */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice")).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    Tables.supplier(s, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Q7 — volume shipping between two nations, both directions: the
    * OR-of-pairs condition survives as a residual on top of the two
    * broadcast nation joins; years come out of the shipdate. */
  def nationVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), cust("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dfin(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))))
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 — national market share: of the PROMO-part revenue bought by ASIA
    * customers, the share supplied by NATION_2, per year — two exact sums
    * per group, one deterministic double division. */
  def mktShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val cust = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val part = Tables.part(s, dir).filter(col("p_type") === "PROMO")
    val natC = Tables.nation(s, dir).select(
      col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_region"))
    val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val natS = Tables.nation(s, dir).select(
      col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
    val vol = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(natC), cust("c_nationkey") === col("nc_key"))
      .join(broadcast(reg), col("nc_region") === reg("r_regionkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(natS), sup("s_nationkey") === col("ns_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((dfin(sum(when(col("supp_nation") === "NATION_2", vol).otherwise(dec(lit(0)))))
        / dfin(sum(vol))).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9 — product profit by supplier nation and year (supply cost adapted
    * to `p_retailprice * quantity`; the fixture has no partsupp): every
    * term stays exact decimal until the final double. */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val part = Tables.part(s, dir).filter(col("p_name").contains("rod"))
    val sup = Tables.supplier(s, dir)
    val ord = Tables.orders(s, dir)
    val nat = Tables.nation(s, dir)
    val profit = dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) -
      dec(col("p_retailprice")) * dec(col("l_quantity"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dfin(sum(profit)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 — important supply value (partsupp-less adaptation): per-(nation,
    * part) revenue, kept when above a fraction of the GLOBAL total — the
    * scalar subquery lands as one broadcast row against the grouped set,
    * which reuses the same shuffle. */
  def stockValue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val joined = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .filter(col("n_name").isin("NATION_3", "NATION_4"))
    // ONE pass over the join: the global total is the exact-decimal sum of
    // the per-part partials (associativity of exact decimal), so the big
    // join never runs twice — only the reduced per-part frame re-aggregates
    val byPartDec = joined.groupBy(col("n_name"), col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("vdec"))
    val byPart = byPartDec.select(col("n_name"), col("l_partkey"), dfin(col("vdec")).as("value"))
    val total = byPartDec.agg(dfin(sum(col("vdec"))).as("total_value"))
    byPart.crossJoin(broadcast(total))
      .filter(col("value") > col("total_value") * lit(0.001))
      .select(col("n_name"), col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("n_name"), col("l_partkey"))
  }

  /** Q16 — supplier count per part shape: distinct suppliers that ever
    * shipped qualifying parts, minus the "complaint" suppliers (low
    * balance, anti join), counted per (brand, type, size). */
  def partSuppliers(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
      .filter(col("p_type") =!= "PROMO" && col("p_size").isin(1, 9, 19, 29, 39, 49))
    val bad = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 1000).select(col("s_suppkey"))
    val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(bad), li("l_suppkey") === bad("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q2 — minimum-cost supplier (adapted: cost = the supplier's exact
    * revenue total for the part; no partsupp in the fixture): the
    * correlated MIN decorrelates into a window rank over the per-(part,
    * supplier) aggregate, deterministic tie-break on suppkey. */
  def minCostSupp(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Tables.part(s, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") === 15)
      .select(col("p_partkey"), col("p_name"))
    val li = Tables.lineitem(s, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val perSupp = li.groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(dsum(col("l_extendedprice")).as("supp_cost"))
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("supp_cost").asc, col("l_suppkey").asc)
    val cheapest = perSupp.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    cheapest.join(sup, col("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("supp_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(20)
  }

  /** Q21 — suppliers who kept orders waiting (adapted: "late" = shipped
    * more than 90 days after the order date; the fixture has no receipt/
    * commit dates): multi-supplier orders where EXACTLY ONE supplier was
    * late. The exists / not-exists pair becomes two per-order aggregates
    * on the shared (order, supplier) rollup — one shuffle, no row blowup. */
  def lateSuppliers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val perSupp = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .cast("int")).as("was_late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("was_late")).as("n_late"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    perSupp.filter(col("was_late") === 1)
      .join(perOrder, "l_orderkey")
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q6 — forecasting revenue change: one scan, every predicate pushed to
    * parquet (PlanSpec-style PushedFilters discipline), one exact sum. */
  def forecastRev(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dfin(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"))

  /** Q12 — shipping-priority counts (adapted: the fixture has no shipmode
    * or receiptdate, so "late" = shipped >60 days after ordering, grouped
    * by linestatus): the fact-fact join reduces to per-group conditional
    * counts in one exchange. */
  def shipPriority(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"))
          .as("high_line_count"),
        sum((!col("o_orderpriority").isin("1-URGENT", "2-HIGH")).cast("long"))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "query_forecast_rev" -> (forecastRev _),
    "query_ship_priority" -> (shipPriority _),
    "query_nation_volume" -> (nationVolume _),
    "query_mkt_share" -> (mktShare _),
    "query_product_profit" -> (productProfit _),
    "query_stock_value" -> (stockValue _),
    "query_part_suppliers" -> (partSuppliers _),
    "query_min_cost_supp" -> (minCostSupp _),
    "query_late_suppliers" -> (lateSuppliers _),
    "query_volume_asia" -> (volumeAsia _),
    "query_cust_dist" -> (custDist _),
    "query_promo_share" -> (promoShare _),
    "query_small_qty_rev" -> (smallQtyRev _),
    "query_top_customers" -> (topCustomers _),
    "query_sales_opp" -> (salesOpp _),
    "query_returned_rev" -> (returnedRev _),
    "query_priority_count" -> (priorityCount _),
    "query_disjunct_rev" -> (disjunctRev _),
    "query_top_supplier" -> (topSupplier _)
  )

  private val discSql = s"${sqlDec("l_extendedprice")} * (${sqlDec("1")} - ${sqlDec("l_discount")})"

  val oracle: Map[String, String] = Map(
    "query_forecast_rev" ->
      s"""SELECT ${sqlDfin(s"SUM(${sqlDec("l_extendedprice")} * ${sqlDec("l_discount")})")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "query_ship_priority" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    "query_nation_volume" ->
      s"""SELECT supp_nation, cust_nation, l_year, revenue FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |    ${sqlDfin(s"SUM($discSql)")} AS revenue
         |  FROM lineitem, orders, customer, supplier, nation n1, nation n2
         |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND l_suppkey = s_suppkey
         |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY 1, 2, 3)
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "query_mkt_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlDfin(s"SUM(CASE WHEN ns.n_name = 'NATION_2' THEN $discSql ELSE ${sqlDec("0")} END)")}
         |    / ${sqlDfin(s"SUM($discSql)")} AS mkt_share
         |FROM lineitem, part, orders, customer, supplier,
         |  nation nc, region, nation ns
         |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
         |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_nationkey = nc.n_nationkey AND nc.n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND l_suppkey = s_suppkey AND s_nationkey = ns.n_nationkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "query_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlDfin(s"SUM($discSql - ${sqlDec("p_retailprice")} * ${sqlDec("l_quantity")})")} AS sum_profit
         |FROM lineitem, part, supplier, orders, nation
         |WHERE l_partkey = p_partkey AND p_name LIKE '%rod%'
         |  AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
         |  AND s_nationkey = n_nationkey
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "query_stock_value" ->
      s"""WITH j AS (
         |  SELECT n_name, l_partkey, l_extendedprice
         |  FROM lineitem, supplier, nation
         |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name IN ('NATION_3', 'NATION_4')
         |), byp AS (
         |  SELECT n_name, l_partkey, ${sqlDsum("l_extendedprice")} AS value
         |  FROM j GROUP BY 1, 2
         |), tot AS (SELECT ${sqlDsum("l_extendedprice")} AS total_value FROM j)
         |SELECT n_name, l_partkey, value FROM byp, tot
         |WHERE value > total_value * 0.001
         |ORDER BY value DESC, n_name, l_partkey""".stripMargin,
    "query_part_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_size IN (1, 9, 19, 29, 39, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "query_min_cost_supp" ->
      s"""WITH per_supp AS (
         |  SELECT p_partkey, p_name, l_suppkey,
         |    ${sqlDsum("l_extendedprice")} AS supp_cost
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_type = 'STANDARD' AND p_size = 15
         |  GROUP BY 1, 2, 3
         |), cheapest AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY p_partkey
         |      ORDER BY supp_cost ASC, l_suppkey ASC) AS rn FROM per_supp)
         |  WHERE rn = 1)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supp_cost
         |FROM cheapest JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 20""".stripMargin,
    "query_late_suppliers" ->
      """WITH per_supp AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN 1 ELSE 0 END) AS was_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2
        |), per_order AS (
        |  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(was_late) AS n_late
        |  FROM per_supp GROUP BY 1
        |  HAVING COUNT(*) > 1 AND SUM(was_late) = 1)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM per_supp JOIN per_order USING (l_orderkey)
        |  JOIN supplier ON l_suppkey = s_suppkey
        |WHERE was_late = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "query_volume_asia" ->
      s"""SELECT n_name, ${sqlDfin(s"SUM($discSql)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "query_cust_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY c_count DESC""".stripMargin,
    "query_promo_share" ->
      s"""SELECT 100.0
         |  * ${sqlDfin(s"SUM(CASE WHEN p_type = 'PROMO' THEN $discSql ELSE ${sqlDec("0")} END)")}
         |  / ${sqlDfin(s"SUM($discSql)")} AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "query_small_qty_rev" ->
      s"""WITH lb AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#23'),
         |av AS (
         |  SELECT l_partkey, ${sqlDavg("l_quantity")} AS avg_qty
         |  FROM lb GROUP BY l_partkey)
         |SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lb JOIN av USING (l_partkey)
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "query_top_customers" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${sqlDsum("l_quantity")} > 300)
         |SELECT c_name, c_custkey, o_orderkey,
         |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
         |  o_totalprice, sum_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "query_sales_opp" ->
      s"""WITH a AS (
         |  SELECT ${sqlDavg("c_acctbal")} AS avg_bal FROM customer WHERE c_acctbal > 0),
         |r AS (
         |  SELECT DISTINCT o_custkey FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
         |SELECT c_nationkey, COUNT(*) AS numcust, ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer, a
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM r WHERE o_custkey = c_custkey)
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "query_returned_rev" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlDfin(s"SUM($discSql)")} AS revenue
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "query_priority_count" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "query_disjunct_rev" ->
      s"""SELECT ${sqlDfin(s"SUM($discSql)")} AS revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey AND (
         |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |      AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
         |      AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
         |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "query_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${sqlDsum("l_extendedprice")} AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey),
         |mx AS (SELECT MAX(total_rev) AS max_rev FROM rev)
         |SELECT s_suppkey, s_name, total_rev
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey, mx
         |WHERE total_rev = max_rev ORDER BY s_suppkey""".stripMargin
  )
}
