package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics locks for the composite TPC-H-shaped queries on sf0.001; the
  * driver's DuckDB hash check covers sf0.01. Each test pins a property a
  * wrong join/aggregation would break, plus one plan-shape lock for the
  * broadcast decisions the scale story depends on. */
class QueriesSpec extends SparkSpec {

  test("query_volume_asia: only ASIA nations appear; revenue positive") {
    val rows = Queries.volumeAsia(spark, sf).collect()
    val asiaNations = Tables.nation(spark, sf).as("n")
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA").as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .select(col("n_name")).collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("n_name")).toSet.subsetOf(asiaNations))
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("query_cust_dist: customer counts sum back to the customer total") {
    val rows = Queries.custDist(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("custdist")).sum
    assert(total == Tables.customer(spark, sf).count())
  }

  test("query_promo_share: share strictly between 0 and 100") {
    val v = Queries.promoShare(spark, sf).collect().head.getAs[Double]("promo_revenue")
    assert(v > 0 && v < 100)
  }

  test("query_small_qty_rev: matches the correlated-subquery form") {
    val fast = Queries.smallQtyRev(spark, sf).collect().head.getAs[Double]("avg_yearly")
    // literal correlated form via SQL on registered views
    Tables.lineitem(spark, sf).createOrReplaceTempView("li_q17")
    Tables.part(spark, sf).createOrReplaceTempView("p_q17")
    val slow = spark.sql(
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM li_q17, p_q17
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < 0.2 * (
        |    SELECT CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE)
        |           / CAST(COUNT(l2.l_quantity) AS DOUBLE)
        |    FROM li_q17 l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
      .collect().head.getAs[Double]("avg_yearly")
    assert(fast == slow)
  }

  test("query_top_customers: every row's order really sums above threshold") {
    val rows = Queries.topCustomers(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("sum_qty") > 300))
    // o_totalprice descending with orderkey tiebreak
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("query_sales_opp: no selected customer has a recent order") {
    val n = Queries.salesOpp(spark, sf).collect().map(_.getAs[Long]("numcust")).sum
    val cust = Tables.customer(spark, sf)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal"))).collect().head.getDouble(0)
    val expect = cust.filter(col("c_acctbal") > avgBal)
      .join(Tables.orders(spark, sf).filter(col("o_orderdate") >= lit("2001-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    // avg computed two ways can differ only below filter resolution; counts match
    assert(n == expect)
  }

  test("query_returned_rev: only R-flagged lines feed revenue; order respected") {
    val rows = Queries.returnedRev(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
    // revenue recomputed independently for the top row
    val top = rows.head
    val expect = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit("1997-07-01") && col("o_orderdate") < lit("1997-10-01")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") === top.getAs[Long]("c_custkey"))
      .agg(graft.Det.dfin(sum(graft.Det.dec(col("l_extendedprice"))
        * (lit(1).cast("decimal(18,6)") - graft.Det.dec(col("l_discount"))))))
      .collect().head.getDouble(0)
    assert(top.getAs[Double]("revenue") == expect)
  }

  test("query_priority_count: matches the EXISTS count and never multiplies rows") {
    val rows = Queries.priorityCount(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("order_count")).sum
    val ord = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))
    val expect = ord.join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .select(col("o_orderkey")).distinct().count()
    assert(total == expect)
  }

  test("query_disjunct_rev: equals the three single-branch sums combined") {
    val li = Tables.lineitem(spark, sf)
    val part = Tables.part(spark, sf)
    def branch(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int): Double = {
      val j = li.join(part, li("l_partkey") === part("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(szLo, szHi)
          && col("l_quantity").between(qLo, qHi))
      j.agg(coalesce(sum(graft.Det.dec(col("l_extendedprice"))
          * (lit(1).cast("decimal(18,6)") - graft.Det.dec(col("l_discount")))),
        lit(0).cast("decimal(38,6)"))).collect().head.getDecimal(0).doubleValue()
    }
    val parts = branch("Brand#12", 1, 15, 1, 11) + branch("Brand#23", 16, 30, 10, 20) +
      branch("Brand#3", 31, 50, 20, 30)
    val got = Queries.disjunctRev(spark, sf).collect().head.getAs[Double]("revenue")
    assert(math.abs(got - parts) < 1e-6)
  }

  test("query_top_supplier: returns exactly the max-revenue supplier(s)") {
    val rows = Queries.topSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey")).agg(graft.Det.dsum(col("l_extendedprice")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = revs.values.max
    val winners = revs.filter(_._2 == mx).keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == winners)
    assert(rows.forall(_.getAs[Double]("total_rev") == mx))
  }

  test("plan locks: Q5 broadcasts nation+region; Q14 broadcasts part") {
    val q5 = Queries.volumeAsia(spark, sf).queryExecution.executedPlan.toString
    assert(q5.contains("BroadcastHashJoin"))
    val q14 = Queries.promoShare(spark, sf).queryExecution.executedPlan.toString
    assert(q14.contains("BroadcastHashJoin"))
  }

  test("query_nation_volume: only the two nations, always as a cross pair") {
    val rows = Queries.nationVolume(spark, sf).collect()
    // sf0.001 can legitimately yield zero pairs; the shape still holds
    rows.foreach { r =>
      val s = r.getAs[String]("supp_nation"); val c = r.getAs[String]("cust_nation")
      assert(Set(s, c) == Set("NATION_1", "NATION_2"), s"$s/$c")
      assert(Seq(1996L, 1997L).contains(r.getAs[Long]("l_year")))
    }
  }

  test("query_mkt_share: share within [0,1], one row per year") {
    val rows = Queries.mktShare(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("o_year")).distinct.length == rows.length)
    assert(rows.forall { r =>
      val v = r.getAs[Double]("mkt_share"); v >= 0.0 && v <= 1.0
    })
  }

  test("query_product_profit: groups only from rod parts; year desc in nation") {
    val rows = Queries.productProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("nation")).foreach { case (_, rs) =>
      val ys = rs.map(_.getAs[Long]("o_year"))
      assert(ys.sameElements(ys.sortBy(-_)))
    }
  }

  test("query_stock_value: every kept part clears the global threshold") {
    val rows = Queries.stockValue(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_3", "NATION_4"))
      .agg(graft.Det.dsum(col("l_extendedprice"))).collect().head.getDouble(0)
    assert(rows.forall(_.getAs[Double]("value") > total * 0.001))
  }

  test("query_part_suppliers: no low-balance supplier contributes") {
    val rows = Queries.partSuppliers(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("supplier_cnt") > 0))
    // independent recompute for the top group
    val top = rows.head
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === top.getAs[String]("p_brand") &&
        col("p_type") === top.getAs[String]("p_type") &&
        col("p_size") === top.getAs[Int]("p_size"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_acctbal") >= 1000)
      .select(col("l_suppkey")).distinct().count()
    assert(top.getAs[Long]("supplier_cnt") == expect)
  }

  test("query_min_cost_supp: winner really is the cheapest for its part") {
    val rows = Queries.minCostSupp(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val top = rows.head
    val costs = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(
        col("p_type") === "STANDARD" && col("p_size") === 15),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_partkey") === top.getAs[Long]("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(graft.Det.dsum(col("l_extendedprice")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.getAs[Double]("supp_cost") == costs.map(_._2).min)
  }

  test("query_late_suppliers: every reported supplier was the sole late one") {
    val rows = Queries.lateSuppliers(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("numwait") > 0))
    val counts = rows.map(_.getAs[Long]("numwait"))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("plan locks: Q7/Q8 broadcast every dim; Q2 decorrelates to one window") {
    val q7 = Queries.nationVolume(spark, sf).queryExecution.executedPlan.toString
    assert(q7.contains("BroadcastHashJoin"))
    assert(!q7.contains("BroadcastNestedLoopJoin"), "OR-pair residual must ride the hash join")
    val q2 = Queries.minCostSupp(spark, sf).queryExecution.executedPlan.toString
    assert(q2.contains("Window"))
    assert(!q2.contains("CartesianProduct"))
  }

  test("plan locks: Q10 takes top-20 without a global sort; Q19 keeps the equi key") {
    val q10 = Queries.returnedRev(spark, sf).queryExecution.executedPlan.toString
    assert(q10.contains("TakeOrderedAndProject"))
    // Q19's mixed condition must plan as a hash join on l_partkey = p_partkey
    // with the OR-of-ANDs as residual — a nested-loop here would be the
    // O(n·m) plan that dies at scale.
    val q19 = Queries.disjunctRev(spark, sf).queryExecution.executedPlan.toString
    assert(q19.contains("BroadcastHashJoin"))
    assert(!q19.contains("BroadcastNestedLoopJoin"))
  }
}
