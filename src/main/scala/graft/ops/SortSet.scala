package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / set-operation surface (SURVEY.md §2B). Global sort uses
  * range partitioning (sampled bounds) — scales to any size; ORDER BY +
  * LIMIT k compiles to TakeOrderedAndProjectExec, a per-partition top-k +
  * driver merge with no global sort at all. */
object SortSet {

  def sortOrderby(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  def limitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  def setUnionAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
      .unionAll(o.filter(col("o_totalprice") > 300000).select(col("o_orderpriority")))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  def setUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      .union(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  def setExcept(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"))
    val p = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
      .select(col("o_custkey"))
    c.except(p).orderBy(col("o_custkey"))
  }

  /** BAG-semantics set ops (`INTERSECT ALL` / `EXCEPT ALL`): multiplicity
    * matters — a customer with 3 F-orders and 2 O-orders intersects twice
    * and excepts once. Planned as count-compare aggregations, one shuffle
    * per side; the summary collapses each result to (custkey, multiplicity)
    * so the oracle hashes exact duplicate counts, not just membership. */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val oo = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val inter = f.intersectAll(oo)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val exc = f.exceptAll(oo)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    inter.unionByName(exc)
      .select(col("op"), col("o_custkey"), col("n"))
      .orderBy(col("op"), col("o_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_orderby" -> (sortOrderby _),
    "limit_topk" -> (limitTopk _),
    "set_union_all" -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_ops_all" -> (setOpsAll _)
  )

  val oracle: Map[String, String] = Map(
    "sort_orderby" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "set_union_all" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS o_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "set_ops_all" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |i AS (SELECT o_custkey FROM f INTERSECT ALL SELECT o_custkey FROM o),
        |e AS (SELECT o_custkey FROM f EXCEPT ALL SELECT o_custkey FROM o)
        |SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n FROM i GROUP BY 2
        |UNION ALL
        |SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n FROM e GROUP BY 2
        |ORDER BY op, o_custkey""".stripMargin
  )
}
