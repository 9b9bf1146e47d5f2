package graft.ops

import graft.{Det, Tables}
import graft.catalog.PathCatalog
import graft.delta.{DeltaSnapshotReader, DeltaWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File

/** Scan / projection / filter / sink / catalog surface (SURVEY.md §2B
  * "Scans / sources / sinks", "Projection / filter"; reference A1-A3, A8,
  * A9, A11). All plain `spark.read.parquet` leaves — Catalyst pushes the
  * filters and the projections into the vectorized reader, which the
  * reference explicitly cannot do (README.md:66 "No predicate pushdown"). */
object Scan {
  import Det._

  /** Leaf parquet scan (reference A8). */
  def scanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Column projection (reference A9) — pruned down to 3 columns in the
    * parquet reader itself (ReadSchema in the plan). */
  def projectSelect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** Predicate on data columns, pushed to parquet row groups (A6/A11). */
  def filterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01") && col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** AND/OR/NOT, IN-list, BETWEEN, LIKE, IS NULL. */
  def filterComplex(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(
        (col("o_orderstatus") === "F" || col("o_totalprice").between(10000, 50000)) &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM") &&
        !col("o_orderpriority").like("%MEDIUM%") &&
        nullif(col("o_orderstatus"), lit("P")).isNotNull)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** Parquet sink: write an aggregate, read it back (Athena CTAS analog). */
  def sinkParquet(s: SparkSession, dir: String): DataFrame = {
    val out = new File(sys.props("java.io.tmpdir"),
      "graft_sink_parquet_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val agg = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    agg.write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy(col("l_returnflag"))
  }

  /** Delta sink: write an aggregate as a Delta commit, read it back through
    * the from-scratch log reader. */
  def sinkDelta(s: SparkSession, dir: String): DataFrame = {
    val out = new File(sys.props("java.io.tmpdir"),
      "graft_sink_delta_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val agg = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    DeltaWriter.write(agg, out, mode = "overwrite")
    DeltaSnapshotReader.load(s, out).orderBy(col("o_orderstatus"))
  }

  /** Catalog discovery from storage layout (reference A1/A2). */
  def catalogListTables(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    new PathCatalog(s, dir).listTables()
      .toDF("table_name", "format").orderBy(col("table_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet" -> (scanParquet _),
    "project_select" -> (projectSelect _),
    "filter_pushdown" -> (filterPushdown _),
    "filter_complex" -> (filterComplex _),
    "sink_parquet" -> (sinkParquet _),
    "sink_delta" -> (sinkDelta _),
    "catalog_list_tables" -> (catalogListTables _)
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "project_select" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey",
    "filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_complex" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderstatus = 'F' OR o_totalprice BETWEEN 10000 AND 50000)
        |  AND o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
        |  AND NOT (o_orderpriority LIKE '%MEDIUM%')
        |  AND NULLIF(o_orderstatus, 'P') IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "sink_parquet" ->
      s"""SELECT l_returnflag, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sink_delta" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "catalog_list_tables" ->
      """SELECT * FROM (VALUES
        |  ('customer','parquet'),('documents','parquet'),('embeddings','parquet'),
        |  ('events','parquet'),('lineitem','parquet'),('nation','parquet'),
        |  ('orders','parquet'),('part','parquet'),('region','parquet'),
        |  ('supplier','parquet')) t(table_name, format)
        |ORDER BY table_name""".stripMargin
  )
}
