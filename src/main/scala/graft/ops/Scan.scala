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

  /** Marker-cached staging for derived source-format fixtures (CSV/JSON
    * copies of the parquet tables): built once per (tag, sfDir) per
    * machine, so bench reps and driver rounds time the SCAN, not the
    * staging write. Version-suffix the tag when a recipe changes. The
    * marker is STALENESS-CHECKED against the source table's mtime — a
    * regenerated /root/testdata (it has drifted before, FIXTURES.md) must
    * rebuild the staged copy, or Spark would aggregate old data against
    * an oracle reading the new parquet. */
  private def staged(dir: String, tag: String, srcTable: String)
                    (build: File => Unit): File =
    synchronized {
      val d = new File(sys.props("java.io.tmpdir"),
        s"graft_src_${tag}_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
      val marker = new File(d, "_SRC_READY")
      // staleness defence: see [[graft.StageMarker]]
      val sig = graft.StageMarker.sig(new File(dir, s"$srcTable.parquet"))
      if (!graft.StageMarker.fresh(marker, sig)) {
        if (d.exists()) {
          def rm(f: File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(d)
        }
        build(d)
        graft.StageMarker.write(marker, sig)
      }
      d
    }

  /** CSV source: a header CSV copy of `events` read back with an EXPLICIT
    * schema and FAILFAST parsing — the schema-on-read contract (no
    * inference pass over 100 TB). Doubles survive the text round-trip
    * exactly (shortest-representation printing is bijective). */
  def scanCsv(s: SparkSession, dir: String): DataFrame = {
    val src = staged(dir, "csv1", "events") { d =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.option("header", "true").csv(d.toString + "/data")
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
    s.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST")
      .csv(src.toString + "/data")
      .filter(col("user_id") % 3 === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** JSON source: a NESTED json-lines copy of `events` (payload struct), read
    * back with an explicit schema and aggregated through the nested field
    * path — the semi-structured shape JSON sources exist for. */
  def scanJson(s: SparkSession, dir: String): DataFrame = {
    val src = staged(dir, "json1", "events") { d =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          struct(col("event_type").as("type"), col("value").as("value")).as("meta"))
        .write.json(d.toString + "/data")
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, meta STRUCT<type: STRING, value: DOUBLE>")
    s.read.schema(schema).option("mode", "FAILFAST")
      .json(src.toString + "/data")
      .filter(col("user_id") % 3 === 1)
      .groupBy(col("meta.type").as("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("meta.value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Hive-layout partitioned parquet sink (`partitionBy`), read back
    * through a partition-pruned scan: only the `o_year=1997` directory's
    * files are touched (PlanSpec locks the inputFiles set) — the
    * write-side analog of reference A5/A6 partition handling. */
  def sinkPartitioned(s: SparkSession, dir: String): DataFrame = {
    val out = staged(dir, "psink1", "orders") { d =>
      Tables.orders(s, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").parquet(d.toString + "/data")
    }
    s.read.parquet(out.toString + "/data")
      .filter(col("o_year") === 1997)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Range-clustered parquet sink: `repartitionByRange` +
    * `sortWithinPartitions` writes files with DISJOINT `o_orderdate` ranges,
    * so a downstream date predicate prunes at file granularity via parquet
    * min/max stats — the cluster-on-write pattern OPTIMIZE/ZORDER formalizes
    * for Delta, here on plain parquet. Range boundaries come from sampling
    * (file SPLITS vary run to run) but the row SET is deterministic, so the
    * readback aggregate still hash-matches; SourceFormatSpec locks the
    * file-range disjointness. */
  def sinkSorted(s: SparkSession, dir: String): DataFrame = {
    val out = new File(sys.props("java.io.tmpdir"),
      "graft_sink_sorted_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    Tables.orders(s, dir)
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"), col("o_orderkey"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Schema-evolution read across parquet generations: `v=1` files carry
    * the original 3-column schema, `v=2` files add a derived `o_margin`
    * column; `mergeSchema=true` unions the schemas and NULL-materializes
    * the missing column for old files (reference A12's null semantics, on
    * the scan path). At 100 TB this is the everyday state of any
    * long-lived dataset — generations never get rewritten; footer-level
    * schema merge + per-file null fill is what makes the old files stay
    * readable. The audit counts non-null margins per generation to prove
    * the fill happened per-file, not per-query. */
  def scanMergeSchema(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val src = staged(dir, "msch1", "orders") { d =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.parquet(d.toString + "/data/v=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (dec(col("o_totalprice")) * lit(0.05).cast(DecimalType(2, 2)))
            .as("o_margin"))
        .write.parquet(d.toString + "/data/v=2")
    }
    s.read.option("mergeSchema", "true").parquet(src.toString + "/data")
      .groupBy(col("v").cast("long").as("v"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        count(col("o_margin")).as("n_with_margin"),
        dsum(col("o_totalprice")).as("sum_price"),
        sum(col("o_margin")).cast(DecimalType(38, 4)).cast("double")
          .as("sum_margin"))
      .orderBy(col("v"), col("o_orderstatus"))
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
    "sink_partitioned" -> (sinkPartitioned _),
    "sink_sorted" -> (sinkSorted _),
    "scan_csv" -> (scanCsv _),
    "scan_json" -> (scanJson _),
    "scan_merge_schema" -> (scanMergeSchema _),
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
    "scan_csv" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events WHERE user_id % 3 = 0
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "scan_json" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events WHERE user_id % 3 = 1
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "scan_merge_schema" ->
      s"""SELECT CAST(1 + (o_orderkey % 2) AS BIGINT) AS v, o_orderstatus,
         |  COUNT(*) AS n,
         |  COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_with_margin,
         |  ${sqlDsum("o_totalprice")} AS sum_price,
         |  CAST(CAST(SUM(CASE WHEN o_orderkey % 2 = 1
         |    THEN CAST(o_totalprice AS DECIMAL(18,6)) * CAST(0.05 AS DECIMAL(2,2))
         |    END) AS DECIMAL(38,4)) AS DOUBLE) AS sum_margin
         |FROM orders GROUP BY 1, 2 ORDER BY v, o_orderstatus""".stripMargin,
    "sink_partitioned" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sink_sorted" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "catalog_list_tables" ->
      """SELECT * FROM (VALUES
        |  ('customer','parquet'),('documents','parquet'),('embeddings','parquet'),
        |  ('events','parquet'),('lineitem','parquet'),('nation','parquet'),
        |  ('orders','parquet'),('part','parquet'),('region','parquet'),
        |  ('supplier','parquet')) t(table_name, format)
        |ORDER BY table_name""".stripMargin
  )
}
