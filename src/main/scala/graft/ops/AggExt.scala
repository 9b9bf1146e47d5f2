package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Extended aggregation surface: distinct, approximate, grouping sets /
  * rollup / cube, having, order statistics (SURVEY.md §2B "Aggregation").
  *
  * Multi-dimensional grouping emits `'ALL'` sentinels instead of NULL
  * subtotal markers so ordering and hashing are engine-neutral. Statistical
  * moments (stddev/var/corr) are recomputed from exact decimal power sums
  * in IEEE double arithmetic — built-in floating aggregates are
  * accumulation-order-dependent and would not hash-match across engines. */
object AggExt {
  import Det._

  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** HLL++ approximate distinct. The raw estimate is not bit-comparable to
    * DuckDB's HLL, so the oracle-hashable output is the EXACT distinct count
    * plus a boolean asserting the HLL estimate landed within 5% of it (the
    * oracle emits literal TRUE) — the driver hash now verifies both the
    * exact semantics and the estimate's tolerance, instead of rows-only.
    * OpsSpec additionally tolerance-checks the raw estimate values. */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("n_orders_exact"))
      .select(
        col("l_returnflag"), col("n_orders_exact"),
        (abs(col("approx") - col("n_orders_exact")).cast(DoubleType) /
          col("n_orders_exact") <= 0.05).as("approx_within_5pct"))
      .orderBy(col("l_returnflag"))

  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val v = s"li_gs_${Math.abs(dir.hashCode)}"
    Tables.lineitem(s, dir).createOrReplaceTempView(v)
    s.sql(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |       COALESCE(l_linestatus, 'ALL') AS linestatus,
         |       COUNT(1) AS n,
         |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
         |FROM $v
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY returnflag, linestatus""".stripMargin)
  }

  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  def aggHaving(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .filter(col("sum_price") > 3000000 && col("n_orders") >= 5)
      .orderBy(col("o_custkey"))

  /** stddev/variance/corr from exact decimal power sums:
    * var = (n·Σx² − (Σx)²) / (n·(n−1)), corr via the analogous formula.
    * Inputs to the double arithmetic are identical on both engines, so the
    * IEEE results are identical. */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    // power sums floored to integers before the double cast: floor is the
    // one decimal→integer step both engines perform identically (Spark's
    // rescale cast is HALF_UP, DuckDB's truncates — they disagree exactly
    // at .5 fractions, which qty*price sums hit). Integer magnitude stays
    // < 2^53, so the double cast is exact; see Det.dfin scaladoc.
    def d0(c: org.apache.spark.sql.Column) = floor(c).cast(DoubleType)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        dfin(sum(x)).as("sx"), d0(sum(x * x)).as("sxx"),
        dfin(sum(y)).as("sy"), d0(sum(y * y)).as("syy"),
        d0(sum(x * y)).as("sxy"))
      .select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - 1))).as("stddev_qty"),
        ((col("n") * col("syy") - col("sy") * col("sy")) /
          (col("n") * (col("n") - 1))).as("var_price"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles over integer-valued quantities. */
  def aggPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.95)").as("p95_qty"))
      .orderBy(col("l_returnflag"))

  /** Approximate percentile via the mergeable GK sketch
    * (`percentile_approx`) — the one-pass quantile at 100 TB, where the
    * exact form needs a per-group sort of all values. Same oracle pattern
    * as [[aggApproxDistinct]]: the hashable output is the EXACT median plus
    * a boolean pinning the sketch estimate within ±1.0 of it (at accuracy
    * 1000 the rank error on integer-valued quantities is far below 1; the
    * margin absorbs the exact median's x.5 interpolation, since the sketch
    * returns an actual data value). */
  def aggApproxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_approx(l_quantity, 0.5, 1000)").as("approx"),
        expr("percentile(l_quantity, 0.5)").as("median_exact"))
      .select(
        col("l_returnflag"), col("median_exact"),
        (abs(col("approx") - col("median_exact")) <= 1.0).as("approx_within_1"))
      .orderBy(col("l_returnflag"))

  /** `grouping()` / `grouping_id()` over a ROLLUP: the bitmask that lets a
    * consumer distinguish "NULL because subtotal row" from "NULL because
    * the data is null" — required the moment rollup output feeds another
    * query instead of a report. */
  def aggGroupingId(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping_id().as("gid"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"))
      .orderBy(col("gid"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Boolean aggregates: `every` / `any` (SQL BOOL_AND/BOOL_OR) and
    * `count_if` — the assertion-style rollups data-quality monitors emit
    * ("did every row pass", "did any row trip the alarm"). Plain
    * map-side-combining hash aggregation. */
  def aggBool(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("every(o_totalprice > 1000)").as("all_over_1k"),
        expr("any(o_totalprice > 400000)").as("any_over_400k"),
        expr("count_if(o_orderstatus = 'F')").as("n_f"))
      .orderBy(col("o_orderpriority"))

  /** EXACT distinct counting via bitmap aggregation (`bitmap_bucket_number`
    * / `bitmap_construct_agg` / `bitmap_count`): dense-int keys become
    * per-bucket bitmaps that OR together — the re-aggregatable EXACT
    * distinct form (HLL's exact sibling) a 100 TB rollup stores per
    * partition; memory is corpus-bounded bits, not a per-key hash set,
    * and merging partial results is bitwise OR instead of set union. The
    * result equals COUNT(DISTINCT) bit for bit, so the oracle is exact —
    * no tolerance boolean needed. */
  def aggBitmapDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), expr("bitmap_bucket_number(l_partkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct_parts"))
      .orderBy(col("l_returnflag"))

  /** Ordered string aggregation (SQL:2023 LISTAGG / STRING_AGG): names
    * concatenated per group with an explicit WITHIN GROUP order, so the
    * result string is deterministic on any engine. The within-group sort
    * is per-group (bounded by group size after the groupBy shuffle), not
    * a global sort. */
  def aggListagg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") % 25 === 0)
      .groupBy(col("c_nationkey"))
      .agg(expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)")
          .as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  /** Count-Min sketch point queries — the mergeable frequency sketch that
    * completes the approximate family (HLL distinct, KMV intersection, GK
    * percentile, approx-top-k, bloom membership): per return flag, a CMS
    * over `l_partkey` is built as ONE map-side-combining aggregation (the
    * sketches merge associatively, like every sketch here), then three
    * fixed part keys are point-queried against it. The hash-checked
    * contract mirrors `agg_approx_distinct`: exact counts plus the CMS
    * law as a boolean — a count-min estimate can NEVER undercount, and
    * with eps=0.001 the overcount is bounded by eps·N (fail-loud if a
    * fixture ever breaks the tolerance, diagnosed as tolerance not
    * semantics — see FIXTURES.md's approx-family notes). */
  def aggCmsSketch(s: SparkSession, dir: String): DataFrame = {
    val probes = Seq(1L, 7L, 13L)
    val est = udf((b: Array[Byte], key: Long) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)).estimateCount(key))
    val li = Tables.lineitem(s, dir)
    val sk = li.groupBy(col("l_returnflag"))
      .agg(count_min_sketch(col("l_partkey"), lit(0.001d), lit(0.99d),
        lit(42)).as("cms"), count(lit(1)).as("n"))
    val exact = li.filter(col("l_partkey").isin(probes: _*))
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(count(lit(1)).as("exact_n"))
    val px = sk.crossJoin(
      s.createDataFrame(probes.map(Tuple1(_))).toDF("probe"))
    px.join(exact,
        px("l_returnflag") === exact("l_returnflag") &&
        col("probe") === col("l_partkey"), "left")
      .select(px("l_returnflag"), col("probe"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"),
        (est(col("cms"), col("probe")) >= coalesce(col("exact_n"), lit(0L)) &&
         est(col("cms"), col("probe")) <=
           coalesce(col("exact_n"), lit(0L)) + ceil(col("n") * lit(0.001d)))
          .as("within"))
      .orderBy(px("l_returnflag"), col("probe"))
  }

  /** Multi-column (tuple) DISTINCT count: `COUNT(DISTINCT a, b)` — one
    * distinct-aggregate over the composite key, contrasted with the
    * single-column distinct in the same row. */
  def aggDistinctTuple(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey"), col("l_suppkey")).as("n_pairs"),
        count_distinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_cms_sketch" -> (aggCmsSketch _),
    "agg_distinct_tuple" -> (aggDistinctTuple _),
    "agg_listagg" -> (aggListagg _),
    "agg_distinct" -> (aggDistinct _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_having" -> (aggHaving _),
    "agg_stats" -> (aggStats _),
    "agg_percentile" -> (aggPercentile _),
    "agg_approx_percentile" -> (aggApproxPercentile _),
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "agg_bool" -> (aggBool _),
    "agg_grouping_id" -> (aggGroupingId _)
  )

  private val statsSql =
    """WITH s AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sx,
      |    CAST(floor(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6)))) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sy,
      |    CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)))) AS DOUBLE) AS syy,
      |    CAST(floor(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty,
      |  ((n * syy - sy * sy) / (n * (n - 1))) AS var_price,
      |  ((n * sxy - sx * sy) /
      |   (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) AS corr_qty_price
      |FROM s ORDER BY l_returnflag""".stripMargin

  val oracle: Map[String, String] = Map(
    "agg_cms_sketch" ->
      """WITH flags AS (SELECT DISTINCT l_returnflag FROM lineitem),
        |probes(probe) AS (VALUES (CAST(1 AS BIGINT)), (CAST(7 AS BIGINT)),
        |                         (CAST(13 AS BIGINT))),
        |ex AS (
        |  SELECT l_returnflag, l_partkey, COUNT(*) AS n FROM lineitem
        |  WHERE l_partkey IN (1, 7, 13) GROUP BY 1, 2)
        |SELECT f.l_returnflag, p.probe,
        |  COALESCE(ex.n, 0) AS exact_n, TRUE AS within
        |FROM flags f CROSS JOIN probes p
        |LEFT JOIN ex ON ex.l_returnflag = f.l_returnflag
        |  AND ex.l_partkey = p.probe
        |ORDER BY f.l_returnflag, p.probe""".stripMargin,
    "agg_distinct_tuple" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_pairs,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_listagg" ->
      """SELECT c_nationkey,
        |  STRING_AGG(c_name, ',' ORDER BY c_name) AS names,
        |  COUNT(*) AS n
        |FROM customer WHERE c_custkey % 25 = 0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "agg_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_bool" ->
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the exact column is DuckDB-expressible; the tolerance boolean must be
    // TRUE on the Spark side for the hash to match (see aggApproxDistinct)
    "agg_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders_exact,
        |  TRUE AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY returnflag, linestatus""".stripMargin,
    "agg_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "agg_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_custkey
         |HAVING ${sqlDsum("o_totalprice")} > 3000000 AND COUNT(*) >= 5
         |ORDER BY o_custkey""".stripMargin,
    "agg_stats" -> statsSql,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.95) AS p95_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_approx_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_exact,
        |  TRUE AS approx_within_1
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
