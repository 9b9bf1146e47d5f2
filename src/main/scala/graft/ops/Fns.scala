package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scalar / UDF / UDTF function families (SURVEY.md §2B "Scalar functions",
  * "UDF / UDAF / UDTF"). Everything stays on codegen'd built-ins except the
  * two keys whose point IS the user-defined surface. */
object Fns {

  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        substring(col("c_name"), 1, 8).as("head8"),
        upper(col("c_mktsegment")).as("seg_up"),
        lower(col("c_name")).as("name_lo"),
        length(col("c_name")).as("name_len"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("seg_key"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("renamed"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"))
      .orderBy(col("c_custkey"))

  def fnDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy(col("o_orderkey"))

  def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("absv"),
        ceil(col("l_extendedprice")).as("ceilp"),
        floor(col("l_extendedprice")).as("floorp"),
        sqrt(col("l_quantity")).as("sq"),
        round(pow(col("l_quantity"), 2), 6).as("pw"),
        round(log(col("l_quantity")), 6).as("lg"),
        (col("l_orderkey") % 7).as("md"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def fnCase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        when(col("o_totalprice") > 400000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("status2"))
      .groupBy(col("bucket"), col("status2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"), col("status2"))

  def fnArray(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        element_at(toks, 1).as("first_tok"),
        array_contains(toks, "data").as("has_data"),
        concat_ws(" ", slice(toks, 1, 3)).as("head3"))
      .orderBy(col("doc_id"))
  }

  def fnMap(s: SparkSession, dir: String): DataFrame = {
    val m = map(lit("type"), col("event_type"), lit("user"), col("user_id").cast("string"))
    Tables.events(s, dir)
      .select(
        col("event_id"),
        element_at(m, "user").as("user_val"),
        size(m).as("n_entries"),
        concat_ws(",", map_keys(m)).as("keys_csv"))
      .orderBy(col("event_id"))
  }

  def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_struct"))
      .orderBy(col("event_id"))

  def fnCast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_orderkey").cast("string").as("key_str"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_extendedprice").cast("decimal(12,2)").cast("string").as("price_dec_str"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Scalar Scala UDF (the engine supports them; built-ins preferred). */
  def udfScalar(s: SparkSession, dir: String): DataFrame = {
    val sku = udf((orderkey: Long, line: Int) => s"$orderkey-$line")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        sku(col("l_orderkey"), col("l_linenumber")).as("sku"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Typed Aggregator: quantity-weighted average price. The buffer holds
    * exact integer cents so parallel merge order cannot change the result. */
  def udafTyped(s: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedPriceAgg)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Table-generating explode (UDTF analog). */
  def udtfExplode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .orderBy(col("doc_id"), col("token"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> (fnString _),
    "fn_date" -> (fnDate _),
    "fn_math" -> (fnMath _),
    "fn_case" -> (fnCase _),
    "fn_array" -> (fnArray _),
    "fn_map" -> (fnMap _),
    "fn_json" -> (fnJson _),
    "fn_cast" -> (fnCast _),
    "udf_scalar" -> (udfScalar _),
    "udaf_typed" -> (udafTyped _),
    "udtf_explode" -> (udtfExplode _)
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey,
        |  substring(c_name, 1, 8) AS head8,
        |  upper(c_mktsegment) AS seg_up,
        |  lower(c_name) AS name_lo,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
        |  regexp_replace(c_name, 'Customer', 'Cust') AS renamed,
        |  string_split(c_name, '#')[2] AS num_part,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  trim('  ' || c_mktsegment || '  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dy,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS absv,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceilp,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floorp,
        |  sqrt(l_quantity) AS sq,
        |  round(pow(l_quantity, 2), 6) AS pw,
        |  round(ln(l_quantity), 6) AS lg,
        |  l_orderkey % 7 AS md
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_case" ->
      """SELECT CASE WHEN o_totalprice > 400000 THEN 'big'
        |            WHEN o_totalprice > 150000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status2,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, status2""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  string_split(text, ' ')[1] AS first_tok,
        |  list_contains(string_split(text, ' '), 'data') AS has_data,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS head3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  map(['type','user'], [event_type, CAST(user_id AS VARCHAR)])['user'][1] AS user_val,
        |  CAST(cardinality(map(['type','user'], [event_type, CAST(user_id AS VARCHAR)])) AS INTEGER) AS n_entries,
        |  array_to_string(map_keys(map(['type','user'], [event_type, CAST(user_id AS VARCHAR)])), ',') AS keys_csv
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS INTEGER) AS qty_int,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "udf_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS sku
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "udaf_typed" ->
      """SELECT l_returnflag,
        |  (CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |            * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0)
        |   / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_explode" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id, token""".stripMargin
  )
}

/** Weighted-average aggregator with an exact integer-cents buffer:
  * merge order cannot perturb the result (doubles would).
  * prices are 2-decimal, quantities integer-valued. */
final case class WavgBuf(weightedCents: Long, qty: Long)
object WeightedPriceAgg extends Aggregator[(Double, Double), WavgBuf, Double] {
  override def zero: WavgBuf = WavgBuf(0L, 0L)
  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    val cents = Math.round(in._1 * 100)
    val q = Math.round(in._2)
    WavgBuf(b.weightedCents + cents * q, b.qty + q)
  }
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.weightedCents + b.weightedCents, a.qty + b.qty)
  override def finish(b: WavgBuf): Double =
    (b.weightedCents.toDouble / 100.0) / b.qty.toDouble
  override def bufferEncoder: org.apache.spark.sql.Encoder[WavgBuf] =
    org.apache.spark.sql.Encoders.product[WavgBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
