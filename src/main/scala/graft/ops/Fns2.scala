package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third function wave: extended string ops (edit distance, padding,
  * translate), extended arrays (distinct/union/flatten/position), date
  * arithmetic (add_months/last_day/months_between), greatest/least, and
  * explicit null-ordering sorts (Spark defaults nulls-first, DuckDB
  * nulls-last — a silent cross-engine trap made explicit here). */
object Fns2 {

  def fnString2(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select(
        col("r_name"), col("n_name"),
        levenshtein(col("r_name"), col("n_name")).as("edit_dist"),
        lpad(col("r_name"), 12, "_").as("padded"),
        rpad(col("n_name"), 12, ".").as("rpadded"),
        initcap(lower(col("n_name"))).as("title"),
        translate(col("r_name"), "AEIOU", "aeiou").as("translated"),
        reverse(col("n_name")).as("rev"),
        instr(col("n_name"), "A").as("pos_a"),
        repeat(substring(col("r_name"), 1, 2), 3).as("rep3"))
      .orderBy(col("r_name"), col("n_name"))

  def fnArray2(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(array_distinct(toks)).as("n_uniq"),
        concat_ws(",", slice(array_sort(array_distinct(toks)), 1, 5)).as("first5_uniq"),
        array_position(toks, "data").cast("int").as("pos_data"),
        concat_ws(",", array_remove(slice(toks, 1, 10), "the")).as("head_no_the"),
        size(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2)))).as("n_flat"))
      .orderBy(col("doc_id"))
  }

  def fnDate2(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("month_end"),
        trunc(col("o_orderdate").cast("date"), "year").as("year_start"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"))
      .orderBy(col("o_orderkey"))

  def fnGreatestLeast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_quantity"), col("l_discount") * 100, lit(10.0)).as("g"),
        least(col("l_quantity"), col("l_tax") * 100, lit(40.0)).as("l"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** VARIANT (Spark 4's semi-structured type): parse raw JSON ONCE per row
    * into the binary-encoded variant, then filter/extract with typed
    * `variant_get` path access and aggregate — the modern replacement for
    * repeated `get_json_object` string walks (each of which re-parses the
    * JSON). Both expressions are codegen'd, so the whole pipeline stays in
    * one WholeStageCodegen span; the variant column itself round-trips
    * through Delta behind the `variantType` table feature
    * (VariantTypeSpec). */
  def fnVariant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "int"))
      .filter(col("k") >= 50)
      .groupBy((col("k") % 7).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(variant_get(col("v"), "$.k", "long")).as("max_k"))
      .orderBy(col("k_mod"))

  /** URL parsing family (`parse_url` components): protocol, host, path,
    * full query, single query parameter, and fragment. URLs are
    * synthesized deterministically from the documents fixture (same
    * pattern as text_url_filter) so the oracle can state each component
    * from the construction — validating the parser against ground truth
    * rather than another parser. */
  def fnUrl(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example.org/docs/"),
      col("doc_id").cast("string"), lit("?lang="), col("lang"),
      lit("&v="), (col("doc_id") % 7).cast("string"), lit("#sec"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        parse_url(url, lit("PROTOCOL")).as("proto"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("lang")).as("q_lang"),
        parse_url(url, lit("REF")).as("ref"))
      .orderBy(col("doc_id"))
  }

  /** Binary encodings: base64 / hex over UTF-8 bytes, with an
    * unbase64-roundtrip length proving decode ∘ encode = id. */
  def fnBinaryEnc(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .select(col("n_name"),
        base64(col("n_name").cast("binary")).as("b64"),
        hex(col("n_name")).as("hx"),
        length(unbase64(base64(col("n_name").cast("binary")))).cast("int").as("rt_len"))
      .orderBy(col("n_name"))

  /** Dedicated regexp family: occurrence counting, first-match position,
    * extract-all, and group-referencing replacement — the text-wrangling
    * quartet crawl pipelines lean on. All codegen'd built-ins (no UDF). */
  def fnRegex(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"),
        expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
        expr("regexp_instr(p_name, '[ld]')").as("pos_ld"),
        concat_ws(",", expr("regexp_extract_all(p_name, '[a-z]+', 0)")).as("words_csv"),
        regexp_replace(col("p_name"), "([aeiou])", "<$1>").as("marked"))
      .orderBy(col("p_partkey"))

  /** COLLATION-aware string semantics (Spark 4 collations): equality and
    * prefix matching under `UTF8_LCASE` recognize case variants the
    * binary collation distinguishes — the engine-level form of
    * "lower() both sides", evaluated inside codegen'd comparisons
    * instead of allocating a lowercased copy per row. Output is booleans
    * keyed by the binary-collated name, so the oracle (expressed with
    * explicit lower()) hashes identically. */
  def fnCollate(s: SparkSession, dir: String): DataFrame = {
    val variant = initcap(lower(col("n_name")))
    Tables.nation(s, dir)
      .select(col("n_name"), variant.as("variant"),
        (col("n_name") === variant).as("eq_binary"),
        expr("collate(n_name, 'UTF8_LCASE') = " +
          "collate(initcap(lower(n_name)), 'UTF8_LCASE')").as("eq_lcase"),
        expr("startswith(collate(n_name, 'UTF8_LCASE'), collate('a', 'UTF8_LCASE'))")
          .as("starts_a_ci"))
      .orderBy(col("n_name"))
  }

  /** STRUCT scalar family: construction (`struct`), field access through
    * one and two levels, compact JSON projection of a struct, and the
    * lexicographic struct comparison ORDER BY/range predicates on
    * composite keys compile to. All codegen'd row-format ops — structs in
    * Spark are laid out inline in UnsafeRow, so none of this materializes
    * an object per row. */
  def fnStruct(s: SparkSession, dir: String): DataFrame = {
    val st = struct(col("o_orderkey").as("k"), col("o_orderstatus").as("s"),
      struct(col("o_orderpriority").as("pr")).as("n"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        st.getField("s").as("s_field"),
        st.getField("n").getField("pr").as("nested_field"),
        to_json(struct(col("o_orderkey").as("k"), col("o_orderstatus").as("s")))
          .as("js"),
        (struct(col("o_orderstatus"), col("o_orderkey")) >
          struct(lit("O").as("o_orderstatus"), lit(100L).as("o_orderkey"))).as("cmp"))
      .orderBy(col("o_orderkey"))
  }

  /** Explicit NULLS FIRST / NULLS LAST ordering over synthesized nulls. */
  def sortNulls(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_n"))
      .orderBy(col("status_n").asc_nulls_first, col("o_orderkey"))

  /** Error-safe (TRY) function family: malformed input and division by
    * zero become NULL instead of failed tasks — the difference between a
    * 100 TB job that finishes with a null-rate metric and one that dies at
    * hour nine on a single bad record. */
  def fnTry(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("good_cast"),
        expr("try_divide(o_totalprice, o_orderkey % 3)").as("safe_div"))
      .orderBy(col("o_orderkey"))

  /** Calendar arithmetic family: month addition with end-of-month clamping
    * (`add_months` ≡ DuckDB's `+ INTERVAL 1 MONTH`), last_day, quarter
    * truncation, day-of-week (Spark 1=Sunday; DuckDB 0=Sunday, oracle
    * shifts), ISO week numbers, and signed day differences. */
  def fnDate3(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 500 === 0)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 1).cast("string").as("plus_month"),
        last_day(col("o_orderdate").cast("date")).cast("string").as("month_end"),
        date_trunc("quarter", col("o_orderdate")).cast("date").cast("string").as("qtr_start"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_y2k"))
      .orderBy(col("o_orderkey"))

  /** Formatting family: printf-style `format_string`, pad/repeat — the
    * id-zero-padding and fixed-width shapes export jobs emit. The %.2f
    * print of a 2-decimal double is exact on both engines (no rounding at
    * the printed precision). */
  def fnFormat(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 1000 === 0)
      .select(col("o_orderkey"),
        format_string("%08d", col("o_orderkey")).as("padded"),
        lpad(col("o_orderstatus"), 3, ".").as("lp"),
        rpad(col("o_orderpriority"), 18, "_").as("rp"),
        repeat(lit("ab"), 3).as("rep"),
        format_string("%.2f", col("o_totalprice")).as("price_str"))
      .orderBy(col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_date3" -> (fnDate3 _),
    "fn_format" -> (fnFormat _),
    "fn_string2" -> (fnString2 _),
    "fn_array2" -> (fnArray2 _),
    "fn_date2" -> (fnDate2 _),
    "fn_greatest_least" -> (fnGreatestLeast _),
    "fn_variant" -> (fnVariant _),
    "fn_try" -> (fnTry _),
    "fn_struct" -> (fnStruct _),
    "fn_collate" -> (fnCollate _),
    "fn_regex" -> (fnRegex _),
    "fn_url" -> (fnUrl _),
    "fn_binary_enc" -> (fnBinaryEnc _),
    "sort_nulls" -> (sortNulls _)
  )

  val oracle: Map[String, String] = Map(
    "fn_date3" ->
      """SELECT o_orderkey,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
        |    AS VARCHAR) AS plus_month,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        |  CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR)
        |    AS qtr_start,
        |  quarter(o_orderdate) AS qtr,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  weekofyear(o_orderdate) AS iso_week,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
        |    AS days_to_y2k
        |FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey""".stripMargin,
    "fn_format" ->
      """SELECT o_orderkey,
        |  printf('%08d', o_orderkey) AS padded,
        |  lpad(o_orderstatus, 3, '.') AS lp,
        |  rpad(o_orderpriority, 18, '_') AS rp,
        |  repeat('ab', 3) AS rep,
        |  printf('%.2f', o_totalprice) AS price_str
        |FROM orders WHERE o_orderkey % 1000 = 0 ORDER BY o_orderkey""".stripMargin,
    "fn_string2" ->
      """SELECT r_name, n_name,
        |  CAST(levenshtein(r_name, n_name) AS INTEGER) AS edit_dist,
        |  lpad(r_name, 12, '_') AS padded,
        |  rpad(n_name, 12, '.') AS rpadded,
        |  list_aggr(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS title,
        |  translate(r_name, 'AEIOU', 'aeiou') AS translated,
        |  reverse(n_name) AS rev,
        |  CAST(instr(n_name, 'A') AS INTEGER) AS pos_a,
        |  repeat(substring(r_name, 1, 2), 3) AS rep3
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "fn_array2" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
        |  array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5_uniq,
        |  CAST(COALESCE(list_position(toks, 'data'), 0) AS INTEGER) AS pos_data,
        |  array_to_string(list_filter(toks[1:10], x -> x <> 'the'), ',') AS head_no_the,
        |  CAST(len(flatten([toks[1:2], toks[3:4]])) AS INTEGER) AS n_flat
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_date2" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |  CAST(date_trunc('year', o_orderdate) AS DATE) AS year_start,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_greatest_least" ->
      """SELECT l_orderkey, l_linenumber,
        |  greatest(l_quantity, l_discount * 100, 10.0) AS g,
        |  least(l_quantity, l_tax * 100, 40.0) AS l
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_variant" ->
      """WITH e AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
        |)
        |SELECT k % 7 AS k_mod, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM e WHERE k >= 50
        |GROUP BY 1 ORDER BY k_mod""".stripMargin,
    "fn_try" ->
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS good_cast,
        |  o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_url" ->
      """SELECT doc_id,
        |  'https' AS proto,
        |  source || '.example.org' AS host,
        |  '/docs/' || CAST(doc_id AS VARCHAR) AS path,
        |  'lang=' || lang || '&v=' || CAST(doc_id % 7 AS VARCHAR) AS query,
        |  lang AS q_lang,
        |  'sec' AS ref
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_binary_enc" ->
      """SELECT n_name,
        |  to_base64(encode(n_name)) AS b64,
        |  hex(n_name) AS hx,
        |  CAST(length(n_name) AS INTEGER) AS rt_len
        |FROM nation ORDER BY n_name""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey, p_name,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
        |  CAST(CASE WHEN regexp_matches(p_name, '[ld]')
        |    THEN length(regexp_replace(p_name, '[ld].*$', '', 's')) + 1
        |    ELSE 0 END AS INTEGER) AS pos_ld,
        |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words_csv,
        |  regexp_replace(p_name, '([aeiou])', '<\1>', 'g') AS marked
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_collate" ->
      """WITH t AS (
        |  SELECT n_name,
        |    list_aggr(list_transform(string_split(lower(n_name), ' '),
        |      w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS variant
        |  FROM nation)
        |SELECT n_name, variant,
        |  (n_name = variant) AS eq_binary,
        |  (lower(n_name) = lower(variant)) AS eq_lcase,
        |  starts_with(lower(n_name), 'a') AS starts_a_ci
        |FROM t ORDER BY n_name""".stripMargin,
    "fn_struct" ->
      """SELECT o_orderkey,
        |  o_orderstatus AS s_field,
        |  o_orderpriority AS nested_field,
        |  CAST(to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS VARCHAR) AS js,
        |  ((o_orderstatus, o_orderkey) > ('O', 100)) AS cmp
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sort_nulls" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_n
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY status_n ASC NULLS FIRST, o_orderkey""".stripMargin
  )
}
