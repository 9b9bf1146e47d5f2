package graft.text

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2C;
  * builder-prompt "text analysis": language-ID, quality scoring, token
  * counting, fingerprinting). All narrow per-row transforms + one
  * aggregation — shuffle-light, linear at 100 TB. */
object TextOps {
  import Det._

  private val tokens = split(col("text"), " ")

  /** Corpus token frequencies: top 100 by (count desc, token). */
  def tokenize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(100)

  /** Per-language corpus stats. */
  def langStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        dsum(col("n_chars")).as("sum_chars"),
        davg(col("n_chars")).as("avg_chars"))
      .orderBy(col("lang"))

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation = one piece each). */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        size(expr("""regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)"""))
          .as("n_bpe_pieces"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length — the standard cheap heuristics for corpus filtering. */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(tokens).cast("double")
    val stop = array(Seq("the", "a", "of", "and", "to", "in", "is").map(lit): _*)
    val nStop = size(filter(tokens, t => array_contains(stop, t))).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).cast("double")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(tokens).as("n_tokens"),
        (nPunct / length(col("text")).cast("double")).as("punct_ratio"),
        (nStop / nTok).as("stopword_ratio"),
        ((length(col("text")).cast("double") - nTok + 1d) / nTok).as("mean_tok_len"))
      .orderBy(col("doc_id"))
  }

  /** Rule-based language ID: stopword-set hit counts, fixed tie order.
    * (The fixture text is synthetic; the operator is the deliverable.) */
  def langId(s: SparkSession, dir: String): DataFrame = {
    def hits(ws: Seq[String]) =
      ws.map(w => array_contains(tokens, w).cast("int")).reduce(_ + _)
    val en = hits(Seq("the", "a", "of", "and", "row"))
    val es = hits(Seq("el", "la", "de", "y", "que"))
    val fr = hits(Seq("le", "la", "et", "les", "des"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        when(en >= es && en >= fr, "en")
          .when(es >= fr, "es")
          .otherwise("fr").as("guessed_lang"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("fp"))
      .orderBy(col("doc_id"))

  /** TF-IDF weights for the first 20 docs (idf = ln(N/df), rounded —
    * ln is the one non-exact libm op here). Two shuffles: token counts,
    * then the doc-frequency join. The DF frame is VOCABULARY-sized — on a
    * web corpus that's billions of distinct tokens — so it carries NO
    * forced broadcast hint: both sides of the token join shuffle on the
    * same key, and AQE still picks broadcast from runtime stats whenever
    * the vocabulary actually fits (VERDICT r11 #1: never force-broadcast
    * a data-sized frame). */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tok = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, "token")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(lit(n.toDouble) / col("df").cast("double")), 4)
          .as("tfidf"))
      .orderBy(col("doc_id"), col("token"))
  }

  /** End-to-end corpus curation pipeline — the composed shape a
    * training-data job actually runs: normalize → quality gate (≥5
    * tokens) → exact dedup on the normalized hash (keep lowest doc_id) →
    * per-language doc/token counts. One narrow pass + two shuffles
    * (dedup groupBy, final agg); every stage is an operator verified
    * individually elsewhere, composed here under one oracle. */
  def corpusPipeline(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm"))
      .withColumn("n_tokens", size(split(col("norm"), " ")))
      .filter(col("n_tokens") >= 5)
      .groupBy(sha2(col("norm"), 256).as("h"))
      .agg(min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("n_tokens"), col("doc_id")).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"))

  /** Stratified sampling — rebalance a corpus by downsampling dominant
    * languages. Keep decisions hash on the doc id (deterministic,
    * partition-independent, no RNG state to coordinate across executors),
    * with a per-stratum threshold. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val threshold = when(col("lang") === "en", lit("28"))   // ~16%
      .when(col("lang") === "de", lit("55"))                // ~33%
      .otherwise(lit("aa"))                                 // ~66% for the tail
    Tables.documents(s, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < threshold)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))
  }

  private val PiiEmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
  private val PiiPhoneRe = "\\+1-555-[0-9]+"

  /** PII scrubbing: redact emails/phone numbers before training. The doc
    * is augmented with synthetic PII (so the operator provably fires on
    * every row), then counted and redacted — narrow per-row regexes,
    * linear at corpus scale. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val doc = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.com or +1-555-"), col("doc_id").cast("string"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(doc, lit(PiiEmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(doc, lit(PiiPhoneRe), lit(0))).as("n_phones"),
        length(regexp_replace(regexp_replace(doc, PiiEmailRe, "<EMAIL>"),
          PiiPhoneRe, "<PHONE>")).as("n_scrubbed_chars"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark DECONTAMINATION — the training-pipeline step that drops
    * corpus documents sharing verbatim n-grams with an evaluation set:
    * benchmark = docs with `doc_id % 97 == 0` (the held-out set), corpus =
    * the rest; a corpus doc is contaminated iff it shares ≥1 exact
    * word n-gram, reported with its shared-gram count. n=3 here because
    * the synthetic corpus has no longer verbatim overlaps — production
    * runs use 8-13-grams over the identical plan shape.
    *
    * Scale shape: gram explosion is narrow (∝ tokens), both sides
    * distinct-reduce BEFORE the equi-join on the gram, and no broadcast
    * hint — a real benchmark set is small and AQE will broadcast it, but
    * hinting would OOM if someone passes a corpus as the benchmark. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', slice(w, i + 1, 3)))")).as("g"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val corp = grams.filter(col("doc_id") % 97 =!= 0).select("doc_id", "g").distinct()
    corp.join(bench, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Cross-document BOILERPLATE detection (the RefinedWeb/CCNet template
    * filter): per document, how many of its DISTINCT 3-gram shingles recur
    * in other documents (corpus doc-frequency ≥ 2), and whether those
    * corpus-common shingles are the document's majority. Headers, footers,
    * license blocks and templated pages share long exact shingles; a page
    * that is mostly corpus-frequent shingles is boilerplate, not content.
    *
    * Scale shape: per-document shingle dedup happens NARROW inside the row
    * (`array_distinct` before the explode — (doc_id, shingle) duplicates
    * only exist within one document), so the whole plan is two hash
    * exchanges: the window count on the shingle key and the per-doc
    * aggregation. Count-only state, no all-pairs document comparison
    * anywhere; cost ∝ corpus tokens. Output is integers + a boolean (no
    * float division), so the DuckDB hash is exact. */
  def boilerplate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', slice(w, i + 1, 3)))"))).as("g"))
    grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_common"))
      .select(col("doc_id"), col("n_shingles"), col("n_common"),
        (col("n_common") * 2 >= col("n_shingles")).as("is_boiler"))
      .orderBy(col("doc_id"))
  }

  /** Per-language top-10 bigram table — the n-gram census LM diagnostics
    * run (boilerplate phrases, templated text, tokenizer sanity). Each
    * document's adjacent word pairs are generated NARROWLY (a per-row
    * array transform, no self-join); counting is one map-side-combining
    * shuffle on (lang, bigram) — hot bigrams are absorbed by partial
    * aggregation, so skew doesn't concentrate — and the top-k window runs
    * over the already-reduced count frame per language. */
  def ngramStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = split(trim(lower(col("text"))), "\\s+")
    Tables.documents(s, dir)
      .select(col("lang"), ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
        .as("bigram"))
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_ngram_stats" -> (ngramStats _),
    "text_boilerplate" -> (boilerplate _),
    "text_decontaminate" -> (decontaminate _),
    "sample_stratified" -> (sampleStratified _),
    "text_pii_scrub" -> (piiScrub _),
    "pipeline_corpus" -> (corpusPipeline _),
    "text_tokenize" -> (tokenize _),
    "text_lang_stats" -> (langStats _),
    "text_token_count" -> (tokenCount _),
    "text_quality" -> (quality _),
    "text_lang_id" -> (langId _),
    "text_fingerprint" -> (fingerprint _),
    "text_tfidf" -> (tfidf _)
  )

  val oracle: Map[String, String] = Map(
    "text_ngram_stats" ->
      """WITH w AS (
        |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |bg AS (
        |  SELECT lang, UNNEST(list_zip(ws[1:-2], ws[2:-1])) AS p
        |  FROM w WHERE len(ws) >= 2),
        |c AS (SELECT lang, p[1] || ' ' || p[2] AS bigram, COUNT(*) AS n
        |      FROM bg GROUP BY 1, 2),
        |r AS (SELECT lang, bigram, n,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram)
        |          AS rk
        |      FROM c)
        |SELECT lang, rk, bigram, n FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
    "text_boilerplate" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |  FROM tok, UNNEST(range(1, len(w) - 1)) AS t(i)
        |  WHERE len(w) >= 3
        |), dfc AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |  (SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 2 >= COUNT(*)) AS is_boiler
        |FROM grams JOIN dfc USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |), grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |  FROM tok, UNNEST(range(1, len(w) - 1)) AS t(i)
        |  WHERE len(w) >= 3
        |), bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        |corp AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
        |SELECT c.doc_id, COUNT(*) AS n_shared FROM corp c JOIN bench b USING (g)
        |GROUP BY 1 ORDER BY c.doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_kept FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '28' WHEN lang = 'de' THEN '55' ELSE 'aa' END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.com or +1-555-' || CAST(doc_id AS VARCHAR) AS doc
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(doc, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(doc, '\+1-555-[0-9]+')) AS INTEGER) AS n_phones,
        |  CAST(len(regexp_replace(regexp_replace(doc, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]+', '<PHONE>', 'g')) AS INTEGER) AS n_scrubbed_chars
        |FROM aug ORDER BY doc_id""".stripMargin,
    "pipeline_corpus" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM (
        |  SELECT arg_min(lang, doc_id) AS lang, arg_min(n_tokens, doc_id) AS n_tokens
        |  FROM (
        |    SELECT doc_id, lang,
        |      len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS n_tokens,
        |      sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
        |    FROM documents)
        |  WHERE n_tokens >= 5
        |  GROUP BY h)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_tokenize" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    "text_lang_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs, ${sqlDsum("n_chars")} AS sum_chars,
         |  ${sqlDavg("n_chars")} AS avg_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_bpe_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  (CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |     / CAST(length(text) AS DOUBLE)) AS punct_ratio,
        |  (CAST(len(list_filter(string_split(text, ' '),
        |        t -> list_contains(['the','a','of','and','to','in','is'], t))) AS DOUBLE)
        |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS stopword_ratio,
        |  ((CAST(length(text) AS DOUBLE) - CAST(len(string_split(text, ' ')) AS DOUBLE) + 1.0)
        |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |  (CAST(list_contains(toks,'the') AS INT) + CAST(list_contains(toks,'a') AS INT)
        |   + CAST(list_contains(toks,'of') AS INT) + CAST(list_contains(toks,'and') AS INT)
        |   + CAST(list_contains(toks,'row') AS INT)) AS en,
        |  (CAST(list_contains(toks,'el') AS INT) + CAST(list_contains(toks,'la') AS INT)
        |   + CAST(list_contains(toks,'de') AS INT) + CAST(list_contains(toks,'y') AS INT)
        |   + CAST(list_contains(toks,'que') AS INT)) AS es,
        |  (CAST(list_contains(toks,'le') AS INT) + CAST(list_contains(toks,'la') AS INT)
        |   + CAST(list_contains(toks,'et') AS INT) + CAST(list_contains(toks,'les') AS INT)
        |   + CAST(list_contains(toks,'des') AS INT)) AS fr
        |FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN en >= es AND en >= fr THEN 'en'
        |       WHEN es >= fr THEN 'es' ELSE 'fr' END AS guessed_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |tok2 AS (SELECT * FROM tok WHERE length(token) > 0),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tok2) GROUP BY token),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
        |SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  round(tf.tf * ln(n.n / CAST(df.df AS DOUBLE)), 4) AS tfidf
        |FROM tf JOIN df USING (token) CROSS JOIN n
        |WHERE tf.doc_id < 20
        |ORDER BY doc_id, token""".stripMargin
  )
}
