package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality operators beyond the cheap per-row heuristics in
  * [[TextOps.quality]]: rule-based document filtering (the Gopher rules),
  * within-document repetition detection, and corpus-LM familiarity
  * scoring — the three standard quality gates an LLM training-data
  * pipeline runs between crawl and tokenizer.
  *
  * Scale notes: gopher/repetition are narrow per-row array math (linear,
  * no shuffle beyond the final sort); the LM score is two shuffles
  * (corpus bigram counts, then an unhinted equi-join on the gram — the
  * counts side is Zipf-truncated by nothing, so no broadcast hint; AQE
  * may still pick one at small scale).
  */
object QualityOps {

  /** Whitespace words of the trimmed doc. */
  private val words = split(trim(col("text")), "\\s+")

  /** Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", appendix A1.1):
    * word-count bounds, mean-word-length band, alphabetic-word ratio,
    * stop-word presence. Emits the metrics AND the verdict so the gate is
    * auditable; every ratio is a double quotient of exact ints (engine-
    * deterministic). Line-based rules (bullet/ellipsis) are omitted — the
    * fixture corpus is single-line — but would be the same array math
    * over split(text, '\n'). */
  def gopherQuality(s: SparkSession, dir: String): DataFrame = {
    val nWords = size(words)
    val sumLen = aggregate(transform(words, w => length(w)), lit(0), (a, x) => a + x)
    val meanLen = sumLen.cast("double") / nWords.cast("double")
    val nAlpha = size(filter(words, w => w.rlike("[a-zA-Z]")))
    val alphaRatio = nAlpha.cast("double") / nWords.cast("double")
    val stops = array(Seq("the", "be", "to", "of", "and", "that", "have", "with", "a")
      .map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(words), stops))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        nWords.as("n_words"),
        meanLen.as("mean_word_len"),
        alphaRatio.as("alpha_word_ratio"),
        stopHits.as("stop_hits"),
        (nWords.between(50, 100000) &&
          meanLen.between(3.0, 10.0) &&
          alphaRatio > 0.8 &&
          stopHits >= 2).cast("int").as("passes"))
      .orderBy(col("doc_id"))
  }

  /** Word 2-grams of each doc, one row per occurrence. */
  private def bigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))")).as("g"))

  /** Within-document repetition (the Gopher/MassiveText repetition rules,
    * word-2-gram form): fraction of duplicate 2-gram occurrences and the
    * share of the single most frequent 2-gram. High values flag boiler-
    * plate/spam docs. Grouped per (doc, gram) then reduced per doc — two
    * map-side-combining shuffles keyed by doc_id, linear at corpus
    * scale. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    bigrams(s, dir)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        (sum(col("c")) - count(lit(1))).as("n_dup_bigrams"),
        max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_bigrams"), col("n_dup_bigrams"),
        (col("n_dup_bigrams").cast("double") / col("n_bigrams").cast("double"))
          .as("dup_frac"),
        (col("top_count").cast("double") / col("n_bigrams").cast("double"))
          .as("top_share"))
      .orderBy(col("doc_id"))

  /** Corpus-LM familiarity score — the integer-exact core of n-gram LM
    * perplexity filtering (train counts on the corpus, score each doc by
    * how familiar its n-grams are): per doc, the total corpus frequency
    * of its bigram occurrences, the number of OOV-ish occurrences (grams
    * seen nowhere else), and the mean familiarity. Training IS the
    * groupBy (distributed count), scoring IS the equi-join — the exact
    * shape a KenLM-style filter has at 100 TB, minus the float log. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(s, dir)
    val counts = bg.groupBy(col("g")).agg(count(lit(1)).as("corpus_c"))
    bg.join(counts, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("corpus_c")).as("familiarity"),
        sum(when(col("corpus_c") === 1, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_bigrams"), col("familiarity"), col("n_oov"),
        (col("familiarity").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_fam"))
      .orderBy(col("doc_id"))
  }

  /** URL/domain filtering — the crawl-hygiene gate every pipeline runs
    * before content filters: derive each doc's source URL (synthesized
    * deterministically here — the corpus has no real URLs; the OPERATOR is
    * the deliverable), extract the host with Spark's `parse_url`, drop
    * blocklisted domains with a broadcast anti-join (a blocklist is
    * bounded by construction — the one join in this family where a
    * broadcast hint is correct), and report per-host survivors. */
  def urlFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val url = concat(lit("https://"), col("source"), lit(".example-"),
      (col("doc_id") % 3).cast("string"), lit(".org/docs/"), col("doc_id").cast("string"))
    val blocklist = Seq("src3.example-0.org", "src7.example-1.org", "src12.example-2.org")
      .toDF("host")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), parse_url(url, lit("HOST")).as("host"))
      .join(broadcast(blocklist), Seq("host"), "left_anti")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("lang")).as("n_langs"))
      .orderBy(col("host"))
  }

  /** Tokens per dedup "line" and the deterministic planted footer (the
    * fixture corpus is single-line, so lines are derived as fixed 5-token
    * segments; the planted footer models the shared boilerplate line a
    * crawler sees on every templated page — same augmentation pattern as
    * [[urlFilter]]'s synthesized URLs and piiScrub's planted PII). */
  private val LineLen = 5
  private[text] val BoilerLine = "standard boilerplate footer unit notice"

  /** LINE-level exact deduplication (the CCNet/RefinedWeb line-dedup gate):
    * drop every line whose exact text occurs in ≥3 distinct documents
    * (headers/footers/nav/license lines), then reassemble each document
    * from its surviving lines in order. Reported per doc: line counts
    * before/after and the md5 of the reassembled text, so the oracle pins
    * the exact reconstruction.
    *
    * Scale shape: segmentation is narrow per-row array math; the
    * doc-frequency is one hash aggregation on the line key (distinct
    * (doc, line) first, also map-side combining); the reassembly is one
    * aggregation keyed by doc_id. No all-pairs comparison, state bounded
    * by distinct lines — the 100 TB form of line dedup. */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
    val natLines = transform(
      sequence(lit(0), ceil(size(col("toks")).cast("double") / lit(LineLen.toDouble)).cast("int") - 1),
      i => array_join(slice(col("toks"), i * LineLen + 1, lit(LineLen)), " "))
    val seg = Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("lines0", natLines)
      .withColumn("lines",
        when(col("doc_id") % 4 === 0, concat(col("lines0"), array(lit(BoilerLine))))
          .otherwise(col("lines0")))
      .select(col("doc_id"), size(col("lines")).as("n_lines"),
        posexplode(col("lines")).as(Seq("pos", "line")))
    // Optimization r17 (guide §3.2): join against the BANNED set (lines in
    // ≥3 docs — the boilerplate tail, orders of magnitude smaller than the
    // distinct-line universe) with an anti join, instead of inner-joining
    // every segment row to its df and filtering. Semantically identical
    // (every line has df ≥ 1, so inner-join+filter(df<3) ≡ anti vs df≥3);
    // physically it turns the big line-keyed shuffle of the exploded
    // segment frame into a join AQE can broadcast (banned is small), and
    // the df column never rides the wide side.
    val banned = seg.select(col("doc_id"), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3).select(col("line"))
    seg.join(banned, Seq("line"), "left_anti")
      .groupBy(col("doc_id"), col("n_lines"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), " ")).as("clean_md5"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_gopher_quality" -> (gopherQuality _),
    "text_repetition" -> (repetition _),
    "text_lm_score" -> (lmScore _),
    "text_url_filter" -> (urlFilter _),
    "text_line_dedup" -> (lineDedup _)
  )

  val oracle: Map[String, String] = Map(
    "text_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id, lang,
        |    source || '.example-' || CAST(doc_id % 3 AS VARCHAR) || '.org' AS host
        |  FROM documents)
        |SELECT host, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs
        |FROM u
        |WHERE host NOT IN ('src3.example-0.org', 'src7.example-1.org', 'src12.example-2.org')
        |GROUP BY host ORDER BY host""".stripMargin,
    "text_gopher_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(w) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
        |      / CAST(len(w) AS DOUBLE) AS mean_word_len,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |      / CAST(len(w) AS DOUBLE) AS alpha_word_ratio,
        |    len(list_intersect(list_distinct(w),
        |      ['the','be','to','of','and','that','have','with','a'])) AS stop_hits
        |  FROM t)
        |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, mean_word_len,
        |  alpha_word_ratio, CAST(stop_hits AS INTEGER) AS stop_hits,
        |  CAST(n_words BETWEEN 50 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND alpha_word_ratio > 0.8
        |    AND stop_hits >= 2 AS INTEGER) AS passes
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        |  FROM tok, UNNEST(range(1, len(w))) AS t(i)
        |  WHERE len(w) >= 2),
        |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_bigrams,
        |  CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share
        |FROM gc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        |  FROM tok, UNNEST(range(1, len(w))) AS t(i)
        |  WHERE len(w) >= 2),
        |counts AS (SELECT g, COUNT(*) AS corpus_c FROM grams GROUP BY g)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(corpus_c) AS BIGINT) AS familiarity,
        |  CAST(SUM(CASE WHEN corpus_c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(corpus_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_fam
        |FROM grams JOIN counts USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_line_dedup" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS w
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS ord FROM tok),
        |nat AS (
        |  SELECT doc_id, CAST(FLOOR((ord - 1) / 5) AS INTEGER) AS pos,
        |    string_agg(t, ' ' ORDER BY ord) AS line
        |  FROM flat GROUP BY doc_id, FLOOR((ord - 1) / 5)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n_nat FROM nat GROUP BY doc_id),
        |segs AS (
        |  SELECT doc_id, pos, line FROM nat
        |  UNION ALL
        |  SELECT doc_id, CAST(n_nat AS INTEGER) AS pos,
        |    'standard boilerplate footer unit notice' AS line
        |  FROM cnt WHERE doc_id % 4 = 0),
        |nl AS (SELECT doc_id, COUNT(*) AS n_lines FROM segs GROUP BY doc_id),
        |dfq AS (SELECT line, COUNT(*) AS df
        |        FROM (SELECT DISTINCT doc_id, line FROM segs) GROUP BY line)
        |SELECT s.doc_id, CAST(nl.n_lines AS INTEGER) AS n_lines, COUNT(*) AS n_kept,
        |  md5(string_agg(s.line, ' ' ORDER BY s.pos)) AS clean_md5
        |FROM segs s JOIN dfq USING (line) JOIN nl ON nl.doc_id = s.doc_id
        |WHERE dfq.df < 3
        |GROUP BY s.doc_id, nl.n_lines
        |ORDER BY s.doc_id""".stripMargin
  )
}
