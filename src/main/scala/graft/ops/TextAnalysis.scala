package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (split/transform/filter/aggregate over arrays) — no UDFs, no shuffles
  * beyond the final aggregation, so each op is a narrow map over the scan
  * and survives any scale-up: per-row cost is O(tokens), data never leaves
  * the partition.
  */
object TextAnalysis {
  import Tables._

  /** Whitespace tokens (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count estimate: words + extra tokens for long words
    * (a word of length L costs ceil(L/4) subwords, floor 1) — a standard
    * whitespace+length heuristic when no tokenizer model is shipped.
    */
  def bpeishCount(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(4.0d))))

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopEs = Seq("el", "la", "de", "y", "que", "en", "un")
  private val stopDe = Seq("der", "die", "das", "und", "zu", "ist", "ein")

  private def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words))).cast("bigint")

  /** Token counts: whitespace + BPE-ish estimate. */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("bigint").as("n_tokens"),
      bpeishCount(col("text")).as("n_bpeish"),
      length(col("text")).cast("bigint").as("n_chars"))
      .orderBy("doc_id")

  /** Quality scoring: mean word length, stopword ratio, digit ratio, and a
    * blended 0..1 score — the shape of Gopher/C4-style quality filters.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val nTok = size(tokens(col("text"))).cast("double")
    val meanWordLen = (length(col("text")) - (nTok - 1)) / nTok
    val stopRatio = hitCount(col("text"), stopEn) / nTok
    val digitRatio = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
      length(col("text")).cast("double")
    documents(s, d).select(
      col("doc_id"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      // in-range word length + some stopwords + few digits → high quality
      round(
        when(meanWordLen.between(2.0, 12.0), 0.4).otherwise(0.0)
          + least(stopRatio * 3.0, lit(0.4))
          + when(digitRatio < 0.2, 0.2).otherwise(0.0), 6).as("quality"))
      .orderBy("doc_id")
  }

  /** Language ID: CJK-script regex, else argmax of per-language stopword
    * hits (n-gram/stopword heuristic — the no-model baseline).
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val en = hitCount(col("text"), stopEn)
    val es = hitCount(col("text"), stopEs)
    val de = hitCount(col("text"), stopDe)
    documents(s, d).select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      when(col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
        .when(en >= es && en >= de, "en")
        .when(es >= de, "es")
        .otherwise("de").as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: 64-bit content hash of normalized text plus a
    * rolling-shingle min-hash — the cheap building block for exact and
    * fuzzy identity (xxhash64 has no DuckDB twin → rows-only, pinned by
    * spec).
    */
  def fingerprint(s: SparkSession, d: String): DataFrame = {
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    documents(s, d).select(
      col("doc_id"),
      xxhash64(norm).as("content_hash"),
      array_min(transform(Dedup.shingles(col("text"), 3), sh => xxhash64(sh))).as("min_shingle_hash"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("t1_token_counts", tokenCounts, Some(
      // CAST AS BIGINT: DuckDB's list_sum over a BIGINT list yields HUGEINT
      // (float64 through pandas) — hash-mismatches Spark's int64 otherwise.
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> greatest(1, CAST(ceil(length(t) / 4.0::DOUBLE) AS BIGINT)))) AS BIGINT) AS n_bpeish,
        |  length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("t2_quality_score", qualityScore, Some(
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |    CAST(length(text) AS DOUBLE) AS n_chr,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS sw,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS dg
        |  FROM documents)
        |SELECT doc_id,
        |  round((n_chr - (n_tok - 1)) / n_tok, 6) AS mean_word_len,
        |  round(sw / n_tok, 6) AS stopword_ratio,
        |  round(dg / n_chr, 6) AS digit_ratio,
        |  round(
        |    (CASE WHEN (n_chr - (n_tok - 1)) / n_tok BETWEEN 2.0::DOUBLE AND 12.0::DOUBLE
        |          THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
        |    + least(sw / n_tok * 3.0::DOUBLE, 0.4::DOUBLE)
        |    + (CASE WHEN dg / n_chr < 0.2::DOUBLE THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END), 6) AS quality
        |FROM q ORDER BY doc_id""".stripMargin)),
    QueryDef("t3_lang_id", langId, Some(
      """SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is')))
        |         >= len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y','que','en','un')))
        |        AND len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is')))
        |         >= len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','zu','ist','ein')))
        |       THEN 'en'
        |       WHEN len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y','que','en','un')))
        |         >= len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','zu','ist','ein')))
        |       THEN 'es'
        |       ELSE 'de' END AS pred_lang
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("t4_fingerprint", fingerprint, None)
  )
}
