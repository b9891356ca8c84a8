package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** North-star text-analysis operators over `documents` (SURVEY.md §2j):
  * language-ID heuristic, quality scoring, token counting, fingerprinting,
  * term frequencies. All are per-row expression pipelines (no shuffle except
  * the final aggregates) and whole-stage-codegen-friendly, so they stream at
  * scan speed over 100 TB.
  */
object TextOps {

  /** Whitespace tokens, empties dropped. */
  private def tokens(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), t => t =!= "")

  /** `text_stats` — per-doc char/token counts + mean token length. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"lang" === "en")
      .select($"doc_id", $"lang", $"n_chars",
        length($"text").cast("long").as("n_chars_measured"),
        size(tokens($"text")).cast("long").as("n_tokens"),
        (aggregate(transform(tokens($"text"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") /
          size(tokens($"text"))).as("mean_token_len"))
      .orderBy($"doc_id")
  }

  /** `text_langid` — n-gram/stopword language heuristic: count marker
    * tokens per language family, pick the dominant. (The corpus text is
    * synthetic; the heuristic's value is exercising the shape.) */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val nThe = size(filter(toks, t => t === "the" || t === "a"))
    val nData = size(filter(toks, t => t === "data" || t === "table"))
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        nThe.cast("long").as("n_en_markers"),
        nData.cast("long").as("n_domain_markers"),
        when(nThe > 0, "en").otherwise("unk").as("lang_guess"))
      .orderBy($"doc_id")
  }

  /** `text_quality` — length / punctuation / stopword-ratio scoring. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nChars = length($"text").cast("long")
    val nAlnum = length(regexp_replace($"text", "[^a-zA-Z0-9 ]", ""))
      .cast("long")
    val toks = tokens($"text")
    val nToks = size(toks).cast("long")
    val nStop = size(filter(toks,
      t => t === "the" || t === "a" || t === "and" || t === "of"))
      .cast("long")
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", nChars.as("n_chars_m"),
        (nChars - nAlnum).as("n_punct"),
        ((nChars - nAlnum).cast("double") / nChars).as("punct_ratio"),
        nToks.as("n_tokens"),
        (nStop.cast("double") / nToks).as("stopword_ratio"),
        (nToks.between(5, 1000) &&
          ((nChars - nAlnum).cast("double") / nChars) < lit(0.2))
          .as("quality_ok"))
      .orderBy($"doc_id")
  }

  /** `text_token_count` — BPE-ish regex tokenizer count: word pieces,
    * number runs, single punctuation marks. */
  def textTokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(expr(
          "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
          .cast("long").as("n_bpe_tokens"),
        size(tokens($"text")).cast("long").as("n_ws_tokens"))
      .orderBy($"doc_id")
  }

  /** `text_fingerprint` — normalized-content digest (md5 of
    * lower+whitespace-collapsed text) + polynomial rolling hash of the
    * character stream (mod 1e9+7, seeded by the first char — identical
    * fold in DuckDB's list_reduce). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val norm = lower(trim(regexp_replace($"text", "\\s+", " ")))
    val charCodes = transform(split($"text", ""), c => ascii(c).cast("long"))
    val rolling = aggregate(
      slice(charCodes, 2, 1000000), element_at(charCodes, 1),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L)))
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(norm.cast("binary")).as("content_md5"),
        substring(md5(norm.cast("binary")), 1, 16).as("fp16"),
        rolling.as("rolling_hash"))
      .orderBy($"doc_id")
  }

  /** `tf_top_terms` — corpus term frequency via explode (UDTF shape):
    * top-20 terms, count-desc then term for a total order. */
  def tfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term")
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (textStats _),
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_token_count" -> (textTokenCount _),
    "text_fingerprint" -> (textFingerprint _),
    "tf_top_terms" -> (tfTopTerms _))

  private val TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id, lang, n_chars, length(text) AS n_chars_measured,
         |  len($TOKS) AS n_tokens,
         |  CAST(list_sum(list_transform($TOKS, t -> length(t))) AS DOUBLE)
         |    / len($TOKS) AS mean_token_len
         |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang,
         |  len(list_filter($TOKS, t -> t = 'the' OR t = 'a'))
         |    AS n_en_markers,
         |  len(list_filter($TOKS, t -> t = 'data' OR t = 'table'))
         |    AS n_domain_markers,
         |  CASE WHEN len(list_filter($TOKS, t -> t = 'the' OR t = 'a')) > 0
         |    THEN 'en' ELSE 'unk' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, lang, length(text) AS n_chars_m,
         |  length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |  len($TOKS) AS n_tokens,
         |  CAST(len(list_filter($TOKS, t -> t IN ('the','a','and','of'))) AS DOUBLE) / len($TOKS) AS stopword_ratio,
         |  len($TOKS) BETWEEN 5 AND 1000 AND
         |    CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text) < 0.2 AS quality_ok
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         |    AS n_bpe_tokens,
         |  len($TOKS) AS n_ws_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |    AS content_md5,
        |  substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 16)
        |    AS fp16,
        |  list_reduce(
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tf_top_terms" ->
      s"""SELECT term, COUNT(*) AS n FROM (
         |  SELECT unnest($TOKS) AS term FROM documents
         |) GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin)
}
