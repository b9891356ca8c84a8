package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Adversarial-input hardening surface (round-14 verdict ask #1): a
  * deterministic MALFORMED corpus — empty/null/whitespace-only text,
  * 1-char docs, punctuation-only, pathological repetition, non-ASCII,
  * control characters — defined once as a doc_id-keyed CASE mutation of
  * the `documents` table so BOTH engines derive bit-identical hostile
  * rows, plus oracle keys that drive the curation-tier pipelines over
  * it. The reference's own null-safe partition-value handling
  * (`HiddenPartitionLoader.java:217-220`) is the analogous discipline:
  * hostile values get an explicit, checked path, never undefined
  * behavior. RobustnessSpec drives the whole 2j tier over a scratch
  * corpus built from the same cases (plus hostile embeddings, which
  * SQL can't plant in a parquet-backed oracle table).
  */
object RobustOps {

  /** The hostile text for case index m (0-11; 11 = original text
    * passthrough so real data flows through the same key). Each case is
    * expressed with engine-portable builtins only (chr/repeat/literals)
    * so the DuckDB twin [[MALFORMED_TEXT_SQL]] is generated from the
    * same table. */
  private val CASES: Seq[(Column, String)] = Seq(
    lit("") -> "''",
    lit(null).cast("string") -> "NULL",
    lit(" ") -> "' '",
    concat(expr("char(9)"), lit(" "), expr("char(10)"),
      expr("char(13)"), lit(" ")) ->
      "chr(9) || ' ' || chr(10) || chr(13) || ' '",
    lit("a") -> "'a'",
    lit("!?!?.,;:") -> "'!?!?.,;:'",
    repeat(lit("ab "), 2000) -> "repeat('ab ', 2000)",
    lit("héllo wörld 漢字 🙂 café") -> "'héllo wörld 漢字 🙂 café'",
    concat(expr("char(1)"), lit("ctl"), expr("char(127)"), lit("x")) ->
      "chr(1) || 'ctl' || chr(127) || 'x'",
    repeat(lit("x"), 5000) -> "repeat('x', 5000)",
    lit("0123456789 42 42 42") -> "'0123456789 42 42 42'")

  private val N_IDS = 48

  /** Spark side of the malformed corpus: doc_id < 48, text mutated by
    * doc_id % 12 (4 docs per hostile case, 4 originals). */
  private[graft] def malformedText(docId: Column, text: Column): Column =
    CASES.zipWithIndex.foldRight(text) { case (((col, _), i), acc) =>
      when(pmod(docId, lit(12)) === i, col).otherwise(acc)
    }

  private[graft] def malformedDocs(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).filter($"doc_id" < N_IDS)
      .select($"doc_id", malformedText($"doc_id", $"text").as("text"))
  }

  /** DuckDB side: the same CASE over the same rows. */
  private[operators] val MALFORMED_SRC: String = {
    val whens = CASES.zipWithIndex.map { case ((_, sql), i) =>
      s"WHEN $i THEN $sql" }.mkString("\n    ")
    s"""SELECT doc_id, CASE CAST(doc_id % 12 AS INT)
       |    $whens
       |    ELSE text END AS text
       |  FROM documents WHERE doc_id < $N_IDS""".stripMargin
  }

  /** `robust_token_count` — [[TextOps.textTokenCount]]'s tokenizers over
    * the malformed corpus, with null-ness and char count made explicit
    * columns: NULL text yields NULL counts (not a crash, not -1, not a
    * phantom zero), empty/whitespace docs yield defined zeros, control
    * characters and multibyte text count identically in both engines. */
  def robustTokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    malformedDocs(spark, dir)
      .select($"doc_id",
        $"text".isNull.as("is_null"),
        length($"text").cast("long").as("n_chars"),
        size(expr(
          "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
          .cast("long").as("n_bpe_tokens"),
        size(TextOps.tokens($"text")).cast("long").as("n_ws_tokens"))
      .orderBy($"doc_id")
  }

  /** `robust_dedup_minhash` — the full MinHash-LSH pipeline
    * ([[DedupOps.minhashPipeline]], portable hash family) over the
    * malformed corpus: null docs are dropped (no similarity evidence),
    * each hostile case's identical copies are found as exact-Jaccard-1
    * pairs, and the empty-vs-whitespace docs do NOT collapse into one
    * group — all hash-checked against the DuckDB replay of the same
    * pipeline over the same CASE mutation. */
  def robustDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashPipeline(malformedDocs(spark, dir),
      nHashes = 16, bandSize = 4, threshold = 0.4, portable = true)

  /** `robust_bm25` — the full BM25 retrieval pipeline
    * ([[RetrievalOps.bm25TopkOver]]) over the malformed corpus: null
    * text scores as the empty doc (0.0, never a poisoned stats row),
    * whitespace/punctuation docs get defined zero term frequencies,
    * and the degenerate lengths (1 token vs 4000) ride the dl/avgdl
    * normalization — all hash-checked against the DuckDB replay of
    * the same CASE mutation. */
  def robustBm25(spark: SparkSession, dir: String): DataFrame =
    RetrievalOps.bm25TopkOver(malformedDocs(spark, dir))

  /** `robust_multimodal` — the frame-decomposition pipeline
    * ([[MultimodalOps.framesOver]], byte counts included) over the
    * malformed corpus: empty/null/whitespace payloads are EXPLICITLY
    * zero frames with NULL digests (unguarded sequence arithmetic
    * yields phantom frames — the exact divergence this key exists to
    * catch), 5-6 KB repeats decompose into full frame runs, and the
    * multibyte case pins char-framing vs byte-counting on both
    * engines. */
  def robustMultimodal(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.framesOver(malformedDocs(spark, dir))

  /** `robust_partition_derive` — the reference's null-partition-value
    * case (`HiddenPartitionLoader.java:217-220`) as an oracle key:
    * hidden-partition values derived from a CASE-mutated events subset
    * where every 5th row's ts is NULL. Null rows land in the EXPLICIT
    * null cell (Hive's `__HIVE_DEFAULT_PARTITION__` convention — the
    * same place Spark's own partitioned writer files them), lose
    * nothing, and the derived directory path is a defined string for
    * every row — cross-engine, not just spec-asserted. */
  def robustPartitionDerive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nullCell = "__HIVE_DEFAULT_PARTITION__"
    def cell(prefix: String, c: Column): Column =
      concat(lit(prefix), coalesce(c.cast("string"), lit(nullCell)))
    Tables.events(spark, dir).filter($"event_id" < 200)
      .select($"event_id",
        when(pmod($"event_id", lit(5)) === 0, lit(null).cast("timestamp"))
          .otherwise($"ts").as("ts"))
      .select($"event_id",
        year($"ts").cast("long").as("year"),
        month($"ts").cast("long").as("month"),
        dayofmonth($"ts").cast("long").as("day"),
        $"ts".isNull.as("null_cell"),
        concat(cell("year=", year($"ts")), cell("/month=", month($"ts")),
          cell("/day=", dayofmonth($"ts"))).as("part_path"))
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "robust_token_count" -> (robustTokenCount _),
    "robust_dedup_minhash" -> (robustDedupMinhash _),
    "robust_bm25" -> (robustBm25 _),
    "robust_multimodal" -> (robustMultimodal _),
    "robust_partition_derive" -> (robustPartitionDerive _))

  private val TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

  val oracles: Map[String, String] = Map(
    "robust_token_count" ->
      s"""WITH m AS ($MALFORMED_SRC)
         |SELECT doc_id, text IS NULL AS is_null,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         |    AS n_bpe_tokens,
         |  len($TOKS) AS n_ws_tokens
         |FROM m ORDER BY doc_id""".stripMargin,
    "robust_dedup_minhash" -> DedupOps.minhashOracle(MALFORMED_SRC),
    "robust_bm25" -> RetrievalOps.bm25OracleSql(MALFORMED_SRC),
    "robust_multimodal" ->
      MultimodalOps.framesOracleSql(s"($MALFORMED_SRC)", withBytes = true),
    "robust_partition_derive" ->
      """WITH m AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE ts END AS ts
        |  FROM events WHERE event_id < 200)
        |SELECT event_id,
        |  year(ts) AS year, month(ts) AS month, day(ts) AS day,
        |  ts IS NULL AS null_cell,
        |  'year=' || coalesce(CAST(year(ts) AS VARCHAR),
        |      '__HIVE_DEFAULT_PARTITION__')
        |  || '/month=' || coalesce(CAST(month(ts) AS VARCHAR),
        |      '__HIVE_DEFAULT_PARTITION__')
        |  || '/day=' || coalesce(CAST(day(ts) AS VARCHAR),
        |      '__HIVE_DEFAULT_PARTITION__') AS part_path
        |FROM m ORDER BY event_id""".stripMargin)
}
