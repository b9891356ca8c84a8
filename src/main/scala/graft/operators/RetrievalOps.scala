package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** North-star retrieval operators over `documents` + `embeddings`
  * (SURVEY.md §2j): BM25 lexical ranking and hybrid lexical+vector
  * fusion — the retrieval stack a training-data pipeline runs for
  * contamination checks, eval-set mining, and RAG corpus curation.
  * The reference has no retrieval tier at all (its reads are
  * time-travel/partition scans —
  * `aig/TimeBasedPartitioningExamples.java:144`); this is part of the
  * extended X-tier surface, same as the ANN family.
  *
  * Scale design: BM25 needs only (a) one reduce to a SINGLE stats row
  * — N, avgdl, and one document-frequency counter per query term
  * (query terms are a handful; each df is a conditional count in the
  * same aggregate) — and (b) one per-row map over that broadcast row.
  * No explode, no term-table shuffle: the per-doc term frequencies are
  * scalar array expressions, so the whole scoring pass is a scan +
  * TakeOrdered. At 100 TB the stats row is the only global state, and
  * it is corpus metadata an ingest pipeline would maintain
  * incrementally anyway. The fusion op ranks two top-50 lists (each
  * produced by a distributed TakeOrdered) inside 50-row single
  * partition windows — the global-window warning is the plan working
  * as designed: ranking 50 rows IS driver-scale metadata.
  *
  * All float math is float64 with the same textual operation order as
  * the DuckDB twins (decimal literals promote to double on both sides
  * because one operand is always double; the RRF oracle casts `1.0`
  * explicitly — bare `1.0 / BIGINT` is DECIMAL division in DuckDB),
  * and ordering keys are the ROUNDED scores so top-k membership can
  * never diverge on a 1-ulp tail.
  */
object RetrievalOps {

  /** Fixed query: one rare term (df≈5% — carries the idf signal) and
    * two common ones (tf and length normalization do the work). */
  private val Terms = Seq("dup", "merge", "vector")

  /** (doc_id, dl, tf1..tfN) — per-row scalar expressions only; null
    * text (hostile corpus) coalesces to the empty doc, which scores
    * 0.0 rather than poisoning the stats row. Tokenization and term
    * counting are [[TextOps.tokens]]/[[TextOps.countIn]] — the ONE
    * codegen'd tokenizer contract the whole text tier shares. */
  private def projected(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextOps.tokens(coalesce($"text", lit("")))
    val tfs = Terms.zipWithIndex.map { case (term, i) =>
      TextOps.countIn(toks, term).cast("double").as(s"tf${i + 1}")
    }
    docs.select($"doc_id" +: size(toks).cast("double").as("dl") +: tfs: _*)
  }

  /** The single corpus-stats row: N, avgdl, df per query term. */
  private def stats(p: DataFrame): DataFrame = {
    val dfs = Terms.indices.map(i =>
      sum(when(col(s"tf${i + 1}") > 0, 1).otherwise(0)).cast("double")
        .as(s"df${i + 1}"))
    val cols =
      count(lit(1)).cast("double").as("n") +:
        (sum(col("dl").cast("long")).cast("double") / count(lit(1)))
          .as("avgdl") +: dfs
    p.agg(cols.head, cols.tail: _*)
  }

  /** One term's BM25 contribution (k1=1.2, b=0.75), 0.0 when the term
    * is absent — textual twin of the oracle's CASE arm. */
  private def termScore(tf: Column, df: Column): Column =
    when(tf > 0,
      log(lit(1) + (col("n") - df + 0.5) / (df + 0.5)) *
        ((tf * 2.2) /
          (tf + lit(1.2) * (lit(0.25) +
            lit(0.75) * (col("dl") / col("avgdl"))))))
      .otherwise(0.0)

  private def bm25Col: Column = {
    val parts = Terms.indices.map(i =>
      termScore(col(s"tf${i + 1}"), col(s"df${i + 1}")))
    round(parts.reduceLeft(_ + _), 6)
  }

  /** The BM25 top-20 pipeline over ANY (doc_id, text) relation — the
    * key's corpus by default; RobustOps replays it over the malformed
    * corpus to pin the hostile semantics (null text = empty doc = 0.0,
    * degenerate lengths ride the dl/avgdl normalization). */
  private[operators] def bm25TopkOver(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the stats reduce and the scoring map both read p — an EAGER
    // localCheckpoint tokenizes the corpus once (measured 35% off the
    // key; the narrow (id, dl, tfs) projection is a sliver of the
    // corpus). Eager on purpose: the first consumer of p is the
    // broadcast stats row, and a lazy checkpoint would materialize the
    // whole tokenize pass INSIDE the BroadcastExchange relationFuture,
    // putting the corpus scan under spark.sql.broadcastTimeout (300 s
    // default) — a failure mode the construction-time job cannot hit.
    // At 100 TB the same tradeoff is persist(DISK_ONLY), or the stats
    // row comes from ingest-maintained corpus metadata and the scoring
    // pass is the only scan.
    val p = projected(docs).localCheckpoint(true)
    val named = Terms.zipWithIndex.map { case (term, i) =>
      col(s"tf${i + 1}").cast("long").as(s"tf_$term")
    }
    p.crossJoin(broadcast(stats(p)))
      .select(($"doc_id" +: $"dl".cast("long").as("n_tokens") +: named) :+
        bm25Col.as("bm25"): _*)
      .orderBy($"bm25".desc, $"doc_id")
      .limit(20)
  }

  /** `text_bm25_topk` — top-20 docs for the fixed query by Okapi BM25.
    * One stats reduce + one broadcast map + TakeOrdered; see object doc
    * for the 100 TB shape. */
  def textBm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25TopkOver(Tables.documents(spark, dir))

  /** `sim_hybrid_rrf` — reciprocal-rank fusion (k=60) of the BM25
    * top-50 and the cosine-kNN top-50 for query vector 0: the standard
    * hybrid-retrieval merge. Each candidate list is a distributed
    * TakeOrdered on its ROUNDED score; ranking and fusing the two
    * 50-row lists is metadata-scale work by construction. */
  def simHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // eager for the same broadcastTimeout reason as [[bm25TopkOver]]
    val p = projected(Tables.documents(spark, dir)).localCheckpoint(true)
    val b = p.crossJoin(broadcast(stats(p)))
      .filter($"doc_id" =!= 0)
      .select($"doc_id".as("id"), bm25Col.as("bm25"))
      .orderBy($"bm25".desc, $"id").limit(50)
    val br = b.withColumn("bm25_rank",
        row_number().over(Window.orderBy($"bm25".desc, $"id"))
          .cast("long"))
      .select($"id", $"bm25_rank")
    val e = Tables.embeddingsValid(spark, dir)
      .select($"vec_id", $"embedding")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val v = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id".as("id"),
        round(graft.functions.VectorFunctions.cosine(
          $"embedding", $"q_emb"), 6).as("cos"))
      .orderBy($"cos".desc, $"id").limit(50)
    val vr = v.withColumn("vec_rank",
        row_number().over(Window.orderBy($"cos".desc, $"id"))
          .cast("long"))
      .select($"id", $"vec_rank")
    br.join(vr, Seq("id"), "full_outer")
      .select($"id", $"bm25_rank", $"vec_rank",
        round(
          coalesce(lit(1.0) / (lit(60) + $"bm25_rank"), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + $"vec_rank"), lit(0.0)),
          6).as("rrf_score"))
      .orderBy($"rrf_score".desc, $"id")
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25_topk" -> (textBm25Topk _),
    "sim_hybrid_rrf" -> (simHybridRrf _))

  private val TOKS = TextOps.toksSql("coalesce(text, '')")

  private def tfSql(term: String) =
    s"CAST(len(list_filter($TOKS, x -> x = '$term')) AS DOUBLE)"

  /** p/s CTEs shared by the oracles — the DuckDB twin of
    * [[projected]] + [[stats]], over any (doc_id, text) relation. */
  private def bm25Ctes(source: String): String = {
    val tfs = Terms.zipWithIndex
      .map { case (t, i) => s"    ${tfSql(t)} AS tf${i + 1}" }
      .mkString(",\n")
    val dfs = Terms.indices.map(i =>
      s"    CAST(SUM(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END)" +
        s" AS DOUBLE) AS df${i + 1}").mkString(",\n")
    s"""p AS (
       |  SELECT doc_id, CAST(len($TOKS) AS DOUBLE) AS dl,
       |$tfs
       |  FROM ($source)),
       |s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl,
       |$dfs
       |  FROM p)""".stripMargin
  }

  private val CORPUS_SRC = "SELECT doc_id, text FROM documents"
  private val BM25_CTES = bm25Ctes(CORPUS_SRC)

  /** Twin of [[termScore]] — identical operation order; every literal
    * meets a DOUBLE operand, so DuckDB promotes as Spark does. */
  private def termScoreSql(i: Int) =
    s"(CASE WHEN tf$i > 0 THEN " +
      s"ln(1 + (n - df$i + 0.5) / (df$i + 0.5)) * " +
      s"((tf$i * 2.2) / (tf$i + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) " +
      "ELSE 0.0 END)"

  private val BM25_SQL =
    s"round(${Terms.indices.map(i => termScoreSql(i + 1)).mkString(" + ")}, 6)"

  /** Full DuckDB replay of [[bm25TopkOver]] over `source` — generated
    * from the same Terms list, so the robustness key can never drift
    * from the corpus key. */
  private[operators] def bm25OracleSql(source: String): String = {
    val named = Terms.zipWithIndex.map { case (t, i) =>
      s"  CAST(tf${i + 1} AS BIGINT) AS tf_$t" }.mkString(",\n")
    s"""WITH ${bm25Ctes(source)}
       |SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
       |$named,
       |  $BM25_SQL AS bm25
       |FROM p, s
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "text_bm25_topk" -> bm25OracleSql(CORPUS_SRC),
    "sim_hybrid_rrf" ->
      s"""WITH $BM25_CTES,
         |b AS (
         |  SELECT doc_id AS id, $BM25_SQL AS bm25
         |  FROM p, s WHERE doc_id <> 0
         |  ORDER BY bm25 DESC, id LIMIT 50),
         |br AS (SELECT id,
         |  row_number() OVER (ORDER BY bm25 DESC, id) AS bm25_rank
         |  FROM b),
         |v AS (
         |  SELECT e.vec_id AS id,
         |    round(${SimilarityOps.cosSql("e.embedding", "q.embedding")}, 6) AS cos
         |  FROM embeddings e,
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0
         |  ORDER BY cos DESC, id LIMIT 50),
         |vr AS (SELECT id,
         |  row_number() OVER (ORDER BY cos DESC, id) AS vec_rank
         |  FROM v)
         |SELECT coalesce(br.id, vr.id) AS id, bm25_rank, vec_rank,
         |  round(
         |    coalesce(CAST(1.0 AS DOUBLE) / (60 + bm25_rank), 0.0) +
         |    coalesce(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0.0),
         |    6) AS rrf_score
         |FROM br FULL OUTER JOIN vr ON br.id = vr.id
         |ORDER BY rrf_score DESC, id LIMIT 10""".stripMargin)
}
