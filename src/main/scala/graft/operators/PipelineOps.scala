package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-data curation operators over `documents` (SURVEY.md §2j tier):
  * duplicate-cluster resolution, deterministic stratified sampling,
  * train/val/test splitting, and domain-mixture weighting — the steps a
  * large-scale LLM data pipeline runs between dedup and tokenization.
  *
  * Scale design: sampling/splitting are pure per-row hash expressions (no
  * shuffle, no RNG state — the same row always lands in the same split on
  * any cluster size, which is what makes a 100 TB re-run reproducible).
  * Clustering is iterative min-label propagation over the near-dup edge
  * list — each step one shuffle join, the Pregel/GraphX formulation —
  * with lineage truncated per step so the plan stays bounded.
  */
object PipelineOps {

  /** Multiplicative integer hash → uniform bucket in [0, m). Spelled
    * identically in the DuckDB twin (`(doc_id * K) % m`); pure integer
    * arithmetic, so both engines agree bit-for-bit. K primes chosen
    * per-use so sampling and splitting decisions are independent. */
  private def hashBucket(id: org.apache.spark.sql.Column, k: Long,
      m: Long): org.apache.spark.sql.Column = pmod(id * lit(k), lit(m))

  /** `dedup_cluster` — resolve near-dup PAIRS into duplicate GROUPS:
    * connected components over the Jaccard ≥ 0.5 edge list, by iterative
    * min-label propagation (each doc's label converges to the smallest
    * doc_id reachable from it — the canonical representative a dedup
    * pipeline keeps). The loop is the Pregel formulation: per step, every
    * node takes the min of its own and its neighbours' labels — one
    * shuffle join + one aggregation per step, O(diameter) steps; at 100 TB
    * this is exactly GraphX connectedComponents' shape. Lineage is
    * truncated per iteration (localCheckpoint) so the plan doesn't grow
    * with the step count; convergence is detected by a changed-label
    * count (an aggregate action, not a data collect). */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter($"doc_id" < 40)
    val edges = DedupOps.jaccardPairs(docs, 0.5)
      .select($"da".as("src"), $"db".as("dst"))
    val sym = edges.union(edges.select($"dst", $"src"))
      .toDF("src", "dst").localCheckpoint()
    var labels = docs.select($"doc_id".as("node"), $"doc_id".as("label"))
      .localCheckpoint()
    // labels only ever decrease under min-propagation, so the label sum
    // is a strictly-decreasing convergence metric: one tiny aggregate on
    // the checkpointed result per step instead of a diff join
    def labelSum() = labels.agg(sum($"label")).head.getLong(0)
    var prevSum = labelSum()
    var converged = false
    var steps = 0
    while (!converged && steps < 20) {
      val nbr = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src").as("node"), labels("label"))
      labels = labels.union(nbr)
        .groupBy($"node").agg(min($"label").as("label"))
        .localCheckpoint()
      val s = labelSum()
      converged = s == prevSum
      prevSum = s
      steps += 1
    }
    labels
      .groupBy($"label".as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max($"node").as("max_doc"))
      .orderBy($"cluster_id")
  }

  /** `sample_stratified` — deterministic per-language downsampling: the
    * dominant language keeps 25 % of docs, the rest keep 75 %, decided by
    * a per-row multiplicative hash of doc_id (no RNG — re-runs and
    * cluster-size changes can't move a row in or out of the sample). The
    * filter is a narrow codegen'd expression; only the per-stratum audit
    * count shuffles. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rate = when($"lang" === "en", lit(250L)).otherwise(lit(750L))
    Tables.documents(spark, dir)
      .withColumn("kept",
        (hashBucket($"doc_id", 2654435761L, 1000L) < rate).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_total"), sum($"kept").as("n_kept"))
      .orderBy($"lang")
  }

  /** `split_train_test` — deterministic 80/10/10 train/val/test split by
    * an independent doc_id hash (different multiplier than the sampler, so
    * split and sample membership are uncorrelated). Per-row expression,
    * no shuffle until the audit aggregate; a doc's split assignment is
    * stable across re-runs, partition counts, and cluster sizes — the
    * property that keeps eval sets uncontaminated at 100 TB. */
  def splitTrainTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = hashBucket($"doc_id", 179426549L, 100L)
    Tables.documents(spark, dir)
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"lang").as("n_langs"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"split")
  }

  /** `domain_mix` — per-language sampling weights to hit a target mixture
    * (uniform 20 % per language here): weight = target_share /
    * actual_share. One aggregation + a window total; the weights feed a
    * weighted sampler (`sample_stratified`'s hash with per-stratum rates)
    * in a real pipeline. */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum($"n_docs").over(all))
      .select($"lang", $"n_docs",
        round($"n_docs".cast("double") / $"total".cast("double"), 6)
          .as("share"),
        round(lit(0.2) * $"total".cast("double") /
          $"n_docs".cast("double"), 6).as("weight"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cluster" -> (dedupCluster _),
    "sample_stratified" -> (sampleStratified _),
    "split_train_test" -> (splitTrainTest _),
    "domain_mix" -> (domainMix _))

  /** Shared CTE text: Jaccard ≥ 0.5 character-3-gram pairs (the twin of
    * [[DedupOps.jaccardPairs]] over doc_id < 40). */
  private val EDGES =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(text) - 1, 2)),
      |    i -> substr(text, i::INT, 3)))) AS s
      |  FROM documents WHERE doc_id < 40),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT da, db FROM pairs
      |  JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
      |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.5)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_cluster" ->
      s"""WITH RECURSIVE $EDGES,
         |sym AS (SELECT da AS s, db AS d FROM edges
         |        UNION ALL SELECT db, da FROM edges),
         |reach(node, l) AS (
         |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 40
         |  UNION
         |  SELECT s.d, r.l FROM reach r JOIN sym s ON r.node = s.s),
         |lab AS (SELECT node, MIN(l) AS cluster_id FROM reach GROUP BY node)
         |SELECT cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc
         |FROM lab GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN (doc_id * 2654435761) % 1000 <
        |    (CASE WHEN lang = 'en' THEN 250 ELSE 750 END)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "split_train_test" ->
      """SELECT CASE WHEN (doc_id * 179426549) % 100 < 80 THEN 'train'
        |            WHEN (doc_id * 179426549) % 100 < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "domain_mix" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  round(CAST(COUNT(*) AS DOUBLE) /
        |    CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share,
        |  round(0.2 * CAST(SUM(COUNT(*)) OVER () AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS weight
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
}
