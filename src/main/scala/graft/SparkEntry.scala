package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each SURVEY.md §2 operator key maps to one entry in `queries`; where the
  * semantics are ANSI-SQL-expressible the DuckDB twin lives in `oracleSql`
  * (same column names, total ORDER BY, decimal-exact aggregates — §7.3).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Aggregates.queries ++ Filters.queries ++ Joins.queries ++
      Windows.queries ++ SetOps.queries ++ Scalars.queries ++
      graft.sources.IngestOps.queries ++ graft.sources.LakeOps.queries ++
      graft.sources.CryptoOps.queries ++
      TextOps.queries ++ RetrievalOps.queries ++
      CdcOps.queries ++ DqOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++
      MultimodalOps.queries ++ GenOps.queries ++
      PipelineOps.queries ++ RobustOps.queries ++
      graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Aggregates.oracles ++ Filters.oracles ++ Joins.oracles ++
      Windows.oracles ++ SetOps.oracles ++ Scalars.oracles ++
      graft.sources.IngestOps.oracles ++ graft.sources.LakeOps.oracles ++
      graft.sources.CryptoOps.oracles ++
      TextOps.oracles ++ RetrievalOps.oracles ++
      CdcOps.oracles ++ DqOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++
      MultimodalOps.oracles ++ GenOps.oracles ++
      PipelineOps.oracles ++ RobustOps.oracles ++
      graft.streaming.StreamingOps.oracles
}
