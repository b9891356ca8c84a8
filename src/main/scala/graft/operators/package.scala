package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-deterministic query authoring.
  *
  * The driver hash-compares each query's parquet dump against DuckDB running
  * the twin SQL from `SparkEntry.oracleSql` (SURVEY.md §5.1, §7.3). Floating
  * sums are order-dependent, so every money/metric aggregate goes through
  * exact decimal arithmetic and is only converted to double at the very end
  * — both engines then produce bit-identical doubles.
  */
package object operators {
  /** Exact 2-dp decimal view of a double column (money / metric values).
    * Twin DuckDB spelling: `CAST(x AS DECIMAL(18,2))`. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a double column, surfaced as double.
    * Twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average: decimal sum divided by count, in double at the end.
    * Twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** The reference's cyclic categorical vocabularies (Creator:219-243),
    * defined ONCE for both consumers — the event generator
    * (GenOps.genEvents) and the scalar cycle key (Scalars.fnModCycle) —
    * and their SQL twins via [[sqlList]]: editing a vocabulary updates
    * every consumer or none, instead of silently forking the "same"
    * domain across files. */
  val AiProviders: Seq[String] =
    Seq("openai", "anthropic", "cohere", "google", "aws-bedrock")
  val AiModels: Seq[String] =
    Seq("gpt-4", "claude-3", "llama-2", "gemini-pro", "titan-xl")

  /** Knuth multiplicative-hash constant behind every seeded mix
    * (the deterministic stand-in for ThreadLocalRandom, Creator:244-248). */
  val MixConst: Long = 2654435761L

  /** The driver corpus's event-time span (TESTDATA.md, seed 42): event
    * timestamps cover days 1..[[CorpusDays]] starting at
    * [[CorpusStartDate]]. Declared ONCE so every calendar-shaped key
    * (dq_freshness's expected-day calendar, dq_drift's ref/cur windows)
    * derives its bounds from the same fact as the corpus — a
    * regenerated corpus with a different span then breaks ONE constant
    * loudly instead of silently turning the whole freshness report
    * stale (ADVICE r18). */
  val CorpusStartDate: String = "2024-01-01"
  val CorpusDays: Int = 30

  /** Days the freshness calendar looks PAST the corpus end — the
    * deliberately-stale tail that proves the report's hole-detection
    * path fires. */
  val FreshnessTailDays: Int = 5

  /** Last day of the freshness calendar (corpus span + stale tail),
    * as a DATE literal string both engines parse identically. */
  val FreshnessEndDate: String = java.time.LocalDate
    .parse(CorpusStartDate)
    .plusDays(CorpusDays.toLong + FreshnessTailDays - 1)
    .toString

  /** DuckDB list-literal spelling of a vocabulary, e.g.
    * `(['a','b'])` — index with `[CAST(expr AS INT) + 1]`. */
  def sqlList(xs: Seq[String]): String =
    xs.mkString("(['", "','", "'])")
}
