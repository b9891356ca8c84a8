package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SCD2 / changelog-to-dimension operators (SURVEY.md §2a CDC family).
  *
  * The reference replays its event stream into immutable snapshots and
  * reads "state as of" via time travel (`TimeBasedPartitioningExamples
  * .java:144-196`, snapshot reads in `Main.java:89-104`). The dimension-
  * table counterpart every warehouse actually maintains is the SCD
  * type-2 build: collapse a keyed changelog into versioned rows with
  * `[effective_from, effective_to)` validity ranges, then answer
  * point-in-time lookups against those ranges instead of replaying
  * snapshots. `changelog_diff` (LakeOps) derives the changelog; these
  * keys consume one.
  *
  * Scale design: ONE shuffle on the dimension key (`user_id`), shared by
  * every step — the change-detection lag, the version row_number, and
  * the effective_to lead all declare the same (partitionBy user_id,
  * orderBy ts, event_id) window, so Catalyst plans a single Exchange +
  * a single Sort and the three window frames ride it back-to-back (the
  * change filter between them is narrow). No driver-side state, no
  * global sort until the bounded output ORDER BY. At 100 TB this is the
  * standard CDC-compaction shape: partition by key, linear scan per
  * key, output proportional to the number of genuine attribute changes
  * (the collapsed runs are the win — a chatty upstream that re-emits
  * unchanged state costs nothing downstream of the filter).
  *
  * Determinism: the change order is (ts, event_id) — event_id is unique,
  * so ties in ts cannot reorder versions; `effective_to` is exactly the
  * next version's `effective_from` (half-open intervals, no gap/overlap
  * by construction — CdcSpec proves both invariants).
  */
object CdcOps {

  /** The SCD2 build over any changelog-shaped relation
    * (user_id, ts, event_id, event_type) — the ONE spelling both keys
    * and CdcSpec's hand-built corpora share. */
  private[graft] def scd2Over(changelog: DataFrame): DataFrame = {
    val spark = changelog.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    changelog
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("effective_to", lead($"ts", 1).over(w))
      .select($"user_id", $"version", $"event_type",
        $"ts".as("effective_from"), $"effective_to",
        $"effective_to".isNull.as("is_current"))
  }

  /** `scd2_build` — SCD type-2 dimension from the events changelog:
    * per user, each run of equal `event_type` becomes one versioned row
    * with `[effective_from, effective_to)` validity and an `is_current`
    * flag on the open tail. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2Over(Tables.events(spark, dir).filter($"user_id" < 30))
      .orderBy($"user_id", $"version")
  }

  /** The as-of instant for `scd2_asof` — mid-corpus so every user has
    * both history before it and versions after it. */
  private val AsOf = "2024-01-15 00:00:00"

  /** `scd2_asof` — point-in-time dimension lookup: the version active at
    * [[AsOf]] per user (`effective_from <= t < effective_to`, open tail
    * = current). This is the query the reference answers by snapshot
    * time travel (`Main.java:89-104`); against an SCD2 dimension it is
    * a plain range predicate — pushable, indexable, and at 100 TB it
    * never touches the raw changelog. */
  def scd2Asof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = lit(AsOf).cast("timestamp")
    scd2Build(spark, dir)
      .filter($"effective_from" <= t &&
        ($"effective_to".isNull || $"effective_to" > t))
      .select($"user_id", $"version", $"event_type", $"effective_from",
        $"is_current")
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_build" -> (scd2Build _),
    "scd2_asof" -> (scd2Asof _))

  /** Shared oracle CTEs — the DuckDB twin of [[scd2Over]] on the
    * `user_id < 30` events slice. Also consumed by the streaming twin's
    * oracle (`stream_scd2_current`), so the two surfaces can never
    * drift apart. */
  private[graft] val SCD2_CTES =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events WHERE user_id < 30),
      |chg AS (
      |  SELECT user_id, ts, event_id, event_type FROM ordered
      |  WHERE prev_type IS NULL OR prev_type <> event_type),
      |scd2 AS (
      |  SELECT user_id,
      |    CAST(row_number() OVER w AS BIGINT) AS version,
      |    event_type, ts AS effective_from,
      |    lead(ts) OVER w AS effective_to,
      |    (lead(ts) OVER w IS NULL) AS is_current
      |  FROM chg
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "scd2_build" ->
      s"""$SCD2_CTES
         |SELECT user_id, version, event_type, effective_from,
         |  effective_to, is_current
         |FROM scd2 ORDER BY user_id, version""".stripMargin,
    "scd2_asof" ->
      s"""$SCD2_CTES
         |SELECT user_id, version, event_type, effective_from, is_current
         |FROM scd2
         |WHERE effective_from <= TIMESTAMP '$AsOf'
         |  AND (effective_to IS NULL OR effective_to > TIMESTAMP '$AsOf')
         |ORDER BY user_id""".stripMargin)
}
