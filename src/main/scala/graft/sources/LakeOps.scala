package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.dsum

/** Lake mutation surface — the table-maintenance operations an Iceberg
  * user runs after the initial load (SURVEY.md §2a extension): MERGE
  * upsert, DELETE WHERE, and incremental (changelog) reads between
  * snapshots. The reference holds these as Iceberg library calls
  * (`overwrite()/newDelete()` commit shapes around
  * `BulkParquetToIcebergAtomicMultipart.java:97-101`); here each is the
  * copy-on-write plan Iceberg itself executes: identify affected
  * partitions from metadata, rewrite ONLY those partitions in one
  * distributed pass, leave every other data file byte-identical (asserted
  * in LakeSpec).
  *
  * Scale shape: the only driver-side materialization is the DISTINCT
  * PARTITION KEY list of the touched partitions (metadata cardinality —
  * same as Iceberg's manifest plan), never row data. The rewrite shuffles
  * once on the partition key; untouched partitions are never read. At
  * 100 TB a MERGE touching 5 of 10 000 day-partitions reads and writes
  * 0.05 % of the table.
  */
object LakeOps {

  /** Day-partitioned copy-on-write table at `out`, one file per day. */
  private def writeBase(spark: SparkSession, dir: String,
      out: String): DataFrame = {
    import spark.implicits._
    val ev = IngestOps.eventsWithParts(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value", $"day")
    ev.repartition($"day")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("day").parquet(out)
    ev
  }

  /** Overwrite only the partitions present in `df` (Iceberg's
    * copy-on-write commit): dynamic partition-overwrite scoped to this
    * one write, session conf restored after the eager action. */
  private def rewritePartitions(spark: SparkSession, df: DataFrame,
      out: String): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      df.repartition(col("day"))
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .partitionBy("day").parquet(out)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** `merge_upsert` — MERGE INTO base USING updates ON event_id:
    * matched rows get the update's value, unmatched update rows are
    * inserted. Updates = even event_ids of days 8-12 with value doubled,
    * plus the same rows re-keyed (+1e8) as inserts. Copy-on-write: the
    * affected day-partitions are computed from the updates' keys
    * (metadata-scale collect), rewritten as (base ⟕anti updates) ∪
    * updates in one shuffle; days outside 8-12 keep their original files
    * (LakeSpec asserts byte-identical). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = IngestOps.tmp("events_merge")
    writeBase(spark, dir, out)
    val matched = IngestOps.eventsWithParts(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value", $"day")
      .filter($"day".between(8, 12) && pmod($"event_id", lit(2L)) === 0)
    val updates = matched.withColumn("value", $"value" * 2)
      .unionByName(matched
        .withColumn("event_id", $"event_id" + 100000000L)
        .withColumn("event_type", lit("inserted"))
        .withColumn("value", $"value" + 1000.0))
    // partition keys touched by the merge — metadata cardinality only
    val days = updates.select($"day").distinct().collect()
      .map(_.getInt(0)).sorted
    val base = spark.read.parquet(out)
    val merged = base.filter($"day".isin(days.map(Int.box): _*))
      .join(updates.select($"event_id"), Seq("event_id"), "left_anti")
      .unionByName(updates)
    rewritePartitions(spark, merged, out)
    spark.read.parquet(out)
      .filter($"day".between(6, 14))
      .groupBy($"day".cast("long").as("day"))
      .agg(count(lit(1)).as("n"),
        count(when($"event_type" === "inserted", 1)).as("n_inserted"),
        dsum($"value").as("sum_value"))
      .orderBy($"day")
  }

  /** `delete_where` — DELETE FROM base WHERE event_type='click' AND day
    * BETWEEN 3 AND 7, copy-on-write: partitions holding matching rows
    * are computed from the predicate's rows (metadata-scale collect of
    * DISTINCT day), rewritten without them; all other files untouched
    * (LakeSpec asserts). Iceberg's newDelete()+rewrite commit shape. */
  def deleteWhere(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = IngestOps.tmp("events_delete")
    writeBase(spark, dir, out)
    val base = spark.read.parquet(out)
    val doomed = $"event_type" === "click" && $"day".between(3, 7)
    val days = base.filter(doomed).select($"day").distinct().collect()
      .map(_.getInt(0)).sorted
    val survivors = base.filter($"day".isin(days.map(Int.box): _*))
      .filter(!doomed)
    rewritePartitions(spark, survivors, out)
    spark.read.parquet(out)
      .filter($"day".between(1, 10))
      .groupBy($"day".cast("long").as("day"))
      .agg(count(lit(1)).as("n"),
        count(when($"event_type" === "click", 1)).as("n_clicks"),
        dsum($"value").as("sum_value"))
      .orderBy($"day")
  }

  /** `incremental_read` — changelog scan of ONLY the files snapshot 3
    * added (Iceberg's incremental append scan between snapshots 2 and 3:
    * the consumer that already processed snapshots 1-2 reads just the
    * delta). File list comes from the snapshot-3 manifest — pure
    * metadata; earlier snapshots' files are never opened (LakeSpec
    * input_file_name assertion). */
  def incrementalRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = IngestOps.snapshotLayout(spark, dir)
    val files = IngestOps.snapshotManifest(spark, root, 3)
      .map(rel => s"$root/data/$rel")
    spark.read.option("basePath", s"$root/data").parquet(files: _*)
      .groupBy($"day".cast("long").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"))
      .orderBy($"day")
  }

  /** `partition_evolve` — Iceberg partition-spec evolution (the feature
    * the reference's 6-field identity spec exists to exploit): the table
    * starts day-partitioned (spec v1, days 1-10), then the spec evolves
    * to (day, hour) and NEW data (days 11-15) lands under the finer
    * layout — old files are never rewritten, exactly Iceberg's contract.
    * A query with an hour predicate prunes hour DIRECTORIES in the v2
    * region and falls back to row-level filtering inside the day files of
    * the v1 region (LakeSpec asserts: no hour≥6 file is ever opened in
    * v2, and v1 bytes stay untouched by the evolution). At 100 TB this is
    * how a table migrates to finer granularity with zero rewrite cost —
    * only data written after the evolution pays the new layout. */
  def partitionEvolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (v1, v2) = partitionEvolveLayout(spark, dir)
    val oldRegion = spark.read.parquet(v1)
      .filter($"day".between(9, 10) && hour($"ts") < 6)
    val newRegion = spark.read.parquet(v2)
      .filter($"day".between(11, 12) && $"hour" < 6)
    oldRegion.select($"day", $"user_id", $"value")
      .unionByName(newRegion.select($"day", $"user_id", $"value"))
      .groupBy($"day".cast("long").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"),
        dsum($"value").as("sum_value"))
      .orderBy($"day")
  }

  /** Write the two-spec layout (v1: day-partitioned days 1-10; v2:
    * day/hour-partitioned days 11-15); shared with LakeSpec. */
  private[graft] def partitionEvolveLayout(spark: SparkSession,
      dir: String): (String, String) = {
    import spark.implicits._
    val v1 = IngestOps.tmp("events_spec_v1")
    val v2 = IngestOps.tmp("events_spec_v2")
    val ev = IngestOps.eventsWithParts(spark, dir)
      .withColumn("hour", hour($"ts"))
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts",
        $"day", $"hour")
    ev.filter($"day".between(1, 10)).drop("hour")
      .repartition($"day")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").partitionBy("day").parquet(v1)
    ev.filter($"day".between(11, 15))
      .repartition($"day", $"hour")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").partitionBy("day", "hour").parquet(v2)
    (v1, v2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> (mergeUpsert _),
    "delete_where" -> (deleteWhere _),
    "partition_evolve" -> (partitionEvolve _),
    "incremental_read" -> (incrementalRead _))

  private val D = "DECIMAL(18,2)"

  val oracles: Map[String, String] = Map(
    "merge_upsert" ->
      s"""WITH merged AS (
         |  SELECT day(ts) AS day, event_type,
         |    CASE WHEN day(ts) BETWEEN 8 AND 12 AND event_id % 2 = 0
         |         THEN value * 2 ELSE value END AS value
         |  FROM events
         |  UNION ALL
         |  SELECT day(ts), 'inserted', value + 1000
         |  FROM events WHERE day(ts) BETWEEN 8 AND 12 AND event_id % 2 = 0)
         |SELECT CAST(day AS BIGINT) AS day, COUNT(*) AS n,
         |  COUNT(CASE WHEN event_type = 'inserted' THEN 1 END) AS n_inserted,
         |  CAST(SUM(CAST(value AS $D)) AS DOUBLE) AS sum_value
         |FROM merged WHERE day BETWEEN 6 AND 14
         |GROUP BY day ORDER BY day""".stripMargin,
    "delete_where" ->
      s"""SELECT day(ts) AS day, COUNT(*) AS n,
         |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
         |  CAST(SUM(CAST(value AS $D)) AS DOUBLE) AS sum_value
         |FROM events
         |WHERE day(ts) BETWEEN 1 AND 10
         |  AND NOT (event_type = 'click' AND day(ts) BETWEEN 3 AND 7)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "incremental_read" ->
      """SELECT day(ts) AS day, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events WHERE day(ts) BETWEEN 11 AND 15
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "partition_evolve" ->
      s"""SELECT CAST(day(ts) AS BIGINT) AS day, COUNT(*) AS n,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  CAST(SUM(CAST(value AS $D)) AS DOUBLE) AS sum_value
         |FROM events
         |WHERE day(ts) BETWEEN 9 AND 12 AND hour(ts) < 6
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
