package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** SURVEY.md §2e — window functions (X-tier; the reference's time buckets at
  * `TimeEx:256-280` are group-bys, not windows).
  *
  * Every window partitions by a key (tenant/customer/user) so state stays
  * bounded per partition at scale; no global-order windows (a global
  * `orderBy` window would single-task the whole 100 TB).
  */
object Windows {

  /** Top-3 orders per customer via row_number. */
  def winRowNumber(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir).filter($"o_custkey" < 300)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey",
        dec($"o_totalprice").cast("double").as("totalprice"))
      .orderBy($"o_custkey", $"rn")
  }

  /** rank / dense_rank per event_type over value. */
  def winRankDense(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"value".desc, $"event_id")
    Tables.events(spark, dir).filter($"user_id" < 10)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter($"rnk" <= 20)
      .select($"event_type", $"rnk", $"drnk", $"event_id", $"value")
      .orderBy($"event_type", $"rnk", $"event_id")
  }

  /** lag/lead inter-event deltas per user, in exact microseconds. */
  def winLagDelta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir).filter($"user_id" < 30)
      .withColumn("prev_id", lag($"event_id", 1).over(w))
      .withColumn("delta_us",
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .withColumn("next_id", lead($"event_id", 1).over(w))
      .select($"user_id", $"event_id", $"ts", $"prev_id", $"next_id",
        $"delta_us")
      .orderBy($"user_id", $"event_id")
  }

  /** Running per-user usage total — frame rowsBetween(unboundedPreceding,
    * currentRow), exact via decimal. */
  def winRunningSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir).filter($"user_id" < 30)
      .withColumn("running_value", sum(dec($"value")).over(w).cast("double"))
      .withColumn("running_n", count(lit(1)).over(w))
      .select($"user_id", $"event_id", $"ts", $"running_n", $"running_value")
      .orderBy($"user_id", $"event_id")
  }

  /** ntile quartiles of customers by account balance (exact cents).
    *
    * Scale note: a global-order window single-tasks its input, so this is
    * deliberately bounded (c_custkey < 2000). The 100 TB formulation of
    * global quantile bucketing is approx-percentile cut points
    * (`approx_percentile(x, array(0.25,0.5,0.75))` broadcast, then a
    * codegen'd CASE) — no total order needed. */
  def winNtile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy(dec($"c_acctbal").desc, $"c_custkey")
    Tables.customer(spark, dir).filter($"c_custkey" < 2000)
      .withColumn("quartile", ntile(4).over(w))
      .select($"c_custkey", $"quartile",
        dec($"c_acctbal").cast("double").as("acctbal"))
      .orderBy($"c_custkey")
  }

  /** first_value / last_value / nth over an explicit frame. */
  def winFirstLast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir).filter($"user_id" < 20)
      .select($"user_id", $"event_id", $"ts",
        first($"event_id").over(w).as("first_id"),
        last($"event_id").over(w).as("last_id"),
        nth_value($"event_id", 2).over(w).as("second_id"))
      .orderBy($"user_id", $"event_id")
  }

  /** RANGE frame: per-user rolling 1-hour event count/sum (value-based
    * frame over the micros ordinal — peers included, unlike ROWS). */
  def winRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)   // 1 hour in micros
    Tables.events(spark, dir).filter($"user_id" < 20)
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(dec($"value")).over(w).cast("double"))
      .select($"user_id", $"event_id", $"ts", $"n_1h", $"sum_1h")
      .orderBy($"user_id", $"event_id")
  }

  /** `win_percent_cume` — relative-position window functions:
    * percent_rank (rank scaled to [0,1]) and cume_dist (fraction of the
    * partition at-or-below the row) per event_type over value — the
    * percentile-flavored windows a feature pipeline derives per-group
    * normalized scores from. Partitioned like every window here, so each
    * group sorts inside its own task; both are rational functions of
    * rank/count, no float accumulation to drift. */
  def winPercentCume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"value", $"event_id")
    Tables.events(spark, dir).filter($"user_id" < 10)
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select($"event_type", $"event_id", $"value", $"pr", $"cd")
      .orderBy($"event_type", $"event_id")
  }

  /** `win_running_median` — EXACT running median per key over the event
    * stream (the monitoring staple "median value so far, per type"): the
    * exact `percentile` aggregate runs as a window function over an
    * expanding ROWS frame. Same per-key ordering shuffle every window op
    * pays — no global sort; within a task the frame grows incrementally.
    * A 2-day scope keeps output bounded for the gate; the plan is
    * identical at any range. */
  def winRunningMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir).filter(dayofmonth($"ts") <= 2)
      .withColumn("run_median",
        round(expr("percentile(CAST(CAST(value AS DECIMAL(18,2)) " +
          "AS DOUBLE), 0.5)").over(w), 4))
      .select($"event_type", $"event_id", $"run_median")
      .orderBy($"event_type", $"event_id")
  }

  /** `win_streak` — longest same-event_type run per user, the
    * gaps-and-islands pattern (two row_numbers whose difference is
    * constant within a run): per user, the longest streak's length and
    * type (ties broken by type then island start — deterministic) and
    * the total run count. The consumption-side twin of `scd2_build`
    * (which EMITS the runs as versions): engagement streaks, failure
    * bursts, and retry storms all reduce to this shape. Two window
    * partitionings (user) and (user, type) → Catalyst plans the
    * (user, type) exchange first and the (user) windows reuse it via
    * ENSURE_REQUIREMENTS — one wide shuffle, one narrow re-sort. */
  def winStreak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    streaksOver(Tables.events(spark, dir).filter($"user_id" < 30))
  }

  /** The streak report over any (user_id, event_type, ts, event_id)
    * relation — shared by the key and EngineSpec's planted runs. */
  private[graft] def streaksOver(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val byType = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    val islands = events
      .withColumn("island",
        row_number().over(byUser) - row_number().over(byType))
    val runs = islands
      .groupBy($"user_id", $"event_type", $"island")
      .agg(count(lit(1)).as("len"), min($"ts").as("run_start"))
    val best = Window.partitionBy($"user_id")
      .orderBy($"len".desc, $"event_type", $"run_start")
    runs
      .withColumn("rn", row_number().over(best))
      .withColumn("n_runs",
        count(lit(1)).over(Window.partitionBy($"user_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"len".as("longest_streak"),
        $"event_type".as("streak_type"), $"n_runs")
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_streak" -> (winStreak _),
    "win_running_median" -> (winRunningMedian _),
    "win_percent_cume" -> (winPercentCume _),
    "win_range_frame" -> (winRangeFrame _),
    "win_first_last" -> (winFirstLast _),
    "win_row_number" -> (winRowNumber _),
    "win_rank_dense" -> (winRankDense _),
    "win_lag_delta" -> (winLagDelta _),
    "win_running_sum" -> (winRunningSum _),
    "win_ntile" -> (winNtile _))

  private val D = "DECIMAL(18,2)"

  val oracles: Map[String, String] = Map(
    "win_streak" ->
      """WITH islands AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CAST(row_number() OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) -
        |    CAST(row_number() OVER
        |      (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |      AS BIGINT) AS island
        |  FROM events WHERE user_id < 30),
        |runs AS (
        |  SELECT user_id, event_type, island, COUNT(*) AS len,
        |    MIN(ts) AS run_start
        |  FROM islands GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT user_id, event_type, len,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, event_type, run_start) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_runs
        |  FROM runs)
        |SELECT user_id, len AS longest_streak,
        |  event_type AS streak_type, n_runs
        |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "win_running_median" ->
      s"""SELECT event_type, event_id,
         |  round(quantile_cont(CAST(CAST(value AS $D) AS DOUBLE), 0.5)
         |    OVER (PARTITION BY event_type ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         |    AS run_median
         |FROM events WHERE day(ts) <= 2
         |ORDER BY event_type, event_id""".stripMargin,
    "win_percent_cume" ->
      """SELECT event_type, event_id, value,
        |  round(PERCENT_RANK() OVER (PARTITION BY event_type
        |    ORDER BY value, event_id), 6) AS pr,
        |  round(CUME_DIST() OVER (PARTITION BY event_type
        |    ORDER BY value, event_id), 6) AS cd
        |FROM events WHERE user_id < 10
        |ORDER BY event_type, event_id""".stripMargin,
    "win_range_frame" ->
      s"""SELECT user_id, event_id, ts,
         |  COUNT(*) OVER w AS n_1h,
         |  CAST(SUM(CAST(value AS $D)) OVER w AS DOUBLE) AS sum_1h
         |FROM events WHERE user_id < 20
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,
    "win_first_last" ->
      """SELECT user_id, event_id, ts,
        |  FIRST_VALUE(event_id) OVER w AS first_id,
        |  LAST_VALUE(event_id) OVER w AS last_id,
        |  NTH_VALUE(event_id, 2) OVER w AS second_id
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_row_number" ->
      s"""SELECT o_custkey, rn, o_orderkey, totalprice FROM (
         |  SELECT o_custkey, o_orderkey,
         |    CAST(CAST(o_totalprice AS $D) AS DOUBLE) AS totalprice,
         |    ROW_NUMBER() OVER (PARTITION BY o_custkey
         |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
         |  FROM orders WHERE o_custkey < 300
         |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT event_type, rnk, drnk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    RANK() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rnk,
        |    DENSE_RANK() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS drnk
        |  FROM events WHERE user_id < 10
        |) WHERE rnk <= 20 ORDER BY event_type, rnk, event_id""".stripMargin,
    "win_lag_delta" ->
      """SELECT user_id, event_id, ts,
        |  LAG(event_id, 1) OVER w AS prev_id,
        |  LEAD(event_id, 1) OVER w AS next_id,
        |  epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS delta_us
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_running_sum" ->
      s"""SELECT user_id, event_id, ts,
         |  COUNT(*) OVER w AS running_n,
         |  CAST(SUM(CAST(value AS $D)) OVER w AS DOUBLE) AS running_value
         |FROM events WHERE user_id < 30
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,
    "win_ntile" ->
      s"""SELECT c_custkey, quartile, acctbal FROM (
         |  SELECT c_custkey,
         |    NTILE(4) OVER (ORDER BY CAST(c_acctbal AS $D) DESC, c_custkey)
         |      AS quartile,
         |    CAST(CAST(c_acctbal AS $D) AS DOUBLE) AS acctbal
         |  FROM customer WHERE c_custkey < 2000
         |) ORDER BY c_custkey""".stripMargin)
}
