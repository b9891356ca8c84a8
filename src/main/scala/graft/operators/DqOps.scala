package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality operators (SURVEY.md §2k validation family).
  *
  * The reference's only quality gate is schema-shape validation at
  * ingest (`aig/AIGEventsSchemaValidator.java:148-205`, required-field
  * nullability at `:154-161`); `validate_schema` / `ingest_quarantine`
  * cover that surface. A production pipeline also runs CONTENT checks —
  * expectation suites over the values (the Great-Expectations/dbt-test
  * shape) and statistical outlier screens — before data is allowed
  * downstream. These two keys are that tier.
  *
  * Scale design: `dq_expectations`' scalar expectations all fold into
  * ONE scan → ONE 1-row aggregate (each check is a conditional count —
  * map-side combinable), then the tall report is an explode of that
  * single row: metadata-scale. The uniqueness expectation is the only
  * one that fundamentally needs a shuffle (distinct on the key pair);
  * it shares the same scan and runs as a count-distinct partial
  * aggregate, not a self-join. `dq_outlier_iqr` computes EXACT discrete
  * order statistics per group (rank-at-ceil(p·n), the same discipline
  * as `length_band_filter`) — one shuffle on the group key, and the
  * rank/fence/classify steps all ride that single Exchange as window +
  * final aggregate. Interpolating quantile functions are deliberately
  * avoided: engines disagree on interpolation arithmetic, but the
  * element AT a rank is a raw data value — bit-identical everywhere.
  */
object DqOps {

  private val Total = "total"

  /** `dq_expectations` — an expectation-suite report over lineitem: one
    * row per expectation with observed violations and a pass flag.
    * Checks: not-null key, non-negative quantity, discount within
    * [0, 0.1], returnflag in the accepted set, and (orderkey, linenumber)
    * uniqueness — the one expectation this corpus genuinely fails, so
    * the report proves the fail path, not just a wall of greens. */
  def dqExpectations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val agg = Tables.lineitem(spark, dir).agg(
      count(lit(1)).as(Total),
      viol($"l_orderkey".isNull).as("v_notnull"),
      viol($"l_quantity" < 0).as("v_nonneg"),
      viol(!$"l_discount".between(0.0, 0.1)).as("v_range"),
      viol(!$"l_returnflag".isin("A", "N", "R")).as("v_accepted"),
      // distinct over the STRUCT, not the bare pair: countDistinct(a, b)
      // skips tuples containing NULL, while the oracle's
      // SELECT DISTINCT counts them — struct(a, b) is itself non-null,
      // so NULL-keyed tuples count identically on both engines even if
      // the corpus ever grows one (ADVICE r18).
      countDistinct(struct($"l_orderkey", $"l_linenumber"))
        .as("n_distinct"))
    def row(name: String, column: String, v: Column) = struct(
      lit(name).as("expectation"), lit(column).as("column"),
      v.as("violations"), col(Total).as("total"), (v === 0L).as("pass"))
    agg.select(explode(array(
        row("not_null", "l_orderkey", $"v_notnull"),
        row("non_negative", "l_quantity", $"v_nonneg"),
        row("in_range_0_0.1", "l_discount", $"v_range"),
        row("accepted_values", "l_returnflag", $"v_accepted"),
        row("unique", "l_orderkey,l_linenumber",
          col(Total) - $"n_distinct"))).as("r"))
      .select($"r.*")
      .orderBy($"expectation")
  }

  /** `dq_outlier_iqr` — per-event-type Tukey outlier screen: exact
    * discrete Q1/Q3 (value at rank ceil(p·n) under (value, event_id)
    * order — raw data values, no interpolation), fences at
    * q ∓ 1.5·IQR, and the out-of-fence count. The fences are IEEE-
    * identical on both engines because they are the same textual ops on
    * bit-identical inputs. */
  def dqOutlierIqr(spark: SparkSession, dir: String): DataFrame =
    outlierIqrOver(Tables.events(spark, dir))

  /** The IQR screen over any (event_type, value, event_id) relation —
    * shared by the key and DqSpec's planted-outlier corpora. */
  private[graft] def outlierIqrOver(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byType = Window.partitionBy($"event_type")
    val ordered = byType.orderBy($"value", $"event_id")
    def rankAt(p: Double): Column =
      ceil($"n".cast("double") * lit(p)).cast("long")
    val q = events
      .filter($"value".isNotNull)
      .select($"event_type", $"value", $"event_id")
      .withColumn("rn", row_number().over(ordered).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("q1",
        max(when($"rn" === rankAt(0.25), $"value")).over(byType))
      .withColumn("q3",
        max(when($"rn" === rankAt(0.75), $"value")).over(byType))
    val lo = $"q1" - lit(1.5) * ($"q3" - $"q1")
    val hi = $"q3" + lit(1.5) * ($"q3" - $"q1")
    q.groupBy($"event_type")
      .agg(max($"n").as("n"),
        max($"q1").as("q1"), max($"q3").as("q3"),
        sum(when($"value" < lo || $"value" > hi, 1L).otherwise(0L))
          .as("n_outliers"),
        min($"value").as("vmin"), max($"value").as("vmax"))
      .select($"event_type", $"n", $"q1", $"q3",
        ($"q1" - lit(1.5) * ($"q3" - $"q1")).as("lo"),
        ($"q3" + lit(1.5) * ($"q3" - $"q1")).as("hi"),
        $"n_outliers", $"vmin", $"vmax")
      .orderBy($"event_type")
  }

  /** `dq_freshness` — calendar-completeness / freshness audit: one row
    * per EXPECTED day (a fixed 35-day calendar spanning past the
    * corpus), with observed event count, distinct users, the last
    * event's timestamp, and a staleness flag for days with no data at
    * all. The left join from the calendar is what distinguishes this
    * from a plain rollup: a silent ingestion hole produces a row that
    * SAYS so, instead of silently vanishing from the report — the
    * failure mode partition-level monitoring exists to catch (the
    * reference's hourly-partition layout makes holes invisible to a
    * reader the same way, `TimeEx:144-196`). Scale shape: one scan +
    * one shuffle on the day key; the calendar side is 35 literal rows
    * broadcast against the aggregate, and the report is
    * calendar-bounded regardless of corpus size. */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cal = spark.sql(
      s"""SELECT explode(sequence(DATE'$CorpusStartDate',
         |  DATE'$FreshnessEndDate', interval 1 day)) AS day""".stripMargin)
    val act = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct($"user_id").as("n_users"),
        max($"ts").as("last_ts"))
    cal.join(act, Seq("day"), "left")
      .select($"day", coalesce($"n", lit(0L)).as("n"),
        coalesce($"n_users", lit(0L)).as("n_users"), $"last_ts",
        $"n".isNull.as("is_stale"))
      .orderBy($"day")
  }

  /** `dq_drift` — categorical distribution-drift report between a
    * reference window (days 1-15) and the current window (days 16-30):
    * per event_type, counts and shares on both sides and the absolute
    * share delta (the per-category term of total-variation distance —
    * the L1 drift metric chosen over PSI/chi² because it needs NO
    * logarithms, so the result is a hash-provable IEEE expression; a
    * category absent from one side contributes its full share, which
    * log-based PSI can't even define without smoothing). The ML-ops
    * gate this feeds: alert when any category drifts past a threshold
    * between training and serving data. Scale shape: one scan, one
    * shuffle on the category key, and the two 1-row totals broadcast
    * back — the report is category-bounded. */
  def dqDrift(spark: SparkSession, dir: String): DataFrame =
    driftOver(Tables.events(spark, dir))

  /** The drift report over any (event_type, ts, value) relation —
    * shared by the key and DqSpec's planted two-window corpora. */
  private[graft] def driftOver(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val d = dayofmonth($"ts")
    val counted = events
      .filter($"value".isNotNull)
      .groupBy($"event_type")
      .agg(sum(when(d.between(1, CorpusDays / 2), 1L).otherwise(0L))
          .as("ref_n"),
        sum(when(d.between(CorpusDays / 2 + 1, CorpusDays), 1L)
          .otherwise(0L)).as("cur_n"))
    val totals = counted.agg(sum($"ref_n").as("ref_total"),
      sum($"cur_n").as("cur_total"))
    // an empty window (every event outside it, or an empty corpus) makes
    // the total 0; bare IEEE division would emit NaN there — and Spark
    // and DuckDB don't even agree on 0/0 — so a degenerate corpus must
    // resolve to share 0.0, not a hash-diverging non-finite (ADVICE r18)
    def share(n: Column, tot: Column): Column =
      when(tot === 0L, lit(0.0))
        .otherwise(n.cast("double") / tot.cast("double"))
    counted.crossJoin(broadcast(totals))
      .select($"event_type", $"ref_n", $"cur_n",
        round(share($"ref_n", $"ref_total"), 6).as("ref_share"),
        round(share($"cur_n", $"cur_total"), 6).as("cur_share"),
        round(abs(share($"ref_n", $"ref_total") -
          share($"cur_n", $"cur_total")), 6).as("drift"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_expectations" -> (dqExpectations _),
    "dq_drift" -> (dqDrift _),
    "dq_freshness" -> (dqFreshness _),
    "dq_outlier_iqr" -> (dqOutlierIqr _))

  val oracles: Map[String, String] = Map(
    "dq_drift" ->
      s"""WITH c AS (
         |  SELECT event_type,
         |    SUM(CASE WHEN day(ts) BETWEEN 1 AND ${CorpusDays / 2}
         |      THEN 1 ELSE 0 END) AS ref_n,
         |    SUM(CASE WHEN day(ts) BETWEEN ${CorpusDays / 2 + 1}
         |      AND $CorpusDays THEN 1 ELSE 0 END) AS cur_n
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |t AS (SELECT SUM(ref_n) AS ref_total, SUM(cur_n) AS cur_total
         |  FROM c)
         |SELECT event_type, CAST(ref_n AS BIGINT) AS ref_n,
         |  CAST(cur_n AS BIGINT) AS cur_n,
         |  round(CASE WHEN ref_total = 0 THEN 0.0 ELSE
         |    CAST(ref_n AS DOUBLE) / CAST(ref_total AS DOUBLE) END, 6)
         |    AS ref_share,
         |  round(CASE WHEN cur_total = 0 THEN 0.0 ELSE
         |    CAST(cur_n AS DOUBLE) / CAST(cur_total AS DOUBLE) END, 6)
         |    AS cur_share,
         |  round(abs(
         |    (CASE WHEN ref_total = 0 THEN 0.0 ELSE
         |      CAST(ref_n AS DOUBLE) / CAST(ref_total AS DOUBLE) END) -
         |    (CASE WHEN cur_total = 0 THEN 0.0 ELSE
         |      CAST(cur_n AS DOUBLE) / CAST(cur_total AS DOUBLE) END)), 6)
         |    AS drift
         |FROM c, t ORDER BY event_type""".stripMargin,
    "dq_freshness" ->
      s"""WITH cal AS (
         |  SELECT CAST(unnest(generate_series(DATE '$CorpusStartDate',
         |    DATE '$FreshnessEndDate', INTERVAL 1 DAY)) AS DATE) AS day),
        |act AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
        |    COUNT(DISTINCT user_id) AS n_users, MAX(ts) AS last_ts
        |  FROM events GROUP BY 1)
        |SELECT cal.day, coalesce(act.n, 0) AS n,
        |  coalesce(act.n_users, 0) AS n_users, act.last_ts,
        |  act.n IS NULL AS is_stale
        |FROM cal LEFT JOIN act ON cal.day = act.day
        |ORDER BY cal.day""".stripMargin,
    "dq_expectations" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS total,
        |    SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS v_notnull,
        |    SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS v_nonneg,
        |    SUM(CASE WHEN l_discount NOT BETWEEN 0 AND 0.1
        |      THEN 1 ELSE 0 END) AS v_range,
        |    SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
        |      THEN 1 ELSE 0 END) AS v_accepted
        |  FROM lineitem),
        |u AS (
        |  SELECT COUNT(*) AS n_distinct FROM
        |    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
        |SELECT expectation, "column",
        |  CAST(violations AS BIGINT) AS violations,
        |  CAST(total AS BIGINT) AS total, violations = 0 AS pass
        |FROM (
        |  SELECT 'not_null' AS expectation, 'l_orderkey' AS "column",
        |    v_notnull AS violations, total FROM m
        |  UNION ALL SELECT 'non_negative', 'l_quantity', v_nonneg, total
        |  FROM m
        |  UNION ALL SELECT 'in_range_0_0.1', 'l_discount', v_range, total
        |  FROM m
        |  UNION ALL SELECT 'accepted_values', 'l_returnflag', v_accepted,
        |    total FROM m
        |  UNION ALL SELECT 'unique', 'l_orderkey,l_linenumber',
        |    m.total - u.n_distinct, m.total FROM m, u)
        |ORDER BY expectation""".stripMargin,
    "dq_outlier_iqr" ->
      """WITH ranked AS (
        |  SELECT event_type, value, event_id,
        |    CAST(row_number() OVER
        |      (PARTITION BY event_type ORDER BY value, event_id)
        |      AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |q AS (
        |  SELECT event_type, value, n,
        |    max(CASE WHEN rn =
        |        CAST(ceil(CAST(n AS DOUBLE) * 0.25) AS BIGINT)
        |      THEN value END) OVER (PARTITION BY event_type) AS q1,
        |    max(CASE WHEN rn =
        |        CAST(ceil(CAST(n AS DOUBLE) * 0.75) AS BIGINT)
        |      THEN value END) OVER (PARTITION BY event_type) AS q3
        |  FROM ranked)
        |SELECT event_type, MAX(n) AS n, MAX(q1) AS q1, MAX(q3) AS q3,
        |  MAX(q1) - 1.5 * (MAX(q3) - MAX(q1)) AS lo,
        |  MAX(q3) + 1.5 * (MAX(q3) - MAX(q1)) AS hi,
        |  CAST(SUM(CASE WHEN value < q1 - 1.5 * (q3 - q1)
        |    OR value > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  MIN(value) AS vmin, MAX(value) AS vmax
        |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin)
}
