package graft

import org.apache.spark.sql.functions._

/** TimestampPushdownRule: the added raw-nanos conjunct must be exactly
  * equivalent (floor-division boundary cases) and must reach the parquet
  * scan as a PushedFilter. */
class PlanRuleSpec extends SparkSpecBase {

  test("boundary exactness: augmented filters keep every matching row") {
    import spark.implicits._
    // nanos straddling the micro boundary around T = 1_000_000 us
    val tUs = 1000000L
    val ns = Seq(tUs * 1000 - 1, tUs * 1000, tUs * 1000 + 1,
      tUs * 1000 + 999, tUs * 1000 + 1000, (tUs + 1) * 1000,
      (tUs - 1) * 1000 + 999)
    val df = ns.toDF("ts_ns")
      .select($"ts_ns", timestamp_micros(expr("ts_ns div 1000")).as("ts"))
    val t = timestamp_micros(lit(tUs))
    def expectedUs(p: Long => Boolean) =
      ns.filter(n => p(Math.floorDiv(n, 1000L))).toSet
    assert(df.filter($"ts" >= t).select($"ts_ns").collect()
      .map(_.getLong(0)).toSet == expectedUs(_ >= tUs))
    assert(df.filter($"ts" <= t).select($"ts_ns").collect()
      .map(_.getLong(0)).toSet == expectedUs(_ <= tUs))
    assert(df.filter($"ts" > t).select($"ts_ns").collect()
      .map(_.getLong(0)).toSet == expectedUs(_ > tUs))
    assert(df.filter($"ts" < t).select($"ts_ns").collect()
      .map(_.getLong(0)).toSet == expectedUs(_ < tUs))
  }

  test("native timestamp layout: the predicate is already sargable and " +
      "reaches the scan as a native PushedFilter (rule is a no-op)") {
    import spark.implicits._
    val df = graft.sources.Tables.events(spark, sf)
      .filter($"ts" >= lit("2024-01-28 00:00:00").cast("timestamp"))
    df.count()
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", ""))
      .mkString(";")
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"native ts predicate did not reach the scan: $pushed")
    // and the rule must not have manufactured any raw-long twin: the
    // filter condition on a native column stays exactly one conjunct
    // (plus isnotnull) — no duplicated comparisons
    val cond = df.queryExecution.optimizedPlan.toString
    assert(">=".r.findAllIn(cond).size <= 1,
      s"rule added a spurious twin on a native layout: $cond")
  }

  test("long-nanos layout: the rule conjoins a raw-nanos twin that " +
      "reaches the parquet scan exactly once") {
    import spark.implicits._
    // synthesize the legacy encoding: int64 nanos column named ts
    val root = graft.sources.IngestOps.tmp("planrule_nanos")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val us = Seq(1706399999999999L, 1706400000000000L, 1706400000000001L,
      1706486400000000L)
    us.zipWithIndex.map { case (u, i) => (i.toLong, u * 1000L) }
      .toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$root/events.parquet")
    val df = graft.sources.Tables.events(spark, root)
      .filter($"ts" >= lit("2024-01-28 00:00:00").cast("timestamp"))
    assert(df.count() == 3)   // floor semantics keep the boundary row out
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "GreaterThanOrEqual\\(ts,\\d+\\)".r
      .findAllIn(plan).toSeq
    assert(pushed.nonEmpty, s"no raw pushdown in: $plan")
    assert(pushed.distinct.length <= 2, s"rule not idempotent: $pushed")
  }

  test("truncation semantics: pre-epoch (negative nanos) rows survive " +
      "augmentation in every operator spelling") {
    import spark.implicits._
    // `div` truncates TOWARD ZERO (n / 1000 in Java), not toward -inf:
    // -500 div 1000 = 0, so x = -500 must pass ts >= epoch. A
    // floor-semantics bound (x >= 0) silently dropped these rows.
    val ns = Seq(-2000L, -1999L, -1500L, -1000L, -999L, -500L, -1L,
      0L, 1L, 999L, 1000L)
    val df = ns.toDF("ts_ns")
      .select($"ts_ns", timestamp_micros(expr("ts_ns div 1000")).as("ts"))
    def got(c: org.apache.spark.sql.Column) =
      df.filter(c).select($"ts_ns").collect().map(_.getLong(0)).toSet
    def expected(p: Long => Boolean) = ns.filter(n => p(n / 1000L)).toSet
    for (tUs <- Seq(-2L, -1L, 0L, 1L)) {
      val t = timestamp_micros(lit(tUs))
      assert(got($"ts" >= t) == expected(_ >= tUs), s"ge T=$tUs")
      assert(got($"ts" <= t) == expected(_ <= tUs), s"le T=$tUs")
      assert(got($"ts" > t) == expected(_ > tUs), s"gt T=$tUs")
      assert(got($"ts" < t) == expected(_ < tUs), s"lt T=$tUs")
      // flipped operand order (lit OP ts), strict forms included —
      // these spellings previously derived no twin at all
      assert(got(t <= $"ts") == expected(_ >= tUs), s"flip-le T=$tUs")
      assert(got(t < $"ts") == expected(_ > tUs), s"flip-lt T=$tUs")
      assert(got(t >= $"ts") == expected(_ <= tUs), s"flip-ge T=$tUs")
      assert(got(t > $"ts") == expected(_ < tUs), s"flip-gt T=$tUs")
    }
  }

  test("overflow guard: far-future/far-past literals derive no bound " +
      "and drop no rows") {
    import spark.implicits._
    // 9999-12-31 is ~2.5e17 us; x1000 overflows Long. An overflowed
    // bound matches nothing — the augmented filter would return an
    // EMPTY result where the unaugmented one returns every row.
    val ns = Seq(-1000000000L, 0L, 1706400000000000000L)
    val df = ns.toDF("ts_ns")
      .select($"ts_ns", timestamp_micros(expr("ts_ns div 1000")).as("ts"))
    val hi = lit("9999-12-31 23:59:59").cast("timestamp")
    val lo = lit("1677-01-01 00:00:00").cast("timestamp")
    assert(df.filter($"ts" <= hi).count() == 3)
    assert(df.filter($"ts" >= lo).count() == 3)
    assert(df.filter($"ts" < hi && $"ts" > lo).count() == 3)
  }

  test("rule result matches unaugmented semantics on real events") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-12 00:00:00").cast("timestamp")
    val filtered = ev.filter($"ts".between(lo, hi)).count()
    // independent check straight from duck-typed raw micros arithmetic
    val expected = ev.select(unix_micros($"ts").as("us")).filter(
      $"us" >= 1704844800000000L && $"us" <= 1705017600000000L).count()
    assert(filtered == expected)
  }
}
