package graft

import graft.operators.CdcOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 build/lookup laws — the gap-free/overlap-free validity-range
  * contract the scaladoc promises, proven on the driver corpus AND on
  * hand-built changelogs with known answers (including the same-ts tie
  * the (ts, event_id) order must resolve deterministically). */
class CdcSpec extends SparkSpecBase {

  test("scd2_build invariants on the driver corpus: contiguous " +
      "versions, exactly one current row per user, gap-free half-open " +
      "ranges anchored to real events, collapsed runs") {
    import spark.implicits._
    val d = CdcOps.scd2Build(spark, sf).cache()
    val w = Window.partitionBy($"user_id").orderBy($"version")

    // one current row per user; it is the max version; versions are
    // 1..n (row_number makes them contiguous iff count == max)
    val badShape = d.groupBy($"user_id").agg(
        sum(when($"is_current", 1).otherwise(0)).as("ncur"),
        max($"version").as("maxv"),
        max(when($"is_current", $"version")).as("curv"),
        count(lit(1)).as("n"))
      .filter($"ncur" =!= 1 || $"curv" =!= $"maxv" || $"n" =!= $"maxv")
    assert(badShape.count() === 0)

    // half-open ranges: effective_to equals the NEXT version's
    // effective_from (no gap, no overlap); only the tail is open
    val gaps = d
      .withColumn("next_from", lead($"effective_from", 1).over(w))
      .filter($"next_from".isNotNull && $"effective_to" =!= $"next_from")
    assert(gaps.count() === 0)
    assert(d.filter($"effective_to".isNull =!= $"is_current")
      .count() === 0)

    // collapsed: consecutive versions never share event_type
    assert(d.withColumn("p", lag($"event_type", 1).over(w))
      .filter($"p" === $"event_type").count() === 0)

    // every version starts at a real event of that type
    val ev = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" < 30)
      .select($"user_id", $"ts".as("effective_from"), $"event_type")
    assert(d.join(ev, Seq("user_id", "effective_from", "event_type"),
      "left_anti").count() === 0)

    // change-count law: versions per user == number of type changes in
    // (ts, event_id) order
    val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val expected = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" < 30)
      .withColumn("p", lag($"event_type", 1).over(wo))
      .filter($"p".isNull || $"p" =!= $"event_type")
      .groupBy($"user_id").agg(count(lit(1)).as("n_changes"))
    val got = d.groupBy($"user_id").agg(count(lit(1)).as("n_versions"))
    assert(got.join(expected, "user_id")
      .filter($"n_versions" =!= $"n_changes").count() === 0)
    d.unpersist()
  }

  test("scd2Over on a hand-built changelog: exact versions, runs " +
      "collapsed, same-ts ties resolved by event_id into an " +
      "empty-range predecessor") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val changelog = Seq(
      // u1: a a b b a  -> three versions
      (1L, t("2024-01-01 00:00:00"), 1L, "a"),
      (1L, t("2024-01-02 00:00:00"), 2L, "a"),
      (1L, t("2024-01-03 00:00:00"), 3L, "b"),
      (1L, t("2024-01-04 00:00:00"), 4L, "b"),
      (1L, t("2024-01-05 00:00:00"), 5L, "a"),
      // u2: x and y at the SAME ts -> event_id orders them; v1 gets an
      // empty [t, t) range, v2 is current
      (2L, t("2024-01-01 00:00:00"), 6L, "x"),
      (2L, t("2024-01-01 00:00:00"), 7L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = CdcOps.scd2Over(changelog)
      .orderBy($"user_id", $"version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
      .toSeq
    val exp = Seq(
      (1L, 1L, "a", t("2024-01-01 00:00:00"),
        Some(t("2024-01-03 00:00:00")), false),
      (1L, 2L, "b", t("2024-01-03 00:00:00"),
        Some(t("2024-01-05 00:00:00")), false),
      (1L, 3L, "a", t("2024-01-05 00:00:00"), None, true),
      (2L, 1L, "x", t("2024-01-01 00:00:00"),
        Some(t("2024-01-01 00:00:00")), false),
      (2L, 2L, "y", t("2024-01-01 00:00:00"), None, true))
    assert(got === exp)
  }

  test("scd2_asof equals the range filter over scd2_build and returns " +
      "exactly one row per user with history at the instant") {
    import spark.implicits._
    val asof = lit("2024-01-15 00:00:00").cast("timestamp")
    val dim = CdcOps.scd2Build(spark, sf)
    val manual = dim
      .filter($"effective_from" <= asof &&
        ($"effective_to".isNull || $"effective_to" > asof))
      .select($"user_id", $"version", $"event_type", $"effective_from",
        $"is_current")
    val got = CdcOps.scd2Asof(spark, sf)
    assert(got.exceptAll(manual).count() === 0)
    assert(manual.exceptAll(got).count() === 0)
    // one row per user that has any event at/before the instant
    val usersWithHistory = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" < 30 && $"ts" <= asof)
      .select($"user_id").distinct()
    assert(got.groupBy($"user_id").count().filter($"count" =!= 1)
      .count() === 0)
    assert(got.select($"user_id").exceptAll(usersWithHistory)
      .count() === 0)
    assert(usersWithHistory.exceptAll(got.select($"user_id"))
      .count() === 0)
  }

  test("randomized law: on 40 random changelogs (ts ties, singleton " +
      "users, chatty re-emits included) the SCD2 build always yields " +
      "contiguous versions, gap-free ranges, collapsed runs, and a " +
      "version count equal to the change count") {
    import spark.implicits._
    val rng = new scala.util.Random(18)
    val types = Seq("a", "b", "c")
    val rows = for {
      trial <- 0 until 40
      user = trial.toLong
      n = 1 + rng.nextInt(12)
      i <- 0 until n
    } yield (user,
      // coarse ts pool forces frequent SAME-ts ties per user
      new java.sql.Timestamp(86400000L * (1 + rng.nextInt(4))),
      trial * 100L + i,                      // unique event_id
      types(rng.nextInt(types.length)))      // chatty: repeats common
    val changelog = rng.shuffle(rows)
      .toDF("user_id", "ts", "event_id", "event_type")
    val d = CdcOps.scd2Over(changelog).cache()
    val w = Window.partitionBy($"user_id").orderBy($"version")
    // contiguity + single current
    assert(d.groupBy($"user_id").agg(
        sum(when($"is_current", 1).otherwise(0)).as("ncur"),
        max($"version").as("maxv"), count(lit(1)).as("n"))
      .filter($"ncur" =!= 1 || $"n" =!= $"maxv").count() === 0)
    // gap-free half-open chain
    assert(d.withColumn("nf", lead($"effective_from", 1).over(w))
      .filter($"nf".isNotNull && $"effective_to" =!= $"nf")
      .count() === 0)
    // collapsed runs
    assert(d.withColumn("p", lag($"event_type", 1).over(w))
      .filter($"p" === $"event_type").count() === 0)
    // version count == change count under the same total order
    val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = changelog
      .withColumn("p", lag($"event_type", 1).over(wo))
      .filter($"p".isNull || $"p" =!= $"event_type")
      .groupBy($"user_id").agg(count(lit(1)).as("nc"))
    assert(d.groupBy($"user_id").agg(count(lit(1)).as("nv"))
      .join(changes, "user_id").filter($"nv" =!= $"nc")
      .count() === 0)
    d.unpersist()
  }

  test("streaming SCD2-current maintenance equals the batch SCD2 " +
      "build's is_current slice — the lambda-architecture " +
      "reconciliation law") {
    import spark.implicits._
    val streamed = graft.streaming.StreamingOps
      .streamScd2Current(spark, sf)
    val batch = CdcOps.scd2Build(spark, sf)
      .filter($"is_current")
      .select($"user_id", $"version", $"event_type")
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }
}
