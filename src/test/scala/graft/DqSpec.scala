package graft

import graft.operators.DqOps
import org.apache.spark.sql.functions._

/** Data-quality tier laws: the expectation report's counters re-derived
  * independently, and the IQR screen proven on planted corpora where the
  * fences and outlier set are known exactly. */
class DqSpec extends SparkSpecBase {

  test("dq_expectations on the driver corpus: clean checks pass, the " +
      "uniqueness violation count equals the independent recount") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sf)
    val total = li.count()
    val distinctPairs = li.select($"l_orderkey", $"l_linenumber")
      .distinct().count()
    val rows = DqOps.dqExpectations(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rows.size === 5)
    for (name <- Seq("not_null", "non_negative", "in_range_0_0.1",
        "accepted_values")) {
      assert(rows(name) === ((0L, total, true)), name)
    }
    val (uv, ut, upass) = rows("unique")
    assert(ut === total)
    assert(uv === total - distinctPairs)
    assert(upass === (uv == 0L))
    // this corpus genuinely violates the uniqueness expectation — the
    // report must prove the FAIL path, not a wall of greens
    assert(uv > 0L)
  }

  test("dq_outlier_iqr on planted data: exact rank-based Q1/Q3, exact " +
      "fences, exactly the planted outliers flagged; constant group " +
      "has zero IQR and zero outliers; all-null group is absent") {
    import spark.implicits._
    val a = (1 to 100).map(i => ("a", i.toDouble, i.toLong)) ++
      Seq(("a", 1000.0, 101L), ("a", -1000.0, 102L))
    val b = (1 to 10).map(i => ("b", 5.0, 200L + i))
    val c = (1 to 5).map(i => ("c", null.asInstanceOf[java.lang.Double],
      300L + i))
    val df = (a.map(t => (t._1, t._2: java.lang.Double, t._3)) ++
        b.map(t => (t._1, t._2: java.lang.Double, t._3)) ++ c)
      .toDF("event_type", "value", "event_id")
    val got = DqOps.outlierIqrOver(df).orderBy($"event_type").collect()
    assert(got.length === 2)
    val ra = got(0)
    // n=102; sorted: -1000, 1..100, 1000. Q1 at rank ceil(0.25*102)=26
    // -> 25.0; Q3 at rank ceil(0.75*102)=77 -> 76.0. IQR=51 ->
    // fences [-51.5, 152.5] -> exactly the two planted outliers.
    assert(ra.getString(0) === "a")
    assert(ra.getLong(1) === 102L)
    assert(ra.getDouble(2) === 25.0)
    assert(ra.getDouble(3) === 76.0)
    assert(ra.getDouble(4) === 25.0 - 1.5 * 51.0)
    assert(ra.getDouble(5) === 76.0 + 1.5 * 51.0)
    assert(ra.getLong(6) === 2L)
    assert(ra.getDouble(7) === -1000.0 && ra.getDouble(8) === 1000.0)
    val rb = got(1)
    assert(rb.getString(0) === "b")
    assert(rb.getDouble(2) === 5.0 && rb.getDouble(3) === 5.0)
    assert(rb.getLong(6) === 0L)
  }

  test("dq_outlier_iqr corpus laws: q1 <= q3, fences bracket the " +
      "quartiles, quartiles are actual data values, outlier count " +
      "matches an independent recount") {
    import spark.implicits._
    val rep = DqOps.dqOutlierIqr(spark, sf).collect()
    assert(rep.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .filter($"value".isNotNull)
    rep.foreach { r =>
      val (et, q1, q3, lo, hi, nOut) = (r.getString(0), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))
      assert(q1 <= q3 && lo <= q1 && hi >= q3, et)
      // quartiles are raw data values of that group
      assert(ev.filter($"event_type" === et && $"value" === q1)
        .count() > 0, s"$et q1")
      assert(ev.filter($"event_type" === et && $"value" === q3)
        .count() > 0, s"$et q3")
      val recount = ev.filter($"event_type" === et &&
        ($"value" < lo || $"value" > hi)).count()
      assert(recount === nOut, s"$et outliers")
    }
  }

  test("dq_freshness recount law: every calendar row's count, user " +
      "count, last timestamp, and staleness flag match an independent " +
      "per-day recount; the report covers exactly the 35-day calendar " +
      "and the post-corpus days are the stale ones") {
    import spark.implicits._
    val got = DqOps.dqFreshness(spark, sf).collect()
    assert(got.length === 35)
    val ev = graft.sources.Tables.events(spark, sf)
    val byDay = ev.groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct($"user_id").as("nu"), max($"ts").as("mx"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getTimestamp(3))).toMap
    var stale = 0
    got.foreach { r =>
      val day = r.getDate(0).toString
      byDay.get(day) match {
        case Some((n, nu, mx)) =>
          assert(r.getLong(1) === n, s"$day n")
          assert(r.getLong(2) === nu, s"$day n_users")
          assert(r.getTimestamp(3) === mx, s"$day last_ts")
          assert(!r.getBoolean(4), s"$day wrongly stale")
        case None =>
          assert(r.getLong(1) === 0L && r.getBoolean(4) &&
            r.isNullAt(3), s"$day should be a stale hole row")
          stale += 1
      }
    }
    // the corpus is January-resident: the February calendar tail (and
    // any genuine January holes) must surface as stale rows
    assert(stale > 0, "no stale rows — the hole path went unexercised")
  }

  test("dq_drift on planted windows: exact shares and deltas, a " +
      "category absent from one side contributes its full share " +
      "(the case log-based PSI cannot define)") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-$day%02d 10:00:00")
    // reference window (days 1-15): 8 clicks, 2 errors
    // current window (days 16-30): 5 clicks, 0 errors, 5 signups
    val ref = (1 to 8).map(i => ("click", t(2), 1.0)) ++
      (1 to 2).map(i => ("error", t(3), 1.0))
    val cur = (1 to 5).map(i => ("click", t(20), 1.0)) ++
      (1 to 5).map(i => ("signup", t(21), 1.0))
    val df = (ref ++ cur).toDF("event_type", "ts", "value")
    val got = DqOps.driftOver(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got("click") === ((8L, 5L, 0.8, 0.5, 0.3)))
    // error vanished from current: drift = its whole reference share
    assert(got("error") === ((2L, 0L, 0.2, 0.0, 0.2)))
    // signup is NEW in current: drift = its whole current share
    assert(got("signup") === ((0L, 5L, 0.0, 0.5, 0.5)))
  }

  test("dq_drift on a degenerate corpus (one window empty): shares " +
      "resolve to 0.0, never NaN/Infinity — the no-non-finite contract " +
      "holds even when a total divides by zero") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-$day%02d 10:00:00")
    // every event lands in the reference window; the current window is
    // EMPTY, so cur_total = 0 and an unguarded share would be 0/0
    val df = ((1 to 6).map(_ => ("click", t(2), 1.0)) ++
        (1 to 4).map(_ => ("error", t(5), 1.0)))
      .toDF("event_type", "ts", "value")
    val got = DqOps.driftOver(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got("click") === ((6L, 0L, 0.6, 0.0, 0.6)))
    assert(got("error") === ((4L, 0L, 0.4, 0.0, 0.4)))
    got.values.foreach { case (_, _, rs, cs, d) =>
      Seq(rs, cs, d).foreach(v =>
        assert(!v.isNaN && !v.isInfinity, "non-finite share leaked"))
    }
  }
}
