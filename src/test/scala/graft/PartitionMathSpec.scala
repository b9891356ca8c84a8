package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** scalacheck laws for the partition math (SURVEY.md §5(3)):
  * - trunc_day(ts) ≤ ts < trunc_day(ts)+86400000   (TimeEx:129-141)
  * - year/month/day/hour recomposition round-trip  (Creator:226-234)
  * - date_trunc agrees with the reference's integer-division formula.
  */
class PartitionMathSpec extends SparkSpecBase {

  private val DayMs = 86400000L
  private val tsGen = Gen.chooseNum(0L, 4102444800000L) // 1970..2100
  private def sample(n: Int): Seq[Long] =
    Iterator.continually(tsGen.sample).flatten.take(n).toSeq

  test("trunc_day law: trunc(ts) <= ts < trunc(ts) + 1 day") {
    sample(500).foreach { ts =>
      val t = (ts / DayMs) * DayMs
      assert(t <= ts && ts < t + DayMs)
    }
  }

  test("date_trunc('day') equals the integer-division formula") {
    import spark.implicits._
    val rows = sample(300).toDF("ms")
      .select($"ms",
        unix_millis(date_trunc("day", timestamp_millis($"ms"))).as("spark_t"),
        (($"ms" / DayMs).cast("long") * DayMs).as("ref_t"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"mismatch at ms=${r.getLong(0)}"))
  }

  test("epoch→parts recomposition round-trip (UTC)") {
    import spark.implicits._
    val rows = sample(300).toDF("ms")
      .select($"ms", timestamp_millis($"ms").as("t"))
      .select($"ms", year($"t").as("y"), month($"t").as("mo"),
        dayofmonth($"t").as("d"), hour($"t").as("h"),
        minute($"t").as("mi"), second($"t").as("s"))
      .collect()
    rows.foreach { r =>
      val cal = java.time.Instant.ofEpochMilli(r.getLong(0))
        .atZone(java.time.ZoneOffset.UTC)
      assert(r.getInt(1) == cal.getYear && r.getInt(2) == cal.getMonthValue
        && r.getInt(3) == cal.getDayOfMonth && r.getInt(4) == cal.getHour
        && r.getInt(5) == cal.getMinute && r.getInt(6) == cal.getSecond)
    }
  }

  test("hour-bucket histogram buckets are exhaustive and disjoint") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
    val total = ev.count()
    val byHour = ev.groupBy(hour($"ts")).count().collect()
    assert(byHour.map(_.getLong(1)).sum == total)
    assert(byHour.map(_.getInt(0)).distinct.length == byHour.length)
    assert(byHour.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 23))
  }
}
