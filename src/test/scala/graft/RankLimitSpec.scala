package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RankLimitToTopKRule: the plain Window(row_number)+Filter idiom must be
  * rewritten to the TopKPerKey operator exactly when the rank column is
  * projected away, residual predicates must survive, and results must
  * match the unrewritten plan. */
class RankLimitSpec extends SparkSpecBase {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def base = {
    import spark.implicits._
    graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey",
        graft.operators.dec($"o_totalprice").cast("double").as("tp"))
  }

  test("plain idiom is rewritten: Window gone, TopKPerKey planned") {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"tp".desc, $"o_orderkey")
    val df = base.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).drop("rn")
    val plan = finalPlan(df)
    assert(plan.contains("TopKPerKeyFinal"), s"not rewritten:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
  }

  test("rewrite is skipped when the rank column survives") {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"tp".desc, $"o_orderkey")
    val df = base.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    val plan = finalPlan(df)
    assert(!plan.contains("TopKPerKey"), s"wrongly rewritten:\n$plan")
    assert(plan.contains("Window"), s"no window in:\n$plan")
  }

  test("residual conjuncts survive and results match the window plan") {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"tp".desc, $"o_orderkey")
    val rewritten = base.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2 && $"tp" > 1000.0).drop("rn")
      .orderBy($"o_custkey", $"tp".desc, $"o_orderkey")
    assert(finalPlan(rewritten).contains("TopKPerKeyFinal"))
    // expected: same query but rn kept in the OUTPUT (not rewritten)
    val kept = base.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2 && $"tp" > 1000.0)
      .select($"o_orderkey", $"o_custkey", $"tp", $"rn")
      .orderBy($"o_custkey", $"tp".desc, $"o_orderkey")
    assert(!finalPlan(kept).contains("TopKPerKey"))
    val a = rewritten.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = kept.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("rn === 1 latest-event-per-user rewrites and matches groupBy max") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts")
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val latest = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(finalPlan(latest).contains("TopKPerKeyFinal"))
    val got = latest.select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    val exp = ev.groupBy($"user_id").agg(max($"ts").as("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    assert(got == exp && got.nonEmpty)
  }

  test("agg_mode plans the bounded-heap top-1 and equals a driver-side " +
      "mode with the declared tie-break") {
    import spark.implicits._
    val df = graft.operators.Aggregates.aggMode(spark, sf)
    assert(finalPlan(df).contains("TopKPerKeyFinal"),
      s"mode not rewritten to TopKPerKey:\n${finalPlan(df)}")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val events = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = events.groupBy(_._1).map { case (u, xs) =>
      val counts = xs.groupBy(_._2).map { case (t, g) =>
        (t, g.length.toLong) }
      val (t, n) = counts.toSeq.minBy { case (ty, c) => (-c, ty) }
      (u, t, n)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == exp, s"mode mismatch")
  }
}
