package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKPerKey custom operator (graft.plans): semantics vs the built-in
  * Window(row_number)+Filter spelling, plan shape (partial below the one
  * exchange), and the shuffle-reduction contract (≤ k rows per key per
  * upstream partition cross the wire). */
class TopKSpec extends SparkSpecBase {

  // keeps rn in the output so RankLimitToTopKRule does NOT rewrite it:
  // this stays a genuine Window plan, independent of the custom operator
  private def windowTop3(dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"totalprice".desc, $"o_orderkey")
    graft.sources.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        graft.operators.dec($"o_totalprice").cast("double").as("totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderkey", $"o_custkey", $"totalprice", $"rn")
  }

  test("matches the window row_number spelling exactly") {
    import spark.implicits._
    val got = graft.operators.SetOps.topkPerKey(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = windowTop3(sf)
      .orderBy($"o_custkey", $"totalprice".desc, $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("k larger than any group returns every row") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val got = graft.plans.TopK
      .perKey(base, Seq($"k"), Seq($"v".desc), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (1L, 20.0), (2L, 5.0)))
  }

  test("plan: partial under exactly one exchange, final above it") {
    import spark.implicits._
    val df = graft.operators.SetOps.topkPerKey(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    assert(iPartial >= 0 && iFinal >= 0, s"execs missing in:\n$plan")
    // tree prints root-first: final ... exchange ... partial
    val between = plan.substring(iFinal, iPartial)
    assert(between.contains("Exchange") || between.contains("ShuffleQueryStage"),
      s"no exchange between final and partial:\n$plan")
  }

  test("partial bounds what crosses the shuffle to k per key per partition") {
    import spark.implicits._
    // 1000 rows, ONE key, forced through 4 upstream partitions: the
    // window spelling would shuffle all 1000; partial emits ≤ 4 * k.
    val base = spark.range(1000).repartition(4)
      .select(lit(1L).as("k"), $"id".cast("double").as("v"))
    val df = graft.plans.TopK.perKey(base, Seq($"k"), Seq($"v".desc), k = 3)
    val got = df.collect().map(_.getDouble(1)).toSet
    assert(got == Set(999.0, 998.0, 997.0))
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val partialOut = flatten(df.queryExecution.executedPlan).collect {
      case e: graft.plans.TopKPerKeyExec if e.partial =>
        e.metrics("numOutputRows").value
    }
    assert(partialOut.nonEmpty, "partial exec not found in final plan")
    // collect() above ran the plan twice; bound per run is 4 parts × k = 12
    assert(partialOut.head <= 24 && partialOut.head >= 3,
      s"partial emitted ${partialOut.head} rows — not bounded")
  }

  test("partial flush-on-pressure keeps results exact under a tiny cap") {
    import spark.implicits._
    // 40 keys × 50 rows through 4 partitions with a 2-key cap: the
    // partial flushes constantly; the final must still be exact
    spark.conf.set("graft.topk.maxPartialKeys", "2")
    try {
      val base = spark.range(2000).repartition(4)
        .select(($"id" % 40).as("k"), $"id".cast("double").as("v"))
      val got = graft.plans.TopK
        .perKey(base, Seq($"k"), Seq($"v".desc), k = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val exp = (0L until 40L).flatMap { key =>
        val vs = (0L until 2000L).filter(_ % 40 == key).map(_.toDouble)
        vs.sorted.reverse.take(2).map((key, _))
      }.toSet
      assert(got == exp)
    } finally spark.conf.unset("graft.topk.maxPartialKeys")
  }

  test("ties beyond k are cut deterministically by the tie-break column") {
    import spark.implicits._
    val base = Seq((1L, 5.0, "a"), (1L, 5.0, "b"), (1L, 5.0, "c"))
      .toDF("k", "v", "id")
    val got = graft.plans.TopK
      .perKey(base, Seq($"k"), Seq($"v".desc, $"id".asc), k = 2)
      .collect().map(_.getString(2)).toSet
    assert(got == Set("a", "b"))
  }
}
