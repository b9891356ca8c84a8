package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** join_bloom_prune: the Bloom pre-filter must be lossless (the join
  * result is exactly the plain join's), actually prune, and stay in-plan
  * as a scalar subquery rather than a driver-side collect. */
class BloomJoinSpec extends SparkSpecBase {

  test("bloom-pruned join equals the plain join exactly") {
    import spark.implicits._
    val got = graft.operators.Joins.joinBloomPrune(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val dim = graft.sources.Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F")
      .select($"o_orderkey")
    val exp = graft.sources.Tables.lineitem(spark, sf)
      .join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.operators.dsum($"l_extendedprice").as("revenue"))
      .orderBy($"l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == exp.toSeq && got.nonEmpty)
  }

  test("the sketch prunes: no false negatives, few false positives") {
    import spark.implicits._
    val keys = spark.range(100).select($"id".as("k"))
    val agg = new BloomFilterAggregate(
      GraftBridge.eagerExpression(xxhash64($"k")),
      Literal(100L), Literal(64L * 1024))
    val bloomPlan = keys
      .select(GraftBridge.column(agg.toAggregateExpression()).as("bf"))
      .queryExecution.analyzed
    val probe = spark.range(10000).select($"id".as("p"))
    val kept = probe.filter(GraftBridge.column(new BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      GraftBridge.eagerExpression(xxhash64($"p")))))
      .collect().map(_.getLong(0)).toSet
    assert((0L until 100L).forall(kept), "false negative — bloom is broken")
    assert(kept.size < 500, s"pruned nothing: ${kept.size} of 10000 kept")
  }

  test("the bloom build stays in-plan as a subquery filter") {
    val df = graft.operators.Joins.joinBloomPrune(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom filter in:\n$plan")
    assert(plan.contains("Subquery"), s"bloom not a subquery in:\n$plan")
  }

  test("join_dpp: dynamic pruning reaches the fact scan's partition " +
      "filters AND measurably skips fact files at runtime") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    val df = graft.operators.Joins.joinDpp(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in:\n$plan")
    assert(df.collect().nonEmpty) // populates scan metrics
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => other +: other.children.flatMap(unwrap)
    }
    val factScan = unwrap(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec
        if s.output.exists(_.name == "value") => s }
      .headOption.getOrElse(fail("no fact FileSourceScanExec found"))
    val readFiles = factScan.metrics("numFiles").value
    // total data files of the partitioned layout (the un-pruned universe)
    val root = graft.sources.IngestOps.partitionedLayout(spark, sf)
    val all = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.toString.endsWith(".parquet")) n += 1
      }
      n
    }
    // the dim restricts to days 5-7 of a 31-day layout — the runtime
    // filter must have skipped the overwhelming majority of fact files
    assert(readFiles > 0 && readFiles * 4 <= all,
      s"DPP read $readFiles of $all files — no real pruning")
  }
}
