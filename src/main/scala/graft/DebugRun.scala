package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries once, print timing + plan; not part of the
  * driver contract. `scripts/run.sh graft.DebugRun <sfDir> <name...>` */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        graft.sources.IngestOps.tmp("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.warmup(spark)
    val queries = SparkEntry.queries
    // DEBUG_SKEW_AQE=1: execute inside the scaled-down skew-detector
    // scope EngineSpec uses, so the final adaptive plan shows the
    // skew-split SMJ at test scale (for plan capture into PLANS.md)
    def scoped[T](body: => T): T =
      if (sys.env.contains("DEBUG_SKEW_AQE"))
        graft.operators.Joins.withSkewAqeConf(spark)(body)
      else body
    names.foreach { n =>
      val t0 = System.nanoTime()
      // build ONCE: some keys run eager construction-time work (model
      // collects, lazy-checkpoint planting) that explain/show would
      // otherwise repeat per flag
      val df = scoped { queries(n)(spark, sfDir) }
      // count() executes a DERIVED QueryExecution — in executed-plan
      // mode run df's own collect so df.queryExecution is the one that
      // ran (and carries the final adaptive plan)
      val cnt = scoped {
        if (sys.env.contains("DEBUG_EXECUTED")) df.collect().length.toLong
        else df.count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[debug] $n%-28s $sec%8.2f s  rows=$cnt")
      if (sys.env.contains("DEBUG_EXPLAIN")) df.explain("formatted")
      // the FINAL adaptive plan (post-execution), where AQE's runtime
      // rewrites — skew splits, coalesced readers — are visible
      if (sys.env.contains("DEBUG_EXECUTED"))
        println(df.queryExecution.executedPlan.toString)
      // DEBUG_SHOW=true (flag-style) means the default depth, not a crash
      sys.env.get("DEBUG_SHOW").foreach { v =>
        df.show(v.toIntOption.getOrElse(20), false)
      }
    }
    spark.stop()
  }
}
