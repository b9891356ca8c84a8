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
    names.foreach { n =>
      val t0 = System.nanoTime()
      // build ONCE: some keys run eager construction-time work (model
      // collects, lazy-checkpoint planting) that explain/show would
      // otherwise repeat per flag
      val df = queries(n)(spark, sfDir)
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[debug] $n%-28s $sec%8.2f s  rows=$cnt")
      if (sys.env.contains("DEBUG_EXPLAIN")) df.explain("formatted")
      // DEBUG_SHOW=true (flag-style) means the default depth, not a crash
      sys.env.get("DEBUG_SHOW").foreach { v =>
        df.show(v.toIntOption.getOrElse(20), false)
      }
    }
    spark.stop()
  }
}
