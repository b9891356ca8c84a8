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
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[debug] $n%-28s $sec%8.2f s  rows=$cnt")
      if (sys.env.contains("DEBUG_EXPLAIN"))
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      if (sys.env.contains("DEBUG_SHOW"))
        SparkEntry.queries(n)(spark, sfDir)
          .show(sys.env("DEBUG_SHOW").toInt, false)
    }
    spark.stop()
  }
}
