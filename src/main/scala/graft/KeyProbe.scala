package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only per-key job-breakdown probe (not part of the driver
  * contract): runs the named query keys for `rounds` interleaved
  * repeats on a warm session and prints, per key, the min wall time
  * plus that round's per-Spark-job durations — so an optimization
  * targets the job that actually costs instead of the key's total.
  * `scripts/run.sh graft.KeyProbe <sfDir> <rounds> <key1,key2,...>` */
object KeyProbe {
  def main(args: Array[String]): Unit = {
    // dev CLI contract (r21 advice): guard arity/format up front instead
    // of an ArrayIndexOutOfBounds after the usage comment promised one
    if (args.length < 3 || args(1).toIntOption.isEmpty) {
      System.err.println(
        "usage: scripts/run.sh graft.KeyProbe <sfDir> <rounds> <key1,key2,...>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val rounds = args(1).toInt
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        graft.sources.IngestOps.tmp("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.warmup(spark)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    Fixtures.prewarm(spark, sfDir)

    // job-duration listener: description-or-callsite keyed
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, (desc, e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (d, t0) =>
          done.add((d, (e.time - t0) / 1e3)) // listener times are ms
        }
      }
    })

    val fns = SparkEntry.queries
    // one warm pass per key (codegen, layouts)
    keys.foreach(k => try fns(k)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[keyprobe] WARM FAIL $k: $e") })
    val best = collection.mutable.Map[String, Double]()
    val bestJobs = collection.mutable.Map[String, Seq[(String, Double)]]()
    (1 to rounds).foreach { r =>
      keys.foreach { k =>
        done.clear()
        val t0 = System.nanoTime()
        fns(k)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let async job-end events drain
        val jb = {
          import scala.jdk.CollectionConverters._
          done.asScala.toSeq
        }
        if (!best.contains(k) || t < best(k)) {
          best(k) = t; bestJobs(k) = jb
        }
        println(f"[keyprobe] r$r $k%-28s ${t}%.3f  jobs=${jb.size}")
      }
    }
    println("== best rounds ==")
    keys.foreach { k =>
      val js = bestJobs(k)
      println(f"[keyprobe] BEST $k%-28s ${best(k)}%.3f  " +
        f"jobs_sum=${js.map(_._2).sum}%.3f  driver_side=${
          best(k) - js.map(_._2).sum}%.3f")
      js.sortBy(-_._2).take(12).foreach { case (d, s) =>
        println(f"[keyprobe]      ${s}%8.3f s  ${d.take(90)}")
      }
    }
    spark.stop()
  }
}
