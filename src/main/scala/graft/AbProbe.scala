package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Pre-c921288 shape of stream_custom_state's per-user state (3 fields,
  * in-batch-only ordering key) — kept ONLY for the A/B attribution probe
  * below; the production state is [[graft.streaming.UserState]]. */
case class UserStateV0(n: Long, maxValue: Double, lastType: String)

/** Dev-only interleaved A/B runner (the repo's regression-adjudication
  * protocol: same JVM, alternating variants, never solo runs).
  * `scripts/run.sh graft.AbProbe <sfDir> <pairs>` times the CURRENT
  * `stream_custom_state` against (a) the pre-c921288 3-field-state
  * variant and (b) a 32-state-partition variant, reporting per-variant
  * min/median so a code-attributed delta is separable from machine
  * drift. Not part of the driver contract. */
object AbProbe {

  /** The pre-c921288 body: identical source/fence/projection/sink, but
    * 3-field state and the in-batch-restarting lastKey — the exact code
    * the regression was attributed to replacing. */
  private def customStateV0(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = s"ab_state_v0_${System.nanoTime()}"
    val src = Tables.normalizeTs(spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
      .filter($"user_id".isNotNull && $"value".isNotNull &&
        $"ts".isNotNull && $"event_id".isNotNull)
      .select($"user_id", $"value", $"event_type",
        unix_micros($"ts").as("ts_ord"), $"event_id")
      .as[(Long, Double, String, Long, Long)]
    val stateStream = src.groupByKey(_._1)
      .mapGroupsWithState[UserStateV0, (Long, Long, Double, String)](
        GroupStateTimeout.NoTimeout) { case (user, rows, state) =>
        val prev = state.getOption.getOrElse(UserStateV0(0L, Double.MinValue, ""))
        var n = prev.n
        var mx = prev.maxValue
        var lastKey = (Long.MinValue, Long.MinValue)
        var lastType = prev.lastType
        rows.foreach { case (_, v, t, ord, id) =>
          n += 1
          if (v > mx) mx = v
          if (ord > lastKey._1 || (ord == lastKey._1 && id > lastKey._2)) {
            lastKey = (ord, id)
            lastType = t
          }
        }
        val next = UserStateV0(n, mx, lastType)
        state.update(next)
        (user, n, mx, lastType)
      }
      .toDF("user_id", "n", "max_value", "last_type")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = stateStream.writeStream
        .outputMode("update")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val out = spark.table(queryName)
      .groupBy($"user_id")
      .agg(max($"n").as("n"), max($"max_value").as("max_value"),
        max_by($"last_type", $"n").as("last_type"))
      .orderBy($"user_id")
    spark.catalog.dropTempView(queryName)
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        graft.sources.IngestOps.tmp("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.warmup(spark)
    val cur = SparkEntry.queries("stream_custom_state")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => Double)] = Seq(
      "cur" -> (() => time(cur(spark, sfDir).count())),
      "v0_prefix" -> (() => time(customStateV0(spark, sfDir).count())))
    // warmup one round untimed
    variants.foreach { case (_, f) => f() }
    val acc = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to pairs).foreach { _ =>
      variants.foreach { case (n, f) => acc(n) = acc(n) :+ f() }
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, xs) =>
      val s = xs.sorted
      println(f"[ab] $n%-10s min=${s.head}%.3f med=${s(s.length / 2)}%.3f " +
        s"all=${s.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
