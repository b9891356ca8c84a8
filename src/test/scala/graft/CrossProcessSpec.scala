package graft

import org.apache.spark.sql.functions._

/** Cross-JVM concurrency proof for the optimistic commit protocol:
  * `commit_conflict_retry` races two writers inside one process, but
  * the CAS (create-exclusive hard link) and the refs lock are
  * FILESYSTEM primitives — so this spec races two real OS processes
  * (each its own Spark driver, barrier-released to contend the same
  * slot) and proves both appends land exactly once with disjoint
  * manifests and a forward-only pointer. */
class CrossProcessSpec extends SparkSpecBase {

  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      sum(pmod(xxhash64(col("event_id")), lit(1000000007L)))).collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** The run.sh JVM flags: Spark 4 on Java 17 needs the add-opens set. */
  private def workerCmd(args: Seq[String]): Seq[String] = {
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    Seq(s"${System.getProperty("java.home")}/bin/java") ++ opens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      // the SPEC's own classpath, not a hardcoded machine layout — the
      // worker must run exactly the classes under test wherever the
      // build happens to live
      "-cp", System.getProperty("java.class.path"),
      "graft.sources.CommitWorker") ++ args
  }

  test("two writer PROCESSES contending one table: both appends land " +
      "exactly once, manifests are disjoint, the pointer only moves " +
      "forward") {
    import spark.implicits._
    val L = sources.LakeOps
    val out = sources.IngestOps.tmp("events_xproc")
    L.cloneTree(L.versionedBaseLayout(spark, sf), out)
    L.setRef(spark, out, "main", 3)
    val baseline = fingerprint(L.readCurrent(spark, out))
    val expect = sources.IngestOps.eventsWithParts(spark, sf)
      .filter($"day".isin(16, 17))
      .select($"event_id", $"user_id", $"event_type", $"value", $"day")
    val expectFp = fingerprint(expect)
    assert(expectFp._1 > 0, "fixture must have day-16/17 rows")
    val barrier = sources.IngestOps.tmp("xproc_barrier")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(barrier))
    val go = s"$barrier/go"
    val procs = Seq(16, 17).map { day =>
      val pb = new ProcessBuilder(
        workerCmd(Seq(out, sf, day.toString, s"$barrier/ready-$day", go)): _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(s"xproc-$day", ".log"))
      day -> pb.start()
    }
    try {
      // release only once BOTH workers are staged and waiting
      val t0 = System.nanoTime()
      while (!Seq(16, 17).forall(d => java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$barrier/ready-$d")))) {
        assert(System.nanoTime() - t0 < 180L * 1000 * 1000 * 1000,
          "workers never reached the barrier")
        Thread.sleep(50)
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(go),
        "go".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      procs.foreach { case (day, p) =>
        assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
          s"worker $day hung")
        assert(p.exitValue() == 0, s"worker $day failed")
      }
    } finally procs.foreach(_._2.destroyForcibly())
    // both slots exist and claim DISJOINT file sets
    val m4 = sources.IngestOps.readMetaLines(spark, out,
      "metadata/snap-4.txt").toSet
    val m5 = sources.IngestOps.readMetaLines(spark, out,
      "metadata/snap-5.txt").toSet
    assert(m4.nonEmpty && m5.nonEmpty, "both commits must have landed")
    assert((m4 & m5).isEmpty,
      s"manifests must never claim each other's files: ${m4 & m5}")
    // the pointer ends at the highest slot (forward-only under the lock)
    assert(L.readRefs(spark, out)("main") == 5)
    // exactly once: current view = baseline + both slices, no doubles
    assert(fingerprint(L.readCurrent(spark, out)) ==
      (baseline._1 + expectFp._1, baseline._2 + expectFp._2),
      "cross-process appends must land exactly once each")
    // no debris: every staged file was published and swept by its owner
    assert(L.orphanSweep(spark, out).isEmpty,
      "a clean two-writer run must leave no orphans")
  }
}
