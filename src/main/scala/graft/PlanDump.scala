package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Dev-only plan capture for the r21 optimization evidence
  * (plans/r21/<query>_{before,after}.txt): prints the FORMATTED plan of
  * the pre-lineage-cut pipeline frames the keys execute, which the
  * localCheckpoint leaves hide from the top-level explain.
  *
  * `after` = the shipped code paths. `before` = the r20 spellings
  * (commit 0f00a32) reconstructed from the RETAINED declarative
  * reference functions — `portableHashDeclarative`,
  * `portableSignatureDeclarative`, `size(array_intersect(...))`, and the
  * candidate join without the positional filter — which DedupSpec pins
  * value-equal to what r20 executed, so the before-plan is the r20 plan
  * shape without rebuilding the old revision.
  *
  * `scripts/run.sh graft.PlanDump <sfDir> <outDir>` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r21"
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
    import spark.implicits._

    def dump(name: String, df: DataFrame, note: String): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val txt = s"-- $name\n-- $note\n\n$plan"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/$name.txt")
    }

    val ph: Column => Column = DedupOps.portableHashDeclarative

    // ---- dedup_ngram_jaccard ------------------------------------------
    val jdocs = graft.sources.Tables.documents(spark, sfDir)
      .filter(DedupOps.anchorSample(982451653L, 4))
    dump("dedup_ngram_jaccard_after",
      DedupOps.jaccardPairStats(jdocs, 0.5),
      "shipped pre-cut pipeline: prefix candidate join with PPJoin " +
        "length + POSITIONAL filters, fused intersection_size confirm")
    // r20 spelling: no positional filter, size(array_intersect) confirm
    locally {
      val threshold = 0.5
      val sets = jdocs.select($"doc_id",
        DedupOps.shingles3($"text").as("ss")).localCheckpoint()
      val sh = sets.select($"doc_id", size($"ss").as("n"),
        explode($"ss").as("s"))
      val freq = sh.groupBy($"s").agg(count(lit(1)).as("df"))
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"df".asc, $"s".asc)
      val prefix = sh.join(freq, "s")
        .withColumn("rk", row_number().over(byRarity))
        .filter($"rk" <= $"n" - ceil(lit(threshold) * $"n" - lit(1e-9)) + 1)
        .select($"doc_id", $"s", $"n")
        .localCheckpoint()
      val cand = prefix.as("a").join(prefix.as("b"),
          $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
            $"a.n" >= lit(threshold) * $"b.n" - lit(1e-9) &&
            $"b.n" >= lit(threshold) * $"a.n" - lit(1e-9))
        .select($"a.doc_id".as("da"), $"b.doc_id".as("db")).distinct()
      val stats = cand
        .join(sets.select($"doc_id".as("da"), $"ss".as("ssa")), "da")
        .join(sets.select($"doc_id".as("db"), $"ss".as("ssb")), "db")
        .select($"da", $"db", size($"ssa").cast("long").as("na"),
          size($"ssb").cast("long").as("nb"),
          size(array_intersect($"ssa", $"ssb")).cast("long").as("inter"))
      dump("dedup_ngram_jaccard_before", stats,
        "r20 spelling (0f00a32), reconstructed: candidate join WITHOUT " +
          "the positional filter; size(array_intersect) materializes " +
          "the intersection array per pair")
    }

    // ---- dedup_minhash_lsh --------------------------------------------
    val mdocs = graft.sources.Tables.documents(spark, sfDir)
      .filter(DedupOps.anchorSample(479001599L, 4))
    dump("dedup_minhash_lsh_after",
      DedupOps.minhashPairStats(mdocs, 16, 4, portable = true),
      "shipped pre-cut pipeline: fused portable_minhash_signature + " +
        "md5_prefix60 band buckets + fused intersection_size confirm")
    locally {
      val (nHashes, bandSize) = (16, 4)
      val sets = mdocs.filter($"text".isNotNull)
        .select($"doc_id", DedupOps.shingles3($"text").as("ss"))
        .filter(size($"ss") > 0)
        .localCheckpoint()
      val sig = sets.select($"doc_id",
        DedupOps.portableSignatureDeclarative($"ss", nHashes).as("sig"))
      val bandCols = (0 until nHashes / bandSize).map { b =>
        val lanes = (b * bandSize until (b + 1) * bandSize)
          .map(i => $"sig".getItem(i))
        struct(lit(b).as("band"),
          ph(concat_ws(":", lit(b) +: lanes: _*)).as("bucket"))
      }
      val buckets = sig
        .select($"doc_id", explode(array(bandCols: _*)).as("bb"))
        .select($"doc_id", $"bb.band", $"bb.bucket")
        .localCheckpoint()
      val cand = buckets.as("x").join(buckets.as("y"),
          $"x.band" === $"y.band" && $"x.bucket" === $"y.bucket" &&
            $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("da"), $"y.doc_id".as("db")).distinct()
      val stats = cand
        .join(sets.select($"doc_id".as("da"), $"ss".as("ssa")), "da")
        .join(sets.select($"doc_id".as("db"), $"ss".as("ssb")), "db")
        .select($"da", $"db", size($"ssa").cast("long").as("na"),
          size($"ssb").cast("long").as("nb"),
          size(array_intersect($"ssa", $"ssb")).cast("long").as("inter"))
      dump("dedup_minhash_lsh_before", stats,
        "r20 spelling (0f00a32), reconstructed: per-lane transform + " +
          "min over conv(substring(md5)) chains (16 lanes re-traverse " +
          "the shingle array), declarative bucket hash, " +
          "size(array_intersect) confirm")
    }

    // ---- dedup_simhash ------------------------------------------------
    val sdocs = graft.sources.Tables.documents(spark, sfDir)
      .filter(DedupOps.anchorSample(715225741L, 10))
    dump("dedup_simhash_after",
      DedupOps.simhashPipeline(sdocs, maxHamming = 3, portable = true),
      "shipped pipeline: fused md5_prefix60 per-token hash")
    locally {
      // r20 spelling differs ONLY in the per-token hash expression
      // (declarative conv(substring(md5)) chain) — reconstruct via the
      // same pipeline over a pre-hashed column is not possible without
      // duplicating it, so dump the hash-stage frame, where the whole
      // delta lives
      val toks = array_remove(split($"text", " "), "")
      val before = sdocs
        .select($"doc_id", explode(array_distinct(toks)).as("t"))
        .select($"doc_id", ph($"t").as("h"))
      dump("dedup_simhash_before", before,
        "r20 spelling (0f00a32), reconstructed hash stage (the only " +
          "stage that changed): per-token conv(substring(md5(t),1,15)," +
          "16,10) string chain vs the fused md5_prefix60 in _after")
    }
    spark.stop()
  }
}
