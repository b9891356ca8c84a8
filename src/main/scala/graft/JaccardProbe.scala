package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-timing probe for the dedup_ngram_jaccard pipeline
  * (operators/DedupOps.jaccardPairs): times the shingle/checkpoint,
  * prefix-build, candidate-join and confirm stages separately (noop
  * sink, guide §1.4; interleaved repeats, min/median per stage) so an
  * optimization targets the stage that actually costs. Not part of the
  * driver contract. `scripts/run.sh graft.JaccardProbe <sfDir> <rounds>` */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 5
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val stages: Seq[(String, () => Double)] = Seq(
      "full_key" -> (() => time {
        graft.operators.DedupOps.dedupNgramJaccard(spark, sfDir).count()
      }),
      "stages" -> (() => {
        import spark.implicits._
        val docs = graft.sources.Tables.documents(spark, sfDir)
          .filter(pmod($"doc_id" * 982451653L, lit(100L)) < 4)
        val threshold = 0.5
        var t = 0.0
        val sets = {
          val t0 = System.nanoTime()
          val s = docs.select($"doc_id",
            sort_array(graft.operators.DedupOps.shingles3($"text"))
              .as("ss"))
            .repartition(32).localCheckpoint()
          t = (System.nanoTime() - t0) / 1e9
          println(f"[jacprobe]   sets_ckpt     ${t}%.3f")
          s
        }
        val sh = sets.select($"doc_id", size($"ss").as("n"),
          explode($"ss").as("s"))
        val freq = sh.groupBy($"s").agg(count(lit(1)).as("df"))
        val byRarity = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"df".asc, $"s".asc)
        val prefix = {
          val t0 = System.nanoTime()
          val p = sh.join(freq, "s")
            .withColumn("rk", row_number().over(byRarity))
            .filter($"rk" <= $"n" - ceil(lit(threshold) * $"n" - lit(1e-9)) + 1)
            .select($"doc_id", $"s", $"n", $"rk")
            .localCheckpoint()
          println(f"[jacprobe]   prefix_ckpt   ${(System.nanoTime() - t0) / 1e9}%.3f")
          p
        }
        // interleaved A/B: candidate join with vs without the r21
        // positional filter (pre-distinct row count + distinct count).
        // Gated behind SPARK_GRAFT_JACPROBE_AB: the counts execute the
        // candidate join twice more per round, inflating routine probe
        // runs that no longer study that comparison (r21 advice).
        val abCounts = sys.env.contains("SPARK_GRAFT_JACPROBE_AB")
        def candWith(positional: Boolean) = {
          val ubound = lit(1) + least($"a.n" - $"a.rk", $"b.n" - $"b.rk")
          val base = $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
            $"a.n" >= lit(threshold) * $"b.n" - lit(1e-9) &&
            $"b.n" >= lit(threshold) * $"a.n" - lit(1e-9)
          val cond = if (positional)
            base && (lit(1.0) + lit(threshold)) * ubound >=
              lit(threshold) * ($"a.n" + $"b.n") - lit(1e-6)
            else base
          prefix.as("a").join(prefix.as("b"), cond)
            .select($"a.doc_id".as("da"), $"b.doc_id".as("db"))
        }
        // r22 candidate variant: AllPairs/PPJoin INDEX prefix on the
        // smaller-set side. For a pair with na ≤ nb the required overlap
        // α = ceil(t/(1+t)·(na+nb)) ≥ ceil(2t/(1+t)·na), so the smaller
        // doc only needs its first na − ceil(2t/(1+t)·na) + 1 rarest
        // shingles in the join (vs the symmetric probe bound
        // na − ceil(t·na) + 1) — the build side shrinks and the
        // enumeration Σ c_idx(s)·c_probe(s) with it.
        def candIdx(hashKey: Boolean) = {
          val idxc = 2 * threshold / (1 + threshold)
          val idx = prefix.filter(
            $"rk" <= $"n" - ceil(lit(idxc) * $"n" - lit(1e-9)) + 1)
          val keyEq = if (hashKey) xxhash64($"a.s") === xxhash64($"b.s")
            else $"a.s" === $"b.s"
          val ubound = lit(1) + least($"a.n" - $"a.rk", $"b.n" - $"b.rk")
          val cond = keyEq &&
            ($"a.n" < $"b.n" ||
              ($"a.n" === $"b.n" && $"a.doc_id" < $"b.doc_id")) &&
            $"a.n" >= lit(threshold) * $"b.n" - lit(1e-9) &&
            (lit(1.0) + lit(threshold)) * ubound >=
              lit(threshold) * ($"a.n" + $"b.n") - lit(1e-6)
          idx.as("a").join(prefix.as("b"), cond)
            .select(least($"a.doc_id", $"b.doc_id").as("da"),
              greatest($"a.doc_id", $"b.doc_id").as("db"))
        }
        if (abCounts) {
          val preNo = candWith(false).count()
          val preYes = candWith(true).count()
          val preIdx = candIdx(false).count()
          println(f"[jacprobe]   prejoin_rows  nopos=$preNo pos=$preYes idx=$preIdx")
        }
        // interleaved A/B of the candidate stage spellings (join +
        // distinct + eager checkpoint, the shipped stage shape)
        def candStage(label: String,
            df: => org.apache.spark.sql.DataFrame): Double = {
          val t0 = System.nanoTime()
          val c = df.distinct().localCheckpoint()
          val n = c.count()
          val t = (System.nanoTime() - t0) / 1e9
          println(f"[jacprobe]   cand_$label%-10s ${t}%.3f rows=$n")
          c.unpersist(false)
          t
        }
        candStage("pos", candWith(true))
        candStage("idx", candIdx(false))
        candStage("idxhash", candIdx(true))
        val cand = {
          val t0 = System.nanoTime()
          val c = candWith(true).distinct().localCheckpoint()
          val n = c.count()
          println(f"[jacprobe]   cand_ckpt     ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
          c
        }
        def confirm(inter: org.apache.spark.sql.Column) = time {
          noop(cand
            .join(sets.select($"doc_id".as("da"), $"ss".as("ssa")), "da")
            .join(sets.select($"doc_id".as("db"), $"ss".as("ssb")), "db")
            .select($"da", $"db", size($"ssa").cast("long").as("na"),
              size($"ssb").cast("long").as("nb"),
              inter.cast("long").as("inter")))
        }
        // interleaved A/B of the three confirm spellings (sets are
        // sort_array'd at the build, so the sorted kernel applies)
        val tDecl = confirm(size(array_intersect($"ssa", $"ssb")))
        val tFused = confirm(graft.functions.IntersectionSizeFunctions
          .intersectionSize($"ssa", $"ssb"))
        val tSorted = confirm(graft.functions.IntersectionSizeFunctions
          .sortedIntersectionSize($"ssa", $"ssb"))
        println(f"[jacprobe]   confirm_decl   ${tDecl}%.3f")
        println(f"[jacprobe]   confirm_fused  ${tFused}%.3f")
        println(f"[jacprobe]   confirm_sorted ${tSorted}%.3f")
        tSorted
      }))
    stages.head._2() // warm codegen/layouts once
    (1 to rounds).foreach { _ =>
      stages.foreach { case (n, f) =>
        val s = f()
        println(f"[jacprobe] $n%-10s ${s}%.3f")
      }
    }
    spark.stop()
  }
}
