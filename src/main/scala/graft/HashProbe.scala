package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only interleaved A/B runner for the r21 portable-hash fusion
  * (functions/PortableHash.scala): times the FUSED Md5Prefix60 /
  * PortableMinHashSignature spellings against the declarative
  * conv(substring(md5)) chains they replaced, same JVM, alternating,
  * min+median per variant (the repo's regression-adjudication protocol —
  * solo runs are ±50% noisy and never attributable). Each pass runs the
  * signature/hash stage to a noop sink (guide §1.4) so the timing is the
  * hash compute, not a sink. Not part of the driver contract.
  * `scripts/run.sh graft.HashProbe <sfDir> <rounds>` */
object HashProbe {
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
    import spark.implicits._

    // the minhash keys' own input shape: anchored docs → shingle sets
    val sets = graft.sources.Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id" * 479001599L, lit(100L)) < 4)
      .filter($"text".isNotNull)
      .select($"doc_id",
        graft.operators.DedupOps.shingles3($"text").as("ss"))
      .filter(size($"ss") > 0)
      .repartition(32) // the spreadSmall discipline, inlined for the probe
      .localCheckpoint()
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id" * 715225741L, lit(100L)) < 10)
      .select($"doc_id",
        explode(array_distinct(array_remove(split($"text", " "), "")))
          .as("t")).localCheckpoint()

    def noop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => Double)] = Seq(
      "sig_fused" -> (() => noop(sets.select($"doc_id",
        graft.functions.PortableHashFunctions
          .portableMinhashSignature($"ss", 16).as("sig")))),
      "sig_decl" -> (() => noop(sets.select($"doc_id",
        graft.operators.DedupOps
          .portableSignatureDeclarative($"ss", 16).as("sig")))),
      "tok_fused" -> (() => noop(toks.select($"doc_id",
        graft.operators.DedupOps.portableHash($"t").as("h")))),
      "tok_decl" -> (() => noop(toks.select($"doc_id",
        graft.operators.DedupOps.portableHashDeclarative($"t").as("h")))))
    // warmup once per variant (codegen), then interleave
    variants.foreach(_._2())
    val times = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Double]]
    (1 to rounds).foreach { _ =>
      variants.foreach { case (n, f) =>
        times.getOrElseUpdate(n,
          scala.collection.mutable.ArrayBuffer.empty) += f()
      }
    }
    variants.foreach { case (n, _) =>
      val xs = times(n).sorted
      println(f"[hashprobe] $n%-10s min=${xs.head}%.3f " +
        f"median=${xs(xs.size / 2)}%.3f  all=${xs.map(x => f"$x%.3f")}")
    }
    spark.stop()
  }
}
